"""Pub/Sub transport over the public REST API (publish / pull /
acknowledge / modifyAckDeadline).

Reference surface: modules/pubsub/.../PubsubApp.scala (source: streaming
pull with ack-deadline extension + transient-error retries; sinks:
batched publish bounded by batchSize / requestByteThreshold —
config.pubsub.reference.hocon:7-90). In production the source side is
the managed connector / client library; this module implements the REST
protocol itself (stdlib urllib, JSON) for the emulator path (the public
``PUBSUB_EMULATOR_HOST`` convention), so batching, retry, ack and
deadline-extension logic run against a real HTTP broker in-sandbox
(tests/fake_pubsub.py) — same pattern as the NSQ and Kinesis fakes.

Auth is deliberately out of scope: an emulator endpoint is unsigned;
against real GCP you run the managed connector, not this client.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from dataclasses import dataclass

from .connectors import StreamSinkConf, ship_rows


class PubSubError(RuntimeError):
    pass


@dataclass
class PubSubPullConf:
    """`input` of config.pubsub.reference.hocon (source side)."""
    subscription: str = ""
    duration_per_ack_extension_s: float = 15.0
    min_remaining_ack_deadline: float = 0.1
    retry_delay_s: float = 0.1
    retry_attempts: int = 10
    emulator_host: str | None = None


def pubsub_pull_conf_from_dict(d: dict) -> PubSubPullConf:
    from .connectors import sink_conf_from_dict

    # reuse the HOCON-duration decoding via the shared shim
    ext = sink_conf_from_dict({"throttledBackoffPolicy": {
        "minBackoff": d.get("durationPerAckExtension", "15 seconds"),
        "maxBackoff": d.get("retries", {}).get(
            "transientErrors", {}).get("delay", "100 millis"),
    }})
    return PubSubPullConf(
        subscription=d.get("subscription", ""),
        duration_per_ack_extension_s=ext.min_backoff_s,
        min_remaining_ack_deadline=float(
            d.get("minRemainingAckDeadline", 0.1)),
        retry_delay_s=ext.max_backoff_s,
        retry_attempts=int(d.get("retries", {}).get(
            "transientErrors", {}).get("attempts", 10)),
    )


class PubSubHttpClient:
    """Minimal v1 REST client against an emulator host. Picklable."""

    def __init__(self, emulator_host: str, timeout: float = 10.0):
        host = emulator_host
        if not host.startswith("http"):
            host = "http://" + host
        self.base = host.rstrip("/") + "/v1"
        self.timeout = timeout

    def call(self, path: str, payload: dict) -> dict:
        req = urllib.request.Request(
            f"{self.base}/{path}",
            data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode("utf-8") or "{}")
        except urllib.error.HTTPError as e:
            body = e.read().decode("utf-8", "replace")
            raise PubSubError(f"{path}: HTTP {e.code}: {body[:200]}") from e

    def publish(self, topic: str, batch: list[tuple[str, bytes]]) -> list[int]:
        """→ failed indices for ship_rows. Pub/Sub has no per-record
        partial failure: a failed request fails the whole batch (the
        reference retries it wholesale, transientErrors.attempts)."""
        try:
            resp = self.call(f"{topic}:publish", {"messages": [
                {"data": base64.b64encode(data).decode("ascii"),
                 "attributes": {"key": key} if key else {}}
                for key, data in batch
            ]})
        except PubSubError:
            return list(range(len(batch)))
        ids = resp.get("messageIds", [])
        return [] if len(ids) == len(batch) else list(range(len(batch)))

    def pull(self, subscription: str, max_messages: int = 1000):
        resp = self.call(f"{subscription}:pull",
                         {"maxMessages": max_messages})
        return [
            (m["ackId"],
             base64.b64decode(m["message"].get("data", "")),
             m["message"].get("messageId"),
             m["message"].get("attributes", {}))
            for m in resp.get("receivedMessages", [])
        ]

    def acknowledge(self, subscription: str, ack_ids: list[str]):
        if ack_ids:
            self.call(f"{subscription}:acknowledge", {"ackIds": ack_ids})

    def modify_ack_deadline(self, subscription: str, ack_ids: list[str],
                            seconds: int):
        if ack_ids:
            self.call(f"{subscription}:modifyAckDeadline",
                      {"ackIds": ack_ids,
                       "ackDeadlineSeconds": int(seconds)})


def pubsub_sender(emulator_host: str, timeout: float = 10.0):
    """``send(topic, batch) -> failed indices`` for ship_rows — same
    injection point as the Kinesis and NSQ senders."""
    client = PubSubHttpClient(emulator_host, timeout)
    return client.publish


def ship_to_pubsub(rows, conf: StreamSinkConf, emulator_host: str,
                   sleep=None) -> int:
    import time as _time

    return ship_rows(rows, conf, pubsub_sender(emulator_host),
                     sleep=sleep if sleep is not None else _time.sleep)


def pubsub_microbatch(spark, conf: PubSubPullConf,
                      max_messages: int = 1000,
                      extend_if_longer_than_s: float | None = None,
                      clock=None):
    """Pull up to `max_messages` into the connector-normal DataFrame.

    At-least-once: acknowledge is DEFERRED until the pull drain
    succeeds (PubsubApp's process-then-ack flow).  If the drain took
    longer than ``extend_if_longer_than_s`` seconds — i.e. the pulled
    messages are close to their ack deadline — the deadline is
    re-extended by durationPerAckExtension (the reference's
    deadline-management behavior) before the final acknowledge; a
    fast drain skips the extra RPC."""
    import time as _time

    from pyspark.sql import types as T

    if not conf.emulator_host:
        raise PubSubError(
            "pubsub_microbatch needs emulator_host (in production the "
            "managed connector consumes the subscription)")
    clock = clock or _time.monotonic
    client = PubSubHttpClient(conf.emulator_host)
    started = clock()
    pulled = []
    while len(pulled) < max_messages:
        page = client.pull(conf.subscription,
                           max_messages - len(pulled))
        if not page:
            break
        pulled.extend(page)
    ack_ids = [p[0] for p in pulled]
    if (extend_if_longer_than_s is not None and ack_ids
            and clock() - started > extend_if_longer_than_s):
        client.modify_ack_deadline(
            conf.subscription, ack_ids,
            conf.duration_per_ack_extension_s)
    client.acknowledge(conf.subscription, ack_ids)
    schema = T.StructType([
        T.StructField("value", T.BinaryType()),
        T.StructField("message_id", T.StringType()),
        T.StructField("ordering_key", T.StringType()),
    ])
    rows = [(bytearray(data), mid, attrs.get("key"))
            for _ack, data, mid, attrs in pulled]
    return spark.createDataFrame(rows, schema)
