"""Kinesis transport over the public JSON API (PutRecords /
ListShards / GetShardIterator / GetRecords).

Reference surface: the Kinesis app is the reference's primary
deployment (modules/kinesis/.../KinesisApp.scala:21; stream + retry
config in config.kinesis.reference.hocon:7-128). In production the
source side is a Structured Streaming connector / KCL consumer —
this module implements the wire protocol itself (stdlib urllib, JSON
x-amz-json-1.1 envelope) for the ``customEndpoint`` path the reference
exposes for localstack-style endpoints, so the PutRecords batching /
partial-failure retry and the shard-iterator drain are exercised
against a real HTTP broker in-sandbox (tests/fake_kinesis.py), the
same way the NSQ transport is (sources/nsq.py + fake_nsqd).

Signing: unsigned by default (a custom endpoint is a dev endpoint);
pass ``credentials=AwsCredentials(...)`` + ``region`` to SigV4-sign
every request (sources/sigv4.py, stdlib implementation of the public
signing spec, cross-validated against botocore in tests/test_sigv4.py)
— the real-AWS path for environments without the managed connector.
Batching limits, per-record failure semantics, backoff, iterator
paging and sequence ordering are all here either way.
"""

from __future__ import annotations

import base64
import json
import urllib.request

from .connectors import KinesisSourceConf, StreamSinkConf, ship_rows

_TARGET_PREFIX = "Kinesis_20131202"

# AWS PutRecords hard limits (public API contract): a request may carry
# at most 500 records and 5 MiB including partition keys. ship_rows
# enforces them via StreamSinkConf; these are the ceilings configs are
# validated against.
MAX_RECORDS_PER_REQUEST = 500
MAX_BYTES_PER_REQUEST = 5 * 1024 * 1024


class KinesisError(RuntimeError):
    pass


class KinesisHttpClient:
    """Minimal x-amz-json-1.1 client for one endpoint. Picklable, so
    senders built on it can ship from executors.

    Unsigned by default (dev/localstack endpoints); pass credentials +
    region to SigV4-sign every request (sources/sigv4.py — the real-AWS
    path)."""

    def __init__(self, endpoint_url: str, timeout: float = 10.0,
                 credentials=None, region: str | None = None):
        self.endpoint_url = endpoint_url.rstrip("/")
        self.timeout = timeout
        self.credentials = credentials
        self.region = region

    def call(self, action: str, payload: dict) -> dict:
        body = json.dumps(payload).encode("utf-8")
        headers = {
            "Content-Type": "application/x-amz-json-1.1",
            "X-Amz-Target": f"{_TARGET_PREFIX}.{action}",
        }
        if self.credentials is not None:
            from .sigv4 import sign_request

            headers = sign_request(
                "POST", self.endpoint_url, headers, body,
                self.credentials, self.region or "us-east-1", "kinesis")
        req = urllib.request.Request(
            self.endpoint_url,
            data=body,
            headers=headers,
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:  # structured AWS error body
            try:
                body = json.loads(e.read().decode("utf-8"))
                raise KinesisError(
                    f"{action}: {body.get('__type', e.code)}: "
                    f"{body.get('message', '')}") from e
            except (ValueError, KeyError):
                raise KinesisError(f"{action}: HTTP {e.code}") from e

    # -- producer ---------------------------------------------------------
    def put_records(self, stream: str,
                    batch: list[tuple[str, bytes]]) -> list[int]:
        """One PutRecords request. Returns the indices that failed
        (AWS partial-failure semantics: per-record ErrorCode)."""
        resp = self.call("PutRecords", {
            "StreamName": stream,
            "Records": [
                {"Data": base64.b64encode(data).decode("ascii"),
                 "PartitionKey": key}
                for key, data in batch
            ],
        })
        if not resp.get("FailedRecordCount"):
            return []
        return [i for i, rec in enumerate(resp.get("Records", []))
                if "ErrorCode" in rec]

    # -- consumer ---------------------------------------------------------
    def list_shards(self, stream: str) -> list[str]:
        resp = self.call("ListShards", {"StreamName": stream})
        return [s["ShardId"] for s in resp.get("Shards", [])]

    def shard_iterator(self, stream: str, shard_id: str,
                       position: str = "TRIM_HORIZON",
                       timestamp: str | None = None,
                       sequence_number: str | None = None) -> str:
        payload = {"StreamName": stream, "ShardId": shard_id,
                   "ShardIteratorType": position}
        if position == "AT_TIMESTAMP" and timestamp is not None:
            payload["Timestamp"] = timestamp
        if position in ("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER"):
            payload["StartingSequenceNumber"] = sequence_number
        return self.call("GetShardIterator", payload)["ShardIterator"]

    def get_records(self, iterator: str, limit: int = 750):
        """→ (records, next_iterator); each record is
        (partition_key, bytes, sequence_number, arrival_ts)."""
        resp = self.call("GetRecords",
                         {"ShardIterator": iterator, "Limit": limit})
        recs = [
            (r["PartitionKey"], base64.b64decode(r["Data"]),
             r["SequenceNumber"], r.get("ApproximateArrivalTimestamp"))
            for r in resp.get("Records", [])
        ]
        return recs, resp.get("NextShardIterator")

    # -- enhanced fan-out (SubscribeToShard push retrieval) ----------------
    def register_stream_consumer(self, stream: str, name: str) -> str:
        """RegisterStreamConsumer → consumer ARN (the fan-out handle;
        reference retrieval mode FanOut,
        config.kinesis.reference.hocon:32-35)."""
        resp = self.call("RegisterStreamConsumer", {
            "StreamARN": f"arn:aws:kinesis:local:000000000000:stream"
                         f"/{stream}",
            "ConsumerName": name,
        })
        return resp["Consumer"]["ConsumerARN"]

    def subscribe_to_shard(self, consumer_arn: str, shard_id: str,
                           position: str = "TRIM_HORIZON",
                           sequence_number: str | None = None):
        """One SubscribeToShard exchange → (records, continuation_seq).

        Real AWS streams SubscribeToShardEvents over HTTP/2 for up to
        5 minutes per subscription; this client consumes the fake
        broker's JSON long-poll form — one event per call, records +
        ContinuationSequenceNumber — so the caller's loop (subscribe →
        consume → resubscribe from the continuation) is the SAME
        control flow an HTTP/2 consumer runs at its 5-minute
        boundaries. Record tuples match get_records."""
        pos: dict = {"Type": position}
        if sequence_number is not None:
            pos = {"Type": "AFTER_SEQUENCE_NUMBER",
                   "SequenceNumber": sequence_number}
        resp = self.call("SubscribeToShard", {
            "ConsumerARN": consumer_arn,
            "ShardId": shard_id,
            "StartingPosition": pos,
        })
        events = resp.get("Events", [])
        recs = [
            (r["PartitionKey"], base64.b64decode(r["Data"]),
             r["SequenceNumber"], r.get("ApproximateArrivalTimestamp"))
            for ev in events for r in ev.get("Records", [])
        ]
        cont = (events[-1].get("ContinuationSequenceNumber")
                if events else sequence_number)
        return recs, cont


def kinesis_sender(endpoint_url: str, timeout: float = 10.0):
    """``send(stream, batch) -> failed indices`` for ship_rows /
    stream_sink_writer — the same injection point the NSQ sender uses."""
    client = KinesisHttpClient(endpoint_url, timeout)
    return client.put_records


def ship_to_kinesis(rows, conf: StreamSinkConf, endpoint_url: str,
                    sleep=None) -> int:
    """Batched PutRecords with partial-failure retry + exponential
    backoff (Retries.scala semantics via connectors.ship_rows)."""
    import time as _time

    if conf.record_limit > MAX_RECORDS_PER_REQUEST:
        raise ValueError(
            f"recordLimit {conf.record_limit} exceeds the PutRecords "
            f"API maximum {MAX_RECORDS_PER_REQUEST}")
    if conf.byte_limit > MAX_BYTES_PER_REQUEST:
        raise ValueError(
            f"byteLimit {conf.byte_limit} exceeds the PutRecords "
            f"API maximum {MAX_BYTES_PER_REQUEST}")
    return ship_rows(rows, conf, kinesis_sender(endpoint_url),
                     sleep=sleep if sleep is not None else _time.sleep)


def kinesis_microbatch(spark, conf: KinesisSourceConf,
                       max_records: int | None = None):
    """Drain every shard of the stream from the configured initial
    position into a DataFrame with the connector-normal shape. The
    Polling retrieval mode's maxRecords caps each GetRecords page
    (config.kinesis.reference.hocon:24-28); drain stops at an empty
    page (caught-up shard) — at-least-once, like the KCL checkpoint
    flow, with checkpointing owned by the streaming shell."""
    from pyspark.sql import types as T

    if not conf.endpoint_url:
        raise KinesisError(
            "kinesis_microbatch needs customEndpoint (in production the "
            "managed Structured Streaming connector consumes the stream)")
    client = KinesisHttpClient(conf.endpoint_url)
    page = max_records or conf.max_records
    rows = []
    for shard_id in client.list_shards(conf.stream_name):
        it = client.shard_iterator(
            conf.stream_name, shard_id,
            position=conf.initial_position.type,
            timestamp=conf.initial_position.timestamp)
        while it:
            recs, it = client.get_records(it, limit=page)
            if not recs:
                break
            for key, data, seq, ts in recs:
                rows.append((bytearray(data), key, seq, shard_id,
                             float(ts) if ts is not None else None))
    schema = T.StructType([
        T.StructField("value", T.BinaryType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("sequence_number", T.StringType()),
        T.StructField("shard_id", T.StringType()),
        T.StructField("arrival_ts", T.DoubleType()),
    ])
    return spark.createDataFrame([tuple(r) for r in rows], schema)
