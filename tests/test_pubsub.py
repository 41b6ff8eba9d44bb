"""Pub/Sub transport E2E against the fake broker (public v1 REST API):
batched publish with batchSize/requestByteThreshold, whole-batch
transient retry, pull → ack round trip, ack-deadline extension,
reference-HOCON conf decode."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from enrich_spark.sources.connectors import StreamSinkConf
from enrich_spark.sources.pubsub import (
    PubSubError, PubSubHttpClient, PubSubPullConf,
    pubsub_microbatch, pubsub_pull_conf_from_dict, ship_to_pubsub,
)
from tests.fake_pubsub import FakePubSub

REF_CONFIG = "/root/reference/config/config.pubsub.reference.hocon"
TOPIC = "projects/p/topics/enriched"
SUB = "projects/p/subscriptions/enriched-sub"


@pytest.fixture()
def broker():
    b = FakePubSub()
    b.create(TOPIC, SUB)
    yield b
    b.stop()


def test_publish_batching_limits(broker):
    """batchSize 100 / requestByteThreshold (reference values) bound
    each publish request."""
    rows = [(f"k{i}", f"payload-{i}".encode()) for i in range(250)]
    conf = StreamSinkConf(stream_name=TOPIC, record_limit=100,
                          byte_limit=1_000_000)
    ship_to_pubsub(rows, conf, broker.host, sleep=lambda s: None)
    sizes = [len(r["messages"]) for r in broker.publish_requests]
    assert sizes == [100, 100, 50]

    broker.publish_requests.clear()
    rows = [(f"b{i}", b"x" * 1024) for i in range(6)]
    conf = StreamSinkConf(stream_name=TOPIC, record_limit=100,
                          byte_limit=2200)
    ship_to_pubsub(rows, conf, broker.host, sleep=lambda s: None)
    assert all(len(r["messages"]) <= 2 for r in broker.publish_requests)


def test_transient_publish_failure_retries_whole_batch(broker):
    """Pub/Sub has no per-record partial failure: a 503 fails the whole
    request and the whole batch is retried after a backoff
    (transientErrors.delay/attempts in the reference config)."""
    broker.fail_next_publishes = 2
    sleeps = []
    conf = StreamSinkConf(stream_name=TOPIC, record_limit=100,
                          byte_limit=1 << 20, max_retries=5,
                          min_backoff_s=0.1, max_backoff_s=1.0)
    ship_to_pubsub([(f"k{i}", f"p-{i}".encode()) for i in range(3)],
                   conf, broker.host, sleep=sleeps.append)
    assert sleeps == [0.1, 0.2]             # exponential from minBackoff
    assert len(broker.publish_requests) == 1  # only the success recorded
    assert len(broker.topics[TOPIC]) == 3


def test_exhausted_retries_raise(broker):
    broker.fail_next_publishes = 99
    conf = StreamSinkConf(stream_name=TOPIC, max_retries=2,
                          min_backoff_s=0.01, max_backoff_s=0.02)
    with pytest.raises(RuntimeError, match="throttled"):
        ship_to_pubsub([("k", b"v")], conf, broker.host,
                       sleep=lambda s: None)


def test_pull_round_trip_and_ack(broker, spark):
    rows = [(f"key-{i}", f"event-{i}".encode()) for i in range(30)]
    ship_to_pubsub(rows, StreamSinkConf(stream_name=TOPIC, record_limit=10),
                   broker.host, sleep=lambda s: None)
    conf = PubSubPullConf(subscription=SUB, emulator_host=broker.host)
    df = pubsub_microbatch(spark, conf, max_messages=100)
    got = df.collect()
    assert sorted(bytes(r.value) for r in got) == sorted(
        f"event-{i}".encode() for i in range(30))
    assert {r.ordering_key for r in got} == {f"key-{i}" for i in range(30)}
    assert broker.backlog(SUB) == 0        # everything acked post-drain


def test_ack_deadline_extension(broker, spark):
    ship_to_pubsub([("k", b"v")], StreamSinkConf(stream_name=TOPIC),
                   broker.host, sleep=lambda s: None)
    conf = PubSubPullConf(subscription=SUB, emulator_host=broker.host,
                          duration_per_ack_extension_s=15.0)
    pubsub_microbatch(spark, conf, extend_if_longer_than_s=0.0)
    assert broker.deadline_extensions == [("ack-1", 15)]


def test_ack_deadline_not_extended_on_fast_drain(broker, spark):
    ship_to_pubsub([("k", b"v")], StreamSinkConf(stream_name=TOPIC),
                   broker.host, sleep=lambda s: None)
    conf = PubSubPullConf(subscription=SUB, emulator_host=broker.host,
                          duration_per_ack_extension_s=15.0)
    # frozen clock → drain elapsed 0s, under the 5s threshold: the
    # extension RPC must be SKIPPED (the parameter is a threshold,
    # not a boolean flag)
    pubsub_microbatch(spark, conf, extend_if_longer_than_s=5.0,
                      clock=lambda: 100.0)
    assert broker.deadline_extensions == []
    assert broker.backlog(SUB) == 0


def test_microbatch_requires_emulator(spark):
    with pytest.raises(PubSubError, match="emulator_host"):
        pubsub_microbatch(spark, PubSubPullConf(subscription=SUB))


def test_pull_conf_from_reference_hocon():
    from enrich_spark.appconfig import load_app_config

    if not os.path.exists(REF_CONFIG):
        pytest.skip("reference config not present")
    app = load_app_config(REF_CONFIG)
    conf = pubsub_pull_conf_from_dict(app.raw["input"])
    assert conf.subscription.endswith("snowplow-collector-payloads")
    assert conf.duration_per_ack_extension_s == pytest.approx(15.0)
    assert conf.min_remaining_ack_deadline == pytest.approx(0.1)
    assert conf.retry_delay_s == pytest.approx(0.1)   # "100 millis"
    assert conf.retry_attempts == 10


def test_error_surfaces_as_pubsub_error(broker):
    client = PubSubHttpClient(broker.host)
    with pytest.raises(PubSubError, match="404"):
        client.call(f"{SUB}:frobnicate", {})


# -- pull-runner: ack-after-sinks streaming over the wire client ---------


def test_pull_stream_acks_after_process(broker, spark, tmp_path):
    """The pull runner defers acknowledge until the batch processor
    succeeds — then the broker backlog is empty and a further
    process_available is a no-op."""
    from enrich_spark.streaming.pull_runner import (
        PubSubPullSource, PullStreamQuery,
    )

    ship_to_pubsub([(f"k{i}", f"m-{i}".encode()) for i in range(6)],
                   StreamSinkConf(stream_name=TOPIC),
                   broker.host, sleep=lambda s: None)
    conf = PubSubPullConf(subscription=SUB, emulator_host=broker.host)
    seen: list = []
    q = PullStreamQuery(
        spark, PubSubPullSource(conf),
        lambda df, bid: seen.append(
            (bid, sorted(bytes(r.value) for r in df.collect()))),
        str(tmp_path / "ckpt"))
    assert q.process_available() == 1
    assert seen == [(0, sorted(f"m-{i}".encode() for i in range(6)))]
    assert broker.backlog(SUB) == 0
    assert q.process_available() == 0


def test_pull_stream_crash_before_ack_redelivers(broker, spark, tmp_path):
    """Crash inside the batch processor → nothing acked; after the ack
    deadline expires the broker redelivers to a fresh query instance
    (the broker IS the checkpoint for Pub/Sub)."""
    import pytest as _pytest

    from enrich_spark.streaming.pull_runner import (
        PubSubPullSource, PullStreamQuery,
    )

    ship_to_pubsub([("k", b"precious")], StreamSinkConf(stream_name=TOPIC),
                   broker.host, sleep=lambda s: None)
    conf = PubSubPullConf(subscription=SUB, emulator_host=broker.host)
    calls: list = []

    def flaky(df, bid):
        calls.append([bytes(r.value) for r in df.collect()])
        if len(calls) == 1:
            raise RuntimeError("sink exploded")

    q = PullStreamQuery(spark, PubSubPullSource(conf), flaky,
                        str(tmp_path / "ckpt"))
    with _pytest.raises(RuntimeError, match="sink exploded"):
        q.process_available()
    assert broker.backlog(SUB) == 1        # NOT acked
    broker.expire_leases(SUB)              # deadline passes
    q2 = PullStreamQuery(spark, PubSubPullSource(conf), flaky,
                         str(tmp_path / "ckpt"))
    assert q2.process_available() == 1
    assert calls == [[b"precious"], [b"precious"]]
    assert broker.backlog(SUB) == 0


def test_pubsub_concurrent_pulls_overlap_and_stay_exact(broker, spark,
                                                        tmp_path):
    """r11: concurrency>1 keeps several pull requests in flight
    (observed overlap via a counting client); delivery stays exact —
    every message once, acks still deferred to the commit."""
    import threading
    import time as _time

    from enrich_spark.sources.pubsub import PubSubPullConf
    from enrich_spark.streaming.pull_runner import (
        PubSubPullSource, PullStreamQuery,
    )

    class CountingClient(PubSubHttpClient):
        def __init__(self, host):
            super().__init__(host)
            self._mu = threading.Lock()
            self.inflight = 0
            self.max_inflight = 0

        def pull(self, subscription, max_messages=1000):
            with self._mu:
                self.inflight += 1
                self.max_inflight = max(self.max_inflight, self.inflight)
            try:
                _time.sleep(0.02)
                return super().pull(subscription, max_messages)
            finally:
                with self._mu:
                    self.inflight -= 1

    ship_to_pubsub([(f"k{i}", f"m-{i}".encode()) for i in range(60)],
                   StreamSinkConf(stream_name=TOPIC),
                   broker.host, sleep=lambda s: None)
    conf = PubSubPullConf(subscription=SUB, emulator_host=broker.host)
    client = CountingClient(broker.host)
    seen: list = []
    q = PullStreamQuery(
        spark,
        PubSubPullSource(conf, client=client, max_messages=24,
                         concurrency=4),
        lambda df, bid: seen.append([bytes(r.value) for r in df.collect()]),
        str(tmp_path / "ckpt"))
    assert q.process_available() >= 1
    got = sorted(v for batch in seen for v in batch)
    assert got == sorted(f"m-{i}".encode() for i in range(60))
    assert client.max_inflight >= 2, client.max_inflight
    # drained and acked: nothing redelivers
    assert q.process_available() == 0
