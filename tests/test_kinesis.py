"""Kinesis transport E2E against the fake broker (public JSON API):
PutRecords batching limits, per-record throttle → retry/backoff,
shard-iterator drain round trip, source-conf plumbing from the
reference HOCON. Mirrors the NSQ fake-broker suite."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from enrich_spark.sources.connectors import (
    KinesisSourceConf, InitialPosition, StreamSinkConf,
    kinesis_conf_from_dict, kinesis_source_options, sink_conf_from_dict,
)
from enrich_spark.sources.kinesis import (
    KinesisError, KinesisHttpClient, kinesis_microbatch, ship_to_kinesis,
)
from tests.fake_kinesis import FakeKinesis

REF_CONFIG = "/root/reference/config/config.kinesis.reference.hocon"


@pytest.fixture()
def broker():
    b = FakeKinesis(nshards=2)
    b.create_stream("enriched")
    yield b
    b.stop()


def test_put_records_batching_limits(broker):
    """1200 records with recordLimit 500 → 3 PutRecords requests, none
    above 500 records; a tight byteLimit splits further."""
    rows = [(f"k{i}", f"payload-{i}".encode()) for i in range(1200)]
    conf = StreamSinkConf(stream_name="enriched", record_limit=500,
                          byte_limit=5 * 1024 * 1024)
    ship_to_kinesis(rows, conf, broker.endpoint, sleep=lambda s: None)
    sizes = [len(r["Records"]) for r in broker.put_requests]
    assert sizes == [500, 500, 200]
    assert len(broker.all_records("enriched")) == 1200

    # byte limit: 10 × 1 KiB records with a 2.5 KiB budget → 2 per call
    broker.put_requests.clear()
    rows = [(f"b{i}", b"x" * 1024) for i in range(10)]
    conf = StreamSinkConf(stream_name="enriched", record_limit=500,
                          byte_limit=2560)
    ship_to_kinesis(rows, conf, broker.endpoint, sleep=lambda s: None)
    assert all(len(r["Records"]) <= 2 for r in broker.put_requests)


def test_api_limit_ceilings_validated():
    with pytest.raises(ValueError, match="recordLimit"):
        ship_to_kinesis([], StreamSinkConf(record_limit=501), "http://x")
    with pytest.raises(ValueError, match="byteLimit"):
        ship_to_kinesis(
            [], StreamSinkConf(byte_limit=6 * 1024 * 1024), "http://x")


def test_partial_failure_retries_only_failed_records(broker):
    """AWS partial-failure semantics: the first request throttles
    records 2 and 5; ONLY those are resent, after a backoff."""
    broker.throttle_plan = lambda req, i: req == 0 and i in (2, 5)
    rows = [(f"k{i}", f"p-{i}".encode()) for i in range(8)]
    sleeps = []
    conf = StreamSinkConf(stream_name="enriched", record_limit=500,
                          byte_limit=1 << 20, max_retries=3,
                          min_backoff_s=0.1, max_backoff_s=1.0)
    ship_to_kinesis(rows, conf, broker.endpoint, sleep=sleeps.append)
    assert len(broker.put_requests) == 2
    retried = [r["PartitionKey"] for r in broker.put_requests[1]["Records"]]
    assert retried == ["k2", "k5"]
    assert sleeps == [0.1]
    got = {r["PartitionKey"] for r in broker.all_records("enriched")}
    assert got == {f"k{i}" for i in range(8)}


def test_exhausted_retries_raise(broker):
    broker.throttle_plan = lambda req, i: True  # everything, always
    conf = StreamSinkConf(stream_name="enriched", max_retries=2,
                          min_backoff_s=0.01, max_backoff_s=0.02)
    sleeps = []
    with pytest.raises(RuntimeError, match="still\\s+throttled|throttled"):
        ship_to_kinesis([("k", b"v")], conf, broker.endpoint,
                        sleep=sleeps.append)
    # exponential: 0.01, 0.02 (capped)
    assert sleeps == [0.01, 0.02]


def test_round_trip_via_shard_iterators(broker, spark):
    rows = [(f"key-{i}", f"event-{i}".encode()) for i in range(50)]
    ship_to_kinesis(rows, StreamSinkConf(stream_name="enriched"),
                    broker.endpoint, sleep=lambda s: None)
    conf = KinesisSourceConf(stream_name="enriched",
                             endpoint_url=broker.endpoint,
                             max_records=7)  # forces iterator paging
    df = kinesis_microbatch(spark, conf)
    got = df.collect()
    assert sorted(bytes(r.value) for r in got) == sorted(
        f"event-{i}".encode() for i in range(50))
    # per-shard sequence ordering is preserved by the drain
    for sid in {r.shard_id for r in got}:
        seqs = [int(r.sequence_number) for r in got if r.shard_id == sid]
        assert seqs == sorted(seqs)
    # both shards participated (md5 routing spread the keys)
    assert len({r.shard_id for r in got}) == 2


def test_latest_position_skips_backlog(broker, spark):
    ship_to_kinesis([("a", b"old")], StreamSinkConf(stream_name="enriched"),
                    broker.endpoint, sleep=lambda s: None)
    conf = KinesisSourceConf(
        stream_name="enriched", endpoint_url=broker.endpoint,
        initial_position=InitialPosition(type="LATEST"))
    assert kinesis_microbatch(spark, conf).count() == 0


def test_microbatch_requires_custom_endpoint(spark):
    with pytest.raises(KinesisError, match="customEndpoint"):
        kinesis_microbatch(spark, KinesisSourceConf(stream_name="s"))


def test_conf_and_options_from_reference_hocon(monkeypatch):
    from enrich_spark.appconfig import load_app_config

    if not os.path.exists(REF_CONFIG):
        pytest.skip("reference config not present")
    monkeypatch.setenv("HOSTNAME", "worker-1")  # ${HOSTNAME} substitution
    app = load_app_config(REF_CONFIG)
    src = kinesis_conf_from_dict(app.raw["input"])
    assert src.stream_name == "snowplow-collector-payloads"
    assert src.initial_position.type == "TRIM_HORIZON"
    assert src.retrieval_mode == "Polling"
    opts = kinesis_source_options(src)
    assert opts["streamName"] == "snowplow-collector-payloads"
    good = sink_conf_from_dict(app.raw["output"]["good"])
    assert good.stream_name == "snowplow-enriched"
    assert good.max_retries == 10
    assert good.min_backoff_s == pytest.approx(0.1)


def test_error_body_surfaces_as_kinesis_error(broker):
    client = KinesisHttpClient(broker.endpoint)
    with pytest.raises(KinesisError, match="UnknownOperationException"):
        client.call("DeleteEverything", {})


# -- pull-runner: checkpointed streaming over the wire client ------------


def _pull_query(spark, broker, ckpt, processed, stream="collected",
                max_records=5):
    from enrich_spark.sources.connectors import KinesisSourceConf
    from enrich_spark.streaming.pull_runner import (
        KinesisPullSource, PullStreamQuery,
    )

    conf = KinesisSourceConf(stream_name=stream,
                             endpoint_url=broker.endpoint,
                             max_records=max_records)
    src = KinesisPullSource(conf)

    def process(df, batch_id):
        processed.append(
            (batch_id, sorted(bytes(r.value) for r in df.collect())))

    return PullStreamQuery(spark, src, process, ckpt)


def test_pull_stream_resumes_from_sequence_numbers(broker, spark, tmp_path):
    """Kill/recover cycle: a NEW query instance on the same checkpoint
    resumes each shard AFTER its last processed sequence number — no
    replays, no gaps (the KCL checkpoint flow)."""
    broker.create_stream("collected")
    ship_to_kinesis([(f"k{i}", f"rec-{i}".encode()) for i in range(20)],
                    StreamSinkConf(stream_name="collected"),
                    broker.endpoint, sleep=lambda s: None)
    ckpt = str(tmp_path / "ckpt")
    seen: list = []
    q1 = _pull_query(spark, broker, ckpt, seen)
    assert q1.process_available() == 1
    assert sorted(b for _, batch in seen for b in batch) == sorted(
        f"rec-{i}".encode() for i in range(20))

    # ship 10 more, then "crash" — a fresh instance from the same
    # checkpoint must deliver ONLY the new records
    ship_to_kinesis([(f"k{i}", f"new-{i}".encode()) for i in range(10)],
                    StreamSinkConf(stream_name="collected"),
                    broker.endpoint, sleep=lambda s: None)
    seen2: list = []
    q2 = _pull_query(spark, broker, ckpt, seen2)
    assert q2.process_available() == 1
    assert seen2[0][0] == 1                      # batch ids continue
    assert sorted(b for _, batch in seen2 for b in batch) == sorted(
        f"new-{i}".encode() for i in range(10))
    # drained: a further call is a no-op
    assert q2.process_available() == 0


def test_pull_stream_crash_before_commit_replays(broker, spark, tmp_path):
    """A failure inside the batch processor leaves the checkpoint
    untouched; the retry re-delivers the SAME records with the SAME
    batch id (at-least-once)."""
    broker.create_stream("collected")
    ship_to_kinesis([("k", b"only-record")],
                    StreamSinkConf(stream_name="collected"),
                    broker.endpoint, sleep=lambda s: None)
    ckpt = str(tmp_path / "ckpt")
    calls: list = []

    from enrich_spark.sources.connectors import KinesisSourceConf
    from enrich_spark.streaming.pull_runner import (
        KinesisPullSource, PullStreamQuery,
    )

    conf = KinesisSourceConf(stream_name="collected",
                             endpoint_url=broker.endpoint)

    def flaky(df, batch_id):
        calls.append((batch_id, [bytes(r.value) for r in df.collect()]))
        if len(calls) == 1:
            raise RuntimeError("sink exploded mid-batch")

    q = PullStreamQuery(spark, KinesisPullSource(conf), flaky, ckpt)
    with pytest.raises(RuntimeError, match="sink exploded"):
        q.process_available()
    # restart (fresh instance, same checkpoint): replay, same batch id
    q2 = PullStreamQuery(spark, KinesisPullSource(conf), flaky, ckpt)
    assert q2.process_available() == 1
    assert calls == [(0, [b"only-record"]), (0, [b"only-record"])]


def test_run_pull_stream_full_pipeline(broker, spark, tmp_path):
    """run_pull_stream = the whole enrichment pipeline behind the
    Kinesis pull loop: thrift payloads in the stream land as 131-column
    enriched TSV in the good sink."""
    import json as _json

    from enrich_spark.loaders.thrift import encode_payload
    from enrich_spark.streaming.pull_runner import (
        KinesisPullSource, run_pull_stream,
    )
    from enrich_spark.streaming.runner import StreamConfig, StreamSinks
    from enrich_spark.sources.connectors import KinesisSourceConf

    broker.create_stream("collected")
    payload = encode_payload(dict(
        path="/com.snowplowanalytics.snowplow/tp2",
        timestamp=1700000000000,
        collector="ssc-test",
        body=_json.dumps({
            "schema": ("iglu:com.snowplowanalytics.snowplow/"
                       "payload_data/jsonschema/1-0-4"),
            "data": [{"e": "pv", "aid": "app", "p": "web",
                      "tv": "js-3.0.0"}],
        }),
        content_type="application/json",
    ))
    ship_to_kinesis([("k", payload), ("g", b"garbage-bytes")],
                    StreamSinkConf(stream_name="collected"),
                    broker.endpoint, sleep=lambda s: None)

    sinks = StreamSinks(good_path=str(tmp_path / "good"),
                        bad_path=str(tmp_path / "bad"))
    cfg = StreamConfig(checkpoint=str(tmp_path / "ckpt"))
    conf = KinesisSourceConf(stream_name="collected",
                             endpoint_url=broker.endpoint)
    q = run_pull_stream(spark, KinesisPullSource(conf), sinks, cfg)
    assert q.process_available() == 1
    good = spark.read.text(sinks.good_path).collect()
    assert len(good) == 1 and len(good[0].value.split("\t")) == 131
    assert len(spark.read.text(sinks.bad_path).collect()) == 1


def test_pull_stream_batch_cap_splits_deep_backlog(broker, spark, tmp_path):
    """A deep backlog drains as SEVERAL bounded microbatches (driver
    memory per batch is capped), with no loss and no duplicates."""
    broker.create_stream("collected")
    ship_to_kinesis([(f"k{i}", f"r-{i}".encode()) for i in range(40)],
                    StreamSinkConf(stream_name="collected"),
                    broker.endpoint, sleep=lambda s: None)
    from enrich_spark.sources.connectors import KinesisSourceConf
    from enrich_spark.streaming.pull_runner import (
        KinesisPullSource, PullStreamQuery,
    )

    conf = KinesisSourceConf(stream_name="collected",
                             endpoint_url=broker.endpoint, max_records=5)
    seen: list = []
    q = PullStreamQuery(
        spark, KinesisPullSource(conf, max_batch_records=12),
        lambda df, bid: seen.append([bytes(r.value) for r in df.collect()]),
        str(tmp_path / "ckpt"))
    nb = q.process_available()
    assert nb >= 3                               # split, not one batch
    assert all(len(batch) <= 12 + 4 for batch in seen)  # cap ± one page
    got = sorted(b for batch in seen for b in batch)
    assert got == sorted(f"r-{i}".encode() for i in range(40))


def test_pull_stream_run_loop_stop_when(broker, spark, tmp_path):
    """run(): the polling loop honors stop_when and drains what is
    available before stopping."""
    broker.create_stream("collected")
    ship_to_kinesis([("k", b"looped")],
                    StreamSinkConf(stream_name="collected"),
                    broker.endpoint, sleep=lambda s: None)
    from enrich_spark.sources.connectors import KinesisSourceConf
    from enrich_spark.streaming.pull_runner import (
        KinesisPullSource, PullStreamQuery,
    )

    conf = KinesisSourceConf(stream_name="collected",
                             endpoint_url=broker.endpoint)
    seen: list = []
    ticks = iter([False, False, True, True, True])
    q = PullStreamQuery(
        spark, KinesisPullSource(conf),
        lambda df, bid: seen.append([bytes(r.value) for r in df.collect()]),
        str(tmp_path / "ckpt"))
    q.run(poll_seconds=0.01, stop_when=lambda: next(ticks))
    assert seen == [[b"looped"]]


def test_pull_stream_concurrent_shard_drain_kill_recover(spark, tmp_path):
    """r11: 8 shards drain CONCURRENTLY (per-shard worker threads — the
    KCL concurrent-record-processor model), verified by observed
    GetRecords overlap; exactness is unchanged — no loss, no dup, and a
    kill/recover cycle on the same checkpoint delivers only new
    records."""
    import threading
    import time as _time

    from enrich_spark.streaming.pull_runner import (
        KinesisPullSource, PullStreamQuery,
    )

    class CountingClient(KinesisHttpClient):
        def __init__(self, endpoint):
            super().__init__(endpoint)
            self._mu = threading.Lock()
            self.inflight = 0
            self.max_inflight = 0

        def get_records(self, iterator, limit=750):
            with self._mu:
                self.inflight += 1
                self.max_inflight = max(self.max_inflight, self.inflight)
            try:
                _time.sleep(0.02)   # widen the overlap window
                return super().get_records(iterator, limit=limit)
            finally:
                with self._mu:
                    self.inflight -= 1

    b = FakeKinesis(nshards=8)
    try:
        b.create_stream("wide")
        ship_to_kinesis([(f"key-{i}", f"rec-{i}".encode())
                         for i in range(80)],
                        StreamSinkConf(stream_name="wide"),
                        b.endpoint, sleep=lambda s: None)
        client = CountingClient(b.endpoint)
        conf = KinesisSourceConf(stream_name="wide",
                                 endpoint_url=b.endpoint, max_records=3)
        ckpt = str(tmp_path / "ckpt")
        seen: list = []
        q = PullStreamQuery(
            spark, KinesisPullSource(conf, client=client),
            lambda df, bid: seen.append(
                [(r.shard_id, r.sequence_number, bytes(r.value))
                 for r in df.collect()]),
            ckpt)
        assert q.process_available() >= 1
        got = sorted(v for batch in seen for _, _, v in batch)
        assert got == sorted(f"rec-{i}".encode() for i in range(80))
        # concurrency actually happened: >= 4 GetRecords in flight at
        # once across the 8 shard workers
        assert client.max_inflight >= 4, client.max_inflight
        # per-shard ordering preserved within each batch
        for batch in seen:
            by_shard: dict = {}
            for sid, seq, _ in batch:
                by_shard.setdefault(sid, []).append(int(seq))
            for seqs in by_shard.values():
                assert seqs == sorted(seqs)

        # kill/recover: fresh instance, same checkpoint — only the new
        # records arrive, each exactly once
        ship_to_kinesis([(f"key-{i}", f"new-{i}".encode())
                         for i in range(16)],
                        StreamSinkConf(stream_name="wide"),
                        b.endpoint, sleep=lambda s: None)
        seen2: list = []
        q2 = PullStreamQuery(
            spark, KinesisPullSource(conf, client=CountingClient(b.endpoint)),
            lambda df, bid: seen2.append(
                [bytes(r.value) for r in df.collect()]),
            ckpt)
        assert q2.process_available() >= 1
        got2 = sorted(v for batch in seen2 for v in batch)
        assert got2 == sorted(f"new-{i}".encode() for i in range(16))
        assert q2.process_available() == 0
    finally:
        b.stop()


def test_fanout_subscribe_to_shard_wire(broker):
    """RegisterStreamConsumer + SubscribeToShard round trip: records
    arrive with a continuation, resubscribing from the continuation
    yields only what came after, unknown consumers are rejected."""
    ship_to_kinesis([(f"k{i}", f"v{i}".encode()) for i in range(6)],
                    StreamSinkConf(stream_name="enriched"),
                    broker.endpoint, sleep=lambda s: None)
    client = KinesisHttpClient(broker.endpoint)
    arn = client.register_stream_consumer("enriched", "t1")
    assert "consumer/t1" in arn
    sid = client.list_shards("enriched")[0]
    recs, cont = client.subscribe_to_shard(arn, sid,
                                           position="TRIM_HORIZON")
    assert cont == (recs[-1][2] if recs else None)
    # continuation: nothing new yet -> empty event, same continuation
    recs2, cont2 = client.subscribe_to_shard(arn, sid,
                                             sequence_number=cont)
    assert recs2 == [] and cont2 == cont
    with pytest.raises(KinesisError, match="unknown consumer"):
        client.subscribe_to_shard("arn:bogus", sid,
                                  position="TRIM_HORIZON")


def test_fanout_push_stream_kill_recover(spark, tmp_path):
    """Enhanced fan-out E2E: per-shard subscriber threads PUSH records
    into the source across microbatches (subscribe_calls keeps growing
    while idle — the continuous-subscription model), no loss/no dup,
    per-shard order preserved, and a kill/recover cycle on the same
    checkpoint delivers only the new records."""
    import time as _time

    from enrich_spark.streaming.pull_runner import (
        KinesisFanoutSource, PullStreamQuery,
    )

    b = FakeKinesis(nshards=4)
    try:
        b.create_stream("fan")
        ship_to_kinesis([(f"key-{i}", f"rec-{i}".encode())
                         for i in range(40)],
                        StreamSinkConf(stream_name="fan"),
                        b.endpoint, sleep=lambda s: None)
        conf = KinesisSourceConf(stream_name="fan",
                                 endpoint_url=b.endpoint,
                                 retrieval_mode="FanOut")
        ckpt = str(tmp_path / "ckpt")
        seen: list = []
        src = KinesisFanoutSource(conf, idle_wait_s=1.0)
        q = PullStreamQuery(
            spark, src,
            lambda df, bid: seen.append(
                [(r.shard_id, r.sequence_number, bytes(r.value))
                 for r in df.collect()]),
            ckpt)
        assert q.process_available() >= 1
        got = sorted(v for batch in seen for _, _, v in batch)
        assert got == sorted(f"rec-{i}".encode() for i in range(40))
        for batch in seen:                    # per-shard order holds
            by_shard: dict = {}
            for sid, seq, _ in batch:
                by_shard.setdefault(sid, []).append(int(seq))
            for seqs in by_shard.values():
                assert seqs == sorted(seqs)
        # the PUSH property: subscriptions keep cycling while no batch
        # is being assembled (threads long-poll in the background)
        calls_before = b.subscribe_calls
        _time.sleep(0.3)
        assert b.subscribe_calls > calls_before
        src.close()

        # kill/recover on the same checkpoint: only new records, once
        ship_to_kinesis([(f"key-{i}", f"new-{i}".encode())
                         for i in range(12)],
                        StreamSinkConf(stream_name="fan"),
                        b.endpoint, sleep=lambda s: None)
        seen2: list = []
        src2 = KinesisFanoutSource(conf, idle_wait_s=1.0)
        q2 = PullStreamQuery(
            spark, src2,
            lambda df, bid: seen2.append(
                [bytes(r.value) for r in df.collect()]),
            ckpt)
        assert q2.process_available() >= 1
        got2 = sorted(v for batch in seen2 for v in batch)
        assert got2 == sorted(f"new-{i}".encode() for i in range(12))
        assert q2.process_available() == 0
        src2.close()
    finally:
        b.stop()


def test_fanout_persistent_subscribe_failure_surfaces(spark):
    """r13 (ADVICE): a permanent broker error (revoked consumer, bad
    ARN, broker gone) must not leave the stream silently idle — the
    subscriber loop counts consecutive failures with escalating
    backoff, shard_errors() exposes the broken shards, and pull()
    raises once every shard is persistently failing with nothing
    buffered."""
    import time as _time

    from enrich_spark.streaming.pull_runner import KinesisFanoutSource

    class BrokenClient:
        def register_stream_consumer(self, stream, name):
            return f"arn:fake:consumer/{name}"

        def list_shards(self, stream):
            return ["shardId-000", "shardId-001"]

        def subscribe_to_shard(self, arn, shard_id, position=None,
                               sequence_number=None):
            raise KinesisError("ResourceNotFoundException: consumer "
                               "deregistered")

    conf = KinesisSourceConf(stream_name="gone",
                             endpoint_url="http://unused",
                             retrieval_mode="FanOut")
    src = KinesisFanoutSource(conf, client=BrokenClient(),
                              idle_wait_s=0.05)
    src.persistent_failure_threshold = 3
    try:
        deadline = _time.monotonic() + 30.0
        with pytest.raises(KinesisError, match="persistent subscribe"):
            while _time.monotonic() < deadline:
                out, _, _ = src.pull(spark, {})
                assert out is None   # nothing ever arrives
            raise AssertionError("pull() never surfaced the failure")
        errs = src.shard_errors()
        assert set(errs) == {"shardId-000", "shardId-001"}
        assert "ResourceNotFound" in errs["shardId-000"]
    finally:
        src.close()


def test_fanout_multi_event_batches_and_buffer_bound(spark, tmp_path):
    """r13 (verdict #9): the fake broker now serves SubscribeToShard
    as SEVERAL chained events per call (intra-call continuation — the
    HTTP/2 event-stream shape). The runner must (a) consume every
    event of a response, no loss/no dup, per-shard order intact, and
    (b) hold the STRICT per-shard buffer bound even when one response
    carries more records than buffer_per_shard (chunked admission —
    the old whole-batch wait would deadlock). Remaining fidelity
    boundary: one JSON response per request, not h2 frames."""
    import threading as _th
    import time as _time

    from enrich_spark.streaming.pull_runner import (
        KinesisFanoutSource, PullStreamQuery,
    )

    b = FakeKinesis(nshards=2)
    try:
        b.create_stream("fan2")
        b.fanout_event_cap = 4            # small events...
        b.fanout_events_per_call = 3      # ...several per call
        ship_to_kinesis([(f"key-{i}", f"rec-{i}".encode())
                         for i in range(60)],
                        StreamSinkConf(stream_name="fan2"),
                        b.endpoint, sleep=lambda s: None)
        conf = KinesisSourceConf(stream_name="fan2",
                                 endpoint_url=b.endpoint,
                                 retrieval_mode="FanOut")
        # buffer smaller than one response's max (3×4=12 > 5): only
        # chunked admission can satisfy the bound without deadlock
        src = KinesisFanoutSource(conf, idle_wait_s=1.0,
                                  buffer_per_shard=5)
        max_seen = {"n": 0}
        stop = _th.Event()

        def sample():
            while not stop.is_set():
                with src._cond:
                    for buf in src._buf.values():
                        max_seen["n"] = max(max_seen["n"], len(buf))
                _time.sleep(0.002)

        sampler = _th.Thread(target=sample, daemon=True)
        sampler.start()
        seen: list = []
        q = PullStreamQuery(
            spark, src,
            lambda df, bid: seen.append(
                [(r.shard_id, r.sequence_number, bytes(r.value))
                 for r in df.collect()]),
            str(tmp_path / "ckpt"))
        assert q.process_available() >= 1
        stop.set()
        sampler.join(timeout=2.0)
        got = sorted(v for batch in seen for _, _, v in batch)
        assert got == sorted(f"rec-{i}".encode() for i in range(60))
        for batch in seen:                    # per-shard order holds
            by_shard: dict = {}
            for sid, seq, _ in batch:
                by_shard.setdefault(sid, []).append(int(seq))
            for seqs in by_shard.values():
                assert seqs == sorted(seqs)
        assert 0 < max_seen["n"] <= 5         # strict bound held
        src.close()
    finally:
        b.stop()


def test_fanout_single_dead_shard_surfaces_on_idle(spark):
    """r13 self-review: ONE permanently failing shard among healthy
    ones is partial data loss, not an idle stream — healthy shards'
    records still deliver, but once the stream would otherwise report
    idle, pull() raises naming the dead shard."""
    import time as _time

    from enrich_spark.streaming.pull_runner import KinesisFanoutSource

    class HalfBrokenClient:
        def register_stream_consumer(self, stream, name):
            return f"arn:fake:consumer/{name}"

        def list_shards(self, stream):
            return ["shardId-000", "shardId-001"]

        def subscribe_to_shard(self, arn, shard_id, position=None,
                               sequence_number=None):
            if shard_id == "shardId-001":
                raise KinesisError("ResourceNotFoundException")
            if sequence_number is None:
                return ([("k0", b"healthy-rec", "1", None)], "1")
            return ([], sequence_number)       # healthy shard idle

    conf = KinesisSourceConf(stream_name="half",
                             endpoint_url="http://unused",
                             retrieval_mode="FanOut")
    src = KinesisFanoutSource(conf, client=HalfBrokenClient(),
                              idle_wait_s=0.05)
    src.persistent_failure_threshold = 3
    try:
        # the healthy shard's record must deliver first
        deadline = _time.monotonic() + 10.0
        df = None
        while df is None and _time.monotonic() < deadline:
            df, state, _ = src.pull(spark, {})
        assert df is not None
        assert [bytes(r.value) for r in df.collect()] == [b"healthy-rec"]
        # then the idle stream surfaces the dead shard
        deadline = _time.monotonic() + 30.0
        with pytest.raises(KinesisError,
                           match="1/2.*persistent subscribe"):
            while _time.monotonic() < deadline:
                out, _, _ = src.pull(spark, state)
                assert out is None
            raise AssertionError("dead shard never surfaced")
        assert set(src.shard_errors()) == {"shardId-001"}
    finally:
        src.close()


def test_fanout_dead_shard_surfaces_on_busy_stream(spark):
    """r14 (r13 advice): a persistently failing shard must surface
    even when the OTHER shards keep producing — the pre-drain check
    bounds the silent-loss window to one persistent-failure detection,
    not 'until the stream next goes idle' (which on a busy stream is
    never)."""
    import time as _time

    from enrich_spark.sources.kinesis import KinesisError, KinesisSourceConf
    from enrich_spark.streaming.pull_runner import KinesisFanoutSource

    class BusyHalfBrokenClient:
        def __init__(self):
            self.n = 0

        def register_stream_consumer(self, stream, name):
            return f"arn:fake:consumer/{name}"

        def list_shards(self, stream):
            return ["shardId-000", "shardId-001"]

        def subscribe_to_shard(self, arn, shard_id, position=None,
                               sequence_number=None):
            if shard_id == "shardId-001":
                raise KinesisError("ResourceNotFoundException")
            # the healthy shard NEVER idles — every call has a record
            self.n += 1
            return ([("k", f"busy-{self.n}".encode(), str(self.n),
                      None)], str(self.n))

    conf = KinesisSourceConf(stream_name="busy-half",
                             endpoint_url="http://unused",
                             retrieval_mode="FanOut")
    src = KinesisFanoutSource(conf, client=BusyHalfBrokenClient(),
                              idle_wait_s=0.05)
    src.persistent_failure_threshold = 3
    try:
        deadline = _time.monotonic() + 30.0
        state, delivered = {}, 0
        with pytest.raises(KinesisError,
                           match="1/2.*persistent subscribe"):
            while _time.monotonic() < deadline:
                df, state, _ = src.pull(spark, state)
                if df is not None:
                    delivered += df.count()   # stream stays busy
            raise AssertionError(
                "dead shard never surfaced on busy stream")
        assert set(src.shard_errors()) == {"shardId-001"}
    finally:
        src.close()
