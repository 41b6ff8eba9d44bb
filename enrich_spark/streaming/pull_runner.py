"""Driver-side microbatch loop for PULL sources (Kinesis, Pub/Sub) —
the missing glue between the wire clients (sources/kinesis.py,
sources/pubsub.py) and the streaming shell, so a user gets the
reference's primary deployments (KinesisApp.scala:21, PubsubApp) as
one call: ``run_pull_stream(spark, source, sinks, cfg)``.

Kafka rides Spark's built-in Structured Streaming connector; Kinesis
and Pub/Sub have no DSv2 connector in this environment, so this module
reimplements Structured Streaming's microbatch contract at the driver:

    pull → foreachBatch-process (all sinks) → commit

with the COMMIT strictly after the sinks succeed — a crash anywhere
before the commit replays the batch on restart (at-least-once, the
same guarantee the reference implements with ack tokens,
core/Processing.scala:321-322).

The commit is source-shaped:

- **Kinesis** (KCL checkpoint flow): per-shard last-processed sequence
  numbers persisted in a local checkpoint file (atomic tmp+rename);
  restart resumes each shard with an AFTER_SEQUENCE_NUMBER iterator.
  Shards unseen at checkpoint time start from the configured initial
  position (new shards after a reshard are picked up the same way).
- **Pub/Sub**: the broker IS the checkpoint — acknowledge() is the
  commit, deferred until the sinks are written; unacked messages
  redeliver after the ack deadline.

At scale the pull itself is driver-side (the wire clients are the
dev/localstack path — SigV4 and the managed connectors are the
production answer, sources/kinesis.py:15-19); the PROCESSING of each
batch is the full distributed pipeline, so executor parallelism is
unchanged. The pull is CONCURRENT within a microbatch (r11): Kinesis
shards drain on per-shard worker threads (the KCL concurrent-record-
processor model) and Pub/Sub keeps several pull requests in flight —
a sequential loop would cap ingest at one round-trip at a time at
hundreds of shards. Each pull is capped (a per-shard budget slices
max_batch_records; maxMessages per Pub/Sub batch), bounding driver
memory per batch.

Both reference Kinesis retrieval modes exist (r12): ``retrievalMode
Polling`` → :class:`KinesisPullSource` (GetRecords drain per batch);
``FanOut`` → :class:`KinesisFanoutSource` (RegisterStreamConsumer +
continuous per-shard SubscribeToShard push threads feeding bounded
buffers — config.kinesis.reference.hocon:32-35).
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "KinesisFanoutSource", "KinesisPullSource", "PubSubPullSource",
    "PullStreamQuery", "run_pull_stream",
]


class KinesisPullSource:
    """One pull = drain every shard from its checkpointed sequence
    number (AFTER_SEQUENCE_NUMBER) or the configured initial position,
    page by page until caught up.

    Shards drain CONCURRENTLY — one worker thread per shard (capped by
    ``max_shard_threads``), the KCL's concurrent-record-processor model
    (reference KinesisApp.scala:21 + fan-out config,
    config.kinesis.reference.hocon:32-35): at hundreds of shards a
    sequential loop caps ingest at one GetRecords round-trip at a time
    regardless of executor count, while per-shard threads keep every
    shard's iterator in flight. Per-shard ordering is preserved (one
    thread owns a shard end to end); cross-shard ordering was never a
    Kinesis guarantee. The HTTP client is stateless per request, so one
    client instance is shared safely."""

    def __init__(self, conf, client=None,
                 max_batch_records: int = 100_000,
                 max_shard_threads: int = 16):
        from ..sources.kinesis import KinesisError, KinesisHttpClient

        if client is None:
            if not conf.endpoint_url:
                raise KinesisError(
                    "KinesisPullSource needs customEndpoint (in "
                    "production the managed connector consumes the "
                    "stream)")
            client = KinesisHttpClient(conf.endpoint_url)
        self.conf = conf
        self.client = client
        # bound on the driver-side batch: a deep backlog drains as
        # SEVERAL microbatches (the loop re-pulls), never one
        # arbitrarily large row list in driver memory
        self.max_batch_records = max_batch_records
        self.max_shard_threads = max_shard_threads

    def _drain_shard(self, shard_id: str, last, budget: int):
        """Drain ONE shard (own thread): → (shard_id, rows, last_seq).
        The per-shard budget keeps the assembled batch ≤
        max_batch_records even when every shard is deep."""
        conf, client = self.conf, self.client
        if last is not None:
            it = client.shard_iterator(
                conf.stream_name, shard_id,
                position="AFTER_SEQUENCE_NUMBER",
                sequence_number=last)
        else:
            it = client.shard_iterator(
                conf.stream_name, shard_id,
                position=conf.initial_position.type,
                timestamp=conf.initial_position.timestamp)
        rows, seq = [], None
        while it and len(rows) < budget:
            # clamp the page to the remaining budget: the assembled
            # batch stays ≤ max_batch_records exactly (no page-size
            # overshoot), and the checkpoint still lands mid-shard
            recs, it = client.get_records(
                it, limit=min(conf.max_records, budget - len(rows)))
            if not recs:
                break
            for key, data, s, ts in recs:
                rows.append((bytearray(data), key, s, shard_id,
                             float(ts) if ts is not None else None))
                seq = s
        return shard_id, rows, seq

    def pull(self, spark: SparkSession, state: dict):
        """→ (DataFrame | None, new_state, commit_fn)."""
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql import types as T

        conf, client = self.conf, self.client
        shard_ids = list(client.list_shards(conf.stream_name))
        if not shard_ids:
            return None, state, lambda: None
        budget = max(1, self.max_batch_records // len(shard_ids))
        rows = []
        new_state = dict(state)
        with ThreadPoolExecutor(
                max_workers=min(len(shard_ids),
                                self.max_shard_threads)) as pool:
            futs = [pool.submit(self._drain_shard, sid,
                                state.get(sid), budget)
                    for sid in shard_ids]
            # deterministic assembly order (submit order = shard order)
            # so a replayed batch builds the identical DataFrame
            for fut in futs:
                sid, shard_rows, seq = fut.result()
                rows.extend(shard_rows)
                if seq is not None:
                    new_state[sid] = seq
        if not rows:
            return None, state, lambda: None
        schema = T.StructType([
            T.StructField("value", T.BinaryType()),
            T.StructField("partition_key", T.StringType()),
            T.StructField("sequence_number", T.StringType()),
            T.StructField("shard_id", T.StringType()),
            T.StructField("arrival_ts", T.DoubleType()),
        ])
        df = spark.createDataFrame([tuple(r) for r in rows], schema)
        # sequence numbers live in the checkpoint file; nothing to tell
        # the broker
        return df, new_state, lambda: None


class KinesisFanoutSource:
    """Enhanced fan-out retrieval (SubscribeToShard PUSH model — the
    reference's second retrieval mode,
    config.kinesis.reference.hocon:32-35; the polling KCL model is
    :class:`KinesisPullSource`).

    Per-shard SUBSCRIBER THREADS run continuously across microbatches —
    the defining property of fan-out: records arrive whether or not a
    batch is being assembled, each consumer gets its own dedicated
    pipe, and there is no GetRecords iterator contention. Each thread
    loops subscribe → consume the event → resubscribe from the
    ContinuationSequenceNumber (the same control flow an HTTP/2
    consumer runs at its 5-minute subscription boundaries; the
    in-sandbox broker models the event stream as JSON long-poll, see
    tests/fake_kinesis.py). Records land in a bounded per-shard buffer
    — a full buffer pauses that shard's subscription loop, so driver
    memory is capped at shards × buffer_per_shard records no matter
    how deep the backlog.

    Checkpoint semantics are IDENTICAL to the polling source: state =
    per-shard last sequence number actually handed to a batch,
    persisted only after the sinks succeed; buffered-but-undelivered
    records after a crash replay from the checkpoint on resubscribe
    (at-least-once). ``close()`` stops the subscriber threads.

    FAILURE CONTRACT (differs from the polling source): a pull()
    consumes the push buffers destructively, so if batch PROCESSING
    fails, do NOT retry on the same source instance — the drained
    records are no longer in the buffer. Recovery is crash-restart
    semantics (exactly Structured Streaming's): discard the instance
    and rebuild from the checkpoint, which replays every uncommitted
    record via AFTER_SEQUENCE_NUMBER (the kill/recover E2E exercises
    this). The POLLING source re-pulls from committed state on every
    call and therefore also tolerates in-process retry.
    AT_TIMESTAMP starts are a polling-only feature here (the fake
    broker's SubscribeToShard implements TRIM_HORIZON / LATEST /
    AFTER_SEQUENCE_NUMBER)."""

    def __init__(self, conf, client=None,
                 consumer_name: str = "enrich-spark",
                 max_batch_records: int = 100_000,
                 buffer_per_shard: int = 10_000,
                 idle_wait_s: float = 0.3):
        import threading

        from ..sources.kinesis import KinesisError, KinesisHttpClient

        if client is None:
            if not conf.endpoint_url:
                raise KinesisError(
                    "KinesisFanoutSource needs customEndpoint (in "
                    "production the managed connector consumes the "
                    "stream)")
            client = KinesisHttpClient(conf.endpoint_url)
        self.conf = conf
        self.client = client
        self.consumer_name = consumer_name
        self.max_batch_records = max_batch_records
        self.buffer_per_shard = buffer_per_shard
        self.idle_wait_s = idle_wait_s
        self._threads: list = []
        self._buf: dict[str, list] = {}
        self._cond = threading.Condition()
        self._stop = threading.Event()
        self._arn: str | None = None
        # per-shard error surfacing: consecutive failure count + last
        # error text. A permanent broker error (revoked consumer, bad
        # ARN, broker gone) must NOT degrade into a silently-idle
        # stream — pull() raises once every shard is persistently
        # failing (see persistent_failure_threshold).
        self._fail_counts: dict[str, int] = {}
        self._last_errors: dict[str, str] = {}
        self.persistent_failure_threshold = 10

    def shard_errors(self) -> dict[str, str]:
        """Shards whose subscription loop is in PERSISTENT failure
        (≥ persistent_failure_threshold consecutive errors) → last
        error text. Empty dict = healthy."""
        with self._cond:
            return {
                sid: self._last_errors.get(sid, "")
                for sid, n in self._fail_counts.items()
                if n >= self.persistent_failure_threshold
            }

    def _subscribe_loop(self, shard_id: str, start_seq):
        import logging
        import time as _time

        log = logging.getLogger(__name__)
        cont = start_seq
        while not self._stop.is_set():
            try:
                if cont is None:
                    recs, cont = self.client.subscribe_to_shard(
                        self._arn, shard_id,
                        position=self.conf.initial_position.type)
                else:
                    recs, cont = self.client.subscribe_to_shard(
                        self._arn, shard_id, sequence_number=cont)
            except Exception as exc:  # noqa: BLE001 — broker error:
                # count + surface, escalating backoff. A transient blip
                # resolves in a few cheap retries; a permanent error
                # (revoked consumer, bad ARN) climbs to the persistent
                # threshold, is logged once, and becomes visible to the
                # pull() caller via shard_errors() instead of spinning
                # silently forever.
                with self._cond:
                    n = self._fail_counts.get(shard_id, 0) + 1
                    self._fail_counts[shard_id] = n
                    self._last_errors[shard_id] = (
                        f"{type(exc).__name__}: {exc}")
                if n == self.persistent_failure_threshold:
                    log.error(
                        "fan-out shard %s: %d consecutive subscribe "
                        "failures, last: %s", shard_id, n, exc)
                _time.sleep(min(0.2 * (2 ** min(n - 1, 5)), 5.0))
                continue
            with self._cond:
                self._fail_counts[shard_id] = 0
            if not recs:
                continue                  # long-poll returned empty
            with self._cond:
                # backpressure: a full buffer pauses THIS shard's
                # subscription (bounded driver memory), never drops.
                # Chunked extend (r13): a multi-event response can
                # carry more records than buffer_per_shard — waiting
                # for room for the WHOLE batch would deadlock (the
                # buffer can never be that empty), so admit slices as
                # room frees; the bound len(buf) ≤ buffer_per_shard is
                # strict at every instant.
                i = 0
                while i < len(recs) and not self._stop.is_set():
                    room = self.buffer_per_shard - len(self._buf[shard_id])
                    if room <= 0:
                        self._cond.wait(0.1)
                        continue
                    take = recs[i:i + room]
                    self._buf[shard_id].extend(take)
                    i += len(take)
                    self._cond.notify_all()

    def _ensure_subscribed(self, state: dict):
        import threading

        if self._threads:
            return
        self._arn = self.client.register_stream_consumer(
            self.conf.stream_name, self.consumer_name)
        for sid in sorted(self.client.list_shards(self.conf.stream_name)):
            self._buf[sid] = []
            t = threading.Thread(
                target=self._subscribe_loop, args=(sid, state.get(sid)),
                name=f"fanout-{sid}", daemon=True)
            t.start()
            self._threads.append(t)

    def pull(self, spark: SparkSession, state: dict):
        """→ (DataFrame | None, new_state, commit_fn). Drains the push
        buffers; waits up to idle_wait_s for in-flight events before
        reporting the stream idle.

        Raises on ANY pull while a shard is in persistent subscribe
        failure — checked BEFORE the drain (r14; previously only the
        idle path checked, so on a continuously busy stream a dead
        shard's data loss stayed silent for as long as the healthy
        shards kept producing). Partial data loss must halt the
        pipeline: rows drained-but-uncommitted are redelivered after
        the crash-restart (at-least-once), so failing loud costs
        nothing but the restart."""
        import time as _time

        from pyspark.sql import types as T

        self._ensure_subscribed(state)
        errs = self.shard_errors()
        if errs:
            from ..sources.kinesis import KinesisError
            raise KinesisError(
                f"fan-out: {len(errs)}/{len(self._buf)} shard(s) "
                f"in persistent subscribe failure: {errs}")
        rows = []
        new_state = dict(state)
        deadline = _time.monotonic() + self.idle_wait_s
        while True:
            with self._cond:
                for sid in sorted(self._buf):
                    buf = self._buf[sid]
                    room = self.max_batch_records - len(rows)
                    if room <= 0 or not buf:
                        continue
                    take = buf[:room]
                    del buf[:len(take)]
                    for key, data, s, ts in take:
                        rows.append((bytearray(data), key, s, sid,
                                     float(ts) if ts is not None
                                     else None))
                    new_state[sid] = take[-1][2]
                self._cond.notify_all()
            if rows or _time.monotonic() >= deadline:
                break
            _time.sleep(0.01)
        if not rows:
            # a failure that crossed the persistent threshold DURING
            # the drain wait still refuses to report idle (the
            # before-drain check above covers the steady state)
            errs = self.shard_errors()
            if errs:
                from ..sources.kinesis import KinesisError
                raise KinesisError(
                    f"fan-out: {len(errs)}/{len(self._buf)} shard(s) "
                    f"in persistent subscribe failure: {errs}")
            return None, state, lambda: None
        schema = T.StructType([
            T.StructField("value", T.BinaryType()),
            T.StructField("partition_key", T.StringType()),
            T.StructField("sequence_number", T.StringType()),
            T.StructField("shard_id", T.StringType()),
            T.StructField("arrival_ts", T.DoubleType()),
        ])
        df = spark.createDataFrame([tuple(r) for r in rows], schema)
        # sequence numbers live in the checkpoint file; nothing to tell
        # the broker (fan-out has no server-side consumer offset)
        return df, new_state, lambda: None

    def close(self):
        self._stop.set()
        with self._cond:
            self._cond.notify_all()
        for t in self._threads:
            t.join(timeout=2.0)
        self._threads = []


class PubSubPullSource:
    """One pull = drain the subscription up to max_messages; the commit
    is the deferred acknowledge (broker-side checkpoint).

    ``concurrency`` > 1 issues that many pull requests in flight at
    once (competing consumers — Pub/Sub's native model, so concurrent
    pages need no coordination): a single sequential pull loop caps
    ingest at one REST round-trip at a time. Ack-deferral semantics are
    unchanged — every pulled message's ack_id rides the same
    commit_fn, acknowledged only after the sinks succeed."""

    def __init__(self, conf, client=None, max_messages: int = 1000,
                 concurrency: int = 4):
        from ..sources.pubsub import PubSubError, PubSubHttpClient

        if client is None:
            if not conf.emulator_host:
                raise PubSubError(
                    "PubSubPullSource needs emulator_host (in "
                    "production the managed connector consumes the "
                    "subscription)")
            client = PubSubHttpClient(conf.emulator_host)
        self.conf = conf
        self.client = client
        self.max_messages = max_messages
        self.concurrency = max(1, concurrency)

    def pull(self, spark: SparkSession, state: dict):
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql import types as T

        client, sub = self.client, self.conf.subscription
        pulled = []
        if self.concurrency == 1:
            while len(pulled) < self.max_messages:
                page = client.pull(sub, self.max_messages - len(pulled))
                if not page:
                    break
                pulled.extend(page)
        else:
            with ThreadPoolExecutor(self.concurrency) as pool:
                while len(pulled) < self.max_messages:
                    rem = self.max_messages - len(pulled)
                    n_flight = min(self.concurrency, rem)
                    per = max(1, rem // n_flight)
                    pages = [f.result() for f in [
                        pool.submit(client.pull, sub, per)
                        for _ in range(n_flight)]]
                    got = [m for page in pages for m in page]
                    if not got:
                        break
                    pulled.extend(got)
        if not pulled:
            return None, state, lambda: None
        ack_ids = [p[0] for p in pulled]
        schema = T.StructType([
            T.StructField("value", T.BinaryType()),
            T.StructField("message_id", T.StringType()),
            T.StructField("ordering_key", T.StringType()),
        ])
        df = spark.createDataFrame(
            [(bytearray(data), mid, attrs.get("key"))
             for _ack, data, mid, attrs in pulled], schema)
        return df, state, lambda: client.acknowledge(sub, ack_ids)


class PullStreamQuery:
    """The microbatch loop + checkpoint. ``process_available()`` drains
    the source (the explicit-step twin of Structured Streaming's
    processAllAvailable, so tests and cron-style deployments drive it
    directly); ``run(poll_seconds)`` loops forever."""

    STATE_FILE = "pull_state.json"

    def __init__(self, spark: SparkSession, source,
                 process: Callable[[DataFrame, int], None],
                 checkpoint_dir: str):
        self.spark = spark
        self.source = source
        self.process = process
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._path = os.path.join(checkpoint_dir, self.STATE_FILE)
        if os.path.exists(self._path):
            with open(self._path) as f:
                st = json.load(f)
            self.batch_id = st["batch_id"]
            self.source_state = st["source"]
        else:
            self.batch_id = 0
            self.source_state = {}

    def _persist(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": self.batch_id,
                       "source": self.source_state}, f)
        os.replace(tmp, self._path)        # atomic on POSIX

    def process_available(self) -> int:
        """Pull-and-process until the source is drained. Returns the
        number of batches processed. Commit ordering per batch:
        sinks → source commit (ack) → checkpoint persist; a crash
        between any two replays the batch (at-least-once)."""
        n = 0
        while True:
            df, new_state, commit = self.source.pull(
                self.spark, self.source_state)
            if df is None:
                return n
            self.process(df, self.batch_id)
            commit()
            self.source_state = new_state
            self.batch_id += 1
            self._persist()
            n += 1

    def run(self, poll_seconds: float = 1.0,
            stop_when: Callable[[], bool] | None = None) -> None:
        import time as _time

        while not (stop_when and stop_when()):
            if self.process_available() == 0:
                _time.sleep(poll_seconds)


def run_pull_stream(
    spark: SparkSession,
    source,
    sinks,
    cfg=None,
    checkpoint_dir: str | None = None,
) -> PullStreamQuery:
    """End-to-end pull deployment: wire the full enrichment pipeline
    (the same make_batch_processor the Kafka/file runner uses) behind a
    PullStreamQuery. The caller drives it (process_available / run)."""
    from .runner import StreamConfig, make_batch_processor

    cfg = cfg or StreamConfig()
    ckpt = checkpoint_dir or cfg.checkpoint
    if not ckpt:
        raise ValueError("run_pull_stream needs a checkpoint directory "
                         "(cfg.checkpoint or checkpoint_dir)")
    process = make_batch_processor(spark, sinks, cfg)
    return PullStreamQuery(spark, source, process, ckpt)
