"""NSQ connector tests against an in-process fake nsqd speaking the
public V2 TCP protocol (tests/fake_nsqd.py).

Covers the surface the reference's NSQ runner app exposes
(modules/nsq/.../NsqApp.scala:24 + config/config.nsq.reference.hocon):
publish (PUB/MPUB under byteLimit with backoff), subscribe
(SUB/RDY/FIN/REQ), heartbeat liveness, lookupd discovery, and the
config decode path from the reference's own HOCON file.
"""

import os
import time

import pytest

from enrich_spark.sources.nsq import (
    NsqdClient,
    NsqError,
    NsqSender,
    NsqSinkConf,
    lookup_nsqd,
    nsq_microbatch,
    nsq_ship_rows,
    nsq_sink_conf_from_dict,
)
from tests.fake_nsqd import FakeLookupd, FakeNsqd

REF_CONFIG = "/root/reference/config/config.nsq.reference.hocon"


@pytest.fixture()
def nsqd():
    srv = FakeNsqd()
    yield srv
    srv.stop()


def _drain(client, n, timeout=5.0):
    out = []
    deadline = time.monotonic() + timeout
    while len(out) < n and time.monotonic() < deadline:
        msg = client.read_message(timeout=0.25)
        if msg is not None:
            client.fin(msg.id)
            out.append(msg)
    return out


def test_pub_sub_roundtrip(nsqd):
    with NsqdClient("127.0.0.1", nsqd.port) as sub:
        sub.sub("events", "ch")
        sub.rdy(10)
        with NsqdClient("127.0.0.1", nsqd.port) as pub:
            for i in range(5):
                pub.pub("events", f"payload-{i}".encode())
        msgs = _drain(sub, 5)
    assert sorted(m.body for m in msgs) == [f"payload-{i}".encode()
                                            for i in range(5)]
    assert all(m.attempts == 1 for m in msgs)
    assert nsqd.depth("events", "ch") == 0


def test_pending_before_first_channel(nsqd):
    # messages published while the topic has no channel are handed to
    # the first channel created (nsqd topic→channel semantics)
    with NsqdClient("127.0.0.1", nsqd.port) as pub:
        pub.pub("t1", b"early")
    with NsqdClient("127.0.0.1", nsqd.port) as sub:
        sub.sub("t1", "late-channel")
        sub.rdy(1)
        msgs = _drain(sub, 1)
    assert [m.body for m in msgs] == [b"early"]


def test_mpub_bytelimit_batching(nsqd):
    conf = NsqSinkConf(topic="enriched", nsqd_host="127.0.0.1",
                       nsqd_port=nsqd.port, byte_limit=64)
    rows = [("", f"row-{i:04d}-{'x' * 20}".encode()) for i in range(20)]
    sender = NsqSender(conf)
    sent = nsq_ship_rows(rows, conf, sender=sender)
    sender._close()
    assert sent == nsqd.mpub_count >= 2  # byteLimit forced multiple MPUBs
    with NsqdClient("127.0.0.1", nsqd.port) as sub:
        sub.sub("enriched", "c")
        sub.rdy(50)
        msgs = _drain(sub, 20)
    assert sorted(m.body for m in msgs) == sorted(p for _, p in rows)


def test_req_redelivery_increments_attempts(nsqd):
    with NsqdClient("127.0.0.1", nsqd.port) as pub:
        pub.pub("retry", b"again")
    with NsqdClient("127.0.0.1", nsqd.port) as sub:
        sub.sub("retry", "c")
        sub.rdy(5)
        first = sub.read_message(timeout=2.0)
        assert first is not None and first.attempts == 1
        sub.req(first.id, 0)
        second = None
        deadline = time.monotonic() + 5.0
        while second is None and time.monotonic() < deadline:
            second = sub.read_message(timeout=0.25)
        assert second is not None
        assert second.body == b"again"
        assert second.attempts == 2
        sub.fin(second.id)


def test_heartbeat_answered_with_nop():
    srv = FakeNsqd(heartbeat_interval=0.1)
    try:
        with NsqdClient("127.0.0.1", srv.port) as sub:
            sub.sub("hb", "c")
            sub.rdy(1)
            assert sub.read_message(timeout=0.6) is None  # idle poll
            with NsqdClient("127.0.0.1", srv.port) as pub:
                pub.pub("hb", b"alive")
            msgs = _drain(sub, 1)
        assert [m.body for m in msgs] == [b"alive"]
        assert srv.nop_count >= 1  # heartbeats were answered transparently
    finally:
        srv.stop()


def test_bad_topic_is_an_error_frame(nsqd):
    with NsqdClient("127.0.0.1", nsqd.port) as pub:
        with pytest.raises(NsqError, match="E_BAD_TOPIC"):
            pub.pub("bad*topic!", b"x")


def test_lookupd_discovery(nsqd):
    lookupd = FakeLookupd(nsqd.port)
    try:
        producers = lookup_nsqd("127.0.0.1", lookupd.port, "events")
    finally:
        lookupd.stop()
    assert producers == [("127.0.0.1", nsqd.port)]


def test_sink_conf_from_reference_hocon():
    from enrich_spark.appconfig import load_app_config

    if not os.path.exists(REF_CONFIG):
        pytest.skip("reference config not present")
    app = load_app_config(REF_CONFIG)
    good = nsq_sink_conf_from_dict(app.raw["output"]["good"])
    assert good.topic == "enriched"
    assert good.byte_limit == 5_000_000
    assert good.nsqd_port == 4150
    assert good.min_backoff_s == pytest.approx(0.1)   # "100 milliseconds"
    assert good.max_backoff_s == pytest.approx(10.0)  # "10 seconds"
    assert good.max_retries == 10


def test_sink_conf_nested_max_retries_not_default():
    # the reference nests maxRetries inside backoffPolicy; a NON-default
    # value must survive (regression: top-level read silently ignored it
    # and the reference hocon's 10 masked the bug by equalling the default)
    conf = nsq_sink_conf_from_dict({
        "topic": "enriched",
        "backoffPolicy": {"minBackoff": "50 milliseconds",
                          "maxBackoff": "2 seconds",
                          "maxRetries": 7},
    })
    assert conf.max_retries == 7
    assert conf.min_backoff_s == pytest.approx(0.05)
    assert conf.max_backoff_s == pytest.approx(2.0)


def test_microbatch_source_dataframe(nsqd, spark):
    from enrich_spark.appconfig import NsqSourceConf

    with NsqdClient("127.0.0.1", nsqd.port) as sub:
        # create the channel first so every published message lands in it
        sub.sub("collector-payloads", "collector-payloads-channel")
    with NsqdClient("127.0.0.1", nsqd.port) as pub:
        pub.mpub("collector-payloads",
                 [f"ev-{i}".encode() for i in range(20)])
    src = NsqSourceConf(topic="collector-payloads",
                        channel="collector-payloads-channel")
    df = nsq_microbatch(spark, src, nsqd=("127.0.0.1", nsqd.port),
                        max_messages=20, poll_timeout_s=10.0, parallelism=2)
    rows = df.collect()
    assert sorted(bytes(r.value) for r in rows) == sorted(
        f"ev-{i}".encode() for i in range(20))
    assert {r.attempts for r in rows} == {1}
    assert df.columns == ["value", "message_id", "attempts", "timestamp_ns"]
    assert nsqd.depth("collector-payloads", "collector-payloads-channel") == 0


def test_microbatch_requeues_on_failure(nsqd, spark):
    """At-least-once: a drain that dies mid-batch REQs every unacked
    message so nsqd redelivers it (attempts increments)."""
    from enrich_spark.appconfig import NsqSourceConf
    import enrich_spark.sources.nsq as nsqmod

    with NsqdClient("127.0.0.1", nsqd.port) as sub:
        sub.sub("reqtopic", "reqchan")
    with NsqdClient("127.0.0.1", nsqd.port) as pub:
        pub.mpub("reqtopic", [f"rq-{i}".encode() for i in range(5)])
    src = NsqSourceConf(topic="reqtopic", channel="reqchan")

    # sabotage: blow up after all 5 messages are received but before ack
    real_read = NsqdClient.read_message
    seen = {"n": 0}

    def poisoned(self, timeout=0.05):
        if seen["n"] >= 5:
            raise RuntimeError("boom after receipt, before ack")
        m = real_read(self, timeout)
        if m is not None:
            seen["n"] += 1
        return m

    NsqdClient.read_message = poisoned
    try:
        with pytest.raises(RuntimeError):
            nsqmod.nsq_microbatch(spark, src, nsqd=("127.0.0.1", nsqd.port),
                                  max_messages=10, poll_timeout_s=5.0)
    finally:
        NsqdClient.read_message = real_read

    # all 5 must be back in the channel queue and redeliverable (the
    # fake nsqd handler thread processes REQ/close asynchronously — poll)
    deadline = time.monotonic() + 5.0
    while nsqd.depth("reqtopic", "reqchan") != 5 and time.monotonic() < deadline:
        time.sleep(0.02)
    assert nsqd.depth("reqtopic", "reqchan") == 5
    df = nsq_microbatch(spark, src, nsqd=("127.0.0.1", nsqd.port),
                        max_messages=5, poll_timeout_s=10.0)
    rows = df.collect()
    assert sorted(bytes(r.value) for r in rows) == sorted(
        f"rq-{i}".encode() for i in range(5))
    # at-least-once: every message redelivered (attempts incremented);
    # a push-model race can redeliver to the dying connection once more,
    # so >= 2, not == 2
    assert all(r.attempts >= 2 for r in rows)
    assert nsqd.depth("reqtopic", "reqchan") == 0


def test_transient_failure_retries_with_backoff(nsqd):
    conf = NsqSinkConf(topic="flaky", nsqd_host="127.0.0.1",
                       nsqd_port=nsqd.port, byte_limit=1 << 20,
                       max_retries=3, min_backoff_s=0.01, max_backoff_s=0.02)

    calls = {"n": 0}
    real = NsqSender(conf)

    class Flaky:
        def __call__(self, topic, batch):
            calls["n"] += 1
            if calls["n"] == 1:
                return list(range(len(batch)))  # simulate a socket drop
            return real(topic, batch)

    slept = []
    nsq_ship_rows([("", b"a"), ("", b"b")], conf, sender=Flaky(),
                  sleep=slept.append)
    real._close()
    assert calls["n"] == 2 and slept == [0.01]
    with NsqdClient("127.0.0.1", nsqd.port) as sub:
        sub.sub("flaky", "c")
        sub.rdy(5)
        msgs = _drain(sub, 2)
    assert sorted(m.body for m in msgs) == [b"a", b"b"]
