"""Observability floor (core/Metrics.scala, core/MetadataReporter.scala,
healthProbe.unhealthyLatency): fake-clock/fake-webhook unit tests plus a
foreachBatch integration run."""

from __future__ import annotations

import base64
import json

from enrich_spark.streaming.observability import (
    BatchObservers,
    HealthProbe,
    Metrics,
    MetadataReporter,
    attach_observers,
)


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


def test_metrics_statsd_lines_and_period():
    clock = FakeClock()
    sent = []
    m = Metrics(prefix="snowplow.enrich", tags={"env": "prod"},
                period_s=60.0, sender=sent.append, clock=clock)
    m.add("raw", 100)
    m.add("good", 90)
    m.add("bad", 7)
    m.add("failed", 3)
    m.set_e2e_latency(1.5)
    assert m.maybe_report() is False        # period not elapsed
    assert sent == []
    clock.t += 61
    assert m.maybe_report() is True
    lines = [b.decode() for b in sent]
    assert "snowplow.enrich.raw:100|c|#env:prod" in lines
    assert "snowplow.enrich.good:90|c|#env:prod" in lines
    assert "snowplow.enrich.e2e_latency_millis:1500|g|#env:prod" in lines
    # counters reset per period (statsd delta semantics)
    assert m.scrape()["raw"] == 0


def test_health_probe_flips_past_configured_latency():
    clock = FakeClock()
    hp = HealthProbe(unhealthy_latency_s=120.0, clock=clock)
    assert hp.healthy()
    hp.batch_completed(e2e_latency_s=119.0)
    assert hp.healthy()
    hp.batch_completed(e2e_latency_s=121.0)   # past the 2-minute ceiling
    assert not hp.healthy()
    hp.batch_completed(e2e_latency_s=5.0)
    assert hp.healthy()
    # a batch stuck in flight past the ceiling also flips the probe
    hp.batch_started()
    clock.t += 121
    assert not hp.healthy()


def test_health_probe_http_endpoint():
    hp = HealthProbe(unhealthy_latency_s=120.0)
    srv = hp.serve(port=0)
    try:
        import urllib.error
        import urllib.request

        port = srv.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert r.status == 200 and r.read() == b"OK"
        hp.batch_completed(e2e_latency_s=500.0)
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/health")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
    finally:
        srv.shutdown()


def _decode_b64_json(s):
    return json.loads(base64.b64decode(s).decode())


def test_metadata_reporter_payload_shape():
    """The webhook body mirrors MetadataReporter.scala:141-215: tracker-
    protocol ue events inside the payload_data/1-0-4 envelope, observed_
    event/6-0-1 in ue_px, observed_entity/4-0-0 rows in cx."""
    posts = []
    rep = MetadataReporter(
        endpoint="https://pipe.example.com/iglu",
        organization_id="org-1", pipeline_id="pipe-1",
        interval_s=300.0, app_name="enrich-spark",
        post=lambda url, body: posts.append((url, body)) or 200,
        clock=FakeClock(), now_iso=lambda: "2026-01-01T00:00:00Z",
    )
    rep.add([{
        "event_vendor": "com.acme", "event_name": "checkout",
        "event_format": "jsonschema", "event_version": "1-0-0",
        "app_id": "shop", "v_tracker": "js-3.0.0", "platform": "web",
        "n_events": 42,
        "entity_schemas": ["iglu:com.acme/cart/jsonschema/2-0-1"],
    }])
    assert rep.maybe_flush(force=True) == 1
    url, body = posts[0]
    assert url == "https://pipe.example.com/iglu/com.snowplowanalytics.snowplow/tp2"
    env = json.loads(body)
    assert env["schema"] == \
        "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4"
    [ev] = env["data"]
    assert ev["aid"] == "enrich-spark" and ev["e"] == "ue"
    ue = _decode_b64_json(ev["ue_px"])
    assert ue["schema"] == \
        "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0"
    obs = ue["data"]
    assert obs["schema"] == \
        "iglu:com.snowplowanalytics.console/observed_event/jsonschema/6-0-1"
    d = obs["data"]
    assert d["organizationId"] == "org-1" and d["pipelineId"] == "pipe-1"
    assert d["eventVendor"] == "com.acme" and d["eventName"] == "checkout"
    assert d["eventVersion"] == "1-0-0" and d["eventVolume"] == 42
    assert d["source"] == "shop" and d["tracker"] == "js-3.0.0"
    assert d["platform"] == "web"
    co = _decode_b64_json(ev["cx"])
    assert co["schema"] == \
        "iglu:com.snowplowanalytics.snowplow/contexts/jsonschema/1-0-1"
    [ent] = co["data"]
    assert ent["schema"] == \
        "iglu:com.snowplowanalytics.console/observed_entity/jsonschema/4-0-0"
    assert ent["data"] == {"entityVendor": "com.acme", "entityName": "cart",
                           "entityVersion": "2-0-1"}


def test_metadata_reporter_unknowns_batching_and_retry():
    # unknown-* fallbacks (MetadataReporter.scala:178-186)
    posts = []
    rep = MetadataReporter(
        endpoint="https://x.example.com", interval_s=300.0,
        max_body_size=400,  # force batching across envelopes
        post=lambda url, body: posts.append(body) or 200,
        clock=FakeClock(), now_iso=lambda: "2026-01-01T00:00:00Z",
    )
    rep.add([{"event_vendor": None, "event_name": None, "n_events": 1,
              "entity_schemas": []} for _ in range(4)])
    n = rep.maybe_flush(force=True)
    assert n >= 2                           # maxBodySize split the batch
    d = json.loads(posts[0])["data"][0]
    obs = _decode_b64_json(d["ue_px"])["data"]["data"]
    assert obs["eventVendor"] == "unknown-vendor"
    assert obs["eventName"] == "unknown-name"
    assert obs["tracker"] == "unknown-tracker"

    # retry: fail 3 times then succeed; fibonacci backoff via fake sleep
    statuses = [500, 500, 500, 200]
    sleeps = []
    attempts = []
    rep2 = MetadataReporter(
        endpoint="https://x.example.com", interval_s=0.0,
        post=lambda url, body: attempts.append(1) or statuses[len(attempts) - 1],
        sleep=sleeps.append, clock=FakeClock(),
        now_iso=lambda: "2026-01-01T00:00:00Z",
    )
    rep2.add([{"event_vendor": "v", "event_name": "n", "n_events": 1,
               "entity_schemas": []}])
    assert rep2.maybe_flush(force=True) == 1
    assert len(attempts) == 4
    assert sleeps[:3] == [0.1, 0.1, 0.2]    # fibonacci from 100 millis

    # permanent failure: drops after max_retries, never raises
    rep3 = MetadataReporter(
        endpoint="https://x.example.com", interval_s=0.0, max_retries=3,
        post=lambda url, body: 503, sleep=lambda s: None,
        clock=FakeClock(), now_iso=lambda: "2026-01-01T00:00:00Z",
    )
    rep3.add([{"event_vendor": "v", "event_name": "n", "n_events": 1,
               "entity_schemas": []}])
    assert rep3.maybe_flush(force=True) == 1  # attempted, dropped quietly


def test_batch_metrics_cost_zero_extra_jobs(spark, tmp_path):
    """Per-batch raw/good/bad/failed counters AND the oldest
    collector_tstamp ride the sink writes as observe() metrics
    (CollectMetrics nodes, including one below the persist cut inside
    enrich_raw) — enabling observers adds ZERO Spark jobs, vs the old
    re-read of the raw source plus three filter-count jobs plus a
    min-agg."""
    from enrich_spark.loaders.thrift import encode_payload
    from enrich_spark.streaming.runner import (
        StreamConfig, StreamSinks, make_batch_processor,
    )

    payload = dict(
        path="/com.snowplowanalytics.snowplow/tp2",
        timestamp=1700000000000,
        collector="ssc-test",
        body=json.dumps({
            "schema": "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4",
            "data": [{"e": "pv", "aid": "jobs-app", "p": "web",
                      "tv": "js-3.0.0"}],
        }),
        content_type="application/json",
    )
    batch = spark.createDataFrame([(encode_payload(payload),)],
                                  "value BINARY")

    def jobs_for(observers, tag):
        sinks = StreamSinks(
            good_path=str(tmp_path / tag / "good"),
            bad_path=str(tmp_path / tag / "bad"),
            failed_path=str(tmp_path / tag / "failed"))
        cfg = StreamConfig(observers=observers)
        proc = make_batch_processor(spark, sinks, cfg)
        sc = spark.sparkContext
        sc.setJobGroup(tag, tag)
        try:
            proc(batch, 0)
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    base = jobs_for(None, "noobs")
    sent = []
    obs = BatchObservers(metrics=Metrics(period_s=0.0, sender=sent.append))
    with_obs = jobs_for(obs, "withobs")
    assert with_obs - base == 0, (
        f"observers cost {with_obs - base} extra jobs "
        f"({base} -> {with_obs}); all counters must ride the sink "
        "writes as observe() metrics")
    lines = [ln.decode() for ln in sent]
    assert any(l.startswith("snowplow.enrich.raw:1|c") for l in lines)
    assert any(l.startswith("snowplow.enrich.good:1|c") for l in lines)


def test_observers_wired_into_streaming_runner(spark, tmp_path):
    """foreachBatch integration: one real micro-batch updates counters,
    e2e latency, health, and the metadata accumulator."""
    import os

    from enrich_spark.loaders.thrift import encode_payload
    from enrich_spark.streaming.runner import (
        StreamConfig, StreamSinks, run_stream,
    )

    payload = dict(
        path="/com.snowplowanalytics.snowplow/tp2",
        timestamp=1700000000000,
        collector="ssc-test",
        body=json.dumps({
            "schema": "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4",
            "data": [{"e": "pv", "aid": "obs-app", "p": "web",
                      "tv": "js-3.0.0"}],
        }),
        content_type="application/json",
    )
    src = tmp_path / "in"
    spark.createDataFrame([(encode_payload(payload),)], "value BINARY") \
         .write.parquet(str(src))

    sent = []
    posts = []
    obs = BatchObservers(
        metrics=Metrics(period_s=0.0, sender=sent.append),
        health=HealthProbe(unhealthy_latency_s=1e9),
        metadata=MetadataReporter(
            endpoint="https://x.example.com", interval_s=0.0,
            post=lambda url, body: posts.append(body) or 200),
    )
    sinks = StreamSinks(
        good_path=str(tmp_path / "good"), bad_path=str(tmp_path / "bad"))
    cfg = StreamConfig(checkpoint=str(tmp_path / "ckpt"), observers=obs)
    source = (spark.readStream.schema("value BINARY")
              .option("recursiveFileLookup", "true").parquet(str(src)))
    sq = run_stream(spark, source, sinks, cfg)
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()

    lines = [ln.decode() for ln in sent]
    assert any(l.startswith("snowplow.enrich.raw:1|c") for l in lines)
    assert any(l.startswith("snowplow.enrich.good:1|c") for l in lines)
    # collector_tstamp is 2023-11 → e2e latency is huge and recorded
    assert any("e2e_latency_millis" in l for l in lines)
    assert obs.health.healthy()             # ceiling set absurdly high
    [body] = posts
    d = json.loads(body)["data"][0]
    o = json.loads(base64.b64decode(d["ue_px"]))["data"]["data"]
    assert o["source"] == "obs-app" and o["eventVolume"] == 1
