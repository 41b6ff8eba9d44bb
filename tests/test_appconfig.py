"""App-level HOCON config parity (core/Config.scala + core/Run.scala):
parse the reference's actual config files end-to-end into typed runtime
configs, layered on the reference.conf defaults, and boot the CLI."""

from __future__ import annotations

import json
import os

import pytest

from enrich_spark.appconfig import (
    KafkaSourceConf,
    NsqSourceConf,
    REFERENCE_DEFAULTS,
    assemble_plan,
    load_app_config,
)
from enrich_spark.config_hocon import load_hocon, parse_duration, parse_hocon

REF = "/root/reference/config"


def _ref(name):
    p = os.path.join(REF, name)
    if not os.path.exists(p):
        pytest.skip("reference config dir not present")
    return p


def test_hocon_subset_features():
    doc = parse_hocon("""
      # comment
      "a" { "b": 1 }          // adjacency + comment
      a.c = 2                  # dotted path expands
      d: [ {x: 1},
           {x: 2}
           {x: 3} ]             # comma- OR newline-separated array elems
      dur: 5 minutes           # unquoted multi-token string
      "q.k": hello-world       # quoted key stays literal
      opt: ${?NOT_SET_ANYWHERE}
      merged { x: 1 }
      merged { y: 2 }          # duplicate objects deep-merge
    """)
    assert doc["a"] == {"b": 1, "c": 2}
    assert doc["d"] == [{"x": 1}, {"x": 2}, {"x": 3}]
    assert doc["dur"] == "5 minutes" and parse_duration(doc["dur"]) == 300.0
    assert doc["q.k"] == "hello-world"
    assert "opt" not in doc
    assert doc["merged"] == {"x": 1, "y": 2}


def test_hocon_substitutions_and_layering(monkeypatch):
    monkeypatch.setenv("MY_HOST", "host-7")
    doc = parse_hocon("""
      base: "v1"
      ref: ${base}
      host: ${MY_HOST}
      flag: "off"
      flag: ${?NOT_SET_ANYWHERE}   # unresolved optional keeps "off"
    """)
    assert doc["ref"] == "v1"
    assert doc["host"] == "host-7"
    assert doc["flag"] == "off"
    with pytest.raises(ValueError, match="unresolved"):
        parse_hocon("x: ${NOPE_NOT_SET}")
    with pytest.raises(ValueError, match="include"):
        parse_hocon('include "other.conf"')


def test_kinesis_reference_config_decodes(monkeypatch):
    monkeypatch.setenv("HOSTNAME", "worker-1")
    app = load_app_config(_ref("config.kinesis.reference.hocon"))
    assert app.transport == "kinesis"
    assert app.license_accepted
    src = app.source
    assert src.stream_name == "snowplow-collector-payloads"
    assert src.app_name == "snowplow-enrich"
    assert src.retrieval_mode == "Polling" and src.max_records == 750
    # BASELINE.md defaults table parity
    assert app.cpu_parallelism_fraction == 1.0
    assert app.sink_parallelism_fraction == 2.0
    assert app.health_probe.unhealthy_latency_s == 120.0
    assert app.assets_update_period_s == 7 * 86400.0
    assert app.validation.max_json_depth == 50
    assert app.validation.accept_invalid is False
    assert app.validation.atomic_fields_limits["app_id"] == 5
    good = app.sinks["good"]
    assert good.stream_name == "snowplow-enriched"
    assert good.record_limit == 500 and good.byte_limit == 5242880
    assert good.partition_key == "user_id" and good.max_retries == 10
    assert good.min_backoff_s == 0.1 and good.max_backoff_s == 1.0
    assert app.sinks["bad"].stream_name == "snowplow-bad"
    assert app.metadata is not None and app.metadata.interval_s == 300.0
    assert app.metadata.max_body_size == 150000
    assert app.statsd is not None and app.statsd.period_s == 60.0
    assert app.statsd.prefix == "snowplow.enrich"
    assert app.decompression.max_bytes_in_batch == 5242880
    assert app.decompression.max_bytes_single_payload == 10000000
    assert len(app.identity["identifiers"]) == 3


def test_pubsub_reference_config_decodes():
    app = load_app_config(_ref("config.pubsub.reference.hocon"))
    assert app.transport == "pubsub"
    assert app.source.subscription.endswith("snowplow-collector-payloads")
    good = app.sinks["good"]
    assert good.stream_name.endswith("snowplow-enriched")
    assert good.record_limit == 100          # batchSize
    assert good.byte_limit == 1000000        # requestByteThreshold
    assert app.health_probe.unhealthy_latency_s == 120.0


def test_kafka_and_nsq_reference_configs_decode():
    kafka = load_app_config(_ref("config.kafka.reference.hocon"))
    assert kafka.transport == "kafka"
    assert isinstance(kafka.source, KafkaSourceConf)
    assert kafka.source.bootstrap_servers == "localhost:9092"
    assert kafka.source.consumer_conf["group.id"] == "enrich-kafka"
    assert kafka.source.debounce_commit_offsets_s == 10.0
    assert kafka.sinks["good"].topic == "snowplow-enriched"
    assert kafka.sinks["good"].partition_key == "user_id"

    nsq = load_app_config(_ref("config.nsq.reference.hocon"))
    assert nsq.transport == "nsq"
    assert isinstance(nsq.source, NsqSourceConf)
    assert nsq.source.topic == "collector-payloads"
    assert nsq.source.lookup_port == 4161


def test_minimal_configs_inherit_reference_defaults():
    for name in ("config.kinesis.minimal.hocon", "config.pubsub.minimal.hocon",
                 "config.kafka.minimal.hocon"):
        app = load_app_config(_ref(name))
        assert app.license_accepted, name
        # everything below comes from the layered reference defaults
        assert app.health_probe.unhealthy_latency_s == 120.0, name
        assert app.validation.max_json_depth == 50, name
        assert app.cpu_parallelism_fraction == 1.0, name
        assert app.decompression.max_bytes_single_payload == 10000000, name
        cfg = assemble_plan(app)
        assert cfg.max_bytes_single_payload == 10000000


def test_reference_defaults_match_reference_conf():
    """Our embedded defaults mirror modules/core/src/main/resources/
    reference.conf for every field we decode."""
    assert REFERENCE_DEFAULTS["monitoring"]["healthProbe"]["unhealthyLatency"] == "2 minutes"
    assert REFERENCE_DEFAULTS["validation"]["maxJsonDepth"] == 50
    assert REFERENCE_DEFAULTS["metadata"]["maxBodySize"] == 149000
    assert REFERENCE_DEFAULTS["decompression"]["maxBytesInBatch"] == 5242880
    assert REFERENCE_DEFAULTS["assetsUpdatePeriod"] == "7 days"


def test_cli_dry_run_and_file_batch(spark, tmp_path):
    """python -m enrich_spark: (a) a broker transport assembles + prints
    the plan and exits cleanly; (b) a file-transport config actually runs
    the batch pipeline end-to-end and writes good TSV lines."""
    from enrich_spark.__main__ import main
    from enrich_spark.loaders.thrift import encode_payload

    # (a) kinesis minimal: parse → plan summary, exit 0 (no broker here)
    assert main(["--config", _ref("config.kinesis.minimal.hocon"),
                 "--dry-run"]) == 0

    # (b) file transport end-to-end
    payload = dict(
        path="/com.snowplowanalytics.snowplow/tp2",
        timestamp=1700000000000,
        collector="ssc-test",
        body=json.dumps({
            "schema": "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4",
            "data": [{"e": "pv", "aid": "cli-app", "p": "web",
                      "tv": "js-3.0.0"}],
        }),
        content_type="application/json",
    )
    src = tmp_path / "in"
    spark.createDataFrame([(encode_payload(payload),)], "value BINARY") \
         .write.parquet(str(src))
    conf = tmp_path / "app.hocon"
    conf.write_text("""
      "license": { "accept": true }
      "input": { "path": "%s" }
    """ % src)
    out = tmp_path / "out"
    assert main(["--config", str(conf), "--output", str(out)]) == 0
    lines = [ln for p in (out / "good").glob("part-*.txt") if p.is_file()
             for ln in p.read_text().splitlines()]
    if not lines:  # text sink may write without .txt suffix
        lines = [ln for p in (out / "good").glob("part-*") if p.is_file()
                 for ln in p.read_text().splitlines()]
    assert len(lines) == 1
    fields = lines[0].split("\t")
    assert len(fields) == 131 and fields[0] == "cli-app"


def test_cli_kinesis_pull_end_to_end(spark, tmp_path):
    """A kinesis config WITH input.customEndpoint is runnable: the CLI
    drives the checkpointed pull loop against the (fake) broker and
    lands enriched TSV; a second invocation resumes from the sequence
    checkpoint and drains nothing."""
    from enrich_spark.__main__ import main
    from enrich_spark.loaders.thrift import encode_payload
    from enrich_spark.sources.connectors import StreamSinkConf
    from enrich_spark.sources.kinesis import ship_to_kinesis
    from tests.fake_kinesis import FakeKinesis

    broker = FakeKinesis(nshards=2)
    broker.create_stream("collected")
    try:
        payload = encode_payload(dict(
            path="/com.snowplowanalytics.snowplow/tp2",
            timestamp=1700000000000,
            collector="ssc-test",
            body=json.dumps({
                "schema": ("iglu:com.snowplowanalytics.snowplow/"
                           "payload_data/jsonschema/1-0-4"),
                "data": [{"e": "pv", "aid": "pull-app", "p": "web",
                          "tv": "js-3.0.0"}],
            }),
            content_type="application/json",
        ))
        ship_to_kinesis([("k", payload)],
                        StreamSinkConf(stream_name="collected"),
                        broker.endpoint, sleep=lambda s: None)
        conf = tmp_path / "app.hocon"
        conf.write_text("""
          "license": { "accept": true }
          "input": {
            "streamName": "collected"
            "appName": "cli-pull"
            "customEndpoint": "%s"
          }
        """ % broker.endpoint)
        out = tmp_path / "out"
        assert main(["--config", str(conf), "--output", str(out)]) == 0
        lines = [ln for p in (out / "good").rglob("part-*") if p.is_file()
                 for ln in p.read_text().splitlines()]
        assert len(lines) == 1
        fields = lines[0].split("\t")
        assert len(fields) == 131 and fields[0] == "pull-app"
        # restart: checkpoint holds the sequence numbers → no re-drain
        assert main(["--config", str(conf), "--output", str(out)]) == 0
        lines2 = [ln for p in (out / "good").rglob("part-*") if p.is_file()
                  for ln in p.read_text().splitlines()]
        assert len(lines2) == 1
    finally:
        broker.stop()


def test_cli_pubsub_pull_end_to_end(spark, tmp_path, monkeypatch):
    """A pubsub config + $PUBSUB_EMULATOR_HOST runs the pull loop:
    enriched TSV lands, broker backlog is acked empty."""
    from enrich_spark.__main__ import main
    from enrich_spark.loaders.thrift import encode_payload
    from enrich_spark.sources.connectors import StreamSinkConf
    from enrich_spark.sources.pubsub import ship_to_pubsub
    from tests.fake_pubsub import FakePubSub

    broker = FakePubSub()
    topic = "projects/p/topics/collected"
    sub = "projects/p/subscriptions/collected-sub"
    broker.create(topic, sub)
    try:
        payload = encode_payload(dict(
            path="/com.snowplowanalytics.snowplow/tp2",
            timestamp=1700000000000,
            collector="ssc-test",
            body=json.dumps({
                "schema": ("iglu:com.snowplowanalytics.snowplow/"
                           "payload_data/jsonschema/1-0-4"),
                "data": [{"e": "pv", "aid": "ps-app", "p": "web",
                          "tv": "js-3.0.0"}],
            }),
            content_type="application/json",
        ))
        ship_to_pubsub([("k", payload)],
                       StreamSinkConf(stream_name=topic),
                       broker.host, sleep=lambda s: None)
        monkeypatch.setenv("PUBSUB_EMULATOR_HOST", broker.host)
        conf = tmp_path / "app.hocon"
        conf.write_text("""
          "license": { "accept": true }
          "input": { "subscription": "%s" }
        """ % sub)
        out = tmp_path / "out"
        assert main(["--config", str(conf), "--output", str(out)]) == 0
        lines = [ln for p in (out / "good").rglob("part-*") if p.is_file()
                 for ln in p.read_text().splitlines()]
        assert len(lines) == 1
        assert lines[0].split("\t")[0] == "ps-app"
        assert broker.backlog(sub) == 0      # acked after the sinks
    finally:
        broker.stop()


def test_cli_curate_pipeline(spark, tmp_path):
    """python -m enrich_spark curate: JSON pipeline over a parquet doc
    table — writes the curated corpus and reports per-step retention
    from the same pass (--report)."""
    import io
    from contextlib import redirect_stdout

    from enrich_spark.__main__ import main

    docs = spark.createDataFrame(
        [(i, f"some document body  with\r\nnumber {i % 8}",
          f"src{i % 3}") for i in range(24)],
        "doc_id long, text string, source string")
    src = tmp_path / "docs"
    docs.write.parquet(str(src))
    pipe = tmp_path / "pipe.json"
    pipe.write_text(json.dumps([
        {"op": "normalize_text"},
        {"op": "exact_dedup_keep"},
        {"op": "per_group_cap", "k": 2, "group_col": "source"},
    ]))
    out = tmp_path / "curated"
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["curate", "--pipeline", str(pipe),
                   "--input", str(src), "--output", str(out), "--report"])
    assert rc == 0
    rep = json.loads(buf.getvalue())
    assert rep["rows_in"] == 24
    steps = {s["op"]: s["rows_after"] for s in rep["steps"]}
    # normalize is row-preserving; dedup collapses the 8 distinct texts;
    # the per-source cap keeps at most 2 per source
    assert steps["normalize_text"] == 24
    assert steps["exact_dedup_keep"] == 8
    assert steps["per_group_cap"] <= 6
    got = spark.read.parquet(str(out))
    assert got.count() == steps["per_group_cap"]
    assert "\r" not in got.select("text").first().text

    # --report-only: no output written, counts still reported
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        rc = main(["curate", "--pipeline", str(pipe),
                   "--input", str(src), "--report-only"])
    assert rc == 0
    rep2 = json.loads(buf2.getvalue())
    assert {s["op"]: s["rows_after"] for s in rep2["steps"]} == steps
