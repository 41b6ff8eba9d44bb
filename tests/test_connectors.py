"""Kinesis/PubSub config-surface mapping + sink batching/retry
(KinesisApp config config.kinesis.reference.hocon:7-128, PubSub
config.pubsub.reference.hocon:7-90)."""

from __future__ import annotations

import pytest

from enrich_spark.sources.connectors import (
    InitialPosition,
    KinesisSourceConf,
    StreamSinkConf,
    batch_records,
    kinesis_conf_from_dict,
    kinesis_source_options,
    ship_rows,
    sink_conf_from_dict,
)


def test_kinesis_conf_from_reference_hocon_shape():
    conf = kinesis_conf_from_dict({
        "streamName": "snowplow-collector-payloads",
        "appName": "snowplow-enrich",
        "initialPosition": {"type": "AT_TIMESTAMP",
                            "timestamp": "2023-01-01T00:00:00Z"},
        "retrievalMode": {"type": "Polling", "maxRecords": 750},
    })
    assert conf.stream_name == "snowplow-collector-payloads"
    assert conf.initial_position == InitialPosition("AT_TIMESTAMP", "2023-01-01T00:00:00Z")
    opts = kinesis_source_options(conf)
    assert opts["startingPosition"] == "AT_TIMESTAMP:2023-01-01T00:00:00Z"
    assert opts["consumerType"] == "GetRecords"
    assert opts["maxFetchRecordsPerShard"] == "750"


def test_kinesis_fanout_options():
    conf = KinesisSourceConf(stream_name="s", app_name="worker-1",
                             retrieval_mode="FanOut", region="eu-west-1")
    opts = kinesis_source_options(conf)
    assert opts == {"streamName": "s", "region": "eu-west-1",
                    "startingPosition": "TRIM_HORIZON",
                    "consumerType": "EFO", "consumerName": "worker-1"}


def test_sink_conf_from_dict_kinesis_and_pubsub():
    k = sink_conf_from_dict({
        "streamName": "snowplow-enriched", "recordLimit": 500,
        "byteLimit": 5242880, "partitionKey": "user_id", "maxRetries": 10,
        "throttledBackoffPolicy": {"minBackoff": "100 milliseconds",
                                   "maxBackoff": "1 second"},
    })
    assert (k.stream_name, k.record_limit, k.partition_key) == \
        ("snowplow-enriched", 500, "user_id")
    assert k.min_backoff_s == pytest.approx(0.1)
    assert k.max_backoff_s == pytest.approx(1.0)
    p = sink_conf_from_dict({"topic": "projects/x/topics/enriched",
                             "batchSize": 100, "requestByteThreshold": 1000000})
    assert (p.stream_name, p.record_limit, p.byte_limit) == \
        ("projects/x/topics/enriched", 100, 1000000)


def test_batch_records_limits():
    rows = [("k", b"x" * 10)] * 7
    # record limit
    assert [len(b) for b in batch_records(rows, 3, 10**6)] == [3, 3, 1]
    # byte limit: 11 bytes per row (payload+key) → 2 rows per 25-byte batch
    assert [len(b) for b in batch_records(rows, 500, 25)] == [2, 2, 2, 1]
    # single oversize record still ships alone
    assert [len(b) for b in batch_records([("k", b"y" * 100)], 500, 25)] == [1]


def test_ship_rows_partial_failure_retry():
    conf = StreamSinkConf(stream_name="s", record_limit=2, byte_limit=10**6,
                          max_retries=3, min_backoff_s=0.1, max_backoff_s=0.4)
    calls, slept = [], []

    def send(stream, batch):
        calls.append([k for k, _ in batch])
        # first attempt of the first batch: throttle index 1
        return [1] if len(calls) == 1 else []

    n = ship_rows([("a", b"1"), ("b", b"2"), ("c", b"3")], conf, send,
                  sleep=slept.append)
    assert n == 3                      # batch1, retry of b, batch2
    assert calls == [["a", "b"], ["b"], ["c"]]
    assert slept == [0.1]


def test_ship_rows_exhausted_retries_raises():
    conf = StreamSinkConf(stream_name="s", max_retries=2,
                          min_backoff_s=0.1, max_backoff_s=0.4)
    slept = []
    with pytest.raises(RuntimeError, match="still throttled"):
        ship_rows([("a", b"1")], conf, lambda s, b: [0], sleep=slept.append)
    assert slept == [0.1, 0.2]         # exponential backoff


def test_sink_conf_bare_durations_are_milliseconds():
    # HOCON bare numbers mean milliseconds: a config ported verbatim with
    # minBackoff: 100 must yield 0.1 s, not 100 s (ADVICE r3)
    k = sink_conf_from_dict({
        "streamName": "s",
        "throttledBackoffPolicy": {"minBackoff": 100, "maxBackoff": "2500"},
    })
    assert k.min_backoff_s == pytest.approx(0.1)
    assert k.max_backoff_s == pytest.approx(2.5)
    # suffix-glued forms and minutes
    k = sink_conf_from_dict({
        "streamName": "s",
        "throttledBackoffPolicy": {"minBackoff": "250ms", "maxBackoff": "1 minute"},
    })
    assert k.min_backoff_s == pytest.approx(0.25)
    assert k.max_backoff_s == pytest.approx(60.0)
