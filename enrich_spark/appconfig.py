"""App-level config: the reference's HOCON file → a typed runtime config.

Mirrors core/Config.scala (case classes Config/Output/Monitoring/
Validation/Metadata/Decompression, decoded in core/Run.scala over the
user file layered on modules/core/src/main/resources/reference.conf) —
re-expressed as dataclasses decoded from the dict that
``config_hocon.load_hocon`` produces, layered on the same defaults.

The input section is a tagged variant, discriminated exactly the way the
reference's circe decoders are (by the fields each transport defines:
Kinesis streamName+appName, Kafka topicName+bootstrapServers, PubSub
subscription, NSQ topic+lookupHost). ``assemble_plan`` turns the decoded
config + an enrichments directory into the same StreamConfig /
connector-conf objects the streaming runner consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from .config_hocon import load_hocon, parse_duration
from .sources.connectors import (
    KinesisSourceConf,
    PubSubSourceConf,
    StreamSinkConf,
    kinesis_conf_from_dict,
    sink_conf_from_dict,
)

# reference.conf defaults (modules/core/src/main/resources/reference.conf)
# pre-expanded: the library-level ${snowplow.defaults.*} indirections the
# JVM app resolves from the streams library's own reference.conf collapse
# to their documented defaults here.
REFERENCE_DEFAULTS: dict = {
    "license": {"accept": False},
    "output": {
        "good": {"attributes": []},
        "failed": {"attributes": []},
        "bad": {"attributes": []},
    },
    "cpuParallelismFraction": 1,
    "sinkParallelismFraction": 2,
    "monitoring": {
        "healthProbe": {"port": 8000, "unhealthyLatency": "2 minutes"},
    },
    "assetsUpdatePeriod": "7 days",
    "jsAllowedJavaClasses": ["*"],
    "validation": {
        "acceptInvalid": False,
        "atomicFieldsLimits": {},
        "maxJsonDepth": 50,
        "exitOnJsCompileError": True,
    },
    "metadata": {"interval": "5 minutes", "maxBodySize": 149000},
    "identity": {
        "concurrencyFactor": 0.75,
        "retries": {"delay": "100 millis", "attempts": 3},
    },
    "decompression": {
        "maxBytesInBatch": 5242880,
        "maxBytesSinglePayload": 10000000,
    },
    "http": {"client": {"requestTimeout": "5 seconds"}},
    "iglu": {"maxRetry": 2, "maxWait": "1 second"},
}


@dataclass
class KafkaSourceConf:
    topic: str = ""
    bootstrap_servers: str = ""
    consumer_conf: dict = field(default_factory=dict)
    debounce_commit_offsets_s: float = 10.0


@dataclass
class KafkaSinkAppConf:
    topic: str = ""
    bootstrap_servers: str = ""
    producer_conf: dict = field(default_factory=dict)
    partition_key: str | None = None
    attributes: tuple = ()


@dataclass
class NsqSourceConf:
    topic: str = ""
    channel: str = ""
    lookup_host: str = ""
    lookup_port: int = 4161


@dataclass
class HealthProbeConf:
    port: int = 8000
    unhealthy_latency_s: float = 120.0


@dataclass
class StatsdConf:
    hostname: str = ""
    port: int = 8125
    tags: dict = field(default_factory=dict)
    period_s: float = 60.0
    prefix: str = "snowplow.enrich"


@dataclass
class ValidationConf:
    accept_invalid: bool = False
    atomic_fields_limits: dict = field(default_factory=dict)
    max_json_depth: int = 50
    exit_on_js_compile_error: bool = True


@dataclass
class MetadataConf:
    endpoint: str | None = None
    interval_s: float = 300.0
    organization_id: str | None = None
    pipeline_id: str | None = None
    max_body_size: int = 149000


@dataclass
class DecompressionConf:
    max_bytes_in_batch: int = 5242880
    max_bytes_single_payload: int = 10000000


@dataclass
class AppConfig:
    license_accepted: bool = False
    transport: str = "file"               # kinesis | kafka | pubsub | nsq | file
    source: object = None                 # the transport's source conf
    sinks: dict = field(default_factory=dict)   # good/failed/bad → sink conf
    cpu_parallelism_fraction: float = 1.0
    sink_parallelism_fraction: float = 2.0
    health_probe: HealthProbeConf = field(default_factory=HealthProbeConf)
    statsd: StatsdConf | None = None
    assets_update_period_s: float = 7 * 86400.0
    validation: ValidationConf = field(default_factory=ValidationConf)
    metadata: MetadataConf | None = None
    decompression: DecompressionConf = field(default_factory=DecompressionConf)
    telemetry: dict = field(default_factory=dict)
    identity: dict = field(default_factory=dict)
    raw: dict = field(default_factory=dict)


def _detect_transport(inp: dict) -> str:
    """Discriminate the input variant the way the reference's transport-
    specific decoders do (each module decodes its own field set:
    KinesisSourceConfig streamName, KafkaSourceConfig topicName+
    bootstrapServers, PubsubSourceConfig subscription, NsqSourceConfig
    topic+lookupHost)."""
    if "subscription" in inp:
        return "pubsub"
    if "bootstrapServers" in inp or "topicName" in inp:
        return "kafka"
    if "lookupHost" in inp or ("topic" in inp and "channel" in inp):
        return "nsq"
    if "streamName" in inp:
        return "kinesis"
    if "path" in inp:
        return "file"
    raise ValueError(
        f"cannot detect input transport from fields {sorted(inp)} — "
        "expected streamName (kinesis), topicName/bootstrapServers (kafka), "
        "subscription (pubsub), topic+lookupHost (nsq), or path (file)")


def _decode_source(transport: str, inp: dict):
    if transport == "kinesis":
        return kinesis_conf_from_dict(inp)
    if transport == "kafka":
        return KafkaSourceConf(
            topic=inp.get("topicName", ""),
            bootstrap_servers=inp.get("bootstrapServers", ""),
            consumer_conf=dict(inp.get("consumerConf", {})),
            debounce_commit_offsets_s=parse_duration(
                inp.get("debounceCommitOffsets"), 10.0),
        )
    if transport == "pubsub":
        return PubSubSourceConf(subscription=inp.get("subscription", ""))
    if transport == "nsq":
        return NsqSourceConf(
            topic=inp.get("topic", ""), channel=inp.get("channel", ""),
            lookup_host=inp.get("lookupHost", ""),
            lookup_port=int(inp.get("lookupPort", 4161)),
        )
    return dict(inp)  # file


def _decode_sink(transport: str, d: dict):
    if transport == "kafka":
        return KafkaSinkAppConf(
            topic=d.get("topicName", d.get("topic", "")),
            bootstrap_servers=d.get("bootstrapServers", ""),
            producer_conf=dict(d.get("producerConf", {})),
            partition_key=d.get("partitionKey"),
            attributes=tuple(d.get("attributes", ())),
        )
    # kinesis / pubsub / nsq share the batched-writer shape
    return sink_conf_from_dict(d)


def decode_app_config(doc: dict) -> AppConfig:
    """Plain dict (parsed HOCON layered on REFERENCE_DEFAULTS) → AppConfig."""
    inp = doc.get("input", {})
    transport = _detect_transport(inp) if inp else "file"
    mon = doc.get("monitoring", {})
    hp = mon.get("healthProbe", {})
    statsd = mon.get("metrics", {}).get("statsd")
    val = doc.get("validation", {})
    meta = doc.get("metadata", {})
    dec = doc.get("decompression", {})
    out = doc.get("output", {})
    return AppConfig(
        license_accepted=bool(doc.get("license", {}).get("accept") in
                              (True, "true", "yes", "on")),
        transport=transport,
        source=_decode_source(transport, inp),
        sinks={k: _decode_sink(transport, v)
               for k, v in out.items() if isinstance(v, dict)},
        cpu_parallelism_fraction=float(doc.get("cpuParallelismFraction", 1)),
        sink_parallelism_fraction=float(doc.get("sinkParallelismFraction", 2)),
        health_probe=HealthProbeConf(
            port=int(hp.get("port", 8000)),
            unhealthy_latency_s=parse_duration(
                hp.get("unhealthyLatency"), 120.0),
        ),
        statsd=None if not statsd else StatsdConf(
            hostname=statsd.get("hostname", ""),
            port=int(statsd.get("port", 8125)),
            tags=dict(statsd.get("tags", {})),
            period_s=parse_duration(statsd.get("period"), 60.0),
            prefix=statsd.get("prefix", "snowplow.enrich"),
        ),
        assets_update_period_s=parse_duration(
            doc.get("assetsUpdatePeriod"), 7 * 86400.0),
        validation=ValidationConf(
            accept_invalid=bool(val.get("acceptInvalid", False)),
            atomic_fields_limits={k: int(v) for k, v in
                                  val.get("atomicFieldsLimits", {}).items()},
            max_json_depth=int(val.get("maxJsonDepth", 50)),
            exit_on_js_compile_error=bool(val.get("exitOnJsCompileError", True)),
        ),
        metadata=None if "endpoint" not in meta else MetadataConf(
            endpoint=meta.get("endpoint"),
            interval_s=parse_duration(meta.get("interval"), 300.0),
            organization_id=meta.get("organizationId"),
            pipeline_id=meta.get("pipelineId"),
            max_body_size=int(meta.get("maxBodySize", 149000)),
        ),
        decompression=DecompressionConf(
            max_bytes_in_batch=int(dec.get("maxBytesInBatch", 5242880)),
            max_bytes_single_payload=int(dec.get("maxBytesSinglePayload",
                                                 10000000)),
        ),
        telemetry=dict(doc.get("telemetry", {})),
        identity=dict(doc.get("identity", {})),
        raw=doc,
    )


def load_app_config(path: str | Path) -> AppConfig:
    """HOCON file → AppConfig (user config wins over reference defaults,
    core/Run.scala's ConfigFactory.load().withFallback(reference.conf))."""
    return decode_app_config(load_hocon(str(path), fallback=REFERENCE_DEFAULTS))


def assemble_plan(app: AppConfig, enrichments_dir: str | None = None,
                  iglu_resolver: str | None = None):
    """AppConfig (+ optional config/enrichments dir + iglu_resolver.json)
    → the StreamConfig the streaming/batch runner consumes. This is the
    boundary core/EnrichApp.scala:49 crosses when it builds Environment
    from Config."""
    from .config import (
        EnrichmentsConfig, load_enrichments_dir, load_iglu_resolver,
    )
    from .streaming.runner import StreamConfig

    if enrichments_dir:
        enr = load_enrichments_dir(enrichments_dir)
    else:
        enr = EnrichmentsConfig.default()
    if iglu_resolver:
        enr.iglu = load_iglu_resolver(iglu_resolver)
    enr.accept_invalid_atomic = app.validation.accept_invalid
    return StreamConfig(
        enrichments=enr,
        max_bytes_single_payload=app.decompression.max_bytes_single_payload,
    )
