"""Observability floor: metrics, health probe, metadata reporter.

Mirrors the reference's runtime contract:

* **Metrics** (core/Metrics.scala): counters ``raw`` / ``good`` /
  ``failed`` / ``bad`` / ``dropped`` / ``invalid_enriched`` and timers
  ``latency_millis`` / ``e2e_latency_millis``, reported to statsd on a
  period with the configured prefix and tags (the statsd line protocol
  with ``|#k:v`` tag suffixes, as the snowplow runtime common library
  emits). The UDP socket is injectable so tests capture the lines.

* **Health probe** (core/Config.scala:107 HealthProbe + the baseline's
  headline knob): the app is *unhealthy* once any received event is
  still unprocessed past ``unhealthyLatency`` (default 2 minutes —
  BASELINE.md's end-to-end ceiling). ``HealthProbe.healthy()`` is the
  check; ``serve()`` exposes the reference's HTTP endpoint shape
  (200 OK / 503) on the configured port.

* **Metadata reporter** (core/MetadataReporter.scala:48-215): batches
  ``Metadata.Aggregates`` per interval and POSTs them to the iglu
  webhook endpoint as tracker-protocol events — each aggregate row
  becomes ``{"aid", "e": "ue", "ue_px", "cx"}`` where ``ue_px`` is the
  base64 SDJ envelope of ``com.snowplowanalytics.console/observed_event/
  jsonschema/6-0-1`` and ``cx`` the contexts envelope of
  ``observed_entity/4-0-0`` rows; bodies batch up to ``maxBodySize`` and
  ship inside the ``payload_data/1-0-4`` envelope to
  ``<endpoint>/com.snowplowanalytics.snowplow/tp2`` with fibonacci
  backoff and a 10-retry cap, dropping (never crashing) on final
  failure. Transport and clock are injectable for tests.

The foreachBatch integration lives in ``attach_observers`` — wired by
``streaming/runner.run_stream`` when a ``BatchObservers`` is present on
the StreamConfig, so the default path pays nothing.
"""

from __future__ import annotations

import base64
import json
import time as _time
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# metrics


class Metrics:
    """Counter/timer registry with statsd reporting (core/Metrics.scala).

    ``sender`` is a callable receiving the formatted statsd payload
    (bytes) — a UDP socket sendto in production, a list.append in tests.
    """

    COUNTERS = ("raw", "good", "failed", "bad", "dropped", "invalid_enriched")
    TIMERS = ("latency_millis", "e2e_latency_millis")

    def __init__(self, prefix: str = "snowplow.enrich", tags: dict | None = None,
                 period_s: float = 60.0, sender=None, clock=_time.monotonic):
        self.prefix = prefix
        self.tags = dict(tags or {})
        self.period_s = period_s
        self._sender = sender
        self._clock = clock
        self._counts = {c: 0 for c in self.COUNTERS}
        self._timers = {t: None for t in self.TIMERS}
        self._last_report = clock()

    # the reference's add*/set* surface
    def add(self, name: str, n: int):
        self._counts[name] += int(n)

    def set_latency(self, seconds: float):
        self._timers["latency_millis"] = seconds * 1000.0

    def set_e2e_latency(self, seconds: float):
        self._timers["e2e_latency_millis"] = seconds * 1000.0

    def scrape(self) -> dict:
        return {**self._counts,
                **{k: v for k, v in self._timers.items() if v is not None}}

    def statsd_lines(self) -> list[str]:
        tag_suffix = ""
        if self.tags:
            tag_suffix = "|#" + ",".join(f"{k}:{v}" for k, v in
                                         sorted(self.tags.items()))
        lines = [f"{self.prefix}.{c}:{self._counts[c]}|c{tag_suffix}"
                 for c in self.COUNTERS]
        lines += [f"{self.prefix}.{t}:{int(v)}|g{tag_suffix}"
                  for t, v in self._timers.items() if v is not None]
        return lines

    def maybe_report(self, force: bool = False):
        """Ship one statsd datagram per line when the period elapsed;
        counters reset after a successful report (statsd counters are
        per-period deltas)."""
        now = self._clock()
        if not force and now - self._last_report < self.period_s:
            return False
        if self._sender is not None:
            for line in self.statsd_lines():
                self._sender(line.encode("utf-8"))
        self._last_report = now
        for c in self._counts:
            self._counts[c] = 0
        return True


def udp_sender(hostname: str, port: int):
    """Production statsd transport: one UDP datagram per metric line."""
    import socket

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    addr = (hostname, port)
    return lambda payload: sock.sendto(payload, addr)


# ---------------------------------------------------------------------------
# health probe


class HealthProbe:
    """Unhealthy once any received event is still unprocessed past the
    latency ceiling (reference healthProbe.unhealthyLatency, default 2
    minutes). Batch completion records the batch's oldest event age;
    between completions the age of the oldest IN-FLIGHT batch keeps
    growing — both sides are checked so a stalled pipeline flips the
    probe without needing a completed batch to notice."""

    def __init__(self, unhealthy_latency_s: float = 120.0, clock=_time.monotonic):
        self.unhealthy_latency_s = unhealthy_latency_s
        self._clock = clock
        self._last_e2e_s: float | None = None
        self._inflight_since: float | None = None

    def batch_started(self):
        if self._inflight_since is None:
            self._inflight_since = self._clock()

    def batch_completed(self, e2e_latency_s: float):
        self._last_e2e_s = e2e_latency_s
        self._inflight_since = None

    def healthy(self) -> bool:
        if self._last_e2e_s is not None and \
                self._last_e2e_s > self.unhealthy_latency_s:
            return False
        if self._inflight_since is not None and \
                self._clock() - self._inflight_since > self.unhealthy_latency_s:
            return False
        return True

    def serve(self, port: int):
        """Expose the reference's HTTP probe shape: 200 when healthy,
        503 otherwise. Returns the http.server instance (daemon thread)."""
        import http.server
        import threading

        probe = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — stdlib naming
                code = 200 if probe.healthy() else 503
                body = b"OK" if code == 200 else b"UNHEALTHY"
                self.send_response(code)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        srv = http.server.ThreadingHTTPServer(("0.0.0.0", port), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv


# ---------------------------------------------------------------------------
# metadata reporter

_OBSERVED_EVENT = ("iglu:com.snowplowanalytics.console/observed_event/"
                   "jsonschema/6-0-1")
_OBSERVED_ENTITY = ("iglu:com.snowplowanalytics.console/observed_entity/"
                    "jsonschema/4-0-0")
_UNSTRUCT = ("iglu:com.snowplowanalytics.snowplow/unstruct_event/"
             "jsonschema/1-0-0")
_CONTEXTS = "iglu:com.snowplowanalytics.snowplow/contexts/jsonschema/1-0-1"
_PAYLOAD_DATA = ("iglu:com.snowplowanalytics.snowplow/payload_data/"
                 "jsonschema/1-0-4")


def _b64(s: str) -> str:
    return base64.b64encode(s.encode("utf-8")).decode("ascii")


def _split_schema(uri: str | None):
    """iglu:vendor/name/format/M-m-p → (vendor, name, 'M-m-p')."""
    if not uri or not uri.startswith("iglu:"):
        return None
    parts = uri[5:].split("/")
    if len(parts) != 4:
        return None
    return parts[0], parts[1], parts[3]


@dataclass
class MetadataReporter:
    """Batch + ship metadata aggregates (core/MetadataReporter.scala).

    ``post`` is the injectable transport: ``post(url, body) -> status``.
    ``sleep``/``now_iso`` injectable for deterministic retry tests.
    """

    endpoint: str
    organization_id: str | None = None
    pipeline_id: str | None = None
    interval_s: float = 300.0
    max_body_size: int = 149000
    app_name: str = "enrich-spark"
    post: object = None
    sleep: object = _time.sleep
    clock: object = _time.monotonic
    now_iso: object = None
    max_retries: int = 10
    _pending: list = field(default_factory=list)
    _last_flush: float | None = None

    def add(self, rows):
        """Accumulate aggregate rows — dicts (or Row objects) with the
        collect_metadata columns: event_vendor/event_name/event_format/
        event_version/app_id/v_tracker/platform/n_events/entity_schemas."""
        for r in rows:
            d = r if isinstance(r, dict) else r.asDict()
            self._pending.append(d)

    def maybe_flush(self, force: bool = False) -> int:
        now = self.clock()
        if self._last_flush is None:
            self._last_flush = now
        if not force and now - self._last_flush < self.interval_s:
            return 0
        self._last_flush = now
        if not self._pending:
            return 0
        rows, self._pending = self._pending, []
        events = [json.dumps(self._tracker_event(d), separators=(",", ":"))
                  for d in rows]
        sent = 0
        for body in self._batch_up(events):
            self._report(body)
            sent += 1
        return sent

    # -- reference payload shapes ------------------------------------------

    def _tracker_event(self, d: dict) -> dict:
        iso = (self.now_iso() if self.now_iso else
               _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()))
        period_start = iso  # period bounds both stamped at flush time;
        # the reference subtracts the interval for periodStart — callers
        # injecting now_iso can model that exactly in tests
        ev_schema = None
        if d.get("event_vendor") and d.get("event_name"):
            ev_schema = (d["event_vendor"], d["event_name"],
                         d.get("event_version") or "unknown-version")
        observed = {
            "schema": _OBSERVED_EVENT.replace("iglu:", "iglu:"),
            "data": {
                "organizationId": self.organization_id,
                "pipelineId": self.pipeline_id,
                "eventVendor": ev_schema[0] if ev_schema else "unknown-vendor",
                "eventName": ev_schema[1] if ev_schema else "unknown-name",
                "eventVersion": ev_schema[2] if ev_schema else "unknown-version",
                "source": d.get("app_id") or "unknown-source",
                "tracker": d.get("v_tracker") or "unknown-tracker",
                "platform": d.get("platform") or "unknown-platform",
                "scenario_id": None,
                "eventVolume": int(d.get("n_events") or 0),
                "periodStart": period_start,
                "periodEnd": iso,
            },
        }
        ue = {"schema": _UNSTRUCT, "data": observed}
        entities = []
        for uri in d.get("entity_schemas") or ():
            parts = _split_schema(uri)
            if parts is None:
                continue
            entities.append({
                "schema": _OBSERVED_ENTITY,
                "data": {"entityVendor": parts[0], "entityName": parts[1],
                         "entityVersion": parts[2]},
            })
        co = {"schema": _CONTEXTS, "data": entities}
        return {
            "aid": self.app_name,
            "e": "ue",
            "ue_px": _b64(json.dumps(ue, separators=(",", ":"))),
            "cx": _b64(json.dumps(co, separators=(",", ":"))),
        }

    def _batch_up(self, events: list[str]):
        """payload_data envelopes not exceeding max_body_size (the
        reference's BatchUp.noTimeout on string length)."""
        batch: list[str] = []
        size = 0
        for e in events:
            if batch and size + len(e) > self.max_body_size:
                yield self._envelope(batch)
                batch, size = [], 0
            batch.append(e)
            size += len(e)
        if batch:
            yield self._envelope(batch)

    @staticmethod
    def _envelope(events: list[str]) -> str:
        return ('{"schema":"%s","data":[%s]}'
                % (_PAYLOAD_DATA, ",".join(events)))

    def _report(self, body: str):
        """POST with fibonacci backoff, ≤ max_retries attempts, DROP on
        final failure (the reference voidErrors rather than crash)."""
        url = self.endpoint.rstrip("/") + "/com.snowplowanalytics.snowplow/tp2"
        a, b = 0.1, 0.1  # fibonacci backoff from 100 millis
        for attempt in range(self.max_retries + 1):
            try:
                status = self.post(url, body)
            except Exception:
                status = None
            if status is not None and 200 <= int(status) < 300:
                return True
            if attempt < self.max_retries:
                self.sleep(a)
                a, b = b, a + b
        return False


# ---------------------------------------------------------------------------
# foreachBatch integration


@dataclass
class BatchObservers:
    metrics: Metrics | None = None
    health: HealthProbe | None = None
    metadata: MetadataReporter | None = None


def attach_observers(obs: BatchObservers, counts: dict,
                     oldest_collector_ts=None, meta_rows=None,
                     wallclock=_time.time):
    """One foreachBatch completion: update counters, e2e latency (now −
    oldest collector_tstamp in the batch, Processing.scala:281-291),
    health, and the metadata accumulator."""
    e2e_s = None
    if oldest_collector_ts is not None:
        try:
            e2e_s = max(0.0, wallclock() - oldest_collector_ts.timestamp())
        except (AttributeError, TypeError):
            e2e_s = None
    if obs.metrics is not None:
        for k, v in counts.items():
            obs.metrics.add(k, v)
        if e2e_s is not None:
            obs.metrics.set_e2e_latency(e2e_s)
        obs.metrics.maybe_report()
    if obs.health is not None:
        obs.health.batch_completed(e2e_s if e2e_s is not None else 0.0)
    if obs.metadata is not None:
        if meta_rows:
            obs.metadata.add(meta_rows)
        obs.metadata.maybe_flush()
    return e2e_s
