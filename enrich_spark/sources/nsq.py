"""NSQ source/sink — the reference's fourth runner transport.

Reference surface: modules/nsq/src/main/scala/.../NsqApp.scala:24 (an
EnrichApp over NsqSourceConfig/NsqSinkConfig) configured by
config/config.nsq.reference.hocon — input = topic + channel +
nsqlookupd host/port, outputs good/failed/bad = topic + nsqd host/port
+ byteLimit + backoffPolicy. The app-config side already decodes those
files (appconfig.NsqSourceConf / decode_app_config); this module adds
the actual transport: a pure-stdlib implementation of the public NSQ
V2 TCP wire protocol (https://nsq.io/clients/tcp_protocol_spec.html)
and the nsqlookupd v1 HTTP discovery API, so the connector is fully
exercisable against any nsqd — including the in-process fake server
the tests run (no broker ships in this sandbox).

Wire protocol implemented (all public spec):
- magic ``  V2`` on connect, then newline-terminated commands;
  IDENTIFY/PUB/MPUB carry a 4-byte big-endian sized body.
- server frames: [4-byte size][4-byte frame type][data] with types
  0=response, 1=error, 2=message; message data = 8-byte nanosecond
  timestamp + 2-byte attempts + 16-byte message id + body.
- ``_heartbeat_`` response frames are answered with NOP transparently
  inside the frame reader (liveness contract of the spec).
- consumer flow control: SUB topic channel, RDY n, FIN/REQ/TOUCH id.

Scale shape: the sink runs per-partition on executors (one connection
per task, MPUB batches under byteLimit — same batched-writer
discipline as the Kinesis/PubSub writers, ship_rows backoff included),
so write throughput scales with partition count. The source is a
micro-batch drain; NSQ's own scale-out unit is the channel (N readers
on one channel split the stream), so parallel ingest = k reader
connections on the same channel, exposed via ``parallelism``.
"""

from __future__ import annotations

import json as _json
import socket as _socket
import struct as _struct
import time as _time
import urllib.request as _urlreq
from dataclasses import dataclass, field

MAGIC_V2 = b"  V2"
FRAME_RESPONSE = 0
FRAME_ERROR = 1
FRAME_MESSAGE = 2
_HEARTBEAT = b"_heartbeat_"


class NsqError(RuntimeError):
    """An E_* error frame from nsqd (protocol violation, bad topic...)."""


@dataclass
class NsqMessage:
    id: str                      # 16-byte ascii message id
    attempts: int
    timestamp_ns: int
    body: bytes


@dataclass
class NsqSinkConf:
    """`output.good|failed|bad` of config.nsq.reference.hocon."""
    topic: str = ""
    nsqd_host: str = "127.0.0.1"
    nsqd_port: int = 4150
    byte_limit: int = 5_000_000
    max_retries: int = 10
    min_backoff_s: float = 0.1
    max_backoff_s: float = 10.0


def nsq_sink_conf_from_dict(d: dict) -> NsqSinkConf:
    """Decode one NSQ output block (field names are the reference's)."""
    from .connectors import sink_conf_from_dict
    # reuse the HOCON-duration logic via the kinesis decoder by mapping
    # NSQ's `backoffPolicy` onto the field it reads
    backoff = d.get("backoffPolicy", {}) or {}
    base = sink_conf_from_dict({**d, "throttledBackoffPolicy": backoff})
    return NsqSinkConf(
        topic=d.get("topic", ""),
        nsqd_host=d.get("nsqdHost", "127.0.0.1"),
        nsqd_port=int(d.get("nsqdPort", 4150)),
        byte_limit=int(d.get("byteLimit", 5_000_000)),
        # the reference nests maxRetries INSIDE backoffPolicy
        # (config.nsq.reference.hocon:40-44), unlike kinesis where it is
        # a sibling of throttledBackoffPolicy — read nested first
        max_retries=int(backoff.get("maxRetries", d.get("maxRetries", 10))),
        min_backoff_s=base.min_backoff_s,
        max_backoff_s=base.max_backoff_s,
    )


class NsqdClient:
    """One V2-protocol connection to an nsqd (producer or consumer)."""

    def __init__(self, host: str, port: int, timeout: float = 5.0,
                 client_id: str = "enrich-spark"):
        self.host, self.port, self.timeout = host, port, timeout
        self.client_id = client_id
        self._sock: _socket.socket | None = None
        self._buf = b""

    # -- connection ------------------------------------------------------
    def connect(self) -> "NsqdClient":
        s = _socket.create_connection((self.host, self.port), self.timeout)
        s.settimeout(self.timeout)
        self._sock = s
        self._buf = b""
        s.sendall(MAGIC_V2)
        ident = _json.dumps({
            "client_id": self.client_id,
            "hostname": _socket.gethostname(),
            "user_agent": "enrich-spark-nsq/1.0",
            "feature_negotiation": False,
        }).encode()
        self._command(b"IDENTIFY", body=ident)
        self._expect_ok()
        return self

    def close(self):
        if self._sock is not None:
            try:
                self._sock.sendall(b"CLS\n")
            except OSError:
                pass
            try:
                self._sock.close()
            finally:
                self._sock = None

    def __enter__(self):
        return self.connect()

    def __exit__(self, *exc):
        self.close()

    # -- low-level framing ----------------------------------------------
    def _command(self, line: bytes, body: bytes | None = None):
        out = line + b"\n"
        if body is not None:
            out += _struct.pack(">I", len(body)) + body
        self._sock.sendall(out)

    def _fill(self, n: int, deadline: float | None):
        """Grow the buffer to ≥ n bytes WITHOUT consuming — a timeout
        mid-frame must leave the stream aligned for the next read."""
        while len(self._buf) < n:
            if deadline is not None:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    raise _socket.timeout()
                self._sock.settimeout(min(remaining, self.timeout))
            else:
                self._sock.settimeout(self.timeout)
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("nsqd closed the connection")
            self._buf += chunk

    def _read_exact(self, n: int, deadline: float | None) -> bytes:
        self._fill(n, deadline)
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_frame(self, deadline: float | None = None):
        """Next (frame_type, data), answering heartbeats transparently."""
        while True:
            self._fill(4, deadline)
            size = _struct.unpack(">I", self._buf[:4])[0]
            self._fill(4 + size, deadline)  # whole frame before consuming
            data = self._buf[4:4 + size]
            self._buf = self._buf[4 + size:]
            ftype = _struct.unpack(">i", data[:4])[0]
            payload = data[4:]
            if ftype == FRAME_RESPONSE and payload == _HEARTBEAT:
                self._command(b"NOP")
                continue
            return ftype, payload

    def _expect_ok(self):
        ftype, payload = self._read_frame()
        if ftype == FRAME_ERROR:
            raise NsqError(payload.decode("utf-8", "replace"))
        if ftype != FRAME_RESPONSE or payload != b"OK":
            raise NsqError(f"unexpected reply: type={ftype} {payload[:64]!r}")

    # -- producer --------------------------------------------------------
    def pub(self, topic: str, body: bytes):
        self._command(b"PUB " + topic.encode(), body=body)
        self._expect_ok()

    def mpub(self, topic: str, bodies: list[bytes]):
        packed = _struct.pack(">I", len(bodies)) + b"".join(
            _struct.pack(">I", len(b)) + b for b in bodies)
        self._command(b"MPUB " + topic.encode(), body=packed)
        self._expect_ok()

    # -- consumer --------------------------------------------------------
    def sub(self, topic: str, channel: str):
        self._command(f"SUB {topic} {channel}".encode())
        self._expect_ok()

    def rdy(self, count: int):
        self._command(f"RDY {count}".encode())  # no reply frame

    def fin(self, message_id: str):
        self._command(b"FIN " + message_id.encode())

    def req(self, message_id: str, timeout_ms: int = 0):
        self._command(f"REQ {message_id} {timeout_ms}".encode())

    def touch(self, message_id: str):
        self._command(b"TOUCH " + message_id.encode())

    def read_message(self, timeout: float | None = None) -> NsqMessage | None:
        """Next pushed message, or None if `timeout` elapses first."""
        deadline = None if timeout is None else _time.monotonic() + timeout
        try:
            ftype, payload = self._read_frame(deadline)
        except _socket.timeout:
            return None
        if ftype == FRAME_ERROR:
            raise NsqError(payload.decode("utf-8", "replace"))
        if ftype != FRAME_MESSAGE:
            return None  # stray OK (e.g. from a prior CLS race)
        ts, attempts = _struct.unpack(">qH", payload[:10])
        return NsqMessage(id=payload[10:26].decode("ascii"),
                          attempts=attempts, timestamp_ns=ts,
                          body=payload[26:])


def lookup_nsqd(lookup_host: str, lookup_port: int, topic: str,
                timeout: float = 5.0) -> list[tuple[str, int]]:
    """nsqlookupd v1 HTTP discovery: GET /lookup?topic= →
    [(broadcast_address, tcp_port)] (handles the legacy {"data": ...}
    envelope older nsqlookupd versions wrap around the payload)."""
    url = f"http://{lookup_host}:{lookup_port}/lookup?topic={topic}"
    with _urlreq.urlopen(url, timeout=timeout) as r:
        doc = _json.loads(r.read().decode("utf-8"))
    if "data" in doc and isinstance(doc["data"], dict):
        doc = doc["data"]
    return [(p.get("broadcast_address", p.get("hostname", "")),
             int(p["tcp_port"])) for p in doc.get("producers", [])]


# -- Spark-facing sink ----------------------------------------------------

class NsqSender:
    """Picklable per-executor sender: lazily connects, MPUBs batches,
    reports full-batch failure indices so ship_rows drives backoff
    (MPUB is atomic on the nsqd side — all-or-nothing, so a failed
    request retries every record)."""

    def __init__(self, conf: NsqSinkConf):
        self.conf = conf
        self._client: NsqdClient | None = None

    def __getstate__(self):
        return {"conf": self.conf}

    def __setstate__(self, state):
        self.conf = state["conf"]
        self._client = None

    def _get(self) -> NsqdClient:
        if self._client is None:
            self._client = NsqdClient(
                self.conf.nsqd_host, self.conf.nsqd_port).connect()
        return self._client

    def __call__(self, topic: str, batch: list[tuple[str, bytes]]) -> list[int]:
        bodies = [payload for _key, payload in batch]  # NSQ has no partition key
        try:
            self._get().mpub(topic or self.conf.topic, bodies)
            return []
        except NsqError:
            raise          # protocol rejection is permanent — crash like the reference
        except OSError:
            self._close()
            return list(range(len(batch)))  # transient: retry whole batch

    def _close(self):
        if self._client is not None:
            try:
                self._client.close()
            finally:
                self._client = None


def nsq_ship_rows(rows: list[tuple[str, bytes]], conf: NsqSinkConf,
                  sender: NsqSender | None = None, sleep=_time.sleep) -> int:
    """Batch (key, payload) rows under byteLimit and MPUB with the shared
    retry/backoff loop. Returns MPUB requests sent."""
    from .connectors import StreamSinkConf, ship_rows
    shim = StreamSinkConf(
        stream_name=conf.topic,
        record_limit=1_000_000,            # NSQ bounds by bytes, not records
        byte_limit=conf.byte_limit,
        max_retries=conf.max_retries,
        min_backoff_s=conf.min_backoff_s,
        max_backoff_s=conf.max_backoff_s,
    )
    return ship_rows(rows, shim, sender or NsqSender(conf), sleep=sleep)


def nsq_sink_writer(df, conf: NsqSinkConf, value_col: str = "value",
                    checkpoint: str | None = None):
    """foreachBatch streaming writer → nsqd, one connection per task."""
    from .connectors import StreamSinkConf, stream_sink_writer
    shim = StreamSinkConf(
        stream_name=conf.topic, record_limit=1_000_000,
        byte_limit=conf.byte_limit, max_retries=conf.max_retries,
        min_backoff_s=conf.min_backoff_s, max_backoff_s=conf.max_backoff_s,
    )
    return stream_sink_writer(df, shim, NsqSender(conf), value_col=value_col,
                              checkpoint=checkpoint)


def nsq_microbatch(spark, source_conf, nsqd: tuple[str, int] | None = None,
                   max_messages: int = 1000, poll_timeout_s: float = 1.0,
                   parallelism: int = 1):
    """Drain up to `max_messages` from (topic, channel) into a DataFrame
    with the connector-normal shape (value binary + metadata).

    At-least-once: FIN is DEFERRED until the whole drain succeeds — a
    failure mid-drain REQs (requeues) every received-but-unacked message
    so nsqd redelivers it, matching the reference app's process-then-ack
    flow (modules/nsq/.../Source.scala acks after the batch is handed to
    the pipeline, never on receipt). `nsqd` overrides lookupd discovery
    (tests, or a direct-nsqd deployment). `parallelism` opens k
    connections on the SAME channel — NSQ's unit of consumer scale-out."""
    from pyspark.sql import types as T

    if nsqd is None:
        producers = lookup_nsqd(source_conf.lookup_host,
                                source_conf.lookup_port, source_conf.topic)
        if not producers:
            raise NsqError(f"no nsqd hosts topic {source_conf.topic!r}")
        nsqd = producers[0]

    rows = []
    clients = []
    pending: list[tuple[NsqdClient, str]] = []  # (conn, msg_id) to ack
    try:
        for _ in range(max(1, parallelism)):
            c = NsqdClient(*nsqd).connect()
            c.sub(source_conf.topic, source_conf.channel)
            c.rdy(max_messages)
            clients.append(c)
        deadline = _time.monotonic() + poll_timeout_s
        i = 0
        while len(rows) < max_messages and _time.monotonic() < deadline:
            # short non-blocking-ish poll per client: an idle connection
            # must not starve one that still has buffered deliveries
            c = clients[i % len(clients)]
            i += 1
            msg = c.read_message(timeout=0.05)
            if msg is None:
                continue
            pending.append((c, msg.id))
            rows.append((bytearray(msg.body), msg.id, msg.attempts,
                         msg.timestamp_ns))
        # drain complete → ack everything on its own connection
        for c, mid in pending:
            c.fin(mid)
        pending.clear()
    except BaseException:
        # requeue everything we received but never acked so nsqd
        # redelivers (attempts increments); best-effort — a dead socket
        # requeues via nsqd's msg_timeout anyway. RDY 0 first so nsqd
        # stops pushing to this dying connection (standard client flow).
        for c in clients:
            try:
                c.rdy(0)
            except Exception:
                pass
        for c, mid in pending:
            try:
                c.req(mid, 0)
            except Exception:
                pass
        raise
    finally:
        for c in clients:
            c.close()

    schema = T.StructType([
        T.StructField("value", T.BinaryType()),
        T.StructField("message_id", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("timestamp_ns", T.LongType()),
    ])
    return spark.createDataFrame([tuple(r) for r in rows], schema)
