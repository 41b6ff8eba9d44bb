"""In-process fake nsqd + nsqlookupd for connector tests.

Implements the server side of the public NSQ V2 TCP protocol
(https://nsq.io/clients/tcp_protocol_spec.html) far enough to exercise
the client in enrich_spark/sources/nsq.py: magic handshake, IDENTIFY,
PUB/MPUB, SUB/RDY/FIN/REQ/TOUCH/NOP/CLS, error frames for invalid
topics, push-mode message delivery with attempt counts, and periodic
``_heartbeat_`` frames. Topic→channel semantics follow nsqd: messages
published while a topic has no channel queue on the topic and are
handed to the first channel created; once channels exist every channel
gets its own copy.
"""

from __future__ import annotations

import collections
import itertools
import json
import re
import socket
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

FRAME_RESPONSE = 0
FRAME_ERROR = 1
FRAME_MESSAGE = 2
_TOPIC_RE = re.compile(r"^[.a-zA-Z0-9_-]{1,64}(#ephemeral)?$")
_id_counter = itertools.count(1)


class _Channel:
    def __init__(self):
        self.queue = collections.deque()   # (attempts_so_far, body)
        self.lock = threading.Lock()


class FakeNsqd:
    def __init__(self, heartbeat_interval: float = 30.0):
        self.heartbeat_interval = heartbeat_interval
        self.topics: dict[str, dict[str, _Channel]] = {}
        self.pending: dict[str, collections.deque] = {}
        self.lock = threading.Lock()
        self.nop_count = 0
        self.mpub_count = 0
        self.pub_count = 0
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)

    # -- topology --------------------------------------------------------
    def _publish(self, topic: str, bodies: list[bytes]):
        with self.lock:
            channels = self.topics.setdefault(topic, {})
            if not channels:
                self.pending.setdefault(topic, collections.deque()).extend(bodies)
                return
            for ch in channels.values():
                with ch.lock:
                    ch.queue.extend((0, b) for b in bodies)

    def _get_channel(self, topic: str, channel: str) -> _Channel:
        with self.lock:
            channels = self.topics.setdefault(topic, {})
            if channel not in channels:
                ch = channels[channel] = _Channel()
                backlog = self.pending.pop(topic, None)
                if backlog:
                    ch.queue.extend((0, b) for b in backlog)
            return channels[channel]

    def depth(self, topic: str, channel: str) -> int:
        ch = self.topics.get(topic, {}).get(channel)
        return len(ch.queue) if ch else len(self.pending.get(topic, ()))

    # -- server ----------------------------------------------------------
    def _accept_loop(self):
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            t = threading.Thread(target=self._handle, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    @staticmethod
    def _frame(sock, ftype: int, data: bytes):
        payload = struct.pack(">i", ftype) + data
        sock.sendall(struct.pack(">I", len(payload)) + payload)

    def _handle(self, conn: socket.socket):
        conn.settimeout(0.05)
        buf = b""
        sub: _Channel | None = None
        rdy = 0
        inflight: dict[bytes, tuple[int, bytes]] = {}
        last_hb = time.monotonic()

        def read_exact(n: int) -> bytes:
            nonlocal buf
            deadline = time.monotonic() + 5.0
            while len(buf) < n:
                if time.monotonic() > deadline:
                    raise ConnectionError("body read timeout")
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    continue
                if not chunk:
                    raise ConnectionError("closed")
                buf += chunk
            out, rest = buf[:n], buf[n:]
            buf = rest
            return out

        try:
            magic = read_exact(4)
            if magic != b"  V2":
                return
            while not self._stop.is_set():
                # deliver pushed messages while ready
                if sub is not None and rdy > 0:
                    while rdy > 0:
                        with sub.lock:
                            if not sub.queue:
                                break
                            attempts, body = sub.queue.popleft()
                        mid = f"{next(_id_counter):016x}".encode("ascii")
                        inflight[mid] = (attempts + 1, body)
                        data = (struct.pack(">qH", time.time_ns(),
                                            attempts + 1) + mid + body)
                        self._frame(conn, FRAME_MESSAGE, data)
                        rdy -= 1
                if (self.heartbeat_interval and
                        time.monotonic() - last_hb > self.heartbeat_interval):
                    self._frame(conn, FRAME_RESPONSE, b"_heartbeat_")
                    last_hb = time.monotonic()
                # read one command line if available
                nl = buf.find(b"\n")
                if nl < 0:
                    try:
                        chunk = conn.recv(65536)
                    except socket.timeout:
                        continue
                    if not chunk:
                        return
                    buf += chunk
                    continue
                line, buf = buf[:nl].decode("ascii", "replace"), buf[nl + 1:]
                parts = line.split(" ")
                verb = parts[0]
                if verb == "IDENTIFY":
                    size = struct.unpack(">I", read_exact(4))[0]
                    read_exact(size)
                    self._frame(conn, FRAME_RESPONSE, b"OK")
                elif verb == "PUB":
                    size = struct.unpack(">I", read_exact(4))[0]
                    body = read_exact(size)
                    if not _TOPIC_RE.match(parts[1] if len(parts) > 1 else ""):
                        self._frame(conn, FRAME_ERROR, b"E_BAD_TOPIC")
                        continue
                    self._publish(parts[1], [body])
                    self.pub_count += 1
                    self._frame(conn, FRAME_RESPONSE, b"OK")
                elif verb == "MPUB":
                    size = struct.unpack(">I", read_exact(4))[0]
                    blob = read_exact(size)
                    if not _TOPIC_RE.match(parts[1] if len(parts) > 1 else ""):
                        self._frame(conn, FRAME_ERROR, b"E_BAD_TOPIC")
                        continue
                    (count,) = struct.unpack(">I", blob[:4])
                    bodies, off = [], 4
                    for _ in range(count):
                        (bl,) = struct.unpack(">I", blob[off:off + 4])
                        bodies.append(blob[off + 4:off + 4 + bl])
                        off += 4 + bl
                    self._publish(parts[1], bodies)
                    self.mpub_count += 1
                    self._frame(conn, FRAME_RESPONSE, b"OK")
                elif verb == "SUB":
                    if len(parts) < 3 or not _TOPIC_RE.match(parts[1]):
                        self._frame(conn, FRAME_ERROR, b"E_BAD_TOPIC")
                        continue
                    sub = self._get_channel(parts[1], parts[2])
                    self._frame(conn, FRAME_RESPONSE, b"OK")
                elif verb == "RDY":
                    rdy = int(parts[1]) if len(parts) > 1 else 0
                elif verb == "FIN":
                    inflight.pop(parts[1].encode("ascii"), None)
                elif verb == "REQ":
                    entry = inflight.pop(parts[1].encode("ascii"), None)
                    if entry is not None and sub is not None:
                        with sub.lock:
                            sub.queue.appendleft(entry)
                elif verb == "TOUCH":
                    pass
                elif verb == "NOP":
                    self.nop_count += 1
                elif verb == "CLS":
                    self._frame(conn, FRAME_RESPONSE, b"CLOSE_WAIT")
                    return
                else:
                    self._frame(conn, FRAME_ERROR, b"E_INVALID")
        except (ConnectionError, OSError):
            return
        finally:
            # a dropped consumer requeues its un-FINed messages (nsqd
            # redelivery contract)
            if sub is not None and inflight:
                with sub.lock:
                    for entry in inflight.values():
                        sub.queue.appendleft(entry)
            try:
                conn.close()
            except OSError:
                pass

    def stop(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass


class FakeLookupd:
    """nsqlookupd v1 HTTP /lookup endpoint advertising one fake nsqd."""

    def __init__(self, nsqd_port: int):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path.startswith("/lookup"):
                    doc = {"channels": [], "producers": [{
                        "broadcast_address": "127.0.0.1",
                        "hostname": "fake-nsqd",
                        "tcp_port": outer.nsqd_port,
                        "http_port": 0,
                    }]}
                    body = json.dumps(doc).encode()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

            def log_message(self, *a):
                pass

        self.nsqd_port = nsqd_port
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
