"""In-process fake Pub/Sub speaking the public v1 REST API: publish,
pull, acknowledge, modifyAckDeadline — with injectable transient
failures. Same role as fake_nsqd.py / fake_kinesis.py."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class FakePubSub:
    def __init__(self):
        # topic -> list of message dicts; subscription -> topic
        self.topics: dict[str, list[dict]] = {}
        self.subs: dict[str, dict] = {}   # name -> {"topic", "cursor", "unacked": {ackId: msg}}
        self.publish_requests: list[dict] = []
        self.deadline_extensions: list[tuple[str, int]] = []
        self.fail_next_publishes = 0      # transient 503s to inject
        self.lock = threading.Lock()
        self._mid = 0
        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), self._handler())
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True).start()

    @property
    def host(self) -> str:
        return f"127.0.0.1:{self._srv.server_address[1]}"

    def stop(self):
        self._srv.shutdown()

    def create(self, topic: str, subscription: str):
        with self.lock:
            self.topics[topic] = []
            self.subs[subscription] = {
                "topic": topic, "cursor": 0, "unacked": {}}

    def backlog(self, subscription: str) -> int:
        with self.lock:
            s = self.subs[subscription]
            return (len(self.topics[s["topic"]]) - s["cursor"]
                    + len(s["unacked"]) + len(s.get("redeliver", [])))

    def expire_leases(self, subscription: str):
        """Simulate the ack deadline passing: every unacked message
        becomes pullable again (what real Pub/Sub does automatically)."""
        with self.lock:
            s = self.subs[subscription]
            s.setdefault("redeliver", []).extend(s["unacked"].values())
            s["unacked"].clear()

    # -- protocol ---------------------------------------------------------
    def _publish(self, name: str, body: dict):
        with self.lock:
            if self.fail_next_publishes > 0:
                self.fail_next_publishes -= 1
                return {"error": "unavailable"}, 503
            self.publish_requests.append(body)
            ids = []
            for m in body.get("messages", []):
                self._mid += 1
                ids.append(str(self._mid))
                self.topics[name].append({
                    "data": m.get("data", ""),
                    "attributes": m.get("attributes", {}),
                    "messageId": str(self._mid),
                    "publishTime": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                })
            return {"messageIds": ids}, 200

    def _pull(self, name: str, body: dict):
        with self.lock:
            s = self.subs[name]
            msgs = self.topics[s["topic"]]
            n = int(body.get("maxMessages", 100))
            # expired leases are served first (redelivery)
            page = s.get("redeliver", [])[:n]
            s["redeliver"] = s.get("redeliver", [])[len(page):]
            fresh = msgs[s["cursor"]:s["cursor"] + (n - len(page))]
            s["cursor"] += len(fresh)
            out = []
            for m in page + fresh:
                ack = f"ack-{m['messageId']}"
                s["unacked"][ack] = m
                out.append({"ackId": ack, "message": m})
            return {"receivedMessages": out}, 200

    def _ack(self, name: str, body: dict):
        with self.lock:
            s = self.subs[name]
            for a in body.get("ackIds", []):
                s["unacked"].pop(a, None)
            return {}, 200

    def _modify(self, name: str, body: dict):
        with self.lock:
            for a in body.get("ackIds", []):
                self.deadline_extensions.append(
                    (a, int(body.get("ackDeadlineSeconds", 0))))
            return {}, 200

    def _handler(self):
        broker = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                    or b"{}")
                # /v1/<resource-name>:<verb>
                path = self.path[len("/v1/"):]
                name, _, verb = path.rpartition(":")
                try:
                    fn = {"publish": broker._publish,
                          "pull": broker._pull,
                          "acknowledge": broker._ack,
                          "modifyAckDeadline": broker._modify}[verb]
                    resp, code = fn(name, body)
                except KeyError:
                    resp, code = {"error": f"unknown verb {verb}"}, 404
                data = json.dumps(resp).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):
                pass

        return Handler
