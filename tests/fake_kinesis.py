"""In-process fake Kinesis speaking the public x-amz-json-1.1 API:
PutRecords (with injectable per-record throttling), ListShards,
GetShardIterator (TRIM_HORIZON / LATEST / AT_SEQUENCE_NUMBER),
GetRecords with opaque paging iterators. Just enough broker for the
transport E2E — same role fake_nsqd.py plays for NSQ.

Enhanced fan-out (r12, multi-event r13): RegisterStreamConsumer +
SubscribeToShard. Real AWS pushes SubscribeToShardEvents over an HTTP/2
event stream for up to 5 minutes per subscription; this fake models
the same contract over JSON long-poll — each SubscribeToShard call
returns up to ``fanout_events_per_call`` CHAINED events (each ≤
``fanout_event_cap`` records with its own intra-call
ContinuationSequenceNumber — the HTTP/2 event-stream shape), holding
the request up to ``fanout_wait_s`` when the shard is idle, so the
consumer's continuous resubscribe loop is exercised exactly as the
HTTP/2 client's 5-minute re-subscribe is. Remaining fidelity boundary:
the transport is one JSON response per request, not h2 frames."""

from __future__ import annotations

import base64
import hashlib
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class FakeKinesis:
    def __init__(self, nshards: int = 2):
        self.nshards = nshards
        # stream -> shard_id -> list of record dicts
        self.streams: dict[str, dict[str, list[dict]]] = {}
        self.put_requests: list[dict] = []   # every PutRecords body
        self.lock = threading.Lock()
        self.seq = 0
        # throttle_plan: fn(request_index, record_index) -> bool
        self.throttle_plan = None
        # fan-out: registered consumers + subscription accounting
        self.consumers: dict[str, str] = {}      # ARN -> name
        self.subscribe_calls = 0
        self.fanout_event_cap = 100   # records per SubscribeToShard event
        self.fanout_events_per_call = 1  # chained events per response
        self.fanout_wait_s = 0.05     # long-poll hold when shard idle
        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), self._handler())
        threading.Thread(target=self._srv.serve_forever,
                         daemon=True).start()

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self._srv.server_address[1]}"

    def stop(self):
        self._srv.shutdown()

    def create_stream(self, name: str):
        with self.lock:
            self.streams[name] = {
                f"shardId-{i:012d}": [] for i in range(self.nshards)}

    def shard_for(self, key: str) -> str:
        # real Kinesis routes by MD5(partition key) over the hash-key
        # range; modulo over the digest gives the same stable routing
        i = int(hashlib.md5(key.encode()).hexdigest(), 16) % self.nshards
        return f"shardId-{i:012d}"

    def all_records(self, stream: str) -> list[dict]:
        with self.lock:
            return [r for recs in self.streams[stream].values()
                    for r in recs]

    # -- protocol ---------------------------------------------------------
    def _put_records(self, body: dict) -> dict:
        with self.lock:
            req_idx = len(self.put_requests)
            self.put_requests.append(body)
            shards = self.streams[body["StreamName"]]
            out = []
            failed = 0
            for i, rec in enumerate(body["Records"]):
                if self.throttle_plan and self.throttle_plan(req_idx, i):
                    out.append({
                        "ErrorCode": "ProvisionedThroughputExceededException",
                        "ErrorMessage": "Rate exceeded",
                    })
                    failed += 1
                    continue
                self.seq += 1
                sid = self.shard_for(rec["PartitionKey"])
                stored = {
                    "Data": rec["Data"],
                    "PartitionKey": rec["PartitionKey"],
                    "SequenceNumber": str(self.seq),
                    "ApproximateArrivalTimestamp": time.time(),
                }
                shards[sid].append(stored)
                out.append({"SequenceNumber": stored["SequenceNumber"],
                            "ShardId": sid})
            return {"FailedRecordCount": failed, "Records": out}

    def _list_shards(self, body: dict) -> dict:
        with self.lock:
            return {"Shards": [{"ShardId": sid}
                               for sid in self.streams[body["StreamName"]]]}

    def _shard_iterator(self, body: dict) -> dict:
        t = body["ShardIteratorType"]
        with self.lock:
            recs = self.streams[body["StreamName"]][body["ShardId"]]
            if t == "TRIM_HORIZON":
                pos = 0
            elif t == "LATEST":
                pos = len(recs)
            elif t == "AT_SEQUENCE_NUMBER":
                seq = body["StartingSequenceNumber"]
                pos = next((i for i, r in enumerate(recs)
                            if r["SequenceNumber"] == seq), len(recs))
            elif t == "AFTER_SEQUENCE_NUMBER":
                seq = body["StartingSequenceNumber"]
                pos = next((i + 1 for i, r in enumerate(recs)
                            if r["SequenceNumber"] == seq), len(recs))
            else:  # AT_TIMESTAMP
                ts = float(body.get("Timestamp", 0))
                pos = next((i for i, r in enumerate(recs)
                            if r["ApproximateArrivalTimestamp"] >= ts),
                           len(recs))
        it = json.dumps({"s": body["StreamName"],
                         "h": body["ShardId"], "p": pos})
        return {"ShardIterator": base64.b64encode(it.encode()).decode()}

    def _get_records(self, body: dict) -> dict:
        it = json.loads(base64.b64decode(body["ShardIterator"]))
        limit = int(body.get("Limit", 10000))
        with self.lock:
            recs = self.streams[it["s"]][it["h"]]
            page = recs[it["p"]:it["p"] + limit]
            nxt = dict(it, p=it["p"] + len(page))
        return {
            "Records": page,
            "NextShardIterator":
                base64.b64encode(json.dumps(nxt).encode()).decode(),
            "MillisBehindLatest": 0,
        }

    def _register_consumer(self, body: dict) -> dict:
        name = body["ConsumerName"]
        stream = body.get("StreamARN", "").rsplit("/", 1)[-1]
        arn = f"{body.get('StreamARN', stream)}/consumer/{name}:1"
        with self.lock:
            self.consumers[arn] = name
        return {"Consumer": {"ConsumerARN": arn, "ConsumerName": name,
                             "ConsumerStatus": "ACTIVE"}}

    def _subscribe_to_shard(self, body: dict) -> dict:
        arn = body["ConsumerARN"]
        with self.lock:
            if arn not in self.consumers:
                # ValueError (not KeyError): the handler maps KeyError
                # to UnknownOperationException
                raise ValueError(f"unknown consumer {arn}")
            self.subscribe_calls += 1
        stream = arn.split("/consumer/")[0].rsplit("/", 1)[-1]
        sid = body["ShardId"]
        pos = body["StartingPosition"]

        def _slice(after_seq):
            with self.lock:
                recs = self.streams[stream][sid]
                if after_seq is not None:
                    start = next(
                        (i + 1 for i, r in enumerate(recs)
                         if r["SequenceNumber"] == after_seq), len(recs))
                elif pos["Type"] == "TRIM_HORIZON":
                    start = 0
                elif pos["Type"] == "LATEST":
                    start = len(recs)
                else:                     # AFTER_SEQUENCE_NUMBER
                    seq = pos["SequenceNumber"]
                    start = next(
                        (i + 1 for i, r in enumerate(recs)
                         if r["SequenceNumber"] == seq), len(recs))
                return recs[start:start + self.fanout_event_cap]

        page = _slice(None)
        deadline = time.time() + self.fanout_wait_s
        while not page and time.time() < deadline:   # long-poll hold
            time.sleep(0.005)
            page = _slice(None)
        # r13: up to fanout_events_per_call CHAINED events per
        # response — each event's continuation is the next event's
        # start (the HTTP/2 event-stream shape); the response's final
        # continuation is the last non-empty event's
        events = []
        cont = pos.get("SequenceNumber")
        while page:
            cont = page[-1]["SequenceNumber"]
            events.append({
                "Records": page,
                "ContinuationSequenceNumber": cont,
                "MillisBehindLatest": 0,
            })
            if len(events) >= self.fanout_events_per_call:
                break
            page = _slice(cont)
        if not events:
            events = [{"Records": [],
                       "ContinuationSequenceNumber": cont,
                       "MillisBehindLatest": 0}]
        return {"Events": events}

    def _handler(self):
        broker = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"])))
                action = self.headers["X-Amz-Target"].split(".")[-1]
                try:
                    fn = {
                        "PutRecords": broker._put_records,
                        "ListShards": broker._list_shards,
                        "GetShardIterator": broker._shard_iterator,
                        "GetRecords": broker._get_records,
                        "RegisterStreamConsumer":
                            broker._register_consumer,
                        "SubscribeToShard": broker._subscribe_to_shard,
                    }[action]
                    resp, code = fn(body), 200
                except KeyError:
                    resp, code = {"__type": "UnknownOperationException",
                                  "message": action}, 400
                except Exception as e:  # noqa: BLE001 — surfaced as API error
                    resp, code = {"__type": "InternalFailure",
                                  "message": str(e)}, 500
                data = json.dumps(resp).encode()
                self.send_response(code)
                self.send_header("Content-Type",
                                 "application/x-amz-json-1.1")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):
                pass

        return Handler
