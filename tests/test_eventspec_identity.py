"""Specs for event-spec inference (#26), Identity API step, and the
remote adapter."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from enrich_spark.adapters import vendors
from enrich_spark.adapters.registry import adapt
from enrich_spark.operators.eventspec import (
    EntityRule,
    EventSpec,
    EventSpecConf,
    event_spec_contexts,
)
from enrich_spark.operators.identity import (
    FilterRule,
    IdentityConf,
    add_identity_contexts,
)

UE = json.dumps({
    "schema": "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0",
    "data": {"schema": "iglu:com.acme/checkout/jsonschema/1-0-0", "data": {}},
})
CO = json.dumps({
    "schema": "iglu:com.snowplowanalytics.snowplow/contexts/jsonschema/1-0-1",
    "data": [
        {"schema": "iglu:com.acme/cart/jsonschema/1-0-0", "data": {}},
        {"schema": "iglu:com.acme/cart/jsonschema/1-0-0", "data": {}},
        {"schema": "iglu:com.acme/user/jsonschema/1-0-0", "data": {}},
    ],
})


def test_event_spec_inference(spark):
    df = spark.createDataFrame([(UE, CO)], "ue_json STRING, co_json STRING")
    conf = EventSpecConf(specs=[
        EventSpec(id="spec-1", name="checkout-flow",
                  event_schema="iglu:com.acme/checkout/jsonschema/1-0-0",
                  entities=[EntityRule("iglu:com.acme/cart/jsonschema/1-0-0",
                                       min_cardinality=1, max_cardinality=2)]),
        EventSpec(id="spec-2", name="needs-three-carts",
                  event_schema="iglu:com.acme/checkout/jsonschema/1-0-0",
                  entities=[EntityRule("iglu:com.acme/cart/jsonschema/1-0-0",
                                       min_cardinality=3)]),
        EventSpec(id="spec-3", name="other-event",
                  event_schema="iglu:com.other/x/jsonschema/1-0-0"),
    ])
    out = event_spec_contexts(df, conf).collect()[0]
    specs = [json.loads(c.data) for c in out._derived if "event_specification" in c.schema]
    assert [s["id"] for s in specs] == ["spec-1"]  # cardinality 2 ∈ [1,2]; spec-2 needs 3


def test_event_spec_skips_declared(spark):
    co = json.dumps({
        "schema": "iglu:com.snowplowanalytics.snowplow/contexts/jsonschema/1-0-1",
        "data": [{"schema": "iglu:com.snowplowanalytics.snowplow/event_specification/jsonschema/1-0-2",
                  "data": {"id": "manual"}}],
    })
    df = spark.createDataFrame([(UE, co)], "ue_json STRING, co_json STRING")
    conf = EventSpecConf(specs=[EventSpec(id="s", name="n", event_schema=None)])
    out = event_spec_contexts(df, conf).collect()[0]
    assert out._derived == []


def test_identity_contexts(spark):
    calls = []

    def transport(payload):
        calls.append(payload)
        if payload.get("domain_userid") == "fail":
            raise RuntimeError("503")
        return {"snowplowId": f"sp-{payload['domain_userid']}"}

    df = spark.createDataFrame(
        [("d1", "n1", "web"), ("d1", "n1", "web"), ("fail", "n2", "web"),
         ("d3", "n3", "srv"), (None, None, "web")],
        "domain_userid STRING, network_userid STRING, platform STRING",
    ).coalesce(1)  # single executor task → shared cache for the call-count assert
    conf = IdentityConf(
        transport=transport,
        filters=[FilterRule("platform", "not_in", ["srv"])],
    )
    out = add_identity_contexts(df, conf).collect()

    def sid(r):
        hits = [c for c in r._derived if "identity" in c.schema]
        return json.loads(hits[0].data)["snowplowId"] if hits else None

    rows = {(r.domain_userid, r.platform): r for r in out}
    assert sid(rows[("d1", "web")]) == "sp-d1"
    assert sid(rows[("d3", "srv")]) is None          # filtered out (not_in srv)
    assert sid(rows[(None, "web")]) is None          # no identifiers
    failed = rows[("fail", "web")]
    assert sid(failed) is None
    assert failed._identity_error is not None        # non-fatal, recorded


def test_identity_requires_transport():
    with pytest.raises(ValueError):
        IdentityConf().transport or add_identity_contexts(None, IdentityConf())


def test_remote_adapter(spark):
    def translator(request_json):
        req = json.loads(request_json)
        assert req["contentType"] == "application/json"
        return json.dumps({"events": [{"e": "pv", "aid": "remote-app"}]})

    df = spark.createDataFrame(
        [("com.example.sidecar", "v1", None, "application/json", "{}")],
        "api_vendor STRING, api_version STRING, "
        "querystring ARRAY<STRUCT<name:STRING,value:STRING>>, "
        "content_type STRING, body STRING",
    )
    out = adapt(df, remote_adapters={("com.example.sidecar", "v1"): translator}).collect()
    assert out[0].parameters == {"e": "pv", "aid": "remote-app"}
    assert out[0]._adapter_error is None


def test_remote_adapter_over_real_http(spark):
    """E2E over an actual socket: the adapter UDF on executors POSTs the
    payload envelope to a localhost translator (RemoteAdapter.scala's
    http4s flow) and explodes the returned events; a 500 surfaces as an
    _adapter_error, not an exception."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from enrich_spark.adapters.vendors import http_transport

    class Translator(BaseHTTPRequestHandler):
        def do_POST(self):
            req = json.loads(
                self.rfile.read(int(self.headers["Content-Length"])))
            if self.path != "/translate":
                self.send_response(404)
                self.end_headers()
                return
            if json.loads(req["body"]).get("boom"):
                self.send_response(500)
                self.end_headers()
                return
            body = json.dumps({"events": [
                {"e": "pv", "aid": "http-app",
                 "url": f"qs={req['queryString'] or ''}"},
                {"e": "se", "aid": "http-app"},
            ]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Translator)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/translate"
        df = spark.createDataFrame(
            [("com.example.sidecar", "v1", None, "application/json", "{}"),
             ("com.example.sidecar", "v1", None, "application/json",
              '{"boom": true}')],
            "api_vendor STRING, api_version STRING, "
            "querystring ARRAY<STRUCT<name:STRING,value:STRING>>, "
            "content_type STRING, body STRING",
        )
        out = adapt(df, remote_adapters={
            ("com.example.sidecar", "v1"): http_transport(url)}).collect()
        ok = [r for r in out if r._adapter_error is None]
        bad = [r for r in out if r._adapter_error is not None]
        # 1 good payload → 2 exploded events over the wire
        assert len(ok) == 2
        assert {r.parameters["e"] for r in ok} == {"pv", "se"}
        assert all(r.parameters["aid"] == "http-app" for r in ok)
        assert len(bad) == 1 and "HTTPError" in bad[0]._adapter_error
    finally:
        srv.shutdown()


def test_remote_adapter_error(spark):
    df = spark.createDataFrame(
        [("com.example.bad", "v1", None, None, "{}")],
        "api_vendor STRING, api_version STRING, "
        "querystring ARRAY<STRUCT<name:STRING,value:STRING>>, "
        "content_type STRING, body STRING",
    )
    out = adapt(
        df,
        remote_adapters={("com.example.bad", "v1"):
                         lambda req: json.dumps({"error": "cannot translate"})},
    ).collect()
    assert "cannot translate" in out[0]._adapter_error
