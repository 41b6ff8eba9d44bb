"""Deep JSON-Schema validator + registry tests (functions/iglu.py):
$ref, oneOf/anyOf/allOf/not, patternProperties, supersededBy flow,
http registry loader caching. Pure Python — no Spark session needed."""

from __future__ import annotations

import json

from enrich_spark.functions.iglu import (
    SchemaRegistry, check_sdj, http_registry_loader, validate_json,
)


def test_ref_resolution():
    schema = {
        "definitions": {"pos": {"type": "integer", "minimum": 1}},
        "type": "object",
        "properties": {"n": {"$ref": "#/definitions/pos"}},
    }
    assert validate_json(schema, {"n": 5}) == []
    assert any("minimum" in e for e in validate_json(schema, {"n": 0}))
    assert any("unresolvable" in e
               for e in validate_json({"$ref": "#/definitions/nope"}, 1))


def test_oneof_anyof_allof_not():
    one = {"oneOf": [{"type": "string"}, {"type": "integer"}]}
    assert validate_json(one, "x") == []
    assert validate_json(one, 3) == []
    assert any("oneOf" in e for e in validate_json(one, True))
    both = {"oneOf": [{"type": "integer"}, {"minimum": 0}]}
    assert any("matches 2" in e for e in validate_json(both, 5))
    assert validate_json({"anyOf": [{"type": "string"}, {"type": "integer"}]}, 1) == []
    assert any("anyOf" in e for e in validate_json({"anyOf": [{"type": "string"}]}, 1))
    assert any("allOf" in e for e in validate_json(
        {"allOf": [{"type": "integer"}, {"minimum": 10}]}, 5))
    assert any("not" in e for e in validate_json({"not": {"type": "string"}}, "s"))


def test_pattern_properties_and_additional():
    schema = {
        "type": "object",
        "properties": {"id": {"type": "string"}},
        "patternProperties": {"^x_": {"type": "integer"}},
        "additionalProperties": False,
    }
    assert validate_json(schema, {"id": "a", "x_1": 2}) == []
    assert any("not allowed" in e for e in validate_json(schema, {"zz": 1}))
    assert any("expected type" in e for e in validate_json(schema, {"x_1": "s"}))
    # additionalProperties as schema
    schema2 = {"type": "object", "additionalProperties": {"type": "string"}}
    assert validate_json(schema2, {"any": "ok"}) == []
    assert any("expected type" in e for e in validate_json(schema2, {"any": 1}))


def test_draft4_numeric_and_array_keywords():
    assert any("exclusive" in e for e in validate_json(
        {"minimum": 0, "exclusiveMinimum": True}, 0))
    assert validate_json({"minimum": 0, "exclusiveMinimum": True}, 1) == []
    assert any("multiple" in e for e in validate_json({"multipleOf": 3}, 7))
    assert any("unique" in e for e in validate_json({"uniqueItems": True}, [1, 2, 1]))
    assert any("fewer" in e for e in validate_json({"minItems": 2}, [1]))
    tup = {"items": [{"type": "string"}, {"type": "integer"}], "additionalItems": False}
    assert validate_json(tup, ["a", 1]) == []
    assert any("more items" in e for e in validate_json(tup, ["a", 1, 2]))


def test_superseded_by_flow():
    reg = SchemaRegistry({
        "iglu:com.acme/t/jsonschema/1-0-0": {"$supersededBy": "1-0-1", "type": "object"},
        "iglu:com.acme/t/jsonschema/1-0-1": {
            "type": "object", "required": ["a"], "additionalProperties": False,
            "properties": {"a": {"type": "integer"}},
        },
    })
    errs, validated = check_sdj(
        reg, {"schema": "iglu:com.acme/t/jsonschema/1-0-0", "data": {"a": 1}}, True)
    assert errs == [] and validated == "1-0-1"
    # validation really runs against the NEWER schema
    errs, validated = check_sdj(
        reg, {"schema": "iglu:com.acme/t/jsonschema/1-0-0", "data": {}}, True)
    assert validated == "1-0-1" and any("required" in e for e in errs)
    # non-superseded schema → no validation info
    errs, validated = check_sdj(
        reg, {"schema": "iglu:com.acme/t/jsonschema/1-0-1", "data": {"a": 1}}, True)
    assert errs == [] and validated is None


def test_http_registry_loader_caches():
    calls = []

    def transport(url):
        calls.append(url)
        if "missing" in url:
            raise OSError("404")
        return json.dumps({"type": "object"})

    loader = http_registry_loader(["http://iglu.local/api"], transport=transport)
    uri = "iglu:com.acme/thing/jsonschema/1-0-0"
    assert loader(uri) == {"type": "object"}
    assert loader(uri) == {"type": "object"}
    assert len(calls) == 1  # cached
    assert calls[0] == "http://iglu.local/api/schemas/com.acme/thing/jsonschema/1-0-0"
    missing = "iglu:com.acme/missing/jsonschema/1-0-0"
    assert loader(missing) is None
    assert loader(missing) is None
    assert len(calls) == 2  # negative result cached too

    reg = SchemaRegistry(loader=loader)
    assert reg.lookup(uri) == {"type": "object"}
