"""Iglu self-describing-JSON validation (SURVEY §1.3, §2.5 #27).

Mirrors common/utils/IgluUtils.scala:96-106 (input ue/co validation) and
EnrichmentManager.scala:209-257 (output revalidation): every
self-describing JSON carries an ``iglu:vendor/name/format/m-r-a`` schema
key; the data payload is validated against the resolved JSON Schema.

The container ships no jsonschema library, so a small dependency-free
validator covers the JSON-Schema subset Iglu schemas actually use
(type / properties / required / additionalProperties / items / enum /
min-max / length / pattern / maxItems). A schema registry is a plain
dict broadcast inside the UDF closure — the Spark analogue of the
reference's embedded registry + LRU cache (per-executor, zero network).
Remote registries slot in behind ``SchemaRegistry.loader``.

Max JSON depth guard: 50, matching validation.maxJsonDepth
(reference.conf:47, JsonUtils.scala:126).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_JSON_DEPTH = 50

SCHEMA_KEY_RE = re.compile(
    r"^iglu:([a-zA-Z0-9_.-]+)/([a-zA-Z0-9_-]+)/([a-zA-Z0-9_-]+)/(\d+)-(\d+)-(\d+)$"
)


def parse_schema_key(uri: str):
    m = SCHEMA_KEY_RE.match(uri or "")
    if not m:
        return None
    vendor, name, fmt, model, rev, add = m.groups()
    return (vendor, name, fmt, int(model), int(rev), int(add))


# ---------------------------------------------------------------------------
# minimal JSON-Schema validator


def _depth_ok(doc: Any, limit: int = MAX_JSON_DEPTH, _d: int = 0) -> bool:
    if _d > limit:
        return False
    if isinstance(doc, dict):
        return all(_depth_ok(v, limit, _d + 1) for v in doc.values())
    if isinstance(doc, list):
        return all(_depth_ok(v, limit, _d + 1) for v in doc)
    return True


_TYPES = {
    "string": str,
    "integer": int,
    "number": (int, float),
    "boolean": bool,
    "object": dict,
    "array": list,
    "null": type(None),
}


def validate_json(schema: dict, data: Any, path: str = "$") -> list[str]:
    """Validate `data` against the JSON-Schema subset; return error strings."""
    errs: list[str] = []
    t = schema.get("type")
    if t is not None:
        types = t if isinstance(t, list) else [t]
        ok = False
        for name in types:
            py = _TYPES.get(name)
            if py is None:
                continue
            if name == "integer" and isinstance(data, bool):
                continue
            if name in ("integer", "number") and isinstance(data, bool):
                continue
            if isinstance(data, py):
                ok = True
                break
        if not ok:
            errs.append(f"{path}: expected type {t}, got {type(data).__name__}")
            return errs
    if "enum" in schema and data not in schema["enum"]:
        errs.append(f"{path}: {data!r} not in enum")
    if isinstance(data, str):
        if "maxLength" in schema and len(data) > schema["maxLength"]:
            errs.append(f"{path}: longer than maxLength {schema['maxLength']}")
        if "minLength" in schema and len(data) < schema["minLength"]:
            errs.append(f"{path}: shorter than minLength {schema['minLength']}")
        if "pattern" in schema and not re.search(schema["pattern"], data):
            errs.append(f"{path}: does not match pattern")
    if isinstance(data, (int, float)) and not isinstance(data, bool):
        if "minimum" in schema and data < schema["minimum"]:
            errs.append(f"{path}: below minimum {schema['minimum']}")
        if "maximum" in schema and data > schema["maximum"]:
            errs.append(f"{path}: above maximum {schema['maximum']}")
    if isinstance(data, dict):
        props = schema.get("properties", {})
        for req in schema.get("required", []):
            if req not in data:
                errs.append(f"{path}: missing required property '{req}'")
        for k, v in data.items():
            if k in props:
                errs.extend(validate_json(props[k], v, f"{path}.{k}"))
            elif schema.get("additionalProperties") is False:
                errs.append(f"{path}: additional property '{k}' not allowed")
    if isinstance(data, list):
        if "maxItems" in schema and len(data) > schema["maxItems"]:
            errs.append(f"{path}: more than maxItems {schema['maxItems']}")
        items = schema.get("items")
        if isinstance(items, dict):
            for i, v in enumerate(data):
                errs.extend(validate_json(items, v, f"{path}[{i}]"))
    return errs


# ---------------------------------------------------------------------------
# registry


@dataclass
class SchemaRegistry:
    """uri → JSON-Schema dict. Embedded-first (broadcast with the plan);
    a loader callable may lazily fetch unknown uris (remote registry)."""

    schemas: dict[str, dict] = field(default_factory=dict)
    loader: Callable[[str], dict | None] | None = None

    def register(self, uri: str, schema: dict) -> "SchemaRegistry":
        self.schemas[uri] = schema
        return self

    def load_dir(self, root: str | Path) -> "SchemaRegistry":
        """Iglu static-registry layout: <root>/vendor/name/format/m-r-a."""
        root = Path(root)
        for p in root.rglob("*"):
            if p.is_file():
                rel = p.relative_to(root)
                parts = rel.parts
                if len(parts) == 4:
                    uri = "iglu:" + "/".join(parts)
                    try:
                        self.schemas[uri] = json.loads(p.read_text())
                    except (ValueError, OSError):
                        pass
        return self

    def lookup(self, uri: str) -> dict | None:
        hit = self.schemas.get(uri)
        if hit is not None:
            return hit
        key = parse_schema_key(uri)
        if key is not None:
            # model-compatible fallback: newest registered a-/r- within model
            vendor, name, fmt, model, _, _ = key
            best = None
            for cand_uri, schema in self.schemas.items():
                ck = parse_schema_key(cand_uri)
                if ck and ck[:4] == (vendor, name, fmt, model):
                    if best is None or ck[4:] > best[0]:
                        best = (ck[4:], schema)
            if best is not None:
                return best[1]
        if self.loader is not None:
            fetched = self.loader(uri)
            if fetched is not None:
                self.schemas[uri] = fetched
                return fetched
        return None


def validate_sdj(registry: SchemaRegistry, envelope: Any, strict: bool) -> list[str]:
    """Validate one {schema, data} self-describing JSON."""
    if not isinstance(envelope, dict):
        return ["self-describing payload is not an object"]
    uri = envelope.get("schema")
    if parse_schema_key(uri) is None:
        return [f"invalid schema key [{uri}]"]
    if not _depth_ok(envelope.get("data")):
        return [f"JSON exceeds max depth {MAX_JSON_DEPTH}"]
    schema = registry.lookup(uri)
    if schema is None:
        return [f"schema [{uri}] could not be resolved"] if strict else []
    return [f"[{uri}] {e}" for e in validate_json(schema, envelope.get("data"))]


# ---------------------------------------------------------------------------
# pipeline stage


_VALIDATE_RESULT = T.ArrayType(T.StringType())


def validate_sdjs(df: DataFrame, registry: SchemaRegistry, strict: bool = False) -> DataFrame:
    """Validate ue_json / co_json inputs and the derived contexts
    (EnrichmentManager phases 1 + 3). Appends failures to ``_errors``."""
    reg = registry  # captured in closure → shipped once per executor

    @F.udf(returnType=_VALIDATE_RESULT)
    def check(ue_json, co_json, derived):
        errs: list[str] = []
        try:
            if ue_json:
                env = json.loads(ue_json)
                inner = env.get("data") if isinstance(env, dict) else None
                errs += [f"ue_pr\t{e}\t" for e in validate_sdj(reg, inner, strict)]
            if co_json:
                env = json.loads(co_json)
                inner = env.get("data") if isinstance(env, dict) else None
                if isinstance(inner, list):
                    for c in inner:
                        errs += [f"co\t{e}\t" for e in validate_sdj(reg, c, strict)]
                else:
                    errs.append("co\tcontexts data is not an array\t")
            for c in derived or []:
                data = c["data"]
                env = {"schema": c["schema"], "data": json.loads(data) if data else None}
                errs += [f"derived_contexts\t{e}\t" for e in validate_sdj(reg, env, strict)]
        except ValueError as e:
            errs.append(f"sdj\tinvalid JSON: {e}\t")
        return errs

    derived_col = F.col("_derived") if "_derived" in df.columns else F.lit(None).cast(
        "array<struct<schema:string,data:string>>"
    )
    new_errs = check(F.col("ue_json"), F.col("co_json"), derived_col)
    return df.withColumn("_errors", F.concat(F.col("_errors"), new_errs))
