"""Minimal HOCON reader for the reference app configs.

The reference boots from HOCON (core/Run.scala + core/Config.scala
decoders over config/config.{kinesis,kafka,pubsub,nsq}.*.hocon, layered
on modules/core/src/main/resources/reference.conf). pyhocon is not
available in this environment, so this module implements exactly the
HOCON subset those files use — loudly rejecting anything else:

* objects / arrays, optional root braces, optional commas (newline
  separates), ``:`` or ``=`` separators, key-object adjacency
  (``"license" { ... }``)
* ``#`` and ``//`` comments
* quoted strings (escapes) and unquoted value strings, including
  multi-token values (``interval: 5 minutes`` → ``"5 minutes"``)
* quoted keys stay literal (``"group.id"``); unquoted dotted keys expand
  to paths (HOCON path-expression semantics)
* ``${PATH}`` / ``${?PATH}`` substitutions, resolved from the config
  root first, then the process environment; unresolved ``${?…}`` keeps
  the earlier value of the field (reference.conf's
  ``"accept": ${?ACCEPT_LIMITED_USE_LICENSE}`` layering), unresolved
  ``${…}`` raises
* duplicate keys: objects deep-merge, scalars last-resolvable-wins
* ``parse_duration`` for HOCON duration strings ("200 millis",
  "2 minutes", "7 days"); bare numbers are milliseconds

NOT supported (raise ValueError): ``include``, ``+=``, triple-quoted
strings — none appear in the reference configs.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

_STRUCTURAL = set("{}[],:=")
_ATOM_END = set("{}[],:=\"#\n")


class _Missing:
    """Sentinel: an optional substitution that did not resolve."""


_MISSING = _Missing()


@dataclass
class _Subst:
    path: str
    optional: bool


@dataclass
class _Concat:
    parts: list


@dataclass
class _Layered:
    """Duplicate scalar assignments to one key, in source order."""
    layers: list


# ---------------------------------------------------------------------------
# tokenizer


def _tokenize(text: str):
    """Yield (kind, value) with kind in {punct, newline, string, atom,
    subst}."""
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "\n":
            yield ("newline", "\n")
            i += 1
        elif c in " \t\r":
            i += 1
        elif c == "#" or text.startswith("//", i):
            while i < n and text[i] != "\n":
                i += 1
        elif c in _STRUCTURAL:
            yield ("punct", c)
            i += 1
        elif c == '"':
            if text.startswith('"""', i):
                raise ValueError("HOCON subset: triple-quoted strings not supported")
            j = i + 1
            buf = []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r", '"': '"',
                                "\\": "\\", "/": "/"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise ValueError("unterminated string in HOCON input")
            yield ("string", "".join(buf))
            i = j + 1
        elif text.startswith("${", i):
            j = text.find("}", i)
            if j < 0:
                raise ValueError("unterminated ${...} substitution")
            inner = text[i + 2:j]
            optional = inner.startswith("?")
            yield ("subst", _Subst(inner[1:] if optional else inner, optional))
            i = j + 1
        else:
            j = i
            while j < n and text[j] not in _ATOM_END and text[j] not in " \t\r" \
                    and not text.startswith("${", j) and not text.startswith("//", j):
                j += 1
            atom = text[i:j]
            if atom == "include":
                raise ValueError("HOCON subset: include not supported")
            yield ("atom", atom)
            i = j


# ---------------------------------------------------------------------------
# parser

_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+)$")


def _atom_value(s: str):
    if s == "true":
        return True
    if s == "false":
        return False
    if s == "null":
        return None
    if _NUM_RE.match(s):
        f = float(s)
        return int(f) if f == int(f) and "e" not in s.lower() and "." not in s else f
    return s


class _Parser:
    def __init__(self, text: str):
        self.toks = list(_tokenize(text))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def skip_newlines(self):
        while self.peek()[0] == "newline":
            self.i += 1

    def skip_separators(self):
        while self.peek() in (("newline", "\n"), ("punct", ",")):
            self.i += 1

    def parse_root(self) -> dict:
        self.skip_newlines()
        if self.peek() == ("punct", "{"):
            self.next()
            obj = self.parse_object_body("}")
        else:
            obj = self.parse_object_body(None)
        self.skip_newlines()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing HOCON content: {self.peek()!r}")
        return obj

    def parse_object_body(self, closer: str | None) -> dict:
        out: dict = {}
        while True:
            self.skip_separators()
            kind, val = self.peek()
            if closer and (kind, val) == ("punct", closer):
                self.next()
                return out
            if kind == "eof":
                if closer:
                    raise ValueError(f"unclosed object (expected {closer})")
                return out
            # key: quoted = literal, unquoted = dotted path
            if kind == "string":
                path = [val]
            elif kind == "atom":
                path = val.split(".")
            else:
                raise ValueError(f"expected key, got {kind} {val!r}")
            self.next()
            # separator (:, =) or object adjacency
            kind2, val2 = self.peek()
            if (kind2, val2) in (("punct", ":"), ("punct", "=")):
                self.next()
                value = self.parse_value()
            elif (kind2, val2) == ("punct", "{"):
                self.next()
                value = self.parse_object_body("}")
            else:
                raise ValueError(f"expected ':', '=' or '{{' after key "
                                 f"{'.'.join(path)}, got {kind2} {val2!r}")
            self._assign(out, path, value)

    def _assign(self, obj: dict, path: list, value):
        for seg in path[:-1]:
            nxt = obj.get(seg)
            if not isinstance(nxt, dict):
                nxt = {}
                obj[seg] = nxt
            obj = nxt
        key = path[-1]
        if key in obj:
            old = obj[key]
            if isinstance(old, dict) and isinstance(value, dict):
                _deep_merge(old, value)
                return
            if isinstance(old, _Layered):
                old.layers.append(value)
                return
            obj[key] = _Layered([old, value])
        else:
            obj[key] = value

    def parse_value(self):
        """Collect value items until a separator; adjacent items
        concatenate (unquoted multi-token strings, substitution splices)."""
        self.skip_newlines_before_value()
        parts = []
        while True:
            kind, val = self.peek()
            if kind in ("newline", "eof"):
                break
            if kind == "punct":
                if val in (",", "}", "]"):
                    break
                if val == "{":
                    self.next()
                    parts.append(self.parse_object_body("}"))
                    continue
                if val == "[":
                    self.next()
                    parts.append(self.parse_array_body())
                    continue
                raise ValueError(f"unexpected {val!r} in value position")
            if kind == "string":
                parts.append(("q", val))
            elif kind == "atom":
                parts.append(("u", val))
            elif kind == "subst":
                parts.append(val)
            self.next()
        if not parts:
            raise ValueError("empty value")
        if len(parts) == 1:
            p = parts[0]
            if isinstance(p, tuple):
                return _atom_value(p[1]) if p[0] == "u" else p[1]
            return p
        # multi-part: object merge chains (reference.conf layers object
        # substitutions) stay structured; otherwise string concatenation
        if all(isinstance(p, (dict, _Subst)) for p in parts):
            return _Layered(list(parts))
        return _Concat([p[1] if isinstance(p, tuple) else p for p in parts])

    def skip_newlines_before_value(self):
        # HOCON: the value may start on the same line only; but arrays/
        # objects after ':' on the next line appear in the wild — accept.
        while self.peek()[0] == "newline":
            j = self.i + 1
            if j < len(self.toks) and self.toks[j] in (("punct", "{"), ("punct", "[")):
                self.i += 1
            else:
                break

    def parse_array_body(self) -> list:
        out = []
        while True:
            self.skip_separators()
            kind, val = self.peek()
            if (kind, val) == ("punct", "]"):
                self.next()
                return out
            if kind == "eof":
                raise ValueError("unclosed array")
            out.append(self.parse_value())


def _deep_merge(dst: dict, src: dict):
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


# ---------------------------------------------------------------------------
# substitution resolution


def _lookup_path(root, path: str):
    cur = root
    for seg in path.split("."):
        if not isinstance(cur, dict) or seg not in cur:
            return _MISSING
        cur = cur[seg]
    return cur


def _resolve(node, root, depth=0):
    if depth > 32:
        raise ValueError("HOCON substitution cycle")
    if isinstance(node, _Subst):
        v = _lookup_path(root, node.path)
        if v is not _MISSING:
            return _resolve(v, root, depth + 1)
        env = os.environ.get(node.path)
        if env is not None:
            return env
        if node.optional:
            return _MISSING
        raise ValueError(f"unresolved HOCON substitution ${{{node.path}}}")
    if isinstance(node, _Concat):
        vals = [_resolve(p, root, depth + 1) if isinstance(p, _Subst) else p
                for p in node.parts]
        return " ".join("" if v is _MISSING else str(v) for v in vals).strip()
    if isinstance(node, _Layered):
        # later layers win; objects merge left-to-right; an unresolved
        # optional substitution keeps the earlier value
        acc = _MISSING
        for layer in node.layers:
            v = _resolve(layer, root, depth + 1)
            if v is _MISSING:
                continue
            if isinstance(acc, dict) and isinstance(v, dict):
                merged = dict(acc)
                _deep_merge(merged, v)
                acc = merged
            else:
                acc = v
        return acc
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            rv = _resolve(v, root, depth + 1)
            if rv is not _MISSING:
                out[k] = rv
        return out
    if isinstance(node, list):
        return [_resolve(v, root, depth + 1) for v in node
                if _resolve(v, root, depth + 1) is not _MISSING]
    return node


# ---------------------------------------------------------------------------
# public API


def parse_hocon(text: str, fallback: dict | None = None) -> dict:
    """Parse HOCON text → plain dict. ``fallback`` supplies defaults
    (Config.withFallback semantics: parsed config wins, objects merge)."""
    tree = _Parser(text).parse_root()
    if fallback is not None:
        base = _copy_tree(fallback)
        _deep_merge(base, tree)
        tree = base
    return _resolve(tree, tree)


def load_hocon(path: str, fallback: dict | None = None) -> dict:
    with open(path, encoding="utf-8") as fh:
        return parse_hocon(fh.read(), fallback)


def _copy_tree(d):
    if isinstance(d, dict):
        return {k: _copy_tree(v) for k, v in d.items()}
    if isinstance(d, list):
        return [_copy_tree(v) for v in d]
    return d


_DUR_UNITS = [
    (("ns", "nano", "nanos", "nanosecond", "nanoseconds"), 1e-9),
    (("us", "micro", "micros", "microsecond", "microseconds"), 1e-6),
    (("ms", "milli", "millis", "millisecond", "milliseconds"), 1e-3),
    (("s", "second", "seconds"), 1.0),
    (("m", "minute", "minutes"), 60.0),
    (("h", "hour", "hours"), 3600.0),
    (("d", "day", "days"), 86400.0),
]


def parse_duration(v, default: float | None = None) -> float | None:
    """HOCON duration → seconds. Bare numbers are MILLISECONDS (HOCON
    duration semantics when no unit is given)."""
    if v is None:
        return default
    if isinstance(v, (int, float)):
        return float(v) / 1000.0
    s = str(v).strip()
    m = re.match(r"^([0-9.]+)\s*([a-zA-Z]*)$", s)
    if not m:
        raise ValueError(f"unparseable duration: {v!r}")
    num, unit = float(m.group(1)), m.group(2).lower()
    if not unit:
        return num / 1000.0
    for names, scale in _DUR_UNITS:
        if unit in names:
            return num * scale
    raise ValueError(f"unknown duration unit in {v!r}")
