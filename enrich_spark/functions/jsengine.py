"""Node.js sidecar engine for the JavaScript script enrichment.

The reference runs user JavaScript in-process on Nashorn
(registry/JavascriptScriptEnrichment.scala:79-104): the script's
``process(event, params, headers)`` is wrapped in a compiled closure,
invoked per event against a mutable event object, and must return null
or an array of self-describing contexts; a rejection exception drops the
event (:121-126, :160), any other throw becomes an EnrichmentFailure
(:102), and the script may set
``use_derived_contexts_from_js_enrichment_only`` on the event to replace
previously-derived contexts (:189-200).

Python has no in-process JS VM in this environment, but ``node`` is on
PATH — so we run one *persistent sidecar process per Python worker*
speaking newline-delimited JSON over stdin/stdout:

    {"op": "compile", "id": h, "source": ..., "params": {...}}
        -> {"ok": true} | {"compile_error": "..."}
    {"op": "batch", "id": h, "events": [[event, headers], ...]}
        -> {"results": [one entry per event]}
      entry = {"event": {...}, "contexts": [...], "replace": bool}
            | {"drop": true}
            | {"error": "..."}

Scale design: the sidecar is spawned lazily once per executor-side Python
worker (fork-detected via pid) and compiles each script once; a whole
Arrow batch crosses the pipe as ONE round trip, so per-event overhead is
a JSON encode/decode, not a process or even a syscall. User code runs in
a ``vm`` context exposing only safe globals (no ``process``, ``require``,
or filesystem), mirroring Nashorn's ClassFilter confinement (:71-78).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import threading

__all__ = ["NodeJsEngine", "JsCompileError", "node_available", "shared_engine"]

# The sidecar program. Kept dependency-free (readline + vm are Node
# built-ins). One JSON object per line in, one per line out.
_SIDECAR_JS = r"""
'use strict';
const readline = require('readline');
const vm = require('vm');
const scripts = new Map();

function makeSandbox(params) {
  const sandbox = {
    JSON, Math, Date, RegExp, String, Number, Boolean, Array, Object,
    parseInt, parseFloat, isNaN, isFinite,
    encodeURIComponent, decodeURIComponent, encodeURI, decodeURI,
    console: {log: function(){}, error: function(){}, warn: function(){}},
    __params: params,
  };
  // reference rejection semantics (JavascriptRejectionException,
  // JavascriptScriptEnrichment.scala:121-126,163): user code calls
  // rejectEvent() (or throws an object with __reject) to drop the event
  sandbox.rejectEvent = function (msg) {
    const e = new Error(msg || 'event rejected');
    e.__reject = true;
    throw e;
  };
  vm.createContext(sandbox);
  return sandbox;
}

function compile(id, source, params) {
  const sandbox = makeSandbox(params);
  // var (not bare assignment): must work when the user source opens
  // with 'use strict'
  const wrapped = source + "\n;var __entry = function(event, headers){" +
    "var result = process(event, __params, headers);" +
    "return (result === null || result === undefined) ? [] : result;};";
  vm.runInContext(wrapped, sandbox, {timeout: 10000});
  if (typeof sandbox.__entry !== 'function' || typeof sandbox.process !== 'function') {
    throw new Error('script must declare function process(event, params, headers)');
  }
  scripts.set(id, sandbox);
}

function selfDescribingError(ctxs) {
  // parseContexts (JavascriptScriptEnrichment.scala:203-224): every
  // returned context must be {schema: <string>, data: <json>}
  if (!Array.isArray(ctxs)) {
    return 'Output of JavaScript function [' + JSON.stringify(ctxs) +
           '] could be parsed as JSON but is not read as an array';
  }
  for (const c of ctxs) {
    if (c === null || typeof c !== 'object' || typeof c.schema !== 'string' ||
        !('data' in c)) {
      return 'Resulting contexts are not self-desribing. Error(s): [json:[' +
             JSON.stringify(c) + ']]';
    }
  }
  return null;
}

function runOne(sandbox, event, headers) {
  // scala:189 — reset before each script so a previous enrichment's flag
  // cannot leak into this one's result
  event.use_derived_contexts_from_js_enrichment_only = false;
  let ctxs;
  try {
    ctxs = sandbox.__entry(event, headers);
  } catch (e) {
    if (e && e.__reject) return {drop: true};
    const msg = (e && e.message !== undefined) ? e.message : String(e);
    return {error: 'Error during execution of JavaScript function: [' + msg + ']'};
  }
  const bad = selfDescribingError(ctxs);
  if (bad !== null) return {error: bad};
  const replace = !!event.use_derived_contexts_from_js_enrichment_only;
  delete event.use_derived_contexts_from_js_enrichment_only;
  return {event: event, contexts: ctxs, replace: replace};
}

// batch2: raw JSON strings in, mutation DIFF + stringified context data
// out — keeps all JSON encode/decode in V8 instead of per-row Python
function runOneRaw(sandbox, rawEvent, headers) {
  let event;
  try {
    event = rawEvent ? JSON.parse(rawEvent) : {};
  } catch (e) {
    return {error: 'Error during execution of JavaScript function: ' +
                   '[unparseable event: ' + e.message + ']'};
  }
  const orig = Object.assign({}, event);
  const res = runOne(sandbox, event, headers);
  if (res.drop || res.error !== undefined) return res;
  const changed = {};
  for (const k in event) {
    if (!(k in orig) || orig[k] !== event[k]) changed[k] = event[k];
  }
  // contexts cross back as ONE JSON string: transferring a string
  // column through Arrow is vectorized, per-row python dict->struct
  // conversion is not (measured 2x on the whole stage)
  const ctxs = res.contexts.map(function (c) {
    return {schema: c.schema, data: JSON.stringify(c.data)};
  });
  return {changed: changed,
          contexts_json: ctxs.length ? JSON.stringify(ctxs) : null,
          replace: res.replace};
}

const rl = readline.createInterface({input: process.stdin, terminal: false});
rl.on('line', function (line) {
  if (!line) return;
  let msg;
  try {
    msg = JSON.parse(line);
  } catch (e) {
    process.stdout.write(JSON.stringify({fatal: 'bad request: ' + e.message}) + '\n');
    return;
  }
  if (msg.op === 'compile') {
    try {
      compile(msg.id, msg.source, msg.params || {});
      process.stdout.write(JSON.stringify({ok: true}) + '\n');
    } catch (e) {
      const m = (e && e.message !== undefined) ? e.message : String(e);
      process.stdout.write(JSON.stringify({compile_error: m}) + '\n');
    }
    return;
  }
  const sandbox = scripts.get(msg.id);
  const raw = msg.op === 'batch2';
  const out = [];
  for (const pair of msg.events) {
    if (!sandbox) {
      out.push({error: 'script ' + msg.id + ' not compiled'});
      continue;
    }
    if (raw) out.push(runOneRaw(sandbox, pair[0], pair[1] || []));
    else out.push(runOne(sandbox, pair[0] || {}, pair[1] || []));
  }
  process.stdout.write(JSON.stringify({results: out}) + '\n');
});
"""


class JsCompileError(ValueError):
    """The user script failed to compile (or lacks process())."""


def node_available() -> bool:
    return shutil.which("node") is not None


class NodeJsEngine:
    """One persistent node sidecar; thread-safe, fork-safe, restartable.

    ``eval_batch`` is the unit of work: a list of (event, headers) pairs
    crosses the pipe in one round trip. Scripts are compiled once per
    (source, params) and memoized by content hash.
    """

    def __init__(self, node_bin: str | None = None):
        self._node = node_bin or shutil.which("node")
        if self._node is None:
            raise RuntimeError("node binary not found on PATH")
        self._proc: subprocess.Popen | None = None
        self._pid = None  # owning python pid — respawn after fork
        self._compiled: set[str] = set()
        self._lock = threading.Lock()

    # -- process lifecycle --------------------------------------------------

    def _ensure_proc(self):
        if (self._proc is None or self._proc.poll() is not None
                or self._pid != os.getpid()):
            if self._proc is not None and self._pid == os.getpid():
                self._proc.kill()
            self._proc = subprocess.Popen(
                [self._node, "-e", _SIDECAR_JS],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, text=True, bufsize=1,
            )
            self._pid = os.getpid()
            self._compiled = set()

    def close(self):
        with self._lock:
            if self._proc is not None and self._pid == os.getpid():
                self._proc.kill()
            self._proc = None

    def _roundtrip(self, obj: dict) -> dict:
        self._ensure_proc()
        try:
            self._proc.stdin.write(json.dumps(obj, separators=(",", ":")) + "\n")
            self._proc.stdin.flush()
            line = self._proc.stdout.readline()
        except (BrokenPipeError, OSError):
            line = ""
        if not line:  # sidecar died mid-request
            self._proc = None
            raise RuntimeError("node sidecar terminated unexpectedly")
        out = json.loads(line)
        if "fatal" in out:
            raise RuntimeError(f"node sidecar protocol error: {out['fatal']}")
        return out

    # -- API ----------------------------------------------------------------

    @staticmethod
    def script_id(source: str, params: dict) -> str:
        key = source + "\x00" + json.dumps(params, sort_keys=True)
        return hashlib.sha1(key.encode("utf-8")).hexdigest()[:16]

    def compile(self, source: str, params: dict) -> str:
        """Compile (idempotent); returns the script id. Raises
        JsCompileError with the reference's message shape on failure
        (scala:108)."""
        sid = self.script_id(source, params)
        with self._lock:
            self._ensure_proc()
            if sid in self._compiled:
                return sid
            out = self._roundtrip(
                {"op": "compile", "id": sid, "source": source, "params": params})
            if "compile_error" in out:
                raise JsCompileError(
                    f"Error compiling JavaScript function: [{out['compile_error']}]")
            self._compiled.add(sid)
            return sid

    def _batch(self, op: str, source: str, params: dict,
               events_headers: list) -> list[dict]:
        sid = self.script_id(source, params)
        pairs = [[e, h] for e, h in events_headers]
        for attempt in (0, 1):
            try:
                with self._lock:
                    self._ensure_proc()
                    if sid not in self._compiled:
                        out = self._roundtrip({"op": "compile", "id": sid,
                                               "source": source, "params": params})
                        if "compile_error" in out:
                            msg = ("Error compiling JavaScript function: "
                                   f"[{out['compile_error']}]")
                            return [{"error": msg} for _ in pairs]
                        self._compiled.add(sid)
                    out = self._roundtrip({"op": op, "id": sid, "events": pairs})
                return out["results"]
            except RuntimeError as e:
                if attempt == 1:
                    return [{"error": f"Error during execution of JavaScript "
                                      f"function: [{e}]"} for _ in pairs]
        raise AssertionError("unreachable")

    def eval_batch(self, source: str, params: dict,
                   events_headers: list) -> list[dict]:
        """Run process() over a batch. events_headers = [(event_dict,
        headers_list), ...]; returns one result dict per event:
        {"event", "contexts", "replace"} | {"drop": True} | {"error"}.

        One retry on sidecar death (the replacement recompiles), then the
        whole batch surfaces as per-event errors so a poisoned executor
        degrades to bad rows instead of task failure.
        """
        return self._batch("batch", source, params, events_headers)

    def eval_batch_raw(self, source: str, params: dict,
                       events_headers: list) -> list[dict]:
        """Fast path: events_headers = [(event_json_str, headers), ...];
        the sidecar parses, diffs, and stringifies in V8 and returns
        {"changed": {field: new}, "contexts_json": "[{schema,data}…]"|null,
        "replace"} | {"drop"} | {"error"} — no per-event JSON work in
        Python, and contexts stay a single string so the Arrow return
        column is vectorized."""
        return self._batch("batch2", source, params, events_headers)


# process-local shared engine: pandas-UDF closures must not capture a
# live subprocess handle (it would be pickled to workers), so they call
# shared_engine() lazily inside the worker instead
_SHARED: NodeJsEngine | None = None
_SHARED_LOCK = threading.Lock()


def shared_engine() -> NodeJsEngine:
    global _SHARED
    with _SHARED_LOCK:
        if _SHARED is None:
            _SHARED = NodeJsEngine()
        return _SHARED
