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
a JSON encode/decode, not a process or even a syscall.

Confinement: user code runs in a fresh ``vm`` context whose ONLY
intrinsics are the context realm's own (``vm.createContext`` gives every
context a brand-new global with its own Object/JSON/Math/...). No
host-realm object or function is ever placed in — or passed into — the
context; events, headers, and params cross as string primitives and are
parsed *inside* the realm, and results come back as a JSON string. So
``Object.constructor('return process')()`` resolves to the realm's own
``Function`` and cannot reach the host ``process``/``require``,
mirroring Nashorn's ClassFilter confinement (:71-78). Each invocation
runs under a per-event ``vm`` timeout (default 5 s, configurable), and
the Python side enforces a read deadline sized so it can only fire on a
genuine sidecar hang (e.g. ``Atomics.wait``, which V8 termination cannot
interrupt): on deadline the sidecar is killed and the batch degrades to
per-event error rows — no retry, since re-running a hanging script would
hang again.
"""

from __future__ import annotations

import hashlib
import json
import os
import select
import shutil
import subprocess
import threading
import time

__all__ = ["NodeJsEngine", "JsCompileError", "JsSidecarDeadline",
           "node_available", "shared_engine"]

# The sidecar program. Kept dependency-free (readline + vm are Node
# built-ins). One JSON object per line in, one per line out.
_SIDECAR_JS = r"""
'use strict';
const readline = require('readline');
const vm = require('vm');
const scripts = new Map();

// ALL user-facing machinery lives INSIDE the contextified realm: the
// sandbox object carries no host properties, so the only reachable
// intrinsics are the context realm's own fresh copies. Host <-> context
// traffic is string primitives exclusively (events, headers, params in;
// one JSON result string out), so prototype-walking from any reachable
// object (Object.constructor('return process')(), params' prototype,
// Error instances, ...) can only reach realm-local constructors.
const BOOTSTRAP = `
'use strict';
var __params = null;
function __setup(paramsJson) { __params = JSON.parse(paramsJson); }
// reference rejection semantics (JavascriptRejectionException,
// JavascriptScriptEnrichment.scala:121-126,163): user code calls
// rejectEvent() (or throws an object with __reject) to drop the event
function rejectEvent(msg) {
  var e = new Error(msg || 'event rejected');
  e.__reject = true;
  throw e;
}
var console = {log: function(){}, error: function(){}, warn: function(){}};
function __selfDescribingError(ctxs) {
  // parseContexts (JavascriptScriptEnrichment.scala:203-224): every
  // returned context must be {schema: <string>, data: <json>}
  if (!Array.isArray(ctxs)) {
    return 'Output of JavaScript function [' + JSON.stringify(ctxs) +
           '] could be parsed as JSON but is not read as an array';
  }
  for (var i = 0; i < ctxs.length; i++) {
    var c = ctxs[i];
    if (c === null || typeof c !== 'object' || typeof c.schema !== 'string' ||
        !('data' in c)) {
      return 'Resulting contexts are not self-desribing. Error(s): [json:[' +
             JSON.stringify(c) + ']]';
    }
  }
  return null;
}
// Nashorn exposed the mutable event BEAN, so reference scripts call
// event.getApp_id() / event.setPlatform(v); shim those accessor names
// onto the plain JSON event (getXyz -> field "xyz" with the first
// letter lowered, absent fields read as null — bean semantics). Plain
// property access still passes through.
function __beanify(event) {
  return new Proxy(event, {
    get: function (t, prop) {
      if (typeof prop === 'string' && !(prop in t)) {
        // capital required after the prefix: real Nashorn bean accessors
        // are getApp_id/setPlatform; a plain read of an absent field that
        // merely STARTS with 'get'/'set' (e.g. a truthiness check on
        // event.settings) must stay undefined, not a synthesized function
        var m = /^(get|set)([A-Z].*)$/.exec(prop);
        if (m) {
          var f = m[2].charAt(0).toLowerCase() + m[2].slice(1);
          if (m[1] === 'get') {
            return function () { return (f in t) ? t[f] : null; };
          }
          return function (v) { t[f] = v; };
        }
      }
      return t[prop];
    }
  });
}
function __runOne(event, headers) {
  // scala:189 — reset before each script so a previous enrichment's flag
  // cannot leak into this one's result
  event.use_derived_contexts_from_js_enrichment_only = false;
  var ctxs;
  try {
    ctxs = __entry(__beanify(event), headers);
  } catch (e) {
    if (e && e.__reject) return {drop: true};
    var msg = (e && e.message !== undefined) ? e.message : String(e);
    return {error: 'Error during execution of JavaScript function: [' + msg + ']'};
  }
  var bad = __selfDescribingError(ctxs);
  if (bad !== null) return {error: bad};
  var replace = !!event.use_derived_contexts_from_js_enrichment_only;
  delete event.use_derived_contexts_from_js_enrichment_only;
  return {event: event, contexts: ctxs, replace: replace};
}
function __run(eventJson, headersJson) {
  var event = eventJson ? JSON.parse(eventJson) : {};
  var headers = headersJson ? JSON.parse(headersJson) : [];
  return JSON.stringify(__runOne(event, headers));
}
// batch2: raw JSON strings in, mutation DIFF + stringified context data
// out — keeps all JSON encode/decode in V8 instead of per-row Python
function __runRaw(eventJson, headersJson) {
  var event;
  try {
    event = eventJson ? JSON.parse(eventJson) : {};
  } catch (e) {
    return JSON.stringify({error: 'Error during execution of JavaScript ' +
                           'function: [unparseable event: ' + e.message + ']'});
  }
  var headers = headersJson ? JSON.parse(headersJson) : [];
  var orig = {};
  for (var k0 in event) orig[k0] = event[k0];
  var res = __runOne(event, headers);
  if (res.drop || res.error !== undefined) return JSON.stringify(res);
  var changed = {};
  for (var k1 in event) {
    if (!(k1 in orig) || orig[k1] !== event[k1]) changed[k1] = event[k1];
  }
  // a field the script deleted (or set to null, caught above) clears the
  // atomic field downstream — reference semantics: in-place mutation to
  // null removes the value (scala:176-185)
  for (var k2 in orig) {
    if (!(k2 in event)) changed[k2] = null;
  }
  // contexts cross back as ONE JSON string: transferring a string
  // column through Arrow is vectorized, per-row python dict->struct
  // conversion is not (measured 2x on the whole stage)
  var ctxs = res.contexts.map(function (c) {
    return {schema: c.schema, data: JSON.stringify(c.data)};
  });
  return JSON.stringify({changed: changed,
          contexts_json: ctxs.length ? JSON.stringify(ctxs) : null,
          replace: res.replace});
}

// whole-batch runner: lets the host arm ONE vm watchdog per batch
// instead of one per event (the per-event watchdog cost ~45% of the
// whole script stage, measured). Progress lands in __bout/__bidx so a
// tripped watchdog can harvest the completed prefix and the host only
// re-isolates the remainder per event.
var __bout = null, __bidx = 0;
function __runBatch(batchJson, raw) {
  var pairs = JSON.parse(batchJson);
  __bout = []; __bidx = 0;
  for (var i = 0; i < pairs.length; i++) {
    __bout.push(raw ? __runRaw(pairs[i][0], pairs[i][1])
                    : __run(pairs[i][0], pairs[i][1]));
    __bidx = i + 1;
  }
  return JSON.stringify(__bout);
}
function __harvest() {
  return JSON.stringify({idx: __bidx, out: __bout || []});
}
`;

// precompiled call stubs — compiled once, run per event with a vm
// timeout (a direct cross-realm function call could not be timed out)
const CALL_RUN = new vm.Script('__run(__e, __h)');
const CALL_RAW = new vm.Script('__runRaw(__e, __h)');
const CALL_BATCH = new vm.Script('__runBatch(__b, __raw)');
const CALL_HARVEST = new vm.Script('__harvest()');

function compile(id, source, paramsJson, execTimeoutMs) {
  const sandbox = Object.create(null);
  const context = vm.createContext(sandbox);
  vm.runInContext(BOOTSTRAP, context, {timeout: 10000});
  sandbox.__pj = paramsJson;
  vm.runInContext('__setup(__pj)', context, {timeout: 10000});
  delete sandbox.__pj;
  // var (not bare assignment): must work when the user source opens
  // with 'use strict'
  const wrapped = source + "\n;var __entry = function(event, headers){" +
    "var result = process(event, __params, headers);" +
    "return (result === null || result === undefined) ? [] : result;};";
  vm.runInContext(wrapped, context, {timeout: 10000});
  const ok = vm.runInContext(
    "typeof __entry === 'function' && typeof process === 'function'",
    context, {timeout: 10000});
  if (!ok) {
    throw new Error('script must declare function process(event, params, headers)');
  }
  scripts.set(id, {sandbox: sandbox, context: context,
                   timeout: (execTimeoutMs > 0 ? execTimeoutMs : 5000)});
}

function invoke(entry, callScript, eventStr, headersStr) {
  entry.sandbox.__e = eventStr;
  entry.sandbox.__h = headersStr;
  let resStr;
  try {
    resStr = callScript.runInContext(entry.context, {timeout: entry.timeout});
  } catch (e) {
    // vm timeout ("Script execution timed out...") or an uncaught
    // realm-side throw outside __runOne's own try (e.g. circular
    // contexts failing JSON.stringify)
    const msg = (e && e.message !== undefined) ? e.message : String(e);
    return {error: 'Error during execution of JavaScript function: [' + msg + ']'};
  }
  return JSON.parse(resStr);
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
      compile(msg.id, msg.source, msg.params_json || '{}', msg.exec_timeout_ms);
      process.stdout.write(JSON.stringify({ok: true}) + '\n');
    } catch (e) {
      const m = (e && e.message !== undefined) ? e.message : String(e);
      process.stdout.write(JSON.stringify({compile_error: m}) + '\n');
    }
    return;
  }
  const entry = scripts.get(msg.id);
  const raw = msg.op === 'batch2';
  if (!entry) {
    const errs = msg.events.map(function () {
      return {error: 'script ' + msg.id + ' not compiled'};
    });
    process.stdout.write(JSON.stringify({results: errs}) + '\n');
    return;
  }
  const pairs = msg.events.map(function (pair) {
    return [raw ? (pair[0] || '') : JSON.stringify(pair[0] || {}),
            (typeof pair[1] === 'string') ? pair[1]
                                          : JSON.stringify(pair[1] || [])];
  });
  // fast path: the WHOLE batch under ONE vm watchdog (measured: a
  // per-event watchdog cost +45% on the script stage). Budget = the
  // per-event timeout plus 2 ms/event; a legitimate batch that still
  // trips it just falls back to the exact per-event path below.
  let out;
  entry.sandbox.__b = JSON.stringify(pairs);
  entry.sandbox.__raw = raw;
  try {
    out = JSON.parse(CALL_BATCH.runInContext(
      entry.context,
      {timeout: entry.timeout + Math.ceil(pairs.length * 2)}
    )).map(function (s) { return JSON.parse(s); });
  } catch (e) {
    // watchdog fired (or a realm-side throw outside __runOne): harvest
    // the completed prefix, then isolate the remainder per event with
    // the per-event timeout so only the offending event errors. The
    // event that tripped the watchdog may have partially executed
    // before its isolated re-run — visible only to scripts that keep
    // realm-global state across events.
    let done = 0, prefix = [];
    try {
      const h = JSON.parse(
        CALL_HARVEST.runInContext(entry.context, {timeout: 1000}));
      prefix = h.out.slice(0, h.idx).map(function (s) { return JSON.parse(s); });
      done = prefix.length;
    } catch (e2) { done = 0; prefix = []; }
    out = prefix;
    for (let i = done; i < pairs.length; i++) {
      out.push(invoke(entry, raw ? CALL_RAW : CALL_RUN, pairs[i][0], pairs[i][1]));
    }
  }
  process.stdout.write(JSON.stringify({results: out}) + '\n');
});
"""


class JsCompileError(ValueError):
    """The user script failed to compile (or lacks process())."""


class JsSidecarDeadline(RuntimeError):
    """The sidecar exceeded the Python-side read deadline (a hang the vm
    timeout could not interrupt, e.g. Atomics.wait). The process has been
    killed; the caller must NOT retry the batch — the same script would
    hang the replacement too."""


def node_available() -> bool:
    return shutil.which("node") is not None


class NodeJsEngine:
    """One persistent node sidecar; thread-safe, fork-safe, restartable.

    ``eval_batch`` is the unit of work: a list of (event, headers) pairs
    crosses the pipe in one round trip. Scripts are compiled once per
    (source, params) and memoized by content hash.
    """

    def __init__(self, node_bin: str | None = None,
                 exec_timeout_ms: int = 5000):
        self._node = node_bin or shutil.which("node")
        if self._node is None:
            raise RuntimeError("node binary not found on PATH")
        self._proc: subprocess.Popen | None = None
        self._pid = None  # owning python pid — respawn after fork
        self._rbuf = b""  # raw-fd read buffer (deadline-aware reads)
        self._compiled: set[str] = set()
        self._lock = threading.Lock()
        # per-event vm timeout inside the sidecar; the Python read
        # deadline is derived from it so it can only fire on a hang the
        # vm watchdog could not interrupt (never on a merely-slow script)
        self._exec_timeout_ms = int(exec_timeout_ms)

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
            self._rbuf = b""
            self._pid = os.getpid()
            self._compiled = set()

    def close(self):
        with self._lock:
            if self._proc is not None and self._pid == os.getpid():
                self._proc.kill()
            self._proc = None

    def _read_response(self, deadline_s: float) -> str:
        """Deadline-aware response read. select() readiness only
        guarantees ONE byte — a sidecar that emits a partial line and
        then hangs (dies mid-write with the pipe held by a forked child,
        stalls after a partial flush) would make a blocking readline()
        bypass the deadline entirely. Read the raw fd in a re-selecting
        loop until the newline or the deadline; bytes past the newline
        (never expected — one response line per request) stay buffered."""
        fd = self._proc.stdout.fileno()
        end = time.monotonic() + deadline_s
        while b"\n" not in self._rbuf:
            remaining = end - time.monotonic()
            if remaining <= 0:
                self._proc.kill()
                self._proc = None
                self._rbuf = b""
                raise JsSidecarDeadline(
                    f"node sidecar unresponsive for {deadline_s:.0f}s "
                    "(killed; batch degraded to error rows)")
            ready, _, _ = select.select([fd], [], [], remaining)
            if not ready:
                continue
            chunk = os.read(fd, 1 << 16)
            if not chunk:  # EOF — sidecar died
                self._rbuf = b""
                return ""
            self._rbuf += chunk
        line, _, self._rbuf = self._rbuf.partition(b"\n")
        return line.decode("utf-8")

    def _roundtrip(self, obj: dict, deadline_s: float = 60.0) -> dict:
        self._ensure_proc()
        try:
            self._proc.stdin.write(json.dumps(obj, separators=(",", ":")) + "\n")
            self._proc.stdin.flush()
            line = self._read_response(deadline_s)
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
            out = self._roundtrip(self._compile_msg(sid, source, params))
            if "compile_error" in out:
                raise JsCompileError(
                    f"Error compiling JavaScript function: [{out['compile_error']}]")
            self._compiled.add(sid)
            return sid

    def _compile_msg(self, sid: str, source: str, params: dict) -> dict:
        # params cross as a JSON STRING and are parsed inside the user
        # context's realm — a host-parsed object would hand the script a
        # host-realm prototype chain to escape through
        return {"op": "compile", "id": sid, "source": source,
                "params_json": json.dumps(params, separators=(",", ":")),
                "exec_timeout_ms": self._exec_timeout_ms}

    def _batch(self, op: str, source: str, params: dict,
               events_headers: list) -> list[dict]:
        sid = self.script_id(source, params)
        pairs = [[e, h] for e, h in events_headers]
        # worst legitimate case is every event burning its full vm
        # timeout, so this deadline can only fire on an uninterruptible
        # hang (Atomics.wait) — never on a slow-but-working script
        deadline = 60.0 + len(pairs) * self._exec_timeout_ms / 1000.0
        for attempt in (0, 1):
            try:
                with self._lock:
                    self._ensure_proc()
                    if sid not in self._compiled:
                        out = self._roundtrip(self._compile_msg(sid, source, params))
                        if "compile_error" in out:
                            msg = ("Error compiling JavaScript function: "
                                   f"[{out['compile_error']}]")
                            return [{"error": msg} for _ in pairs]
                        self._compiled.add(sid)
                    out = self._roundtrip({"op": op, "id": sid, "events": pairs},
                                          deadline_s=deadline)
                return out["results"]
            except JsSidecarDeadline as e:
                # no retry: the replacement sidecar would hang on the
                # same script; degrade the whole batch to error rows
                return [{"error": f"Error during execution of JavaScript "
                                  f"function: [{e}]"} for _ in pairs]
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
