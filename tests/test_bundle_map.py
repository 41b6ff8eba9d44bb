"""Bundle-map drift guard: the README's oracle-row bundling table is
hand-written prose, but the `_union_parts` calls in __spark_entry__.py
are the truth. This test AST-extracts the real {bundle: parts} map and
(a) pins it, so adding a part without updating the map fails here, and
(b) cross-checks every (row, part) claim in the README table against
the extracted truth.
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent


def _literal_parts(node):
    """[("part", expr), ...] literal → part names, else None."""
    if not isinstance(node, ast.List):
        return None
    out = []
    for el in node.elts:
        if (isinstance(el, ast.Tuple) and el.elts
                and isinstance(el.elts[0], ast.Constant)
                and isinstance(el.elts[0].value, str)):
            out.append(el.elts[0].value)
        else:
            return None
    return out


def _parts_of(node, helpers):
    """Resolve a _union_parts first argument to part names: literal
    list, helper() call whose return is a literal list, or a BinOp
    concatenation of those."""
    lit = _literal_parts(node)
    if lit is not None:
        return lit
    if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
            and node.func.id in helpers):
        return list(helpers[node.func.id])
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
        left = _parts_of(node.left, helpers)
        right = _parts_of(node.right, helpers)
        if left is not None and right is not None:
            return left + right
    return None


def extract_bundle_parts() -> dict[str, list[str]]:
    src = (ROOT / "__spark_entry__.py").read_text()
    tree = ast.parse(src)

    # helper functions whose RETURN is a literal [("part", df), ...]
    helpers: dict[str, list[str]] = {}
    for fn in ast.walk(tree):
        if isinstance(fn, ast.FunctionDef):
            for st in ast.walk(fn):
                if isinstance(st, ast.Return) and st.value is not None:
                    lit = _literal_parts(st.value)
                    if lit is not None:
                        helpers[fn.name] = lit

    # map every _union_parts call line → resolved parts
    call_parts: dict[int, list[str]] = {}
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "_union_parts" and node.args):
            parts = _parts_of(node.args[0], helpers)
            assert parts is not None, (
                f"__spark_entry__.py:{node.lineno}: _union_parts arg not "
                "statically resolvable — extend this extractor so the "
                "bundle map stays verifiable")
            call_parts[node.lineno] = parts

    # attribute calls to bundles: q["name"] = <expr spanning lines>,
    # resolving one level of `q["name"] = helper_fn` indirection
    fn_spans = {
        fn.name: (fn.lineno, fn.end_lineno)
        for fn in ast.walk(tree) if isinstance(fn, ast.FunctionDef)
    }
    bundles: dict[str, list[str]] = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Assign) and len(node.targets) == 1):
            continue
        t = node.targets[0]
        if not (isinstance(t, ast.Subscript) and isinstance(t.value, ast.Name)
                and t.value.id == "q"
                and isinstance(t.slice, ast.Constant)):
            continue
        name = t.slice.value
        lo, hi = node.lineno, node.end_lineno
        if (isinstance(node.value, ast.Name)
                and node.value.id in fn_spans):
            lo, hi = fn_spans[node.value.id]
        hits = [p for ln, p in call_parts.items() if lo <= ln <= hi]
        if len(hits) == 1:
            bundles[name] = hits[0]
        elif len(hits) > 1:
            raise AssertionError(
                f"{name}: multiple _union_parts calls in span {lo}-{hi}")
    return bundles


# THE PIN — the single place to update when a bundle absorbs a new
# operator part (update README.md's bundling table in the same commit;
# the README cross-check below enforces consistency for r8+ rows).
EXPECTED_BUNDLE_PARTS = {
    "ip_lookups": ["chain", "mmdb"],
    "cross_navigation": ["nav", "pagerank"],
    "ua_classify": ["native", "uap"],
    "currency_conversion": ["convert", "asof"],
    "adapter_explode": ["explode", "remote"],
    "webhook_vendor_suite": ["s1", "s2"],
    "bad_row_split": ["split", "format"],
    "metadata_aggregation": ["meta", "manifest", "card", "comp",
                             "zorder", "ksample", "kgroup", "wsample",
                             "fit", "skew", "shards"],
    "dedup_despan": ["despan", "lines", "novelty"],
    "sessionize": ["stats", "stream_closed", "stream_dedup", "chat",
                   "sftdedup", "pref"],
    "sql_lookup_join": ["broadcast", "json"],
    "yauaa_classify": ["native", "rules"],
    "iglu_validation": ["basic", "advanced"],
    "pii_pseudonymize": ["scalar", "json", "companion", "kanon",
                         "kanon_rpt"],
    "payload_decompress": ["gzip", "zstd", "warc", "robots"],
    "identity_stitch": ["identity", "merge", "snapdiff"],
    "script_hook": ["py", "js"],
    "streaming_parity": ["stream", "batch"],
    "dedup_exact": ["exact", "substr", "contam", "split"],
    "decontam_multi": ["multi", "bloom", "kmv", "drift", "sftdecon"],
    "text_pii_scrub": ["base", "fin"],
    "data_mix": ["sample", "pack", "q_lit", "q_join", "mix", "salted",
                 "c4", "chunk", "hh", "dsir", "hll", "qbins", "budget",
                 "dcap", "gqbins"],
    "dedup_minhash_lsh": ["sig", "lsh", "incr"],
    "dedup_ngram_jaccard": ["blocked", "prefix", "clusters",
                            "policy", "contain", "containp"],
    "ann_lsh_topk": ["plain", "probe", "recall", "recall_sum"],
    "ann_ivf_topk": ["ivf", "cluster", "pq_codes", "pq_adc", "recall",
                     "pca_gram", "pca_proj", "kmeans"],
    "embedding_dup_pairs": ["pairs", "lsh_pairs", "semdedup", "int8",
                            "margin", "negs"],
    "text_analysis": ["lang", "quality", "tokens", "fprint", "stats",
                      "rep", "lm", "html", "bpe", "unigram", "url",
                      "bm25", "clean", "script", "sbo", "code", "fence",
                      "fmix"],
    "multimodal": ["decode", "frames", "audio", "resize", "dhash",
                   "dhpairs", "incfp", "afp", "afppairs"],
}


def test_bundle_map_matches_code():
    got = extract_bundle_parts()
    assert got == EXPECTED_BUNDLE_PARTS, (
        "bundle parts drifted — update EXPECTED_BUNDLE_PARTS AND the "
        "README bundling table together.\n"
        + "\n".join(
            f"  {k}: code={got.get(k)} pin={EXPECTED_BUNDLE_PARTS.get(k)}"
            for k in sorted(set(got) | set(EXPECTED_BUNDLE_PARTS))
            if got.get(k) != EXPECTED_BUNDLE_PARTS.get(k)))


def test_readme_bundle_claims_exist_in_code():
    """Every `row (p1, p2)` oracle-row claim in the README bundling
    table must name a real bundle and real parts."""
    got = extract_bundle_parts()
    readme = (ROOT / "README.md").read_text()
    table = readme.split("## Oracle-row bundling", 1)[1]
    table = table.split("\n##", 1)[0]
    claims = []
    for line in table.splitlines():
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) < 4 or cells[0] in ("Operator", "---"):
            continue
        m = re.match(r"^([a-z_]+) \(([^)]+)\)$", cells[2])
        if not m:
            continue  # tests/... E2E rows, prose
        row, parts = m.group(1), [p.split(",")[0].strip()
                                  for p in m.group(2).split(",")]
        claims.append((row, [p.strip() for p in m.group(2).split(",")]))
    assert claims, "README bundling table not found / not parseable"
    for row, parts in claims:
        assert row in got, f"README claims bundle {row!r} which has no " \
                           f"_union_parts row in code"
        for p in parts:
            p = p.split(",")[0].split(")")[0].strip()
            if not re.fullmatch(r"[a-z_0-9]+", p):
                continue           # detail clause like "doc_id%16==6"
            assert p in got[row], (
                f"README claims part {p!r} in bundle {row!r}; code has "
                f"{got[row]}")
