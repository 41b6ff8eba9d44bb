"""Web-page text extraction — HTML → training text, CommonCrawl style.

The WET-extraction step of a crawl-based training pipeline: strip
markup, decode entities, normalize whitespace, and compute the
boilerplate signals (text density, link density) that gate whether a
page contributes prose or navigation chrome.

Everything is a chain of native ``regexp_replace`` / ``regexp_count``
projections — single codegen'd map-side stage, zero Python, zero
shuffles, so the operator runs at scan speed on any corpus size. The
regex subset is deliberately RE2-compatible (no backreferences, no
lookaround) so the exact same extraction replays in DuckDB/BigQuery
SQL for replay-style audits.

This is a heuristic extractor (the jusText/trafilatura family solves
the general problem with DOM parsing); the documented contract is:

- ``<script>``/``<style>`` blocks and ``<!-- -->`` comments removed
- block-level tags become newlines, all other tags a space
- the 6 ubiquitous entities decoded (``&amp; &lt; &gt; &quot; &#39;
  &nbsp;``/``&#160;``), ``&amp;`` last so it cannot mint new entities
- whitespace collapsed (space runs → one space, blank-line runs → one
  blank line), leading/trailing trimmed
- signals: tag/link counts, anchor-text character mass, text-density
  and link-density in integer basis points (floor division — the
  all-integer discipline that keeps cross-engine replay bit-identical)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe building blocks (mirrored 1:1 in the SQL oracle)
_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_STYLE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT = r"(?s)<!--.*?-->"
_BLOCK_TAG = r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|header|footer|nav)[^>]*>"
_ANY_TAG = r"<[^>]*>"
_ANCHOR = r"(?is)<a[^>]*>(.*?)</a>"


def extract_text(html: Column) -> Column:
    """HTML → plain text (the normative extraction chain above)."""
    t = F.regexp_replace(html, _SCRIPT, " ")
    t = F.regexp_replace(t, _STYLE, " ")
    t = F.regexp_replace(t, _COMMENT, " ")
    t = F.regexp_replace(t, _BLOCK_TAG, "\n")
    t = F.regexp_replace(t, _ANY_TAG, " ")
    for ent, rep in (("&nbsp;", " "), ("&#160;", " "), ("&lt;", "<"),
                     ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
                     ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    # regex trim, not F.trim: SQL trim() strips only 0x20, so a leading
    # block-tag newline would survive (identically in DuckDB — mirrored)
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def html_extract(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_text_density_bp: int = 2500,
    max_link_density_bp: int = 3333,
) -> DataFrame:
    """Extract text + boilerplate signals from an HTML column.

    ``is_boilerplate`` fires when under ``min_text_density_bp`` (text
    chars / html chars) or over ``max_link_density_bp`` (anchor-text
    chars / text chars) — the classic nav-page signature. Thresholds
    are basis points so the gate itself is integer-exact.
    """
    html = F.col(html_col)
    text = extract_text(html)
    html_len = F.length(html).cast("long")
    text_len = F.length(text).cast("long")
    # anchor-text mass: tags nested inside the anchor don't count
    anchor_chars = F.aggregate(
        F.regexp_extract_all(html, F.lit(_ANCHOR), 1),
        F.lit(0).cast("long"),
        lambda acc, a: acc + F.length(F.regexp_replace(a, _ANY_TAG, "")),
    )
    density = (text_len * 10000 / F.greatest(html_len, F.lit(1))).cast("long")
    linkd = (anchor_chars * 10000 / F.greatest(text_len, F.lit(1))).cast("long")
    return docs.select(
        F.col(id_col),
        text.alias("extracted_text"),
        html_len.alias("html_len"),
        text_len.alias("text_len"),
        F.regexp_count(html, F.lit(r"<[A-Za-z/][^>]*>")).cast("long").alias("n_tags"),
        F.regexp_count(html, F.lit(r"(?i)<a[\s>]")).cast("long").alias("n_links"),
        anchor_chars.alias("anchor_chars"),
        density.alias("text_density_bp"),
        linkd.alias("link_density_bp"),
        ((density < min_text_density_bp) | (linkd > max_link_density_bp))
        .cast("int").alias("is_boilerplate"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization — crawl-frontier / dedup-key normalization

# tracking parameters stripped during canonicalization (the public
# "UTM + click-id" families every crawl pipeline drops)
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)="
)

# multi-label public suffixes recognized by registered_domain — a small
# embedded subset of the public-suffix list covering the common ccTLD
# second-level registries; single-label TLDs need no table (fallback =
# last two labels)
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "net.br", "co.in", "net.in",
    "com.cn", "net.cn", "co.nz", "co.za", "com.mx", "com.ar", "com.tr",
    "co.kr", "com.sg", "com.hk", "com.tw",
)

_MULTI_RE = "|".join(s.replace(".", r"\.") for s in MULTI_SUFFIXES)
_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"


def registered_domain(host: Column) -> Column:
    """eTLD+1: last 3 labels when the host ends in a known multi-label
    suffix, else last 2. Empty string when the host has no dot."""
    multi = F.regexp_extract(host, rf"([^.]+\.(?:{_MULTI_RE}))$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(multi != "", multi).otherwise(two)


def canonicalize_url(url: Column) -> Column:
    """Normalize an absolute http(s) URL to its canonical dedup key.

    Contract (each step mirrored 1:1 in :func:`url_normalize_sql`):
    fragment dropped; scheme + host lowercased; ``www.`` and default
    ports (``:80`` http, ``:443`` https) dropped, other ports kept;
    duplicate path slashes collapsed; trailing slash dropped (root
    stays ``/``; empty path becomes ``/``); tracking params removed;
    remaining params sorted bytewise and rejoined.
    """
    u = F.regexp_replace(F.trim(url), "#.*$", "")  # fragment
    scheme = F.lower(
        F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), r"^www\.", "")
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_replace(
        F.regexp_extract(pathq, "^([^?]*)", 1), "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, "(.)/$", "$1"))
    params = sorted_params(pathq)
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")),
    )


def sorted_params(pathq: Column) -> Column:
    """Query params minus tracking params, sorted bytewise."""
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    return F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    ))


def url_normalize(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical URL + structural signals, one native projection.

    Output: id, canonical_url, host, reg_domain, path_depth, n_params,
    n_tracking. Zero Python, zero shuffles — a crawl-frontier dedup key
    computed at scan speed.
    """
    u = F.regexp_replace(F.trim(F.col(url_col)), "#.*$", "")
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), r"^www\.", "")
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_replace(
        F.regexp_extract(pathq, "^([^?]*)", 1), "/{2,}", "/")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    all_params = F.filter(F.split(query, "&"), lambda p: p != "")
    kept = sorted_params(pathq)
    return df.select(
        F.col(id_col),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
        host.alias("host"),
        registered_domain(host).alias("reg_domain"),
        F.regexp_count(path, F.lit("[^/]+")).cast("long").alias("path_depth"),
        F.size(kept).cast("long").alias("n_params"),
        (F.size(all_params) - F.size(kept)).cast("long").alias("n_tracking"),
    )


def url_normalize_sql(from_sql: str, id_expr: str, url_expr: str,
                      id_alias: str = "doc_id") -> str:
    """ANSI-SQL (DuckDB) mirror of :func:`url_normalize`."""
    scheme_re = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
    u = f"regexp_replace(trim({url_expr}), '#.*$', '')"
    scheme = (f"lower(regexp_extract({u}, "
              "'^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))")
    rest = f"regexp_replace({u}, '{scheme_re}', '')"
    base = (
        f"select {id_expr} as {id_alias}, {scheme} as sch, {rest} as rest "
        f"from {from_sql}")
    hp = "lower(regexp_extract(rest, '^([^/?]*)', 1))"
    l2 = (
        f"select {id_alias}, sch, {hp} as hostport, "
        "regexp_replace(rest, '^[^/?]*', '') as pathq from (" + base + ")")
    host = ("regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''), "
            r"'^www\.', '')")
    port = "regexp_extract(hostport, ':([0-9]+)$', 1)"
    path0 = ("regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), "
             "'/{2,}', '/', 'g')")
    l3 = (
        f"select {id_alias}, sch, {host} as host, {port} as port, "
        f"{path0} as path0, "
        "regexp_extract(pathq, '\\?(.*)$', 1) as query from (" + l2 + ")")
    path = ("case when path0 = '' then '/' else "
            "regexp_replace(path0, '(.)/$', '\\1') end")
    allp = "list_filter(string_split(query, '&'), p -> p <> '')"
    kept = ("list_sort(list_filter(string_split(query, '&'), "
            f"p -> p <> '' and not regexp_matches(p, '{TRACKING_PARAM_RE}')))")
    keep_port = ("port <> '' and not (sch = 'http' and port = '80') "
                 "and not (sch = 'https' and port = '443')")
    l4 = (
        f"select {id_alias}, sch, host, port, {path} as path, "
        f"{allp} as allp, {kept} as kept, {keep_port} as keep_port "
        "from (" + l3 + ")")
    canon = (
        "sch || '://' || host || "
        "(case when keep_port then ':' || port else '' end) || path || "
        "(case when len(kept) > 0 then '?' || list_aggregate(kept, "
        "'string_agg', '&') else '' end)")
    reg = (
        f"coalesce(nullif(regexp_extract(host, '([^.]+\\.({_MULTI_RE}))$', 1)"
        ", ''), regexp_extract(host, '([^.]+\\.[^.]+)$', 1))")
    return (
        f"select {id_alias}, {canon} as canonical_url, host, "
        f"{reg} as reg_domain, "
        "cast(len(regexp_extract_all(path, '[^/]+')) as bigint) "
        "as path_depth, "
        "cast(len(kept) as bigint) as n_params, "
        "cast(len(allp) - len(kept) as bigint) as n_tracking "
        "from (" + l4 + ")")


# ---------------------------------------------------------------------------
# robots.txt — crawl-frontier politeness filtering (RFC 9309)


def _parse_robots_text(content: str, agent: str) -> list[tuple[str, int, int]]:
    """Parse ONE robots.txt body → [(like_pattern, allow, rule_len)].

    RFC 9309 subset: User-agent grouping (most-specific group wins —
    an exact ``agent`` group shadows ``*``), Allow/Disallow with ``*``
    wildcards and the ``$`` end anchor; other directives ignored.
    ``like_pattern`` is the rule pre-compiled to a SQL LIKE pattern so
    the MATCH side stays native (no Python in the per-URL path);
    ``rule_len`` is the raw rule length for longest-match precedence.
    """
    groups: list[tuple[list[str], list[tuple[str, int]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, int]] = []
    in_group_body = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_body = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_body = True
            if value:
                cur_rules.append((value, 1 if field == "allow" else 0))
            # empty Disallow/Allow = no rule (RFC: allows everything)
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    agent = agent.lower()
    exact = [r for agents, rs in groups for r in rs if agent in agents]
    star = [r for agents, rs in groups for r in rs if "*" in agents]
    chosen = exact if any(agent in agents for agents, _ in groups) else star

    out = []
    for rule, allow in chosen:
        pat = rule.replace("\\", "\\\\").replace("%", "\\%") \
                  .replace("_", "\\_")
        anchored = pat.endswith("$")
        if anchored:
            pat = pat[:-1]
        pat = pat.replace("*", "%")
        if not anchored:
            pat = pat + "%"
        out.append((pat, allow, len(rule)))
    return out


def parse_robots_rules(
    robots: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    content_col: str = "content",
) -> DataFrame:
    """Explode robots.txt bodies into per-domain rule rows:
    (domain, like_pattern, allow, rule_len).

    Scale shape: robots bodies are small and per-domain; parsing is one
    Arrow-batched pass (mapInPandas), and the OUTPUT — a few rules per
    domain — is the thing that broadcasts into the frontier join, not
    the bodies."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            doms, pats, allows, lens = [], [], [], []
            for dom, content in zip(pdf[domain_col], pdf[content_col]):
                for pat, allow, ln in _parse_robots_text(
                        content or "", agent):
                    doms.append(dom)
                    pats.append(pat)
                    allows.append(allow)
                    lens.append(ln)
            yield pd.DataFrame({
                "domain": doms, "like_pattern": pats,
                "allow": allows, "rule_len": lens})

    return robots.mapInPandas(
        run, "domain string, like_pattern string, allow int, rule_len int")


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Crawl-frontier politeness: per URL, the LONGEST matching rule
    decides (allow wins exact-length ties, per RFC 9309 §2.2.2); no
    matching rule → allowed.

    Plan: extract (host, path) natively, BROADCAST-join the per-domain
    rule table (rules ≪ frontier, always), evaluate the pre-compiled
    LIKE patterns JVM-side, take the per-URL max of
    (rule_len, allow) — one window-free groupBy. Output: the input
    columns + host, path, allowed, deciding_rule_len. A frontier is a
    SET of URLs: duplicate input rows collapse into one output row
    (the groupBy is the dedup a frontier wants anyway).
    """
    from pyspark.sql import functions as F

    u = urls.withColumn(
        "host", F.lower(F.expr(f"parse_url({url_col}, 'HOST')"))
    ).withColumn(
        "path", F.coalesce(F.expr(f"parse_url({url_col}, 'PATH')"),
                           F.lit("/"))
    ).withColumn(
        "path", F.when(F.col("path") == "", "/").otherwise(F.col("path")))
    joined = (
        u.join(F.broadcast(rules), u["host"] == rules["domain"], "left")
        .withColumn(
            "_hit",
            F.col("like_pattern").isNotNull()
            & F.expr("path LIKE like_pattern"))
        # (rule_len, allow) max = longest rule, allow on ties
        .withColumn(
            "_vote",
            F.when(F.col("_hit"),
                   F.struct(F.col("rule_len"), F.col("allow")))
        )
    )
    keys = [F.col(c) for c in urls.columns] + [F.col("host"),
                                               F.col("path")]
    return (
        joined.groupBy(*keys)
        .agg(F.max("_vote").alias("_best"))
        .select(
            *urls.columns, "host", "path",
            F.coalesce(F.col("_best.allow") == 1, F.lit(True))
            .cast("long").alias("allowed"),
            F.coalesce(F.col("_best.rule_len"), F.lit(0))
            .cast("long").alias("deciding_rule_len"),
        )
    )
