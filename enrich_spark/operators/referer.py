"""Referer-parser enrichment — refr_medium / refr_source / refr_term.

Mirrors common/enrichments/registry/RefererParserEnrichment.scala:92-107:
classify page_referrer's host against a referer database
(search/social/email/paid + source name + search-term params), mark
`internal` when the referer host equals the page host or is in the
configured internal domains.

Spark-first design: the referer DB is a small static table —
**broadcast hash join** on the candidate host keys (host, and host with
leading 'www.' stripped), never a UDF. At 100 TB the DB is ~10k rows
broadcast once per executor; the join stays map-side.

The built-in DB below is a compact public subset (same shape as the
snowplow referer-parser referers.yml); `load_referer_db` accepts a full
referers JSON/parquet for production parity.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import RefererParserConf

# (domain, medium, source, term_params)
_BUILTIN_DB: list[tuple[str, str, str, list[str]]] = [
    ("google.com", "search", "Google", ["q"]),
    ("google.co.uk", "search", "Google", ["q"]),
    ("google.fr", "search", "Google", ["q"]),
    ("google.de", "search", "Google", ["q"]),
    ("www.google.com", "search", "Google", ["q"]),
    ("www.google.co.uk", "search", "Google", ["q"]),
    ("bing.com", "search", "Bing", ["q"]),
    ("www.bing.com", "search", "Bing", ["q"]),
    ("search.yahoo.com", "search", "Yahoo!", ["p", "q"]),
    ("duckduckgo.com", "search", "DuckDuckGo", ["q"]),
    ("yandex.ru", "search", "Yandex", ["text"]),
    ("baidu.com", "search", "Baidu", ["wd", "word"]),
    ("www.baidu.com", "search", "Baidu", ["wd", "word"]),
    ("ecosia.org", "search", "Ecosia", ["q"]),
    ("www.ecosia.org", "search", "Ecosia", ["q"]),
    ("facebook.com", "social", "Facebook", []),
    ("www.facebook.com", "social", "Facebook", []),
    ("m.facebook.com", "social", "Facebook", []),
    ("l.facebook.com", "social", "Facebook", []),
    ("twitter.com", "social", "Twitter", []),
    ("t.co", "social", "Twitter", []),
    ("x.com", "social", "Twitter", []),
    ("linkedin.com", "social", "LinkedIn", []),
    ("www.linkedin.com", "social", "LinkedIn", []),
    ("lnkd.in", "social", "LinkedIn", []),
    ("instagram.com", "social", "Instagram", []),
    ("www.instagram.com", "social", "Instagram", []),
    ("reddit.com", "social", "Reddit", []),
    ("www.reddit.com", "social", "Reddit", []),
    ("old.reddit.com", "social", "Reddit", []),
    ("news.ycombinator.com", "social", "Hacker News", []),
    ("youtube.com", "social", "YouTube", []),
    ("www.youtube.com", "social", "YouTube", []),
    ("pinterest.com", "social", "Pinterest", []),
    ("www.pinterest.com", "social", "Pinterest", []),
    ("mail.google.com", "email", "Gmail", []),
    ("outlook.live.com", "email", "Outlook.com", []),
    ("mail.yahoo.com", "email", "Yahoo! Mail", []),
    ("googleads.g.doubleclick.net", "paid", "Google", []),
    ("www.googleadservices.com", "paid", "Google", []),
]


def referer_db(spark: SparkSession, path: str | None = None) -> DataFrame:
    """The referer lookup table (refr_host, medium, source, term_params)."""
    if path:
        p = Path(path)
        if p.suffix in (".json", ".yml", ".yaml"):
            # the public referer-parser database shape (referers.yml /
            # referers.json): {medium: {source: {domains: [...],
            # parameters: [...]}}}
            if p.suffix == ".json":
                doc = json.loads(p.read_text())
            else:
                import yaml

                doc = yaml.safe_load(p.read_text())
            rows = []
            for medium, sources in (doc or {}).items():
                for source, spec in sources.items():
                    for dom in spec.get("domains", []):
                        rows.append((dom, medium, source, spec.get("parameters", [])))
        else:
            return spark.read.parquet(path)
    else:
        rows = _BUILTIN_DB
    return spark.createDataFrame(
        rows, "refr_host STRING, r_medium STRING, r_source STRING, r_term_params ARRAY<STRING>"
    )


def referer_parser(df: DataFrame, conf: RefererParserConf, db: DataFrame) -> DataFrame:
    """Classify the referer. Broadcast join on exact host; `internal` when
    same-host or configured internal domain; `unknown` otherwise."""
    qs = F.str_to_map(F.col("refr_urlquery"), F.lit("&"), F.lit("="))
    joined = df.join(
        F.broadcast(db), df["refr_urlhost"] == db["refr_host"], "left"
    ).drop("refr_host")

    internal = F.col("refr_urlhost").isNotNull() & (
        (F.col("refr_urlhost") == F.col("page_urlhost"))
        | F.col("refr_urlhost").isin(*(conf.internal_domains or ["\t"]))
    )
    term = F.get(
        F.array_compact(
            F.transform(
                F.coalesce(F.col("r_term_params"), F.array().cast("array<string>")),
                lambda p: F.when(F.map_contains_key(qs, p), F.url_decode(qs[p])),
            )
        ),
        0,
    )
    has_ref = F.col("refr_urlhost").isNotNull()
    return (
        joined.withColumns({
            "refr_medium": F.when(~has_ref, F.lit(None).cast("string"))
            .when(internal, F.lit("internal"))
            .otherwise(F.coalesce(F.col("r_medium"), F.lit("unknown"))),
            "refr_source": F.when(has_ref & ~internal, F.col("r_source")),
            "refr_term": F.when(has_ref & ~internal, term),
        })
        .drop("r_medium", "r_source", "r_term_params")
    )
