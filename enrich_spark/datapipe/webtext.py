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
