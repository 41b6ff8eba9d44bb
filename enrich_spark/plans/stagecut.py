"""Codegen stage boundaries.

Catalyst's CollapseProject folds every sequential withColumns/select of
the 27-step enrichment chain into ONE projection, re-inlining each
computed column's expression tree into every consumer. With all 131
atomic columns live (TSV serialization) single fused expressions exceed
Janino's 64KB/method limit — whole-stage codegen then silently falls
back for the entire stage, the worst plan for the hottest path.

A CollectMetrics node (``df.observe``) is the one plan-only barrier
exposed to PySpark: CollapseProject cannot merge across it, filters are
not pushed through it (that would change the observed metrics), yet it
moves no data and costs one count accumulation per row. Each boundary
also doubles as a free per-stage row counter. Column pruning through
the boundary is preserved (verified in tests/test_pipeline.py).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_boundary_ctr = itertools.count()


def stage_boundary(df: DataFrame) -> DataFrame:
    """Split whole-stage codegen here: everything above compiles as one
    generated class, everything below as another."""
    return df.observe(f"enrich_stage_{next(_boundary_ctr)}", F.count(F.lit(1)).alias("rows"))
