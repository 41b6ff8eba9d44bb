"""SparkSession factory with the engine's required settings."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "enrich-spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # tracker params / querystrings legitimately repeat keys; last wins
        # (matches reference toMap semantics, Adapter.scala:129)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # the 131-column enrichment projection exceeds Janino's 64KB/method
        # limit at the default split threshold (1024), silently dropping the
        # whole stage to interpreted mode; smaller split → compilable methods.
        # Measured 3.5x on the sf0.1 chain.
        .config("spark.sql.codegen.methodSplitThreshold", "128")
        # WholeStageCodegen silently skips operators wider than
        # spark.sql.codegen.maxFields (default 100) — the 131-column
        # atomic event chain ran interpreted until this was raised
        # (verified node-by-node in tests/test_plan_contract.py)
        .config("spark.sql.codegen.maxFields", "1000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
