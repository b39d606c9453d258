"""Partitioning guards for compute-heavy operators.

A small parquet file arrives as ONE input split (`maxPartitionBytes` is an
upper bound, not a target), so per-row-expensive operators — shingling,
MinHash folds, model inference — would run on a single core of the whole
cluster. These helpers widen narrow scans up to the session's default
parallelism and are no-ops when the scan is already parallel (the 100-TB
case: thousands of splits), so large inputs never pay a gratuitous shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition up to ``target`` (default: the session's
    ``defaultParallelism``) when the plan currently has fewer partitions.

    Use before CPU-bound per-row work whose input may be a handful of
    splits. The partition count is read from the physical plan (analysis
    only — no job is triggered).
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
