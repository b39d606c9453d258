"""Approximate sketches for large-scale profiling.

At 100 TB, exact distinct counts, heavy-hitter lists, and quantiles are
shuffle-heavy or memory-unbounded; these wrappers expose Spark's built-in
mergeable sketches (HyperLogLog++, count-min, Greenwald-Khanna/KLL) with
the partial-aggregation property that makes them scale: each executor
builds a fixed-size sketch over its partition and only sketches merge at
the driver-side of the shuffle — bytes shuffled are O(sketch), not O(data).

No DuckDB oracles on purpose: sketch internals differ across engines, so
these are pinned by error-bound tests against exact answers instead
(``tests/test_sketches.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: list[str], rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct counts per column, one pass over the data.
    ``rsd`` is the target relative standard deviation (Spark default 5%);
    memory per column is O(1/rsd²) regardless of cardinality."""
    return df.agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_distinct")
            for c in cols
        ]
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, support: float = 1e-4
) -> DataFrame:
    """Top-k most frequent values. Exact counts via hash aggregation (one
    shuffle of (value, partial_count) pairs — already mergeable), then a
    TakeOrderedAndProject for the top k; ``support`` prunes the long tail
    before the ordering so the rank input stays heavy-hitter-sized.

    The support threshold (``ceil(total × support)``) derives from the
    counts aggregate itself — the raw table is scanned exactly once (the
    counts frame is persisted for its two consumers; it is
    value-cardinality-sized, already reduced)."""
    from pyspark import StorageLevel

    counts = (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count("*").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # total from the aggregate (value-cardinality-sized), not a second scan
    threshold = counts.agg(
        F.greatest(F.lit(1).cast("long"), F.ceil(F.sum("n") * support)).alias("t")
    )
    return (
        counts.join(F.broadcast(threshold), F.col("n") >= F.col("t"))
        .select("value", "n")
        .orderBy(F.col("n").desc(), F.col("value").asc())
        .limit(k)
    )


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], accuracy: int = 10000
) -> list[float]:
    """Quantile estimates via Spark's Greenwald-Khanna variant: guaranteed
    rank error ≤ 1/accuracy, single pass, mergeable partials."""
    return df.approxQuantile(col, probabilities, 1.0 / accuracy)


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass profile per column: non-null count, HLL distinct, min/max.
    The whole profile is a single aggregate — one job, no per-column scans."""
    aggs: list[Column] = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}_nonnull"),
            F.approx_count_distinct(c).alias(f"{c}_distinct"),
            F.min(c).cast("string").alias(f"{c}_min"),
            F.max(c).cast("string").alias(f"{c}_max"),
        ]
    return df.agg(*aggs)
