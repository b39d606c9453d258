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


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the plan (for parquet scans: bytes on
    disk after column pruning). Analysis-only; None when no estimate."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    # Catalyst signals "unknown" with Long.MaxValue-ish sentinels.
    return size if 0 <= size < (1 << 62) else None


def widen_if_heavy(
    df: DataFrame,
    min_bytes: int = 16 << 20,
    target: int | None = None,
) -> DataFrame:
    """Size-gated :func:`ensure_min_partitions`: widen only when the input
    is big enough that single-split execution would actually hurt.

    A repartition of a tiny frame costs a shuffle + an extra stage that
    dwarfs the parallelism it buys (measured ~0.4 s on a 2 MB table), while
    a 50 MB single-split input under a CPU-bound UDF leaves every core but
    one idle. Unknown sizes widen — the conservative choice for large
    inputs, and the cheap shuffle is noise at whatever size made the
    estimate unavailable.
    """
    size = plan_size_bytes(df)
    if size is not None and size < min_bytes:
        return df
    return ensure_min_partitions(df, target)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a hash-bucketed (optionally per-bucket-sorted)
    parquet table.

    Bucketing is THE 100-TB co-location strategy for hot join/agg keys:
    both sides of a join written with the same bucket spec join with ZERO
    exchange on either side (the hash partitioning is baked into the file
    layout and survives restarts), and sorted buckets also skip the
    sort-merge-join sort. A 100-TB fact table re-joined against fresh
    snapshots daily amortizes one bucketing write against every future
    shuffle of that table.

    Must go through ``saveAsTable`` — plain ``.save(path)`` drops the
    bucket metadata (Spark reads it back from the catalog, not the files).
    """
    buckets = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *buckets)
    if sort_cols is not None:
        sorts = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sorts)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
