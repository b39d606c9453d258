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


def profile_table(
    df: DataFrame,
    cols: list[str],
    exact_distinct: bool = False,
    hll_band: float | None = None,
) -> DataFrame:
    """Long-format table profile: one output row per column with row count,
    non-null count, distinct count, and numeric min/max (NULL for
    non-numeric columns).

    The whole profile is ONE aggregation pass over the table; the
    long-format pivot happens on the single result row, so its cost is
    nil. ``exact_distinct=False`` (default) uses HLL — the 100-TB mode;
    ``True`` swaps in exact ``count(DISTINCT)`` (Spark plans an Expand of
    |cols| replicas — fine for profiling passes, and what a SQL oracle can
    reproduce bit-for-bit).

    ``hll_band`` (implies the exact path) additionally computes the HLL
    estimate for every column and emits a boolean ``hll_within_band`` =
    |hll − exact| ≤ band·exact. This is the estimator-contract grading
    mode: exact stats are engine-portable, the band checks each
    engine's own HLL against bounded relative error without pinning
    estimator internals. Physically it is the exact aggregation plus a
    MINIMAL sketches-only aggregation crossJoined as two 1-row wides —
    deliberately NOT one fused aggregation: Catalyst rewrites
    multi-column count(DISTINCT) via Expand, and pushing the HLL
    sketches through the expanded stream measured 6.8 s vs 2.5 s for
    the split form at sf0.1 (and the r11 two-FULL-profile + 6-row-join
    form this replaces sat between them).
    """
    from pyspark.sql.types import NumericType

    from .partitioning import ensure_min_partitions

    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    # Partial aggregation (distinct sets, HLL registers, min/max) runs on
    # the scan's partitioning — one task on a single-split table. Round-
    # robin up to the session parallelism first (r14: 2.1 s -> 1.8 s at
    # sf0.1); no-op at scale. Order-insensitive aggregates throughout
    # (count/min/max/distinct/HLL register-max), so values are unchanged.
    df = ensure_min_partitions(df.select(*cols))
    if hll_band is not None:
        exact_distinct = True
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        distinct = (
            F.countDistinct(c) if exact_distinct else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(c).alias(f"__nonnull_{c}"),
            distinct.alias(f"__distinct_{c}"),
            (
                F.min(c).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__min_{c}"),
            (
                F.max(c).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    if hll_band is not None:
        hll_wide = df.agg(
            *[F.approx_count_distinct(c).alias(f"__hll_{c}") for c in cols]
        )
        wide = wide.crossJoin(F.broadcast(hll_wide))
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nonnull_{c}").alias("n_nonnull"),
            F.col(f"__distinct_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_num"),
            F.col(f"__max_{c}").alias("max_num"),
            *(
                [
                    (
                        F.abs(F.col(f"__hll_{c}") - F.col(f"__distinct_{c}"))
                        <= F.lit(hll_band) * F.col(f"__distinct_{c}")
                    ).alias("hll_within_band")
                ]
                if hll_band is not None
                else []
            ),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def histogram_fixed(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Equal-width histogram with CALLER-provided edges — the profiling
    companion to ``approx_quantiles`` when you want exact counts over a
    known range (score distributions, length distributions).

    Returns ``(bin, lo, hi, n)`` for every bin 0..bins-1 (empty bins
    included, n=0). Values outside [lo, hi) clamp into the edge bins
    (standard histogram tail-bucket behavior); nulls are dropped.

    Caller-fixed edges keep the op ONE aggregation pass (no min/max
    pre-scan) and make the bin arithmetic — ``floor((x-lo)*bins/(hi-lo))``
    — a fixed IEEE expression any SQL oracle evaluates identically. The
    shuffle carries at most ``bins`` partial counts per partition.
    """
    if bins <= 0:
        raise ValueError("bins must be positive")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) * bins / F.lit(float(hi) - float(lo)))
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)).cast("int")
    counts = (
        df.filter(x.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    width = (float(hi) - float(lo)) / bins
    frame = spark.range(bins).select(
        F.col("id").cast("int").alias("bin"),
        (F.lit(float(lo)) + F.col("id") * F.lit(width)).alias("lo"),
        (F.lit(float(lo)) + (F.col("id") + 1) * F.lit(width)).alias("hi"),
    )
    return (
        frame.join(counts, "bin", "left")
        .select(
            "bin",
            "lo",
            "hi",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns, long format
    ``(col_a, col_b, corr)`` for every a < b — the feature-analysis
    companion to ``profile_table``.

    ONE aggregation pass computes all moments (counts, sums, cross
    products); the pairwise formula then runs on the single result row,
    so cost is one scan regardless of pair count. Complete-case: rows
    with a null in ANY requested column are dropped first (so every pair
    sees the same n — and so does a SQL oracle).

    Exactness: each product is computed in IEEE double (identical in any
    engine) then cast to DECIMAL(38,12) before the SUM, so accumulation
    order cannot move the moments; the closed-form correlation is
    evaluated in double from those exact moments and rounded to 8.
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    from .partitioning import ensure_min_partitions

    # The decimal(38,12) partial sums are the expensive part and run on
    # the SCAN's partitioning — a small table is one split, so the whole
    # moment pass was one task (r14: measured 2.7 s -> 1.1 s at sf0.1).
    # Round-robin up to the session parallelism first; no-op at scale
    # where the scan already has >= parallelism splits. Values are
    # unaffected: the decimal sums are order-exact by construction.
    base = ensure_min_partitions(
        df.select(*[F.col(c).cast("double").alias(c) for c in cols])
    )
    for c in cols:
        base = base.filter(F.col(c).isNotNull())

    def dsum(expr):
        return F.sum(expr.cast("decimal(38,12)")).cast("double")

    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    for c in cols:
        aggs.append(dsum(F.col(c)).alias(f"__s_{c}"))
        aggs.append(dsum(F.col(c) * F.col(c)).alias(f"__ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(dsum(F.col(a) * F.col(b)).alias(f"__sp_{a}_{b}"))
    wide = base.agg(*aggs)

    out = []
    n = F.col("__n")
    for a, b in pairs:
        cov = n * F.col(f"__sp_{a}_{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
        va = n * F.col(f"__ss_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}")
        vb = n * F.col(f"__ss_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")
        out.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(cov / F.sqrt(va * vb), 8).alias("corr"),
            )
        )
    return wide.select(F.explode(F.array(*out)).alias("p")).select("p.*")
