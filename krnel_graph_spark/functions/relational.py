"""Relational operators Spark lacks as single calls.

Joins/aggregations/windows/set-ops themselves are native DataFrame methods
(additive capability over the reference, which has none — SURVEY §2.9); what
lives here are the composite patterns: as-of joins and range joins built
from union+window / bucketed-join plans that avoid O(n·m) comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key (inclusive, like
    DuckDB/kdb ASOF JOIN).

    Plan: tag and union both sides, then one window pass per key ordered by
    (ts, right-before-left on ties) carrying the last seen right values
    forward. One shuffle on the key — no range cross-join, no point-in-time
    self-join explosion; this is the scalable formulation.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("__l"),
    )
    unioned = l_tag.unionByName(r_tag)
    # Right rows sort before left rows at equal ts → inclusive (<=) matching.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__is_left") == 1)
    return carried.select(
        F.col("__l.*"),
        *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join without a cross product: both sides explode
    into fixed-width buckets of the join dimension and equi-join on the
    bucket id before the exact range predicate. Shuffle is proportional to
    interval length / bucket_width, not |L|×|R|."""
    l = left.withColumn(
        "__bucket", (F.col(left_point) / bucket_width).cast("long")
    )
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(right_start) / bucket_width).cast("long"),
                (F.col(right_end) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        l.join(r, "__bucket")
        .filter(
            (F.col(left_point) >= F.col(right_start))
            & (F.col(left_point) <= F.col(right_end))
        )
        .drop("__bucket")
    )
