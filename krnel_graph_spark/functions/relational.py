"""Relational operators Spark lacks as single calls.

Joins/aggregations/windows/set-ops themselves are native DataFrame methods
(additive capability over the reference, which has none — SURVEY §2.9); what
lives here are the composite patterns: as-of joins and range joins built
from union+window / bucketed-join plans that avoid O(n·m) comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key(s) (inclusive, like
    DuckDB/kdb ASOF JOIN). ``on`` may be one column name or a composite
    key list.

    Plan: tag and union both sides, then one window pass per key ordered by
    (ts, right-before-left on ties) carrying the last seen right row
    forward. One shuffle on the key — no range cross-join, no point-in-time
    self-join explosion; this is the scalable formulation.

    The carried payload is ONE ``struct(*value_cols)`` per right row (never
    per-column ``last(ignorenulls)``): all attached fields come from the
    same — latest — right row, exactly like DuckDB/kdb ASOF JOIN, even when
    that row legitimately holds NULL in some value column.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in (*keys, right_ts)
    ]
    if not value_cols:
        raise ValueError(
            "asof_join: right side has no value columns to attach "
            f"(columns {right.columns} are all join/time keys)"
        )
    from pyspark.sql import types as T

    def _q(c: str):
        # Backtick-quoted reference: plain names (df[c] / F.col(c)) parse
        # dots as nested-field paths.
        return F.col("`" + c.replace("`", "``") + "`")

    # StructType objects, not DDL strings: column names with spaces/dashes
    # would break a parsed "struct<...>" literal.
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_struct_type = T.StructType(list(left.schema.fields))
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        F.struct(*[_q(c) for c in left.columns]).alias("__l"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[_q(c).alias(c) for c in value_cols]).alias("__r"),
        F.lit(None).cast(l_struct_type).alias("__l"),
    )
    unioned = l_tag.unionByName(r_tag)
    # Right rows sort before left rows at equal ts → inclusive (<=) matching.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__carry"),
    ).filter(F.col("__is_left") == 1)
    # getField (not dotted-path parsing): value column names may contain
    # dots/spaces.
    return carried.select(
        F.col("__l.*"),
        *[F.col("__carry").getField(c).alias(f"{c}{suffix}") for c in value_cols],
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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to heavy key skew.

    A plain shuffle join sends every row of a hot key to ONE reducer; with
    a 100-TB table whose top key holds 1% of rows, that task runs 100× the
    median and dominates the stage. Salting splits each left key across
    ``num_salts`` sub-partitions (deterministic hash of the whole row) and
    replicates the matching right rows across all salts, so the hot key's
    work spreads over ``num_salts`` tasks at the cost of a ``num_salts``×
    fan-out of the right side — use when right is the smaller relation.
    Results are identical to the unsalted join.

    AQE's skew-join handles moderate skew automatically; this is the
    explicit tool for the pathological keys AQE splits can't fix (e.g. a
    single key larger than executor memory)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # Right/full outer would emit one null-extended row PER SALT for
        # unmatched right rows — not equivalent to the unsalted join.
        raise ValueError(f"salted_join supports left-preserving joins, not {how!r}")
    if "__salt" in left.columns or "__salt" in right.columns:
        # Silently shadowing a caller's __salt column would join on the
        # wrong thing and then drop their data.
        raise ValueError(
            "salted_join: input already has a __salt column; rename it first"
        )
    keys = [on] if isinstance(on, str) else list(on)
    # Salt by row position, NOT by row content: the pathological hot key is
    # often a billion IDENTICAL rows, which any content hash sends to the
    # same salt (defeating the split). Which salt a row gets never affects
    # results (the right side is replicated into every salt), so the
    # position-based assignment's run-to-run instability is harmless.
    lsalt = F.pmod(F.monotonically_increasing_id(), F.lit(num_salts)).alias("__salt")
    l_s = left.select("*", lsalt)
    r_s = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("__salt")
    )
    return l_s.join(r_s, keys + ["__salt"], how).drop("__salt")


def pivot_dynamic(
    df: DataFrame,
    group_cols: str | list[str],
    pivot_col: str,
    agg: Column | None = None,
    max_values: int = 100,
    prefix: str = "v_",
) -> DataFrame:
    """Pivot without a caller-supplied value list, under an explicit
    distinct-scan budget.

    Spark's ``pivot(col)`` with no values runs a hidden distinct-scan job
    and will happily build a 2-million-column plan from a high-cardinality
    key. This wrapper makes that scan explicit and bounded: it collects at
    most ``max_values + 1`` distinct values (a ``limit`` bounds the driver
    transfer no matter the table size), raises if the budget is exceeded,
    and then reuses the fixed-list pivot path — one Expand + single-shuffle
    aggregate, stable sorted column order, no surprise second job at plan
    time.

    Output columns are ``{prefix}{value}`` (sorted by value, NULL last as
    ``{prefix}null``) so downstream code and SQL oracles see a
    deterministic schema. At 100 TB the distinct scan is one full-column
    pass — acceptable for a profiling-grade operation and strictly better
    than the same scan hidden inside ``pivot()`` with an unbounded result.
    """
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    rows = df.select(pivot_col).distinct().limit(max_values + 1).collect()
    if len(rows) > max_values:
        raise ValueError(
            f"pivot_dynamic: {pivot_col!r} has more than {max_values} "
            f"distinct values; raise max_values or pre-bucket the column"
        )
    values = sorted((r[0] for r in rows), key=lambda v: (v is None, str(v)))
    out = df.groupBy(*gcols).pivot(pivot_col, values).agg(
        agg if agg is not None else F.count(F.lit(1))
    )
    renamed = [
        F.col(f"`{v}`").alias(f"{prefix}{v}") if v is not None
        else F.col("null").alias(f"{prefix}null")
        for v in values
    ]
    return out.select(*gcols, *renamed)
