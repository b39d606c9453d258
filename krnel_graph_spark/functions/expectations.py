"""Data-quality expectations: declarative row-level rules evaluated in one
aggregation pass — the Deequ/Great-Expectations-style validation gate a
100-TB ingest runs before committing a snapshot to training.

Each rule is a boolean predicate every row should satisfy; the report is
one row per rule with exact violation counts. All rules are folded into a
SINGLE aggregate over one scan (``sum(CASE WHEN NOT p THEN 1)`` per rule),
so adding rules never adds passes over the data, predicates stay inside
whole-stage codegen, and the result is a #rules-row frame regardless of
input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_rules(df: DataFrame, rules: dict[str, Column | str]) -> DataFrame:
    """Evaluate ``rules`` (name → boolean predicate, as a Column or a SQL
    expression string) against every row of ``df``.

    Returns one row per rule, in rule-name order:
    ``(rule, n_rows, n_violations, passed)``. A NULL predicate result
    counts as a violation — unknown is not satisfied (the same
    three-valued-logic trap that lets ``WHERE`` silently drop rows lets a
    naive validator silently pass them).

    Scale shape: one scan, one partial-aggregated global aggregate with
    #rules conditional counters; the per-rule rows are exploded from the
    single result row driver-side-free."""
    if not rules:
        raise ValueError("expect_rules: at least one rule is required")
    preds = {
        name: (F.expr(p) if isinstance(p, str) else p)
        for name, p in rules.items()
    }
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, (name, p) in enumerate(preds.items()):
        aggs.append(
            F.sum(
                F.when(~F.coalesce(p, F.lit(False)), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    report = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__v{i}").alias("n_violations"),
                        (F.col(f"__v{i}") == 0).alias("passed"),
                    )
                    for i, name in enumerate(preds)
                ]
            )
        ).alias("kv")
    )
    return report.select("kv.*")


def quarantine(
    df: DataFrame, rules: dict[str, Column | str]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (clean, quarantined) by the conjunction of
    ``rules``: a row is quarantined when ANY rule fails (NULL = fail).
    The quarantined frame carries a ``__failed_rules`` array naming the
    violated rules — the audit trail an ingest pipeline writes next to
    the clean snapshot. Pure scan-side predicates; no shuffle."""
    if not rules:
        raise ValueError("quarantine: at least one rule is required")
    preds = {
        name: (F.expr(p) if isinstance(p, str) else p)
        for name, p in rules.items()
    }
    ok = {name: F.coalesce(p, F.lit(False)) for name, p in preds.items()}
    all_ok = None
    for c in ok.values():
        all_ok = c if all_ok is None else (all_ok & c)
    failed = F.filter(
        F.array(
            *[
                F.when(~c, F.lit(name)).otherwise(F.lit(None))
                for name, c in ok.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    clean = df.filter(all_ok)
    bad = df.filter(~all_ok).withColumn("__failed_rules", failed)
    return clean, bad
