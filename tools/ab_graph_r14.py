"""Interleaved A/B for the r14 graph-family pin/single-pass changes.

OLD forms are inlined verbatim from git HEAD (pre-change); NEW forms come
from the working tree's functions/graph.py. Runs A,B alternately in ONE
session (same box state), noop sink, reports min-of-N each.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _edges(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    e1 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % 500).alias("dst"),
    )
    e2 = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 13 + 1) % 500).alias("dst"),
    )
    return e1.union(e2)


# ---- OLD forms (HEAD) ----

def old_triangle(edges: DataFrame) -> DataFrame:
    src, dst = "src", "dst"
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a"))
    return (
        wedges.join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def old_clustering(edges: DataFrame) -> DataFrame:
    src, dst = "src", "dst"
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.explode(
                F.array(F.col("e1.a"), F.col("e1.b"), F.col("e2.b"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.coalesce(F.col("n_triangles"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1) / 2.0),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )


def old_assortativity(edges: DataFrame) -> DataFrame:
    src, dst = "src", "dst"
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ed = e.join(da, "a").join(db, "b")
    sym = ed.select(
        F.col("da").alias("x"), F.col("db").alias("y")
    ).unionAll(ed.select(F.col("db").alias("x"), F.col("da").alias("y")))
    m = sym.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    dx = F.sqrt((n * F.col("sxx") - sx * sx).cast("double"))
    dy = F.sqrt((n * F.col("syy") - sy * sy).cast("double"))
    return m.select(
        (n / F.lit(2)).cast("long").alias("n_edges"),
        F.when(
            (dx > 0) & (dy > 0), F.round(num / dx / dy, 6)
        ).otherwise(F.lit(0.0)).alias("assortativity"),
    )


def nopin_assortativity(edges: DataFrame) -> DataFrame:
    """Single-pass moments, NO pin — isolates the pin's effect."""
    src, dst = "src", "dst"
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ed = e.join(da, "a").join(db, "b")
    m = ed.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("da").alias("sa"),
        F.sum("db").alias("sb"),
        F.sum(F.col("da") * F.col("db")).alias("sab"),
        F.sum(F.col("da") * F.col("da")).alias("saa"),
        F.sum(F.col("db") * F.col("db")).alias("sbb"),
    ).select(
        (F.col("cnt") * 2).alias("n"),
        (F.col("sa") + F.col("sb")).alias("sx"),
        (F.col("sa") + F.col("sb")).alias("sy"),
        (F.col("sab") * 2).alias("sxy"),
        (F.col("saa") + F.col("sbb")).alias("sxx"),
        (F.col("saa") + F.col("sbb")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    dx = F.sqrt((n * F.col("sxx") - sx * sx).cast("double"))
    dy = F.sqrt((n * F.col("syy") - sy * sy).cast("double"))
    return m.select(
        (n / F.lit(2)).cast("long").alias("n_edges"),
        F.when(
            (dx > 0) & (dy > 0), F.round(num / dx / dy, 6)
        ).otherwise(F.lit(0.0)).alias("assortativity"),
    )


def main() -> None:
    from krnel_graph_spark.functions.graph import (
        clustering_coefficients,
        degree_assortativity,
        triangle_count,
    )
    from krnel_graph_spark.runners.spark_runner import get_spark

    spark = get_spark("ab_graph")
    runs = int(os.environ.get("AB_RUNS", "4"))
    cases = [
        ("assort old-vs-pin", old_assortativity, degree_assortativity),
        ("assort old-vs-nopin", old_assortativity, nopin_assortativity),
        ("assort nopin-vs-pin", nopin_assortativity, degree_assortativity),
    ]

    def timed(fn):
        edges = _edges(spark)
        t = time.perf_counter()
        fn(edges).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t
        spark.catalog.clearCache()
        return dt

    # warm-up once (session/codegen)
    timed(old_triangle)
    for name, old, new in cases:
        olds, news = [], []
        for _ in range(runs):
            olds.append(timed(old))
            news.append(timed(new))
        print(
            f"{name}: old min={min(olds):.3f} {['%.2f' % x for x in olds]}"
            f" | new min={min(news):.3f} {['%.2f' % x for x in news]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
