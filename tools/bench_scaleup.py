"""Beyond-reference crossover bench: scale sf0.1 up 20-40x and re-time the
headline queries that have no reference counterpart to race.

The reference engine has no joins/windows/dedup, so BASELINE.md's 2x bar
can't be checked against it for those operators. This harness gives them a
self-relative scaling curve instead: if a query is O(n) its scaled-up time
should grow ~linearly with rows; superlinear growth flags a plan that won't
survive 100 TB (e.g. a candidate-pair explosion or a single-partition sort).

Scaled tables (written once to $SPARK_GRAFT_SCALEUP_DIR, default
/tmp/krnel_scaleup):

* events  x20 -> 2M rows. New copies get fresh event_ids/user_ids over the
  SAME time span — the realistic growth axis is population, and shifting
  time instead would leave per-window row counts flat.
* lineitem x20 -> 12M rows, fresh order keys.
* documents x40 -> 200k rows. Copy 0 is pristine; later copies interleave a
  copy-specific token every 5 words, so intra-copy near-dup structure is
  preserved (both members of a pair get identical insertions) while
  cross-copy Jaccard drops below the MinHash threshold. A verbatim 40x copy
  would square the candidate-pair count (every doc exactly duplicated 40
  times) and time a workload no real corpus produces.

Usage: python tools/bench_scaleup.py [--rebuild]
Prints one JSON line: {"metric": "scaleup_queries_total", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALEUP_DIR", "/tmp/krnel_scaleup")
SCALES = {"events": 20, "lineitem": 20, "documents": 40}
QUERIES = [
    "agg_q1",
    "asof_join",
    "sessionize",
    "dedup_exact",
    "minhash_pairs",
    # r5 documents-only additions (the scaled-up dir has events/lineitem/
    # documents; queries touching other tables can't run here).
    "connected_components",
    "decontaminate",
    "repetition_stats",
    "top_terms",
    "chunk_docs",
    "bm25_search",
    "tfidf",
    "tokenize_ids",
    "chunk_pack",
    "dedup_against_near",
    "dup_windows",
    # r5 behavior-analytics additions: events x20 for the funnel family,
    # documents x40 for the retrieval/ER pair generators.
    "funnel_steps",
    "funnel_conversion",
    "retention_cohorts",
    "event_transitions",
    "hybrid_search",
    # fuzzy_pairs is deliberately absent: the x40 corpus keeps 16-char
    # prefixes IDENTICAL across copies (the per-5-words token insertion
    # that breaks MinHash shingle similarity usually lands after char 16),
    # so the valid fuzzy-pair OUTPUT is itself quadratic (~5.4M pairs even
    # under an added n_chars/256 length band, measured 2026-08-14) — the
    # verbatim-copy regime this harness's docstring calls out as a
    # workload no real corpus produces. BASELINE.md section 5 records the
    # measurement.
]
ID_STRIDE = 10**9  # > any source id; keeps per-copy ids disjoint


def build(spark, rebuild: bool) -> None:
    from pyspark.sql import functions as F

    for name, n_copies in SCALES.items():
        dst = f"{OUT}/{name}.parquet"
        if not rebuild and os.path.exists(f"{dst}/_SUCCESS"):
            continue
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        copies = spark.range(n_copies).withColumnRenamed("id", "__copy")
        s = df.crossJoin(copies)
        if name == "events":
            s = s.withColumn(
                "event_id", F.col("event_id") + F.col("__copy") * ID_STRIDE
            ).withColumn("user_id", F.col("user_id") + F.col("__copy") * ID_STRIDE)
        elif name == "lineitem":
            s = s.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.col("__copy") * ID_STRIDE
            )
        elif name == "documents":
            words = F.split(F.col("text"), " ")
            tag = F.concat(F.lit("cp"), F.col("__copy").cast("string"))
            perturbed = F.array_join(
                F.zip_with(
                    words,
                    F.sequence(F.lit(0), F.size(words) - 1),
                    lambda w, i: F.when(
                        i % 5 == 0, F.concat(tag, F.lit(" "), w)
                    ).otherwise(w),
                ),
                " ",
            )
            s = (
                s.withColumn(
                    "doc_id", F.col("doc_id") + F.col("__copy") * ID_STRIDE
                )
                .withColumn(
                    "text",
                    F.when(F.col("__copy") == 0, F.col("text")).otherwise(perturbed),
                )
                .withColumn("n_chars", F.length("text"))
            )
        (
            s.drop("__copy")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(dst)
        )
        rows = spark.read.parquet(dst).count()
        print(f"  built {name}: {rows} rows", file=sys.stderr)


def main() -> None:
    import __spark_entry__ as entry_mod
    from krnel_graph_spark.runners.spark_runner import get_spark

    rebuild = "--rebuild" in sys.argv
    spark = get_spark("bench-scaleup")
    build(spark, rebuild)
    queries = entry_mod.queries()

    # Same warm-up protocol as bench.py.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in QUERIES:
        t0 = time.time()
        queries[name](spark, OUT).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scaleup_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "scales": SCALES,
                "src": SRC,
            }
        )
    )


if __name__ == "__main__":
    main()
