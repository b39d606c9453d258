"""Single-query measurement harness for optimization work.

Times named ``__spark_entry__.queries()`` entries with the noop sink
(min-of-N, same methodology as bench.py) and optionally writes the
``explain("formatted")`` plan to a file — the plan-evidence producer for
``plans/r14/<query>_{before,after}.txt``.

Usage:
    python tools/measure_query.py [--runs N] [--explain-dir DIR] [--tag TAG] q1 q2 ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from krnel_graph_spark.runners.spark_runner import get_spark

    spark = get_spark("measure")
    queries = entry_mod.queries()

    # warm-up identical to bench.py
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    warm = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    warm.filter(warm.c_custkey > 0).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F  # noqa: N812

    @F.pandas_udf("long")
    def _warm_udf(s):
        return s

    spark.range(10_000).select(_warm_udf("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args.names:
        fn = queries[name]
        if args.explain_dir:
            d = Path(args.explain_dir)
            d.mkdir(parents=True, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (d / f"{name}_{args.tag}.txt").write_text(plan)
            spark.catalog.clearCache()
        best = float("inf")
        times = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"measure:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
            spark.catalog.clearCache()
        print(f"{name}: min={best:.3f}s runs={times}", flush=True)


if __name__ == "__main__":
    main()
