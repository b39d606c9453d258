"""Count Spark JOBS per query — the r15 evidence producer for the
mmr/kcenter greedy-batching and KN sub-job work (VERDICT r14 items 2-3:
"Done = event-log job count per query drops >= 2x").

Runs each named ``__spark_entry__.queries()`` entry once under a fresh
job group and reports how many Spark jobs the group launched (driver
collects + AQE sub-jobs + the final noop write all count — the
per-job scheduling floor these queries sit on is paid once per job).

Usage: python tools/count_jobs_r15.py [--tag TAG] q1 q2 ...
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
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
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from krnel_graph_spark.runners.spark_runner import get_spark

    spark = get_spark("count_jobs")
    sc = spark.sparkContext
    queries = entry_mod.queries()

    # warm-up identical to bench.py (JIT + parquet init + UDF workers)
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
        group = f"cj_{name}_{os.getpid()}"
        sc.setJobGroup(group, f"count_jobs:{name}")
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setJobGroup(None, None)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        spark.catalog.clearCache()
        print(
            f"{args.tag}{name}: jobs={n_jobs} wall={dt:.3f}s", flush=True
        )


if __name__ == "__main__":
    main()
