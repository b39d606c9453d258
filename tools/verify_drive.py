"""End-to-end verify drive (the .claude/skills/verify flows, scripted).

Drives the public API + driver contract on the sf0.001 testdata and
cross-checks against DuckDB: oracle parity, store memoization,
uuid_to_op rehydration, plan quality (pushed filters, original file),
and entry(). Exits non-zero on any failure.
"""

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import duckdb

    import krnel_graph_spark as kg

    shutil.rmtree("/tmp/verify_store", ignore_errors=True)
    runner = kg.SparkRunner(store_path="/tmp/verify_store")
    src = "/root/testdata/sf0.001/customer.parquet"
    ds = runner.from_parquet(src)

    # 1. pipeline vs DuckDB oracle (row order = file order)
    op = ds.mask_rows(ds.col_categorical("c_mktsegment").is_in({"BUILDING"}))
    got = runner.to_pandas(op)
    want = duckdb.sql(
        f"SELECT * FROM read_parquet('{src}') WHERE c_mktsegment='BUILDING'"
    ).df()
    assert len(got) == len(want) and list(got["c_custkey"]) == list(
        want["c_custkey"]
    ), "oracle mismatch"

    # 2. memoization: fresh runner on the same store must be sub-second
    tpl = lambda d: d.template("cust {{ name }}", name=d.col_text("c_name"))
    runner.to_pandas(tpl(ds))
    r2 = kg.SparkRunner(store_path="/tmp/verify_store")
    op3 = tpl(r2.from_parquet(src))
    t0 = time.time()
    r2.to_pandas(op3)
    memo_s = time.time() - t0
    assert memo_s < 1.0, f"memoized re-run took {memo_s:.2f}s"

    # 3. rehydration from the store alone
    op4 = r2.uuid_to_op(op3.uuid)
    assert op4.uuid == op3.uuid, "rehydration uuid mismatch"

    # 4. plan quality: pushed filter reaches the scan of the ORIGINAL file
    plan = runner.dataframe(op)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_mktsegment" in plan, "no pushdown"
    assert src in plan and "verify_store" not in plan, "scan not on original"

    # 5. driver contract
    import __spark_entry__ as entry_mod
    from krnel_graph_spark.runners.spark_runner import get_spark

    n = entry_mod.entry(get_spark("verify")).count()
    assert n > 0, "entry() returned no rows"
    print(f"verify_drive OK (memoized {memo_s:.2f}s, entry {n} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
