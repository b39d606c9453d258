"""Local emulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin
(DuckDB) at a given scale factor, compares row count + schema-insensitive
sorted-column value hash, and prints a per-query verdict. Queries without an
oracle get a rows-only check.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (np.floating, float)):
        # Driver-strict: NO int-valued-float collapse and NO %.10g softening.
        # The driver hashes str(value), so a DuckDB HUGEINT->float64 "174.0"
        # must NOT compare equal to Spark's bigint "174" (r5 verdict item 2).
        f = float(v)
        if math.isinf(f):
            return "inf" if f > 0 else "-inf"
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_table(pdf: pd.DataFrame) -> tuple[int, list[str], int]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_value(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    rows.sort()
    return len(pdf), cols, hash(tuple(rows))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Vanilla session on purpose: the driver's gate does NOT use our
    # get_spark(), so queries must set any conf they need themselves.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    queries = entry_mod.queries()
    # Data-dependent literal oracles (bpe_encode, compression_signals)
    # read the gate parquet themselves; point them at THIS run's SF so
    # the local gate stays runnable at any scale (the driver uses the
    # sf0.01 default).
    import os

    os.environ[entry_mod._GATE_SF_DIR_ENV] = sf_dir
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(spark_pdf)} rows ({dt:.1f}s) [no oracle]")
            n_pass += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        sn, sc, sh = canon_table(spark_pdf)
        on_, oc, oh = canon_table(oracle_pdf)
        if sn != on_:
            print(f"FAIL {name}: rows {sn} vs {on_} ({dt:.1f}s)")
            n_fail += 1
        elif sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            n_fail += 1
        elif sh != oh:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            _debug_mismatch(name, spark_pdf, oracle_pdf)
            n_fail += 1
        else:
            print(f"PASS {name}: {sn} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


def _debug_mismatch(name, spark_pdf, oracle_pdf, limit=3):
    cols = sorted(spark_pdf.columns)
    s_rows = sorted(
        tuple(canon_value(r[c]) for c in cols) for _, r in spark_pdf[cols].iterrows()
    )
    o_rows = sorted(
        tuple(canon_value(r[c]) for c in cols) for _, r in oracle_pdf[cols].iterrows()
    )
    s_only = [r for r in s_rows if r not in set(o_rows)][:limit]
    o_only = [r for r in o_rows if r not in set(s_rows)][:limit]
    for r in s_only:
        print(f"    spark-only:  {r}")
    for r in o_only:
        print(f"    oracle-only: {r}")


if __name__ == "__main__":
    sys.exit(main())
