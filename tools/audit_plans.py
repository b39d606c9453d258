"""Plan-quality audit over every __spark_entry__ query.

For each query's executed plan, report: number of Exchange (shuffle)
operators, broadcast vs sort-merge joins, whether filters reached the scan
(PushedFilters), and scan column pruning (ReadSchema width). A query is
flagged when it shuffles more than expected or reads columns it doesn't
need — the signals that matter at 100 TB.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from krnel_graph_spark.runners.spark_runner import get_spark  # noqa: E402


def read_schema_widths(plan: str) -> list[int]:
    """Top-level field count of every ``ReadSchema: struct<...>`` in a plan
    string — the column-pruning audit signal.

    The naive ``struct<([^>]*)>`` regex is wrong twice: nested types
    (``array<int>``, inner structs) contain ``>`` so it stops early, and
    Spark TRUNCATES plan metadata at ``spark.sql.maxMetadataStringLength``
    chars — a truncated schema has no closing ``>`` on its line, so
    ``[^>]*`` swallowed following PLAN LINES up to the next ``>`` and
    counted their commas as columns (PLANS.md reported a 19-column scan
    for a perfectly pruned 5-column lineitem read). Parse per line,
    counting commas only at angle-bracket depth 0, and honor Spark's
    ``... N more fields`` truncation marker.
    """
    widths = []
    for line in plan.splitlines():
        m = re.search(r"ReadSchema: struct<(.*)$", line)
        if not m:
            continue
        body = m.group(1)
        more = re.search(r"\.\.\. (\d+) more fields", body)
        extra = int(more.group(1)) if more else 0
        if more:
            body = body[: more.start()]
        depth = 0
        fields = 0
        content = False
        for ch in body:
            if ch == "<":
                depth += 1
            elif ch == ">":
                if depth == 0:
                    break  # closing bracket of the ReadSchema struct
                depth -= 1
            elif ch == "," and depth == 0:
                fields += 1
            elif not ch.isspace() and depth == 0:
                content = True
        widths.append(fields + (1 if content else 0) + extra)
    return widths


def audit(df):
    spark = df.sparkSession
    # Spark truncates plan metadata (incl. ReadSchema) at 100 chars by
    # default; widen so schemas print whole and widths are exact.
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", None)
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    return {
        "exchanges": len(re.findall(r"\bExchange (?:hash|range|Single)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "scans": plan.count("FileScan"),
        "scan_cols": read_schema_widths(plan),
        "python_evals": plan.count("BatchEvalPython"),
        "arrow_evals": plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        # Reuse signals: cached frames / deduplicated exchanges. A plan that
        # recomputes an expensive subtree on both sides of a self-join shows
        # 0 for both (the minhash signature-persist regression mode).
        "reused_exchanges": plan.count("ReusedExchange"),
        "inmem_scans": plan.count("InMemoryTableScan"),
        "plan_chars": len(plan),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            info = audit(fn(spark, sf_dir))
        except Exception as exc:
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        flags = []
        if info["python_evals"]:
            flags.append("ROW-PYTHON-UDF")
        if info["smj"] and info["bhj"] == 0 and info["exchanges"] > 2:
            flags.append("SMJ-HEAVY")
        if info["plan_chars"] > 200_000:
            flags.append("PLAN-BLOAT")  # literal-embedding smell
        print(
            f"{name}: shuffles={info['exchanges']} bcast={info['broadcasts']} "
            f"bhj={info['bhj']} smj={info['smj']} scans={info['scans']}"
            f"{info['scan_cols']} codegen={info['codegen_spans']} "
            f"pushed={info['pushed']} arrowUDF={info['arrow_evals']} "
            f"reuse={info['reused_exchanges']}+{info['inmem_scans']} "
            f"{' '.join(flags)}"
        )


if __name__ == "__main__":
    main()
