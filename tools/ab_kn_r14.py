"""Interleaved A/B for the r14 stage-5 KN-family changes:

* ctx-shuffle fusion (ctx_N folded into the one lvl-keyed ctx
  aggregation) — toggled by SPARK_GRAFT_KN_CTX_FUSE inside
  functions/ngram_lm.py (measurement-only toggle, stripped after);
* pruned kept-set localCheckpoints — SPARK_GRAFT_KN_KEPT_CKPT.

Runs OLD (both off) and NEW (both on) alternately in ONE session (same
box state), noop sink, reports per-arm series + min. First run of each
query also proves exact multiset equality of the two forms' outputs
(exceptAll both ways == 0 rows).

Usage: python tools/ab_kn_r14.py [--runs N] [--no-verify] q1 q2 ...

OUTCOME (recorded in OPTIMIZATION_r14.md stage 5): the ctx fusion
measured neutral-to-worse and was REJECTED; the kept-set checkpoints
won and were kept unconditionally. Both env toggles were stripped from
functions/ngram_lm.py after measurement, so the OLD/NEW arms of this
harness now measure identical code — it is committed as evidence of
the methodology, not as a live tool.
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
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument(
        "--only",
        choices=["fuse", "ckpt", "both"],
        default="both",
        help="which toggle(s) the NEW arm flips on",
    )
    args = ap.parse_args()

    # r15 guard (ADVICE): the two toggles were stripped from
    # functions/ngram_lm.py after the r14 stage-5 verdicts, so OLD and
    # NEW arms now build identical plans — refuse to produce meaningless
    # A/B numbers instead of silently measuring noise.
    src = (
        Path(__file__).resolve().parent.parent
        / "krnel_graph_spark/functions/ngram_lm.py"
    ).read_text()
    if not any(t in src for t in ("SPARK_GRAFT_KN_CTX_FUSE", "SPARK_GRAFT_KN_KEPT_CKPT")):
        sys.exit(
            "ab_kn_r14: the SPARK_GRAFT_KN_CTX_FUSE/SPARK_GRAFT_KN_KEPT_CKPT "
            "toggles were stripped after r14 stage-5 — this harness is "
            "committed as methodology evidence only; both arms would build "
            "identical plans. See OPTIMIZATION_r14.md stage 5."
        )

    import __spark_entry__ as entry
    from krnel_graph_spark.runners.spark_runner import get_spark

    spark = get_spark("ab_kn_r14")
    qs = entry.queries()

    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    warm = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    warm.filter(warm.c_custkey > 0).write.format("noop").mode(
        "overwrite"
    ).save()

    def build(name: str, new: bool):
        fuse = new and args.only in ("fuse", "both")
        ckpt = new and args.only in ("ckpt", "both")
        os.environ["SPARK_GRAFT_KN_CTX_FUSE"] = "1" if fuse else "0"
        os.environ["SPARK_GRAFT_KN_KEPT_CKPT"] = "1" if ckpt else "0"
        return qs[name](spark, SF_DIR)

    def run(name: str, new: bool) -> float:
        # bench.py times make_df() INSIDE the region (the KN trainers
        # collect discount scalars at build time), so build here too.
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(
            f"ab_kn {name} {'new' if new else 'old'}"
        )
        t0 = time.time()
        build(name, new).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    for name in args.names:
        if not args.no_verify:
            spark.catalog.clearCache()
            old_df = build(name, False)
            new_df = build(name, True)
            a = old_df.exceptAll(new_df).count()
            b = new_df.exceptAll(old_df).count()
            tag = "IDENTICAL" if (a == 0 and b == 0) else "DIFFER"
            print(f"{name}: multiset equality old-vs-new: {tag} "
                  f"(old\\new={a}, new\\old={b})", flush=True)
            if tag == "DIFFER":
                continue
        olds, news = [], []
        for _ in range(args.runs):
            olds.append(run(name, False))
            news.append(run(name, True))
        print(
            f"{name}: OLD min {min(olds):.2f} "
            f"{[round(x, 2) for x in olds]} | NEW min {min(news):.2f} "
            f"{[round(x, 2) for x in news]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
