"""Compare two bench JSON artifacts (BENCH_local/BENCH_r{N}/sweep files):
common-query total ratio, canary ratio (the load-noise yardstick), and the
per-query movers beyond a threshold — the exact r6/r7-style adjudication
("is this a regression or a loaded box?") as one command.

    python tools/diff_bench.py OLD.json NEW.json [--threshold 1.4]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.4
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    old, new = (json.load(open(p)) for p in args[:2])
    qo, qn = old["queries"], new["queries"]
    common = sorted(k for k in qn if k in qo and qo[k] > 0 and qn[k] > 0)
    to = sum(qo[k] for k in common)
    tn = sum(qn[k] for k in common)
    co, cn = old.get("canary_sec"), new.get("canary_sec")
    canary_ratio = (cn / co) if co and cn else None
    movers = sorted(
        (
            {
                "query": k,
                "old_s": qo[k],
                "new_s": qn[k],
                "ratio": round(qn[k] / qo[k], 2),
            }
            for k in common
            if max(qn[k], qo[k]) > 0.4
            and (qn[k] > qo[k] * thr or qo[k] > qn[k] * thr)
        ),
        key=lambda d: -d["ratio"],
    )
    print(
        json.dumps(
            {
                "common_queries": len(common),
                "old_total_s": round(to, 1),
                "new_total_s": round(tn, 1),
                "total_ratio": round(tn / to, 3),
                "canary_old": co,
                "canary_new": cn,
                "canary_ratio": round(canary_ratio, 3) if canary_ratio else None,
                "note": (
                    "movers whose ratio tracks the canary ratio are load "
                    "noise; movers far beyond it deserve a plan diff"
                ),
                "movers": movers,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
