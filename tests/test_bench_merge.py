"""Pin the bench floor protocol (bench.min_merge).

The r9 and r10 rounds both lost their headline bench artifact to a loaded
end-of-round run overwriting the committed floor file raw. bench.py now
writes the raw run to BENCH_run.json and min-merges into BENCH_local.json
itself; these tests pin the merge invariants that make that structural.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import min_merge  # noqa: E402


def _payload(queries, canary=0.2, metric="headline_queries_total", sf=0.1):
    return {
        "metric": metric,
        "value": round(sum(v for v in queries.values() if v > 0), 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(queries),
        "canary_sec": canary,
        "canary_series": [canary, canary * 2],
        "queries": dict(queries),
    }


def test_loaded_run_cannot_inflate_floor():
    floor = _payload({"a": 1.0, "b": 2.0}, canary=0.2)
    loaded = _payload({"a": 10.0, "b": 40.0}, canary=0.9)
    merged = min_merge(floor, loaded)
    assert merged["queries"] == {"a": 1.0, "b": 2.0}
    assert merged["value"] == 3.0
    assert merged["canary_sec"] == 0.2


def test_faster_run_improves_floor_elementwise():
    floor = _payload({"a": 1.0, "b": 2.0}, canary=0.2)
    run = _payload({"a": 0.5, "b": 3.0}, canary=0.15)
    merged = min_merge(floor, run)
    assert merged["queries"] == {"a": 0.5, "b": 2.0}
    assert merged["value"] == 2.5
    assert merged["canary_sec"] == 0.15


def test_new_query_joins_at_raw_time_and_errors_never_enter():
    floor = _payload({"a": 1.0})
    run = _payload({"a": 1.2, "new_op": 4.0, "broken": -1.0})
    merged = min_merge(floor, run)
    assert merged["queries"] == {"a": 1.0, "new_op": 4.0}
    assert merged["n_queries"] == 2


def test_no_floor_or_mismatched_floor_is_replaced():
    run = _payload({"a": 1.0, "bad": -1.0})
    merged = min_merge(None, run)
    assert merged["queries"] == {"a": 1.0}

    other_sf = _payload({"a": 0.1}, sf=0.01)
    merged = min_merge(other_sf, run)
    assert merged["queries"] == {"a": 1.0}

    sweep = _payload({"a": 0.1}, metric="full_sweep_total")
    merged = min_merge(sweep, run)
    assert merged["queries"] == {"a": 1.0}


def test_canary_series_never_carried_into_floor():
    floor = _payload({"a": 1.0})
    floor.pop("canary_series")
    run = _payload({"a": 2.0})
    merged = min_merge(floor, run)
    assert "canary_series" not in merged


def test_merge_is_idempotent():
    floor = _payload({"a": 1.0, "b": 2.0}, canary=0.2)
    run = _payload({"a": 0.5, "c": 3.0}, canary=0.3)
    once = min_merge(floor, run)
    twice = min_merge(once, run)
    assert once == twice


def test_reset_drops_floor_entry_so_run_refloors():
    # bench.py main() pops reset names from the floor before merging —
    # simulate that protocol: a deliberately-changed query re-floors at
    # its new raw time instead of keeping the unreachable old floor.
    floor = _payload({"changed_op": 0.5, "other": 1.0})
    run = _payload({"changed_op": 2.0, "other": 1.0})
    floor["queries"].pop("changed_op")  # the --reset path
    merged = min_merge(floor, run)
    assert merged["queries"]["changed_op"] == 2.0
    assert merged["queries"]["other"] == 1.0
