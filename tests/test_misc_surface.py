"""Pin the public functions no gate query routes through directly:
``simhash_pairs``, ``attach_media_metadata``, ``hyperplane_signature``,
and the ``permute_sql`` DuckDB twin of ``hashing.permute``.
"""

from __future__ import annotations

import duckdb
import numpy as np
from pyspark.sql import functions as F


def test_simhash_pairs_finds_dups_and_verifies_hamming(spark):
    from krnel_graph_spark.functions.dedup import simhash, simhash_pairs

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "with plenty of additional filler words to stabilize the bits"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup -> hamming 0
        (3, "completely different content about adaptive query execution"),
        (4, base + " edit"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(df, "text", "doc_id", max_hamming=3).collect()
    }
    sigs = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", simhash("text").alias("s")).collect()
    }
    assert got[(1, 2)] == 0
    for (a, b), h in got.items():
        assert h <= 3
        assert h == bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
    assert not any(3 in pair for pair in got)


def test_attach_media_metadata_contract(spark):
    from krnel_graph_spark.functions.multimodal import attach_media_metadata

    import hashlib
    import zlib

    payload = b"\x89PNG\r\n\x1a\nxxxx"
    df = spark.createDataFrame(
        [(1, payload), (2, b"RIFFxxxxWAVE")], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in attach_media_metadata(df, "payload", "doc_id").collect()
    }
    assert got[1]["byte_len"] == len(payload)
    assert got[1]["crc32"] == zlib.crc32(payload)
    assert got[1]["sha256"] == hashlib.sha256(payload).hexdigest()
    assert got[2]["byte_len"] == 12


def test_hyperplane_signature_matches_numpy(spark):
    from krnel_graph_spark.functions.similarity import random_hyperplanes
    from krnel_graph_spark.functions.vector import hyperplane_signature

    planes = random_hyperplanes(6, n_planes=8, seed=3)
    rng = np.random.default_rng(0)
    vecs = [rng.normal(0, 1, 6).tolist() for _ in range(20)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    got = {
        r["id"]: r["b"]
        for r in df.select(
            "id", hyperplane_signature("v", planes).alias("b")
        ).collect()
    }
    pm = np.asarray(planes)
    for i, v in enumerate(vecs):
        bits = (np.asarray(v) @ pm.T >= 0).astype(int)
        exp = int((bits * (1 << np.arange(len(planes)))).sum())
        assert got[i] == exp, i


def test_permute_sql_matches_spark_permute(spark):
    from krnel_graph_spark.functions.hashing import permute, permute_sql

    vals = [0, 1, 17, 123456789, 2**59]
    df = spark.createDataFrame([(v,) for v in vals], "h long")
    for i in (0, 3, 7):
        got = {
            r["h"]: r["p"]
            for r in df.select("h", permute(F.col("h"), i).alias("p")).collect()
        }
        for v in vals:
            [(e,)] = duckdb.sql(
                f"SELECT {permute_sql(f'{v}::BIGINT', i)}"
            ).fetchall()
            assert got[v] == e, (v, i)


def test_driver_window_hygiene():
    """The driver records hash evidence only for the first 50 queries()
    entries (the _R10_WINDOW reorder). The window is 50 hand-ordered
    strings — pin its invariants so a rotation typo can't silently
    waste recording slots: exactly 50 unique names, every one resolves
    to a real query, queries() actually leads with them in order, and
    none is rows-only (a windowed query without an oracle burns a
    hash-graded slot on a weaker rows check) unless explicitly listed
    as an intentional rows-only re-record."""
    import __spark_entry__ as em

    window = em._R14_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50, "duplicate window entries"
    q = em.queries()
    assert list(q)[:50] == window, "queries() head order drifted"
    oracles = em.oracle_sql()
    # r13: every windowed entry is oracle-backed (rows-only has been
    # zero since r12).
    intentional_rows_only: set[str] = set()
    burned = [n for n in window if n not in oracles] 
    assert set(burned) <= intentional_rows_only, (
        f"rows-only entries burning hash slots: {burned}"
    )
