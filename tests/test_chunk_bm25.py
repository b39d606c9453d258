"""Differential tests for ``chunk_documents`` and ``bm25_search`` against
independent pure-Python reimplementations over random + adversarial corpora
(blank docs, single-token docs, docs exactly at / one-off the chunk
boundary, repeated-term docs).

The gate checks both ops against DuckDB SQL oracles at sf0.01; these tests
pin the semantics on hand-built corpora where every edge case is present by
construction, and check invariants (coverage, overlap, monotonicity) that a
hash comparison can't express.
"""

from __future__ import annotations

import math
import random
import re

import pytest

from krnel_graph_spark.functions import text as tx

_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _tokens(s: str) -> list[str]:
    t = _WS_RE.sub(" ", s.lower()).strip()
    return [] if t == "" else t.split(" ")


def _ref_chunks(docs, chunk_size, overlap):
    stride = chunk_size - overlap
    out = []
    for doc_id, text in docs:
        toks = _tokens(text)
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 if n <= chunk_size else -((n - overlap) // -stride)
        for c in range(n_chunks):
            w = toks[c * stride : c * stride + chunk_size]
            out.append((doc_id, c, len(w), " ".join(w)))
    return sorted(out)


def _ref_bm25(docs, query, k1=1.2, b=0.75, k=20):
    terms = sorted(set(_tokens(query)))
    lens = {d: len(_tokens(t)) for d, t in docs if _tokens(t)}
    n_docs = len(lens)
    avgdl = sum(lens.values()) / n_docs
    tf: dict[tuple[int, str], int] = {}
    for d, t in docs:
        for w in _tokens(t):
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {t: sum(1 for (_, w) in tf if w == t) for t in terms}
    scores: dict[int, float] = {}
    for (d, t), f in tf.items():
        idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        part = idf * (f * (k1 + 1) / (f + k1 * (1 - b + b * lens[d] / avgdl)))
        scores[d] = scores.get(d, 0.0) + part
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, round(s, 6)) for d, s in ranked]


WORDS = "spark hash join scan merge the a of fast slow table row batch".split()


def _corpus(seed=7, n=300):
    rng = random.Random(seed)
    docs = [
        (0, ""),
        (1, "   \t\n  "),
        (2, "solo"),
        (3, " ".join(WORDS[:4]) * 1),
        # exactly chunk_size, one over, one under (chunk_size=8 below)
        (4, " ".join(rng.choices(WORDS, k=8))),
        (5, " ".join(rng.choices(WORDS, k=9))),
        (6, " ".join(rng.choices(WORDS, k=7))),
        (7, "hash " * 50),  # pathological repetition
    ]
    for i in range(8, n):
        docs.append((i, " ".join(rng.choices(WORDS, k=rng.randint(0, 40)))))
    return docs


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_corpus(), "doc_id long, text string")


def test_chunk_documents_differential(spark, docs_df):
    got = sorted(
        tuple(r)
        for r in tx.chunk_documents(
            docs_df, "text", "doc_id", chunk_size=8, overlap=3
        ).collect()
    )
    assert got == _ref_chunks(_corpus(), 8, 3)


def test_chunk_documents_invariants(spark, docs_df):
    rows = tx.chunk_documents(
        docs_df, "text", "doc_id", chunk_size=8, overlap=3
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    toks_by_doc = {d: _tokens(t) for d, t in _corpus()}
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        # chunk ids dense from 0; every chunk non-empty and <= chunk_size
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert all(1 <= c.n_tokens <= 8 for c in chunks)
        # consecutive chunks overlap by exactly `overlap` tokens (until tail)
        for a, nxt in zip(chunks, chunks[1:]):
            assert a.chunk_text.split(" ")[5:] == nxt.chunk_text.split(" ")[:3]
        # concatenating de-overlapped chunks reconstructs the document
        recon = chunks[0].chunk_text.split(" ")
        for c in chunks[1:]:
            recon += c.chunk_text.split(" ")[3:]
        assert recon == toks_by_doc[d]
    # blank docs chunk to nothing
    assert 0 not in by_doc and 1 not in by_doc


def test_bm25_differential(spark, docs_df):
    got = [
        (r.doc_id, r.score)
        for r in tx.bm25_search(
            docs_df, "text", "doc_id", "spark hash join", k=20
        ).collect()
    ]
    ref = _ref_bm25(_corpus(), "spark hash join", k=20)
    assert [d for d, _ in got] == [d for d, _ in ref]
    for (_, a), (_, e) in zip(got, ref):
        assert a == pytest.approx(e, abs=2e-6)


def test_bm25_repetition_saturates(spark, docs_df):
    """tf saturation: the 50x'hash' doc must not dominate a doc matching
    all three query terms — BM25's k1 bounds the per-term contribution."""
    got = tx.bm25_search(docs_df, "text", "doc_id", "spark hash join", k=300)
    scores = {r.doc_id: r.score for r in got.collect()}
    assert scores[7] < max(scores.values())


def _ref_tfidf(docs, vocab_size, normalize=False):
    from collections import Counter

    tok = {d: _tokens(t) for d, t in docs}
    n_docs = sum(1 for t in tok.values() if t)
    dfc = Counter()
    for toks in tok.values():
        dfc.update(set(toks))
    vocab = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    out = {}
    for d, toks in tok.items():
        tfc = Counter(toks)
        row = {
            t: tfc[t] * (math.log((n_docs + 1.0) / (dfv + 1.0)) + 1.0)
            for t, dfv in vocab
            if tfc[t]
        }
        if normalize and row:
            nrm = math.sqrt(sum(w * w for w in row.values()))
            row = {t: w / nrm for t, w in row.items()}
        for t, w in row.items():
            out[(d, t)] = round(w, 6)
    return out


@pytest.mark.parametrize("normalize", [False, True])
def test_tfidf_differential(spark, docs_df, normalize):
    got = {
        (r.doc_id, r.term): r.tfidf
        for r in tx.tfidf(
            docs_df, "text", "doc_id", vocab_size=6, normalize=normalize
        ).collect()
    }
    ref = _ref_tfidf(_corpus(), 6, normalize)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=2e-6)
    if normalize:
        by_doc: dict[int, float] = {}
        for (d, _), w in got.items():
            by_doc[d] = by_doc.get(d, 0.0) + w * w
        for d, ss in by_doc.items():
            assert ss == pytest.approx(1.0, abs=1e-4)


def test_tokenize_ids_differential(spark, docs_df):
    from collections import Counter

    got = sorted(
        (r.doc_id, r.pos, r.token_id)
        for r in tx.tokenize_ids(docs_df, "text", "doc_id", vocab_size=5).collect()
    )
    # reference: top-5 terms by (tf desc, term asc), ids 1..5, OOV -> 0
    tfc = Counter()
    for _, t in _corpus():
        tfc.update(_tokens(t))
    vocab = {
        t: i + 1
        for i, (t, _) in enumerate(
            sorted(tfc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        )
    }
    ref = sorted(
        (d, p, vocab.get(tok, 0))
        for d, t in _corpus()
        for p, tok in enumerate(_tokens(t))
    )
    assert got == ref
    # round-trip property: id sequences preserve document length
    lens = Counter(d for d, _, _ in got)
    for d, t in _corpus():
        assert lens[d] == len(_tokens(t))


# --------------------------------------------------------------------- #
# bm25_search_many                                                        #
# --------------------------------------------------------------------- #


def test_bm25_many_matches_single(spark):
    """Per-query results of the batch op equal the single-query op."""
    from krnel_graph_spark.functions.text import bm25_search, bm25_search_many

    docs = spark.createDataFrame(
        [
            (1, "spark hash join tuning"),
            (2, "hash tables and hash maps"),
            (3, "broadcast join hints in spark"),
            (4, "completely unrelated prose"),
            (5, "spark spark spark hash"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [("a", "spark hash"), ("b", "broadcast join")],
        "query_id string, query_text string",
    )
    many = bm25_search_many(docs, "text", "doc_id", queries, k=3)
    got = {
        (r["query_id"], r["doc_id"]): r["score"] for r in many.collect()
    }
    for qid, qtext in [("a", "spark hash"), ("b", "broadcast join")]:
        single = bm25_search(docs, "text", "doc_id", qtext, k=3)
        for r in single.collect():
            assert got[(qid, r["doc_id"])] == r["score"], (qid, r["doc_id"])
    # every query got results, capped at k
    from collections import Counter

    per_q = Counter(q for q, _ in got)
    assert set(per_q) == {"a", "b"} and all(v <= 3 for v in per_q.values())


def test_cli_profile(spark, capsys):
    import json

    from krnel_graph_spark.cli import main

    rc = main(
        [
            "profile",
            "/root/testdata/sf0.001/nation.parquet",
            "--cols",
            "n_nationkey,n_name",
            "--exact",
        ]
    )
    assert rc == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    byc = {r["column"]: r for r in rows}
    assert byc["n_nationkey"]["n_distinct"] == byc["n_nationkey"]["n_rows"]
    assert byc["n_name"]["min_num"] is None


def test_build_vocab_size_guard(spark, docs_df):
    """vocab_size is the only unbounded knob on build_vocab's
    single-partition rank window — past 5M it raises (r7 guard)."""
    import pytest

    with pytest.raises(ValueError, match="5M bound"):
        tx.build_vocab(docs_df, "text", "doc_id", vocab_size=6_000_000)
