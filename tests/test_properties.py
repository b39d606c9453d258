"""Property-based tests (hypothesis) for the semantics most prone to
off-by-one/encoding drift: take-slicing vs Python list slicing, boolean
algebra vs Python eval, and graph identity/serialization invariants.

Spark-backed properties keep ``max_examples`` small (each example is a
real job); the pure-graph properties run at full default rates."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from krnel_graph_spark.plans.op_spec import deserialize_graph, serialize_graph

# ---------------------------- pure graph ------------------------------- #

_words = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=8),
    min_size=1,
    max_size=8,
)


@given(words=_words)
def test_uuid_deterministic_and_content_sensitive(words):
    from krnel_graph_spark.operators.dataset_ops import LoadInlineJsonDatasetOp

    a = LoadInlineJsonDatasetOp(data={"w": words}, content_hash="h")
    b = LoadInlineJsonDatasetOp(data={"w": list(words)}, content_hash="h")
    assert a.uuid == b.uuid
    c = LoadInlineJsonDatasetOp(data={"w": words + ["extra"]}, content_hash="h")
    assert c.uuid != a.uuid


@given(
    words=_words,
    true_vals=st.sets(st.sampled_from(["a", "b", "c", "d"]), min_size=1),
    offset=st.integers(0, 5),
    skip=st.integers(1, 4),
)
def test_graph_roundtrip_preserves_uuids(words, true_vals, offset, skip):
    from krnel_graph_spark.operators.dataset_ops import LoadInlineJsonDatasetOp

    ds = LoadInlineJsonDatasetOp(data={"w": words}, content_hash="h")
    graph = ds.take(10, skip=skip, offset=offset).mask_rows(
        ds.col_categorical("w").is_in(true_vals)
    )
    blob = serialize_graph([graph])
    [back] = deserialize_graph(blob)
    assert back.uuid == graph.uuid
    assert [d.uuid for d in back.get_dependencies(recursive=True)] == [
        d.uuid for d in graph.get_dependencies(recursive=True)
    ]


# --------------------------- spark-backed ------------------------------ #

_spark_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_spark_settings
@given(
    n=st.integers(0, 40),
    num=st.one_of(st.none(), st.integers(0, 20)),
    skip=st.integers(1, 5),
    offset=st.integers(0, 8),
)
def test_take_rows_matches_python_slicing(lazy_runner, n, num, skip, offset):
    ds = lazy_runner.from_inline_dataset({"v": list(range(n))})
    out = lazy_runner.to_pandas(ds.take(num, skip=skip, offset=offset))
    expect = list(range(n))[offset::skip]
    if num is not None:
        expect = expect[:num]
    assert out["v"].tolist() == expect


@_spark_settings
@given(
    labels=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=12),
    s1=st.sets(st.sampled_from(["x", "y", "z"]), min_size=1),
    s2=st.sets(st.sampled_from(["x", "y", "z"]), min_size=1),
)
def test_boolean_algebra_matches_python(lazy_runner, labels, s1, s2):
    ds = lazy_runner.from_inline_dataset({"lab": labels})
    col = ds.col_categorical("lab")
    op = (col.is_in(s1) & ~col.is_in(s2)) ^ col.is_in(s2)
    got = lazy_runner.to_pandas(op)["value"].tolist()
    expect = [((l in s1) and not (l in s2)) != (l in s2) for l in labels]
    assert got == expect


# ----------------- chunking / packing (pure reference math) ------------- #


@given(
    n_tokens=st.integers(0, 500),
    chunk_size=st.integers(2, 64),
    overlap_frac=st.floats(0.0, 0.9),
)
def test_chunk_count_formula_covers_every_token(n_tokens, chunk_size, overlap_frac):
    """The chunk-count formula used by chunk_documents (and mirrored in its
    DuckDB oracle) must tile every token with starts every `stride`: last
    chunk reaches the end, no start is past the end, consecutive chunks
    overlap by exactly `overlap` until the tail."""
    overlap = min(int(chunk_size * overlap_frac), chunk_size - 1)
    stride = chunk_size - overlap
    if n_tokens == 0:
        return
    n_chunks = 1 if n_tokens <= chunk_size else -((n_tokens - overlap) // -stride)
    starts = [c * stride for c in range(n_chunks)]
    assert starts[0] == 0
    assert all(s < n_tokens for s in starts)
    # full coverage: the last chunk's window reaches the final token
    assert starts[-1] + chunk_size >= n_tokens
    # minimality: dropping the last chunk loses tokens (when > 1 chunk)
    if n_chunks > 1:
        assert starts[-2] + chunk_size < n_tokens


@given(
    lens=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    budget=st.integers(1, 200),
)
def test_offset_packing_invariants(lens, budget):
    """sequence_pack's offset formulation: pack ids are nondecreasing in
    layout order, start at 0, only skip ids across docs that span whole
    budgets themselves, and each pack's token total stays under budget +
    the straddling doc's length (the documented overflow)."""
    before = 0
    packs = {}
    prev_pid = 0
    prev_len = 0
    for n in lens:
        pid = before // budget
        assert pid >= prev_pid  # nondecreasing in layout order
        # an id gap is only created by the PREVIOUS doc spanning budgets
        assert pid - prev_pid <= prev_len // budget + 1
        packs.setdefault(pid, []).append(n)
        before += n
        prev_pid, prev_len = pid, n
    assert sorted(packs)[0] == 0
    for members in packs.values():
        assert sum(members) < budget + max(members)


# ------------------- r5 operator invariants (Spark-backed) -------------- #


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    bins=st.integers(1, 12),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_histogram_partitions_all_rows(spark, vals, bins):
    """Every non-null row lands in exactly one bin (clamping included) and
    bin edges tile [lo, hi)."""
    from krnel_graph_spark.functions.sketches import histogram_fixed

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = histogram_fixed(df, "x", -10.0, 10.0, bins).collect()
    assert len(out) == bins
    assert sum(r["n"] for r in out) == len(vals)
    los = sorted(r["lo"] for r in out)
    assert los[0] == -10.0 and max(r["hi"] for r in out) == 10.0


@given(
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.integers(1, 9),
        min_size=1,
        max_size=3,
    ),
    n_rows=st.integers(30, 120),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_mix_respects_availability(spark, weights, n_rows):
    """mix_to_weights never emits more rows per stratum than exist, never
    emits unlisted strata, and is downsampling-only."""
    from krnel_graph_spark.functions.sampling import mix_to_weights

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = mix_to_weights(df, "src", weights, "id").collect()
    from collections import Counter

    per = Counter(r["src"] for r in out)
    avail = Counter(s for _, s in rows)
    assert set(per) <= set(weights)
    for s, n in per.items():
        assert n <= avail[s]


@given(
    keys=st.sets(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=12),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_bloom_never_false_negative(spark, keys):
    from krnel_graph_spark.functions.dedup import bloom_might_contain, build_bloom

    df = spark.createDataFrame([(k,) for k in keys], "v string")
    bloom = build_bloom(df, "v", bits_per_key=10)
    hits = {
        r["v"]
        for r in df.filter(bloom_might_contain(bloom, "v")).collect()
    }
    assert hits == set(keys)


# ---------------------------- codecs ----------------------------------- #


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(h, w, ch, seed):
    import numpy as np

    from krnel_graph_spark.functions.codecs import decode_png, encode_png

    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.randint(0, 256, size=shape).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@given(
    n=st.integers(0, 200),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    import numpy as np

    from krnel_graph_spark.functions.codecs import decode_wav, encode_wav

    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32767, size=(n, ch)).astype(np.int16)
    got_rate, got = decode_wav(encode_wav(s, rate))
    assert got_rate == rate and np.array_equal(got, s)


@given(vals=st.lists(st.integers(-(2**62), 2**62), max_size=30))
@settings(max_examples=200)
def test_avro_varint_involution(vals):
    from krnel_graph_spark.sources.avro import _Reader, _encode_long

    data = b"".join(_encode_long(v) for v in vals)
    r = _Reader(data)
    assert [r.long() for _ in vals] == vals and r.pos == len(data)


_avro_record = st.fixed_dictionaries(
    {
        "l": st.one_of(st.none(), st.integers(-(2**62), 2**62)),
        "s": st.one_of(st.none(), st.text(max_size=12)),
        "d": st.floats(allow_nan=False, width=64),
        "b": st.binary(max_size=8),
        "arr": st.lists(st.integers(-1000, 1000), max_size=5),
    }
)


@given(
    records=st.lists(_avro_record, max_size=12),
    codec=st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=80, deadline=None)
def test_avro_container_roundtrip_property(records, codec):
    from krnel_graph_spark.sources.avro import decode_container, encode_container

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "l", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
        ],
    }
    out_schema, out = decode_container(encode_container(schema, records, codec))
    assert out_schema == schema
    assert out == records


@given(
    n=st.integers(1, 6),
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_property(n, h, w, seed):
    import numpy as np

    from krnel_graph_spark.functions.codecs import decode_y4m, encode_y4m

    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=(n, h, w)).astype(np.uint8)
    fps, out = decode_y4m(encode_y4m(frames, fps=(30000, 1001)))
    assert fps == (30000, 1001) and np.array_equal(out, frames)


# A tiny vocabulary makes window collisions common, so every run
# exercises canonical-keep + excision, not just the no-dup path.
_corpus = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=14
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@_spark_settings
@given(texts=_corpus)
def test_remove_dup_windows_invariants(spark, texts):
    """Against a pure-Python oracle: same tiling, same canonical rule,
    same span coverage — plus the structural invariants (kept <= total,
    canonical windows survive, unique docs untouched)."""
    import hashlib

    from krnel_graph_spark.functions.dedup import remove_duplicated_windows

    width, stride = 4, 2
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in remove_duplicated_windows(
            df, "text", "doc_id", width=width, stride=stride
        ).collect()
    }

    toks = {
        i: " ".join(t.split()).split(" ") if t.strip() else []
        for i, t in docs
    }
    occ = []  # (hash, doc, start)
    for i, tk in toks.items():
        if not tk:
            continue
        n = len(tk)
        starts = [0] if n <= width else [
            s * stride for s in range((n - width) // stride + 1)
        ]
        for s in starts:
            h = hashlib.md5(
                " ".join(tk[s : s + width]).encode()
            ).hexdigest()
            occ.append((h, i, s))
    from collections import Counter, defaultdict

    tot = Counter(h for h, _, _ in occ)
    canon = {}
    for h, d, s in sorted(occ, key=lambda x: (x[0], x[1], x[2])):
        canon.setdefault(h, (d, s))
    spans = defaultdict(list)
    for h, d, s in occ:
        if tot[h] > 1 and canon[h] != (d, s):
            spans[d].append(s)
    for i, tk in toks.items():
        if not tk:
            assert i not in got
            continue
        kept = [
            t
            for j, t in enumerate(tk)
            if not any(s <= j < s + width for s in spans[i])
        ]
        assert got[i]["n_tokens"] == len(tk), i
        assert got[i]["n_kept"] == len(kept), i
        assert got[i]["clean_text"] == " ".join(kept), i
        assert got[i]["n_kept"] <= got[i]["n_tokens"]


@_spark_settings
@given(texts=_corpus)
def test_cdc_chunk_dedup_matches_python_oracle(spark, texts):
    """cdc_chunk_dedup vs a pure-Python re-derivation: same normalize,
    same rolling-digest cut rule, same chunk digests, same corpus-wide
    dup accounting. A modulus of 2 makes boundaries common even on the
    tiny corpus, so the multi-chunk path is exercised every run."""
    import hashlib
    from collections import Counter

    from krnel_graph_spark.functions.dedup import cdc_chunk_dedup

    window, modulus = 2, 2
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in cdc_chunk_dedup(
            df, "text", "doc_id", window=window, modulus=modulus
        ).collect()
    }

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = {
        i: (" ".join(t.lower().split()).split(" ") if t.strip() else [])
        for i, t in docs
    }
    chunks = []  # (doc, digest, n_tok)
    for i, tk in toks.items():
        n = len(tk)
        bnd = [
            p
            for p in range(window, n + 1)
            if md5_long(" ".join(tk[p - window : p])) % modulus == 0
        ]
        for a, b in zip([1] + [x + 1 for x in bnd], bnd + [n]):
            if b >= a:
                chunks.append((i, md5_long(" ".join(tk[a - 1 : b])), b - a + 1))
    cnt = Counter(d for _, d, _ in chunks)
    for i, tk in toks.items():
        mine = [(d, t) for doc, d, t in chunks if doc == i]
        n_dup = sum(1 for d, _ in mine if cnt[d] > 1)
        n_tok = sum(t for _, t in mine)
        dup_tok = sum(t for d, t in mine if cnt[d] > 1)
        assert got[i]["n_chunks"] == len(mine), i
        assert got[i]["n_dup_chunks"] == n_dup, i
        assert got[i]["n_tokens"] == n_tok == len(tk), i
        expect_frac = round(dup_tok / n_tok, 6) if n_tok else 0.0
        assert got[i]["dup_token_fraction"] == expect_frac, i


@_spark_settings
@given(texts=_corpus)
def test_span_corruption_matches_python_oracle(spark, texts):
    """span_corruption vs a pure-Python re-derivation of the chunked
    layout (mean_span=2, density=0.5 -> chunk=4: boundaries and tail
    chunks are common even on the tiny corpus), plus the structural
    invariants: exact per-chunk span count, non-overlap, containment."""
    import hashlib

    from krnel_graph_spark.functions.curation import span_corruption

    mean_span, chunk, seed = 2, 4, 3
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        map(
            tuple,
            span_corruption(
                df, "text", "doc_id",
                noise_density=0.5, mean_span=mean_span, seed=seed,
            ).collect(),
        )
    )

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expect = []
    for doc_id, t in enumerate(texts):
        toks = " ".join((t or "").lower().split()).split(" ")
        n = 0 if toks == [""] else len(toks)
        n_chunks, tail = n // chunk, n % chunk
        total = n_chunks + (1 if tail >= mean_span else 0)
        for c in range(total):
            slots = (
                chunk - mean_span + 1 if c < n_chunks else tail - mean_span + 1
            )
            off = md5_long(f"{seed}:{doc_id}:{c}") % slots
            expect.append((doc_id, c, c * chunk + off, mean_span))
    assert got == sorted(expect)
    # structural invariants on the engine output
    by_doc: dict = {}
    for d, _, s0, ln in got:
        by_doc.setdefault(d, []).append((s0, ln))
    for d, spans in by_doc.items():
        toks = " ".join((texts[d] or "").lower().split()).split(" ")
        n = 0 if toks == [""] else len(toks)
        seen: set = set()
        for s0, ln in spans:
            span = set(range(s0, s0 + ln))
            assert max(span) < n
            assert not span & seen
            seen |= span


@_spark_settings
@given(texts=_corpus)
def test_winnow_fingerprints_matches_python_oracle(spark, texts):
    """winnow_fingerprints vs a pure-Python re-derivation: identical
    gram hashing, identical rightmost-window-min selection (k=2, w=2
    so grams/windows are common on the tiny corpus), plus the
    winnowing-density invariant (#selected <= #windows)."""
    import hashlib

    from krnel_graph_spark.functions.dedup import winnow_fingerprints

    k, w = 2, 2
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        map(
            tuple,
            winnow_fingerprints(df, "text", "doc_id", k=k, w=w).collect(),
        )
    )

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expect = set()
    for doc_id, t in enumerate(texts):
        toks = " ".join((t or "").lower().split()).split(" ")
        if toks == [""]:
            toks = []
        grams = [
            md5_long(" ".join(toks[i : i + k]))
            for i in range(len(toks) - k + 1)
        ]
        ng = len(grams)
        if ng == 0:
            continue
        n_win = ng - w + 1 if ng >= w else 1
        for j in range(n_win):
            win = grams[j : j + min(w, ng)]
            minv = min(win)
            # rightmost occurrence of the window min
            off = len(win) - 1 - win[::-1].index(minv)
            expect.add((doc_id, j + off, grams[j + off]))
        assert sum(1 for d, _, _ in expect if d == doc_id) <= n_win
    assert got == sorted(expect)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    ),
    order=st.integers(2, 5),
    modified=st.booleans(),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_generic_kn_matches_python_reference_property(
    spark, docs, order, modified
):
    """Random tiny corpora × random order × fixed/modified discount:
    the full train → ARPA rows → arpa_score path reproduces the
    independent Python Kneser-Ney references (the test_ngram_lm pins,
    hypothesis-driven — degenerate corpora included: empty docs,
    all-identical docs, docs shorter than the order)."""
    import pytest as _pytest

    from test_ngram_lm import _PyKN, _PyMKN

    from krnel_graph_spark.functions.arpa import arpa_score
    from krnel_graph_spark.functions.ngram_lm import (
        kneser_ney_ngram_arpa_rows,
        kneser_ney_ngram_train,
    )

    texts = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    lm = kneser_ney_ngram_train(df, "text", order=order)
    try:
        rows = kneser_ney_ngram_arpa_rows(
            lm, discount="modified" if modified else 0.75
        )
        cls = _PyMKN if modified else _PyKN
        ref = cls([t for t in docs if t], order)
        got = {
            r.doc_id: (r.n_tokens, r.logprob_sum)
            for r in arpa_score(rows, df, "text", "doc_id").collect()
        }
        for i, t in enumerate(docs):
            if not t:
                assert i not in got
                continue
            assert got[i][0] == len(t)
            want = ref.doc(t)
            assert got[i][1] == _pytest.approx(
                want, abs=1e-4 * len(t)
            ), (t, order, modified)
    finally:
        for key in lm:
            if key.startswith("_pinned"):
                lm[key].unpersist()
