"""Deterministic sampling and shuffle for training-data export.

Spark's built-in ``df.sample`` / ``sampleBy`` draw from a partition-seeded
RNG: results change with partitioning, retries, and engine version — all
poison for reproducible 100-TB pipeline runs (and for oracle checks). The
operators here key every decision off the md5 of (seed, row id), so any
engine — and any re-run on any cluster layout — selects the identical rows.

Beyond-reference surface: the reference engine only has the train/test
split assigner (reference ``ops/dataset_ops.py`` AssignTrainTestSplitOp);
corpus-rate sampling, per-stratum sampling, and export shuffling are the
missing pieces a pretraining pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .hashing import md5_long

# Hash-rate denominator: rates are quantized to 1e-6 (a millionth), plenty
# for corpus sampling and exactly representable in both engines' integers.
RATE_DENOM = 1_000_000


def _rate_bucket(id_col: str, seed: int) -> Column:
    """Uniform bucket in [0, RATE_DENOM) from md5(seed:id) — deterministic
    across engines, partitionings, and retries."""
    return md5_long(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    ) % F.lit(RATE_DENOM)


def hash_sample(df: DataFrame, id_col: str, fraction: float, seed: int = 0) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its hash bucket falls
    below ``fraction``. A pure scan-side filter — no shuffle, no RNG state,
    pushes down past column pruning; re-running on different partitioning
    (or in a SQL oracle) selects the same rows."""
    threshold = int(round(fraction * RATE_DENOM))
    return df.filter(_rate_bucket(id_col, seed) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — ``sampleBy`` semantics (keep
    fraction f_s of each stratum) without its RNG nondeterminism. The
    language-balancing / domain-rebalancing primitive: downsample the
    over-represented strata of a corpus in one scan-side filter, no
    shuffle, no per-stratum jobs. Strata absent from ``fractions`` keep
    ``default_fraction`` of their rows."""
    thr = F.lit(int(round(default_fraction * RATE_DENOM)))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(int(round(frac * RATE_DENOM))),
        ).otherwise(thr)
    return df.filter(_rate_bucket(id_col, seed) < thr)


def shuffle_key(id_col: str, seed: int = 0) -> Column:
    """Deterministic per-row shuffle key: md5 of (seed, id). Sorting by it
    is a reproducible global permutation of the corpus."""
    return F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))


def shuffle_export(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    num_shards: int | None = None,
) -> DataFrame:
    """Deterministically shuffle a corpus for training export.

    Adds ``shuffle_key`` (md5 of seed:id) and, when ``num_shards`` is
    given, a balanced ``shard`` assignment, then range-partitions on the
    key and sorts within each shard — a total order across output files
    without ever funneling data through one task (range exchange + local
    sort, the same plan shape as a global ORDER BY, never a single-task
    window). Write the result with ``partitionBy("shard")`` or directly;
    file N holds keys that all sort before file N+1's."""
    key = shuffle_key(id_col, seed)
    out = df.withColumn("shuffle_key", key)
    if num_shards is not None:
        out = out.withColumn(
            "shard",
            (md5_long(F.col("shuffle_key")) % F.lit(num_shards)).cast("int"),
        )
        return out.repartition(num_shards, "shard").sortWithinPartitions("shuffle_key")
    return out.repartitionByRange(F.col("shuffle_key")).sortWithinPartitions(
        "shuffle_key"
    )


def mix_to_weights(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, int],
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Rebalance a corpus to target mixture proportions — the
    data-mixing step of a pretraining pipeline ("70% web / 20% code /
    10% books"), downsampling-only: the output is the LARGEST corpus
    achievable at the requested mix given what each stratum has.

    ``weights`` are integer parts (e.g. ``{"web": 7, "code": 2,
    "books": 1}``); strata not listed (or weighted 0) are dropped. All
    rate arithmetic is integer floor-division, so a SQL oracle (or a
    rerun on another engine) reproduces the kept-row set bit-exactly —
    no float rounding boundary anywhere.

    Scale shape: one count-per-stratum aggregation (collects #strata
    rows — the mixture spec is human-sized), then a single scan-side
    deterministic md5-bucket filter (:func:`stratified_sample`'s rule):
    no shuffle of corpus rows, no RNG state, safe under retries.

    Proportions are exact in expectation (md5 buckets are uniform);
    realized counts wobble like any Bernoulli sample — by design, so
    the filter stays a pure per-row predicate.
    """
    if not weights or all(w <= 0 for w in weights.values()):
        raise ValueError("weights must contain a positive integer part")
    if any(w < 0 or int(w) != w for w in weights.values()):
        raise ValueError(f"weights must be non-negative integers: {weights}")
    active = {s: int(w) for s, w in weights.items() if w > 0}
    w_total = sum(active.values())
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    present = {s: w for s, w in active.items() if counts.get(s, 0) > 0}
    if not present:
        return df.filter(F.lit(False))
    # Largest total T with T * w_s / w_total <= n_s for every stratum,
    # in integers: T = min_s floor(n_s * w_total / w_s).
    total = min(counts[s] * w_total // w for s, w in present.items())
    fractions = {}
    for s, w in present.items():
        # threshold in RATE_DENOM-ths, floor'd exactly
        thr = total * w * RATE_DENOM // (w_total * counts[s])
        fractions[s] = thr / RATE_DENOM
    return stratified_sample(
        df, strata_col, fractions, id_col, seed=seed, default_fraction=0.0
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Exact-``n`` weighted sampling without replacement (A-Res,
    Efraimidis–Spirakis): inclusion chance scales with ``weight_col`` —
    the quality-weighted corpus-selection primitive ("keep the best 10M
    documents, preferring high scores, but don't take a deterministic
    top-k").

    Deterministic by construction: each row's race key is
    ``ln(u) / w`` (the monotone equivalent of the classic ``u^(1/w)``)
    with ``u`` derived from ``md5(seed:id)`` — identical on any engine,
    partitioning, or retry, like every sampler in this module. The key is
    rounded to 10 decimals so both engines order the identical value;
    residual ties break on id. Rows with NULL or non-positive weight are
    excluded (they have no well-defined race key).

    Scale: no shuffle at all — ``orderBy().limit(n)`` lowers to
    ``TakeOrderedAndProject`` (a per-partition top-``n`` heap, driver
    merge of n·partitions rows). The reservoir never materializes.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    h = md5_long(
        F.concat_ws(
            ":", F.lit(str(seed)), F.col(id_col).cast("string")
        )
    )
    # md5_long is 60 bits -> u in (0, 1]; +1 keeps ln() off -inf.
    # Integer-add THEN convert, mirroring the oracle's double(h + 1) so
    # both engines run the identical op sequence (ulp-exact for h near
    # 2^53; ADVICE r5).
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 10)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__wskey", key)
        .orderBy(F.col("__wskey").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__wskey")
    )


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    tau: float = 3.0,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based mixture rebalancing — the multilingual-corpus
    sampling rule (mT5/XLM-R style): target proportions follow
    ``p_s ∝ n_s^(1/tau)``, flattening the head so low-resource strata
    are not drowned out (``tau=1`` keeps natural proportions,
    ``tau → ∞`` approaches uniform). Downsampling-only, like
    :func:`mix_to_weights`: the output is the largest corpus achievable
    at the tempered mix, i.e. the stratum with the highest
    target-to-actual ratio is kept whole and every other stratum is
    hash-thinned to match.

    Determinism contract: the normalizer cancels in the keep-rate
    ratio, leaving ``rate_s = (n_s / n_ref)^(1/tau - 1)`` — a single
    ``pow`` per stratum, NO float summation anywhere, so a SQL oracle
    recomputing the same expression gets bit-identical doubles (same
    libm ``pow``). ``n_ref`` is the stratum maximizing
    ``n^(1/tau - 1)``: the smallest stratum for ``tau > 1``
    (flattening — small strata kept whole, big ones thinned) and the
    LARGEST for ``tau < 1`` (sharpening — the head kept whole, the
    tail thinned harder), so rates stay <= 1 and the downsampling-only
    contract holds for every ``tau > 0``. Rates are rounded HALF-UP to
    6 decimals driver-side (matching SQL ``round``) and applied as
    :func:`stratified_sample`'s scan-side md5-bucket filter.

    Scale shape: one count-per-stratum aggregation (human-sized result)
    + one shuffle-free scan-side filter; no corpus-sized shuffle, no
    RNG state, retry-safe.
    """
    from decimal import ROUND_HALF_UP, Decimal

    if tau <= 0:
        raise ValueError("tau must be > 0")
    alpha = 1.0 / float(tau)
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[strata_col] is not None
    }
    if not counts:
        return df.filter(F.lit(False))
    # The stratum maximizing n^(alpha-1) is kept whole: n_min when the
    # exponent is negative (tau > 1), n_max when positive (tau < 1) —
    # either way every rate lands in (0, 1].
    n_ref = min(counts.values()) if alpha <= 1.0 else max(counts.values())
    fractions = {
        s: float(
            Decimal(repr((n / n_ref) ** (alpha - 1.0))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        for s, n in counts.items()
    }
    return stratified_sample(
        df, strata_col, fractions, id_col, seed=seed, default_fraction=0.0
    )


def export_manifest(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Verifiable manifest for a sharded training-data export: one row
    per shard with ``n_rows``, ``n_bytes`` (UTF-8 of ``text_col``) and
    two order-independent content checksums — ``checksum_xor`` (bit-XOR
    of the rows' md5-derived 60-bit ids, commutative and
    overflow-free) and ``id_lo``/``id_hi`` bounds. A consumer re-runs
    the same manifest over the delivered shards and diffs: any dropped,
    duplicated, or corrupted row flips the XOR. Shard assignment is the
    same md5 key `shuffle_export` writes, so the manifest describes
    exactly the files that export produces.

    Scale shape: one scan projection (md5 + octet_length) + one
    partial-agg'd groupBy on the int shard key — the manifest is
    ``num_shards`` rows, and XOR/min/max/sum all combine map-side.
    """
    from .hashing import md5_long

    key = shuffle_key(id_col, seed)
    row_sig = md5_long(
        F.concat_ws(":", F.col("shuffle_key"), F.col(text_col).cast("string"))
    )
    keyed = df.withColumn("shuffle_key", key).withColumn(
        "shard", (md5_long(F.col("shuffle_key")) % F.lit(num_shards)).cast("int")
    )
    return (
        keyed.select(
            "shard",
            row_sig.alias("__sig"),
            F.octet_length(F.coalesce(F.col(text_col), F.lit(""))).alias(
                "__b"
            ),
            F.col(id_col).alias("__id"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__b").cast("long").alias("n_bytes"),
            F.bit_xor("__sig").cast("long").alias("checksum_xor"),
            F.min("__id").alias("id_lo"),
            F.max("__id").alias("id_hi"),
        )
    )


def data_budget(
    df: DataFrame,
    strata_col: str,
    token_col: Column,
    budget: int,
    weights: dict[str, float],
    epoch_cap: float = 4.0,
) -> DataFrame:
    """Epoch/repeat planner for a token-budgeted training run — the
    recipe table from data-constrained scaling work (Muennighoff et
    al. 2023: repeating data beyond ~4 epochs yields rapidly decaying
    returns) and the per-source mixture tables of LLaMA-style runs.

    Per stratum: available ``n_docs`` / ``n_tokens`` (exact integer
    sums), the caller's mixture ``weight`` (used as given — callers
    normalize; strata absent from ``weights`` get 0), the resulting
    ``target_tokens = round(budget · w)`` and ``epochs =
    round(target/available, 6)`` — the repeat factor the loader needs —
    plus ``over_cap`` flagging strata whose plan exceeds ``epoch_cap``
    epochs (the "you are about to repeat Wikipedia 40×" alarm).

    Determinism contract: the only aggregation is integer count/sum, so
    every downstream value is scalar arithmetic on exact integers and
    weight literals — a SQL oracle recomputing the same expressions is
    bit-identical. Scale shape: one partial-agg'd groupBy producing a
    human-sized table (one row per source); nothing else touches the
    corpus.

    A stratum present in ``weights`` but ABSENT from the data still
    gets a row (``n_docs = n_tokens = 0``, ``epochs = null``,
    ``over_cap = false``): a planned-but-missing source is the loudest
    failure the planner can surface, and silently dropping it would
    hide exactly that. Implemented by unioning one zero-marker row per
    weight key into the PRE-aggregation frame (count becomes a marker
    sum): no extra join — completeness costs one constant-size union
    input into the existing groupBy (~0.15 s fixed at sf0.1, flat in
    corpus size). The full-outer-join alternative measured ~0.5 s of
    fixed SMJ + Py4J local-relation overhead (full outer can't
    broadcast), so it was rejected.
    """
    base = df.select(
        F.col(strata_col).alias("source"),
        F.lit(1).alias("__d"),
        token_col.alias("__t"),
    )
    if weights:
        # Literal zero rows as a JVM-side explode (NOT createDataFrame:
        # the Py4J local-relation roundtrip measured ~0.4 s of
        # plan-build latency per call at 20 keys).
        t_type = base.schema["__t"].dataType
        # Marker literals must match the strata column's type: with a
        # non-string strata_col the untyped F.lit(key) would make
        # unionByName fail on a type mismatch, so cast explicitly.
        s_type = base.schema["source"].dataType
        zeros = (
            df.sparkSession.range(1)
            .select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(s).cast(s_type).alias("source"),
                                F.lit(0).alias("__d"),
                                F.lit(0).cast(t_type).alias("__t"),
                            )
                            for s in sorted(weights)
                        ]
                    )
                ).alias("z")
            )
            .select("z.*")
        )
        base = base.unionByName(zeros)
    agg = base.groupBy("source").agg(
        F.sum("__d").cast("long").alias("n_docs"),
        F.sum("__t").cast("long").alias("n_tokens"),
    )
    w = F.lit(0.0)
    for k in sorted(weights):
        w = F.when(F.col("source") == k, F.lit(float(weights[k]))).otherwise(w)
    target = F.round(F.lit(int(budget)) * F.col("weight"), 0).cast("long")
    return (
        agg.withColumn("weight", w)
        .withColumn("target_tokens", target)
        .withColumn(
            "epochs",
            F.when(F.col("n_tokens") == 0, F.lit(None).cast("double")).otherwise(
                F.round(
                    F.col("target_tokens").cast("double")
                    / F.col("n_tokens").cast("double"),
                    6,
                )
            ),
        )
        .withColumn(
            "over_cap",
            F.coalesce(F.col("epochs") > F.lit(float(epoch_cap)), F.lit(False)),
        )
    )


# ---------------------------------------------------------------------------
# Pareto-frontier (skyline) data selection
# ---------------------------------------------------------------------------


def _pareto_survivors(A, chunk: int):
    """Indices of the exact Pareto frontier of ``A`` (rows = points,
    columns = criteria, already sign-normalized so every axis is
    maximize). Blockwise-iterative prune: pairwise dominance inside
    fixed-size chunks (one vectorized ``c x c x d`` comparison per
    chunk) repeatedly shrinks the candidate set; pruning is safe
    (a dominated point can never re-enter the frontier), so when the
    survivors fit one chunk a final full pairwise pass is exact.

    Random/correlated data collapses geometrically (the frontier of n
    random points is ~O(log^(d-1) n)); if a pass makes no progress the
    chunk doubles, degrading gracefully toward the one-shot O(n^2 d)
    pass that fully anti-correlated data (frontier = everything)
    genuinely requires."""
    import numpy as np

    n = len(A)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # Sum-descending order puts likely dominators first, so early chunks
    # carry the strong points that prune later ones fastest.
    idx = np.argsort(-A.sum(axis=1), kind="stable")

    def block_alive(B):
        ge = (B[:, None, :] >= B[None, :, :]).all(axis=-1)
        gt = (B[:, None, :] > B[None, :, :]).any(axis=-1)
        return ~(ge & gt).any(axis=0)

    while len(idx) > chunk:
        parts = []
        before = len(idx)
        for s in range(0, len(idx), chunk):
            blk = idx[s : s + chunk]
            parts.append(blk[block_alive(A[blk])])
        idx = np.concatenate(parts)
        if len(idx) == before:
            chunk *= 2
    return np.sort(idx[block_alive(A[idx])])


def skyline_select(
    df: DataFrame,
    criteria: dict[str, str],
    chunk: int = 2048,
) -> DataFrame:
    """Pareto-frontier (skyline) selection: keep exactly the rows not
    dominated on the given criteria — ``{"col": "max" | "min"}`` —
    where q dominates p iff q is >= p on every axis (after direction
    normalization) and strictly better on at least one. The
    multi-objective data-selection primitive (Borzsony et al., ICDE
    2001): "documents on the (quality up, toxicity down) frontier",
    "sources on the (volume, avg-length) frontier" — anywhere a single
    weighted score would bake in an arbitrary trade-off.

    Scale shape (the classic two-phase distributed skyline): a
    map-side local prune per partition (vectorized numpy dominance in
    Arrow batches — the frontier of a random partition is tiny, so
    ~everything dies before any shuffle), then one single-task global
    prune over the surviving candidates. The skyline is
    partition-invariant (dominance is transitive and prune-safe), so
    output is a deterministic row SET under any layout or retry.
    Worst case is honest: fully anti-correlated axes make the frontier
    the whole input and no algorithm shrinks it; the local phase then
    degrades to per-partition O(n^2 d) and the global task inherits
    whatever survives. Rows with a null criterion are dropped
    (dominance is undefined on missing values).
    """
    import numpy as np

    if not criteria:
        raise ValueError("need at least one criterion column")
    if chunk < 1:
        raise ValueError("chunk must be >= 1")
    cols = sorted(criteria)
    numeric = ("int", "bigint", "smallint", "tinyint", "float", "double",
               "decimal")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"criterion column {c!r} not in dataframe")
        t = df.schema[c].dataType.simpleString()
        if not t.startswith(numeric):
            raise ValueError(
                f"criterion {c!r} has non-orderable-numeric type {t};"
                " dominance needs a numeric axis"
            )
    signs = []
    for c in cols:
        d = criteria[c]
        if d not in ("max", "min"):
            raise ValueError(f"direction for {c!r} must be 'max' or 'min'")
        signs.append(1.0 if d == "max" else -1.0)
    sign_vec = np.asarray(signs)

    base = df.dropna(subset=cols)
    schema = base.schema
    local_chunk = int(chunk)

    def prune(iterator):
        import pandas as pd

        held = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            held = pdf if held is None else pd.concat(
                [held, pdf], ignore_index=True
            )
            if len(held) > 2 * local_chunk:
                A = held[cols].to_numpy(dtype="float64") * sign_vec
                held = held.iloc[_pareto_survivors(A, local_chunk)]
                held = held.reset_index(drop=True)
        if held is not None and len(held):
            A = held[cols].to_numpy(dtype="float64") * sign_vec
            yield held.iloc[_pareto_survivors(A, local_chunk)]

    candidates = base.mapInPandas(prune, schema=schema)
    # Global phase: candidates are frontier-of-partition sized; one task
    # computes the exact frontier of their union.
    return candidates.repartition(1).mapInPandas(prune, schema=schema)
