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


def _pareto_2d(A):
    """Exact 2-axis frontier in O(n log n): sort by (x desc, y desc);
    a point is dominated iff the running max-y over STRICTLY greater x
    reaches its y, or a same-x point has strictly greater y. Vectorized
    group arithmetic — 1M fully incomparable points in well under a
    second, where pairwise sweeps are quadratic."""
    import numpy as np

    x, y = A[:, 0], A[:, 1]
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    new_group = np.empty(len(xs), dtype=bool)
    new_group[0] = True
    new_group[1:] = xs[1:] != xs[:-1]
    starts = np.flatnonzero(new_group)
    gmax = np.maximum.reduceat(ys, starts)
    prev = np.empty(len(gmax))
    prev[0] = -np.inf
    if len(gmax) > 1:
        prev[1:] = np.maximum.accumulate(gmax)[:-1]
    gid = np.cumsum(new_group) - 1
    dominated = (prev[gid] >= ys) | (gmax[gid] > ys)
    return np.sort(order[~dominated])


def _pareto_survivors(A, chunk: int):
    """Indices of the exact Pareto frontier of ``A`` (rows = points,
    columns = criteria, already sign-normalized so every axis is
    maximize). d == 1 is an argmax scan and d == 2 dispatches to the
    O(n log n) sort-based :func:`_pareto_2d`; for d >= 3 there are two
    regimes, both exact and both memory-bounded to
    O(chunk^2 * d) — never an n x n dominance cube:

    1. Geometric within-block passes: pairwise dominance inside
       fixed-size chunks repeatedly shrinks the candidate set (pruning
       is safe — a dominated point can never re-enter the frontier).
       Random/correlated data collapses here (the frontier of n random
       points is ~O(log^(d-1) n)).
    2. When a pass stops paying (mutually incomparable blocks — the
       anti-correlated regime where the frontier IS most of the input),
       a block-nested-loop sweep finishes exactly: each block first
       prunes internally, then cross-prunes in both directions against
       the accumulated survivor set one chunk at a time. Work degrades
       honestly to O(n^2 d) — that lower bound is inherent when nothing
       dominates anything — but memory stays chunk-bounded instead of
       materializing the O(n^2) cube an unbounded merge would."""
    import numpy as np

    n = len(A)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if A.shape[1] == 1:
        return np.flatnonzero(A[:, 0] == A[:, 0].max())
    if A.shape[1] == 2:
        return _pareto_2d(A)
    # Sum-descending order puts likely dominators first, so early chunks
    # carry the strong points that prune later ones fastest. The sum is
    # over [0,1]-NORMALIZED axes — a raw sum is owned by whichever axis
    # has the widest scale (price in thousands drowns a [0,1] quality
    # score), which destroys the put-dominators-first property the
    # ordering exists for. Normalization only reorders; dominance below
    # still compares the raw values.
    lo, hi = A.min(axis=0), A.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    key = ((A - lo) / span).sum(axis=1)
    idx = np.argsort(-key, kind="stable")

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
        # Stop when a pass shrinks <10%: further same-boundary passes
        # are no-ops (identical block membership), and near-no-op
        # passes mean the BNL sweep below is the faster exact finisher.
        if len(idx) > 0.9 * before:
            break

    if len(idx) <= chunk:
        return np.sort(idx[block_alive(A[idx])])

    # Exact block-nested-loop sweep, chunk-bounded memory. Mostly one
    # direction: blocks arrive in normalized-sum-DESCENDING order, and
    # q dominates p implies key(q) >= key(p) — per-axis subtraction,
    # positive-span division, and left-to-right summation are all
    # MONOTONE in float64, but only NON-strictly: rounding can collapse
    # a strict raw-axis difference into a key TIE, and the stable sort
    # then places the dominated row first. So a later block member CAN
    # dominate an already-accepted survivor — exactly when their keys
    # tie, and (keys being non-increasing along idx) the only value the
    # accepted set and the current block can share is the block's max
    # key. The reverse cross-prune therefore runs ONLY on that tied
    # boundary slice (normally zero or a handful of rows — the full
    # reverse pass the pre-r12 sweep ran remains dead work).
    surv = np.empty(0, dtype=idx.dtype)
    for s in range(0, len(idx), chunk):
        blk = idx[s : s + chunk]
        B = A[blk]
        alive = block_alive(B)
        blk, B = blk[alive], B[alive]
        keep_b = np.ones(len(blk), dtype=bool)
        for t in range(0, len(surv), chunk):
            SV = A[surv[t : t + chunk]]
            ge = (SV[:, None, :] >= B[None, :, :]).all(axis=-1)
            gt = (SV[:, None, :] > B[None, :, :]).any(axis=-1)
            keep_b &= ~(ge & gt).any(axis=0)
            if not keep_b.any():
                break
        new = blk[keep_b]
        if len(surv) and len(new):
            # fp-tie boundary: reverse-prune accepted survivors whose
            # key equals this block's max key against the tied new rows.
            bmax = key[new].max()
            tied_s = surv[key[surv] == bmax]
            tied_n = new[key[new] == bmax]
            if len(tied_s) and len(tied_n):
                NV, SV = A[tied_n], A[tied_s]
                ge = (NV[:, None, :] >= SV[None, :, :]).all(axis=-1)
                gt = (NV[:, None, :] > SV[None, :, :]).any(axis=-1)
                dead = tied_s[(ge & gt).any(axis=0)]
                if len(dead):
                    surv = surv[~np.isin(surv, dead)]
        surv = np.concatenate([surv, new])
    return np.sort(surv)


def skyline_select(
    df: DataFrame,
    criteria: dict[str, str],
    chunk: int = 2048,
    global_limit: int | None = 1_000_000,
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
    the whole input and no algorithm shrinks it. For d <= 2 that costs
    nothing — the sort-based exact path handles 1M fully incomparable
    points in ~0.3 s — but for d >= 3 the exact finisher is inherently
    quadratic in the incomparable set (measured: 20k incomparable
    candidates ~21 s, 40k ~79 s, 4x per doubling). ``global_limit``
    (default 1M) is the loud guard for that regime: if more candidates
    than the limit reach the single global task, it raises with a
    clear message instead of grinding a quadratic sweep for hours; the
    same limit guards the LOCAL phase too (on per-partition frontier
    survivors — raw partition rows may exceed it and prune down), so a
    single giant incomparable partition fails fast instead of grinding
    before the global check is reachable. Raise or disable (``None``)
    only when an enormous high-dimensional frontier is genuinely the
    intended result. Rows with a null criterion are dropped (dominance
    is undefined on missing values). Criteria are compared as float64:
    integer axes beyond 2^53 lose precision and may mis-compare —
    profile/scale such columns first (the realistic criteria —
    scores, lengths, counts — sit far below that).
    """
    import numpy as np

    if not criteria:
        raise ValueError("need at least one criterion column")
    if chunk < 1:
        raise ValueError("chunk must be >= 1")
    cols = sorted(criteria)
    from pyspark.sql.types import NumericType

    for c in cols:
        if c not in df.columns:
            raise ValueError(f"criterion column {c!r} not in dataframe")
        dt = df.schema[c].dataType
        # isinstance, not simpleString prefixes: "interval day to
        # second" starts with "int" and would sneak past a string
        # check, then fail opaquely (or compare as raw nanoseconds)
        # executor-side.
        if not isinstance(dt, NumericType):
            raise ValueError(
                f"criterion {c!r} has non-numeric type "
                f"{dt.simpleString()}; dominance needs a numeric axis"
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

    def make_prune(limit, phase):
        def prune(iterator):
            import pandas as pd

            held = None
            seen = 0
            last_kept = 0

            def guard(n_candidates):
                if limit is not None and n_candidates > limit:
                    raise ValueError(
                        f"skyline_select: >{limit} frontier candidates "
                        f"in the {phase} phase — the criteria look "
                        "anti-correlated (mutually incomparable rows), "
                        "where the exact finisher is inherently "
                        "quadratic. (The local phase fails fast on a "
                        "mid-partition prefix frontier, which a later "
                        "batch could in principle prune back down.) "
                        "Raise global_limit / pass None if an enormous "
                        "frontier — or such a prefix spike — is really "
                        "intended."
                    )

            for pdf in iterator:
                if len(pdf) == 0:
                    continue
                seen += len(pdf)
                # Global phase: every arriving row already survived a
                # local prune, so raw arrivals ARE frontier candidates
                # and the guard can fire before any quadratic work.
                if phase == "global":
                    guard(seen)
                held = pdf if held is None else pd.concat(
                    [held, pdf], ignore_index=True
                )
                # Geometric re-prune schedule: prune only once held has
                # DOUBLED since the last prune's survivor count, so an
                # incompressible (anti-correlated d>=3) partition pays
                # amortized O(n^2) total, not O(n^2) per arriving batch.
                if len(held) > max(2 * local_chunk, 2 * last_kept):
                    A = held[cols].to_numpy(dtype="float64") * sign_vec
                    held = held.iloc[_pareto_survivors(A, local_chunk)]
                    held = held.reset_index(drop=True)
                    last_kept = len(held)
                    # Local phase: raw partition rows may legitimately
                    # exceed the limit (they prune down), so the guard
                    # watches the SURVIVOR count. A PREFIX frontier is
                    # not monotone — later rows in this partition could
                    # in principle dominate it back below the limit —
                    # so this mid-partition check is a HEURISTIC
                    # fail-fast (a partition that has already
                    # accumulated >limit mutually-incomparable rows is
                    # overwhelmingly headed for a quadratic grind, and
                    # amortized local work so far is ~O(limit^2));
                    # the authoritative check is the final per-partition
                    # yield below, where survivors ARE the partition's
                    # frontier and all of them reach the global task.
                    # A workload whose final frontier is legitimately
                    # small but whose prefixes spike past the limit
                    # should raise global_limit (the error says so).
                    guard(last_kept)
            if held is not None and len(held):
                A = held[cols].to_numpy(dtype="float64") * sign_vec
                out = held.iloc[_pareto_survivors(A, local_chunk)]
                guard(len(out))
                yield out

        return prune

    candidates = base.mapInPandas(
        make_prune(global_limit, "local"), schema=schema
    )
    # Global phase: candidates are frontier-of-partition sized; one task
    # computes the exact frontier of their union (guarded by
    # global_limit against the incomparable-axes regime).
    return candidates.repartition(1).mapInPandas(
        make_prune(global_limit, "global"), schema=schema
    )
