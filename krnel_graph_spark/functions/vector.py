"""Vector-column expression builders (embeddings as ``array<float>``).

All pure Spark SQL higher-order functions — JVM-evaluated, codegen-friendly,
no Python in the hot path. Accumulations are done in double precision in
index order, which makes results reproducible and lets a DuckDB oracle
(``list_inner_product`` etc.) hash-match after rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ with a double accumulator (index order, deterministic)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a, b) -> Column:
    diff = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") - y.cast("double")
    )
    return F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def normalize(a) -> Column:
    """Unit-normalize a vector (zero vectors pass through unchanged)."""
    n = l2_norm(a)
    return F.when(n == 0.0, _c(a).cast("array<double>")).otherwise(
        F.transform(_c(a), lambda x: x.cast("double") / n)
    )


def hyperplane_signature(a, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(a · planes[i]).

    Pure-expression variant — ``planes`` embed as plan literals, evaluated
    entirely JVM-side with no Python round-trip. Right for SQL-only
    pipelines with a handful of planes; the engine's own ANN/dedup paths
    use the broadcast batch-GEMM UDFs instead (``similarity``, ``dedup``)
    because literal count scales with tables × planes × dim. Bit semantics
    are identical across both formulations (pinned by the recall tests).
    """
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(float(v)) for v in plane])
        bit = (dot(_c(a), plane_arr) >= 0).cast("long")
        bucket = bucket + bit * F.lit(1 << i)
    return bucket


def quantize_embeddings(df, vec_col: str, id_col: str):
    """Per-row symmetric int8 quantization of an embedding column.

    ``scale = max(|x|) / 127``; ``q_i = floor(x_i / scale + 0.5)`` (round
    half up, which a SQL oracle reproduces exactly — numpy's half-even
    does not). int8 storage is 4× smaller than float32, the standard
    compression for retrieval corpora; dequantization error is bounded by
    ``scale / 2`` per element (pinned in tests). Zero vectors quantize to
    zeros with scale 0. Runs as an Arrow-batched kernel — per-element HOF
    expressions are CodegenFallback and contend under many cores (see
    ``kernels`` module docstring).

    Returns (id, q array<tinyint>, scale double).
    """

    @F.pandas_udf("q array<tinyint>, scale double")
    def qz(vs: pd.Series) -> pd.DataFrame:
        qs, scales = [], []
        for v in vs:
            x = np.asarray(v, dtype=np.float64)
            m = float(np.abs(x).max()) if len(x) else 0.0
            scale = m / 127.0
            if scale == 0.0:
                qs.append(np.zeros(len(x), dtype=np.int8))
            else:
                qs.append(np.floor(x / scale + 0.5).astype(np.int8))
            scales.append(scale)
        return pd.DataFrame({"q": qs, "scale": scales})

    out = qz(_c(vec_col))
    return df.select(
        F.col(id_col),
        out["q"].alias("q"),
        out["scale"].alias("scale"),
    )


def dequantize(q, scale) -> Column:
    """Approximate reconstruction: ``q_i * scale`` (error ≤ scale/2)."""
    s = _c(scale)
    return F.transform(_c(q), lambda x: x.cast("double") * s)


def random_projection_signs(
    in_dim: int, out_dim: int, seed: int = 0
) -> list[list[float]]:
    """Deterministic Achlioptas ±1 sign matrix, derived from md5 so any
    engine (and any run) regenerates the identical matrix — no RNG state
    to ship. Row j is the j-th output component's sign vector."""
    import hashlib

    def sgn(i: int, j: int) -> float:
        h = hashlib.md5(f"rp:{seed}:{i}:{j}".encode()).hexdigest()
        return 1.0 if int(h[:15], 16) % 2 == 0 else -1.0

    return [[sgn(i, j) for i in range(in_dim)] for j in range(out_dim)]


def random_projection(
    df,
    vec_col: str,
    id_col: str,
    in_dim: int,
    out_dim: int = 16,
    seed: int = 0,
):
    """Johnson-Lindenstrauss dimensionality reduction with a
    deterministic ±1 sign matrix (Achlioptas 2003): ``y_j = (Σ_i x_i ·
    s_ij) / sqrt(out_dim)``, round-6. Distances are preserved within
    JL distortion, so the reduced vectors drop into the ANN / k-means /
    centroid family at a fraction of the width — the classic first
    move before indexing a 100-TB embedding corpus (4× narrower
    vectors = 4× less shuffle and GEMM everywhere downstream).

    Pure-expression lowering: the sign matrix embeds as plan literals
    (``in_dim × out_dim`` doubles — fine for the ≤ few-thousand-literal
    regime; the broadcast-GEMM paths in ``similarity`` take over past
    that), every fold runs in index order JVM-side, and the md5-derived
    matrix means a SQL oracle regenerates it bit-identically.

    Returns ``(id, projected array<double>)``.
    """
    signs = random_projection_signs(in_dim, out_dim, seed)
    scale = float(out_dim) ** 0.5
    comps = []
    for j in range(out_dim):
        sj = F.array(*[F.lit(v) for v in signs[j]])
        comps.append(F.round(dot(_c(vec_col), sj) / F.lit(scale), 6))
    return df.select(F.col(id_col), F.array(*comps).alias("projected"))
