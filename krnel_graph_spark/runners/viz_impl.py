"""UMAP / PCA 2-D visualization embedding.

Neighbor-embedding algorithms are not distributable; the reference runs UMAP
on the full in-memory matrix (``local_arrow_runner.py:632-645``). Here the
vectors are collected to the driver (sampled collection would be the next
step at scale), reduced, and the coordinates re-joined to stable row ids so
downstream ops keep alignment. ``method="pca"`` is a deterministic numpy-SVD
fallback for environments without ``umap-learn``."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from ..operators.viz_ops import UMAPVizOp
from .plan import ROW_ID, VALUE, ColumnPlan
from .spark_runner import SparkRunner


def _pca_2d(X: np.ndarray) -> np.ndarray:
    centered = X - X.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    components = vt[:2]
    # Deterministic sign convention: largest-|loading| entry positive.
    for i in range(components.shape[0]):
        j = int(np.argmax(np.abs(components[i])))
        if components[i, j] < 0:
            components[i] = -components[i]
    return centered @ components.T


@SparkRunner.implementation
def umap_vis(runner: SparkRunner, op: UMAPVizOp) -> ColumnPlan:
    col = runner.column_plan(op.input)
    pdf = col.df().toPandas()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[col.name]])

    if op.method == "umap":
        try:
            import umap
        except ImportError as exc:
            raise NotImplementedError(
                "umap-learn is not installed; use method='pca' for the "
                "dependency-free fallback"
            ) from exc
        reducer = umap.UMAP(
            n_components=2,
            n_neighbors=op.n_neighbors,
            min_dist=op.min_dist,
            metric=op.metric,
            random_state=op.random_state,
        )
        coords = reducer.fit_transform(X)
    else:
        coords = _pca_2d(X)

    out_pdf = pd.DataFrame(
        {ROW_ID: pdf[ROW_ID].values, VALUE: [list(map(float, c)) for c in coords]}
    )
    out = runner.spark.createDataFrame(out_pdf)
    return ColumnPlan(
        source=out,
        expr=F.col(VALUE),
        name=VALUE,
        aligned_with=col.aligned_with,
        dense=col.dense,
    )
