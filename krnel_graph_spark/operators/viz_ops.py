"""Visualization operator specs. Parity: reference
``src/krnel/graph/viz_ops.py:10-52``."""

from __future__ import annotations

from typing import Literal, Optional

from ..types import VectorColumnType, VizEmbeddingColumnType


class UMAPVizOp(VizEmbeddingColumnType):
    """2-D embedding of a vector column for visualization.

    ``method="umap"`` requires ``umap-learn`` (import-gated; not installed in
    minimal environments). ``method="pca"`` is a deterministic numpy-SVD
    fallback that needs nothing beyond numpy. Either way the reduction runs on
    driver-collected vectors (UMAP is not distributable) and the result is
    re-joined to stable row ids. Parity: reference ``viz_ops.py:10-52`` +
    ``local_arrow_runner.py:632-645``.
    """

    input: VectorColumnType
    method: Literal["umap", "pca"] = "umap"
    n_neighbors: int = 15
    min_dist: float = 0.1
    metric: str = "euclidean"
    random_state: Optional[int] = None
