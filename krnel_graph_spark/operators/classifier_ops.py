"""Classifier operator specs. Parity: reference
``src/krnel/graph/classifier_ops.py:22-63``."""

from __future__ import annotations

from typing import Literal, Optional

from ..types import (
    BooleanColumnType,
    ClassifierType,
    EvaluationReportType,
    ScoreColumnType,
    TrainTestSplitColumnType,
    VectorColumnType,
)


class TrainClassifierOp(ClassifierType):
    """Train a binary probe on a vector column.

    ``positives`` marks the positive rows; ``negatives`` defaults to the
    complement of ``positives``; ``train_domain`` restricts which rows are
    eligible at all. ``model_type`` resolves through the classifier registry;
    ``preprocessing`` is none/standardize/normalize.
    Parity: reference ``classifier_ops.py:22-36`` +
    ``probe_implementations.py:123-182``.
    """

    x: VectorColumnType
    positives: BooleanColumnType
    negatives: Optional[BooleanColumnType] = None
    train_domain: Optional[BooleanColumnType] = None
    model_type: str = "logistic_regression"
    preprocessing: Literal["none", "standardize", "normalize"] = "none"
    random_state: int = 0
    mode: Literal["driver", "spark"] = "driver"
    """``driver``: collect masked (X, y) and fit locally (probe-sized data —
    the reference's model). ``spark``: fit with ``pyspark.ml`` distributed
    (the 100-TB path)."""


class ClassifierPredictOp(ScoreColumnType):
    """Score every row of a vector column with a trained classifier
    (probability of the positive class when available, else a decision
    score). Parity: reference ``classifier_ops.py:39-45`` +
    ``probe_implementations.py:185-202``."""

    classifier: ClassifierType
    input_data: VectorColumnType


class ClassifierEvaluationOp(EvaluationReportType):
    """Per-split binary-classification metrics JSON: counts, avg score,
    accuracy/confusion at a threshold (or best-threshold scan), average
    precision, ROC-AUC, precision@recall levels, degenerate-split warnings.
    Parity: reference ``classifier_ops.py:48-63`` +
    ``probe_implementations.py:205-322``."""

    scores: ScoreColumnType
    gt_positives: BooleanColumnType
    gt_negatives: Optional[BooleanColumnType] = None
    predict_domain: Optional[BooleanColumnType] = None
    split: Optional[TrainTestSplitColumnType] = None
    threshold: Optional[float] = None
