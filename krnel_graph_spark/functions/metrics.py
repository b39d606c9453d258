"""Binary-classification metrics in pure numpy (no sklearn dependency).

Standard textbook formulas: step-function average precision, rank-statistic
ROC-AUC with tie correction, PR-curve threshold scans. Used by the
classifier-evaluation operator (reference parity surface:
``probe_implementations.py:205-322``)."""

from __future__ import annotations

import numpy as np

PRECISION_AT_RECALL_LEVELS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999)


def _sorted_desc(scores: np.ndarray, labels: np.ndarray):
    order = np.argsort(-scores, kind="stable")
    return scores[order], labels[order].astype(bool)


def pr_curve(scores: np.ndarray, labels: np.ndarray):
    """Precision/recall at every distinct descending threshold."""
    s, y = _sorted_desc(scores, labels)
    tp = np.cumsum(y)
    fp = np.cumsum(~y)
    # Collapse tied scores to the last index of each tie group.
    distinct = np.where(np.diff(s))[0]
    idx = np.r_[distinct, len(s) - 1]
    tp, fp = tp[idx], fp[idx]
    n_pos = int(labels.sum())
    precision = tp / np.maximum(tp + fp, 1)
    recall = tp / max(n_pos, 1)
    thresholds = s[idx]
    return precision, recall, thresholds, tp, fp


def average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    n_pos = int(labels.sum())
    if n_pos == 0:
        return float("nan")
    precision, recall, _, _, _ = pr_curve(scores, labels)
    recall_prev = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - recall_prev) * precision))


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Mann-Whitney U statistic with midrank tie handling."""
    labels = labels.astype(bool)
    n_pos = int(labels.sum())
    n_neg = int((~labels).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=float)
    sorted_scores = scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    rank_sum_pos = ranks[labels].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def precision_at_recall(scores: np.ndarray, labels: np.ndarray, level: float) -> float:
    precision, recall, _, _, _ = pr_curve(scores, labels)
    eligible = precision[recall >= level]
    return float(eligible.max()) if len(eligible) else float("nan")


def confusion_at_threshold(scores: np.ndarray, labels: np.ndarray, threshold: float):
    pred = scores >= threshold
    y = labels.astype(bool)
    tp = int((pred & y).sum())
    fp = int((pred & ~y).sum())
    fn = int((~pred & y).sum())
    tn = int((~pred & ~y).sum())
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def threshold_metrics(scores: np.ndarray, labels: np.ndarray, threshold: float):
    c = confusion_at_threshold(scores, labels, threshold)
    n = len(scores)
    precision = c["tp"] / (c["tp"] + c["fp"]) if (c["tp"] + c["fp"]) else float("nan")
    recall = c["tp"] / (c["tp"] + c["fn"]) if (c["tp"] + c["fn"]) else float("nan")
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision == precision and recall == recall and (precision + recall)
        else float("nan")
    )
    return {
        "threshold": threshold,
        "accuracy": (c["tp"] + c["tn"]) / n if n else float("nan"),
        "confusion": c,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def best_accuracy_threshold(scores: np.ndarray, labels: np.ndarray):
    """Scan PR-curve thresholds for the accuracy-maximizing one."""
    _, _, thresholds, tp, fp = pr_curve(scores, labels)
    y = labels.astype(bool)
    n = len(scores)
    n_pos = int(y.sum())
    n_neg = n - n_pos
    # At threshold t (predict positive when score >= t): acc = (tp + tn) / n.
    tn = n_neg - fp
    acc = (tp + tn) / max(n, 1)
    best = int(np.argmax(acc))
    return {
        "best_accuracy": float(acc[best]),
        "most_accurate_threshold": float(thresholds[best]),
        "best_confusion": confusion_at_threshold(scores, y, float(thresholds[best])),
    }


def evaluate_split(scores: np.ndarray, labels: np.ndarray, threshold=None) -> dict:
    """Full per-split report (parity surface with the reference evaluator)."""
    y = labels.astype(bool)
    n = len(scores)
    report: dict = {
        "count": n,
        "n_true": int(y.sum()),
        "n_false": int((~y).sum()),
        "avg_score": float(scores.mean()) if n else float("nan"),
        "warnings": [],
    }
    if n == 0:
        report["warnings"].append("empty split")
        return report
    if report["n_true"] == 0:
        report["warnings"].append("no positive examples in split")
    if report["n_false"] == 0:
        report["warnings"].append("no negative examples in split")
    if threshold is None:
        if report["n_true"] and report["n_false"]:
            report.update(best_accuracy_threshold(scores, y))
    else:
        report.update(threshold_metrics(scores, y, threshold))
    if report["n_true"] and report["n_false"]:
        report["average_precision"] = average_precision(scores, y)
        report["roc_auc"] = roc_auc(scores, y)
        report["precision_at_recall"] = {
            str(level): precision_at_recall(scores, y, level)
            for level in PRECISION_AT_RECALL_LEVELS
        }
    return report


# ---------------------------------------------------------------------------
# Distributed calibration analysis (Spark-side; everything above is the
# numpy kernel surface used by the classifier evaluator)
# ---------------------------------------------------------------------------


def calibration_bins(df, score_col: str, label_col: str, bins: int = 10):
    """Reliability-curve table for a probabilistic scorer: bucket rows
    by score into ``bins`` equal-width bins over [0, 1] and report, per
    bin, the row count, positive count, mean score (confidence) and
    positive fraction (empirical accuracy) plus their absolute gap —
    the per-bin term of Expected Calibration Error (Guo et al. 2017).
    The thresholding companion to the classifier-evaluation op: a
    quality classifier that is over-confident in its top bin silently
    biases what a curation pipeline keeps.

    Determinism contract: bin assignment is exact integer/float floor
    arithmetic (scores == 1.0 fold into the top bin); mean score is an
    exact DECIMAL(38,12) sum divided by the count, rounded to 6 — the
    corr_matrix idiom — so the result is bit-identical under any
    partitioning and SQL-oracle-checkable. Scale shape: one
    partial-agg'd groupBy onto ``bins`` rows; nothing else touches the
    corpus. Rows with a null OR NaN score are dropped (a NaN would
    otherwise fold into an edge bin with a NULL mean/gap — a phantom
    row that poisons any downstream ECE sum).
    """
    from pyspark.sql import functions as F

    if bins < 1:
        raise ValueError("bins must be >= 1")
    # Scores are a [0,1] contract, but out-of-range values clamp into
    # the edge bins instead of minting phantom negative / >bins bins —
    # a mis-scaled scorer shows up as mass piled at the edges, not as
    # rows silently grouped under impossible bin ids.
    b = F.greatest(
        F.lit(0),
        F.least(
            F.lit(bins - 1),
            F.floor(F.col(score_col).cast("double") * bins).cast("int"),
        ),
    )
    lbl = F.col(label_col).cast("boolean").cast("int")
    dec = F.col(score_col).cast("double").cast("decimal(38,12)")
    sc = F.col(score_col).cast("double")
    out = (
        df.filter(sc.isNotNull() & ~F.isnan(sc))
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lbl).cast("long").alias("n_pos"),
            F.round(
                F.sum(dec).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_score"),
            F.round(
                F.sum(lbl).cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_pos"),
        )
        .withColumn(
            "gap", F.round(F.abs(F.col("mean_score") - F.col("frac_pos")), 6)
        )
    )
    return out
