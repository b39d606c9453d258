"""LLM operator implementations: provider registry + mapInPandas plumbing.

Provider dispatch mirrors the reference (``model_name = "scheme:name"``,
``runners/model_registry.py:41-75``). Execution is Spark-idiomatic: the text
column streams through ``mapInPandas`` in caller-controlled batches, with a
per-executor-process model cache so weights load once per worker, not once
per batch (reference batching semantics, ``llm_ops.py:31``,
``model_registry_implementations.py:149-234``).

Heavy providers (huggingface, sentence-transformers) are import-gated — this
container has no torch — while the deterministic ``fake:`` provider keeps the
entire distributed code path (schemas, batching, UDF signatures) testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from ..operators.llm_ops import (
    LLMGenerateTextOp,
    LLMLayerActivationsOp,
    LLMLogitScoresOp,
)
from .plan import ROW_ID, VALUE, ColumnPlan
from .spark_runner import SparkRunner

_MODEL_PROVIDERS: dict[str, type] = {}
_PROVIDER_CACHE: dict[str, "ModelProvider"] = {}  # per-process (executor) cache


def register_model_provider(*schemes: str):
    def decorator(cls: type):
        for scheme in schemes:
            if scheme in _MODEL_PROVIDERS:
                raise ValueError(f"Provider scheme {scheme!r} already registered")
            _MODEL_PROVIDERS[scheme] = cls
        return cls

    return decorator


def get_provider(model_name: str) -> "ModelProvider":
    provider = _PROVIDER_CACHE.get(model_name)
    if provider is None:
        scheme, _, name = model_name.partition(":")
        if not name:
            raise ValueError(
                f"model_name must be 'scheme:name', got {model_name!r}"
            )
        try:
            cls = _MODEL_PROVIDERS[scheme]
        except KeyError:
            raise ValueError(
                f"Unknown model provider scheme {scheme!r}; registered: "
                f"{sorted(_MODEL_PROVIDERS)}"
            )
        provider = cls(name)
        _PROVIDER_CACHE[model_name] = provider
    return provider


class ModelProvider:
    """One loaded model; all methods take a list of texts (one batch)."""

    def __init__(self, name: str):
        self.name = name

    def layer_activations(
        self, texts: list[str], layer_num: int, token_mode: str
    ) -> np.ndarray:
        raise NotImplementedError

    def logit_scores(self, texts: list[str], tokens: list[str]) -> np.ndarray:
        raise NotImplementedError

    def generate(self, texts: list[str], max_tokens: int, temperature: float) -> list[str]:
        raise NotImplementedError


@register_model_provider("fake")
class FakeProvider(ModelProvider):
    """Deterministic hash-seeded pseudo-model: same text → same vector,
    forever, on any executor. Dimension parses from the name
    (``fake:dim16``); defaults to 16."""

    def __init__(self, name: str):
        super().__init__(name)
        self.dim = int(name.removeprefix("dim")) if name.startswith("dim") else 16

    def _vec(self, text: str, salt: str, dim: int) -> np.ndarray:
        digest = hashlib.sha256(f"{salt}:{text}".encode()).digest()
        seed = int.from_bytes(digest[:8], "big") % (2**32)
        rng = np.random.RandomState(seed)
        return rng.standard_normal(dim).astype(np.float32)

    def layer_activations(self, texts, layer_num, token_mode):
        return np.stack(
            [self._vec(t, f"act:{layer_num}:{token_mode}", self.dim) for t in texts]
        )

    def logit_scores(self, texts, tokens):
        return np.stack(
            [self._vec(t, f"logit:{','.join(tokens)}", len(tokens)) for t in texts]
        )

    def generate(self, texts, max_tokens, temperature):
        return [f"echo[{self.name}]: {t[: max_tokens]}" for t in texts]


@register_model_provider("hf", "huggingface")
class HuggingFaceProvider(ModelProvider):
    """Real transformer activations/logits — requires torch+transformers
    (import-gated; parity surface:
    ``model_registry_implementations.py:245-457``)."""

    def __init__(self, name: str):
        super().__init__(name)
        try:
            import torch  # noqa: F401
            import transformers
        except ImportError as exc:  # pragma: no cover - env without torch
            raise NotImplementedError(
                "huggingface provider requires `torch` and `transformers`; "
                "not installed in this environment"
            ) from exc
        self.tokenizer = transformers.AutoTokenizer.from_pretrained(name)
        self.model = transformers.AutoModel.from_pretrained(name)
        self.model.eval()

    def layer_activations(self, texts, layer_num, token_mode):  # pragma: no cover
        import torch

        enc = self.tokenizer(texts, return_tensors="pt", padding=True, truncation=True)
        with torch.no_grad():
            out = self.model(**enc, output_hidden_states=True)
        hidden = out.hidden_states[layer_num]
        mask = enc["attention_mask"].unsqueeze(-1)
        if token_mode == "mean":
            pooled = (hidden * mask).sum(1) / mask.sum(1)
        elif token_mode == "last":
            idx = enc["attention_mask"].sum(1) - 1
            pooled = hidden[torch.arange(hidden.shape[0]), idx]
        else:
            raise NotImplementedError(f"token_mode={token_mode!r}")
        return pooled.float().numpy()


@register_model_provider("st", "sentencetransformer")
class SentenceTransformerProvider(ModelProvider):  # pragma: no cover
    def __init__(self, name: str):
        super().__init__(name)
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as exc:
            raise NotImplementedError(
                "sentencetransformer provider requires `sentence-transformers`"
            ) from exc
        self.model = SentenceTransformer(name)

    def layer_activations(self, texts, layer_num, token_mode):
        return np.asarray(self.model.encode(texts), dtype=np.float32)


# ---------------------------------------------------------------------- #
# mapInPandas plumbing shared by the three ops                            #
# ---------------------------------------------------------------------- #


def _run_batched(
    runner: SparkRunner,
    col: ColumnPlan,
    out_schema: str,
    batch_fn_name: str,
    model_name: str,
    batch_size: int,
    out_is_text: bool,
    **kwargs,
) -> ColumnPlan:
    """Stream (row_id, text) through mapInPandas, batching per
    ``batch_size``, with the per-executor provider cache."""
    from ..functions.partitioning import ensure_min_partitions

    text_expr = F.to_json(col.expr) if col.is_json else col.expr.cast("string")
    # Inference is the most compute-heavy op in the engine: widen narrow
    # scans so every executor core hosts a model replica and a batch stream.
    src = ensure_min_partitions(
        col.source.select(F.col(ROW_ID), text_expr.alias("__text"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        provider = get_provider(model_name)
        fn = getattr(provider, batch_fn_name)
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                result = fn(chunk["__text"].tolist(), **kwargs)
                if out_is_text:
                    values = list(result)
                else:
                    values = [np.asarray(v, dtype=np.float32) for v in result]
                yield pd.DataFrame({ROW_ID: chunk[ROW_ID].values, VALUE: values})

    out = src.mapInPandas(run, schema=out_schema)
    return ColumnPlan(
        source=out,
        expr=F.col(VALUE),
        name=VALUE,
        aligned_with=col.aligned_with,
        dense=col.dense,
    )


@SparkRunner.implementation
def llm_layer_activations(
    runner: SparkRunner, op: LLMLayerActivationsOp
) -> ColumnPlan:
    col = runner.column_plan(op.input)
    return _run_batched(
        runner,
        col,
        f"{ROW_ID} long, {VALUE} array<float>",
        "layer_activations",
        op.model_name,
        op.batch_size,
        out_is_text=False,
        layer_num=op.layer_num,
        token_mode=op.token_mode,
    )


@SparkRunner.implementation
def llm_logit_scores(runner: SparkRunner, op: LLMLogitScoresOp) -> ColumnPlan:
    col = runner.column_plan(op.input)
    return _run_batched(
        runner,
        col,
        f"{ROW_ID} long, {VALUE} array<float>",
        "logit_scores",
        op.model_name,
        op.batch_size,
        out_is_text=False,
        tokens=list(op.tokens),
    )


@SparkRunner.implementation
def llm_generate_text(runner: SparkRunner, op: LLMGenerateTextOp) -> ColumnPlan:
    col = runner.column_plan(op.input)
    return _run_batched(
        runner,
        col,
        f"{ROW_ID} long, {VALUE} string",
        "generate",
        op.model_name,
        op.batch_size,
        out_is_text=True,
        max_tokens=op.max_tokens,
        temperature=op.temperature,
    )
