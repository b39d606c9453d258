"""LLM operator specs. Parity: reference ``src/krnel/graph/llm_ops.py:10-71``.

Model access is provider-dispatched via ``model_name = "scheme:name"``
(reference ``runners/model_registry.py:41-75``). Heavy providers (huggingface,
sentence-transformers) are import-gated; a deterministic ``fake:`` provider
keeps the Spark-side plumbing (batching, schema, mapInPandas) fully testable
without model weights.
"""

from __future__ import annotations

from typing import Literal, Optional, Union

from ..types import (
    ConversationColumnType,
    ScoreColumnType,
    TextColumnType,
    VectorColumnType,
)


class LLMLayerActivationsOp(VectorColumnType):
    """Hidden-state vector of ``layer_num`` (negative = from end) for each
    text/conversation row, with ``token_mode`` last/mean pooling, batched.
    Parity: reference ``llm_ops.py:15-46``."""

    input: Union[TextColumnType, ConversationColumnType]
    model_name: str
    layer_num: int = -1
    token_mode: Literal["last", "mean"] = "last"
    batch_size: int = 32
    use_chat_template: bool = False


class LLMLogitScoresOp(VectorColumnType):
    """Last-token logits for a fixed token list per row. Parity: reference
    ``llm_ops.py:48-71``."""

    input: Union[TextColumnType, ConversationColumnType]
    model_name: str
    tokens: list[str]
    batch_size: int = 32
    use_chat_template: bool = False
    append_to_chat_template: Optional[str] = None


class LLMGenerateTextOp(TextColumnType):
    """Generate text per prompt row. (Declared but unimplemented in the
    reference, ``types.py:401``; implemented here via the provider surface.)"""

    input: Union[TextColumnType, ConversationColumnType]
    model_name: str
    max_tokens: int = 256
    temperature: float = 0.0
    batch_size: int = 32
    use_chat_template: bool = False
