"""Chat-template conversation handling in the LLM ops, on the fake provider
(the rendering path is provider-generic; model-backed providers override
``apply_chat_template`` with their tokenizer's)."""

import numpy as np
import pytest


@pytest.fixture()
def conv_ds(lazy_runner):
    convs = [
        [{"role": "system", "content": "be brief"}, {"role": "user", "content": "hi"}],
        [{"role": "user", "content": "tell me more"}],
    ]
    return lazy_runner, lazy_runner.from_inline_dataset({"conv": convs})


def test_conversation_generate_renders_template(conv_ds):
    runner, ds = conv_ds
    out = runner.to_pandas(
        ds.col_conversation("conv").llm_generate_text("fake:dim8", max_tokens=400)
    )["value"].tolist()
    assert out[0] == (
        "echo[dim8]: <|im_start|>system\nbe brief<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"
    )
    assert out[1] == (
        "echo[dim8]: <|im_start|>user\ntell me more<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_conversation_activations_and_logits_use_template(conv_ds):
    runner, ds = conv_ds
    conv = ds.col_conversation("conv")
    acts = runner.to_numpy(conv.llm_layer_activations("fake:dim4", layer_num=-1))
    assert acts.shape == (2, 4)
    scores = runner.to_numpy(conv.llm_logit_scores("fake:dim4", tokens=["yes", "no"]))
    assert scores.shape == (2, 2)
    # The fake provider hashes its input text: template-rendered conversations
    # must therefore differ from the raw JSON serialization being hashed.
    import hashlib

    raw_json = '[{"role":"user","content":"tell me more"}]'
    digest = hashlib.sha256(f"act:-1:last:{raw_json}".encode()).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    raw_vec = np.random.RandomState(seed).standard_normal(4).astype(np.float32)
    assert not np.allclose(acts[1], raw_vec)


def test_append_to_chat_template_changes_scores(conv_ds):
    runner, ds = conv_ds
    conv = ds.col_conversation("conv")
    base = runner.to_numpy(conv.llm_logit_scores("fake:dim4", tokens=["yes"]))
    appended = runner.to_numpy(
        conv.llm_logit_scores(
            "fake:dim4", tokens=["yes"], append_to_chat_template="I think"
        )
    )
    assert base.shape == appended.shape
    assert not np.allclose(base, appended)
    # Deterministic: same append → same scores.
    again = runner.to_numpy(
        conv.llm_logit_scores(
            "fake:dim4", tokens=["yes"], append_to_chat_template="I think"
        )
    )
    np.testing.assert_array_equal(appended, again)


def test_text_use_chat_template_wraps_user_turn(lazy_runner):
    runner = lazy_runner
    ds = runner.from_inline_dataset({"t": ["hello"]})
    plain = runner.to_numpy(ds.col_text("t").llm_layer_activations("fake:dim4"))
    templated = runner.to_numpy(
        ds.col_text("t").llm_layer_activations("fake:dim4", use_chat_template=True)
    )
    assert not np.allclose(plain, templated)


def test_provider_registry_schemes():
    from krnel_graph_spark.runners.llm_impl import _MODEL_PROVIDERS

    assert set(_MODEL_PROVIDERS) == {
        "fake",
        "hf",
        "huggingface",
        "st",
        "sentencetransformer",
        "ollama",
        "transformerlens",
        "tl",
    }


def test_gated_providers_raise_cleanly():
    from krnel_graph_spark.runners.llm_impl import get_provider

    with pytest.raises(NotImplementedError, match="transformer_lens"):
        get_provider("tl:gpt2")
    with pytest.raises(NotImplementedError, match="torch"):
        get_provider("hf:gpt2")
    # Ollama constructs without deps (stdlib HTTP) but refuses logit scores.
    p = get_provider("ollama:llama3")
    with pytest.raises(NotImplementedError, match="logit"):
        p.logit_scores(["x"], ["yes"])


def test_text_use_chat_template_on_generate_and_logits(lazy_runner):
    """The knob exists on all three LLM ops, not just activations: templated
    generation must see the rendered user turn, and templated logit scores
    must differ from the raw-text ones."""
    import numpy as np

    runner = lazy_runner
    ds = runner.from_inline_dataset({"t": ["hello"]})
    text = ds.col_text("t")

    gen = runner.to_pandas(
        text.llm_generate_text("fake:dim8", use_chat_template=True)
    )["value"].tolist()
    assert gen[0] == (
        "echo[dim8]: <|im_start|>user\nhello<|im_end|>\n<|im_start|>assistant\n"
    )
    plain_gen = runner.to_pandas(text.llm_generate_text("fake:dim8"))["value"]
    assert plain_gen.tolist() == ["echo[dim8]: hello"]

    plain = runner.to_numpy(text.llm_logit_scores("fake:dim4", tokens=["yes"]))
    templated = runner.to_numpy(
        text.llm_logit_scores("fake:dim4", tokens=["yes"], use_chat_template=True)
    )
    assert not np.allclose(plain, templated)
