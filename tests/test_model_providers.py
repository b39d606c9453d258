"""Real-model provider smoke tests (reference parity:
``/root/reference/tests/test_model_provider_implementations.py`` — the
reference ships ``ml_models``-marked integration tests for its providers;
these are the Spark-side equivalents).

A ~1 MB random-weight GPT-2 is built IN-TEST (no network): a byte-level
BPE tokenizer trained on a ten-sentence corpus plus
``transformers.GPT2LMHeadModel(config)`` saved to tmp. Exercises the real
tokenizer -> mapInPandas -> pooling/logit/generate paths that the
``fake:`` provider bypasses: batching, attention-mask pooling, padding
sides, dtype, and vocab lookups.

Skips cleanly where torch/transformers aren't installed (this container).
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.ml_models

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow",
]


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(
        TEXTS + ["hello world", "yes no maybe", "alpha beta gamma delta"],
        trainers.BpeTrainer(
            vocab_size=300, special_tokens=["<unk>", "<eos>"]
        ),
    )
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        eos_token="<eos>",
        pad_token="<eos>",
    )
    cfg = transformers.GPT2Config(
        vocab_size=max(fast.vocab_size, 300),
        n_positions=64,
        n_embd=32,
        n_layer=2,
        n_head=2,
        bos_token_id=fast.eos_token_id,
        eos_token_id=fast.eos_token_id,
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg)
    d = tmp_path_factory.mktemp("tiny_gpt2")
    model.save_pretrained(d)
    fast.save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def provider(tiny_model_dir):
    from krnel_graph_spark.runners.llm_impl import get_provider

    return get_provider(f"hf:{tiny_model_dir}")


def test_layer_activations_shapes_and_pooling(provider):
    acts = provider.layer_activations(TEXTS, layer_num=-1, token_mode="mean")
    assert acts.shape == (3, 32) and acts.dtype == np.float32
    last = provider.layer_activations(TEXTS, layer_num=-1, token_mode="last")
    assert last.shape == (3, 32)
    assert not np.allclose(acts, last)  # pooling modes genuinely differ
    # batching must not change results (padding is masked out of pooling)
    solo = np.stack(
        [
            provider.layer_activations([t], -1, "mean")[0]
            for t in TEXTS
        ]
    )
    np.testing.assert_allclose(acts, solo, atol=1e-5)
    with pytest.raises(ValueError, match="out of range"):
        provider.layer_activations(TEXTS, layer_num=99, token_mode="mean")


def test_logit_scores_vocab_lookup(provider):
    vocab = provider.tokenizer.get_vocab()
    tokens = sorted(vocab, key=vocab.get)[2:4]  # two real non-special tokens
    scores = provider.logit_scores(TEXTS, tokens)
    assert scores.shape == (3, 2) and scores.dtype == np.float32
    # cross-check one row against a manual forward pass
    enc = provider.tokenizer(TEXTS[:1], return_tensors="pt")
    with torch.no_grad():
        out = provider.model(**enc)
    expected = out.logits[0, -1, [vocab[t] for t in tokens]].numpy()
    np.testing.assert_allclose(scores[0], expected, atol=1e-5)
    with pytest.raises(ValueError, match="not found in vocabulary"):
        provider.logit_scores(TEXTS, ["definitely-not-a-token-xyz"])


def test_generate_greedy_deterministic(provider):
    outs = provider.generate(TEXTS, max_tokens=6, temperature=0.0)
    assert len(outs) == 3 and all(isinstance(o, str) for o in outs)
    # greedy decode is deterministic and batch-size independent
    again = [provider.generate([t], 6, 0.0)[0] for t in TEXTS]
    assert outs == again


def test_ops_through_runner_mapinpandas(runner, tiny_model_dir):
    """The full Spark path the fake: provider can't exercise: real
    tokenizer + model through the mapInPandas batching, per-executor
    provider cache, and Arrow dtype boundaries."""
    ds = runner.from_inline_dataset({"t": list(TEXTS * 4)})
    col = ds.col_text("t")
    model = f"hf:{tiny_model_dir}"

    acts = runner.to_numpy(col.llm_layer_activations(model, layer_num=-1))
    assert acts.shape == (12, 32) and np.isfinite(acts).all()
    # Spark-side batching must agree with a direct provider call
    from krnel_graph_spark.runners.llm_impl import get_provider

    direct = get_provider(model).layer_activations(TEXTS, -1, "last")
    np.testing.assert_allclose(acts[:3], direct, atol=1e-4)

    gen = runner.to_pandas(col.llm_generate_text(model, max_tokens=4))
    assert len(gen) == 12 and gen.iloc[:, -1].map(lambda s: isinstance(s, str)).all()
