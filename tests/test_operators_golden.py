"""Golden-output operator tests on tiny inline datasets (FIXTURES.md F1-F10,
mirroring the reference's dominant test pattern)."""

import math

import numpy as np
import pytest


def inline(runner, **cols):
    return runner.from_inline_dataset(dict(cols))


# --------------------------- F1: take/slice ----------------------------- #


@pytest.mark.parametrize(
    "kwargs,expected_ids",
    [
        (dict(num_rows=3), [0, 1, 2]),
        (dict(num_rows=3, offset=2), [2, 3, 4]),
        (dict(skip=3), [0, 3, 6, 9]),
        (dict(num_rows=2, skip=3, offset=1), [1, 4]),
        (dict(num_rows=100), list(range(10))),
        (dict(offset=20), []),
    ],
)
def test_take_rows_slice_semantics(lazy_runner, kwargs, expected_ids):
    ds = inline(lazy_runner, id=list(range(10)), value=list("abcdefghij"))
    out = lazy_runner.to_pandas(ds.take(**kwargs))
    assert out["id"].tolist() == expected_ids


def test_take_rows_after_mask_uses_rank_not_ids(lazy_runner):
    ds = inline(lazy_runner, id=list(range(10)), keep=[i % 2 == 0 for i in range(10)])
    kept = ds.mask_rows(ds.col_boolean("keep"))
    out = lazy_runner.to_pandas(kept.take(2, offset=1))
    # kept rows have ids 0,2,4,6,8; slice [1:][:2] -> ids 2,4
    assert out["id"].tolist() == [2, 4]


# --------------------------- F2: types ---------------------------------- #


def test_inline_types_roundtrip(lazy_runner):
    ds = inline(
        lazy_runner,
        text_col=["hello", "world", "test", "data"],
        numeric_col=[1.0, 2.5, 3.7, 4.2],
        int_col=[10, 20, 30, 40],
        bool_col=[True, False, True, False],
        category_col=["A", "B", "A", "C"],
    )
    out = lazy_runner.to_pandas(ds)
    assert out["text_col"].tolist() == ["hello", "world", "test", "data"]
    assert out["int_col"].tolist() == [10, 20, 30, 40]
    assert out["bool_col"].tolist() == [True, False, True, False]
    assert out["numeric_col"].tolist() == [1.0, 2.5, 3.7, 4.2]


def test_empty_dataset_passthrough(lazy_runner):
    ds = inline(lazy_runner, id=[], value=[])
    assert len(lazy_runner.to_pandas(ds)) == 0
    masked = ds.mask_rows(ds.col_boolean("value"))
    # empty mask on empty dataset passes through (reference :810-812)


def test_single_row(lazy_runner):
    ds = inline(lazy_runner, id=[42], value=["x"])
    out = lazy_runner.to_pandas(ds.take(5))
    assert out["id"].tolist() == [42]


def test_missing_column_raises(lazy_runner):
    ds = inline(lazy_runner, id=[1])
    with pytest.raises(KeyError):
        lazy_runner.to_pandas(ds.col_text("nope"))


# --------------------------- F3: vectors -------------------------------- #


def test_vector_to_scalar(lazy_runner):
    ds = inline(
        lazy_runner,
        embeddings=[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]],
        labels=["A", "B", "C"],
    )
    out = lazy_runner.to_numpy(ds.col_vector("embeddings").col(1))
    assert out.tolist() == [2.0, 5.0, 8.0]


def test_vector_to_scalar_out_of_bounds(lazy_runner):
    ds = inline(lazy_runner, embeddings=[[1.0, 2.0], [3.0, 4.0]])
    with pytest.raises(IndexError):
        lazy_runner.to_numpy(ds.col_vector("embeddings").col(5))


def test_vector_negative_index_rejected(lazy_runner):
    ds = inline(lazy_runner, embeddings=[[1.0, 2.0]])
    with pytest.raises(Exception):
        ds.col_vector("embeddings").col(-1)


def test_vector_export_is_2d_numpy(lazy_runner):
    ds = inline(lazy_runner, embeddings=[[1.0, 2.0], [3.0, 4.0]])
    arr = lazy_runner.to_numpy(ds.col_vector("embeddings"))
    assert arr.shape == (2, 2)


# --------------------------- F4: arithmetic ----------------------------- #


def test_pairwise_arithmetic_goldens(lazy_runner):
    ds = inline(lazy_runner, score_a=[1.0, 2.0, 3.0], score_b=[0.5, 1.5, 2.5])
    a, b = ds.col_score("score_a"), ds.col_score("score_b")
    assert lazy_runner.to_numpy(a + b).tolist() == [1.5, 3.5, 5.5]
    assert lazy_runner.to_numpy(a - b).tolist() == [0.5, 0.5, 0.5]
    assert lazy_runner.to_numpy(a * b).tolist() == [0.5, 3.0, 7.5]
    div = lazy_runner.to_numpy(a / b)
    assert div[0] == 2.0 and abs(div[1] - 4.0 / 3.0) < 1e-12 and div[2] == 1.2


def test_arithmetic_numpy_division_semantics(lazy_runner):
    ds = inline(lazy_runner, a=[1.0, -1.0, 0.0], b=[0.0, 0.0, 0.0])
    out = lazy_runner.to_numpy(ds.col_score("a") / ds.col_score("b"))
    assert out[0] == math.inf and out[1] == -math.inf and math.isnan(out[2])


def test_arithmetic_mismatched_lengths_raise(lazy_runner):
    ds1 = inline(lazy_runner, a=[1.0, 2.0, 3.0])
    ds2 = inline(lazy_runner, b=[1.0, 2.0])
    with pytest.raises(ValueError, match="length"):
        lazy_runner.to_numpy(ds1.col_score("a") + ds2.col_score("b"))


def test_cross_dataset_same_length_positional(lazy_runner):
    """Columns of *different* datasets combine positionally when lengths
    match (reference §1.5)."""
    ds1 = inline(lazy_runner, a=[1.0, 2.0, 3.0])
    ds2 = inline(lazy_runner, b=[10.0, 20.0, 30.0])
    out = lazy_runner.to_numpy(ds1.col_score("a") + ds2.col_score("b"))
    assert out.tolist() == [11.0, 22.0, 33.0]


# --------------------------- F5: boolean logic -------------------------- #


def test_boolean_logic_truth_tables(lazy_runner):
    ds = inline(
        lazy_runner,
        a=[True, True, False, False],
        b=[True, False, True, False],
        c=[False, True, True, False],
    )
    a, b, c = ds.col_boolean("a"), ds.col_boolean("b"), ds.col_boolean("c")
    r = lazy_runner.to_numpy
    assert r(a & b).tolist() == [True, False, False, False]
    assert r(a | b).tolist() == [True, True, True, False]
    assert r(a ^ b).tolist() == [False, True, True, False]
    assert r(~a).tolist() == [False, False, True, True]
    assert r((a & b) | c).tolist() == [True, True, True, False]
    assert r(~(a ^ b) & c).tolist() == [False, False, False, False]


def test_boolean_requires_bool_dtype(lazy_runner):
    ds = inline(lazy_runner, a=[1, 2], b=[True, False])
    with pytest.raises(TypeError):
        lazy_runner.to_numpy(ds.col_boolean("a") & ds.col_boolean("b"))


# --------------------------- F6: category membership -------------------- #


def test_category_true_values_only(lazy_runner):
    ds = inline(lazy_runner, categories=["yes", "no", "maybe", "unknown"])
    col = ds.col_categorical("categories")
    out = lazy_runner.to_numpy(col.is_in({"yes", "maybe"}))
    assert out.tolist() == [True, False, True, False]


def test_category_false_values_only(lazy_runner):
    ds = inline(lazy_runner, categories=["yes", "no", "maybe", "unknown"])
    out = lazy_runner.to_numpy(ds.col_categorical("categories").not_in({"no"}))
    assert out.tolist() == [True, False, True, True]


def test_category_both_with_subset_validation(lazy_runner):
    ds = inline(lazy_runner, categories=["yes", "no", "yes"])
    col = ds.col_categorical("categories")
    out = lazy_runner.to_numpy(
        col.is_in(true_values={"yes"}, false_values={"no"})
    )
    assert out.tolist() == [True, False, True]

    ds2 = inline(lazy_runner, categories=["yes", "no", "maybe"])
    with pytest.raises(ValueError, match="outside"):
        lazy_runner.to_numpy(
            ds2.col_categorical("categories").is_in(
                true_values={"yes"}, false_values={"no"}
            )
        )


def test_category_case_sensitive(lazy_runner):
    ds = inline(lazy_runner, categories=["No", "no"])
    out = lazy_runner.to_numpy(ds.col_categorical("categories").is_in({"no"}))
    assert out.tolist() == [False, True]


def test_split_column_membership(lazy_runner):
    ds = inline(lazy_runner, split=["train", "test", "validation", "train"])
    col = ds.col_train_test_split("split")
    assert lazy_runner.to_numpy(col.train).tolist() == [True, False, False, True]
    assert lazy_runner.to_numpy(col.test).tolist() == [False, True, False, False]


# --------------------------- F7: mask_rows ------------------------------ #


def test_mask_rows_golden(lazy_runner):
    ds = inline(
        lazy_runner,
        name=["Alice", "Bob", "Charlie", "Diana"],
        age=[25, 30, 35, 28],
        active=[True, False, True, False],
    )
    out = lazy_runner.to_pandas(ds.mask_rows(ds.col_boolean("active")))
    assert out["name"].tolist() == ["Alice", "Charlie"]


def test_mask_rows_composite(lazy_runner):
    ds = inline(
        lazy_runner,
        name=["Alice", "Bob", "Charlie", "Diana"],
        is_adult=[True, False, False, True],
        is_active=[True, True, False, True],
    )
    mask = ds.col_boolean("is_adult") & ds.col_boolean("is_active")
    out = lazy_runner.to_pandas(ds.mask_rows(mask))
    assert out["name"].tolist() == ["Alice", "Diana"]


def test_mask_all_false_and_all_true(lazy_runner):
    ds = inline(lazy_runner, v=[1, 2], t=[True, True], f=[False, False])
    assert len(lazy_runner.to_pandas(ds.mask_rows(ds.col_boolean("t")))) == 2
    assert len(lazy_runner.to_pandas(ds.mask_rows(ds.col_boolean("f")))) == 0


def test_mask_length_mismatch_raises(lazy_runner):
    ds1 = inline(lazy_runner, v=[1, 2, 3])
    ds2 = inline(lazy_runner, m=[True, False])
    with pytest.raises(ValueError, match="length"):
        lazy_runner.to_pandas(ds1.mask_rows(ds2.col_boolean("m")))


def test_mask_keeps_original_row_ids(lazy_runner):
    """Downstream ops re-align by id: masked rows keep identity."""
    ds = inline(lazy_runner, v=[10, 20, 30, 40], keep=[False, True, False, True])
    masked = ds.mask_rows(ds.col_boolean("keep"))
    df = lazy_runner.dataframe(masked, keep_row_id=True).toPandas()
    assert sorted(df["__row_id"].tolist()) == [1, 3]


# --------------------------- F8: train/test split ----------------------- #


def test_split_rng_parity_goldens(lazy_runner):
    """Exact CPython-RNG assignments (reference golden contract)."""
    import random

    ds = inline(lazy_runner, t=["a", "b", "c", "d"])
    out = lazy_runner.to_numpy(
        ds.assign_train_test_split(test_size=0.5, random_state=42)
    )
    rng = random.Random(42)
    test_idx = set(rng.sample(range(4), 2))
    expected = ["test" if i in test_idx else "train" for i in range(4)]
    assert out.tolist() == expected


def test_split_train_size_int(lazy_runner):
    import random

    ds = inline(lazy_runner, t=["a", "b", "c", "d", "e"])
    out = lazy_runner.to_numpy(
        ds.assign_train_test_split(train_size=3, random_state=7)
    )
    rng = random.Random(7)
    test_idx = set(rng.sample(range(5), 2))
    expected = ["test" if i in test_idx else "train" for i in range(5)]
    assert out.tolist() == expected


def test_split_default_quarter(lazy_runner):
    ds = inline(lazy_runner, t=list("abcdefgh"))
    out = lazy_runner.to_numpy(ds.assign_train_test_split(random_state=1))
    assert sum(v == "test" for v in out) == 2  # ceil(0.25 * 8)


def test_split_errors(lazy_runner):
    ds = inline(lazy_runner, t=["a", "b", "c"])
    with pytest.raises(ValueError):
        lazy_runner.to_numpy(ds.assign_train_test_split(test_size=1.5))
    with pytest.raises(ValueError):
        lazy_runner.to_numpy(ds.assign_train_test_split(test_size=5))
    with pytest.raises(ValueError):
        lazy_runner.to_numpy(
            ds.assign_train_test_split(test_size=2, train_size=2)
        )


def test_split_hash_mode_deterministic_and_sized(lazy_runner):
    ds = inline(lazy_runner, t=[f"r{i}" for i in range(1000)])
    split = ds.assign_train_test_split(test_size=0.25, method="hash")
    out1 = lazy_runner.to_numpy(split)
    out2 = lazy_runner.to_numpy(split)
    assert out1.tolist() == out2.tolist()
    frac = sum(v == "test" for v in out1) / 1000
    assert 0.2 < frac < 0.3


# --------------------------- F9: jinja templates ------------------------ #


def test_template_multi_variable(lazy_runner):
    ds = inline(lazy_runner, name=["Alice", "Bob"], age=["25", "30"])
    op = ds.template(
        "Hello {{name}}, age {{age}}",
        name=ds.col_text("name"),
        age=ds.col_text("age"),
    )
    out = lazy_runner.to_numpy(op)
    assert out.tolist() == ["Hello Alice, age 25", "Hello Bob, age 30"]


def test_template_conditionals_loops_filters(lazy_runner):
    ds = inline(lazy_runner, score=["95", "55"], items=["a,b", "c"])
    op = ds.template(
        "{% if score|int >= 90 %}PASS{% else %}FAIL{% endif %}:"
        "{% for i in items.split(',') %}[{{i|upper}}]{% endfor %}",
        score=ds.col_text("score"),
        items=ds.col_text("items"),
    )
    assert lazy_runner.to_numpy(op).tolist() == ["PASS:[A][B]", "FAIL:[C]"]


def test_template_constants_and_truncation(lazy_runner):
    ds = inline(lazy_runner, item=["apple", "banana"])
    op = ds.template(
        "Item: {{item}}, Category: {{cat}}",
        item=ds.col_text("item"),
        cat="fruit",
        max_length=20,
    )
    out = lazy_runner.to_numpy(op)
    assert out.tolist() == ["Item: apple, Categor", "Item: banana, Catego"]


def test_template_strip_whitespace(lazy_runner):
    ds = inline(lazy_runner, x=["1"])
    op = ds.template("  {{x}}  ", x=ds.col_text("x"))
    assert lazy_runner.to_numpy(op).tolist() == ["1"]


# --------------------------- F10: JSON ---------------------------------- #


def test_parse_json_and_get_field(lazy_runner):
    ds = inline(
        lazy_runner,
        js=['{"tool":"search","n":1}', '{"tool":"calc","n":2}'],
    )
    parsed = ds.col_text("js").parse_json()
    out = lazy_runner.to_numpy(parsed.get_field("tool"))
    assert out.tolist() == ["search", "calc"]
    nums = lazy_runner.to_numpy(parsed.get_field("n"))
    assert nums.tolist() == ["1", "2"]


def test_parse_json_roundtrip_export(lazy_runner):
    import json

    ds = inline(lazy_runner, js=['{"a": [1, 2], "b": {"c": "x"}}'])
    parsed = ds.col_text("js").parse_json()
    out = lazy_runner.to_numpy(parsed)
    assert json.loads(out[0]) == {"a": [1, 2], "b": {"c": "x"}}


def test_parse_json_invalid_raises(lazy_runner):
    ds = inline(lazy_runner, js=["not json"])
    with pytest.raises(Exception):
        lazy_runner.to_numpy(ds.col_text("js").parse_json())


# --------------------------- row ids ------------------------------------ #


def test_assign_row_id(lazy_runner):
    ds = inline(lazy_runner, v=["a", "b", "c"])
    out = lazy_runner.to_numpy(ds.assign_row_id())
    assert out.tolist() == [0, 1, 2]
