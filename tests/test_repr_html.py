"""Notebook display: mermaid graph repr + SVG scatter for viz embeddings."""

from krnel_graph_spark.repr_html import display_viz, graph_mermaid, scatter_svg


def test_graph_mermaid_nodes_and_edges(lazy_runner):
    ds = lazy_runner.from_inline_dataset({"t": ["a", "b"], "s": [1.0, 2.0]})
    mask = ds.col_categorical("t").is_in({"a"})
    op = ds.mask_rows(mask)
    src = graph_mermaid(op)
    assert src.startswith("flowchart RL")
    assert "MaskRowsOp" in src and "LoadInlineJsonDatasetOp" in src
    assert "-->|dataset|" in src and "-->|mask|" in src


def test_repr_mimebundle_renders(lazy_runner):
    ds = lazy_runner.from_inline_dataset({"t": ["a"]})
    bundle = ds.col_text("t")._repr_mimebundle_()
    assert "text/html" in bundle and "mermaid" in bundle["text/html"]
    assert bundle["text/plain"].startswith("SelectTextColumnOp")


def test_scatter_svg_colors_by_label():
    svg = scatter_svg([(0, 0), (1, 1), (2, 0)], labels=["a", "b", "a"])
    assert svg.count("<circle") == 3
    assert svg.count("#4269d0") == 2  # two 'a' points share the first color


def test_display_viz_end_to_end(lazy_runner):
    ds = lazy_runner.from_inline_dataset(
        {"vec": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], "lab": ["x", "y", "x"]}
    )
    coords = ds.col_vector("vec").umap_vis(method="pca")
    svg = display_viz(lazy_runner, coords, label_op=ds.col_categorical("lab"))
    assert svg.count("<circle") == 3
