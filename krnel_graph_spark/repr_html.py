"""Notebook display for op graphs and viz embeddings.

Parity surface: reference ``repr_html.py`` (mermaid flowchart of the op
graph via ``_repr_mimebundle_``) and ``viz_ops.py:54-119`` (scatter display
for UMAP coordinates). The scatter here is a dependency-free inline SVG
rather than jscatter — nothing to install, renders in any notebook."""

from __future__ import annotations

import html as _html
import json
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from .plans.op_spec import OpSpec

_TEMPLATE = """flowchart RL
{nodes}
{edges}
"""


def _node_id(op: "OpSpec") -> str:
    return op.uuid.replace("-", "_")


def _dep_fields(op: "OpSpec"):
    """(field_name, dep) pairs for every OpSpec-valued field."""
    from .plans.op_spec import OpSpec

    for name in type(op).model_fields:
        value = getattr(op, name)
        if isinstance(value, OpSpec):
            yield name, value
        elif isinstance(value, (list, tuple)):
            for i, v in enumerate(value):
                if isinstance(v, OpSpec):
                    yield f"{name}[{i}]", v
        elif isinstance(value, dict):
            for k, v in value.items():
                if isinstance(v, OpSpec):
                    yield f"{name}[{k!r}]", v


def graph_mermaid(op: "OpSpec") -> str:
    """Mermaid flowchart source for the op's dependency graph."""
    nodes, edges, seen = [], [], set()
    for node in [*op.get_dependencies(recursive=True), op]:
        if node.uuid in seen:
            continue
        seen.add(node.uuid)
        label = node.short_name().replace('"', "'")
        nodes.append(f'{_node_id(node)}["{label}"]')
        for fname, dep in _dep_fields(node):
            edges.append(f"{_node_id(node)} -->|{fname}| {_node_id(dep)}")
    return _TEMPLATE.format(nodes="\n".join(nodes), edges="\n".join(edges))


def graph_mimebundle(op: "OpSpec") -> dict:
    """``_repr_mimebundle_`` payload: textual repr + client-side mermaid
    render (CDN import, as in the reference)."""
    import uuid as _uuid

    elem_id = f"mermaid-{_uuid.uuid4().hex}"
    mermaid = graph_mermaid(op)
    bundle = f"""
    <div id="{elem_id}"><pre>{_html.escape(repr(op))}</pre></div>
    <script>
    (async () => {{
      const el = document.getElementById("{elem_id}");
      el.innerHTML = {json.dumps(_html.escape(mermaid))};
      const mod = await import("https://cdn.jsdelivr.net/npm/mermaid@11/dist/mermaid.esm.min.mjs");
      const mermaid = mod.default || mod;
      try {{
        mermaid.initialize({{ startOnLoad: false }});
        await mermaid.run({{ nodes: [el] }});
      }} catch (err) {{ console.error("mermaid render error:", err); }}
    }})();
    </script>
    """
    return {"text/html": bundle, "text/plain": repr(op)}


def scatter_svg(
    coords,
    labels=None,
    width: int = 480,
    height: int = 360,
    radius: float = 2.5,
) -> str:
    """Self-contained SVG scatter of 2-D viz coordinates.

    ``coords``: iterable of (x, y); ``labels``: optional category per point
    (colors cycle through a fixed palette). Driver-side by design — a viz
    embedding is already a collected, human-scale artifact."""
    pts = [(float(x), float(y)) for x, y in coords]
    if not pts:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}"/>'
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    xr = (x1 - x0) or 1.0
    yr = (y1 - y0) or 1.0
    pad = 8
    palette = ["#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
               "#ff8ab7", "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0"]
    cats = {}
    circles = []
    for i, (x, y) in enumerate(pts):
        cx = pad + (x - x0) / xr * (width - 2 * pad)
        cy = height - pad - (y - y0) / yr * (height - 2 * pad)
        color = palette[0]
        if labels is not None:
            lab = labels[i]
            color = palette[cats.setdefault(lab, len(cats)) % len(palette)]
        circles.append(
            f'<circle cx="{cx:.1f}" cy="{cy:.1f}" r="{radius}" '
            f'fill="{color}" fill-opacity="0.75"/>'
        )
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        + "".join(circles)
        + "</svg>"
    )


def display_viz(runner, viz_op, label_op=None, **svg_kwargs) -> str:
    """HTML for a materialized UMAP/PCA embedding (optionally colored by a
    label column from the same dataset)."""
    pdf = runner.to_pandas(viz_op)
    coords = [(v[0], v[1]) for v in pdf[pdf.columns[0]]]
    labels = None
    if label_op is not None:
        lab_pdf = runner.to_pandas(label_op)
        labels = lab_pdf[lab_pdf.columns[0]].tolist()
    return scatter_svg(coords, labels, **svg_kwargs)
