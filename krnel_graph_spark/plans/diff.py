"""Graph diffing: compare two OpSpec pipelines.

Parity with the reference's ``GraphDiff`` (``src/krnel/graph/graph_diff.py:
10-51``): given two root ops, report which nodes are only in one graph,
which are shared (content-addressing makes this exact — same UUID ⇔ same
upstream computation), and render a unified pseudocode diff for humans.
The signature use case is "what changed between these two pipelines?"
after a ``subs()`` rewrite (swap dataset, keep pipeline).
"""

from __future__ import annotations

import difflib

from .op_spec import OpSpec


class GraphDiff:
    """Structural diff of two OpSpec graphs."""

    def __init__(self, a: OpSpec, b: OpSpec):
        self.a = a
        self.b = b
        nodes_a = {n.uuid: n for n in a.iter_graph()}
        nodes_b = {n.uuid: n for n in b.iter_graph()}
        self.only_a: list[OpSpec] = [
            n for u, n in nodes_a.items() if u not in nodes_b
        ]
        self.only_b: list[OpSpec] = [
            n for u, n in nodes_b.items() if u not in nodes_a
        ]
        self.common: list[OpSpec] = [
            n for u, n in nodes_a.items() if u in nodes_b
        ]

    @property
    def identical(self) -> bool:
        return self.a.uuid == self.b.uuid

    def unified(self, n_context: int = 3) -> str:
        """Unified diff of the two graphs' pseudocode renderings."""
        return "\n".join(
            difflib.unified_diff(
                self.a.to_code().splitlines(),
                self.b.to_code().splitlines(),
                fromfile=self.a.short_name(),
                tofile=self.b.short_name(),
                n=n_context,
                lineterm="",
            )
        )

    def __str__(self) -> str:
        if self.identical:
            return f"graphs identical ({self.a.short_name()})"
        head = (
            f"only in A: {len(self.only_a)}  only in B: {len(self.only_b)}  "
            f"shared: {len(self.common)}"
        )
        return head + "\n" + self.unified()
