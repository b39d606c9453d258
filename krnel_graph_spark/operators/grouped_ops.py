"""Grouped-op spec: materialize several ops as one unit (CLI batching).
Parity: reference ``src/krnel/graph/grouped_ops.py:8-17``."""

from __future__ import annotations

from ..plans.op_spec import OpSpec


class GroupedOp(OpSpec):
    """Materializes each op in ``ops`` in order; the group's result is the
    last op's result."""

    ops: list[OpSpec]
