"""Graph rewriting over content-addressed OpSpec DAGs.

Capability parity with the reference's transformation engine
(krnel-graph ``src/krnel/graph/graph_transformations.py:112-160``): replacing
any node inside a graph rebuilds every node downstream of it, since identities
are content hashes. Original implementation.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

from .op_spec import GraphError, OpSpec


def map_fields(node: OpSpec, fn: Callable[[OpSpec], OpSpec]) -> OpSpec:
    """Rebuild ``node`` with ``fn`` applied to every direct OpSpec input
    (including those nested inside list/dict/tuple fields). Returns a new node
    if anything changed, else the original node."""
    changed = False
    fields: dict[str, Any] = {}

    def apply(value: Any) -> Any:
        nonlocal changed
        if isinstance(value, OpSpec):
            new = fn(value)
            if new.uuid != value.uuid:
                changed = True
            return new
        if isinstance(value, list):
            return [apply(v) for v in value]
        if isinstance(value, tuple):
            return tuple(apply(v) for v in value)
        if isinstance(value, dict):
            return {k: apply(v) for k, v in value.items()}
        return value

    for name in type(node).model_fields:
        fields[name] = apply(getattr(node, name))
    return type(node)(**fields) if changed else node


def graph_substitute(
    roots: Iterable[OpSpec], mapping: dict[OpSpec, OpSpec]
) -> list[OpSpec]:
    """Replace every occurrence of each key node with its value node anywhere
    in the graphs under ``roots``, rebuilding all downstream nodes.

    Substitution is applied transitively bottom-up in one pass: a replacement's
    own upstream graph is *not* re-walked (it is taken as-is), matching the
    reference's semantics. Raises :class:`GraphError` if a requested
    substitution never matched any node.
    """
    roots = list(roots)
    replace_by_uuid = {old.uuid: new for old, new in mapping.items()}
    if not replace_by_uuid:
        return roots
    rebuilt: dict[str, OpSpec] = {}
    matched: set[str] = set()

    def rewrite(node: OpSpec) -> OpSpec:
        if node.uuid in replace_by_uuid:
            matched.add(node.uuid)
            return replace_by_uuid[node.uuid]
        cached = rebuilt.get(node.uuid)
        if cached is None:
            cached = map_fields(node, rewrite)
            rebuilt[node.uuid] = cached
        return cached

    out = [rewrite(r) for r in roots]
    missing = set(replace_by_uuid) - matched
    if missing:
        raise GraphError(
            f"Substitution target(s) not found in graph: {sorted(missing)[:3]}"
        )
    return out
