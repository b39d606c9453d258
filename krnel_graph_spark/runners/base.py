"""Runner protocol: per-op-type implementation registry with MRO dispatch.

An implementation is a plain function decorated with
``@SomeRunner.implementation`` whose second parameter's type annotation names
the OpSpec (sub)class it handles. Dispatch walks the op's class MRO from most
to least specific; registering two handlers for the same class is an error.
Parity with the reference's dispatch design (``runners/base_runner.py:195-302``);
original implementation.
"""

from __future__ import annotations

import typing
from typing import Any, Callable, Optional

from ..plans.op_spec import OpSpec


class DispatchError(TypeError):
    pass


class RunnerMeta(type):
    """Gives each Runner class its own implementation table (inheriting the
    parent's entries)."""

    def __new__(mcls, name, bases, ns):
        cls = super().__new__(mcls, name, bases, ns)
        merged: dict[type, Callable] = {}
        for base in reversed(cls.__mro__[1:]):
            merged.update(getattr(base, "_impl_table", {}))
        cls._impl_table = merged
        return cls


class BaseRunner(metaclass=RunnerMeta):
    _impl_table: dict[type, Callable]

    @classmethod
    def implementation(cls, fn: Callable) -> Callable:
        hints = typing.get_type_hints(fn)
        params = [p for p in fn.__code__.co_varnames[: fn.__code__.co_argcount]]
        if len(params) < 2:
            raise DispatchError(
                f"Implementation {fn.__name__} must take (runner, op, ...)"
            )
        op_type = hints.get(params[1])
        if op_type is None or not (
            isinstance(op_type, type) and issubclass(op_type, OpSpec)
        ):
            raise DispatchError(
                f"Implementation {fn.__name__}'s second parameter must be "
                f"annotated with an OpSpec subclass, got {op_type!r}"
            )
        if op_type in cls._impl_table and cls._impl_table[op_type] is not fn:
            raise DispatchError(
                f"Duplicate implementation for {op_type.__name__} on {cls.__name__}"
            )
        cls._impl_table = {**cls._impl_table, op_type: fn}
        return fn

    def dispatch(self, op: OpSpec) -> Callable:
        for klass in type(op).__mro__:
            fn = self._impl_table.get(klass)
            if fn is not None:
                return fn
        raise DispatchError(
            f"{type(self).__name__} has no implementation for "
            f"{type(op).__name__} (op {op.short_name()})"
        )
