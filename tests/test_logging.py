"""Structured-logging surface (reference parity: ``krnel/logging.py`` —
``configure_logging`` + ``get_logger`` with key-value bound loggers)."""

from __future__ import annotations

import logging

from krnel_graph_spark.logging import BoundLogger, configure_logging, get_logger


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.messages: list[str] = []

    def emit(self, record):
        self.messages.append(record.getMessage())


def _capture():
    """The package logger doesn't propagate to root (a Spark app's root
    config shouldn't double-print it), so tests attach their own handler."""
    configure_logging(log_level="INFO", force_reconfigure=True)
    h = _Capture()
    logging.getLogger("krnel_graph_spark").addHandler(h)
    return h


def _release(h):
    logging.getLogger("krnel_graph_spark").removeHandler(h)


def test_get_logger_names_and_binding():
    h = _capture()
    try:
        log = get_logger("runners.spark")
        log.bind(op="SelectColumnOp", rows=5).info("materialized", sec=1.25)
    finally:
        _release(h)
    assert len(h.messages) == 1
    msg = h.messages[0]
    assert msg.startswith("materialized")
    assert "op='SelectColumnOp'" in msg and "rows=5" in msg and "sec=1.25" in msg


def test_bind_is_immutable_and_unbind_drops_keys():
    h = _capture()
    try:
        base = get_logger("x")
        bound = base.bind(a=1, b=2)
        rebound = bound.unbind("a")
        if isinstance(base, BoundLogger):  # stdlib fallback path
            assert base._context == {}
            assert bound._context == {"a": 1, "b": 2}
            assert rebound._context == {"b": 2}
        base.info("clean")
    finally:
        _release(h)
    assert h.messages[-1] == "clean"


def test_configure_is_idempotent():
    configure_logging()
    root = logging.getLogger("krnel_graph_spark")
    n = len(root.handlers)
    configure_logging()
    assert len(logging.getLogger("krnel_graph_spark").handlers) == n
    configure_logging(log_level="DEBUG", force_reconfigure=True)
    assert logging.getLogger("krnel_graph_spark").level == logging.DEBUG
    configure_logging(log_level="INFO", force_reconfigure=True)


def test_runner_materialization_emits_lifecycle_logs(runner):
    ds = runner.from_inline_dataset({"t": ["a", "b"]})
    op = ds.template("x {{ v }}", v=ds.col_text("t"))
    h = _capture()
    try:
        runner.to_pandas(op)
    finally:
        _release(h)
    assert any(m.startswith("materializing") for m in h.messages)
    assert any(m.startswith("completed") for m in h.messages)
