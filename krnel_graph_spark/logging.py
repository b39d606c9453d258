"""Structured logging with the reference's surface (parity:
``/root/reference/src/krnel/logging.py`` — ``configure_logging()`` +
``get_logger(rel)`` returning a key-value bound logger).

The reference builds on structlog; this module uses structlog when it is
installed and otherwise falls back to a dependency-free stdlib
implementation with the same call shape:

    log = get_logger("runners.spark")
    log = log.bind(op=op.uuid, rows=n)
    log.info("materialized", seconds=1.2)

renders ``materialized  op=... rows=... seconds=1.2`` through the
standard ``logging`` machinery (so Spark apps can route/filter it like
any other logger). Executors inherit nothing from the driver's logging
config — workers that need logs call ``get_logger`` locally, which is
why the fallback keeps zero process-global state beyond stdlib logging.

Env: ``SPARK_GRAFT_LOG_LEVEL`` (default INFO).
"""

from __future__ import annotations

import logging
import os

try:  # the reference's actual backend, when present
    import structlog  # type: ignore

    _HAVE_STRUCTLOG = True
except ImportError:  # pragma: no cover - structlog absent in container
    structlog = None
    _HAVE_STRUCTLOG = False

_CONFIGURED = False
_ROOT_NAME = "krnel_graph_spark"


def configure_logging(
    log_level: str | None = None, force_reconfigure: bool = False
) -> None:
    """Idempotent global setup (reference ``logging.py:11-36``): level
    from the arg, else ``SPARK_GRAFT_LOG_LEVEL``, else INFO."""
    global _CONFIGURED
    if _CONFIGURED and not force_reconfigure:
        return
    level_name = (
        log_level or os.getenv("SPARK_GRAFT_LOG_LEVEL", "INFO")
    ).upper()
    level = getattr(logging, level_name, logging.INFO)
    if _HAVE_STRUCTLOG:  # pragma: no cover - structlog absent in container
        structlog.configure(
            processors=[
                structlog.contextvars.merge_contextvars,
                structlog.processors.add_log_level,
                structlog.processors.TimeStamper(
                    fmt="%Y-%m-%d %H:%M:%S", utc=False
                ),
                structlog.dev.ConsoleRenderer(sort_keys=False),
            ],
            wrapper_class=structlog.make_filtering_bound_logger(level),
            context_class=dict,
            cache_logger_on_first_use=False,
        )
    else:
        root = logging.getLogger(_ROOT_NAME)
        root.setLevel(level)
        if not root.handlers:
            handler = logging.StreamHandler()
            handler.setFormatter(
                logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")
            )
            root.addHandler(handler)
        root.propagate = False
    _CONFIGURED = True


class BoundLogger:
    """stdlib fallback with structlog's bind/unbind + level methods.

    Immutable: ``bind`` returns a NEW logger, so a bound context can be
    threaded through helper calls without leaking key-values upward."""

    __slots__ = ("_logger", "_context")

    def __init__(self, logger: logging.Logger, context: dict | None = None):
        self._logger = logger
        self._context = dict(context or {})

    def bind(self, **kv) -> "BoundLogger":
        merged = dict(self._context)
        merged.update(kv)
        return BoundLogger(self._logger, merged)

    def unbind(self, *keys: str) -> "BoundLogger":
        remaining = {
            k: v for k, v in self._context.items() if k not in keys
        }
        return BoundLogger(self._logger, remaining)

    def _render(self, event: str, kv: dict) -> str:
        pairs = dict(self._context)
        pairs.update(kv)
        if not pairs:
            return event
        rendered = " ".join(f"{k}={v!r}" for k, v in pairs.items())
        return f"{event}  {rendered}"

    def debug(self, event: str, **kv) -> None:
        self._logger.debug(self._render(event, kv))

    def info(self, event: str, **kv) -> None:
        self._logger.info(self._render(event, kv))

    def warning(self, event: str, **kv) -> None:
        self._logger.warning(self._render(event, kv))

    def error(self, event: str, **kv) -> None:
        self._logger.error(self._render(event, kv))

    def exception(self, event: str, **kv) -> None:
        self._logger.exception(self._render(event, kv))


def get_logger(rel: str | None = None):
    """Named logger under the package root (reference ``logging.py:42-44``:
    ``get_logger("x")`` -> logger ``krnel.x``; here the root is
    ``krnel_graph_spark``)."""
    configure_logging()
    name = _ROOT_NAME if not rel else f"{_ROOT_NAME}.{rel}"
    if _HAVE_STRUCTLOG:  # pragma: no cover
        return structlog.get_logger(name)
    return BoundLogger(logging.getLogger(name))
