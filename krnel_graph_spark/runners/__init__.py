import warnings
import weakref

from .base import BaseRunner, DispatchError
from .plan import ROW_ID, VALUE, ArtifactPlan, ColumnPlan, DatasetPlan
from .cached_runner import CachedResultStore, LocalCachedRunner
from .llm_impl import ModelProvider, get_provider, register_model_provider
from .spark_runner import SparkRunner, get_spark
from .store import ResultStore

__all__ = [
    "BaseRunner",
    "DispatchError",
    "ROW_ID",
    "VALUE",
    "ArtifactPlan",
    "ColumnPlan",
    "DatasetPlan",
    "SparkRunner",
    "LocalCachedRunner",
    "CachedResultStore",
    "get_spark",
    "ResultStore",
    "Runner",
    "ModelProvider",
    "register_model_provider",
    "get_provider",
]

# Weak refs: a dropped runner (and its SparkSession handle) must be
# collectable; the registry only deduplicates live instances.
_RUNNER_REGISTRY: "weakref.WeakValueDictionary" = weakref.WeakValueDictionary()
_MULTIPLE_RUNNERS_WARNING_EMITTED = False


def _find_runner_class(name: str):
    def walk(cls):
        yield cls
        for sub in cls.__subclasses__():
            yield from walk(sub)

    for cls in walk(SparkRunner):
        if cls.__name__ == name:
            return cls
    return None


def _hashable(value):
    if isinstance(value, dict):
        return frozenset((k, _hashable(v)) for k, v in sorted(value.items()))
    if isinstance(value, (list, tuple)):
        return tuple(_hashable(v) for v in value)
    if isinstance(value, set):
        return frozenset(_hashable(v) for v in value)
    return value


def Runner(*, type: str | None = None, **kwargs) -> SparkRunner:  # noqa: N802
    """Config-driven runner factory (parity: reference
    ``runners/__init__.py:54-100``).

    Resolves the runner class from ``type`` (or config ``runner_type``),
    fills ``store_path``/``cache_path`` defaults from config, and caches
    instances by (class, params) so repeated calls share one runner — ops
    built against different runner instances cannot be mixed in a graph.

    Configuration priority: explicit args > ``KRNEL_SPARK_*`` env vars >
    JSON config file > defaults.
    """
    global _MULTIPLE_RUNNERS_WARNING_EMITTED
    from ..config import KrnelGraphSparkConfig

    config = KrnelGraphSparkConfig()
    type_name = type or config.runner_type
    runner_class = _find_runner_class(type_name)
    if runner_class is None:
        raise ValueError(f"Unknown runner type: {type_name!r}")

    if "store_path" not in kwargs:
        kwargs["store_path"] = config.store_uri
    if runner_class is LocalCachedRunner and "cache_path" not in kwargs:
        kwargs["cache_path"] = None  # resolved per-store inside the runner

    key = (runner_class, type_name, _hashable(kwargs))
    cached = _RUNNER_REGISTRY.get(key)
    if cached is not None:
        return cached
    runner = runner_class(**kwargs)
    _RUNNER_REGISTRY[key] = runner
    if len(_RUNNER_REGISTRY) > 1 and not _MULTIPLE_RUNNERS_WARNING_EMITTED:
        _MULTIPLE_RUNNERS_WARNING_EMITTED = True
        warnings.warn(
            "Multiple distinct runner contexts detected. Operations from "
            "different runners cannot be mixed in the same graph.",
            stacklevel=2,
        )
    return runner
