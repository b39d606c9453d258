from .base import BaseRunner, DispatchError
from .plan import ROW_ID, VALUE, ArtifactPlan, ColumnPlan, DatasetPlan
from .cached_runner import CachedResultStore, LocalCachedRunner
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
]
