from .base import BaseRunner, DispatchError
from .plan import ROW_ID, VALUE, ArtifactPlan, ColumnPlan, DatasetPlan
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
    "get_spark",
    "ResultStore",
]
