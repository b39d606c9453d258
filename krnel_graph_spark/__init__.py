"""krnel-graph-spark: a PySpark-native dataflow/analytics engine with the
query and data-processing capabilities of krnel-ai/krnel-graph, re-designed
Spark-first.

Three layers (see SURVEY.md §7.0):

1. ``plans``     — pure-Python content-addressed OpSpec DAG (no Spark).
2. ``runners``   — SparkRunner lowers OpSpecs to lazy DataFrames with a
                   stable ``__row_id`` discipline; non-ephemeral results
                   persist to a UUID-keyed parquet store (cross-run
                   memoization).
3. ``functions`` — Spark-native building blocks for scale operators:
   relational (joins/aggs/windows), deduplication (exact/MinHash-LSH/
   SimHash/Jaccard/embedding), similarity search, text analysis,
   multimodal plumbing, streaming.
"""

from .plans import (
    EphemeralOpMixin,
    ExcludeFromUUID,
    GraphDiff,
    GraphError,
    OpSpec,
    OpState,
    OpStatus,
    UUIDMismatchError,
    deserialize_graph,
    graph_substitute,
    serialize_graph,
)
from .runners import LocalCachedRunner, Runner, SparkRunner, get_spark
from .types import (
    BooleanColumnType,
    CategoricalColumnType,
    ClassifierType,
    ColumnType,
    ConversationColumnType,
    DatasetType,
    EvaluationReportType,
    JSONColumnType,
    RowIDColumnType,
    ScoreColumnType,
    TextColumnType,
    TrainTestSplitColumnType,
    VectorColumnType,
    VizEmbeddingColumnType,
)

__version__ = "0.1.0"

__all__ = [name for name in dir() if not name.startswith("_")]
