"""SparkRunner: lowers content-addressed OpSpec graphs to Spark DataFrames.

Execution model (Spark-first redesign of the reference's pull-based runner,
``runners/base_runner.py:159-258`` / ``local_arrow_runner.py:307-497``):

* **Ephemeral ops stay lazy.** Selects, predicates, filters, arithmetic lower
  to unexecuted DataFrame expressions; Catalyst fuses whole chains into one
  job with predicate pushdown and column pruning. (The reference's
  "ephemeral = recompute on demand" policy maps exactly onto laziness.)
* **Non-ephemeral ops are materialization barriers.** Their DataFrame is
  written once to a UUID-keyed parquet store and re-read lazily; any process
  sharing the store reuses results (content-addressed memoization — the one
  optimizer feature Catalyst does not provide).
* **Stable row ids everywhere** (see ``plan.py``): assigned at scan from
  parquet ``_metadata.row_index``, carried through every op, used for
  alignment and canonical export order.
"""

from __future__ import annotations

import contextlib
import hashlib
import math
import os
import random
from typing import Any, Optional, Union

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.scale_ops import (
    AnnTopKOp,
    GroupCapOp,
    PiiScrubOp,
    MixToWeightsOp,
    CdcChunkDedupOp,
    SkylineSelectOp,
    CalibrationBinsOp,
    PmiCollocationsOp,
    KneserNey3ScoreOp,
    KneserNeyScoreOp,
    DedupWeightsOp,
    SpanCorruptionOp,
    WinnowPairsOp,
    SequencePackOp,
    StratifiedSampleOp,
    C4RulesOp,
    ChunkDocumentsOp,
    CompressionSignalsOp,
    GopherRulesOp,
    DecontaminateAgainstOp,
    DropExactDupsOp,
    DropNearDupsOp,
    DsirWeightsOp,
    HashSampleOp,
    NgramCoverageOp,
    ParagraphDedupOp,
    TextStatsOp,
    TokenEntropyOp,
)
from ..operators.dataset_ops import (
    AssignRowIDOp,
    AssignTrainTestSplitOp,
    BooleanLogicOp,
    CategoryToBooleanOp,
    JinjaTemplatizeOp,
    JSONGetFieldOp,
    LoadCSVDatasetOp,
    LoadInlineJsonDatasetOp,
    LoadJSONLinesDatasetOp,
    LoadAvroDatasetOp,
    LoadORCDatasetOp,
    LoadTextLinesDatasetOp,
    LoadParquetDatasetOp,
    MaskRowsOp,
    PairwiseArithmeticOp,
    ParseJSONColumnOp,
    SelectColumnOp,
    TakeRowsOp,
    VectorToScalarOp,
)
from ..logging import get_logger
from ..operators.grouped_ops import GroupedOp
from ..plans.op_spec import OpSpec
from ..plans.status import OpState, OpStatus, utcnow
from ..types import DatasetType, JSONColumnType
from .base import BaseRunner
from .plan import ROW_ID, VALUE, ArtifactPlan, ColumnPlan, DatasetPlan
from .store import ResultStore

_FILE_ORD_SHIFT = 40  # multi-file scans: row_id = file_ordinal << 40 | row_index


def _default_shuffle_partitions(cpus: str) -> Optional[str]:
    """Initial shuffle-partition count (r15, pre-coalesce — AQE's
    parallelism-first coalescing adapts the FINAL count per query):

    * local mode: ``max(32, cores)`` — tied to the session's core count
      instead of the former magic 32, so a bigger local box is no longer
      ceilinged; identical to the old value at the driver's 32- and
      8-core bench configs by construction. Deriving ``2 x cores``
      instead was measured and REJECTED: interleaved at local[32]/sf0.1
      it cost +20% arpa_score_o5, +18% stupid_backoff_fixed, +8%
      connected_components with no win beyond noise
      (OPTIMIZATION_r15.md).
    * real cluster (``SPARK_MASTER``/``MASTER`` set): return None — do
      NOT pin a single-box constant; the submit-time conf or Spark's own
      default governs, and ``SPARK_SHUFFLE_PARTITIONS`` overrides. At
      100 TB size it so post-AQE partitions land in the 100 MB-1 GB
      range (guide §2.2), e.g. ~2 x total executor cores.
    """
    if os.environ.get("SPARK_MASTER") or os.environ.get("MASTER"):
        return None
    n = int(cpus) if cpus.isdigit() else (os.cpu_count() or 32)
    return str(max(32, n))


def get_spark(
    app_name: str = "krnel-graph-spark",
    shuffle_partitions: Optional[int] = None,
) -> SparkSession:
    """Build (or reuse) a session with the engine's defaults: AQE on, UTC
    timestamps, Arrow transfer on, zstd parquet output."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.ui.showConsoleProgress", "false")
        # local[N] runs all executor threads inside the driver JVM; the 1g
        # default heap GC-thrashes 32 concurrent tasks, while a huge heap
        # makes full GCs take tens of seconds late in long sessions — 16g
        # balances both. (No-op if the JVM is already up, e.g. on a real
        # cluster via spark-submit.)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g")
        )
        # Back-compat for TIMESTAMP(NANOS) parquet (read as nanosecond longs,
        # converted at use sites by with_event_time); harmless on µs files.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Let AQE coalesce the FINAL stage of persisted frames too
        # (default false only to keep a cached plan's output
        # partitioning reusable by downstream joins). This engine's
        # persists are multi-consumer signature/type tables whose
        # consumers re-shuffle anyway, so the reuse never applies —
        # while the default stored every model-bounded cache at the
        # full shuffle-partition count and every InMemoryTableScan
        # launched that many tasks (guide §2.2: fewer, larger
        # partitions). Measured r14: -25% on the order-5 KN family,
        # -49% kn3_arpa, -30% arpa_score, -16% minhash_pairs, no
        # regressions (OPTIMIZATION_r14.md); sizes stay byte-adaptive
        # at scale because AQE's advisory size does the coalescing.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    parts = (
        str(shuffle_partitions)
        if shuffle_partitions
        else os.environ.get("SPARK_SHUFFLE_PARTITIONS")
        or _default_shuffle_partitions(cpus)
    )
    if parts is not None:
        builder = builder.config("spark.sql.shuffle.partitions", parts)
    if not os.environ.get("SPARK_MASTER") and not os.environ.get("MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()



@contextlib.contextmanager
def _translate_runtime_errors():
    """Map inline raise_error guards (lazy bounds checks) back to the
    documented Python exception, on every materialization path — exports
    AND user-directed sinks — so the error contract does not depend on
    which sink ran the plan."""
    try:
        yield
    except IndexError:
        raise
    except Exception as exc:
        if "out of bounds for vector" in str(exc):
            raise IndexError(str(exc).split("SQLSTATE")[0].strip()) from None
        raise


class SparkRunner(BaseRunner):
    """Execution engine + result store + status store."""

    def __init__(
        self,
        spark: Optional[SparkSession] = None,
        store_path: Optional[str] = None,
    ):
        self.spark = spark or get_spark()
        self.store = ResultStore(store_path) if store_path else None
        self._plans: dict[str, Any] = {}  # uuid -> lowered plan (lazy DFs)

    # ------------------------------------------------------------------ #
    # Graph-building entry points                                         #
    # ------------------------------------------------------------------ #

    def from_parquet(self, file_path: str) -> LoadParquetDatasetOp:
        """Dataset identified by file content (sha256), not by path — parity
        with reference ``local_arrow_runner.py:154-198``. For directories /
        remote URLs, identity falls back to a manifest hash of
        (relative path, size) pairs, which a 100-TB scan can afford."""
        return LoadParquetDatasetOp(
            file_path=file_path, content_hash=_content_identity(file_path)
        )

    def from_inline_dataset(self, data: dict[str, list]) -> LoadInlineJsonDatasetOp:
        return LoadInlineJsonDatasetOp(
            data=data, content_hash=_inline_identity(data)
        )

    def from_csv(
        self,
        file_path: str,
        schema: Optional[str] = None,
        header: bool = True,
        delimiter: str = ",",
    ) -> "LoadCSVDatasetOp":
        from ..operators.dataset_ops import LoadCSVDatasetOp

        return LoadCSVDatasetOp(
            file_path=file_path,
            content_hash=_content_identity(file_path),
            schema_ddl=schema,
            header=header,
            delimiter=delimiter,
        )

    def from_json_lines(
        self, file_path: str, schema: Optional[str] = None
    ) -> "LoadJSONLinesDatasetOp":
        from ..operators.dataset_ops import LoadJSONLinesDatasetOp

        return LoadJSONLinesDatasetOp(
            file_path=file_path,
            content_hash=_content_identity(file_path),
            schema_ddl=schema,
        )

    def from_orc(self, file_path: str) -> "LoadORCDatasetOp":
        from ..operators.dataset_ops import LoadORCDatasetOp

        return LoadORCDatasetOp(
            file_path=file_path, content_hash=_content_identity(file_path)
        )

    def from_avro(
        self, file_path: str, schema: Optional[str] = None
    ) -> "LoadAvroDatasetOp":
        from ..operators.dataset_ops import LoadAvroDatasetOp

        return LoadAvroDatasetOp(
            file_path=file_path,
            content_hash=_content_identity(file_path),
            schema_ddl=schema,
        )

    def from_text(
        self, file_path: str, column: str = "text"
    ) -> "LoadTextLinesDatasetOp":
        from ..operators.dataset_ops import LoadTextLinesDatasetOp

        return LoadTextLinesDatasetOp(
            file_path=file_path,
            content_hash=_content_identity(file_path),
            column=column,
        )

    # ------------------------------------------------------------------ #
    # User-directed sinks (beyond-reference: the reference can only write  #
    # into its result store)                                               #
    # ------------------------------------------------------------------ #

    def write_parquet(
        self, op: OpSpec, path: str, sort_by_row_id: bool = False
    ) -> None:
        """Write an op's result to a caller-chosen parquet path.
        ``sort_by_row_id`` forces deterministic file order at the cost of a
        global sort — leave off for large outputs (row ids still ride along
        in the data for downstream alignment)."""
        with _translate_runtime_errors():
            self._sink_df(op, sort_by_row_id).write.mode("overwrite").parquet(path)

    def write_csv(
        self,
        op: OpSpec,
        path: str,
        sort_by_row_id: bool = False,
        header: bool = True,
    ) -> None:
        df = self._sink_df(op, sort_by_row_id)
        # CSV has no nested types: arrays/structs/variants export as JSON text.
        # (error translation below)
        cols = [
            F.to_json(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType, T.VariantType))
            else F.col(f.name)
            for f in df.schema.fields
        ]
        with _translate_runtime_errors():
            df.select(*cols).write.mode("overwrite").option("header", header).csv(
                path
            )

    def write_json_lines(
        self, op: OpSpec, path: str, sort_by_row_id: bool = False
    ) -> None:
        with _translate_runtime_errors():
            self._sink_df(op, sort_by_row_id).write.mode("overwrite").json(path)

    def write_orc(
        self, op: OpSpec, path: str, sort_by_row_id: bool = False
    ) -> None:
        with _translate_runtime_errors():
            self._sink_df(op, sort_by_row_id).write.mode("overwrite").orc(path)

    def write_avro(
        self, op: OpSpec, path: str, sort_by_row_id: bool = False,
        codec: str = "deflate",
    ) -> None:
        """Avro container sink: spark-avro jar when present, else the
        distributed pure-Python writer (one file per partition, block per
        Arrow batch) — see ``sources/avro.py``."""
        from ..sources.avro import write_avro_dataframe

        with _translate_runtime_errors():
            write_avro_dataframe(self._sink_df(op, sort_by_row_id), path, codec)

    def write_text(
        self,
        op: OpSpec,
        path: str,
        column: str,
        sort_by_row_id: bool = False,
    ) -> None:
        """Write ONE string column as raw lines (one row per line). Text
        files carry no other columns, so row ids cannot ride along — a
        round-trip re-reads with fresh positional ids; use parquet when
        alignment must survive the trip."""
        df = self._sink_df(op, sort_by_row_id)
        with _translate_runtime_errors():
            df.select(F.col(column).cast("string").alias("value")).write.mode(
                "overwrite"
            ).text(path)

    def write_bucketed(
        self,
        op: OpSpec,
        table: str,
        bucket_cols: list[str],
        num_buckets: int = 32,
        sort_cols: Optional[list[str]] = None,
    ) -> None:
        """Persist a result as a bucketed catalog table.

        Bucketing is the pre-shuffle investment for repeated joins/aggs on
        the same key: two tables bucketed on the join key with the same
        bucket count join with ZERO Exchange on either side (verified in
        tests), so at 100 TB the shuffle is paid once at write time, not
        per query. Spark bucketed tables require the catalog
        (``saveAsTable``), not a bare path."""
        from ..functions.partitioning import write_bucketed

        with _translate_runtime_errors():
            write_bucketed(
                self.dataframe(op, keep_row_id=True),
                table,
                bucket_cols,
                num_buckets,
                sort_cols=sort_cols,
            )

    def _sink_df(self, op: OpSpec, sort_by_row_id: bool) -> DataFrame:
        df = self.dataframe(op, keep_row_id=True)
        if sort_by_row_id:
            df = df.orderBy(ROW_ID)
        return df

    def sql(self, query: str, **datasets: OpSpec) -> DataFrame:
        """ANSI-SQL entry point over materialized op graphs (additive: the
        reference has no SQL surface — SURVEY §2.9).

        Dataset ops bind as ``{name}`` template references::

            runner.sql("SELECT k, count(*) n FROM {d} GROUP BY k", d=ds)

        Spark's parameterized ``sql()`` does the binding, so Catalyst sees
        one plan (pushdown/pruning cross the SQL boundary). Returns a plain
        DataFrame: arbitrary SQL output has no stable row identity, so this
        is an exit from the content-addressed graph — feed results back in
        via ``write_parquet`` + ``from_parquet`` when memoization matters."""
        frames = {
            name: self.dataframe(op_, keep_row_id=False)
            for name, op_ in datasets.items()
        }
        return self.spark.sql(query, **frames)

    def prepare(self, op: OpSpec) -> None:
        """Push local parquet sources referenced by ``op``'s graph into the
        store, so runners on machines without the source files (remote
        workers sharing the store) can still materialize the graph (parity:
        reference ``local_arrow_runner.py:200-217``). The copy keeps the
        scan-assigned row ids, so a store-served source is row-identical to
        the original scan."""
        if self.store is None:
            raise ValueError("prepare() requires a runner with a store")
        for dep in [op, *op.get_dependencies(recursive=True)]:
            if not isinstance(dep, LoadParquetDatasetOp):
                continue
            if self.store.is_done(dep.uuid):
                continue
            df = self.dataset_plan(dep).df  # includes ROW_ID
            df.write.mode("overwrite").parquet(self.store.parquet_path(dep.uuid))
            self.store.mark_done(dep.uuid)

    # ------------------------------------------------------------------ #
    # Materialization protocol                                            #
    # ------------------------------------------------------------------ #

    def plan(self, op: OpSpec) -> Union[DatasetPlan, ColumnPlan, ArtifactPlan]:
        """Lower ``op`` (and, transitively, its inputs) to a plan handle.

        Ephemeral ops: pure lowering, no jobs triggered (beyond analysis).
        Non-ephemeral ops: store hit → lazy parquet read; miss → compute,
        persist, re-read (parity with ``base_runner.py:159-235``).
        """
        cached = self._plans.get(op.uuid)
        if cached is not None:
            return cached

        from ..operators.dataset_ops import LoadDatasetOp

        if isinstance(op, LoadDatasetOp):
            # Sources are their own materialization: never copy the input
            # into the result store (a 100-TB scan must stay a scan).
            plan = self.dispatch(op)(self, op)
        elif (
            not op.is_ephemeral
            and self.store is not None
            and self.store.is_done(op.uuid)
        ):
            plan = self._load_from_store(op)
        else:
            plan = self._compute(op)
            if self.store is None:
                plan = self._pin_lazy_barrier(op, plan)
        self._plans[op.uuid] = plan
        return plan

    def _pin_lazy_barrier(self, op: OpSpec, plan):
        """Lazy mode (no store): non-ephemeral ops are STILL
        materialization barriers. Pin their frame with a non-eager
        ``localCheckpoint`` (computed on first use, ContextCleaner-
        reclaimed) so downstream OpSpec stages reference the
        materialized frame instead of re-deriving the whole upstream
        lineage. Without this, every enrichment stage that joins its
        stats back on the row id references its parent frame TWICE, so
        a k-stage fluent chain re-scans the source O(2^k) times —
        ``fluent_quality``'s executed plan had 29 FileScans for a
        4-stage chain. Store-backed mode already materializes per op
        (parquet write + re-read) and is unaffected.
        """
        if op.is_ephemeral or not isinstance(plan, DatasetPlan):
            return plan
        from dataclasses import replace

        return replace(plan, df=plan.df.localCheckpoint(eager=False))

    def _compute(self, op: OpSpec):
        impl = self.dispatch(op)
        persist = not op.is_ephemeral and self.store is not None
        if persist:
            log = get_logger("runners.spark").bind(
                op=type(op).__name__, uuid=op.uuid
            )
            status = OpStatus(
                uuid=op.uuid,
                state=OpState.RUNNING,
                started_at=utcnow(),
                graph=op.to_graph(),
            )
            self.store.write_status(op.uuid, status.to_json())
            log.info("materializing")
            try:
                plan = impl(self, op)
                plan = self._persist(op, plan)
            except Exception as exc:
                status.state = OpState.FAILED
                status.error = f"{type(exc).__name__}: {exc}"
                status.completed_at = utcnow()
                self.store.write_status(op.uuid, status.to_json())
                log.error("failed", error=status.error)
                raise
            status.state = OpState.COMPLETED
            status.completed_at = utcnow()
            self.store.write_status(op.uuid, status.to_json())
            log.info("completed")
            return plan
        return impl(self, op)

    def _persist(self, op: OpSpec, plan):
        """Write a computed non-ephemeral result to the store and return a
        plan backed by the stored copy (the materialization barrier)."""
        store = self.store
        if isinstance(plan, ArtifactPlan):
            if plan.kind == "pickle":
                store.write_pickle(op.uuid, plan.payload)
            else:
                store.write_json(op.uuid, plan.payload)
            store.mark_done(op.uuid)
            return plan
        path = store.parquet_path(op.uuid)
        df = plan.df() if isinstance(plan, ColumnPlan) else plan.df
        df.write.mode("overwrite").parquet(path)
        store.mark_done(op.uuid)
        return self._load_from_store(op, plan)

    def _load_from_store(self, op: OpSpec, computed=None):
        store = self.store
        if store.has_json(op.uuid):
            return ArtifactPlan(payload=store.read_json(op.uuid), kind="json")
        if store.has_pickle(op.uuid):
            return ArtifactPlan(payload=store.read_pickle(op.uuid), kind="pickle")
        df = self.spark.read.parquet(store.parquet_path(op.uuid))
        dense = computed.dense if computed is not None else False
        value_cols = [c for c in df.columns if c != ROW_ID]
        from ..types import ColumnType

        if isinstance(op, ColumnType) and len(value_cols) == 1:
            name = value_cols[0]
            is_json = bool(getattr(computed, "is_json", False)) or isinstance(
                df.schema[name].dataType, T.VariantType
            )
            return ColumnPlan(
                source=df,
                expr=F.col(name),
                name=name,
                aligned_with=_aligned_uuid(op),
                dense=dense,
                is_json=is_json,
            )
        return DatasetPlan(df=df, dataset_uuid=op.uuid, dense=dense)

    def has_result(self, op: OpSpec) -> bool:
        """Parity with the reference's recursive ``has_result``
        (``local_arrow_runner.py:230-248``)."""
        from ..operators.dataset_ops import LoadDatasetOp

        if isinstance(op, LoadDatasetOp):
            return True  # sources are their own materialization
        if op.is_ephemeral:
            return all(self.has_result(dep) for dep in op.get_dependencies())
        if self.store is None:
            return op.uuid in self._plans
        return self.store.is_done(op.uuid)

    def status(self, op: OpSpec) -> OpStatus:
        if op.is_ephemeral:
            return OpStatus(uuid=op.uuid, state=OpState.EPHEMERAL)
        if self.store is not None:
            blob = self.store.read_status(op.uuid)
            if blob is not None:
                return OpStatus.from_json(blob)
        return OpStatus(uuid=op.uuid, state=OpState.NEW)

    def uuid_to_op(self, uuid: str) -> OpSpec:
        """Rehydrate a full OpSpec graph from the store alone (parity:
        ``local_arrow_runner.py:250-269``)."""
        if self.store is None:
            raise ValueError("uuid_to_op requires a persistent store")
        blob = self.store.read_status(uuid)
        if blob is None:
            raise KeyError(f"No status record for {uuid}")
        status = OpStatus.from_json(blob)
        if not status.graph:
            raise KeyError(f"Status for {uuid} has no embedded graph")
        from ..plans.op_spec import deserialize_graph

        roots = deserialize_graph(status.graph)
        return roots[0]

    # ------------------------------------------------------------------ #
    # Exports (canonical order: sorted by __row_id)                        #
    # ------------------------------------------------------------------ #

    def dataframe(self, op: OpSpec, *, keep_row_id: bool = False) -> DataFrame:
        """The op's result as a lazy DataFrame (unordered; Spark-native)."""
        plan = self.plan(op)
        if isinstance(plan, ArtifactPlan):
            raise TypeError(f"{op.short_name()} is an artifact, not a table")
        df = plan.df() if isinstance(plan, ColumnPlan) else plan.df
        if isinstance(plan, ColumnPlan) and plan.is_json:
            df = df.select(ROW_ID, F.to_json(F.col(plan.name)).alias(plan.name))
        if not keep_row_id:
            df = df.drop(ROW_ID)
        return df

    def to_pandas(self, op: OpSpec) -> pd.DataFrame:
        plan = self.plan(op)
        if isinstance(plan, ArtifactPlan):
            raise TypeError(f"{op.short_name()} is an artifact; use to_json")
        df = plan.df() if isinstance(plan, ColumnPlan) else plan.df
        if isinstance(plan, ColumnPlan) and plan.is_json:
            df = df.select(ROW_ID, F.to_json(F.col(plan.name)).alias(plan.name))
        with _translate_runtime_errors():
            return df.orderBy(ROW_ID).drop(ROW_ID).toPandas()

    def to_arrow(self, op: OpSpec):
        import pyarrow as pa

        pdf = self.to_pandas(op)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def to_numpy(self, op: OpSpec):
        import numpy as np

        pdf = self.to_pandas(op)
        if len(pdf.columns) != 1:
            raise ValueError(
                f"to_numpy expects a single-column result, got {list(pdf.columns)}"
            )
        series = pdf[pdf.columns[0]]
        if len(series) and isinstance(series.iloc[0], (list, tuple, np.ndarray)):
            return np.stack([np.asarray(v) for v in series])
        return series.to_numpy()

    def to_json(self, op: OpSpec) -> Any:
        plan = self.plan(op)
        if isinstance(plan, ArtifactPlan):
            return plan.payload
        return self.to_pandas(op).to_dict(orient="list")

    def to_model(self, op: OpSpec) -> Any:
        plan = self.plan(op)
        if not isinstance(plan, ArtifactPlan):
            raise TypeError(f"{op.short_name()} is not a model artifact")
        return plan.payload

    # ------------------------------------------------------------------ #
    # Alignment combinators (the row-discipline core)                     #
    # ------------------------------------------------------------------ #

    def column_plan(self, op: OpSpec) -> ColumnPlan:
        plan = self.plan(op)
        if not isinstance(plan, ColumnPlan):
            raise TypeError(f"Expected a column op, got {op.short_name()}")
        return plan

    def dataset_plan(self, op: OpSpec) -> DatasetPlan:
        plan = self.plan(op)
        if not isinstance(plan, DatasetPlan):
            raise TypeError(f"Expected a dataset op, got {op.short_name()}")
        return plan

    def align_columns(
        self, left: ColumnPlan, right: ColumnPlan
    ) -> tuple[DataFrame, Any, Any, ColumnPlan]:
        """Make two columns combinable row-by-row.

        Fast path (same aligned dataset AND same physical DataFrame):
        compose raw expressions — no join, stays in one codegen stage.
        Same row-id domain but a *different* physical DataFrame (a
        mapInPandas/driver-side op replaced the source, e.g. LLM outputs,
        UMAP coords): equi-join on ``__row_id`` — cheap, no rank pass.
        Fallback (different datasets, reference §1.5 positional semantics):
        zip by rank over row-id order after an equal-length check.
        Returns (df, left_expr, right_expr, template_plan).
        """
        if left.aligned_with == right.aligned_with:
            if left.source is right.source:
                return left.source, left.expr, right.expr, left
            return self._id_zip(left, right)
        return self._rank_zip(left, right)

    def _id_zip(self, left: ColumnPlan, right: ColumnPlan):
        """Join two columns from the same row-id domain on ``__row_id``.
        Fusing their expressions would be an AnalysisException (they live on
        different DataFrames); a rank pass is unnecessary (ids already
        correspond)."""
        lc = left.df().select(F.col(ROW_ID), F.col(left.name).alias("__l"))
        rc = right.df().select(F.col(ROW_ID), F.col(right.name).alias("__r"))
        joined = lc.join(rc, ROW_ID)
        plan = ColumnPlan(
            source=joined,
            expr=F.col("__l"),
            name=left.name,
            aligned_with=left.aligned_with,
            dense=left.dense,
        )
        return joined, F.col("__l"), F.col("__r"), plan

    def _rank_zip(self, left: ColumnPlan, right: ColumnPlan):
        lc, rc = left.df(), right.df()
        lr, n_left = self._ranked_with_count(
            lc.select(F.col(ROW_ID), F.col(left.name).alias("__l"))
        )
        rr, n_right = self._ranked_with_count(
            rc.select(F.col(ROW_ID), F.col(right.name).alias("__r"))
        )
        if n_left != n_right:
            raise ValueError(
                f"Positional combination of columns with different lengths: "
                f"{n_left} vs {n_right}"
            )
        joined = lr.join(rr.select("__r", "__rank"), "__rank").drop("__rank")
        plan = ColumnPlan(
            source=joined,
            expr=F.col("__l"),
            name=left.name,
            aligned_with=left.aligned_with,
            dense=left.dense,
        )
        return joined, F.col("__l"), F.col("__r"), plan

    def ranked(self, df: DataFrame) -> DataFrame:
        """Attach a 0-based global rank ``__rank`` in ROW_ID order — the
        moral equivalent of ``RDD.zipWithIndex``, kept JVM-side."""
        return self._ranked_with_count(df)[0]

    def _ranked_with_count(self, df: DataFrame) -> tuple[DataFrame, int]:
        """Distributed global rank with a DETERMINISTIC partitioning.

        ``repartitionByRange`` is unusable here: its range boundaries come
        from reservoir sampling seeded per-job, so the tiny count job and
        the consuming job could place rows in different partitions —
        silently corrupting every positional path (rank-zip joins, masks,
        non-dense takes). Instead, bucket boundaries are QUANTILES of the
        row-id distribution, collected ONCE on the driver and embedded as
        literals: every job then recomputes the same bucket for the same
        row-id value by construction, regardless of how the boundaries
        were estimated. Quantile boundaries (not fixed-width ranges over
        [min, max]) matter because multi-file row ids are sparse —
        ``file_ordinal << 40 | row_index`` — where equal-width buckets
        collapse to ~one bucket per file and would hand a whole file's
        rows to one window task. One quantile pass, one per-bucket count
        pass → offsets; the final plan ranks within buckets (Catalyst
        hash-clusters on the bucket expression, value-deterministic) and
        adds the offset. No single-partition global window and no bucket
        larger than ~2× the balanced share, at any id distribution.

        Returns ``(ranked_df, row_count)`` so callers needing the length
        (equal-length checks) don't pay another pass."""
        n_rows = df.count()
        if n_rows == 0:
            return df.withColumn("__rank", F.lit(0).cast("long")), 0
        n_part = max(self.spark.sparkContext.defaultParallelism, 1)
        probs = [i / n_part for i in range(1, n_part)]
        # Cast to double for approxQuantile; cut points need only be
        # monotonic, so the double rounding of >2^53 ids is harmless —
        # comparisons below happen on exact longs.
        bounds = sorted(
            {
                int(b)
                for b in df.select(F.col(ROW_ID).cast("double").alias("__d"))
                .approxQuantile("__d", probs, 1.0 / (4 * n_part))
            }
        )
        bucket = _bucket_of(F.col(ROW_ID), bounds)
        sizes = {
            int(row["__b"]): int(row["count"])
            for row in df.select(bucket.alias("__b")).groupBy("__b").count().collect()
        }
        offsets: dict[int, int] = {}
        acc = 0
        for b in sorted(sizes):
            offsets[b] = acc
            acc += sizes[b]
        offmap = F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])
        w = Window.partitionBy("__b").orderBy(ROW_ID)
        out = (
            df.withColumn("__b", bucket)
            .withColumn(
                "__rank",
                (F.row_number().over(w) - 1).cast("long") + offmap[F.col("__b")],
            )
            .drop("__b")
        )
        return out, n_rows


def _bucket_of(col, bounds: list[int], lo: int = 0, hi: Optional[int] = None):
    """``#{i : bounds[i] <= value}`` as a balanced comparison tree over the
    sorted literal boundaries — depth ``log2(len(bounds))`` whens, fully
    codegen-able, no higher-order functions."""
    if hi is None:
        hi = len(bounds)
    if lo == hi:
        return F.lit(lo).cast("long")
    mid = (lo + hi) // 2
    return F.when(col < F.lit(bounds[mid]), _bucket_of(col, bounds, lo, mid)).otherwise(
        _bucket_of(col, bounds, mid + 1, hi)
    )


def _aligned_uuid(op: OpSpec) -> str:
    """The dataset node a column op is row-aligned with."""
    for fname in ("dataset",):
        value = getattr(op, fname, None)
        if isinstance(value, DatasetType):
            return value.uuid
    return op.uuid


def _content_identity(file_path: str) -> str:
    if os.path.isfile(file_path):
        h = hashlib.sha256()
        with open(file_path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()
    if os.path.isdir(file_path):
        h = hashlib.sha256()
        for root, _dirs, files in sorted(os.walk(file_path)):
            for name in sorted(files):
                full = os.path.join(root, name)
                rel = os.path.relpath(full, file_path)
                h.update(f"{rel}:{os.path.getsize(full)};".encode())
        return h.hexdigest()
    if "://" not in file_path:
        raise FileNotFoundError(f"No such file or directory: {file_path!r}")
    # Remote URL: identity = the URL itself (documented deviation; Spark-side
    # listing would be needed for a manifest hash).
    return hashlib.sha256(file_path.encode()).hexdigest()


def _inline_identity(data: dict[str, list]) -> str:
    import json

    blob = json.dumps(data, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()


# ====================================================================== #
# Implementations: sources                                                #
# ====================================================================== #


@SparkRunner.implementation
def load_parquet(runner: SparkRunner, op: LoadParquetDatasetOp) -> DatasetPlan:
    """Scan with stable row ids from parquet metadata: no shuffle, no window,
    reproducible across runs (``_metadata.row_index`` is the in-file row
    position; multi-file scans get ``file_ordinal << 40 | row_index``)."""
    spark = runner.spark
    if not os.path.exists(op.file_path) and "://" not in op.file_path:
        # Source not on this machine: fall back to a store copy pushed by
        # prepare() (it already carries the scan-assigned row ids).
        if runner.store is not None and runner.store.is_done(op.uuid):
            df = spark.read.parquet(runner.store.parquet_path(op.uuid))
            return DatasetPlan(df=df, dataset_uuid=op.uuid, dense=False)
        raise FileNotFoundError(
            f"{op.file_path!r} not found locally and not prepared into the store"
        )
    df = spark.read.parquet(op.file_path)
    return _scan_with_row_ids(df, op.uuid)


def _scan_with_row_ids(df: DataFrame, uuid: str) -> DatasetPlan:
    """Attach stable scan-time row ids from file metadata (works for every
    Spark file source: parquet, csv, json). Single file → in-file row index
    (dense); multi-file → ``file_ordinal << 40 | row_index``.

    A file that already carries a ``__row_id`` column (written by
    ``write_parquet``/``write_csv``/``write_json_lines``) re-adopts those
    ids, so round-tripping through a user-directed sink preserves row
    identity."""
    if ROW_ID in df.columns:
        return DatasetPlan(df=df, dataset_uuid=uuid, dense=False)
    files = sorted(df.inputFiles())
    if len(files) <= 1:
        with_id = df.select(
            F.col("_metadata.row_index").alias(ROW_ID), *df.columns
        )
        dense = True
    else:
        mapping = F.create_map(
            *[x for i, f in enumerate(files) for x in (F.lit(f), F.lit(i))]
        )
        with_id = df.select(
            (
                F.element_at(mapping, F.col("_metadata.file_path")).cast("long")
                * F.lit(1 << _FILE_ORD_SHIFT)
                + F.col("_metadata.row_index")
            ).alias(ROW_ID),
            *df.columns,
        )
        dense = False
    return DatasetPlan(df=with_id, dataset_uuid=uuid, dense=dense)


def _text_scan_with_row_ids(df: DataFrame, uuid: str) -> DatasetPlan:
    """Row ids for text sources (csv/json), which expose no per-file row
    index in ``_metadata``: ``monotonically_increasing_id`` — unique and
    stable for a fixed file set + session conf. When the scan is a single
    partition (one small file, the interactive case) the ids are dense
    0..n-1 in file order; split scans get stable-but-not-file-ordered ids
    (Spark schedules splits largest-first). Pipelines that need strictly
    file-ordered positional semantics at scale should convert to parquet
    first (``runner.write_parquet``) — parquet scans carry exact in-file
    row indexes."""
    if ROW_ID in df.columns:  # sink round-trip: re-adopt written ids
        return DatasetPlan(df=df, dataset_uuid=uuid, dense=False)
    with_id = df.select(F.monotonically_increasing_id().alias(ROW_ID), *df.columns)
    dense = with_id.rdd.getNumPartitions() <= 1
    return DatasetPlan(df=with_id, dataset_uuid=uuid, dense=dense)


@SparkRunner.implementation
def load_csv(runner: SparkRunner, op: LoadCSVDatasetOp) -> DatasetPlan:
    """CSV scan. An explicit ``schema_ddl`` avoids the inference pre-scan
    (a full extra read at scale); without one, inference runs once at
    lowering."""
    reader = runner.spark.read.option("header", op.header).option(
        "delimiter", op.delimiter
    )
    if op.schema_ddl:
        reader = reader.schema(op.schema_ddl)
    else:
        reader = reader.option("inferSchema", "true")
    return _text_scan_with_row_ids(reader.csv(op.file_path), op.uuid)


@SparkRunner.implementation
def load_json_lines(runner: SparkRunner, op: LoadJSONLinesDatasetOp) -> DatasetPlan:
    reader = runner.spark.read
    if op.schema_ddl:
        reader = reader.schema(op.schema_ddl)
    return _text_scan_with_row_ids(reader.json(op.file_path), op.uuid)


@SparkRunner.implementation
def load_orc(runner: SparkRunner, op: LoadORCDatasetOp) -> DatasetPlan:
    """ORC scan (columnar, vectorized, predicate-pushdown-capable like
    parquet). Row ids follow the text-source policy: written ids are
    re-adopted on round-trips, fresh scans get stable monotonic ids."""
    return _text_scan_with_row_ids(runner.spark.read.orc(op.file_path), op.uuid)


@SparkRunner.implementation
def drop_exact_dups_op(runner: SparkRunner, op: DropExactDupsOp) -> DatasetPlan:
    """Scale-surface dedup as a memoized op: keep the min-row-id row per
    normalized-text fingerprint (``functions/dedup.py:drop_exact_dups``
    keyed on the engine row id — "first occurrence wins", positionally).
    Survivors keep their ORIGINAL ids, like a mask (dense=False)."""
    from ..functions.dedup import drop_exact_dups as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(ds.df, op.text_column, ROW_ID)
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def drop_near_dups_op(runner: SparkRunner, op: DropNearDupsOp) -> DatasetPlan:
    """MinHash-LSH near-dedup as a memoized op (the expensive pipeline
    step content-addressing exists for). Survivors keep original ids."""
    from ..functions.dedup import drop_near_dups as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(
        ds.df,
        op.text_column,
        ROW_ID,
        num_perm=op.num_perm,
        bands=op.bands,
        shingle_k=op.shingle_k,
        jaccard_threshold=op.jaccard_threshold,
        keep_by=op.keep_by,
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def text_stats_op(runner: SparkRunner, op: TextStatsOp) -> DatasetPlan:
    """Row-aligned text-quality enrichment: appends n_tok / n_tok_bpe /
    stop_r / punct_r / mwl / quality as pure codegen expressions fused
    into the parent plan; ids and density are preserved."""
    from ..functions import text as tx

    ds = runner.dataset_plan(op.dataset)
    c = op.text_column
    out = ds.df.select(
        "*",
        tx.token_count(c).alias("n_tok"),
        tx.regex_token_count(c).alias("n_tok_bpe"),
        F.round(tx.stopword_ratio(c), 6).alias("stop_r"),
        F.round(tx.punct_ratio(c), 6).alias("punct_r"),
        F.round(tx.mean_word_length(c), 6).alias("mwl"),
        F.round(tx.quality_score(c), 6).alias("quality"),
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def chunk_documents_op(runner: SparkRunner, op: ChunkDocumentsOp) -> DatasetPlan:
    """Zero-shuffle chunk fan-out. New deterministic row ids:
    ``parent_id * 2^20 + chunk_id`` (1M chunks/doc bound, asserted), so
    exports reproduce without a global sort; the parent id rides along as
    ``src_row_id`` for joins back to the document."""
    from ..functions.text import chunk_documents as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(ds.df, op.text_column, ROW_ID, op.chunk_size, op.overlap)
    out = out.withColumnRenamed(ROW_ID, "src_row_id").select(
        (
            F.col("src_row_id") * F.lit(1 << 20)
            + F.when(
                F.col("chunk_id") < (1 << 20), F.col("chunk_id")
            ).otherwise(
                F.raise_error(
                    F.lit("chunk_documents op: > 2^20 chunks in one document")
                )
            )
        ).alias(ROW_ID),
        "*",
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def hash_sample_op(runner: SparkRunner, op: HashSampleOp) -> DatasetPlan:
    """Deterministic Bernoulli sample on the row-id hash: a scan-side
    filter that pushes down, keeps original ids (dense=False), and picks
    identical rows under any partitioning or engine."""
    from ..functions.sampling import hash_sample as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(ds.df, ROW_ID, op.fraction, seed=op.seed)
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def decontaminate_against_op(
    runner: SparkRunner, op: DecontaminateAgainstOp
) -> DatasetPlan:
    """Two-parent decontamination: digest-join the train shingles against
    the eval set's distinct gram digests, drop flagged rows via
    left_anti. Survivors keep original ids (dense=False)."""
    from ..functions.curation import decontaminate as _impl

    train = runner.dataset_plan(op.dataset)
    test = runner.dataset_plan(op.against)
    flagged = _impl(
        train.df,
        test.df.select(F.col(op.against_column).alias(op.text_column)),
        op.text_column,
        ROW_ID,
        n=op.ngram,
    ).select(ROW_ID)
    out = train.df.join(flagged, ROW_ID, "left_anti")
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def ann_topk_op(runner: SparkRunner, op: AnnTopKOp) -> DatasetPlan:
    """Two-parent exact cosine top-k (queries broadcast). Fresh dense row
    ids in (query, rank) order — legal because the result is bounded by
    contract (|queries| x k), the same contract as the rrf/top-k frames."""
    from pyspark.sql import Window as _W

    from ..functions.similarity import cosine_topk as _impl

    corpus = runner.dataset_plan(op.dataset)
    queries = runner.dataset_plan(op.queries)
    out = _impl(
        corpus.df.select(op.id_column, op.vector_column),
        queries.df.select(op.id_column, op.vector_column),
        op.vector_column,
        op.id_column,
        k=op.k,
    )
    w = _W.orderBy("query_id", "rank")
    out = out.select(
        (F.row_number().over(w) - 1).cast("long").alias(ROW_ID), "*"
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=True)


@SparkRunner.implementation
def stratified_sample_op(
    runner: SparkRunner, op: StratifiedSampleOp
) -> DatasetPlan:
    """Per-stratum md5-bucket downsampling keyed on the row id — one
    scan-side predicate, survivors keep original ids."""
    from ..functions.sampling import stratified_sample as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(
        ds.df, op.strata_column, dict(op.fractions), ROW_ID,
        seed=op.seed, default_fraction=op.default_fraction,
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def mix_to_weights_op(runner: SparkRunner, op: MixToWeightsOp) -> DatasetPlan:
    """Integer-exact corpus mixing: one stratum-count agg (collects
    #strata rows — human-sized), then the stratified-sample predicate."""
    from ..functions.sampling import mix_to_weights as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(ds.df, op.strata_column, dict(op.weights), ROW_ID, seed=op.seed)
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def pii_scrub_op(runner: SparkRunner, op: PiiScrubOp) -> DatasetPlan:
    """Row-aligned PII redaction of ``text_column`` in place; ids and
    density preserved (an enrichment-style rewrite, not a filter)."""
    from ..functions.curation import pii_scrub as _impl

    ds = runner.dataset_plan(op.dataset)
    out = ds.df.withColumn(
        op.text_column, _impl(op.text_column, tuple(op.kinds))
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def group_cap_op(runner: SparkRunner, op: GroupCapOp) -> DatasetPlan:
    """Deterministic per-key cap: the engine row id rides as the final
    tiebreaker so the kept set is unique; survivors keep original ids."""
    from ..functions.curation import group_cap as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(
        ds.df, list(op.key_columns), op.n, list(op.order_by) + [ROW_ID]
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def sequence_pack_op(runner: SparkRunner, op: SequencePackOp) -> DatasetPlan:
    """Offset packing as a row-aligned enrichment (adds n_tokens +
    pack_id); ids and density preserved. partition_by is the scale path —
    without it the global-order window is single-task (result-set frames
    only, same contract as the function)."""
    from ..functions.curation import sequence_pack as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(
        ds.df, op.order_by, op.token_column, op.budget,
        partition_by=op.partition_by,
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def paragraph_dedup_op(runner: SparkRunner, op: ParagraphDedupOp) -> DatasetPlan:
    """Corpus-wide paragraph dedup keyed on the engine row id: the
    deduped text replaces ``text_column`` (with n_paras/n_kept appended),
    non-text parent columns ride along via a row-id equi-join, and docs
    whose every paragraph was boilerplate disappear (dense=False)."""
    from ..functions.curation import paragraph_dedup as _impl

    ds = runner.dataset_plan(op.dataset)
    deduped = _impl(
        ds.df.select(ROW_ID, op.text_column), op.text_column, ROW_ID,
        sep=op.sep,
    ).withColumnRenamed("text", op.text_column)
    out = ds.df.drop(op.text_column).join(deduped, ROW_ID)
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def cdc_chunk_dedup_op(runner: SparkRunner, op: CdcChunkDedupOp) -> DatasetPlan:
    """CDC dedup-signal enrichment keyed on the engine row id: the
    per-row chunk/dup counters join back onto the parent's columns;
    every input row reports (blank docs as zeros), so ids and density
    are preserved."""
    from ..functions.dedup import cdc_chunk_dedup as _impl

    ds = runner.dataset_plan(op.dataset)
    rep = _impl(
        ds.df.select(ROW_ID, op.text_column),
        op.text_column,
        ROW_ID,
        window=op.window,
        modulus=op.modulus,
    )
    out = ds.df.join(rep, ROW_ID)
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def winnow_pairs_op(runner: SparkRunner, op: WinnowPairsOp) -> DatasetPlan:
    """Winnowing pair mining keyed on the engine row id; the result is
    a bounded pair table, so fresh dense row ids in (doc_a, doc_b)
    order (the AnnTopKOp contract)."""
    from pyspark.sql import Window as _W

    from ..functions.dedup import winnow_pairs as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(
        ds.df.select(ROW_ID, op.text_column),
        op.text_column,
        ROW_ID,
        k=op.k,
        w=op.w,
        min_shared=op.min_shared,
        max_doc_freq=op.max_doc_freq,
    )
    w = _W.orderBy("doc_a", "doc_b")
    out = out.select(
        (F.row_number().over(w) - 1).cast("long").alias(ROW_ID), "*"
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=True)


@SparkRunner.implementation
def span_corruption_op(runner: SparkRunner, op: SpanCorruptionOp) -> DatasetPlan:
    """T5 denoising-pair enrichment keyed on the engine row id: the
    (inputs, targets) columns join back onto the parent's columns;
    every input row reports, so ids and density are preserved."""
    from ..functions.curation import span_corruption_text as _impl

    ds = runner.dataset_plan(op.dataset)
    rep = _impl(
        ds.df.select(ROW_ID, op.text_column),
        op.text_column,
        ROW_ID,
        noise_density=op.noise_density,
        mean_span=op.mean_span,
        seed=op.seed,
    )
    out = ds.df.join(rep, ROW_ID)
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def dedup_weights_op(runner: SparkRunner, op: DedupWeightsOp) -> DatasetPlan:
    """Soft-dedup enrichment keyed on the engine row id: the
    (cluster_size, weight) table — pair-graph-sized, broadcast — joins
    back onto the parent's columns; every input row reports (singletons
    weight 1.0), so ids and density are preserved."""
    from ..functions.dedup import dedup_weights as _impl

    ds = runner.dataset_plan(op.dataset)
    rep = _impl(
        ds.df.select(ROW_ID, op.text_column),
        op.text_column,
        ROW_ID,
        num_perm=op.num_perm,
        bands=op.bands,
        jaccard_threshold=op.jaccard_threshold,
        mode=op.mode,
    )
    out = ds.df.join(rep, ROW_ID)
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def gopher_rules_op(runner: SparkRunner, op: GopherRulesOp) -> DatasetPlan:
    """Gopher rule-bundle enrichment: one codegen projection appended in
    place — no join, ids and density preserved."""
    from ..functions.text import gopher_rules as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(
        ds.df, op.text_column,
        min_words=op.min_words, max_words=op.max_words,
        min_mwl=op.min_mwl, max_mwl=op.max_mwl,
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def c4_rules_op(runner: SparkRunner, op: C4RulesOp) -> DatasetPlan:
    """C4 cleaning enrichment: one codegen projection appended in place
    (clean_text + counters + verdict) — no join, ids and density
    preserved."""
    from ..functions.text import c4_rules as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(
        ds.df, op.text_column,
        min_line_words=op.min_line_words, min_sentences=op.min_sentences,
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def token_entropy_op(runner: SparkRunner, op: TokenEntropyOp) -> DatasetPlan:
    """Lexical-diversity enrichment: n_tokens/n_types/entropy left-joined
    back on the row id so blank docs survive with nulls — ids and density
    preserved."""
    from ..functions.text import token_entropy as _impl

    ds = runner.dataset_plan(op.dataset)
    stats = _impl(ds.df.select(ROW_ID, op.text_column), op.text_column, ROW_ID)
    out = ds.df.join(stats, ROW_ID, "left")
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def dsir_weights_op(runner: SparkRunner, op: DsirWeightsOp) -> DatasetPlan:
    """Two-parent DSIR enrichment: raw corpus scored against the target
    parent's hashed-n-gram distribution; n_grams/dsir_logw left-joined
    back on the row id (blank docs null). Both parents content-address
    the result."""
    from ..functions.text import dsir_weights as _impl

    raw = runner.dataset_plan(op.dataset)
    target = runner.dataset_plan(op.target)
    weights = _impl(
        raw.df.select(ROW_ID, op.text_column),
        target.df.select(
            ROW_ID, F.col(op.target_column).alias(op.text_column)
        ),
        op.text_column,
        ROW_ID,
        buckets=op.buckets,
        smoothing=op.smoothing,
    )
    out = raw.df.join(weights, ROW_ID, "left")
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=raw.dense)


@SparkRunner.implementation
def compression_signals_op(
    runner: SparkRunner, op: CompressionSignalsOp
) -> DatasetPlan:
    """zlib-compressibility enrichment: n_bytes/n_zlib from the single
    Arrow stage, left-joined back on the row id — ids and density
    preserved."""
    from ..functions.text import compression_signals as _impl

    ds = runner.dataset_plan(op.dataset)
    stats = _impl(
        ds.df.select(ROW_ID, op.text_column), op.text_column, ROW_ID,
        level=op.level,
    )
    out = ds.df.join(stats, ROW_ID, "left")
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def ngram_coverage_op(runner: SparkRunner, op: NgramCoverageOp) -> DatasetPlan:
    """Two-parent contamination-coverage enrichment: this dataset is the
    eval suite, ``corpus`` the training side; n_grams/n_hit left-joined
    back on the row id (nulls for rows with < n tokens)."""
    from ..functions.curation import ngram_coverage as _impl

    ds = runner.dataset_plan(op.dataset)
    corpus = runner.dataset_plan(op.corpus)
    cov = _impl(
        corpus.df.select(F.col(op.corpus_column).alias(op.text_column)),
        ds.df.select(ROW_ID, op.text_column),
        op.text_column,
        ROW_ID,
        n=op.ngram,
    )
    out = ds.df.join(cov, ROW_ID, "left")
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def load_avro(runner: SparkRunner, op: "LoadAvroDatasetOp") -> DatasetPlan:
    """Avro scan through sources/avro.py (jar-native or pure-Python
    fallback). Row ids follow the text-source policy: written ids are
    re-adopted on round-trips, fresh scans get stable monotonic ids."""
    from ..sources.avro import read_avro_dataframe

    df = read_avro_dataframe(runner.spark, op.file_path, op.schema_ddl)
    return _text_scan_with_row_ids(df, op.uuid)


@SparkRunner.implementation
def load_text_lines(
    runner: SparkRunner, op: LoadTextLinesDatasetOp
) -> DatasetPlan:
    """Raw line scan: spark.read.text — one row per line, renamed to
    ``op.column``. Splittable like any text source; row ids follow the
    text-source policy (monotonic, dense only for single-partition
    scans)."""
    df = runner.spark.read.text(op.file_path).withColumnRenamed(
        "value", op.column
    )
    return _text_scan_with_row_ids(df, op.uuid)


@SparkRunner.implementation
def load_inline(runner: SparkRunner, op: LoadInlineJsonDatasetOp) -> DatasetPlan:
    import pyarrow as pa

    table = pa.table({k: pa.array(v) for k, v in op.data.items()})
    # Arrow infers null type for empty columns; Spark needs a concrete type.
    fields = []
    for f in table.schema:
        fields.append(pa.field(f.name, pa.string()) if pa.types.is_null(f.type) else f)
    table = table.cast(pa.schema(fields))
    ids = pa.array(range(table.num_rows), type=pa.int64())
    table = table.add_column(0, pa.field(ROW_ID, pa.int64()), ids)
    df = runner.spark.createDataFrame(table)
    return DatasetPlan(df=df, dataset_uuid=op.uuid, dense=True)


# ====================================================================== #
# Implementations: projection / row selection                             #
# ====================================================================== #


@SparkRunner.implementation
def select_column(runner: SparkRunner, op: SelectColumnOp) -> ColumnPlan:
    """One implementation serves all nine typed selects via MRO dispatch
    (parity: ``base_runner.py:204-231``)."""
    ds = runner.dataset_plan(op.dataset)
    if op.column_name not in ds.df.columns:
        raise KeyError(
            f"Column {op.column_name!r} not in dataset (has {ds.columns})"
        )
    return ColumnPlan(
        source=ds.df,
        expr=F.col(op.column_name),
        name=op.column_name,
        aligned_with=op.dataset.uuid,
        dense=ds.dense,
        # JSON-ish selects (incl. conversations) export via to_json and are
        # serialized to JSON text before entering LLM providers.
        is_json=isinstance(op, JSONColumnType),
    )


@SparkRunner.implementation
def assign_row_id(runner: SparkRunner, op: AssignRowIDOp) -> ColumnPlan:
    ds = runner.dataset_plan(op.dataset)
    return ColumnPlan(
        source=ds.df,
        expr=F.col(ROW_ID),
        name="row_id",
        aligned_with=op.dataset.uuid,
        dense=ds.dense,
    )


@SparkRunner.implementation
def take_rows(runner: SparkRunner, op: TakeRowsOp) -> DatasetPlan:
    """``rows[offset::skip][:num_rows]``. Dense inputs use pure row-id
    arithmetic — a pushdown-friendly filter, no window, no shuffle, scales to
    any size. Non-dense inputs (row ids with gaps, e.g. after a mask) fall
    back to a rank window."""
    ds = runner.dataset_plan(op.dataset)
    df = ds.df
    if ds.dense:
        key = F.col(ROW_ID)
    else:
        df = runner.ranked(df)
        key = F.col("__rank")
    cond = (key >= op.offset) & ((key - op.offset) % op.skip == 0)
    if op.num_rows is not None:
        cond = cond & (key < op.offset + op.num_rows * op.skip)
    out = df.filter(cond)
    if not ds.dense:
        out = out.drop("__rank")
    dense = ds.dense and op.skip == 1 and op.offset == 0
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=dense)


@SparkRunner.implementation
def mask_rows(runner: SparkRunner, op: MaskRowsOp) -> DatasetPlan:
    """Filter by a row-aligned boolean column. Same-dataset masks fuse into a
    plain ``Filter`` over the scan (predicate pushdown applies); masks from a
    *different* same-length dataset use the positional rank-zip."""
    ds = runner.dataset_plan(op.dataset)
    mask = runner.column_plan(op.mask)
    _require_boolean(mask)
    if mask.aligned_with == op.dataset.uuid:
        if mask.source is ds.df:
            # Same physical DataFrame: fuse into a plain Filter.
            out = ds.df.filter(mask.expr)
        else:
            # Same row-id domain, different physical DataFrame (mask built
            # from a mapInPandas/driver-side column): semi-join on row id.
            keep = mask.df().filter(F.col(mask.name)).select(ROW_ID)
            out = ds.df.join(keep, ROW_ID, "left_semi")
        return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)
    # Positional fallback: i-th row of the dataset pairs with i-th mask value.
    n_ds = ds.df.count()
    mask_df = mask.df()
    n_mask = mask_df.count()
    if n_ds != n_mask:
        raise ValueError(
            f"Mask length {n_mask} does not match dataset length {n_ds}"
        )
    ds_ranked = runner.ranked(ds.df)
    mask_ranked = runner.ranked(mask_df).select(
        F.col("__rank"), F.col(mask.name).alias("__mask")
    )
    out = (
        ds_ranked.join(mask_ranked, "__rank")
        .filter(F.col("__mask"))
        .drop("__rank", "__mask")
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


# ====================================================================== #
# Implementations: predicates & scalar functions                          #
# ====================================================================== #


@SparkRunner.implementation
def category_to_boolean(runner: SparkRunner, op: CategoryToBooleanOp) -> ColumnPlan:
    col = runner.column_plan(op.input_category)
    dtype = col.df().schema[col.name].dataType
    expr = col.expr if isinstance(dtype, T.StringType) else col.expr.cast("string")
    if op.true_values is not None and op.false_values is not None:
        union = sorted(set(op.true_values) | set(op.false_values))
        bad = col.source.filter(~expr.isin(union) & expr.isNotNull()).limit(1)
        rows = bad.collect()
        if rows:
            raise ValueError(
                f"Column contains values outside true_values ∪ false_values "
                f"(e.g. {rows[0][col.name]!r})"
            )
        out = expr.isin(sorted(op.true_values))
    elif op.true_values is not None:
        out = expr.isin(sorted(op.true_values))
    else:
        out = ~expr.isin(sorted(op.false_values))
    return ColumnPlan(
        source=col.source,
        expr=out,
        name=VALUE,
        aligned_with=col.aligned_with,
        dense=col.dense,
    )


def _require_boolean(plan: ColumnPlan) -> None:
    dtype = plan.df().schema[plan.name].dataType
    if not isinstance(dtype, T.BooleanType):
        raise TypeError(f"Expected a boolean column, got {dtype.simpleString()}")


@SparkRunner.implementation
def boolean_logic(runner: SparkRunner, op: BooleanLogicOp) -> ColumnPlan:
    left = runner.column_plan(op.left)
    _require_boolean(left)
    if op.operation == "not":
        return ColumnPlan(
            source=left.source,
            expr=~left.expr,
            name=VALUE,
            aligned_with=left.aligned_with,
            dense=left.dense,
        )
    right = runner.column_plan(op.right)
    _require_boolean(right)
    df, l, r, template = runner.align_columns(left, right)
    combined = {"and": l & r, "or": l | r, "xor": l != r}[op.operation]
    return ColumnPlan(
        source=df,
        expr=combined,
        name=VALUE,
        aligned_with=template.aligned_with,
        dense=template.dense,
    )


@SparkRunner.implementation
def pairwise_arithmetic(runner: SparkRunner, op: PairwiseArithmeticOp) -> ColumnPlan:
    left = runner.column_plan(op.left)
    right = runner.column_plan(op.right)
    df, l, r, template = runner.align_columns(left, right)
    l, r = l.cast("double"), r.cast("double")
    if op.operation == "+":
        expr = l + r
    elif op.operation == "-":
        expr = l - r
    elif op.operation == "*":
        expr = l * r
    else:
        # numpy float semantics: x/0 → ±inf, 0/0 → nan (Spark yields null).
        expr = (
            F.when(r != 0.0, l / r)
            .when(l > 0.0, F.lit(float("inf")))
            .when(l < 0.0, F.lit(float("-inf")))
            .otherwise(F.lit(float("nan")))
        )
    return ColumnPlan(
        source=df,
        expr=expr,
        name=VALUE,
        aligned_with=template.aligned_with,
        dense=template.dense,
    )


@SparkRunner.implementation
def vector_to_scalar(runner: SparkRunner, op: VectorToScalarOp) -> ColumnPlan:
    col = runner.column_plan(op.input)
    # Bounds check rides the real job as an inline raise_error guard —
    # building the plan must trigger NO Spark job (an eager min(size)
    # aggregate here would force a full column scan per .col(i) call at
    # graph-build time, a driver-blocking pass at 100-TB scale).
    idx = op.col_index
    guarded = F.when(
        F.size(col.expr) <= F.lit(idx),
        F.raise_error(
            F.concat(
                F.lit(f"col_index {idx} out of bounds for vector of size "),
                F.size(col.expr).cast("string"),
            )
        ).cast("double"),
    ).otherwise(F.element_at(col.expr, idx + 1).cast("double"))
    return ColumnPlan(
        source=col.source,
        expr=guarded,
        name=VALUE,
        aligned_with=col.aligned_with,
        dense=col.dense,
    )


@SparkRunner.implementation
def parse_json_column(runner: SparkRunner, op: ParseJSONColumnOp) -> ColumnPlan:
    col = runner.column_plan(op.input)
    return ColumnPlan(
        source=col.source,
        expr=F.parse_json(col.expr),  # strict: invalid JSON errors (parity)
        name=VALUE,
        aligned_with=col.aligned_with,
        dense=col.dense,
        is_json=True,
    )


@SparkRunner.implementation
def json_get_field(runner: SparkRunner, op: JSONGetFieldOp) -> ColumnPlan:
    col = runner.column_plan(op.input)
    if col.is_json:
        expr = F.try_variant_get(col.expr, f"$.{op.path}", "string")
    else:
        expr = F.get_json_object(col.expr.cast("string"), f"$.{op.path}")
    return ColumnPlan(
        source=col.source,
        expr=expr,
        name=VALUE,
        aligned_with=col.aligned_with,
        dense=col.dense,
    )


@SparkRunner.implementation
def jinja_templatize(runner: SparkRunner, op: JinjaTemplatizeOp) -> ColumnPlan:
    """Arrow-batched pandas UDF running a real Jinja2 environment (template
    conditionals/loops/filters make SQL translation unfaithful; parity:
    ``local_arrow_runner.py:869-931``)."""
    import jinja2

    names = sorted(op.context)
    plans = {k: runner.column_plan(v) for k, v in op.context.items()}
    json_vars = {k for k, v in op.context.items() if isinstance(v, JSONColumnType)}

    if not plans:
        raise ValueError("template requires at least one column variable")

    aligned = {p.aligned_with for p in plans.values()}
    sources = {id(p.source) for p in plans.values()}
    if len(aligned) == 1 and len(sources) == 1:
        base = next(iter(plans.values()))
        df = base.source
        exprs = {
            k: (F.to_json(p.expr) if k in json_vars and p.is_json else p.expr)
            for k, p in plans.items()
        }
    elif len(aligned) == 1:
        # Same row-id domain, different physical DataFrames (e.g. an
        # LLM-generated variable next to a plain column): equi-join the
        # single-column frames on ROW_ID — no rank pass needed.
        base = plans[names[0]]
        df = base.df().withColumnRenamed(base.name, f"__v_{names[0]}")
        for k in names[1:]:
            p = plans[k]
            df = df.join(
                p.df().withColumnRenamed(p.name, f"__v_{k}"), ROW_ID
            )
        exprs = {
            k: (
                F.to_json(F.col(f"__v_{k}"))
                if k in json_vars and plans[k].is_json
                else F.col(f"__v_{k}")
            )
            for k in names
        }
    else:
        # Cross-dataset context: positional rank-zip of every column.
        first = plans[names[0]]
        df = runner.ranked(first.df()).withColumnRenamed(first.name, f"__v_{names[0]}")
        n0 = df.count()
        for k in names[1:]:
            p = plans[k]
            pdf_k = runner.ranked(p.df()).select(
                F.col("__rank"), F.col(p.name).alias(f"__v_{k}")
            )
            if pdf_k.count() != n0:
                raise ValueError("Template context columns have different lengths")
            df = df.join(pdf_k, "__rank")
        df = df.drop("__rank")
        exprs = {
            k: (
                F.to_json(F.col(f"__v_{k}"))
                if k in json_vars and plans[k].is_json
                else F.col(f"__v_{k}")
            )
            for k in names
        }
        base = plans[names[0]]

    # Per-row Jinja rendering is CPU-bound: a sizeable parquet source can
    # still arrive as ONE input split (= one busy core across the whole
    # cluster), so widen narrow scans before the UDF — size-gated, because
    # repartitioning a tiny table costs more than the parallelism buys.
    from ..functions.partitioning import widen_if_heavy

    df = widen_if_heavy(df)

    template_src = op.template
    constants = dict(op.constants)
    max_length = op.max_length
    json_var_names = set(json_vars)

    @F.pandas_udf(T.StringType())
    def render(*cols: pd.Series) -> pd.Series:
        import json as _json

        env = jinja2.Environment(undefined=jinja2.StrictUndefined)
        env.filters["drop_nulls"] = lambda xs: [x for x in xs if x is not None]
        env.filters["repr"] = repr
        tmpl = env.from_string(template_src)
        out = []
        for row in zip(*cols):
            ctx = dict(constants)
            for k, v in zip(names, row):
                ctx[k] = _json.loads(v) if k in json_var_names and v is not None else v
            text = tmpl.render(**ctx)
            if max_length is not None:
                text = text[:max_length]
            out.append(text)
        return pd.Series(out, dtype="object")

    expr = render(*[exprs[k] for k in names])
    return ColumnPlan(
        source=df,
        expr=expr,
        name=VALUE,
        aligned_with=base.aligned_with,
        dense=base.dense,
    )


# ====================================================================== #
# Implementations: dataset preparation                                    #
# ====================================================================== #


@SparkRunner.implementation
def assign_train_test_split(
    runner: SparkRunner, op: AssignTrainTestSplitOp
) -> ColumnPlan:
    ds = runner.dataset_plan(op.dataset)

    if op.method == "hash":
        from ..functions.hashing import md5_long

        frac = _test_fraction(op)
        # md5-based salted hash (not xxhash64) so the split is reproducible
        # in any engine — the DuckDB oracle recomputes it exactly.
        bucket = F.pmod(
            md5_long(
                F.concat(F.col(ROW_ID).cast("string"), F.lit(f":{op.random_state}"))
            ),
            F.lit(1_000_000),
        )
        expr = F.when(bucket < int(frac * 1_000_000), F.lit("test")).otherwise(
            F.lit("train")
        )
        return ColumnPlan(
            source=ds.df, expr=expr, name=VALUE,
            aligned_with=op.dataset.uuid, dense=ds.dense,
        )

    # RNG parity mode: CPython random.Random(seed).sample over row positions
    # (reference ``local_arrow_runner.py:538-620``). O(n) driver memory by
    # design — use method="hash" at data scale.
    total = ds.df.count()
    n_train, n_test = _resolve_split_counts(op, total)
    rng = random.Random(op.random_state)
    test_idx = set(rng.sample(range(total), n_test)) if n_test else set()
    labels = ["test" if i in test_idx else "train" for i in range(total)]

    if total == 0:
        empty = runner.spark.createDataFrame(
            [], schema=T.StructType(
                [T.StructField(ROW_ID, T.LongType()), T.StructField(VALUE, T.StringType())]
            )
        )
        return ColumnPlan(
            source=empty, expr=F.col(VALUE), name=VALUE,
            aligned_with=op.dataset.uuid, dense=True,
        )

    if ds.dense:
        ids = range(total)
    else:
        ids = [r[0] for r in ds.df.select(ROW_ID).orderBy(ROW_ID).collect()]
    assign_pdf = pd.DataFrame({ROW_ID: list(ids), VALUE: labels})
    assign_df = runner.spark.createDataFrame(assign_pdf)
    joined = ds.df.select(ROW_ID).join(F.broadcast(assign_df), ROW_ID)
    return ColumnPlan(
        source=joined, expr=F.col(VALUE), name=VALUE,
        aligned_with=op.dataset.uuid, dense=ds.dense,
    )


def _test_fraction(op: AssignTrainTestSplitOp) -> float:
    if op.test_size is None and op.train_size is None:
        return 0.25
    if op.test_size is not None:
        if isinstance(op.test_size, float):
            if not 0 < op.test_size < 1:
                raise ValueError("test_size as float must be in (0, 1)")
            return op.test_size
        raise ValueError("hash split requires float sizes")
    if isinstance(op.train_size, float):
        if not 0 < op.train_size < 1:
            raise ValueError("train_size as float must be in (0, 1)")
        return 1.0 - op.train_size
    raise ValueError("hash split requires float sizes")


def _resolve_split_counts(op: AssignTrainTestSplitOp, total: int) -> tuple[int, int]:
    """Reference size semantics: float test → ceil, float train → floor;
    ints must fit; specified train+test must equal n; default test = 0.25."""

    def normalize(name: str, value) -> int:
        if isinstance(value, bool):
            raise TypeError(f"{name}_size must be float or int, got bool")
        if isinstance(value, float):
            if not 0 < value < 1:
                raise ValueError(
                    f"{name}_size as float must be in (0, 1); got {value}"
                )
            scaled = math.ceil(value * total) if name == "test" else math.floor(
                value * total
            )
            return min(scaled, total)
        if isinstance(value, int):
            if value < 0 or value > total:
                raise ValueError(
                    f"{name}_size must be between 0 and {total}; got {value}"
                )
            return value
        raise TypeError(f"Unsupported {name}_size type: {type(value).__name__}")

    if total == 0:
        return 0, 0
    if op.test_size is None and op.train_size is None:
        n_test = math.ceil(0.25 * total)
        return total - n_test, n_test
    n_test = normalize("test", op.test_size) if op.test_size is not None else None
    n_train = normalize("train", op.train_size) if op.train_size is not None else None
    if n_test is None:
        n_test = total - n_train
    elif n_train is None:
        n_train = total - n_test
    if n_test < 0 or n_train < 0:
        raise ValueError(
            f"Split sizes produced negative allocations (train={n_train}, test={n_test})"
        )
    if n_train + n_test != total:
        if op.test_size is not None and op.train_size is not None:
            raise ValueError(
                f"train_size ({n_train}) + test_size ({n_test}) must equal "
                f"dataset size ({total})"
            )
        n_train = total - n_test
    return n_train, n_test


@SparkRunner.implementation
def skyline_select_op(runner: SparkRunner, op: SkylineSelectOp) -> DatasetPlan:
    """Pareto-frontier selection as a memoized op: survivors keep their
    ORIGINAL row ids (mask semantics, dense=False). The frontier is a
    partition-invariant row SET (sampling.py:skyline_select), so the
    content-addressed result reproduces on any layout or retry."""
    from ..functions.sampling import skyline_select as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(ds.df, dict(op.criteria), chunk=op.chunk)
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=False)


@SparkRunner.implementation
def calibration_bins_op(
    runner: SparkRunner, op: CalibrationBinsOp
) -> DatasetPlan:
    """Reliability-curve aggregate: a bounded ``bins``-row table, fresh
    dense row ids in bin order (the bounded-aggregate contract)."""
    from pyspark.sql import Window as _W

    from ..functions.metrics import calibration_bins as _impl

    ds = runner.dataset_plan(op.dataset)
    out = _impl(ds.df, op.score_column, op.label_column, bins=op.bins)
    w = _W.orderBy("bin")
    out = out.select(
        (F.row_number().over(w) - 1).cast("long").alias(ROW_ID), "*"
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=True)


@SparkRunner.implementation
def pmi_collocations_op(
    runner: SparkRunner, op: PmiCollocationsOp
) -> DatasetPlan:
    """PMI collocation mining: a bounded top-k table, fresh dense row
    ids in the deterministic (pmi desc, w1, w2) rank order.

    The result is top_k rows by construction, so the op path
    materializes it eagerly (an eager localCheckpoint — executor-side,
    no driver round-trip) and releases the two vocab-sized count-table
    pins immediately, on the error path too — repeated
    PmiCollocationsOp runs over different corpora in one long-lived
    session no longer accumulate cached tables until a blanket
    clearCache."""
    from ..functions.text import pmi_collocations as _impl

    ds = runner.dataset_plan(op.dataset)
    pins: list = []
    try:
        scored = _impl(
            ds.df, op.text_column, min_count=op.min_count, top_k=op.top_k,
            pins=pins,
        ).localCheckpoint(eager=True)
    finally:
        for frame in pins:
            frame.unpersist()
    from pyspark.sql import Window as _W

    w = _W.orderBy(F.col("pmi").desc(), "w1", "w2")
    out = scored.select(
        (F.row_number().over(w) - 1).cast("long").alias(ROW_ID), "*"
    )
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=True)


@SparkRunner.implementation
def kneser_ney_score_op(
    runner: SparkRunner, op: KneserNeyScoreOp
) -> DatasetPlan:
    """Two-parent Kneser-Ney enrichment: this dataset scored against the
    train parent's count tables; n_tokens/n_oov/logprob_sum left-joined
    back on the row id (blank docs null). Both parents content-address
    the result.

    The op path eagerly checkpoints the NARROW scores frame (4 columns
    per doc) and releases the trainer's vocab²-sized count-table pin —
    repeated LM ops over different corpora in one session must not
    accumulate cached tables (the pmi_collocations_op lesson)."""
    from ..functions.text import kneser_ney_score as _score
    from ..functions.text import kneser_ney_train as _train

    ds = runner.dataset_plan(op.dataset)
    train = runner.dataset_plan(op.train)
    lm = _train(
        train.df.select(
            ROW_ID, F.col(op.train_column).alias(op.text_column)
        ),
        op.text_column,
    )
    try:
        scores = _score(
            lm, ds.df.select(ROW_ID, op.text_column),
            op.text_column, ROW_ID, discount=op.discount,
        ).localCheckpoint(eager=True)
    finally:
        # Release the trainer's pins on the error path too — a failed
        # checkpoint must not leak a vocab²-sized cached table.
        for key in lm:
            if key.startswith("_pinned_"):
                lm[key].unpersist()
    out = ds.df.join(scores, ROW_ID, "left")
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def kneser_ney3_score_op(
    runner: SparkRunner, op: KneserNey3ScoreOp
) -> DatasetPlan:
    """Trigram twin of kneser_ney_score_op: same two-parent enrichment
    contract, order-3 count tables with optional hapax pruning; same
    checkpoint-then-release pin hygiene."""
    from ..functions.text import kneser_ney3_score as _score
    from ..functions.text import kneser_ney3_train as _train

    ds = runner.dataset_plan(op.dataset)
    train = runner.dataset_plan(op.train)
    lm = _train(
        train.df.select(
            ROW_ID, F.col(op.train_column).alias(op.text_column)
        ),
        op.text_column,
        min_count=op.min_count,
    )
    try:
        scores = _score(
            lm, ds.df.select(ROW_ID, op.text_column),
            op.text_column, ROW_ID,
            discount="modified" if op.smoothing == "modified" else op.discount,
            base_discount=op.discount,
        ).localCheckpoint(eager=True)
    finally:
        for key in lm:
            if key.startswith("_pinned_"):
                lm[key].unpersist()
    out = ds.df.join(scores, ROW_ID, "left")
    return DatasetPlan(df=out, dataset_uuid=op.uuid, dense=ds.dense)


@SparkRunner.implementation
def grouped(runner: SparkRunner, op: GroupedOp):
    plan = None
    for sub in op.ops:
        plan = runner.plan(sub)
    return plan


# Register the ML / LLM / viz implementation modules (import side effects).
from . import classifier_impl as _classifier_impl  # noqa: E402,F401
from . import llm_impl as _llm_impl  # noqa: E402,F401
from . import viz_impl as _viz_impl  # noqa: E402,F401
