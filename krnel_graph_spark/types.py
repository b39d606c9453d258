"""Typed dataset/column node surface — the user-facing fluent API.

Graph building is eager (each method constructs a frozen OpSpec node),
execution is lazy (a Runner lowers nodes to Spark DataFrames on demand).

API parity with the reference's ``src/krnel/graph/types.py:18-808`` (dataset
+ nine column types and their fluent method surfaces); implementation is
original and Spark-first.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Union

from .plans.op_spec import OpSpec

if TYPE_CHECKING:  # pragma: no cover
    pass


class DatasetType(OpSpec):
    """A multi-column table node; the root of most graphs."""

    # -- typed column selection ------------------------------------------ #

    def col_vector(self, column_name: str) -> "VectorColumnType":
        from .operators.dataset_ops import SelectVectorColumnOp

        return SelectVectorColumnOp(dataset=self, column_name=column_name)

    def col_text(self, column_name: str) -> "TextColumnType":
        from .operators.dataset_ops import SelectTextColumnOp

        return SelectTextColumnOp(dataset=self, column_name=column_name)

    def col_conversation(self, column_name: str) -> "ConversationColumnType":
        from .operators.dataset_ops import SelectConversationColumnOp

        return SelectConversationColumnOp(dataset=self, column_name=column_name)

    def col_categorical(self, column_name: str) -> "CategoricalColumnType":
        from .operators.dataset_ops import SelectCategoricalColumnOp

        return SelectCategoricalColumnOp(dataset=self, column_name=column_name)

    def col_train_test_split(self, column_name: str) -> "TrainTestSplitColumnType":
        from .operators.dataset_ops import SelectTrainTestSplitColumnOp

        return SelectTrainTestSplitColumnOp(dataset=self, column_name=column_name)

    def col_score(self, column_name: str) -> "ScoreColumnType":
        from .operators.dataset_ops import SelectScoreColumnOp

        return SelectScoreColumnOp(dataset=self, column_name=column_name)

    def col_boolean(self, column_name: str) -> "BooleanColumnType":
        from .operators.dataset_ops import SelectBooleanColumnOp

        return SelectBooleanColumnOp(dataset=self, column_name=column_name)

    def col_json(self, column_name: str) -> "JSONColumnType":
        from .operators.dataset_ops import SelectJSONColumnOp

        return SelectJSONColumnOp(dataset=self, column_name=column_name)

    # -- row selection ---------------------------------------------------- #

    def take(
        self,
        num_rows: Optional[int] = None,
        *,
        skip: int = 1,
        offset: int = 0,
    ) -> "DatasetType":
        """Python-slice row sampling: ``rows[offset::skip][:num_rows]``."""
        from .operators.dataset_ops import TakeRowsOp

        return TakeRowsOp(dataset=self, num_rows=num_rows, skip=skip, offset=offset)

    def mask_rows(self, mask: "BooleanColumnType") -> "DatasetType":
        """Keep rows where ``mask`` is true (mask must be row-aligned)."""
        from .operators.dataset_ops import MaskRowsOp

        return MaskRowsOp(dataset=self, mask=mask)

    def assign_row_id(self) -> "RowIDColumnType":
        """Stable per-row identifier (the engine's native ``__row_id``)."""
        from .operators.dataset_ops import AssignRowIDOp

        return AssignRowIDOp(dataset=self)

    # -- scale surface (beyond-reference; memoized like any op) ----------- #

    def drop_exact_dups(self, text_column: str) -> "DatasetType":
        """Keep the first (min row id) row per normalized-text fingerprint."""
        from .operators.scale_ops import DropExactDupsOp

        return DropExactDupsOp(dataset=self, text_column=text_column)

    def drop_near_dups(
        self,
        text_column: str,
        num_perm: int = 32,
        bands: int = 8,
        shingle_k: int = 3,
        jaccard_threshold: float = 0.5,
        keep_by: Optional[str] = None,
    ) -> "DatasetType":
        """Remove MinHash-LSH near-duplicates of ``text_column``."""
        from .operators.scale_ops import DropNearDupsOp

        return DropNearDupsOp(
            dataset=self,
            text_column=text_column,
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
            jaccard_threshold=jaccard_threshold,
            keep_by=keep_by,
        )

    def text_stats(self, text_column: str) -> "DatasetType":
        """Append token/stopword/punctuation/quality stat columns."""
        from .operators.scale_ops import TextStatsOp

        return TextStatsOp(dataset=self, text_column=text_column)

    def chunk_docs(
        self, text_column: str, chunk_size: int = 32, overlap: int = 8
    ) -> "DatasetType":
        """Explode documents into overlapping token-window chunks."""
        from .operators.scale_ops import ChunkDocumentsOp

        return ChunkDocumentsOp(
            dataset=self,
            text_column=text_column,
            chunk_size=chunk_size,
            overlap=overlap,
        )

    def hash_sample(self, fraction: float, seed: int = 0) -> "DatasetType":
        """Deterministic row-id-hash Bernoulli sample (scan-side filter)."""
        from .operators.scale_ops import HashSampleOp

        return HashSampleOp(dataset=self, fraction=fraction, seed=seed)

    def decontaminate_against(
        self,
        against: "DatasetType",
        text_column: str,
        against_column: Optional[str] = None,
        ngram: int = 8,
    ) -> "DatasetType":
        """Drop rows sharing any word n-gram with ``against``."""
        from .operators.scale_ops import DecontaminateAgainstOp

        return DecontaminateAgainstOp(
            dataset=self,
            against=against,
            text_column=text_column,
            against_column=against_column or text_column,
            ngram=ngram,
        )

    def ann_topk(
        self,
        queries: "DatasetType",
        vector_column: str,
        id_column: str,
        k: int = 10,
    ) -> "DatasetType":
        """Exact cosine top-k of ``queries`` against this corpus."""
        from .operators.scale_ops import AnnTopKOp

        return AnnTopKOp(
            dataset=self,
            queries=queries,
            vector_column=vector_column,
            id_column=id_column,
            k=k,
        )

    def stratified_sample(
        self,
        strata_column: str,
        fractions: dict,
        seed: int = 0,
        default_fraction: float = 0.0,
    ) -> "DatasetType":
        """Keep a deterministic fraction of each stratum."""
        from .operators.scale_ops import StratifiedSampleOp

        return StratifiedSampleOp(
            dataset=self,
            strata_column=strata_column,
            fractions=fractions,
            seed=seed,
            default_fraction=default_fraction,
        )

    def mix_to_weights(
        self, strata_column: str, weights: dict, seed: int = 0
    ) -> "DatasetType":
        """Rebalance strata to integer target proportions (downsampling)."""
        from .operators.scale_ops import MixToWeightsOp

        return MixToWeightsOp(
            dataset=self, strata_column=strata_column, weights=weights, seed=seed
        )

    def pii_scrub(
        self,
        text_column: str,
        kinds: tuple = ("email", "ssn", "phone", "ipv4"),
    ) -> "DatasetType":
        """Redact common PII shapes in ``text_column`` (typed tokens)."""
        from .operators.scale_ops import PiiScrubOp

        return PiiScrubOp(dataset=self, text_column=text_column, kinds=tuple(kinds))

    def group_cap(
        self,
        key_columns: "Union[str, list]",
        n: int,
        order_by: "Union[str, list]",
    ) -> "DatasetType":
        """Keep at most ``n`` rows per key, ranked by ``order_by``."""
        from .operators.scale_ops import GroupCapOp

        keys = [key_columns] if isinstance(key_columns, str) else list(key_columns)
        order = [order_by] if isinstance(order_by, str) else list(order_by)
        return GroupCapOp(dataset=self, key_columns=keys, n=n, order_by=order)

    def paragraph_dedup(self, text_column: str, sep: str = "\n") -> "DatasetType":
        """Corpus-wide paragraph dedup: keep each paragraph's first
        occurrence only, reassemble survivors in order."""
        from .operators.scale_ops import ParagraphDedupOp

        return ParagraphDedupOp(dataset=self, text_column=text_column, sep=sep)

    def cdc_dedup(
        self, text_column: str, window: int = 4, modulus: int = 64
    ) -> "DatasetType":
        """Append the content-defined-chunking dedup signal: per row,
        chunk counts and the corpus-wide duplicated-token fraction."""
        from .operators.scale_ops import CdcChunkDedupOp

        return CdcChunkDedupOp(
            dataset=self, text_column=text_column, window=window, modulus=modulus
        )

    def winnow_pairs(
        self,
        text_column: str,
        k: int = 4,
        w: int = 4,
        min_shared: int = 2,
        max_doc_freq: Optional[int] = None,
    ) -> "DatasetType":
        """Candidate pairs sharing >= min_shared winnowing (MOSS)
        fingerprints; max_doc_freq drops boilerplate-hot prints."""
        from .operators.scale_ops import WinnowPairsOp

        return WinnowPairsOp(
            dataset=self,
            text_column=text_column,
            k=k,
            w=w,
            min_shared=min_shared,
            max_doc_freq=max_doc_freq,
        )

    def span_corruption(
        self,
        text_column: str,
        noise_density: float = 0.15,
        mean_span: int = 3,
        seed: int = 0,
    ) -> "DatasetType":
        """Append deterministic T5 denoising pairs: ``inputs`` with
        <extra_id_k> sentinels over the masked spans, ``targets`` as
        the sentinel-delimited span concatenation."""
        from .operators.scale_ops import SpanCorruptionOp

        return SpanCorruptionOp(
            dataset=self,
            text_column=text_column,
            noise_density=noise_density,
            mean_span=mean_span,
            seed=seed,
        )

    def dedup_weights(
        self,
        text_column: str,
        num_perm: int = 32,
        bands: int = 8,
        jaccard_threshold: float = 0.5,
        mode: str = "inverse",
    ) -> "DatasetType":
        """Append the soft-dedup sampling weight: ``cluster_size`` +
        ``weight = 1/|near-dup cluster|`` (or 1/sqrt with mode='sqrt');
        rows are downweighted, never dropped."""
        from .operators.scale_ops import DedupWeightsOp

        return DedupWeightsOp(
            dataset=self,
            text_column=text_column,
            num_perm=num_perm,
            bands=bands,
            jaccard_threshold=jaccard_threshold,
            mode=mode,
        )

    def skyline_select(
        self, criteria: dict, chunk: int = 2048
    ) -> "DatasetType":
        """Keep exactly the Pareto-frontier rows over ``criteria``
        (column -> 'max' | 'min') — multi-objective selection without a
        baked-in weighted score. Mask semantics: survivors keep ids."""
        from .operators.scale_ops import SkylineSelectOp

        return SkylineSelectOp(dataset=self, criteria=dict(criteria), chunk=chunk)

    def calibration_bins(
        self, score_column: str, label_column: str, bins: int = 10
    ) -> "DatasetType":
        """Reliability-curve table (per-bin confidence vs accuracy +
        ECE gap) for a [0,1] score column against a boolean label."""
        from .operators.scale_ops import CalibrationBinsOp

        return CalibrationBinsOp(
            dataset=self,
            score_column=score_column,
            label_column=label_column,
            bins=bins,
        )

    def pmi_collocations(
        self, text_column: str, min_count: int = 5, top_k: int = 100
    ) -> "DatasetType":
        """Top-k bigram collocations by PMI with a hapax floor."""
        from .operators.scale_ops import PmiCollocationsOp

        return PmiCollocationsOp(
            dataset=self,
            text_column=text_column,
            min_count=min_count,
            top_k=top_k,
        )

    def kneser_ney_score(
        self,
        train: "DatasetType",
        text_column: str,
        train_column: Optional[str] = None,
        discount: float = 0.75,
    ) -> "DatasetType":
        """Append interpolated bigram Kneser-Ney LM scores
        (n_tokens / n_oov / logprob_sum) against the ``train`` parent's
        count tables — the KenLM/CCNet perplexity-filter signal."""
        from .operators.scale_ops import KneserNeyScoreOp

        return KneserNeyScoreOp(
            dataset=self,
            train=train,
            text_column=text_column,
            train_column=train_column or text_column,
            discount=discount,
        )

    def kneser_ney3_score(
        self,
        train: "DatasetType",
        text_column: str,
        train_column: Optional[str] = None,
        discount: float = 0.75,
        min_count: int = 1,
        smoothing: str = "fixed",
    ) -> "DatasetType":
        """Append TRIGRAM interpolated Kneser-Ney LM scores — the
        order-3 KenLM shape CCNet-grade perplexity filtering ships,
        with optional hapax pruning of the trigram table and
        ``smoothing="modified"`` for Chen-Goodman three-discount KN
        (KenLM's default; ``discount`` then serves as the degenerate-
        level fallback and continuation-floor discount)."""
        from .operators.scale_ops import KneserNey3ScoreOp

        if smoothing not in ("fixed", "modified"):
            raise ValueError("smoothing must be 'fixed' or 'modified'")
        return KneserNey3ScoreOp(
            dataset=self,
            train=train,
            text_column=text_column,
            train_column=train_column or text_column,
            discount=discount,
            min_count=min_count,
            smoothing=smoothing,
        )

    def gopher_rules(self, text_column: str) -> "DatasetType":
        """Append the Gopher quality-rule flags + keep verdict."""
        from .operators.scale_ops import GopherRulesOp

        return GopherRulesOp(dataset=self, text_column=text_column)

    def c4_rules(self, text_column: str) -> "DatasetType":
        """Append C4-cleaned text, counters and the keep verdict."""
        from .operators.scale_ops import C4RulesOp

        return C4RulesOp(dataset=self, text_column=text_column)

    def token_entropy(self, text_column: str) -> "DatasetType":
        """Append Shannon token-entropy diversity stats."""
        from .operators.scale_ops import TokenEntropyOp

        return TokenEntropyOp(dataset=self, text_column=text_column)

    def dsir_weights(
        self,
        target: "DatasetType",
        text_column: str,
        target_column: Optional[str] = None,
        buckets: int = 65_536,
        smoothing: float = 1.0,
    ) -> "DatasetType":
        """Append DSIR importance weights toward ``target``'s distribution."""
        from .operators.scale_ops import DsirWeightsOp

        return DsirWeightsOp(
            dataset=self,
            target=target,
            text_column=text_column,
            target_column=target_column or text_column,
            buckets=buckets,
            smoothing=smoothing,
        )

    def compression_signals(
        self, text_column: str, level: int = 6
    ) -> "DatasetType":
        """Append zlib-compressibility byte counts (boilerplate signal)."""
        from .operators.scale_ops import CompressionSignalsOp

        return CompressionSignalsOp(
            dataset=self, text_column=text_column, level=level
        )

    def ngram_coverage(
        self,
        corpus: "DatasetType",
        text_column: str,
        corpus_column: Optional[str] = None,
        ngram: int = 8,
    ) -> "DatasetType":
        """Append per-row contamination coverage against ``corpus``."""
        from .operators.scale_ops import NgramCoverageOp

        return NgramCoverageOp(
            dataset=self,
            corpus=corpus,
            text_column=text_column,
            corpus_column=corpus_column or text_column,
            ngram=ngram,
        )

    def sequence_pack(
        self,
        order_by: str,
        token_column: str,
        budget: int,
        partition_by: Optional[str] = None,
    ) -> "DatasetType":
        """Offset-pack rows into fixed-token-budget training sequences."""
        from .operators.scale_ops import SequencePackOp

        return SequencePackOp(
            dataset=self,
            order_by=order_by,
            token_column=token_column,
            budget=budget,
            partition_by=partition_by,
        )

    # -- dataset preparation ---------------------------------------------- #

    def assign_train_test_split(
        self,
        test_size: Union[float, int, None] = None,
        train_size: Union[float, int, None] = None,
        random_state: int = 42,
        method: str = "rng",
    ) -> "TrainTestSplitColumnType":
        """Deterministic "train"/"test" labels.

        ``method="rng"`` reproduces CPython ``random.Random(seed).sample``
        positional sampling (reference parity; O(n) driver memory).
        ``method="hash"`` is the scale-out variant: a salted multiplicative
        hash of the stable row id, fully distributed, no driver state.
        """
        from .operators.dataset_ops import AssignTrainTestSplitOp

        return AssignTrainTestSplitOp(
            dataset=self,
            test_size=test_size,
            train_size=train_size,
            random_state=random_state,
            method=method,
        )

    def template(
        self,
        template: str,
        strip_template_whitespace: bool = True,
        max_length: Optional[int] = None,
        **context: "TextColumnType | JSONColumnType | float | int | str",
    ) -> "TextColumnType":
        """Render a Jinja2 template per row; column vars + scalar constants."""
        from .operators.dataset_ops import JinjaTemplatizeOp

        columns: dict[str, OpSpec] = {}
        constants: dict[str, Union[float, int, str]] = {}
        for key, value in context.items():
            if isinstance(value, OpSpec):
                columns[key] = value
            else:
                constants[key] = value
        if strip_template_whitespace:
            template = template.strip()
        return JinjaTemplatizeOp(
            template=template,
            context=columns,
            constants=constants,
            max_length=max_length,
        )


# -------------------------------------------------------------------------- #
# Column types                                                                #
# -------------------------------------------------------------------------- #


class ColumnType(OpSpec):
    """A single-column node, row-aligned with an originating dataset."""


class RowIDColumnType(ColumnType):
    """Stable unique row identifiers."""


class VectorColumnType(ColumnType):
    """Fixed-width numeric vectors (``array<float>``)."""

    def col(self, index: int) -> "ScoreColumnType":
        from .operators.dataset_ops import VectorToScalarOp

        return VectorToScalarOp(input=self, col_index=index)

    def train_classifier(
        self,
        positives: "BooleanColumnType",
        negatives: Optional["BooleanColumnType"] = None,
        train_domain: Optional["BooleanColumnType"] = None,
        model_type: str = "logistic_regression",
        preprocessing: str = "none",
        random_state: int = 0,
        mode: str = "driver",
    ) -> "ClassifierType":
        from .operators.classifier_ops import TrainClassifierOp

        return TrainClassifierOp(
            x=self,
            positives=positives,
            negatives=negatives,
            train_domain=train_domain,
            model_type=model_type,
            preprocessing=preprocessing,
            random_state=random_state,
            mode=mode,
        )

    def umap_vis(self, **params) -> "VizEmbeddingColumnType":
        from .operators.viz_ops import UMAPVizOp

        return UMAPVizOp(input=self, **params)


class VizEmbeddingColumnType(ColumnType):
    """2-D visualization coordinates."""


class ClassifierType(OpSpec):
    """A trained classifier artifact."""

    def predict(self, input_data: "VectorColumnType") -> "ScoreColumnType":
        from .operators.classifier_ops import ClassifierPredictOp

        return ClassifierPredictOp(classifier=self, input_data=input_data)


class EvaluationReportType(OpSpec):
    """A JSON-shaped metrics artifact."""


class TextColumnType(ColumnType):
    """String column."""

    def is_in(
        self,
        true_values: Optional[set[str]] = None,
        false_values: Optional[set[str]] = None,
    ) -> "BooleanColumnType":
        from .operators.dataset_ops import CategoryToBooleanOp

        return CategoryToBooleanOp(
            input_category=self, true_values=true_values, false_values=false_values
        )

    def not_in(self, false_values: set[str]) -> "BooleanColumnType":
        return self.is_in(false_values=false_values)

    def parse_json(self) -> "JSONColumnType":
        from .operators.dataset_ops import ParseJSONColumnOp

        return ParseJSONColumnOp(input=self)

    def llm_generate_text(self, model_name: str, **params) -> "TextColumnType":
        from .operators.llm_ops import LLMGenerateTextOp

        return LLMGenerateTextOp(input=self, model_name=model_name, **params)

    def llm_layer_activations(
        self, model_name: str, layer_num: int = -1, token_mode: str = "last", **params
    ) -> "VectorColumnType":
        from .operators.llm_ops import LLMLayerActivationsOp

        return LLMLayerActivationsOp(
            input=self,
            model_name=model_name,
            layer_num=layer_num,
            token_mode=token_mode,
            **params,
        )

    def llm_logit_scores(self, model_name: str, tokens: list[str], **params):
        from .operators.llm_ops import LLMLogitScoresOp

        return LLMLogitScoresOp(
            input=self, model_name=model_name, tokens=tokens, **params
        )


class JSONColumnType(ColumnType):
    """Nested struct/list data (stored as Spark VARIANT)."""

    def get_field(self, path: str) -> "TextColumnType":
        """Extract a field (JSONPath-lite, e.g. ``"k"`` or ``"a.b"``) as text."""
        from .operators.dataset_ops import JSONGetFieldOp

        return JSONGetFieldOp(input=self, path=path)


class ConversationColumnType(JSONColumnType):
    """Chat conversations: ``array<struct<role:string, content:string>>``.

    Carries the same LLM entry points as text columns — providers render
    conversations through their chat template before inference (reference:
    LLM ops accept ``Union[TextColumnType, ConversationColumnType]``)."""

    def llm_generate_text(self, model_name: str, **params) -> "TextColumnType":
        from .operators.llm_ops import LLMGenerateTextOp

        return LLMGenerateTextOp(input=self, model_name=model_name, **params)

    def llm_layer_activations(
        self, model_name: str, layer_num: int = -1, token_mode: str = "last", **params
    ) -> "VectorColumnType":
        from .operators.llm_ops import LLMLayerActivationsOp

        return LLMLayerActivationsOp(
            input=self,
            model_name=model_name,
            layer_num=layer_num,
            token_mode=token_mode,
            **params,
        )

    def llm_logit_scores(self, model_name: str, tokens: list[str], **params):
        from .operators.llm_ops import LLMLogitScoresOp

        return LLMLogitScoresOp(
            input=self, model_name=model_name, tokens=tokens, **params
        )


class CategoricalColumnType(ColumnType):
    """Low-cardinality string column."""

    def is_in(
        self,
        true_values: Optional[set[str]] = None,
        false_values: Optional[set[str]] = None,
    ) -> "BooleanColumnType":
        from .operators.dataset_ops import CategoryToBooleanOp

        return CategoryToBooleanOp(
            input_category=self, true_values=true_values, false_values=false_values
        )

    def not_in(self, false_values: set[str]) -> "BooleanColumnType":
        return self.is_in(false_values=false_values)


class TrainTestSplitColumnType(ColumnType):
    """"train"/"test" labels."""

    def is_in(
        self,
        true_values: Optional[set[str]] = None,
        false_values: Optional[set[str]] = None,
    ) -> "BooleanColumnType":
        from .operators.dataset_ops import CategoryToBooleanOp

        return CategoryToBooleanOp(
            input_category=self, true_values=true_values, false_values=false_values
        )

    @property
    def train(self) -> "BooleanColumnType":
        return self.is_in({"train"})

    @property
    def test(self) -> "BooleanColumnType":
        return self.is_in({"test"})


class ScoreColumnType(ColumnType):
    """Float scores."""

    def evaluate(
        self,
        gt_positives: "BooleanColumnType",
        gt_negatives: Optional["BooleanColumnType"] = None,
        predict_domain: Optional["BooleanColumnType"] = None,
        split: Optional["TrainTestSplitColumnType"] = None,
        threshold: Optional[float] = None,
    ) -> "EvaluationReportType":
        from .operators.classifier_ops import ClassifierEvaluationOp

        return ClassifierEvaluationOp(
            scores=self,
            gt_positives=gt_positives,
            gt_negatives=gt_negatives,
            predict_domain=predict_domain,
            split=split,
            threshold=threshold,
        )

    def _arith(self, op: str, other: "ScoreColumnType") -> "ScoreColumnType":
        from .operators.dataset_ops import PairwiseArithmeticOp

        if not isinstance(other, ScoreColumnType):
            raise TypeError(f"Expected ScoreColumnType, got {type(other).__name__}")
        return PairwiseArithmeticOp(operation=op, left=self, right=other)

    def __add__(self, other: "ScoreColumnType") -> "ScoreColumnType":
        return self._arith("+", other)

    def __sub__(self, other: "ScoreColumnType") -> "ScoreColumnType":
        return self._arith("-", other)

    def __mul__(self, other: "ScoreColumnType") -> "ScoreColumnType":
        return self._arith("*", other)

    def __truediv__(self, other: "ScoreColumnType") -> "ScoreColumnType":
        return self._arith("/", other)


class BooleanColumnType(ColumnType):
    """Boolean column."""

    def _logic(self, op: str, other: "BooleanColumnType") -> "BooleanColumnType":
        from .operators.dataset_ops import BooleanLogicOp

        if not isinstance(other, BooleanColumnType):
            raise TypeError(f"Expected BooleanColumnType, got {type(other).__name__}")
        return BooleanLogicOp(operation=op, left=self, right=other)

    def __and__(self, other: "BooleanColumnType") -> "BooleanColumnType":
        return self._logic("and", other)

    def __or__(self, other: "BooleanColumnType") -> "BooleanColumnType":
        return self._logic("or", other)

    def __xor__(self, other: "BooleanColumnType") -> "BooleanColumnType":
        return self._logic("xor", other)

    def __invert__(self) -> "BooleanColumnType":
        from .operators.dataset_ops import BooleanLogicOp

        return BooleanLogicOp(operation="not", left=self, right=self)
