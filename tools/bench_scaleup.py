"""Beyond-reference crossover bench: scale sf0.1 up 20-40x and re-time the
headline queries that have no reference counterpart to race.

The reference engine has no joins/windows/dedup, so BASELINE.md's 2x bar
can't be checked against it for those operators. This harness gives them a
self-relative scaling curve instead: if a query is O(n) its scaled-up time
should grow ~linearly with rows; superlinear growth flags a plan that won't
survive 100 TB (e.g. a candidate-pair explosion or a single-partition sort).

Scaled tables (written once to $SPARK_GRAFT_SCALEUP_DIR, default
/tmp/krnel_scaleup):

* events  x20 -> 2M rows. New copies get fresh event_ids/user_ids over the
  SAME time span — the realistic growth axis is population, and shifting
  time instead would leave per-window row counts flat.
* lineitem x20 -> 12M rows, fresh order keys.
* documents x40 -> 200k rows. Copy 0 is pristine; later copies interleave a
  copy-specific token every 5 words, so intra-copy near-dup structure is
  preserved (both members of a pair get identical insertions) while
  cross-copy Jaccard drops below the MinHash threshold. A verbatim 40x copy
  would square the candidate-pair count (every doc exactly duplicated 40
  times) and time a workload no real corpus produces.

Usage: python tools/bench_scaleup.py [--rebuild]
Prints one JSON line: {"metric": "scaleup_queries_total", ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALEUP_DIR", "/tmp/krnel_scaleup")
SCALES = {"events": 20, "lineitem": 20, "documents": 40, "embeddings": 20}
QUERIES = [
    "agg_q1",
    "asof_join",
    "sessionize",
    "dedup_exact",
    "minhash_pairs",
    # r5 documents-only additions (the scaled-up dir has events/lineitem/
    # documents; queries touching other tables can't run here).
    "connected_components",
    "decontaminate",
    "repetition_stats",
    "top_terms",
    "chunk_docs",
    "bm25_search",
    "tfidf",
    "tokenize_ids",
    "chunk_pack",
    "dedup_against_near",
    "dup_windows",
    # r5 behavior-analytics additions: events x20 for the funnel family,
    # documents x40 for the retrieval/ER pair generators.
    "funnel_steps",
    "funnel_conversion",
    "retention_cohorts",
    "event_transitions",
    "hybrid_search",
    # r6-surface additions (r7): compressed ANN over the x20 perturbed
    # embedding corpus (queries stay the 10 original vec_ids — corpus
    # scales, query set doesn't, like a real serving index).
    "ann_ivfpq",
    # r7 quality/selection surface: all pure documents-table consumers,
    # so they ride the x40 perturbed corpus directly. (ngram_coverage is
    # in _extra_queries instead — its gate query bounds BOTH sides to
    # fixed doc_id windows; the honest growth axis is train-corpus size
    # against a fixed eval suite.)
    "token_entropy",
    "dsir_weights",
    "paragraph_dedup",
    "zipf_fit",
    "compression_signals",
    # r7 late additions: EWMA rides events x20; contrastive triplets ride
    # the x20 perturbed embeddings (fixed 10-query set, like ann_ivfpq).
    "ewma_smooth",
    "contrastive_triplets",
    # r8 surface: six documents-x40 consumers plus kcenter over the x20
    # perturbed embeddings (k fixed at 8: the pick loop is O(k) rounds
    # regardless of corpus size; per-round cost is the linear scan-side
    # fused dot + TakeOrdered argmax — the honest growth axis).
    "temperature_mixture",
    "blocklist",
    "pii_report",
    "leakage_safe_split",
    "packing_report",
    "quality_buckets",
    "kcenter_select",
    # r10: MMR diversity selection over the x20 perturbed embeddings —
    # same k-round driver shape as kcenter; scan CPU is the growth axis.
    "mmr_select",
    "gopher_rules",
    "stupid_backoff",
    # late-r8 surface: four documents-x40 consumers; centroid_filter
    # rides the x20 perturbed embeddings (the label-0 reference subset
    # scales with the corpus, the scoring scan is the growth axis).
    "c4_rules",
    "tokenizer_fertility",
    "corpus_divergence",
    "vocab_growth",
    "centroid_filter",
    "hash_embedding",
    "dedup_report",
    # r9: substring-dedup surgery over the x40 perturbed corpus (same
    # growth axis as dup_windows/dedup_report — window digests).
    "remove_dup_windows",
    # r10: soft dedup over the x40 corpus — pair mining + pair-graph CC;
    # marginal cost over minhash_pairs is one broadcast join.
    "dedup_weights",
    # winnow_pairs is deliberately absent (fuzzy_pairs' regime): the x40
    # corpus's every-5-words insertion leaves 4-gram windows BETWEEN
    # insertions identical across all 40 copies, so cross-copy shared
    # fingerprints make the valid pair OUTPUT itself near-quadratic
    # (308 pairs at sf0.1 -> 3.9M at x40, measured 2026-08-15; 46.8 s
    # for 3.9M pairs). Real corpora use max_doc_freq= (MOSS's own
    # boilerplate drop) against exactly this. BASELINE.md records it.
    # r10: span-corruption layout over the x40 corpus — one codegen scan
    # projection, zero shuffles; expect ~linear scan CPU.
    "span_corruption",
    # r10: epoch planner over the x40 corpus — one partial-agg'd groupBy
    # to a #sources-row table; expected ~flat (scan-bound).
    "data_budget",
    # r11: skyline over the x40 corpus — per-partition numpy prune then
    # a candidate-sized global pass; expect ~linear scan CPU (the
    # frontier of the perturbed corpus stays small).
    "skyline_docs",
    # r11: calibration rides the x40 corpus; the gate's global
    # percent_rank scorer is a single-task window (the documented demo
    # scorer), the op itself is the 10-row groupBy.
    "calibration_curve",
    # r11: PMI over the x40 corpus — two explode+groupBy count tables;
    # growth axis is token volume, vocab tables stay broadcast-sized.
    "pmi_colloc",
    # r11: keep-best dedup — same pair graph as dedup_weights, plus one
    # min_by over pair-graph nodes; marginal cost is the keeper lookup.
    "dedup_keep_best",
    # r11: Kneser-Ney against the doc_id%5 train slice — on this
    # harness the train side grows at 1/5 corpus rate (ids stay
    # stride-disjoint), so the curve mixes scoring (linear) with gram
    # tables (sublinear); the fully frozen path persists the tables
    # like stupid_backoff_train. The self-scored twin follows the
    # stupid_backoff two-sided-growth regime and is deliberately
    # absent here.
    "kneser_ney_fixed",
    # r11: BM25 via the persisted-index artifact — the gate query
    # rebuilds the index inline, so this curve is build+search; the
    # serve-only cost is the BASELINE.md A/B row (0.67 s vs 2.71 s
    # inline at x40).
    "bm25_index_search",
    # r12: trigram KN, pruned frozen-train variant (the production
    # shape — same 1/5-rate train growth as kneser_ney_fixed; the
    # trigram table is the new dominant artifact, pruning bounds it).
    "kneser_ney3_pruned",
    # r12: modified (Chen-Goodman) smoothing over the same artifact —
    # the marginal cost over kneser_ney3_pruned is the count-of-count
    # scalars + per-class context counts, all in existing aggregations.
    "kneser_ney3_modified",
    # r12: MinHash append leg — same banded-join growth as
    # dedup_against_index, plus the bounded param-layout collect.
    "minhash_append",
    # r13: ARPA export rows — train (the dominant cost: the same count
    # tables kneser_ney3 builds) + three type-table-bounded section
    # joins; the corpus is never rescanned by the sections themselves.
    "kn3_arpa",
    # r13: the generic ARPA-consumer scorer (gate shape = export + the
    # five-join lookup scoring of the FULL corpus; the serve-only path
    # loads persisted rows and pays scoring alone).
    "arpa_score",
    "random_projection",
    "export_manifest",
    "schema_drift",
    "unicode_normalize",
    "perplexity_buckets",
    # margin_pairs is deliberately absent (same reasoning as fuzzy_pairs
    # below): its gate query mines ALL label-0 vectors against the rest,
    # so scaling the corpus x20 scales BOTH sides -> 400x brute-force
    # cosine work (measured 64 s at x20, 2026-08-15). That regime is the
    # harness artifact, not the operator: at corpus scale the margin
    # criterion composes over an ANN shortlist (cosine_topk_lsh /
    # ann_ivfpq) with a fixed mining batch, exactly like the ann_* gate
    # queries keep their 10-query serving set. BASELINE.md section 5
    # records the measurement.
    # fuzzy_pairs is deliberately absent: the x40 corpus keeps 16-char
    # prefixes IDENTICAL across copies (the per-5-words token insertion
    # that breaks MinHash shingle similarity usually lands after char 16),
    # so the valid fuzzy-pair OUTPUT is itself quadratic (~5.4M pairs even
    # under an added n_chars/256 length band, measured 2026-08-14) — the
    # verbatim-copy regime this harness's docstring calls out as a
    # workload no real corpus produces. BASELINE.md section 5 records the
    # measurement.
]
ID_STRIDE = 10**9  # > any source id; keeps per-copy ids disjoint


def _extra_queries():
    """r7: scale curves for the r6 surface whose gate queries hard-code
    small corpora or small-modulus synthetic formulas.

    These can't ride the scaled parquet dirs: the graph gate queries
    derive edges as ``(doc_id * 7 + 3) % 500`` and the media gates
    synthesize pixels from ``doc_id % 256``-style formulas, and the
    copy stride 10**9 is divisible by 500, 256, 48 and 16 — so striding
    ids would make every copy an EXACT clone (same hub set / identical
    images), densifying one fixed graph instead of growing it and
    squaring the near-dup pair count. Instead each callable re-derives
    the corpus at N x the bench-gate size with the MODULUS scaled too,
    so density per node / clone-clique size stays at the gate level
    while rows grow Nx — the honest growth axis.
    """
    from pyspark.sql import functions as F  # noqa: N812

    from krnel_graph_spark.functions import graph as gr
    from krnel_graph_spark.functions.multimodal import (
        audio_fingerprint,
        image_near_dups,
        synth_png_table,
        synth_wav_table,
        synth_y4m_table,
        video_near_dups,
    )

    def hub_graph(spark, mult):
        # sf0.1 gate graph: 5,000 sources x 2 out-edges into 500 hubs.
        n_src, n_hub = 5_000 * mult, 500 * mult
        ids = spark.range(n_src).select(F.col("id").alias("doc_id"))
        e1 = ids.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 3) % n_hub).alias("dst"),
        )
        e2 = ids.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 1) % n_hub).alias("dst"),
        )
        return e1.union(e2)

    def media_ids(spark, n):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    # Media gates run 120 items at every sf; x40 = 4,800. The synthetic
    # formulas have period lcm<=768 in id, so clone cliques of ~6 appear
    # at this size — pair counts are logged so the curve's output growth
    # is visible next to its runtime growth.
    def ngram_coverage_x40(s):
        # Train side = the FULL x40 corpus; eval suite = 400 copy-0 docs
        # (eval suites don't grow with the corpus — the realistic shape).
        from krnel_graph_spark.functions.curation import ngram_coverage

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        return ngram_coverage(
            docs, docs.filter(F.col("doc_id") < 400), "text", "doc_id", n=8
        )

    def margin_ann_x20(s):
        # margin_pairs on its scale path: a FIXED mining batch (the
        # original label-0 vectors — mining batches don't grow with the
        # index, same convention as the ann_* serving queries) against
        # the x20 perturbed corpus through the LSH shortlist. The brute
        # gate query is excluded above; THIS is the honest growth axis.
        from krnel_graph_spark.functions.similarity import (
            cosine_topk_lsh,
            margin_pairs,
        )

        emb = s.read.parquet(f"{OUT}/embeddings.parquet")
        a = emb.filter(
            (F.col("label") == 0) & (F.col("vec_id") < ID_STRIDE)
        )
        b = emb.filter(F.col("label") != 0)
        cands = cosine_topk_lsh(
            b, a, "embedding", "vec_id",
            k=4, dim=64, n_planes=6, multiprobe=2, n_tables=4, seed=7,
        )
        return margin_pairs(
            a, b, "embedding", "vec_id",
            margin_threshold=0.05, min_cosine=0.5, candidates=cands,
        )

    def sb_fixed_x40(s):
        # The frozen-LM axis: gram tables from the pristine copy-0
        # fifth only (the LM corpus doesn't grow with the data being
        # scored), positions from the FULL x40 corpus. Self-scoring
        # (stupid_backoff in QUERIES) grows both sides; this is the
        # production shape the 12.9x self-scoring row contrasts with.
        from krnel_graph_spark.functions.text import (
            stupid_backoff_score,
            stupid_backoff_train,
        )

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        lm = stupid_backoff_train(
            docs.filter(
                (F.col("doc_id") < ID_STRIDE) & (F.col("doc_id") % 5 == 0)
            ),
            "text",
        )
        return stupid_backoff_score(lm, docs, "text", "doc_id")

    def containment_x40(s):
        # containment on its documented scale path: banded minhash
        # candidates (never all-pairs) feed the pair-bounded exact
        # containment verify. The x40 copies are word-tag perturbed, so
        # cross-copy candidates are rare and the pair graph grows ~40x
        # with the within-copy clone cliques — the linear axis. The gate
        # query's exact inverted-index path is the sf0.1 baseline.
        from krnel_graph_spark.functions import dedup as dd

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        cands = dd.minhash_lsh_pairs(
            docs, "text", "doc_id", jaccard_threshold=0.5
        ).select("doc_a", "doc_b")
        return dd.containment_pairs(
            docs, "text", "doc_id", threshold=0.8, candidates=cands
        )

    def cdc_dedup_x40(s):
        # CDC chunking rides the scaled corpus directly: chunking is a
        # pure scan projection, and the digest-count shuffle carries
        # fixed-width (digest, count) tuples — the only growth axes are
        # scan CPU and the linearly-growing chunk table.
        from krnel_graph_spark.functions import dedup as dd

        return dd.cdc_chunk_dedup(
            s.read.parquet(f"{OUT}/documents.parquet"), "text", "doc_id"
        )

    def dedup_against_index_x40(s):
        # The r10 incremental-ingest A/B at x40: the ref side (even doc
        # copies, ~100k docs) uses a PRE-PERSISTED minhash_index read
        # back from parquet, so the run pays only the new-side
        # signatures + band join + candidate verify. Compare against
        # dedup_against_near_x40 (same split, inline) — the delta is
        # the ref re-signature cost the index amortizes away each day.
        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions import dedup as dd

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        ref = docs.filter(F.col("doc_id") % 2 == 0)
        idx_path = f"{OUT}/__minhash_idx_ref"
        import os as _os

        if not _os.path.isdir(idx_path):
            dd.minhash_index(ref, "text", "doc_id", num_perm=16).write.mode(
                "overwrite"
            ).parquet(idx_path)
        return dd.dedup_against(
            docs.filter(F.col("doc_id") % 2 == 1),
            ref,
            "text",
            "doc_id",
            mode="near",
            num_perm=16,
            bands=4,
            jaccard_threshold=0.5,
            ref_index=s.read.parquet(idx_path),
        )

    def dedup_against_near_x40(s):
        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions import dedup as dd

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        return dd.dedup_against(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
            "text",
            "doc_id",
            mode="near",
            num_perm=16,
            bands=4,
            jaccard_threshold=0.5,
        )

    def ann_index_search_x20(s):
        # r11: persisted-index retrieval A/B (the similarity twin of
        # dedup_against_index_x40). The model + encoded-codes frames are
        # built ONCE and persisted; the timed run is the recurring
        # query-service path — a KB-scale model collect, one scan of the
        # m-bytes-per-vector codes, shortlist re-rank. Compare against
        # ann_ivfpq in QUERIES (inline fit+encode+search, same x20
        # corpus, same params): the delta is the train+encode cost the
        # persisted index amortizes away on every query batch.
        import os as _os

        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions import similarity as sim

        emb = s.read.parquet(f"{OUT}/embeddings.parquet")
        mp, ep = f"{OUT}/__ann_idx_model", f"{OUT}/__ann_idx_encoded"
        if not (_os.path.isdir(mp) and _os.path.isdir(ep)):
            model, encoded = sim.ann_index(
                emb, "embedding", "vec_id", n_cells=16, m=8, n_codes=64,
                refine_iters=0,
            )
            model.write.mode("overwrite").parquet(mp)
            encoded.write.mode("overwrite").parquet(ep)
        return sim.ann_search(
            s.read.parquet(mp), s.read.parquet(ep),
            emb.filter(F.col("vec_id") < 10), "embedding", "vec_id",
            k=10, nprobe=4, refine=emb, refine_factor=4,
        )

    def recall_probe_x20(s):
        # r12: the index-health monitor at x20 — frozen day-0 model
        # (even vec_ids), drifted odd batch appended with the frozen
        # codebooks, recall@10 vs exact L2 over the merged corpus.
        # Cost shape: one codes-frame scan + one float-corpus scan
        # (broadcast 10 probes) — the per-ingest-batch monitoring cost.
        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions import similarity as sim

        emb = s.read.parquet(f"{OUT}/embeddings.parquet")
        day0 = emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        ).filter(F.col("vec_id") % 2 == 0)
        drift = emb.filter(F.col("vec_id") % 2 == 1).select(
            "vec_id",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x * F.lit(1.25) + F.lit(0.05),
            ).alias("embedding"),
        )
        model, enc0 = sim.ann_index(
            day0, "embedding", "vec_id", n_cells=16, m=8, n_codes=64,
            refine_iters=0,
        )
        enc1 = sim.ann_index_append(model, drift, "embedding", "vec_id")
        return sim.recall_probe(
            model, enc0.unionByName(enc1),
            drift.filter(F.col("vec_id") < 20),
            day0.unionByName(drift), "embedding", "vec_id",
            k=10, nprobe=4, band=0.8,
        )

    def ann_retrain_x20(s):
        # r13: the monitor's ACTION at x20 — the day-0 model is the
        # persisted artifact (built once, cached like
        # ann_index_search_x20), so the timed region is what a real
        # re-train event costs: read the stale model's recorded config,
        # re-fit on the merged drifted corpus (bounded sample + one
        # Lloyd pass), re-encode every vector, and re-probe. The
        # re-encode pass IS the unavoidable cost — the old codes are
        # wrong for the new distribution.
        import os as _os

        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions import similarity as sim

        emb = s.read.parquet(f"{OUT}/embeddings.parquet")
        day0 = emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        ).filter(F.col("vec_id") % 2 == 0)
        drift = emb.filter(F.col("vec_id") % 2 == 1).select(
            "vec_id",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x + F.lit(2.0),
            ).alias("embedding"),
        )
        mp = f"{OUT}/__ann_retrain_model"
        if not _os.path.isdir(mp):
            model, _ = sim.ann_index(
                day0, "embedding", "vec_id", n_cells=16, m=8, n_codes=64,
                refine_iters=1,
            )
            model.write.mode("overwrite").parquet(mp)
        corpus = day0.unionByName(drift)
        new_model, new_enc = sim.ann_index_retrain(
            s.read.parquet(mp), corpus, "embedding", "vec_id"
        )
        return sim.recall_probe(
            new_model, new_enc, drift.filter(F.col("vec_id") < 20),
            corpus, "embedding", "vec_id", k=10, nprobe=8, band=0.8,
        )

    def minhash_ingest_x40(s):
        # r13: the minhash PRODUCTION ingest shape codified as a
        # repeatable entry (the r12 BASELINE A/B row measured it by
        # hand at 7.7 s vs the 17.95 s gate shape): day-0 index
        # persisted ONCE via minhash_index_save; the timed recurring
        # ingest is minhash_index_load (validated read) + sign ONLY
        # the day-1 batch + dedup it against the index. Days 1..N-1
        # are never re-signatured — the saving grows with the ref/new
        # ratio. (Extending the index for tomorrow is
        # minhash_index_append over the same day-1 signatures — one
        # more linear pass, benched by the minhash_append gate row.)
        import os as _os

        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions import dedup as dd

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        day0 = docs.filter(F.col("doc_id") % 2 == 0)
        day1 = docs.filter(F.col("doc_id") % 2 == 1)
        idx_path = f"{OUT}/__minhash_ingest_day0"
        if not _os.path.isdir(idx_path):
            dd.minhash_index_save(
                dd.minhash_index(day0, "text", "doc_id", num_perm=16),
                idx_path,
            )
        idx = dd.minhash_index_load(s, idx_path)
        return dd.dedup_against(
            day1, day0, "text", "doc_id",
            mode="near", num_perm=16, bands=4, jaccard_threshold=0.5,
            ref_index=idx,
        )

    def arpa_serve_x40(s):
        # r13: the ARPA serve-only A/B — the gate shape (arpa_score in
        # QUERIES) trains + exports + scores in one run; production
        # persists the exported rows ONCE (parquet here; arpa_load for
        # a KenLM-built file) and every later scoring batch pays a
        # model-sized rows read + the five-join lookup scoring alone.
        # This entry times that recurring path over the FULL x40 corpus.
        import os as _os

        from krnel_graph_spark.functions.arpa import arpa_score
        from pyspark.sql import functions as F  # noqa: N812

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        rows_path = f"{OUT}/__arpa_rows_day0"
        if not _os.path.isdir(rows_path):
            from krnel_graph_spark.functions.arpa import kneser_ney3_arpa_rows
            from krnel_graph_spark.functions.text import kneser_ney3_train

            lm = kneser_ney3_train(
                docs.filter(F.col("doc_id") % 5 == 0), "text"
            )
            kneser_ney3_arpa_rows(lm).write.mode("overwrite").parquet(
                rows_path
            )
        return arpa_score(
            s.read.parquet(rows_path), docs, "text", "doc_id"
        )

    def arpa_serve_o5_x40(s):
        # r14: the order-5 serve path over the FULL x40 corpus —
        # production persists an order-5 rows frame once (here: trained
        # by kneser_ney_ngram_train on the %5 slice; arpa_load for a
        # KenLM-built file) and every scoring batch pays the 9-join
        # lookup with <s>/</s> markers. The growth axis vs
        # arpa_serve_x40 is the extra 4 model-bounded joins — the
        # corpus pass stays the only linear term.
        import os as _os

        from krnel_graph_spark.functions.arpa import arpa_score
        from pyspark.sql import functions as F  # noqa: N812

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        rows_path = f"{OUT}/__arpa_rows_o5_day0"
        if not _os.path.isdir(rows_path):
            from krnel_graph_spark.functions.ngram_lm import (
                kneser_ney_ngram_arpa_rows,
                kneser_ney_ngram_train,
            )

            lm = kneser_ney_ngram_train(
                docs.filter(F.col("doc_id") % 5 == 0), "text", order=5
            )
            kneser_ney_ngram_arpa_rows(lm).write.mode("overwrite").parquet(
                rows_path
            )
            lm["_pinned_counts"].unpersist()
        return arpa_score(
            s.read.parquet(rows_path), docs, "text", "doc_id",
            bos=True, eos=True,
        )

    def arpa_filter_x40(s):
        # mid-r14: the KenLM `filter` tool at x40 — vocabulary-filter
        # the persisted order-5 model (built by arpa_serve_o5_x40's
        # warm path) to a 1/3 sub-corpus. Cost = one corpus scan for
        # the vocabulary + two model-bounded joins; the returned frame
        # is the smaller servable model.
        import os as _os

        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions.arpa import arpa_filter

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        rows_path = f"{OUT}/__arpa_rows_o5_day0"
        if not _os.path.isdir(rows_path):
            from krnel_graph_spark.functions.ngram_lm import (
                kneser_ney_ngram_arpa_rows,
                kneser_ney_ngram_train,
            )

            lm = kneser_ney_ngram_train(
                docs.filter(F.col("doc_id") % 5 == 0), "text", order=5
            )
            kneser_ney_ngram_arpa_rows(lm).write.mode("overwrite").parquet(
                rows_path
            )
            lm["_pinned_counts"].unpersist()
        return arpa_filter(
            s.read.parquet(rows_path),
            docs.filter(F.col("doc_id") % 3 == 0),
            "text",
        )

    def kneser_ney5_x40(s):
        # r14: order-5 KN TRAINING at x40 — the train-once artifact
        # cost. One corpus scan explodes all five gram orders into the
        # single pinned type table; everything after is model-bounded.
        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions.ngram_lm import (
            kneser_ney_ngram_arpa_rows,
            kneser_ney_ngram_train,
        )

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        lm = kneser_ney_ngram_train(
            docs.filter(F.col("doc_id") % 5 == 0), "text", order=5
        )
        return kneser_ney_ngram_arpa_rows(lm)

    def kneser_ney5_pruned_x40(s):
        # mid-r14: per-level pruning at x40 — same train pass as
        # kneser_ney5_x40 plus the kept-set recursion and section
        # semi-joins; the return is the SERVABLE pruned table (the
        # size the Zipf tail argument is about).
        from pyspark.sql import functions as F  # noqa: N812

        from krnel_graph_spark.functions.ngram_lm import (
            kneser_ney_ngram_arpa_rows,
            kneser_ney_ngram_train,
        )

        docs = s.read.parquet(f"{OUT}/documents.parquet")
        lm = kneser_ney_ngram_train(
            docs.filter(F.col("doc_id") % 5 == 0), "text", order=5
        )
        return kneser_ney_ngram_arpa_rows(lm, prune=(0, 0, 1, 1))

    return {
        "dedup_against_near_x40": dedup_against_near_x40,
        "dedup_against_index_x40": dedup_against_index_x40,
        "minhash_ingest_x40": minhash_ingest_x40,
        "arpa_serve_x40": arpa_serve_x40,
        "arpa_serve_o5_x40": arpa_serve_o5_x40,
        "arpa_filter_x40": arpa_filter_x40,
        "kneser_ney5_x40": kneser_ney5_x40,
        "kneser_ney5_pruned_x40": kneser_ney5_pruned_x40,
        "ann_index_search_x20": ann_index_search_x20,
        "recall_probe_x20": recall_probe_x20,
        "ann_retrain_x20": ann_retrain_x20,
        "ngram_coverage_x40": ngram_coverage_x40,
        "margin_pairs_ann_x20": margin_ann_x20,
        "containment_x40": containment_x40,
        "cdc_dedup_x40": cdc_dedup_x40,
        "stupid_backoff_fixed_x40": sb_fixed_x40,
        "label_propagation_x20": lambda s: gr.label_propagation(
            hub_graph(s, 20), n_iter=5
        ),
        "triangle_count_x20": lambda s: gr.triangle_count(hub_graph(s, 20)),
        "clustering_coeff_x20": lambda s: gr.clustering_coefficients(
            hub_graph(s, 20)
        ),
        "k_core_x20": lambda s: gr.k_core(hub_graph(s, 20), k=4),
        "image_dups_x40": lambda s: image_near_dups(
            synth_png_table(media_ids(s, 4_800), pattern="xy"),
            "data",
            "doc_id",
            max_hamming=3,
            band_bits=16,
        ),
        "audio_fp_x40": lambda s: audio_fingerprint(
            synth_wav_table(media_ids(s, 4_800)), "data", "doc_id"
        ),
        "video_dups_x40": lambda s: video_near_dups(
            synth_y4m_table(media_ids(s, 4_800)),
            "data",
            "doc_id",
            jaccard_threshold=0.3,
        ),
    }


def build(spark, rebuild: bool) -> None:
    from pyspark.sql import functions as F

    for name, n_copies in SCALES.items():
        dst = f"{OUT}/{name}.parquet"
        if not rebuild and os.path.exists(f"{dst}/_SUCCESS"):
            continue
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        copies = spark.range(n_copies).withColumnRenamed("id", "__copy")
        s = df.crossJoin(copies)
        if name == "events":
            s = s.withColumn(
                "event_id", F.col("event_id") + F.col("__copy") * ID_STRIDE
            ).withColumn("user_id", F.col("user_id") + F.col("__copy") * ID_STRIDE)
        elif name == "lineitem":
            s = s.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.col("__copy") * ID_STRIDE
            )
        elif name == "documents":
            words = F.split(F.col("text"), " ")
            tag = F.concat(F.lit("cp"), F.col("__copy").cast("string"))
            perturbed = F.array_join(
                F.zip_with(
                    words,
                    F.sequence(F.lit(0), F.size(words) - 1),
                    lambda w, i: F.when(
                        i % 5 == 0, F.concat(tag, F.lit(" "), w)
                    ).otherwise(w),
                ),
                " ",
            )
            s = (
                s.withColumn(
                    "doc_id", F.col("doc_id") + F.col("__copy") * ID_STRIDE
                )
                .withColumn(
                    "text",
                    F.when(F.col("__copy") == 0, F.col("text")).otherwise(perturbed),
                )
                .withColumn("n_chars", F.length("text"))
            )
        elif name == "embeddings":
            # Copies get strided ids and a small copy-dependent, per-
            # dimension perturbation: near-neighbor structure stays local
            # (each copy clusters around its source vector) instead of 20
            # EXACT clones per vector, which would make every top-k list a
            # clone clique — a workload no real embedding corpus produces.
            pert = F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x
                    + F.col("__copy").cast("float")
                    * 0.003
                    * (((i * 31 + F.col("__copy")) % 7) - 3).cast("float")
                ).cast("float"),
            )
            s = s.withColumn(
                "vec_id", F.col("vec_id") + F.col("__copy") * ID_STRIDE
            ).withColumn("embedding", pert)
        (
            s.drop("__copy")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(dst)
        )
        rows = spark.read.parquet(dst).count()
        print(f"  built {name}: {rows} rows", file=sys.stderr)


def main() -> None:
    import __spark_entry__ as entry_mod
    from krnel_graph_spark.runners.spark_runner import get_spark

    rebuild = "--rebuild" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark("bench-scaleup")
    build(spark, rebuild)
    queries = entry_mod.queries()
    run_list = [q for q in QUERIES if q in only] if only else QUERIES

    # Same warm-up protocol as bench.py.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in run_list:
        t0 = time.time()
        queries[name](spark, OUT).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    # Pair-producing extras also log their output row count: a runtime
    # curve without the output-size curve can't distinguish "the operator
    # scales" from "the corpus stopped producing pairs".
    counts: dict[str, int] = {}
    extras = _extra_queries()
    if only:
        extras = {k: v for k, v in extras.items() if k in only}
    for name, fn in extras.items():
        t0 = time.time()
        df = fn(spark)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        if name.startswith(("image_dups", "video_dups", "containment")):
            counts[name] = df.count()
        print(
            f"  {name}: {timings[name]}s"
            + (f" ({counts[name]} pairs)" if name in counts else ""),
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "scaleup_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "pair_counts": counts,
                "scales": SCALES,
                "src": SRC,
            }
        )
    )


if __name__ == "__main__":
    main()
