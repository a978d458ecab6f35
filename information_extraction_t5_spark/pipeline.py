"""End-to-end KG construction: extract -> link -> canonicalize -> materialize.

One declarative lineage (the reference's predict.py stages 2-8 as a single
DataFrame program, SURVEY.md §3.3):

    transcripts
      -> assemble_documents            (1 shuffle: groupBy conv_id)
      -> sliding_windows_exact         (narrow, Arrow UDF kernel)
      -> expand_questions              (broadcast join, narrow)
      -> run_extraction                (mapInPandas, batched model)
      -> top1_window                   (1 shuffle: window over conv,qa)
      -> explode_compound              (narrow)
      -> to_triples                    (narrow)
      -> link_aliases                  (broadcast join)
      -> canonical_entities            (O(log n) small shuffles)
      -> materialize nodes/edges       (partitioned write + lineage)

Checkpointed per stage via Catalog.stage — a killed run resumes from the
last committed snapshot (reference cache-guard semantics,
qa_model.py:144-145).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from information_extraction_t5_spark.catalog import Catalog
from information_extraction_t5_spark.core.windows import WindowSpec
from information_extraction_t5_spark.functions.text import normalize_answer
from information_extraction_t5_spark.operators.canonicalize import (
    canonical_entities,
)
from information_extraction_t5_spark.operators.extraction import (
    run_extraction,
    run_extraction_from_documents,
)
from information_extraction_t5_spark.operators.linking import (
    alias_df,
    link_aliases,
)
from information_extraction_t5_spark.operators.postprocess import (
    best_to_triples,
    ground_spans,
    top1_window,
)
from information_extraction_t5_spark.operators.windows import (
    assemble_documents,
    sliding_windows_exact,
)


@dataclass
class PipelineConfig:
    window: WindowSpec = field(default_factory=lambda: WindowSpec(
        max_size=700, window_overlap=0.2, max_windows=6,
        question="Qual o endereço?", use_sentence_id=True,
    ))
    extractor: str = "regex"
    model_name: Optional[str] = None
    model_cost_ms: float = 0.0   # emulated per-window model latency (bench)
    model_tasks_per_core: Optional[int] = None
    # model-stage repartition width per core (extraction._model_stage_tasks);
    # None = env override SPARK_GRAFT_MODEL_TASKS_PER_CORE, else default 4.
    # Preferred over the env var: config travels with the job, the env var
    # leaks process-global state (ADVICE r4).
    choose_question: str = "first"   # 'first' | 'random' | 'all' paraphrase
    question_seed: int = 13          # seed for the 'random' md5 draw
    link_predicates: List[str] = field(
        default_factory=lambda: ["form.endereco.estado"]
    )
    ground: bool = False          # fuzzy span grounding (extra Arrow stage)
    fuzzy_link: bool = True       # LSH-blocked fuzzy name linking
    fuzzy_link_max_dist: int = 2  # levenshtein budget for blocked pairs
    fuzzy_hash: str = "md5"       # 'md5' = oracle-replayable signatures
    # (DuckDB computes the identical minhash); 'xxhash64' is ~5x cheaper
    # per hash for ultra-scale runs — the stage only hashes |distinct
    # names|, so md5 is the default and the whole pipeline stays
    # cross-engine checkable
    # (identity matching is stricter than span matching; the reference's
    # span schedule allows 5 edits for long strings, highlights.py:96-106)
    subj_buckets: int = 64        # subj-hash write partitioning
    cc_driver_threshold: int = 1_000_000
    # max (undirected, raw) mention-graph edge rows the canonicalize stage
    # may collect for the driver-side union-find fast path (~200 MB at the
    # default against the session factory's 20g driver; see
    # canonicalize.connected_components_star).  0 forces the distributed
    # star contraction; size down with driver memory.


def build_windows(transcripts: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """transcripts -> (conv_id, window_id, window_text, window_offset)."""
    docs = assemble_documents(transcripts)
    return sliding_windows_exact(docs, cfg.window)


def extract_candidates(spark: SparkSession, transcripts: DataFrame,
                       cfg: PipelineConfig) -> DataFrame:
    """transcripts -> scored per-window predictions (pre-top-1).

    Fused assembly->windows->extraction: window text never materializes as
    a Spark column (one Arrow crossing per document).

    ONE exchange end to end (r7): the model-stage task count is pinned as
    a REPARTITION_BY_NUM hash exchange on the *transcripts* — the groupBy
    inside assemble_documents is then already clustered by conv_id (no
    second exchange), AQE honors the user-specified partition count (no
    byte-coalescing collapse of the model stage), and extraction runs
    narrow on the assembled documents.  Previously assembly shuffled the
    turns AND a round-robin repartition re-shuffled every document text."""
    from information_extraction_t5_spark.operators.extraction import (
        _model_stage_tasks,
    )

    target = _model_stage_tasks(transcripts, cfg.model_tasks_per_core)
    docs = assemble_documents(transcripts.repartition(target, "conv_id"))
    return run_extraction_from_documents(
        docs, cfg.window,
        extractor=cfg.extractor, model_name=cfg.model_name,
        model_cost_ms=cfg.model_cost_ms,
        choose_question=cfg.choose_question,
        question_seed=cfg.question_seed,
        tasks_per_core=cfg.model_tasks_per_core,
        pre_partitioned=True,
        # scored feeds top1_window(use_fewer_na=True) in
        # candidates_to_triples: reduce to the per-(conv, qa) winner
        # inside the model task (argmin is associative) so the Arrow
        # crossing and the top-1 shuffle carry |docs x questions| rows
        # instead of |windows x questions| (r7)
        prereduce_top1=True,
    )


def extract_triples(spark: SparkSession, transcripts: DataFrame,
                    cfg: PipelineConfig) -> DataFrame:
    """transcripts -> candidate triples in one exchange + one Python stage
    (pre alias-linking); see run_extraction_to_triples (r7)."""
    from information_extraction_t5_spark.operators.extraction import (
        _model_stage_tasks,
        run_extraction_to_triples,
    )

    target = _model_stage_tasks(transcripts, cfg.model_tasks_per_core)
    docs = assemble_documents(transcripts.repartition(target, "conv_id"))
    return run_extraction_to_triples(
        docs, cfg.window,
        extractor=cfg.extractor, model_name=cfg.model_name,
        model_cost_ms=cfg.model_cost_ms,
        choose_question=cfg.choose_question,
        question_seed=cfg.question_seed,
        tasks_per_core=cfg.model_tasks_per_core,
        pre_partitioned=True,
    )


def candidates_to_triples(scored: DataFrame, cfg: PipelineConfig,
                          spark: SparkSession,
                          windows: Optional[DataFrame] = None) -> DataFrame:
    """scored predictions -> linked candidate triples.

    ``scored`` carries ids + predictions only — window payloads never ride
    the top-1 shuffle; span grounding rejoins them from ``windows`` by
    (conv_id, window_id)."""
    slim = scored.select("conv_id", "qa_id", "window_id", "prediction", "prob")
    best = top1_window(slim, use_fewer_na=True)
    # fused explode+triple kernel: one Arrow crossing (the standalone
    # explode_compound/to_triples operators serve the metric/eval paths)
    triples = best_to_triples(best)
    if cfg.ground:
        if windows is None:
            raise ValueError("span grounding needs the windows DataFrame")
        wtexts = windows.select("conv_id", "window_id", "window_text")
        triples = ground_spans(
            triples.join(wtexts, ["conv_id", "window_id"], "left")
        )
    return link_aliases(
        triples, alias_df(spark),
        value_col="obj", out_col="obj",
        predicates=cfg.link_predicates, pred_col="pred",
    )


def fuzzy_name_edges(triples: DataFrame, max_dist: int = 3,
                     hash_fn: str = "md5") -> DataFrame:
    """Extra mention-mention edges from NEAR-duplicate person names.

    The scale-safe fuzzy path of the north star: minhash-LSH blocking over
    normalized names generates candidate pairs (equi-join on band buckets,
    never all-pairs), then an exact Levenshtein re-rank keeps pairs within
    the reference's distance budget (highlights.py:96-106 schedule's
    ceiling).  Output: (src, dst) conversation pairs.
    """
    from information_extraction_t5_spark.operators.linking import (
        lsh_candidate_pairs,
    )

    # one representative conv per DISTINCT normalized name: exact-equal
    # names already merge through the exact mention key, so the fuzzy
    # stage only needs edges between distinct surface forms — this
    # collapses the LSH input from |convs| to |distinct names|
    name_rep = (
        triples.filter(F.col("pred") == "form.nome_completo")
        .select(
            F.col("conv_id").alias("id"),
            normalize_answer(F.col("obj")).alias("name"),
        )
        .groupBy("name")
        .agg(F.min("id").alias("id"))
        # Measured (r3): do NOT force a repartition here to spread the
        # minhash compute — at |distinct names| ~ 10^4 the AQE-coalesced
        # 1-2 partition layout beats any explicit spread, because every
        # downstream mini-stage of the LSH chain then pays per-task
        # scheduling on partitions it doesn't need (8.9s vs 14.2s tail
        # wall at local[32]).  At cluster scale |distinct names| grows
        # past AQE's advisory bytes and the coalesce widens on its own.
        # r7: carry_value removed the two rerank joins, leaving the bucket
        # build as the ONLY consumer — the r6 lazy checkpoint became pure
        # overhead and is gone.
    )
    # 4 bands x 4 hashes: bucket-match threshold ~Jaccard 0.7 — tight
    # enough that word-sharing names don't flood the candidate set, loose
    # enough to catch <=2-edit typos on 20+-char names.
    # carry_value (r7): name groups partition the convs, so each rep id
    # maps 1:1 to its name — riding the names through the bucket self-join
    # lets the Levenshtein verify run inline, dropping the two
    # levenshtein_rerank value joins from the chain (edges identical,
    # pinned by test_fuzzy_linking.test_carried_value_edges_match_rerank).
    # distinct_pairs=False: the consumer is connected components, which
    # is duplicate-insensitive — the cross-band dedup shuffle bought
    # nothing (the Levenshtein re-check on a few thousand candidate rows
    # is cheaper than the shuffle it saved)
    cand = lsh_candidate_pairs(name_rep, "id", "name",
                               n_hashes=16, bands=4, k=3, max_bucket=64,
                               fast=(hash_fn != "md5"), carry_value=True,
                               distinct_pairs=False)
    kept = (
        cand.filter(
            F.abs(F.length("val_a") - F.length("val_b")) <= max_dist
        )
        .filter(F.levenshtein("val_a", "val_b") <= max_dist)
    )
    return kept.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))


def canonicalize_subjects(triples: DataFrame,
                          cfg: Optional[PipelineConfig] = None) -> DataFrame:
    """Attach canonical subject entity ids.

    Mentions = conversations; blocking keys = exact CPF + normalized full
    name; optionally LSH-blocked near-duplicate names add fuzzy edges.
    Convs in one component collapse to one entity;
    subj = 'ent:' + min conv_id.
    """
    cfg = cfg or PipelineConfig()
    keys = (
        triples.filter(F.col("pred").isin("form.cpf", "form.nome_completo"))
        .select(
            "conv_id",
            F.concat(
                F.col("pred"), F.lit("="), normalize_answer(F.col("obj"))
            ).alias("mention_key"),
        )
    )
    extra = (
        fuzzy_name_edges(triples, cfg.fuzzy_link_max_dist, cfg.fuzzy_hash)
        if cfg.fuzzy_link else None
    )
    # identity_rows=False (r7): the mapping carries only non-identity
    # labels (the coalesce below reconstructs identity), bounded by the
    # edge-endpoint count — on the CC driver path it is a filter over a
    # local relation with accurate stats, so this left join
    # auto-broadcasts instead of shuffling every triple (SMJ measured
    # 0.85s vs 0.42s broadcast at 120k convs)
    mapping = canonical_entities(keys, "conv_id", "mention_key",
                                 extra_edges=extra,
                                 driver_threshold=cfg.cc_driver_threshold,
                                 identity_rows=False)
    return (
        triples.join(
            mapping.withColumnRenamed("mention", "conv_id"), "conv_id", "left"
        )
        .withColumn(
            "subj",
            F.concat(
                F.lit("ent:"),
                F.coalesce(F.col("canonical_id"), F.col("conv_id")),
            ),
        )
        .drop("canonical_id")
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: Optional[PipelineConfig] = None,
    catalog: Optional[Catalog] = None,
) -> DataFrame:
    """Full pipeline; with a Catalog, every stage is a resumable snapshot."""
    cfg = cfg or PipelineConfig()

    if catalog is None:
        # no snapshot store: still cut lineage between stages so the
        # extraction UDF runs exactly once (downstream actions + the
        # connected-components loop would otherwise recompute it)
        windows = None
        if cfg.ground:
            # grounding reuses windows twice -> truncate both lineages
            windows = build_windows(transcripts, cfg).localCheckpoint()
            scored = run_extraction(
                windows, extractor=cfg.extractor, model_name=cfg.model_name,
                model_cost_ms=cfg.model_cost_ms,
                choose_question=cfg.choose_question,
                question_seed=cfg.question_seed,
                tasks_per_core=cfg.model_tasks_per_core,
            ).localCheckpoint()
            triples = candidates_to_triples(
                scored, cfg, spark, windows=windows
            ).localCheckpoint()
            return canonicalize_subjects(triples, cfg)
        # fully fused inference stage (r7): ONE pinned exchange feeds
        # assembly + windows + extraction + in-batch top-1 + star triples
        # in a single Python crossing (assemble emits one row per conv, so
        # the in-batch winner IS the global winner); alias linking is a
        # broadcast join on the triples.  The staged operators remain the
        # grounding/eval/catalog path.
        triples = link_aliases(
            extract_triples(spark, transcripts, cfg), alias_df(spark),
            value_col="obj", out_col="obj",
            predicates=cfg.link_predicates, pred_col="pred",
        ).localCheckpoint()
        return canonicalize_subjects(triples, cfg)

    windows = None
    if cfg.ground:
        windows = catalog.stage(
            "stage_windows", lambda: build_windows(transcripts, cfg)
        )
        scored = catalog.stage(
            "stage_extract",
            lambda: run_extraction(windows, extractor=cfg.extractor,
                                   model_name=cfg.model_name,
                                   model_cost_ms=cfg.model_cost_ms,
                                   choose_question=cfg.choose_question,
                                   question_seed=cfg.question_seed,
                                   tasks_per_core=cfg.model_tasks_per_core),
        )
    else:
        scored = catalog.stage(
            "stage_extract",
            lambda: extract_candidates(spark, transcripts, cfg),
        )
    triples = catalog.stage(
        "stage_triples",
        lambda: candidates_to_triples(scored, cfg, spark, windows=windows),
    )
    final = catalog.stage(
        "stage_canonical",
        lambda: canonicalize_subjects(triples, cfg),
    )
    materialize_graph(final, catalog, cfg)
    return final


def materialize_graph(triples: DataFrame, catalog: Catalog,
                      cfg: PipelineConfig) -> None:
    """Node/edge tables partitioned by predicate and subj-hash bucket
    (Iceberg layout per north rule; parquet directories in the sandbox)."""
    edges = triples.withColumn(
        "subj_bucket",
        F.pmod(F.xxhash64("subj"), F.lit(cfg.subj_buckets)).cast("int"),
    )
    # two-level layout: pred prunes whole predicates, subj_bucket prunes
    # within a predicate for entity-centric reads (and bounds any single
    # output directory to ~1/buckets of a hot predicate's rows)
    catalog.write(edges, "graph_edges",
                  partition_by=["pred", "subj_bucket"])
    nodes = (
        triples.select(F.col("subj").alias("node_id"))
        .union(triples.select(F.concat(F.lit("val:"), F.col("obj"))))
        .distinct()
    )
    catalog.write(nodes, "graph_nodes")
