"""Query registry: name → (PySpark callable, DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) wants two dicts; the decorator
here keeps each query and its oracle next to each other in source so the
column aliases can't drift apart (the driver's comparison sorts columns by
name before hashing, so Spark and oracle column names MUST match).

Determinism rules every registered query follows:

- Any floating-point aggregate is wrapped in ``round(x, N)`` on BOTH sides,
  because double addition is order-sensitive and Spark/DuckDB will sum
  partitions in different orders.
- Any ``LIMIT``/top-k has a total order (tiebreak on a key column) so the
  selected rows are the same set in both engines.
- No reliance on engine-specific hash functions in oracled queries (md5 is
  the one hash both engines share bit-for-bit).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}

# Battery modules, imported lazily so a bug in one module doesn't take down
# the whole registry at import time of the package.
#
# ORDER MATTERS: the driver's correctness run is capped (round 1 stopped at
# registry entry 50), so families that have no driver-green row yet are
# front-loaded — wikidata ETL goldens, scalar functions, the LLM-pipeline
# battery, streaming, sessionization, graph, curation, and setops (whose
# last member was orphaned at position 51 in round 1). The families that
# were fully driver-verified in round 1 (relational, joins, subqueries,
# pivots, aggregates, windows) come last; they stay green on the local twin
# harness (tests/test_oracle_diff.py) regardless.
_MODULES = (
    "wd2sql_spark.queries.wikidata",
    "wd2sql_spark.queries.scalar_fns",
    "wd2sql_spark.queries.llm_dedup",
    "wd2sql_spark.queries.llm_similarity",
    "wd2sql_spark.queries.llm_text",
    "wd2sql_spark.queries.llm_multimodal",
    "wd2sql_spark.queries.llm_sampling",
    "wd2sql_spark.queries.llm_quality",
    "wd2sql_spark.queries.llm_tokenize",
    "wd2sql_spark.queries.layout_q",
    "wd2sql_spark.queries.sketches",
    "wd2sql_spark.queries.llm_inference",
    "wd2sql_spark.queries.llm_decontam",
    "wd2sql_spark.queries.llm_retrieval",
    "wd2sql_spark.queries.llm_cluster",
    "wd2sql_spark.queries.llm_packing",
    "wd2sql_spark.queries.llm_selection",
    "wd2sql_spark.queries.streaming_q",
    "wd2sql_spark.queries.sessionization",
    "wd2sql_spark.queries.cdc",
    "wd2sql_spark.queries.graph",
    "wd2sql_spark.queries.graph_analytics",
    "wd2sql_spark.queries.curation",
    "wd2sql_spark.queries.profiling",
    "wd2sql_spark.queries.setops",
    "wd2sql_spark.queries.relational",
    "wd2sql_spark.queries.joins",
    "wd2sql_spark.queries.tpch_gaps",
    "wd2sql_spark.queries.temporal_joins",
    "wd2sql_spark.queries.subqueries",
    "wd2sql_spark.queries.pivots",
    "wd2sql_spark.queries.aggregates",
    "wd2sql_spark.queries.windows",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records a weaker rows-only check
    category: str
    doc: str = ""


def query(
    name: str,
    oracle: str | None = None,
    category: str = "misc",
    plan_cached: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query. ``plan_cached=True`` memoizes the CONSTRUCTED
    (still lazy) DataFrame per (session, sf_dir) — prepared-statement
    semantics: every invocation still executes the full plan against the
    data, but the driver-side plan build (py4j Column construction +
    Catalyst analysis, measured at 0.5-1.2 s for literal-heavy or deeply
    composed plans) is paid once per session. This matches the bench's
    declared warm methodology ("plans cached, codegen compiled").

    Do NOT set it on queries whose WORK happens at construction time
    (BPE training's eager merge-loop checkpoints, MMR's greedy collects):
    memoizing those would misreport their cost as near-zero.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        use = fn
        if plan_cached:
            from wd2sql_spark.session_cache import SessionCache

            cache = SessionCache()

            def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
                return cache.get_or_build(
                    spark, ("plan", name, sf_dir), lambda: fn(spark, sf_dir)
                )

            wrapped.__name__ = fn.__name__
            wrapped.__doc__ = fn.__doc__
            use = wrapped
        REGISTRY[name] = Query(name=name, fn=use, oracle=oracle, category=category, doc=fn.__doc__ or "")
        return use

    return deco


# Within the module order above, hand-pick the front of the line for the
# driver's capped (~50-entry) run. Since r7 this list is MECHANIZED
# (VERDICT r6 task #2); since r8 the flag is the PLAN FINGERPRINT
# (VERDICT r7 task #2): ``python tools/gen_priority.py`` flags a query
# only when its ``tools/plan_fp.py`` fingerprint (optimized plan + schema
# + oracle + Python-eval-module ASTs) differs from the snapshot recorded
# at its latest driver attestation (``tools/plan_fps.json``).
# ``tests/test_priority.py`` fails if the flagged set isn't front-loaded
# here. The r9 OPTIMIZATION rewrites (semdedup persist, Q21 codegen
# aggregate, the multimodal sort removals, the HLL one-scan form) all
# sit in the flagged front so the next driver run re-attests them
# first. Round 9 layout: (a0) the new MJPEG-in-AVI demux query, then
# (a) the r9 rewrites (subq_min_cost_supplier window-argmin + part
# pushdown; join_multiway/setop_except), the 9 multimodal queries
# flagged by the BitReader accumulator-trim fix (ADVICE r8 #2), and the
# 10 plan-blind stream_* queries whose whole-closure AST hash moved
# with the catalog.py table cache — coarse but correct: a plan-blind
# fingerprint cannot localize the change, so the round that touches
# catalog re-attests the streams; then (b) stalest-attested padding to
# the ~50-slot cap. plan_fps.json covers the 188 pre-r9 queries; the
# new demux query snapshots at its first attestation. See
# tools/gen_priority.py --explain for the live flag set.
_PRIORITY = (
    # flagged (tools/gen_priority.py order) — the r10 optimization
    # rewrites: the Arrow repetition fold + the llm_quality/llm_selection
    # module-AST movers, the spread_rows input repartition on the whole
    # multimodal family, the guarded contrastive broadcast, and the
    # streaming-side driver-cost amortizations (schema memo + cached
    # static scans; stream fingerprints are plan-blind whole-closure AST
    # hashes, so the module edit re-attests the family — coarse but
    # correct, as in r9)
    "quality_boilerplate_windows",  # plan fingerprint moved since r6 attestation
    "quality_oov_vocab",  # plan fingerprint moved since r6 attestation
    "quality_repetition_metrics",  # plan fingerprint moved since r6 attestation
    "mix_token_budget_waterfill",  # plan fingerprint moved since r8 attestation
    "quality_charlm_score",  # plan fingerprint moved since r8 attestation
    "sample_dsir_importance",  # plan fingerprint moved since r8 attestation
    "split_leakage_safe",  # plan fingerprint moved since r8 attestation
    "multimodal_decode_stats",  # plan fingerprint moved since r9 attestation
    "multimodal_frame_sample",  # plan fingerprint moved since r9 attestation
    "multimodal_jpeg_codec_stats",  # plan fingerprint moved since r9 attestation
    "multimodal_luma_phash",  # plan fingerprint moved since r9 attestation
    "multimodal_mixed_codec_stats",  # plan fingerprint moved since r9 attestation
    "multimodal_mixed_container_stats",  # plan fingerprint moved since r9 attestation
    "multimodal_phash_near_dup",  # plan fingerprint moved since r9 attestation
    "multimodal_resize_thumbs",  # plan fingerprint moved since r9 attestation
    "multimodal_truecolor_codec_stats",  # plan fingerprint moved since r9 attestation
    "multimodal_video_demux_stats",  # plan fingerprint moved since r9 attestation
    "pairs_contrastive_build",  # plan fingerprint moved since r9 attestation
    "quality_segment_dedup_rebuild",  # plan fingerprint moved since r9 attestation
    "stream_dedup_within_watermark",  # plan fingerprint moved since r9 attestation
    "stream_incremental_neardup",  # plan fingerprint moved since r9 attestation
    "stream_interval_join",  # plan fingerprint moved since r9 attestation
    "stream_quality_filter",  # plan fingerprint moved since r9 attestation
    "stream_session_windows",  # plan fingerprint moved since r9 attestation
    "stream_sliding_counts",  # plan fingerprint moved since r9 attestation
    "stream_stateful_streaks",  # plan fingerprint moved since r9 attestation
    "stream_static_enrich",  # plan fingerprint moved since r9 attestation
    "stream_tumbling_counts",  # plan fingerprint moved since r9 attestation
    "stream_wd_etl_meta",  # plan fingerprint moved since r9 attestation
    # hand-pinned (VERDICT r9 task #4): the three driver-regression
    # suspects must come back improved/flat with fresh rows this round
    "dedup_minhash_lsh",
    "sessionize_gap30m_skewsafe",
    "curation_pipeline_decontam",
    # stalest-attested padding to the driver cap
    "window_revenue_share",  # r4
    "agg_count_distinct",  # r5
    "agg_cube",  # r5
    "agg_grouping_sets",  # r5
    "agg_having",  # r5
    "agg_histogram_totalprice",  # r5
    "agg_min_max_by",  # r5
    "agg_rollup",  # r5
    "agg_stats_moments",  # r5
    "cluster_kmeans_embeddings",  # r5
    "dedup_jaccard_prefix_filter",  # r5
    "filter_predicates",  # r5
    "join_anti_customers_without_orders",  # r5
    "join_bloom_prefilter_semi",  # r5
    "join_cross_small",  # r5
    "join_disjunctive_predicate",  # r5
    "join_full_outer",  # r5
    "join_inner_broadcast",  # r5
)

def load_all_modules() -> dict[str, Query]:
    for mod in _MODULES:
        importlib.import_module(mod)
    ordered = {name: REGISTRY[name] for name in _PRIORITY if name in REGISTRY}
    # Sort the non-priority tail by name: REGISTRY's insertion order depends
    # on which module was imported first in this process (pytest files import
    # query modules directly), and the driver/docs need a stable ordering.
    for name in sorted(REGISTRY):
        if name not in ordered:
            ordered[name] = REGISTRY[name]
    return ordered
