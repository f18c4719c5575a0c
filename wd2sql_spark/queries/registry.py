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
# (VERDICT r6 task #2): ``python tools/gen_priority.py`` flags every query
# whose defining module — or any non-infra wd2sql_spark module in that
# module's import closure — changed in git after the query's latest driver
# CORRECTNESS row, sorted stalest-attestation-first;
# ``tests/test_priority.py`` fails if the flagged set isn't front-loaded
# here. Round 7 layout: (a0) r7's two NEW queries, (a) the two r6
# REWRITES the r6 rotation missed (verdict-named), (b) this round's
# implementation-changed six, then (c) the tool's stalest-first order
# until the ~50-slot cap; the flagged queue past the cap carries to r8
# (the tool keeps flagging a query until a driver row postdates the
# module change).
_PRIORITY = (
    # (a0) NEW in r7 — first driver rows (truecolor PNG + luma aHash)
    "multimodal_truecolor_codec_stats",
    "multimodal_luma_phash",
    # (a) rewritten in r6, latest driver rows r4/r5 (verdict-named)
    "join_basket_cooccurrence",
    "dedup_substring_spans",
    # (b) implementation changed in r7 (knob caching, band coupling,
    # plan_cached codec/simhash/jl, HLL split-join, keyed persists)
    "dedup_simhash",
    "sim_cosine_near_dup",
    "multimodal_phash_near_dup",
    "wd_id_codec",
    "agg_approx_count_distinct",
    "scalar_math_fns",
    # (c) tools/gen_priority.py order (stalest driver row first); the
    # flagged queue past the ~50 driver cap carries to r8
    "wd_etl_time",
    "agg_hll_sketch_rollup",
    "agg_percentiles_doc_length",
    "anomaly_zscore_by_type",
    "chunk_docs_overlap",
    "decontam_ngram_overlap",
    "dedup_canonical_pick",
    "dedup_cluster_components",
    "dedup_incremental_delta",
    "gapfill_daily_purchases",
    "graph_triangle_count",
    "ids_contiguous_global",
    "layout_zorder_skipping",
    "mix_domain_weights",
    "pack_sequences_bins",
    "profile_column_stats",
    "profile_ks_drift",
    "quality_segment_dedup_rebuild",
    "retention_daily_cohorts",
    "retrieval_hybrid_rrf",
    "sample_stratified_by_lang",
    "sample_weighted_by_length",
    "scalar_array_fns",
    "scrub_pii_stats",
    "seq_error_then_purchase",
    "sessionize_gap30m",
    "sim_jl_projection_audit",
    "sim_lsh_recall_audit",
    "sim_lsh_topk",
    "stream_dedup_within_watermark",
    "stream_interval_join",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_stateful_streaks",
    "stream_tumbling_counts",
    "text_bpe_encode_stats",
    "text_bpe_vocab_merges",
    "ts_downsample_hourly",
    "agg_customer_order_distribution",
    "agg_pricing_summary",
    "agg_promo_revenue_ratio",
    "curation_pipeline_decontam",
    "funnel_view_click_purchase",
    "graph_pagerank_iter",
    "join_market_share",
    "join_nation_pair_volume",
    "join_profit_by_nation_year",
    "join_skew_salted",
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
