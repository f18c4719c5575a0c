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
# here. Round 8 layout: (a) the 13 fingerprint-flagged — the r7 81-query
# timestamp backlog was settled by computing fingerprints in worktrees of
# each round's attested tree: 70 of 81 are bit-identical to their
# attestation (old rows stand), 11 genuinely moved (the r7 multimodal
# codec arm, stream closures, two r7 module edits), plus this round's
# two rewrites; then (b) stalest-attested padding (r3/r4 rows) to fill
# the ~50-slot cap.
_PRIORITY = (
    # (a0) NEW in r8 — first driver rows (baseline-sequential JPEG codec
    # + the PNG/JPEG container-dispatch composition)
    "multimodal_jpeg_codec_stats",
    "multimodal_mixed_container_stats",
    # (a) fingerprint-flagged: plan/UDF-AST moved since latest attestation
    "subq_sole_fault_suppliers",  # r8 rewrite: collect_set, Expand-free
    "split_leakage_safe",  # r8 rewrite: per-group agg, Expand-free
    "profile_column_stats",  # r8 rewrite: unpivot + single-distinct
    "curation_pipeline_decontam",
    "stream_incremental_neardup",
    "wd_query_conjunctive",
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "multimodal_mixed_codec_stats",
    "multimodal_resize_thumbs",
    # flagged by the r8 JPEG addition itself: operators/multimodal.py is
    # a Python-eval module in their closure, so its AST hash moving
    # (new codec factory) correctly demands fresh rows
    "multimodal_luma_phash",
    "multimodal_phash_near_dup",
    "multimodal_truecolor_codec_stats",
    "stream_quality_filter",
    "stream_static_enrich",
    "stream_wd_etl_meta",
    # (b) stalest driver row first (r3, then r4) — refresh old rows while
    # the flagged queue fits the cap
    "cdc_scd2_merge",
    "inference_batch_scores",
    "sketch_countmin_heavy_hitters",
    "sketch_kll_quantile_rank",
    "sketch_theta_retention_sets",
    "text_bm25_topk",
    "agg_forecast_revenue",
    "agg_promo_revenue_ratio",
    "agg_ship_priority_modes",
    "agg_supplier_variety",
    "flagship_semi_join_enrich",
    "funnel_view_click_purchase",
    "graph_pagerank_iter",
    "join_asof_prior_view",
    "join_market_share",
    "join_nation_pair_volume",
    "join_profit_by_nation_year",
    "join_range_clicks_after_error",
    "join_skew_salted",
    "layout_hilbert_locality",
    "mix_temperature_sampling",
    "mix_token_budget_waterfill",
    "pairs_contrastive_build",
    "pivot_status_by_nation",
    "profile_table_checksum",
    "quality_charlm_score",
    "retrieval_mmr_diversified",
    "retrieval_phrase_match",
    "sample_dsir_importance",
    "scalar_json_fns",
    "sessionize_gap30m_skewsafe",
    "setop_integrity_audit",
    "sim_int8_serving_topk",
    "subq_excess_share_suppliers",
    "subq_exists_late_ship",
    "subq_important_supply_value",
    "subq_min_cost_supplier",
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
