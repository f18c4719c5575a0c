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
# driver's capped (~50-entry) run. Round 4: close the attestation gap —
# the 34 registered queries that have never had a CORRECTNESS row in any
# driver round (r1 ∪ r2 ∪ r3 covered the other 144) all go first, so one
# round leaves every query in the registry driver-attested. They fall in
# three groups: (a) the round-3 LLM-pipeline tail (lossless prefix-filter
# join, char-LM quality, DSIR, waterfill, leakage-safe split, phrase/MMR
# retrieval, contrastive pairs, Hilbert layout, table checksum, pHash,
# incremental streaming neardup, IVF/PQ recall audits, skew-safe
# sessionizer, gapfill interpolation, the decontam pipeline composite),
# (b) the TPC-H-gap join/agg/subquery shapes (tpch_gaps.py) that the r3
# cap cut at the tail. After those, (c) queries whose implementation
# changed THIS round and need their hash re-proved (pagerank's exchange
# cut, MMR's tiny-pool fix), and (d) new round-4 operators needing first
# rows. The cap lands around 50, so all four groups fit.
_PRIORITY = (
    # (a) never-driver-attested: round-3 LLM-pipeline tail (18)
    "dedup_jaccard_prefix_filter",
    "quality_charlm_score",
    "mix_temperature_sampling",
    "sample_dsir_importance",
    "mix_token_budget_waterfill",
    "split_leakage_safe",
    "retrieval_phrase_match",
    "retrieval_mmr_diversified",
    "profile_table_checksum",
    "layout_hilbert_locality",
    "pairs_contrastive_build",
    "stream_incremental_neardup",
    "sessionize_gap30m_skewsafe",
    "multimodal_phash_near_dup",
    "sim_ivf_recall_audit",
    "sim_pq_recall_audit",
    "ts_gapfill_interpolate",
    "curation_pipeline_decontam",
    # (b) never-driver-attested: TPC-H-gap shapes (16)
    "join_market_share",
    "join_profit_by_nation_year",
    "join_nation_pair_volume",
    "agg_customer_order_distribution",
    "agg_promo_revenue_ratio",
    "subq_sales_opportunity_antijoin",
    "subq_sole_fault_suppliers",
    "subq_min_cost_supplier",
    "subq_important_supply_value",
    "agg_ship_priority_modes",
    "subq_top_supplier_revenue",
    "agg_supplier_variety",
    "subq_small_quantity_revenue",
    "subq_excess_share_suppliers",
    "subq_order_priority_check",
    "agg_forecast_revenue",
    # (c) implementation changed in round 4 — hash must be re-proved:
    # pagerank's per-iteration exchange cut (graph_analytics.py)
    "graph_pagerank_iter",
    # (d) new round-4 operators — first driver rows
    "sim_pq_serving_topk",
    "sim_int8_serving_topk",
    "sim_ivfpq_topk",
    # remaining cap slots: rotation of long-green families re-confirming
    # under the round-4 codebase (first driver row since r1 for most)
    "wd_query_conjunctive",
    "agg_pricing_summary",
    "window_revenue_share",
    "setop_integrity_audit",
    "scalar_json_fns",
    "join_asof_prior_view",
    "pivot_status_by_nation",
    "subq_exists_late_ship",
    "join_skew_salted",
    "flagship_semi_join_enrich",
    "funnel_view_click_purchase",
    "join_range_clicks_after_error",
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
