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
# driver's capped (~50-entry) run. Round 5 (every query has a green row
# in r1–r4; the union is complete): (a) queries whose IMPLEMENTATION or
# ORACLE changed this round — the trained-codebook ANN family (IVF/PQ
# Lloyd training, r4 task #2), the real-PNG multimodal battery (r4 task
# #3), the distributed-rank ntile rewrite (r4 task #1), the kmeans /
# semdedup pair (refactored onto the shared operators/kmeans.py kernel),
# and the bloom semi-join (threshold constant hoist) — their hashes must
# be re-proved by the driver, not just locally. Then (b) the stalest
# re-confirmations: queries whose only driver row is from round 1, oldest
# families first, so attestation age stays bounded across rounds.
_PRIORITY = (
    # (a0) NEW in round 5 — first driver rows
    "dedup_substring_spans",
    "dedup_admission_evolution",
    # (a) changed this round — re-prove (15)
    "window_ntile_distribution",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_pq_serving_topk",
    "sim_ivfpq_topk",
    "sim_ivf_recall_audit",
    "sim_pq_recall_audit",
    "cluster_kmeans_embeddings",
    "semdedup_cluster_prune",
    "multimodal_decode_stats",
    "multimodal_resize_thumbs",
    "multimodal_frame_sample",
    "multimodal_phash_near_dup",
    "join_bloom_prefilter_semi",
    "dedup_jaccard_prefix_filter",
    # (b) stalest: only driver row is r1 (35)
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_histogram_totalprice",
    "agg_min_max_by",
    "agg_rollup",
    "agg_stats_moments",
    "filter_predicates",
    "join_anti_customers_without_orders",
    "join_basket_cooccurrence",
    "join_cross_small",
    "join_disjunctive_predicate",
    "join_full_outer",
    "join_inner_broadcast",
    "join_left_outer",
    "join_multiway_local_supplier_volume",
    "join_returned_item_ranking",
    "join_semi_suppliers_with_bulk_lines",
    "join_shipping_priority_topk",
    "point_lookup_by_label",
    "projection_compute",
    "setop_distinct",
    "setop_except",
    "setop_intersect",
    "setop_union_all",
    "setop_union_distinct",
    "sort_limit_topk",
    "subq_in_agg_large_orders",
    "subq_max_revenue_supplier",
    "subq_scalar_avg_part",
    "subq_scalar_global_avg",
    "unpivot_part_measures",
    "window_frames_running",
    "window_lag_lead",
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
