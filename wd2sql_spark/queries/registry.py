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
# driver's capped (~50-entry) run. Round 6: (a0) the round's NEW query
# (mixed gray/palette codec); (a) queries whose IMPLEMENTATION or ORACLE
# changed this round — the auto-scaled banding trio (corpus-count knob in
# both engines), the multimodal decode family (the decoder grew palette
# dispatch and a 5-tuple return), and the admission evolution (admission
# now heals interrupted compactions before the first-drop check) — their
# hashes must be re-proved by the driver, not just locally. Then (b) the
# stalest re-confirmations: the six r1-only window queries, then the
# r2-only cohort (oldest families first), so attestation age stays
# bounded across rounds.
_PRIORITY = (
    # (a0) NEW in round 6 — first driver row
    "multimodal_mixed_codec_stats",
    # (a) changed this round — re-prove (7)
    "dedup_simhash",
    "multimodal_phash_near_dup",
    "sim_cosine_near_dup",
    "multimodal_decode_stats",
    "multimodal_resize_thumbs",
    "multimodal_frame_sample",
    "dedup_admission_evolution",
    # (b) stalest: last driver row is r1 (6) …
    "window_frames_running",
    "window_lag_lead",
    "window_rank_family",
    "window_rolling_7d_range",
    "window_topk_per_group",
    "window_value_fns",
    # … then r2 (36)
    "agg_approx_count_distinct",
    "agg_approx_percentiles",
    "agg_ordered_array_topn",
    "curation_pipeline_summary",
    "dedup_edit_distance_blocked",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "quality_boilerplate_windows",
    "quality_oov_vocab",
    "quality_repetition_metrics",
    "sample_hash_reproducible",
    "scalar_conditional_fns",
    "scalar_date_fns",
    "scalar_explode_wordcount",
    "scalar_map_lookup",
    "scalar_math_fns",
    "scalar_string_fns",
    "sim_bruteforce_topk",
    "sim_centroid_dispersion",
    "sim_quantized_topk",
    "stream_quality_filter",
    "stream_static_enrich",
    "stream_wd_etl_meta",
    "text_fingerprint",
    "text_keywords_tfidf",
    "text_lang_stats",
    "text_langid_stopwords",
    "text_quality_score",
    "text_token_stats",
    "wd_etl_coordinates",
    "wd_etl_entity",
    "wd_etl_meta",
    "wd_etl_presence",
    "wd_etl_quantity",
    "wd_etl_string",
    "wd_etl_time",
    "wd_id_codec",
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
