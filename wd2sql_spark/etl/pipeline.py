"""The wd2sql ETL restated as one declarative Spark dataflow.

Reference pipeline (/root/reference/src/main.rs:174-238): stream dump lines
→ skip ``[``/``]``/blank → strip trailing comma → SIMD-JSON parse → typed
``Entity`` → meta row + per-claim type dispatch into 7 typed tables, with
per-record error tolerance. Single thread, constant memory.

Here the same dataflow is a lazy DataFrame DAG: ``read.text`` →
``filter``/``regexp_replace`` → ``from_json`` (declared schema, PERMISSIVE,
corrupt-record quarantine) → id-encode + meta projection + double-``explode``
of claims → rank filter → 20→7 type dispatch — a pure narrow pipeline with
ZERO shuffles, embarrassingly parallel over input splits. Where the
reference saturates one core at bzip2 speed (README.md:13-19), this plan
scales linearly with executors; whole-stage codegen fuses the chain exactly
like the reference's hand-fused loop.

Two write strategies (``wd2spark``):

- ``staged=True`` (default, the 100-TB path): ONE pass over the dump
  writes a claims store partitioned by ``value_type``; the 7 typed tables
  are then partition-pruned projections of that store — each rewrite reads
  only its own partition. Total I/O: 1× dump read + ~2× claims write.
- ``staged=False``: each table's write re-derives from the dump (8 narrow
  scans, no intermediate storage — fine when the dump is small or already
  in RAM/page cache).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.etl import schema as S
from wd2sql_spark.functions.ids import encode_entity_url, encode_wid

DEPRECATED = "deprecated"
VALUE_TABLES = ("string", "entity", "coordinates", "quantity", "time", "none", "unknown")


def read_dump(spark: SparkSession, dump_path: str) -> DataFrame:
    """Source: the dump file/directory as raw lines (2-A#1). ``read.text``
    splits large files by range, so a single 1.5 TB dump parallelizes
    across executors (vs the reference's sequential BufReader,
    main.rs:122-137)."""
    return spark.read.text(dump_path)


def parse_entities(lines: DataFrame) -> DataFrame:
    """Framing filters + trailing-comma strip + declared-schema JSON parse
    (2-A#2,3,4,5,14). Malformed lines survive as rows with only
    ``_corrupt_record`` set — the job never aborts on bad input, matching
    main.rs:177-204."""
    v = F.col("value")
    framed = lines.filter(
        (F.trim(v) != "") & (F.trim(v) != "[") & (F.trim(v) != "]")
    ).select(F.regexp_replace(v, r",\s*$", "").alias("line"))
    parsed = framed.select(
        F.col("line"),
        F.from_json(
            "line",
            S.ENTITY_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": S.CORRUPT_COL},
        ).alias("e"),
    )
    return parsed.select(
        "line",
        F.col("e.id").alias("raw_id"),
        encode_wid(F.col("e.id")).alias("id"),
        F.col("e.labels").alias("labels"),
        F.col("e.descriptions").alias("descriptions"),
        F.col("e.claims").alias("claims"),
        F.col(f"e.{S.CORRUPT_COL}").alias(S.CORRUPT_COL),
    )


def quarantine(entities: DataFrame) -> DataFrame:
    """Rows the reference would print to stderr and skip (main.rs:177-219):
    JSON-corrupt lines and entities whose id doesn't encode."""
    return entities.filter(
        F.col(S.CORRUPT_COL).isNotNull() | F.col("id").isNull()
    ).select(
        F.col("line"),
        F.when(F.col(S.CORRUPT_COL).isNotNull(), "corrupt_json")
        .otherwise("bad_id")
        .alias("reason"),
    )


def good_entities(entities: DataFrame) -> DataFrame:
    return entities.filter(F.col(S.CORRUPT_COL).isNull() & F.col("id").isNotNull())


def meta_table(entities: DataFrame) -> DataFrame:
    """meta(id, label, description): English-only projection with NULL on
    miss (main.rs:82-83; element_at on MapType is null-safe)."""
    return good_entities(entities).select(
        F.col("id"),
        F.element_at(F.col("labels"), "en").getField("value").alias("label"),
        F.element_at(F.col("descriptions"), "en").getField("value").alias("description"),
    )


def claims_flat(entities: DataFrame) -> DataFrame:
    """Two-level explode of the claims map (2-A#9) + deprecated-rank drop
    (2-A#8, main.rs:87 — BEFORE dispatch, so deprecated novalue claims
    never reach the none table) + 20→7 type dispatch (value.rs:201-261) in
    one wide projection.

    Output: one row per kept claim with ``value_type`` ∈ 7 tables plus the
    per-type payload columns (unused ones NULL). All expressions are
    Catalyst built-ins — the whole function is a narrow, codegen-fused map.
    """
    e = good_entities(entities)
    per_prop = e.select(
        "id", F.explode("claims").alias("pid_str", "statements")
    ).select(
        "id", encode_wid(F.col("pid_str")).alias("property_id"), F.explode("statements").alias("c")
    )
    kept = per_prop.filter(
        F.col("property_id").isNotNull() & (F.coalesce(F.col("c.rank"), F.lit("normal")) != DEPRECATED)
    )

    snaktype = F.col("c.mainsnak.snaktype")
    dv_type = F.col("c.mainsnak.datavalue.type")
    dv_raw = F.col("c.mainsnak.datavalue.value")

    mono = F.from_json(dv_raw, S.MONOTEXT_VALUE)
    multi = F.from_json(dv_raw, S.MULTITEXT_VALUE)
    entity_v = F.from_json(dv_raw, S.ENTITYID_VALUE)
    coord = F.from_json(dv_raw, S.COORD_VALUE)
    qty = F.from_json(dv_raw, S.QUANTITY_VALUE)
    time_v = F.from_json(dv_raw, S.TIME_VALUE)

    multi_en = multi.getField("texts").getItem("en")

    value_type = (
        F.when(snaktype == "novalue", "none")
        .when(snaktype == "somevalue", "unknown")
        .when(dv_type == "string", "string")
        .when((dv_type == "monolingualtext") & mono.getField("text").isNotNull(), "string")
        # MultilingualText: English → string, no English → none
        # (value.rs:222-229 — a presence row, NOT a null string)
        .when((dv_type == "multilingualtext") & multi_en.isNotNull(), "string")
        .when(dv_type == "multilingualtext", "none")
        .when(dv_type == "wikibase-entityid", "entity")
        .when(dv_type == "globecoordinate", "coordinates")
        .when(dv_type == "quantity", "quantity")
        .when(dv_type == "time", "time")
        .otherwise("unknown")
    )

    string_val = (
        F.when(dv_type == "string", dv_raw)
        .when(dv_type == "monolingualtext", mono.getField("text"))
        .when(dv_type == "multilingualtext", multi_en)
    )

    # time: normalize Wikidata's unknown month/day "00" to "01", drop the
    # leading '+', then try_to_timestamp — out-of-range historical years
    # yield NULL while time_raw preserves the value losslessly (SURVEY §7a).
    t_raw = time_v.getField("time")
    t_norm = F.regexp_replace(
        F.regexp_replace(t_raw, r"-00-", "-01-"),
        r"-00T",
        "-01T",
    )
    t_norm = F.regexp_replace(t_norm, r"^\+", "")
    parsed_ts = F.try_to_timestamp(t_norm, F.lit("yyyy-MM-dd'T'HH:mm:ssX"))

    return kept.select(
        "id",
        "property_id",
        value_type.alias("value_type"),
        string_val.alias("string"),
        F.when(dv_type == "wikibase-entityid", encode_wid(entity_v.getField("id"))).alias(
            "entity_id"
        ),
        coord.getField("latitude").alias("latitude"),
        coord.getField("longitude").alias("longitude"),
        coord.getField("precision").alias("precision"),
        F.when(dv_type == "globecoordinate", encode_entity_url(coord.getField("globe"))).alias(
            "globe_id"
        ),
        # try_cast: malformed amounts must quarantine-to-NULL, not abort
        # (ANSI mode would throw on CAST) — per-record tolerance, 2-A#14.
        qty.getField("amount").try_cast("double").alias("amount"),
        qty.getField("lowerBound").try_cast("double").alias("lower_bound"),
        qty.getField("upperBound").try_cast("double").alias("upper_bound"),
        F.when(dv_type == "quantity", encode_entity_url(qty.getField("unit"))).alias("unit_id"),
        F.when(dv_type == "time", parsed_ts).alias("time"),
        time_v.getField("precision").alias("time_precision"),
        F.when(dv_type == "time", t_raw).alias("time_raw"),
    )


# Per-table projections from the flat claims relation.
_TABLE_COLS = {
    "string": ["id", "property_id", "string"],
    "entity": ["id", "property_id", "entity_id"],
    "coordinates": ["id", "property_id", "latitude", "longitude", "precision", "globe_id"],
    "quantity": ["id", "property_id", "amount", "lower_bound", "upper_bound", "unit_id"],
    "time": ["id", "property_id", "time", "time_precision", "time_raw"],
    "none": ["id", "property_id"],
    "unknown": ["id", "property_id"],
}


def value_table(claims: DataFrame, name: str) -> DataFrame:
    cols = _TABLE_COLS[name]
    df = claims.filter(F.col("value_type") == name).select(*cols)
    if name == "time":
        df = df.withColumnRenamed("time_precision", "precision")
    return df


def transform(entities: DataFrame) -> dict[str, DataFrame]:
    """All 8 output tables (+ quarantine) as lazy DataFrames."""
    claims = claims_flat(entities)
    out: dict[str, DataFrame] = {"meta": meta_table(entities)}
    for name in VALUE_TABLES:
        out[name] = value_table(claims, name)
    out["quarantine"] = quarantine(entities)
    return out


def wd2spark(
    spark: SparkSession,
    dump_path: str,
    out_path: str,
    *,
    staged: bool = True,
    mode: str = "errorifexists",
) -> dict[str, str]:
    """End-to-end ETL: dump → ``out_path/{table}`` parquet datasets.

    ``mode="errorifexists"`` mirrors the reference's refuse-existing-output
    guard (main.rs:98-104). Returns table→path.

    The staged plan writes the flat claims relation ONCE, partitioned by
    ``value_type`` (the Spark analog of the reference's per-table prepared
    statements — and of index-after-load: data lands clustered by its
    access path), then derives each typed table by partition-pruned read.
    """
    entities = parse_entities(read_dump(spark, dump_path))
    paths: dict[str, str] = {}

    meta_p = os.path.join(out_path, "meta")
    meta_table(entities).write.mode(mode).parquet(meta_p)
    paths["meta"] = meta_p

    quar_p = os.path.join(out_path, "quarantine")
    quarantine(entities).write.mode(mode).parquet(quar_p)
    paths["quarantine"] = quar_p

    if staged:
        stage_p = os.path.join(out_path, "_claims_staged")
        claims_flat(entities).write.mode(mode).partitionBy("value_type").parquet(stage_p)
        staged_claims = spark.read.parquet(stage_p)
        for name in VALUE_TABLES:
            p = os.path.join(out_path, name)
            value_table(staged_claims, name).write.mode(mode).parquet(p)
            paths[name] = p
    else:
        claims = claims_flat(entities)
        for name in VALUE_TABLES:
            p = os.path.join(out_path, name)
            value_table(claims, name).write.mode(mode).parquet(p)
            paths[name] = p
    return paths
