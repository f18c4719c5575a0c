"""Multimodal battery: BINARY-column pipelines through Arrow/mapInPandas.

The image path runs a REAL codec (r5): the fixture builder writes genuine
PNG payloads and the decode stages verify CRCs, inflate the zlib stream,
and reconstruct scanline filters (operators/multimodal.py). The queries
stay oracle-able because the ENCODER is deterministic: the DuckDB twin
re-derives byte counts and pixel values from the documents table the
encoder sampled, while Spark actually round-trips the codec — an
end-to-end hash match proves encoder, decoder, and the Arrow plumbing
are lossless together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.operators import dedup as D
from wd2sql_spark.operators import multimodal as M
from wd2sql_spark.queries.registry import query

# PNG payload arithmetic the oracles re-derive (operators/multimodal.py
# layout): total = sig 8 + IHDR 25 + tEXt (16 + srclen) + IDAT (23 + 9h)
# + IEND 12 = 84 + srclen + 9h, with h = 8 + doc_id % 5 and the pixel
# rows stored uncompressed inside a valid zlib stream.
_PNG_H = f"(8 + doc_id % {M.PNG_H_MOD})"

DECODE_ORACLE = f"""
WITH b AS (
  SELECT doc_id, octet_length(encode(source)) AS s
  FROM documents WHERE octet_length(encode(text)) > 0)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(84 + s + 9 * {_PNG_H} AS BIGINT) AS n_bytes,
       CAST({M.PNG_W} AS BIGINT)             AS width,
       CAST({_PNG_H} AS BIGINT)              AS height,
       CAST(1 AS BIGINT)                     AS channels,
       'png'                                 AS format
FROM b
ORDER BY doc_id
"""


@query("multimodal_decode_stats", oracle=DECODE_ORACLE, category="llm-multimodal")
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text→PNG synth + Arrow-batched mapInPandas decode (REAL codec:
    CRC-verified chunks, zlib inflate, filter reconstruction) → typed
    metadata. The oracle re-derives the deterministic encoder's byte
    counts and geometry, proving the whole encode→decode round trip and
    the Arrow batch plumbing are byte-exact; empty-text docs produce no
    payload and drop on both sides.

    No output sort (r9, guide §2.4): the global orderBy was cosmetic
    (the driver's row comparison is order-insensitive; r7 precedent
    scalar_math_fns), and on a map-only Python pipeline its range
    sampler re-executes the whole encode+decode subtree a second time —
    measured 0.68 s without the sort vs 1.17 s with it at sf0.1."""
    docs = table(spark, sf_dir, "documents")
    # Fused single-stage pipeline (r9): the PNG payload never crosses
    # the JVM boundary — same stage bodies as the standalone chain,
    # pinned by tests/test_multimodal_fused.py.
    return M.fused_codec_pipeline(
        docs, M.png_builder(), M.decode_images_stage(), schema=M.DECODED_SCHEMA
    )


THUMB_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {M.PNG_W} AS w, {_PNG_H} AS h
  FROM documents WHERE octet_length(encode(text)) > 0),
s AS (SELECT doc_id, w, h, least(128.0 / greatest(w, h), 1.0) AS scale FROM d)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(floor(w * scale) AS BIGINT) AS thumb_width,
       CAST(floor(h * scale) AS BIGINT) AS thumb_height,
       CAST(scale AS DOUBLE) AS scale
FROM s
ORDER BY doc_id
"""


@query("multimodal_resize_thumbs", oracle=THUMB_ORACLE, category="llm-multimodal")
def multimodal_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained Arrow stages (real PNG decode → resize geometry).
    floor() in the oracle matches pandas' int64 truncation. The fixture
    images are tiny (≤ 8×12), so scale clips at 1.0 — the geometry path
    still runs on decoded, not declared, dimensions. No output sort
    (r9, guide §2.4): cosmetic on an order-insensitive comparison, and
    its range sampler re-ran the two Python stages (see
    multimodal_decode_stats)."""
    docs = table(spark, sf_dir, "documents")
    # Fused single-stage pipeline (r9): synth→decode→resize bodies
    # composed in ONE mapInPandas (was THREE adjacent Python stages).
    return M.fused_codec_pipeline(
        docs,
        M.png_builder(),
        M.decode_images_stage(),
        M.resize_stage(128),
        schema=M.THUMB_SCHEMA,
    )


FRAMES_ORACLE = """
WITH b AS (SELECT doc_id, strlen(text) AS n FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(f.f AS BIGINT) AS frame_no,
       CAST(f.f * 1024 AS BIGINT) AS "offset"
FROM b, unnest(range(0, greatest(n // 1024 + 1, 1))) f(f)
ORDER BY doc_id, frame_no
"""


@query("multimodal_frame_sample", oracle=FRAMES_ORACLE, category="llm-multimodal")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N Arrow stage (video frame sampling shape): one output row per
    sampled frame — the case where mapInPandas is mandatory (scalar UDFs
    are 1→1). No output sort (r9, guide §2.4): cosmetic on an
    order-insensitive comparison, and its range sampler re-ran the
    Python stages (see multimodal_decode_stats)."""
    docs = table(spark, sf_dir, "documents")
    return M.frame_sample(M.synthesize_blobs(docs), every_n_bytes=1024)


MIXED_CODEC_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         octet_length(encode(source)) AS s, {_PNG_H} AS h,
         {M.PNG_W} * {_PNG_H} AS npx
  FROM documents
  WHERE octet_length(encode(text)) > 0),
pxall AS (
  SELECT doc_id,
         CAST(('0x' || substring(
             hx, 2 * ((t.i * greatest(n // npx, 1)) % n) + 1, 2)) AS BIGINT) AS p
  FROM b, unnest(range(0, {M.PNG_W} * ({M.PNG_H_BASE} + {M.PNG_H_MOD} - 1))) t(i)
  WHERE t.i < npx),
pal AS (SELECT doc_id, COUNT(DISTINCT p) AS ncolors FROM pxall GROUP BY doc_id)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN b.doc_id % 2 = 0 THEN 84 + s + 9 * h
                 ELSE 96 + s + 9 * h + 3 * pal.ncolors END AS BIGINT) AS n_bytes,
       CAST({M.PNG_W} AS BIGINT) AS width,
       CAST(h AS BIGINT)         AS height,
       CAST(1 AS BIGINT)         AS channels,
       CASE WHEN b.doc_id % 2 = 0 THEN 'png' ELSE 'png-palette' END AS format
FROM b JOIN pal ON b.doc_id = pal.doc_id
ORDER BY doc_id
"""


@query("multimodal_mixed_codec_stats", oracle=MIXED_CODEC_ORACLE, category="llm-multimodal")
def multimodal_mixed_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO real codecs through ONE Arrow decode stage (VERDICT r5 task
    #7): even doc_ids arrive as grayscale-8 PNGs, odd ones as palette-8
    (color type 3, PLTE chunk) — the decoder dispatches on the IHDR color
    type, resolves palette indices through PLTE, and reports per-format
    stats. The oracle re-derives the palette payload arithmetic from the
    documents table: a palette image costs the gray encoding + the PLTE
    chunk (12 + 3·n_colors), with n_colors = COUNT(DISTINCT sampled
    pixel byte) — so a hash match proves the second encoder's chunk
    layout, the PLTE round trip, and the shared Arrow plumbing are
    lossless together, the same end-to-end argument as the gray path.
    No output sort (r9, guide §2.4): cosmetic on an order-insensitive
    comparison, and its range sampler re-ran the Python stages (see
    multimodal_decode_stats)."""
    docs = table(spark, sf_dir, "documents")
    # Fused single-stage pipeline (r9) — see multimodal_decode_stats.
    return M.fused_codec_pipeline(
        docs, M.mixed_png_builder(), M.decode_images_stage(), schema=M.DECODED_SCHEMA
    )


PHASH_HAM_MAX = 3  # guaranteed recall at the 4-band floor: bands > h, h <= 3

# Band width auto-scales with the corpus count exactly like dedup_simhash
# (operators/dedup.auto_band_bits — floor 14, cap 28 over the 56-bit hash);
# the knob CTE computes the identical LEAST/GREATEST/CEIL(LOG2(n))
# arithmetic from the same COUNT(*) FROM documents (the table the encoder
# samples — NOT the non-empty-payload subset, so both engines price the
# knob before any filtering).
PHASH_KNOB_SQL = f"""
  SELECT LEAST({D.BAND_BITS_CAP}, GREATEST({D.SIMHASH_BAND_BITS},
           CAST(CEIL(LOG2(GREATEST(COUNT(*), 2))) AS INT))) AS bb,
         GREATEST(2, {M.PHASH_BITS} // LEAST({D.BAND_BITS_CAP},
           GREATEST({D.SIMHASH_BAND_BITS},
             CAST(CEIL(LOG2(GREATEST(COUNT(*), 2))) AS INT)))) AS nb
  FROM documents
"""

PHASH_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         {M.PNG_W} * {_PNG_H} AS npx
  FROM documents
  WHERE octet_length(encode(text)) > 0),
px AS (
  SELECT doc_id, t.k,
         CAST(('0x' || substring(
             hx,
             2 * (((((t.k * greatest(npx // {M.PHASH_PIXELS}, 1)) % npx)
                    * greatest(n // npx, 1)) % n)) + 1,
             2)) AS BIGINT) AS p
  FROM b, unnest(range(0, {M.PHASH_PIXELS})) t(k)),
stats AS (SELECT doc_id, SUM(p) // {M.PHASH_PIXELS} AS mean FROM px GROUP BY doc_id),
h AS (
  SELECT px.doc_id,
         CAST(SUM(CASE WHEN px.k < {M.PHASH_BITS} AND px.p > s.mean
                       THEN (CAST(1 AS BIGINT) << px.k) ELSE 0 END) AS BIGINT) AS ahash
  FROM px JOIN stats s USING (doc_id)
  GROUP BY px.doc_id),
knob AS ({PHASH_KNOB_SQL}),
chunks AS (
  SELECT doc_id, ahash, t.c,
         (ahash >> (k.bb * t.c)) & ((CAST(1 AS BIGINT) << k.bb) - 1) AS v
  FROM h, knob k, unnest(range(0, {M.PHASH_BITS // D.SIMHASH_BAND_BITS})) t(c)
  WHERE t.c < k.nb),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.ahash AS h1, b.ahash AS h2
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id)
SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(h1, h2)) <= {PHASH_HAM_MAX}
ORDER BY d1, d2
"""


@query("multimodal_phash_near_dup", oracle=PHASH_ORACLE, category="llm-multimodal")
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual hash over REAL PNG
    payloads (r5): an Arrow-batched aHash that runs the actual decoder
    (CRC + inflate + filter reconstruction) and samples the RECONSTRUCTED
    pixel buffer (operators/multimodal.py::phash_images), then hamming
    banding on the hash itself: candidates must share one of 4 14-bit
    bands (bands > h pigeonhole ⇒ guaranteed recall for hamming ≤ 3),
    verified via bit_count(xor). The multimodal twin of dedup_simhash —
    how a 100 TB image corpus dedups without pairwise pixel comparison:
    the codec work is one linear Arrow pass, banding bounds the candidate
    join, and the verify is integer bit arithmetic. BAND WIDTH IS THE
    SCALE KNOB: per-bucket collision pairs grow as N²/2^band_bits, and
    the 64× scale experiment measured 8-bit bands (256 buckets) going
    near-quadratic at 320k docs (29 s) where 14-bit bands (16k buckets)
    hold the candidate set sparse — the same corpus-vs-recall trade
    minhash tunes with band_size. Since r6 the width is AUTO-DERIVED
    from the documents count (operators/dedup.auto_band_bits, identical
    knob CTE in the oracle): 4×14 bits at fixture sizes, widening past
    16 k images so the constant can never lag the corpus again.
    The hash arithmetic is exact integers
    over deterministically-encoded pixels, so the oracle re-derives the
    bits from the documents table the encoder sampled, and the whole
    pipeline (codec round trip + Arrow plumbing included) hash-matches;
    tests/test_multimodal_codec.py additionally re-derives the hash from
    the raw payload bytes at the stored-block offsets.

    The (doc_id, ahash) relation is bounded_persist-ed (r9, guide §2.4 /
    §5): both sides of the band self-join derive from it, and without a
    persist Spark executed the whole encode+decode+hash Python pipeline
    once PER SIDE — the persisted relation is two longs per image, so
    the codec runs once and the join probes cached rows (the same fix
    the simhash/minhash self-joins got in r5, missed here)."""
    from wd2sql_spark.session_cache import bounded_persist, cached_count

    docs = table(spark, sf_dir, "documents")
    bb = D.auto_band_bits(cached_count(docs, (sf_dir, "documents")))
    n_bands = max(2, M.PHASH_BITS // bb)
    mask = (1 << bb) - 1
    blobs = bounded_persist(
        # Fused single-stage synth+hash (r9) — see multimodal_decode_stats.
        M.fused_codec_pipeline(
            docs, M.png_builder(), M.phash_stage(), schema=M.PHASH_SCHEMA
        ),
        "llm_multimodal.phash_ahash",
        key=(sf_dir,),
    )
    chunks = blobs.select(
        "doc_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright(F.col("ahash"), bb * c)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for c in range(n_bands)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "ahash", F.col("cv.c").alias("c"), F.col("cv.v").alias("v"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.ahash").alias("h1"),
            F.col("b.ahash").alias("h2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cand.select("d1", "d2", ham.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .orderBy("d1", "d2")
    )


# Truecolor payload arithmetic: an RGB-8 scanline is 3·w+1 bytes (vs the
# gray w+1), so total = 84 + srclen + (3·8+1)·h = 84 + srclen + 25·h.
TRI_CODEC_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         octet_length(encode(source)) AS s, {_PNG_H} AS h,
         {M.PNG_W} * {_PNG_H} AS npx
  FROM documents
  WHERE octet_length(encode(text)) > 0),
pxall AS (
  SELECT doc_id,
         CAST(('0x' || substring(
             hx, 2 * ((t.i * greatest(n // npx, 1)) % n) + 1, 2)) AS BIGINT) AS p
  FROM b, unnest(range(0, {M.PNG_W} * ({M.PNG_H_BASE} + {M.PNG_H_MOD} - 1))) t(i)
  WHERE t.i < npx AND b.doc_id % 3 = 1),
pal AS (SELECT doc_id, COUNT(DISTINCT p) AS ncolors FROM pxall GROUP BY doc_id)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN b.doc_id % 3 = 0 THEN 84 + s + 9 * h
                 WHEN b.doc_id % 3 = 1 THEN 96 + s + 9 * h + 3 * pal.ncolors
                 ELSE 84 + s + 25 * h END AS BIGINT) AS n_bytes,
       CAST({M.PNG_W} AS BIGINT) AS width,
       CAST(h AS BIGINT)         AS height,
       CAST(CASE WHEN b.doc_id % 3 = 2 THEN 3 ELSE 1 END AS BIGINT) AS channels,
       CASE WHEN b.doc_id % 3 = 0 THEN 'png'
            WHEN b.doc_id % 3 = 1 THEN 'png-palette'
            ELSE 'png-rgb' END AS format
FROM b LEFT JOIN pal ON b.doc_id = pal.doc_id
ORDER BY doc_id
"""


@query("multimodal_truecolor_codec_stats", oracle=TRI_CODEC_ORACLE, category="llm-multimodal")
def multimodal_truecolor_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE real codecs through ONE Arrow decode stage (VERDICT r6 task
    #8): doc_id % 3 picks grayscale-8 / palette-8 / truecolor RGB-8. The
    truecolor arm's channels are genuinely distinct (three strided text
    bytes per pixel), so the decoder's bpp=3 filter reconstruction and
    3-channel return path run on real data. The oracle re-derives each
    arm's payload arithmetic from the documents table — an RGB scanline
    is 3·w+1 bytes vs the gray w+1 — so a hash match proves the third
    encoder's chunk layout and the shared decode dispatch are lossless
    together with the two r6 formats. No output sort (r9, guide §2.4):
    cosmetic on an order-insensitive comparison, and its range sampler
    re-ran the Python stages (see multimodal_decode_stats)."""
    docs = table(spark, sf_dir, "documents")
    # Fused single-stage pipeline (r9) — see multimodal_decode_stats.
    return M.fused_codec_pipeline(
        docs,
        M.tri_codec_png_builder(),
        M.decode_images_stage(),
        schema=M.DECODED_SCHEMA,
    )


def _tri_byte(expr: str) -> str:
    """DuckDB: text byte at 0-based offset ``expr`` (via the hex dump)."""
    return f"CAST(('0x' || substring(hx, 2 * ({expr}) + 1, 2)) AS BIGINT)"


# The LUMA-plane aHash contract (operators/multimodal.phash_images): for
# 3-channel decodes the hash runs over (r + 2g + b) // 4 — exact integer
# arithmetic, so the oracle computes the identical plane from the three
# strided channel bytes; 1-channel arms hash the gray byte directly.
TRI_PHASH_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         {M.PNG_W} * {_PNG_H} AS npx
  FROM documents
  WHERE octet_length(encode(text)) > 0),
px AS (
  SELECT doc_id, t.k, hx, n,
         (((t.k * greatest(npx // {M.PHASH_PIXELS}, 1)) % npx)
            * greatest(n // npx, 1)) AS o,
         doc_id % 3 AS arm
  FROM b, unnest(range(0, {M.PHASH_PIXELS})) t(k)),
pv AS (
  SELECT doc_id, k,
         CASE WHEN arm = 2 THEN
                ({_tri_byte("o % n")} + 2 * {_tri_byte("(o + 1) % n")}
                   + {_tri_byte("(o + 2) % n")}) // 4
              ELSE {_tri_byte("o % n")} END AS p
  FROM px),
stats AS (SELECT doc_id, SUM(p) // {M.PHASH_PIXELS} AS mean FROM pv GROUP BY doc_id)
SELECT CAST(pv.doc_id AS BIGINT) AS doc_id,
       CAST(SUM(CASE WHEN pv.k < {M.PHASH_BITS} AND pv.p > s.mean
                     THEN (CAST(1 AS BIGINT) << pv.k) ELSE 0 END) AS BIGINT) AS ahash
FROM pv JOIN stats s USING (doc_id)
GROUP BY pv.doc_id
ORDER BY doc_id
"""


@query("multimodal_luma_phash", oracle=TRI_PHASH_ORACLE, category="llm-multimodal")
def multimodal_luma_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash over the MIXED-COLOR-TYPE corpus (r7): the aHash
    stage decodes all three container formats and hashes 1-channel
    decodes directly but 3-channel decodes through the integer luma
    plane ((r + 2g + b) // 4) — the contract that makes image near-dup
    banding container-agnostic at 100 TB (a re-encoded copy of an image
    hashes identically whatever color type it arrived in). The oracle
    recomputes every sampled pixel — including the three per-pixel
    channel bytes of the RGB arm — from the documents table, so a hash
    match proves decoder, luma arithmetic, and Arrow plumbing exact.
    No output sort (r9, guide §2.4): cosmetic on an order-insensitive
    comparison, and its range sampler re-ran the Python stages (see
    multimodal_decode_stats)."""
    docs = table(spark, sf_dir, "documents")
    # Fused single-stage pipeline (r9) — see multimodal_decode_stats.
    return M.fused_codec_pipeline(
        docs, M.tri_codec_png_builder(), M.phash_stage(), schema=M.PHASH_SCHEMA
    )


# JPEG payload arithmetic the oracle re-derives (operators/multimodal.py
# _make_jpeg_codec): the encoder emits DC-only blocks, so each block's
# reconstructed value is the closed form clamp(2·Fq + 128) with
# Fq = sign(v−128)·((|v−128| + 1) // 2) — round-to-nearest quantization
# of the constant block's DCT (F₀₀ = 8·(v−128)) by JPEG_QDC = 16. Block k
# samples the text byte at (k·stride) % n. n_bytes is NOT oracled: the
# entropy-segment length depends on the Huffman bit count and FF-stuffing,
# which is the codec's job to get right, proved by sum_px instead (a
# wrong stream length corrupts every later block's pixels).
_JPEG_HB = f"(1 + doc_id % {M.JPEG_BH_MOD})"
_JPEG_NBLK = f"({M.JPEG_BLOCKS_W} * {_JPEG_HB})"


def _jpeg_byte(expr: str) -> str:
    """DuckDB: text byte at 0-based offset ``expr`` (via the hex dump)."""
    return f"CAST(('0x' || substring(hx, 2 * ({expr}) + 1, 2)) AS BIGINT)"


JPEG_CODEC_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         {_JPEG_NBLK} AS nblk
  FROM documents
  WHERE octet_length(encode(text)) > 0),
blk AS (
  SELECT doc_id, nblk, t.k,
         {_jpeg_byte("(t.k * greatest(n // nblk, 1)) % n")} AS v
  FROM b, unnest(range(0, 2 * {M.JPEG_BH_MOD})) t(k)
  WHERE t.k < nblk),
q AS (
  SELECT doc_id, nblk,
         CASE WHEN v >= 128 THEN (8 * (v - 128) + {M.JPEG_QDC} // 2) // {M.JPEG_QDC}
              ELSE -((8 * (128 - v) + {M.JPEG_QDC} // 2) // {M.JPEG_QDC}) END AS fq
  FROM blk)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(8 * {M.JPEG_BLOCKS_W} AS BIGINT) AS width,
       CAST(8 * {_JPEG_HB} AS BIGINT) AS height,
       CAST(nblk AS BIGINT) AS n_blocks,
       CAST(SUM(64 * LEAST(255, GREATEST(0, 2 * fq + 128))) AS BIGINT) AS sum_px,
       'jpeg' AS format
FROM q
GROUP BY doc_id, nblk
ORDER BY doc_id
"""


@query("multimodal_jpeg_codec_stats", oracle=JPEG_CODEC_ORACLE, category="llm-multimodal")
def multimodal_jpeg_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND container format (VERDICT r7 missing #4): text→JPEG
    synth + Arrow-batched mapInPandas decode through a REAL
    baseline-sequential path — marker grammar, the standard Annex K
    Huffman tables rebuilt canonically from the file's own DHT segments,
    FF00-unstuffed entropy reading, zigzag dequantization, and a
    fixed-point integer IDCT over all 64 coefficients. The returned
    sum_px is the exact integer sum of every reconstructed pixel, and
    the oracle recomputes it from the documents table via the DC
    quantization closed form — a hash match proves the whole
    entropy→pixels path (and the encoder it round-trips) bit-exact.
    Parity target: the reference stores only decoded/typed values
    (src/main.rs:141-161 fixed schema); this extends the same
    decode-at-ingest discipline to a second real container. No output
    sort (r9, guide §2.4): cosmetic on an order-insensitive comparison,
    and its range sampler re-ran the (expensive) JPEG entropy decode a
    second time (see multimodal_decode_stats)."""
    docs = table(spark, sf_dir, "documents")
    return (
        # Fused single-stage pipeline (r9) — see multimodal_decode_stats.
        M.fused_codec_pipeline(
            docs, M.jpeg_builder(), M.jpeg_stats_stage(), schema=M.JPEG_STATS_SCHEMA
        )
        .select("doc_id", "width", "height", "n_blocks", "sum_px", "format")
    )


# Mixed-container oracle: even docs are gray PNGs (pixel i samples the
# text byte at (i·stride) % n — reconstruction is lossless, so sum_px is
# just the sample sum), odd docs are DC-only JPEGs (per-block closed-form
# quantization, the JPEG_CODEC_ORACLE arithmetic).
MIXED_CONTAINER_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
  WHERE octet_length(encode(text)) > 0),
png AS (
  SELECT doc_id, {M.PNG_W} AS width, {_PNG_H} AS height,
         {M.PNG_W} * {_PNG_H} AS npx
  FROM b WHERE doc_id % 2 = 0),
png_px AS (
  SELECT p.doc_id, p.width, p.height,
         {_tri_byte("(t.k * greatest(n // npx, 1)) % n")} AS v
  FROM png p JOIN b USING (doc_id),
       unnest(range(0, {M.PNG_W} * (8 + {M.PNG_H_MOD} - 1))) t(k)
  WHERE t.k < npx),
png_out AS (
  SELECT doc_id, width, height, SUM(v) AS sum_px, 'png' AS format
  FROM png_px GROUP BY doc_id, width, height),
jb AS (
  SELECT doc_id, hx, n, {_JPEG_NBLK} AS nblk
  FROM b WHERE doc_id % 2 = 1),
jblk AS (
  SELECT doc_id, nblk, t.k,
         {_jpeg_byte("(t.k * greatest(n // nblk, 1)) % n")} AS v
  FROM jb, unnest(range(0, 2 * {M.JPEG_BH_MOD})) t(k)
  WHERE t.k < nblk),
jq AS (
  SELECT doc_id, nblk,
         CASE WHEN v >= 128 THEN (8 * (v - 128) + {M.JPEG_QDC} // 2) // {M.JPEG_QDC}
              ELSE -((8 * (128 - v) + {M.JPEG_QDC} // 2) // {M.JPEG_QDC}) END AS fq
  FROM jblk),
jpeg_out AS (
  SELECT doc_id, 8 * {M.JPEG_BLOCKS_W} AS width, 8 * {_JPEG_HB} AS height,
         SUM(64 * LEAST(255, GREATEST(0, 2 * fq + 128))) AS sum_px,
         'jpeg' AS format
  FROM jq GROUP BY doc_id, nblk)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height, CAST(sum_px AS BIGINT) AS sum_px,
       format
FROM (SELECT * FROM png_out UNION ALL SELECT * FROM jpeg_out)
ORDER BY doc_id
"""


@query(
    "multimodal_mixed_container_stats",
    oracle=MIXED_CONTAINER_ORACLE,
    category="llm-multimodal",
)
def multimodal_mixed_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO container FORMATS through ONE decode dispatch (the r8 JPEG arm
    composed with the r5 PNG path): payloads route by magic bytes — PNG
    signature vs JPEG SOI — into the matching REAL decoder and emit a
    normalized (geometry, exact pixel sum, format) row. This is the
    ingest contract a 100 TB crawl needs: downstream quality/near-dup/
    thumbnail operators consume decoded pixels and never branch on the
    container. The oracle re-derives BOTH arms from the documents table
    (PNG reconstruction is lossless sampling; JPEG reconstructs through
    the DC quantization closed form), so a value-hash match proves both
    codecs AND the dispatch boundary exact in one query. No output sort
    (r9, guide §2.4): cosmetic on an order-insensitive comparison, and
    its range sampler re-ran both real decoders a second time (see
    multimodal_decode_stats)."""
    docs = table(spark, sf_dir, "documents")
    # Fused single-stage pipeline (r9) — see multimodal_decode_stats.
    return M.fused_codec_pipeline(
        docs,
        M.mixed_container_builder(),
        M.mixed_container_stats_stage(),
        schema=M.MIXED_CONTAINER_SCHEMA,
    )


# Video-demux oracle: every frame of a doc's MJPEG AVI is a DC-only JPEG
# at the doc's geometry; frame f's block k samples the text byte at
# (f + k·stride) % n, so per-frame pixel sums re-derive from the
# documents table via the same DC quantization closed form as
# JPEG_CODEC_ORACLE — one extra unnest level for the frame axis.
# n_frames = 1 + doc_id % AVI_FRAMES_MOD (decorrelated from the height
# knob's % JPEG_BH_MOD). The CONTAINER walk itself is proved by
# n_frames: a demuxer that drops/duplicates/mis-pads a 00dc chunk
# changes the frame count or feeds the JPEG decoder garbage, and either
# way the row diverges.
VIDEO_DEMUX_ORACLE = f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         (1 + doc_id % {M.JPEG_BH_MOD}) AS hb,
         {M.JPEG_BLOCKS_W} * (1 + doc_id % {M.JPEG_BH_MOD}) AS nblk,
         (1 + doc_id % {M.AVI_FRAMES_MOD}) AS nfr
  FROM documents
  WHERE octet_length(encode(text)) > 0),
fb AS (
  SELECT doc_id, hb, nblk, nfr,
         {_jpeg_byte("(fr.f + t.k * greatest(n // nblk, 1)) % n")} AS v
  FROM b,
       unnest(range(0, {M.AVI_FRAMES_MOD})) fr(f),
       unnest(range(0, 2 * {M.JPEG_BH_MOD})) t(k)
  WHERE fr.f < nfr AND t.k < nblk),
q AS (
  SELECT doc_id, hb, nblk, nfr,
         CASE WHEN v >= 128 THEN (8 * (v - 128) + {M.JPEG_QDC} // 2) // {M.JPEG_QDC}
              ELSE -((8 * (128 - v) + {M.JPEG_QDC} // 2) // {M.JPEG_QDC}) END AS fq
  FROM fb)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(nfr AS BIGINT) AS n_frames,
       CAST(8 * {M.JPEG_BLOCKS_W} AS BIGINT) AS width,
       CAST(8 * hb AS BIGINT) AS height,
       CAST(nfr * nblk AS BIGINT) AS n_blocks_total,
       CAST(SUM(64 * LEAST(255, GREATEST(0, 2 * fq + 128))) AS BIGINT) AS sum_px
FROM q
GROUP BY doc_id, hb, nblk, nfr
ORDER BY doc_id
"""


@query("multimodal_video_demux_stats", oracle=VIDEO_DEMUX_ORACLE, category="llm-multimodal")
def multimodal_video_demux_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIRD container family, and the module's last stub made REAL
    (VERDICT r8 stretch (b)): text→MJPEG-in-AVI synth (a genuine RIFF
    container — chunk grammar, word-aligned 00dc frames, idx1 index)
    → Arrow-batched demux that walks the grammar, cross-checks idx1
    against the movi offsets, and decodes every extracted frame through
    the real baseline JPEG path → a JVM-side per-document aggregate
    over the typed frame rows (raw frame bytes never cross a shuffle).
    The oracle re-derives every frame's pixel sum from the documents
    table via the DC quantization closed form, so a value-hash match
    proves muxer, demuxer, per-frame codec, AND the Arrow 1→N fan-out
    exact. Parity target: the reference stores only decoded/typed
    values (src/main.rs:141-161); this is that discipline applied to a
    container-of-containers."""
    docs = table(spark, sf_dir, "documents")
    # Fused synth+demux (one Arrow stage): the container bytes never
    # cross the JVM boundary; bit-identical rows to the standalone
    # demux_video_frames(synthesize_avi_blobs(docs)) composition, which
    # tests/test_video_demux.py pins.
    frames = M.synthesize_and_demux_video(docs)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.min("width").alias("width"),
            F.min("height").alias("height"),
            F.sum((F.col("width") / 8).cast("long") * (F.col("height") / 8).cast("long")).alias(
                "n_blocks_total"
            ),
            F.sum("sum_px").alias("sum_px"),
        )
        .select("doc_id", "n_frames", "width", "height", "n_blocks_total", "sum_px")
        .orderBy("doc_id")
    )
