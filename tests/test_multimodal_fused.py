"""Fused-pipeline parity (r9): `fused_codec_pipeline` composes the synth
and consumer stage BODIES inside one mapInPandas so payloads never cross
the JVM boundary. The optimization moved the boundary, not the math —
every fused path must emit row-identical results to the standalone
operator chain it replaced.
"""

from __future__ import annotations

import pytest

from wd2sql_spark.catalog import table
import wd2sql_spark.operators.multimodal as M

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


CASES = {
    "png_decode": (
        lambda d: M.decode_images(M.synthesize_png_blobs(d)),
        lambda d: M.fused_codec_pipeline(
            d, M.png_builder(), M.decode_images_stage(), schema=M.DECODED_SCHEMA
        ),
    ),
    "png_decode_resize": (
        lambda d: M.resize_thumbnails(M.decode_images(M.synthesize_png_blobs(d)), max_side=128),
        lambda d: M.fused_codec_pipeline(
            d,
            M.png_builder(),
            M.decode_images_stage(),
            M.resize_stage(128),
            schema=M.THUMB_SCHEMA,
        ),
    ),
    "mixed_png_decode": (
        lambda d: M.decode_images(M.synthesize_mixed_png_blobs(d)),
        lambda d: M.fused_codec_pipeline(
            d, M.mixed_png_builder(), M.decode_images_stage(), schema=M.DECODED_SCHEMA
        ),
    ),
    "tri_codec_decode": (
        lambda d: M.decode_images(M.synthesize_tri_codec_png_blobs(d)),
        lambda d: M.fused_codec_pipeline(
            d, M.tri_codec_png_builder(), M.decode_images_stage(), schema=M.DECODED_SCHEMA
        ),
    ),
    "png_phash": (
        lambda d: M.phash_images(M.synthesize_png_blobs(d)),
        lambda d: M.fused_codec_pipeline(
            d, M.png_builder(), M.phash_stage(), schema=M.PHASH_SCHEMA
        ),
    ),
    "tri_codec_phash": (
        lambda d: M.phash_images(M.synthesize_tri_codec_png_blobs(d)),
        lambda d: M.fused_codec_pipeline(
            d, M.tri_codec_png_builder(), M.phash_stage(), schema=M.PHASH_SCHEMA
        ),
    ),
    "jpeg_stats": (
        lambda d: M.decode_jpeg_stats(M.synthesize_jpeg_blobs(d)),
        lambda d: M.fused_codec_pipeline(
            d, M.jpeg_builder(), M.jpeg_stats_stage(), schema=M.JPEG_STATS_SCHEMA
        ),
    ),
    "mixed_container_stats": (
        lambda d: M.decode_mixed_container_stats(M.synthesize_mixed_container_blobs(d)),
        lambda d: M.fused_codec_pipeline(
            d,
            M.mixed_container_builder(),
            M.mixed_container_stats_stage(),
            schema=M.MIXED_CONTAINER_SCHEMA,
        ),
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_fused_matches_composed(spark, name):
    composed_fn, fused_fn = CASES[name]
    docs = table(spark, SF, "documents")
    composed = _rows(composed_fn(docs))
    fused = _rows(fused_fn(docs))
    assert composed == fused
    assert len(composed) > 0
