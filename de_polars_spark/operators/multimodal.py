"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded via Arrow-batched ``mapInPandas``.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; per-batch Python does the decode. The image/audio libraries are
not in this container, so the decode step is STUBBED with a clearly
marked deterministic fake — the Spark-side plumbing (schema, batch
iteration, UDF signature, partitioning) is real and is what this module
exists to exercise.

At scale: binary payloads dominate row width — keep them out of shuffles
(decode early, project features, drop the payload) and size
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, mode string, n_bytes int"
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic 16-byte binary payload + metadata struct from
    a text column (stands in for a real image blob)."""
    return df.select(
        F.col(id_col),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            F.lit(16).alias("n_bytes"),
        ).alias("media_meta"),
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch 'decode'. Real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))``; that library is absent here,
    so non-'fake' formats raise and 'fake' derives dimensions from the
    payload bytes deterministically."""
    for pdf in batches:
        fmts = pdf["media_meta"].map(lambda m: m["format"])
        if (fmts != "fake").any():
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg, not available in this env"
            )
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": payloads.map(lambda b: b[0]).astype("int32"),
                "height": payloads.map(lambda b: b[1]).astype("int32"),
                "mode": payloads.map(
                    lambda b: ("RGB", "L", "RGBA")[b[2] % 3]
                ),
                "n_bytes": payloads.map(len).astype("int32"),
            }
        )


def decode_images(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary in → typed feature columns out."""
    return with_payload.mapInPandas(_decode_batch, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "scale_x double, scale_y double, out_bytes bigint"
)


def resize_images(with_payload: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize plumbing: emits source + target geometry per image.

    A real implementation swaps the arithmetic for
    ``PIL.Image.resize((out_w, out_h))`` and re-encodes the payload; batch
    shape, schema, and the decode-early/drop-payload pattern are what
    scale (the binary never enters a shuffle)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            p = pdf["payload"]
            w = p.map(lambda b: b[0]).astype("int32")
            h = p.map(lambda b: b[1]).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_width": out_w,
                    "out_height": out_h,
                    "scale_x": (out_w / w.clip(lower=1)).round(6),
                    "scale_y": (out_h / h.clip(lower=1)).round(6),
                    "out_bytes": out_w * out_h * 3,
                }
            )

    return with_payload.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def extract_features(with_payload: DataFrame, dim: int = 4) -> DataFrame:
    """Feature extraction: payload → fixed-width ``array<double>`` embedding
    (deterministic byte scaling stands in for a vision-encoder forward
    pass). Output feeds the ANN operators (operators/similarity.py)."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": pdf["payload"].map(
                        lambda b: [round(b[i] / 255.0, 6) for i in range(dim)]
                    ),
                }
            )

    return with_payload.mapInPandas(
        _feats, schema="doc_id bigint, features array<double>"
    )


FRAMES_SCHEMA = "doc_id bigint, frame_id int, frame_ts double, frame_checksum int"


def sample_frames(with_payload: DataFrame, frame_interval_s: float = 0.5) -> DataFrame:
    """Video frame sampling: one input row fans out to N frame rows
    (N = 1 + payload[3] % 5 in the deterministic fake; ffmpeg keyframe
    extraction in a real build). Demonstrates the row-expanding
    ``mapInPandas`` shape — output cardinality independent of input."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_id": [], "frame_ts": [], "frame_checksum": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = 1 + b[3] % 5
                for fid in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(fid)
                    out["frame_ts"].append(round(fid * frame_interval_s, 6))
                    out["frame_checksum"].append((b[4] + 31 * fid) % 256)
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(_frames, schema=FRAMES_SCHEMA)
