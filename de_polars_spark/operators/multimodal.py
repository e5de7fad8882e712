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
