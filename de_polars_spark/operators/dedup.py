"""Deduplication operators for large-scale corpus cleaning.

Five strategies, all shuffle-frugal and 100 TB-minded:

- exact:      hash-groupBy on content hash; one shuffle on a short key.
- fingerprint: exact on the *normalized* sorted-word fingerprint
              (catches word-order shuffles).
- MinHash+LSH: per-row signature (array transforms — zero shuffle), band
              keys, then a single groupBy-style self-join on (band, key)
              buckets; candidate pairs only, as in the classic
              shingle→minhash→band→bucket pipeline.
- SimHash:    per-row 16-bit fingerprint; identical-hash grouping.
- n-gram Jaccard: explode distinct shingles, equi-join on shingle within a
              blocking key, exact Jaccard from intersection counts.
- embedding near-dup: cosine over unit vectors within a blocking key.

Per-row signature work is all JVM expression trees (whole-stage codegen);
the only shuffles are the bucket joins, which is the minimum any
candidate-pair algorithm needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from de_polars_spark.functions import text as TX
from de_polars_spark.functions import vectors as VX


def exact_dup_groups(df: DataFrame, id_col: str, content: Column) -> DataFrame:
    """Group rows by exact content hash; emit one row per duplicate group
    with the canonical (min-id) keeper and the group size."""
    return (
        df.select(F.col(id_col), F.md5(content).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 2,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Signature and band keys are computed per-row (no explode until the
    tiny band relation); the bucket self-join is the classic LSH
    candidate generation — at scale each band bucket is small, so the
    join is a skew-tolerant shuffle on md5 keys.
    """
    assert n_hashes % band_size == 0
    n_bands = n_hashes // band_size
    shingles = TX.word_shingles(F.col(text_col), shingle_n)
    sig = df.select(
        F.col(id_col), *TX.minhash_signature(shingles, n_hashes)
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat(*[F.col(f"mh{b * band_size + j}") for j in range(band_size)])
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    bands = (
        sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("band"))
        .select(id_col, "band.band_id", "band.band_key")
        .filter(F.col("band_key").isNotNull())
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc 16-bit SimHash; identical hashes are near-dup groups."""
    return df.select(
        F.col(id_col), TX.simhash16(F.col(text_col)).alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.3,
    shingle_n: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing a blocking key.

    Blocking bounds the candidate space (at 100 TB an unblocked
    all-pairs join is impossible); within a block, the shingle equi-join
    computes |A∩B| and array sizes give |A|,|B|.
    """
    docs = df.select(
        F.col(id_col),
        F.col(block_col).alias("block"),
        TX.word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    )
    sizes = docs.select(id_col, "block", F.size("shingles").alias("n_shingles"))
    ex = docs.select(
        id_col, "block", F.explode("shingles").alias("shingle")
    )
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = F.round(
        F.col("n_common")
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        6,
    )
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Cosine near-duplicate pairs within a blocking key.

    Cosine is a sequential double fold (bit-reproducible); rounding to 6
    decimals before thresholding keeps the cut deterministic across
    engines."""
    docs = df.select(
        F.col(id_col),
        F.col(block_col).alias("block"),
        VX.as_double(F.col(vec_col)).alias("v"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    cos = F.round(VX.cosine(F.col("a.v"), F.col("b.v")), 6)
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
