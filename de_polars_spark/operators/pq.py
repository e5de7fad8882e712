"""Product quantization (PQ) over an embedding column.

The memory-compression half of the production ANN stack (IVF partitions
the corpus, PQ shrinks what each cell stores): split each D-dim vector
into ``m`` subvectors of ``D/m`` dims, fit a tiny k-means codebook per
subspace, and store each vector as ``m`` small codes. At 64 dims ×
float64 → 4 × 1-byte codes that is a 128× reduction — the difference
between an embedding store that fits in cluster memory and one that
doesn't at 100 TB.

Spark-first shape:

- **fit** (:func:`fit_pq`): all m subspace Lloyd chains advance
  together — per round ONE map-only assignment scan (the m argmins
  share the row read) and ONE (subspace, code, dim) map-side-combinable
  aggregation updates every codebook, bit-identical to m independent
  :func:`operators.kmeans.kmeans_iterations` runs (which is what the
  oracle unrolls); centroids stay driver-side (m × ksub × dsub doubles).
- **encode** (:func:`pq_encode`): ONE map-only pass — all m codebooks
  ride in as a single broadcast row and every subspace argmin is a pure
  column expression (numeric zip_with/aggregate folds stay efficient in
  pyspark; it is per-token string HOFs that fall out of codegen). No
  shuffle: the encoded corpus keeps its scan partitioning, ready to be
  written cell-partitioned next to an IVF index.
- **query** (:func:`pq_adc_topk`): asymmetric distance computation —
  each (query, row) pair sums m per-subspace squared L2 terms between
  the query subvector and the row's CODEWORD (never the original
  vector, which is the whole point: the index serves from codes). The
  per-query top-k is a window row_number, which Catalyst executes as a
  partial top-k per partition (WindowGroupLimit) before shuffling only
  k rows per query.

Determinism contract (what makes an iterative float algorithm
oracle-checkable): subspace Lloyd rounds inherit the decimal-quantized
centroid updates of ``kmeans_iterations``; ADC per-subspace terms are
computed in double with a fixed ascending-dim fold order, ROUNDed to 6
dp, CAST to DECIMAL, and summed as decimals — decimal addition is
associative, so the 4-term sum is bit-identical in any engine
regardless of evaluation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from de_polars_spark.functions import vectors as VX
from de_polars_spark.functions.local_relation import values_df


def fit_pq(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    seeds_full: list[list[float]],
    m: int,
    dsub: int,
    iterations: int = 1,
) -> list[list[list[float]]]:
    """Fit ``m`` subspace codebooks; returns ``codebooks[j][c][i]``.

    ``seeds_full`` are full-dim seed vectors (one per codeword); each
    subspace seeds from its own slice, so the fit is reproducible from
    the same deterministic seed rule the IVF fit uses.

    All m subspace Lloyd rounds advance TOGETHER: per iteration, one
    map-only scan assigns every subspace's code (the m argmins share
    the row read), and ONE (subspace, code, dim) aggregation updates
    every codebook — m chains for the price of one shuffle per round,
    independent of m. The decimal-quantized mean is computed over
    exactly the rows a per-subspace chain would see, so the result is
    bit-identical to m independent ``kmeans_iterations`` runs (which
    is what the DuckDB oracle unrolls). At 100 TB you would fit on a
    Bernoulli sample — nothing here scans more than ``corpus`` once
    per round.
    """
    spark = corpus.sparkSession
    vecs = corpus.select(
        F.col(id_col), VX.as_double(F.col(vec_col)).alias("__v")
    )
    codebooks = [
        [list(map(float, s[j * dsub : (j + 1) * dsub])) for s in seeds_full]
        for j in range(m)
    ]
    for _ in range(iterations):
        cdf = _codebook_row(spark, codebooks)
        df = vecs.crossJoin(F.broadcast(cdf))
        assigned = df.select(
            "__v",
            F.array(
                *[_argmin_code(j, dsub) for j in range(m)]
            ).alias("__cs"),
        )
        sub_ix = F.floor(F.col("d") / F.lit(dsub)).cast("int")
        per = (
            assigned.select(
                "__cs", F.posexplode("__v").alias("d", "val")
            )
            .select(
                sub_ix.alias("sub"),
                (F.col("d") % dsub).cast("int").alias("i"),
                F.element_at(F.col("__cs"), sub_ix + 1).alias("cid"),
                "val",
            )
            .groupBy("sub", "cid", "i")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,6)")).cast("double")
                    / F.count("*")
                ).alias("mn")
            )
        )
        new = [[cw[:] for cw in cb] for cb in codebooks]
        for r in per.collect():
            new[r["sub"]][r["cid"]][r["i"]] = r["mn"]
        codebooks = new
    return codebooks


def _argmin_code(j: int, dsub: int):
    """Nearest codeword in subspace ``j`` of the broadcast ``__cb`` row
    for the ``__v`` vector; ties to the lower code id."""
    sub = F.slice(F.col("__v"), j * dsub + 1, dsub)
    dists = F.transform(F.col("__cb")[j], lambda cw: _sub_sqdist(sub, cw))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _codebook_row(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """All codebooks as ONE broadcast row (m × ksub × dsub doubles).

    As data, not literals: literal arrays would re-compile the codegen'd
    argmin expression whenever the codebooks change (same lesson as
    ``kmeans._with_assignment``). VALUES-backed (not createDataFrame) so
    execution never enters a Python worker — local_relation.py."""
    payload = [[[float(x) for x in cw] for cw in cb] for cb in codebooks]
    return values_df(spark, [(payload,)], "__cb array<array<array<double>>>")


def _sub_sqdist(sub_vec, codeword):
    return F.aggregate(
        F.zip_with(sub_vec, codeword, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """``(id, code_0..code_{m-1})``: nearest codeword per subspace.

    Map-only — one scan, zero shuffles; ties break to the lower code id
    (array_position of the array_min), mirroring the k-means assignment
    rule so the oracle's ROW_NUMBER argmin agrees exactly."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    cdf = _codebook_row(corpus.sparkSession, codebooks)
    out = corpus.select(
        F.col(id_col), VX.as_double(F.col(vec_col)).alias("__v")
    ).crossJoin(F.broadcast(cdf))
    for j in range(m):
        out = out.withColumn(f"code_{j}", _argmin_code(j, dsub))
    return out.drop("__v", "__cb")


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    k: int = 3,
) -> DataFrame:
    """Asymmetric-distance top-k per query over the ENCODED corpus.

    ``codes`` is :func:`pq_encode` output; ``queries`` holds raw
    vectors (queries are few — they broadcast). The distance read per
    corpus row touches only m ints + the broadcast codebooks, never the
    original embedding: this is what serving from a compressed index
    means. Output: ``(query_id, neighbor_id, adist DOUBLE — the exact
    decimal sum cast at the output edge, rank)``, ascending distance, ties to the lower neighbor id.
    """
    m, dsub = len(codebooks), len(codebooks[0][0])
    cdf = _codebook_row(codes.sparkSession, codebooks)
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            VX.as_double(F.col(vec_col)).alias("__qv"),
        )
        .crossJoin(F.broadcast(cdf))
    )
    scored = codes.join(
        F.broadcast(q), F.col("query_id") != F.col(id_col)
    )
    total = _adc_total(m, dsub)
    scored = scored.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        total.cast("decimal(38,6)").cast("double").alias("adist"),
    )
    return _rank_by_adist(scored, k)


def _adc_total(m: int, dsub: int):
    """ADC distance over the row's codes: per-subspace squared L2 terms
    between the ``__qv`` slice and the ``__cb`` codeword picked by
    ``code_j``, ROUNDed to 6 dp, summed as decimals (order-free)."""
    terms = [
        F.round(
            _sub_sqdist(
                F.slice(F.col("__qv"), j * dsub + 1, dsub),
                F.col("__cb")[j][F.col(f"code_{j}")],
            ),
            6,
        ).cast("decimal(28,6)")
        for j in range(m)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def _rank_by_adist(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


def ivfpq_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """The full serving index in ONE scan: ``(id, cell, code_0..m-1)``.

    IVF-PQ is the canonical 100 TB ANN architecture (an inverted file
    partitions the corpus so a query touches nprobe cells; PQ shrinks
    what each cell stores from D doubles to m bytes). Both assignments
    are pure column expressions over the same row read — coarse cell
    (cosine argmax vs the broadcast-literal centroids, the exact
    ``similarity.ivf_topk`` rule) and the m code argmins — so the index
    build is map-only: zero shuffles until the ``partitionBy(cell)``
    write a production deployment would follow with.
    """
    from de_polars_spark.operators.similarity import _centroid_scores

    m, dsub = len(codebooks), len(codebooks[0][0])
    cdf = _codebook_row(corpus.sparkSession, codebooks)
    out = (
        corpus.select(F.col(id_col), VX.as_double(F.col(vec_col)).alias("__v"))
        .crossJoin(F.broadcast(cdf))
        .withColumn("__vn", VX.norm(F.col("__v")))
        .withColumn(
            "cell",
            F.element_at(
                _centroid_scores(F.col("__v"), centroids, F.col("__vn")), 1
            )["cid"],
        )
    )
    for j in range(m):
        out = out.withColumn(f"code_{j}", _argmin_code(j, dsub))
    return out.drop("__v", "__vn", "__cb")


def ivfpq_topk(
    index: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    codebooks: list[list[list[float]]],
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """ADC top-k over an :func:`ivfpq_index` — probe ``nprobe`` nearest
    cells per query (cosine, the ``ivf_topk`` probe rule), then score
    ONLY the candidates inside them, from their codes alone. Per query
    the work is nprobe inverted lists × m code lookups — independent of
    corpus size once the index is cell-partitioned."""
    from de_polars_spark.operators.similarity import _centroid_scores

    m, dsub = len(codebooks), len(codebooks[0][0])
    cdf = _codebook_row(index.sparkSession, codebooks)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        VX.as_double(F.col(vec_col)).alias("__qv"),
    )
    q = (
        q.select("query_id", "__qv", VX.norm(F.col("__qv")).alias("__qn"))
        .select(
            "query_id",
            "__qv",
            F.explode(
                F.slice(
                    _centroid_scores(F.col("__qv"), centroids, F.col("__qn")),
                    1,
                    nprobe,
                )
            ).alias("__probe"),
        )
        .select("query_id", "__qv", F.col("__probe")["cid"].alias("cell"))
        .crossJoin(F.broadcast(cdf))
    )
    scored = index.join(
        F.broadcast(q),
        (index["cell"] == q["cell"]) & (F.col("query_id") != F.col(id_col)),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _adc_total(m, dsub).cast("decimal(38,6)").cast("double").alias("adist"),
    )
    return _rank_by_adist(scored, k)
