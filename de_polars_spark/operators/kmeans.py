"""Distributed k-means (Lloyd) iterations over an embedding column.

The classic corpus-clustering step (topic bucketing, IVF coarse-quantizer
fit, diversity sampling). Executed the way k-means actually distributes:
centroids are tiny (k x dim doubles) and live on the driver; each round

1. broadcasts the centroids (one k x dim array row) into a map-only
   assignment expression — every vector computes its squared L2 distance
   to the k centroids JVM-side (zip_with + fold, no Python) and takes
   the argmin in the same expression (array_position of the array_min;
   ties break to the lower centroid id), with NO shuffle;
2. re-computes centroids with the round's single shuffle: posexplode the
   assigned vectors to (cluster, dim, value) and aggregate per
   (cluster, dim) — map-side combinable, k*dim result rows collected
   back to the driver.

Scale: the only full-data operations are a map (assignment) and one
aggregation per round; nothing driver-side grows with the corpus.

Determinism contract: element arithmetic runs in double, the fold is
sequential over ascending dims (same in any engine), and centroid means
are decimal-quantized sums over counts — so every round's centroids are
bit-identical to an engine-independent reference, which is how the
DuckDB oracle checks this operator exactly despite it being iterative
and floating-point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from de_polars_spark.functions.local_relation import values_df


def _with_assignment(
    vecs: DataFrame, id_col: str, centroids: list[list[float]]
) -> DataFrame:
    """``vecs`` + a ``cid`` column: nearest centroid, ties to the lower cid.

    Centroids ride in as ONE broadcast row holding the k x dim array, NOT
    as literal arrays: literals change every round, which forces a fresh
    whole-stage-codegen compile of the distance expression per iteration —
    measured 5s/round of pure compilation. As data, the plan (and the
    generated code) is identical across rounds, so codegen caches.

    The argmin is a pure map-side expression (distances array ->
    array_position of its min, i.e. first/lowest cid on ties). The
    earlier shape — crossJoin to N x k rows + groupBy(id) argmin — paid
    an N x k SHUFFLE per round; this pays none, and because the
    assignment stays a column on ``vecs`` the centroid update needs no
    assignment join either. Per Lloyd round the only shuffle left is the
    map-side-combinable (cid, dim) aggregation.
    """
    spark = vecs.sparkSession
    # values_df, not createDataFrame: the Python-backed local relation
    # re-enters a Python worker on EVERY job that executes this lineage
    # (one per Lloyd round + the final assignment — measured seconds per
    # round of pure worker round-trip); the VALUES form is a JVM
    # LocalTableScan with the same codegen-stable data-not-expression
    # property (functions/local_relation.py)
    cdf = values_df(
        spark,
        [([[float(x) for x in c] for c in centroids],)],
        "__cs array<array<double>>",
    )
    dists = F.transform(
        F.col("__cs"),
        lambda c: F.aggregate(
            F.zip_with(F.col("__v"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (
        vecs.crossJoin(F.broadcast(cdf))
        .withColumn("__ds", dists)
        .withColumn(
            "cid",
            (F.array_position(F.col("__ds"), F.array_min("__ds")) - 1).cast("int"),
        )
        .drop("__cs", "__ds")
    )


def kmeans_iterations(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    seeds: list[list[float]],
    iterations: int = 2,
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iterations`` Lloyd rounds from ``seeds``.

    Returns (final assignment DataFrame ``(id, cid)``, final centroids).
    """
    vecs = corpus.select(
        F.col(id_col),
        # cast, not transform(x -> cast(x)): same element-wise widening,
        # but the Cast runs in codegen (ArrayTransform's lambda evaluates
        # interpreted) — functions/vectors.py as_double
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    centroids = [list(map(float, c)) for c in seeds]
    dim = len(centroids[0])
    for _ in range(iterations):
        per_dim = (
            _with_assignment(vecs, id_col, centroids)
            .select("cid", F.posexplode("__v").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(38,6)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
        )
        rows = per_dim.collect()
        new_centroids = [c[:] for c in centroids]
        for r in rows:
            new_centroids[r["cid"]][r["dim"]] = r["m"]
        centroids = new_centroids
        assert all(len(c) == dim for c in centroids)
    assigned = _with_assignment(vecs, id_col, centroids).select(
        id_col, F.col("cid")
    )
    return assigned, centroids
