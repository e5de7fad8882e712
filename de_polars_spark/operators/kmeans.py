"""Distributed k-means (Lloyd) iterations over an embedding column.

The classic corpus-clustering step (topic bucketing, IVF coarse-quantizer
fit, diversity sampling). Executed the way k-means actually distributes:
centroids are tiny (k x dim doubles) and live on the driver; each round

1. broadcasts the centroids as literal arrays into the assignment
   expression — every vector computes its squared L2 distance to the k
   centroids JVM-side (zip_with + fold, no Python) and keeps the argmin
   (ties broken by centroid id, so assignment is total);
2. re-computes centroids with one shuffle: posexplode the assigned
   vectors to (cluster, dim, value) and aggregate per (cluster, dim) —
   map-side combinable, k*dim result rows collected back to the driver.

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


def _assign(vecs: DataFrame, id_col: str, centroids: list[list[float]]) -> DataFrame:
    """(id, cid): nearest centroid per vector, ties to the lower cid.

    Centroids ride in as a broadcast DataFrame, NOT as literal arrays:
    literals change every round, which forces a fresh whole-stage-codegen
    compile of the (k x dim)-term distance expression per iteration —
    measured 5s/round of pure compilation. As data, the plan (and the
    generated code) is identical across rounds, so codegen caches.
    """
    spark = vecs.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, __c array<double>",
    )
    dist = F.aggregate(
        F.zip_with(F.col("__v"), F.col("__c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vecs.crossJoin(F.broadcast(cdf)).select(
        id_col, "cid", dist.alias("__d")
    )
    # min over (dist, cid) struct = argmin with lower-cid tiebreak
    return scored.groupBy(id_col).agg(
        F.min(F.struct("__d", "cid")).alias("__m")
    ).select(id_col, F.col("__m.cid").cast("int").alias("cid"))


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
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    centroids = [list(map(float, c)) for c in seeds]
    dim = len(centroids[0])
    assigned = _assign(vecs, id_col, centroids)
    for _ in range(iterations):
        per_dim = (
            assigned.join(vecs, id_col)
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
        assigned = _assign(vecs, id_col, centroids)
    return assigned, centroids
