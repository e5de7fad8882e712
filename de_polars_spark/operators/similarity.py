"""Similarity search over an embedding column.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query set broadcast against the corpus (queries are small; the corpus
  scan is embarrassingly parallel, no corpus shuffle), then per-query
  top-k via window row_number (Catalyst plans a partial top-k per
  partition before the final shuffle of k rows per query).
- ``lsh_bucketed_topk``: the scale path — sign-bit LSH buckets shrink each
  query's candidate set to ~corpus/2^bits; same top-k afterwards. Recall
  trades off with bucket count; at 100 TB you'd add multi-probe (flip one
  bit) which is a UNION of bucket keys, not a new algorithm.
- ``ivf_topk``: the other classic scale path (IVF — inverted file index).
  A small centroid set partitions the corpus into cells; each query only
  scores the ``nprobe`` nearest cells. Cell assignment here is map-only:
  the centroids are baked into the plan as literal arrays (they are by
  construction tiny — the whole point of a coarse quantizer), so the
  corpus is never shuffled for assignment, and the candidate join keys on
  the cell id exactly like the LSH variant. At 100 TB you would fit the
  centroids with k-means (e.g. one MLlib pass over a sample) and persist
  the assigned corpus partitioned by cell; the deterministic sample-fit
  used here keeps the operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from de_polars_spark.functions import vectors as VX
from de_polars_spark.functions.local_relation import values_df


#: DataFrames persisted by operators in this module (the margin miner's
#: scored A x B relation feeds three consumers). Call
#: :func:`release_cached` between jobs in long sessions.
_SIM_PERSISTED: list = []


def release_cached() -> int:
    """Unpersist every relation cached by this module; returns the count."""
    n = 0
    while _SIM_PERSISTED:
        try:
            _SIM_PERSISTED.pop().unpersist()
            n += 1
        except Exception:
            pass
    return n


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector.

    Norms are precomputed per row on both sides so each of the Q×N pairs
    pays one dot-product fold, not three."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), VX.as_double(F.col(vec_col)).alias("cv")
    ).select("neighbor_id", "cv", VX.norm(F.col("cv")).alias("cn"))
    q = queries.select(
        F.col(id_col).alias("query_id"), VX.as_double(F.col(vec_col)).alias("qv")
    ).select("query_id", "qv", VX.norm(F.col("qv")).alias("qn"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                VX.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def _py_norm(vec: list) -> float:
    """Driver-side L2 norm with EXACTLY the fold's IEEE operation order.

    ``VX.norm`` over a literal array evaluates ``sqrt(aggregate(
    zip_with(a, a, x*y), 0.0, acc+x))`` — a sequential left fold seeded
    0.0. CPython floats are IEEE binary64 with no FMA, so the same
    multiply/add sequence yields the bit-identical double; folding the
    literal centroid norms here (instead of per ROW in the plan) changes
    nothing downstream."""
    import math

    acc = 0.0
    for x in vec:
        x = float(x)
        acc = acc + x * x
    return math.sqrt(acc)


def _centroid_scores(
    vec: "F.Column", centroids: list, vnorm: "F.Column | None" = None
) -> "F.Column":
    """Array of (cosine, cid) structs vs every centroid, sorted best-first.

    Struct comparison is lexicographic on (cos, cid), so ``sort_array``
    descending orders by cosine DESC then cid DESC — mirror that tiebreak
    in any oracle. Centroid vectors are plan literals: per-row work is
    ``nlist`` dot-product folds, no join, no shuffle.

    ``vnorm``: the (attribute) column holding ``VX.norm(vec)``. Passing
    it drops the per-centroid recomputation of the row norm (nlist folds
    -> 0; callers already materialize the norm for the scoring join);
    the centroid norms are folded driver-side (``_py_norm``) — together
    the per-row fold count falls from 3x nlist to nlist."""
    vn = VX.norm(vec) if vnorm is None else vnorm
    entries = []
    for cid, cvec in centroids:
        arr = F.array(*[F.lit(float(x)) for x in cvec])
        cos = VX.dot(vec, arr) / (vn * F.lit(_py_norm(cvec)))
        entries.append(
            F.struct(cos.alias("cos"), F.lit(int(cid)).cast("bigint").alias("cid"))
        )
    return F.sort_array(F.array(*entries), asc=False)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    ``centroids`` is a list of ``(cid, vector)`` pairs — the fitted coarse
    quantizer (driver-side; tiny by design). Corpus rows are assigned to
    their nearest centroid's cell (map-only, centroids inlined as plan
    literals); each query probes its ``nprobe`` nearest cells and scores
    only the candidates inside them."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), VX.as_double(F.col(vec_col)).alias("cv")
    )
    # norm first (own Project), THEN the centroid scores over the norm
    # ATTRIBUTE: CollapseProject keeps the non-cheap fold un-inlined, so
    # the row norm is computed once, not once per centroid
    c = c.select("neighbor_id", "cv", VX.norm(F.col("cv")).alias("cn")).select(
        "neighbor_id",
        "cv",
        "cn",
        F.element_at(
            _centroid_scores(F.col("cv"), centroids, F.col("cn")), 1
        )["cid"].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), VX.as_double(F.col(vec_col)).alias("qv")
    )
    q = q.select("query_id", "qv", VX.norm(F.col("qv")).alias("qn")).select(
        "query_id",
        "qv",
        "qn",
        F.explode(
            F.slice(_centroid_scores(F.col("qv"), centroids, F.col("qn")), 1, nprobe)
        ).alias("probe"),
    ).select("query_id", "qv", "qn", F.col("probe")["cid"].alias("cell"))
    scored = c.join(
        F.broadcast(q),
        (c["cell"] == q["cell"]) & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(VX.dot(q["qv"], c["cv"]) / (q["qn"] * c["cn"]), 6).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def fit_centroids_sample(
    corpus: DataFrame, id_col: str, vec_col: str, nlist: int, mod: int = 67, rem: int = 1
) -> list:
    """Deterministic sample 'fit' for the IVF coarse quantizer: the first
    ``nlist`` corpus vectors (by id) with ``id % mod == rem``. A stand-in
    for a k-means fit with identical downstream plumbing; collects only
    ``nlist`` rows to the driver."""
    rows = (
        corpus.filter(F.col(id_col) % mod == rem)
        .orderBy(F.col(id_col))
        .limit(nlist)
        .select(F.col(id_col).alias("cid"), VX.as_double(F.col(vec_col)).alias("cv"))
        .collect()
    )
    return [(r["cid"], list(r["cv"])) for r in rows]


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    path: str,
) -> None:
    """Persist a fitted IVF index as parquet artifacts under ``path``:
    ``postings/`` (cell-partitioned ``(neighbor_id, cv, cn)``) and
    ``centroids/`` (the coarse quantizer, ``(cid, cv)``).

    This turns ``ivf_topk``'s fit+assign+query into build-once /
    query-many — the shape a production embedding store needs: the
    assignment scan runs once, ``partitionBy(cell)`` lays each inverted
    list out as its own parquet partition (so a probe reads ONLY its
    cells — Spark prunes the partition dirs via dynamic partition
    pruning on the broadcast cell join), and per-vector norms are paid
    at build time, not per query."""
    import os

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), VX.as_double(F.col(vec_col)).alias("cv")
    ).select("neighbor_id", "cv", VX.norm(F.col("cv")).alias("cn")).select(
        "neighbor_id",
        "cv",
        "cn",
        F.element_at(
            _centroid_scores(F.col("cv"), centroids, F.col("cn")), 1
        )["cid"].alias("cell"),
    )
    # cluster by cell before the partitioned write: a partitionBy write
    # from an N-partition scan emits up to N files PER cell dir (a
    # 100 TB scan has thousands of partitions — tiny-file storm, slow
    # probes); repartition("cell") bounds it to one task's output per
    # cell, the contiguous inverted-list layout a probe reads. At bench
    # scale the scan is 1-3 partitions either way (A/B: 0.34s vs 0.44s
    # write) — this is for the write shape at scale, not local timing.
    c.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "postings")
    )
    # JVM-side VALUES relation: a createDataFrame here made this tiny
    # 8-row write cost ~5 s per build (Python worker round trip on the
    # pickled local relation) — functions/local_relation.py
    cdf = values_df(
        corpus.sparkSession,
        [(int(cid), [float(x) for x in cv]) for cid, cv in centroids],
        "cid bigint, cv array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def append_ivf_index(
    corpus: DataFrame, id_col: str, vec_col: str, path: str
) -> None:
    """Incrementally add vectors to a persisted IVF index — the
    maintenance path a production embedding store runs nightly: the
    coarse quantizer is FROZEN (loaded from the index, not refit), new
    vectors are assigned map-only against the broadcast centroids, and
    their postings APPEND as new files inside the existing cell
    partitions. No touched history, no shuffle of the old postings, no
    refit — the standard IVF trade-off that assignment quality decays
    as the corpus drifts from the fitted centroids (rebuild via
    ``build_ivf_index`` when recall drops)."""
    import os

    cents = sorted(
        (int(r["cid"]), list(r["cv"]))
        for r in corpus.sparkSession.read.parquet(
            os.path.join(path, "centroids")
        ).collect()
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), VX.as_double(F.col(vec_col)).alias("cv")
    ).select("neighbor_id", "cv", VX.norm(F.col("cv")).alias("cn")).select(
        "neighbor_id",
        "cv",
        "cn",
        F.element_at(
            _centroid_scores(F.col("cv"), cents, F.col("cn")), 1
        )["cid"].alias("cell"),
    )
    c.write.mode("append").partitionBy("cell").parquet(
        os.path.join(path, "postings")
    )


def compact_ivf_index(spark, path: str) -> dict:
    """Rewrite the postings of a persisted IVF index into one contiguous
    file per cell — the maintenance op a production embedding store runs
    after N incremental :func:`append_ivf_index` batches, each of which
    adds one small file per touched cell (the classic small-file storm:
    probe latency becomes file-open-bound, not scan-bound).

    Pure LAYOUT rewrite: rows, values, and cell assignment are
    untouched, so every query over the compacted index is bit-identical
    to the uncompacted one (the inventory entry proves it by reusing
    the append audit's oracle verbatim). Write path mirrors
    ``build_ivf_index``: repartition("cell") bounds output to one
    task's file per cell dir, staged into a tmp dir and swapped in.

    SWAP SEMANTICS, stated honestly: the swap is TWO directory renames
    (old→.pre-compact, tmp→postings), because a single rename cannot
    replace a non-empty directory on HDFS/posix. A reader in the
    instant between them sees a missing ``postings/`` and should
    retry; a crash in that window is RECOVERABLE — this function (and
    any caller) can detect ``.pre-compact`` with no ``postings/`` and
    restore it, which is exactly what the re-entry guard below does.
    A serving deployment that cannot tolerate the retry window should
    compact into a COPY and flip a pointer instead (the inventory
    entry's own shape).

    Returns ``{"files_before": int, "files_after": int}`` (data files
    only), counted through the Hadoop FileSystem API so the op works on
    any scheme, not just local disk.
    """
    import os

    from de_polars_spark.streaming import fsutil

    postings_dir = os.path.join(path, "postings")
    old = f"{postings_dir}.pre-compact"
    # crash recovery: a previous run that died between the two swap
    # renames left the data stranded in .pre-compact — restore it
    if not fsutil.exists(spark, postings_dir) and fsutil.exists(spark, old):
        fsutil.rename(spark, old, postings_dir)

    def _count_data_files(d: str) -> int:
        fs, jpath = fsutil._fs_path(spark, d)
        n = 0
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            name = it.next().getPath().getName()
            if not name.startswith(("_", ".")):
                n += 1
        return n

    before = _count_data_files(postings_dir)
    df = spark.read.parquet(postings_dir)
    tmp = f"{postings_dir}.compact-tmp"
    (
        df.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(tmp)
    )
    fsutil.delete(spark, old)
    fsutil.rename(spark, postings_dir, old)
    fsutil.rename(spark, tmp, postings_dir)
    fsutil.delete(spark, old)
    return {"files_before": before, "files_after": _count_data_files(postings_dir)}


def load_ivf_index(spark, path: str) -> tuple[list, DataFrame]:
    """Load a persisted IVF index: ``(centroids, postings)``.

    Centroids come back driver-side (tiny by construction, exact float64
    parquet round-trip); postings stay a cell-partitioned DataFrame."""
    import os

    cents = sorted(
        (int(r["cid"]), list(r["cv"]))
        for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
    )
    postings = spark.read.parquet(os.path.join(path, "postings"))
    return cents, postings


def ivf_topk_from_index(
    postings: DataFrame,
    centroids: list,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """IVF top-k served from a persisted index (``build_ivf_index``).

    Identical output to ``ivf_topk`` over the same corpus and centroids —
    the index is just the materialized assignment — but the per-query
    cost drops to probing ``nprobe`` inverted lists; no corpus scan, no
    re-assignment, no norm recomputation."""
    q = queries.select(
        F.col(id_col).alias("query_id"), VX.as_double(F.col(vec_col)).alias("qv")
    )
    q = q.select("query_id", "qv", VX.norm(F.col("qv")).alias("qn")).select(
        "query_id",
        "qv",
        "qn",
        F.explode(
            F.slice(_centroid_scores(F.col("qv"), centroids, F.col("qn")), 1, nprobe)
        ).alias("probe"),
    ).select("query_id", "qv", "qn", F.col("probe")["cid"].alias("cell"))
    scored = postings.join(
        F.broadcast(q),
        (postings["cell"] == q["cell"]) & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            VX.dot(q["qv"], postings["cv"]) / (q["qn"] * postings["cn"]), 6
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def hard_negative_topk_ivf(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    centroids: list,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """:func:`hard_negative_topk` served through IVF cells — the scale
    composition its docstring promises ("swap the brute scan for the
    persisted IVF index and apply the same label filter to its probe
    output").

    The label-inequality predicate joins the CANDIDATE filter (before
    ranking), so per-anchor work is bounded by its ``nprobe`` cells'
    populations, never the corpus. ``nprobe >= nlist`` degenerates
    bit-for-bit to the exact miner (property-tested). Output schema
    matches the exact form: ``(query_id, neighbor_id, neighbor_label,
    cosine, rank)``.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        VX.as_double(F.col(vec_col)).alias("cv"),
    ).select(
        "neighbor_id", "neighbor_label", "cv", VX.norm(F.col("cv")).alias("cn")
    ).select(
        "neighbor_id",
        "neighbor_label",
        "cv",
        "cn",
        F.element_at(
            _centroid_scores(F.col("cv"), centroids, F.col("cn")), 1
        )["cid"].alias("cell"),
    )
    q = anchors.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        VX.as_double(F.col(vec_col)).alias("qv"),
    ).select(
        "query_id", "query_label", "qv", VX.norm(F.col("qv")).alias("qn")
    ).select(
        "query_id",
        "query_label",
        "qv",
        "qn",
        F.explode(
            F.slice(_centroid_scores(F.col("qv"), centroids, F.col("qn")), 1, nprobe)
        ).alias("probe"),
    ).select("query_id", "query_label", "qv", "qn", F.col("probe")["cid"].alias("cell"))
    scored = c.join(
        F.broadcast(q),
        (c["cell"] == q["cell"])
        & (F.col("query_label") != F.col("neighbor_label")),
    ).select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        F.round(VX.dot(q["qv"], c["cv"]) / (q["qn"] * c["cn"]), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rank")
    )


def margin_mutual_pairs_ivf(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    side_a,
    side_b,
    centroids: list,
    k: int = 4,
    margin_threshold: float = 1.0,
    nprobe: int = 2,
) -> DataFrame:
    """:func:`margin_mutual_pairs` routed through IVF cells — the scale
    path the exact form's docstring promises ("at corpus scale bucket
    both sides with the IVF index and score within probed cells").

    The exact miner scores the full A×B relation (a broadcast
    nested-loop — the one named scale-killer in the r4 audit). Here both
    sides are assigned to their nearest coarse-quantizer cell (map-only:
    centroids are plan literals, no shuffle), each row probes its
    ``nprobe`` nearest cells, and candidate pairs exist only where one
    side's probe hits the other side's cell. The candidate join keys on
    the CELL id, so at 100 TB it is a shuffle-hash join co-partitioned
    by cell — per-cell work is |A∩cell| × |B∩probe set|, bounded by the
    quantizer's balance, never |A|×|B|. Ranks, k-NN neighborhood
    averages, and the margin are computed over the probed candidate set
    (the standard FAISS-backed approximation in CCMatrix-scale mining).

    Exactness property: with ``nprobe >= nlist`` every row probes every
    cell, the candidate set IS A×B, and the output equals
    :func:`margin_mutual_pairs` bit-for-bit (same round-6 cosines, same
    tie-breaks) — the degeneracy gate ``tests/test_operators.py`` pins.

    Determinism matches the exact form: cosines round-6 before any
    comparison, cell assignment ties break to the higher cid
    (``_centroid_scores``), rank ties to the lower neighbor id, and the
    ANSI-safe margin guard emits NULL on a zero denominator.
    """
    def _side(side, suffix: str) -> DataFrame:
        v = f"v{suffix}"
        return (
            corpus.filter(F.col(label_col) == side)
            .select(
                F.col(id_col).alias(f"id{suffix}"),
                VX.as_double(F.col(vec_col)).alias(v),
            )
            .select(f"id{suffix}", v, VX.norm(F.col(v)).alias(f"n{suffix}"))
            .select(
                f"id{suffix}",
                v,
                f"n{suffix}",
                F.transform(
                    F.slice(
                        _centroid_scores(F.col(v), centroids, F.col(f"n{suffix}")),
                        1,
                        nprobe,
                    ),
                    lambda p: p["cid"],
                ).alias(f"probes{suffix}"),
            )
            .withColumn(f"cell{suffix}", F.element_at(f"probes{suffix}", 1))
        )

    a = _side(side_a, "_a")
    b = _side(side_b, "_b")
    cos = F.round(
        VX.dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
    ).alias("cosine")
    pairs_ab = (
        a.select("id_a", "v_a", "n_a", F.explode("probes_a").alias("probe"))
        .join(b.drop("probes_b"), F.col("probe") == F.col("cell_b"))
        .select("id_a", "id_b", cos)
    )
    pairs_ba = (
        b.select("id_b", "v_b", "n_b", F.explode("probes_b").alias("probe"))
        .join(a.drop("probes_a"), F.col("probe") == F.col("cell_a"))
        .select("id_a", "id_b", cos)
    )
    cand = (
        pairs_ab.withColumn("in_ab", F.lit(True))
        .withColumn("in_ba", F.lit(False))
        .unionByName(
            pairs_ba.withColumn("in_ab", F.lit(False))
            .withColumn("in_ba", F.lit(True))
        )
        # a pair probed from both directions is one candidate (cosines
        # are identical round-6 values — max is a no-op dedup)
        .groupBy("id_a", "id_b")
        .agg(
            F.max("cosine").alias("cosine"),
            F.max("in_ab").alias("in_ab"),
            F.max("in_ba").alias("in_ba"),
        )
    )
    cand = cand.persist()
    _SIM_PERSISTED.append(cand)
    wa = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    wb = Window.partitionBy("id_b").orderBy(F.col("cosine").desc(), F.col("id_a"))
    r_ab = cand.filter("in_ab").withColumn("rank_a", F.row_number().over(wa))
    r_ba = cand.filter("in_ba").withColumn("rank_b", F.row_number().over(wb))
    avg_a = (
        r_ab.filter(F.col("rank_a") <= k)
        .groupBy("id_a")
        .agg(
            (
                F.sum(F.col("cosine").cast("decimal(38,6)")).cast("double")
                / F.lit(float(k))
            ).alias("avg_a")
        )
    )
    avg_b = (
        r_ba.filter(F.col("rank_b") <= k)
        .groupBy("id_b")
        .agg(
            (
                F.sum(F.col("cosine").cast("decimal(38,6)")).cast("double")
                / F.lit(float(k))
            ).alias("avg_b")
        )
    )
    mutual = (
        r_ab.filter(F.col("rank_a") == 1)
        .select("id_a", "id_b", "cosine")
        .join(
            r_ba.filter(F.col("rank_b") == 1).select("id_a", "id_b"),
            ["id_a", "id_b"],
        )
    )
    denom = (F.col("avg_a") + F.col("avg_b")) / 2
    raw_margin = F.when(denom != 0.0, F.col("cosine") / denom)
    return (
        mutual.join(avg_a, "id_a")
        .join(avg_b, "id_b")
        .filter(raw_margin > margin_threshold)
        .select(
            "id_a",
            "id_b",
            "cosine",
            F.round("avg_a", 6).alias("avg_a"),
            F.round("avg_b", 6).alias("avg_b"),
            F.round(raw_margin, 6).alias("margin"),
        )
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    bucket_dims: tuple[int, ...] = (1, 17, 33, 49),
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    dims = list(bucket_dims)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        VX.as_double(F.col(vec_col)).alias("cv"),
        VX.sign_bucket(F.col(vec_col), dims).alias("bucket"),
    ).select("neighbor_id", "cv", "bucket", VX.norm(F.col("cv")).alias("cn"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        VX.as_double(F.col(vec_col)).alias("qv"),
        VX.sign_bucket(F.col(vec_col), dims).alias("bucket"),
    ).select("query_id", "qv", "bucket", VX.norm(F.col("qv")).alias("qn"))
    scored = (
        c.join(
            F.broadcast(q),
            (c["bucket"] == q["bucket"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                VX.dot(q["qv"], c["cv"]) / (q["qn"] * c["cn"]), 6
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    bucket_dims: tuple[int, ...] = (1, 17, 33, 49),
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own bucket PLUS every
    bucket at Hamming distance 1 (one sign bit flipped).

    The standard recall fix for sign-bit LSH (Lv et al. 2007): a true
    neighbor straddling one hyperplane lands one bit away, so probing the
    ``len(bucket_dims)`` adjacent buckets recovers it without adding hash
    tables. Cost: the query side explodes to ``1 + len(bucket_dims)``
    probe keys (queries are the small side — the corpus still carries ONE
    bucket per row and is never replicated), then the same bucket
    equi-join + per-query top-k as :func:`lsh_bucketed_topk`. The probe
    explosion is a UNION of bucket keys, not a new algorithm — at 100 TB
    the corpus-side layout (partitioned by bucket) is unchanged.
    """
    dims = list(bucket_dims)
    n_bits = len(dims)

    def flips(bucket):  # bucket: Column of '0'/'1' strings, len n_bits
        variants = [bucket]
        for i in range(1, n_bits + 1):
            flipped_bit = F.when(
                F.substring(bucket, i, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1"))
            variants.append(
                F.concat(
                    F.substring(bucket, 1, i - 1),
                    flipped_bit,
                    F.substring(bucket, i + 1, n_bits - i),
                )
            )
        return F.array_distinct(F.array(*variants))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        VX.as_double(F.col(vec_col)).alias("cv"),
        VX.sign_bucket(F.col(vec_col), dims).alias("bucket"),
    ).select("neighbor_id", "cv", "bucket", VX.norm(F.col("cv")).alias("cn"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        VX.as_double(F.col(vec_col)).alias("qv"),
        F.explode(flips(VX.sign_bucket(F.col(vec_col), dims))).alias("bucket"),
    ).select("query_id", "qv", "bucket", VX.norm(F.col("qv")).alias("qn"))
    scored = (
        c.join(
            F.broadcast(q),
            (c["bucket"] == q["bucket"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                VX.dot(q["qv"], c["cv"]) / (q["qn"] * c["cn"]), 6
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def hard_negative_topk(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor vector, the
    top-k most-similar corpus vectors carrying a DIFFERENT label — the
    negatives that actually move a contrastive loss (random negatives,
    :func:`~de_polars_spark.inventory.scale_ops` ``negative_pair_sample``,
    are mostly easy; training batches mined near the decision boundary
    converge far faster — the standard hard-negative recipe from dense
    retrieval, e.g. DPR/ANCE).

    Shape: identical to :func:`cosine_topk` — anchors ride a broadcast,
    the corpus scan is map-only, the label inequality joins the filter,
    so the only shuffle is the per-anchor top-k window on the scored
    pairs. At corpus scale swap the brute scan for the persisted IVF
    index (:func:`ivf_topk_from_index`) and apply the same label filter
    to its probe output; this exact form is the recall oracle for that
    composition.

    Output: ``(query_id, neighbor_id, neighbor_label, cosine, rank)``,
    ties broken by neighbor_id.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        VX.as_double(F.col(vec_col)).alias("cv"),
    ).select(
        "neighbor_id", "neighbor_label", "cv", VX.norm(F.col("cv")).alias("cn")
    )
    q = anchors.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        VX.as_double(F.col(vec_col)).alias("qv"),
    ).select("query_id", "query_label", "qv", VX.norm(F.col("qv")).alias("qn"))
    scored = c.join(
        F.broadcast(q), F.col("query_label") != F.col("neighbor_label")
    ).select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        F.round(
            VX.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "cosine", "rank")
    )


def margin_mutual_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    side_a,
    side_b,
    k: int = 4,
    margin_threshold: float = 1.0,
) -> DataFrame:
    """Margin-based mutual-nearest-neighbor alignment between two corpus
    slices — the bitext-mining criterion (Artetxe & Schwenk 2019): a
    pair (x ∈ A, y ∈ B) aligns when each is the other's top-1 neighbor
    AND their cosine stands out against both local neighborhoods,
    ``margin = cos(x,y) / ((avg_k(x→B) + avg_k(y→A)) / 2)``. Raw-cosine
    thresholds fail under hubness (some vectors are everyone's
    neighbor); the margin normalizes by the neighborhood level, which
    is what made large-scale parallel-corpus mining (CCMatrix/LASER)
    work. Same machinery aligns any two corpus slices by embedding:
    translated document pairs, code↔doc pairs, image↔caption.

    Shape: ONE scored A×B relation (B rides a broadcast; at corpus
    scale bucket both sides with the IVF index and score within probed
    cells), then both rank directions as two windows over the SAME
    relation — no second scoring pass — and two neighborhood-average
    aggregates bounded by |A| + |B| rows. Determinism: cosines round-6;
    neighborhood averages are decimal-quantized sums over exactly k
    ranked neighbors; top-1 ties break on neighbor id.

    Output: ``(id_a, id_b, cosine, avg_a, avg_b, margin)`` for mutual
    top-1 pairs with margin > ``margin_threshold``.

    PRECONDITION: vectors must be nonzero (norms divide; Spark's ANSI
    mode turns 0/0 into an error, same as every cosine operator in this
    module — filter zero vectors upstream). A zero-sum k-NN
    neighborhood (all-orthogonal cosines) is handled: its margin is
    NULL and the threshold filter drops it in both engines.
    """
    a = corpus.filter(F.col(label_col) == side_a).select(
        F.col(id_col).alias("id_a"), VX.as_double(F.col(vec_col)).alias("va")
    ).select("id_a", "va", VX.norm(F.col("va")).alias("na"))
    b = corpus.filter(F.col(label_col) == side_b).select(
        F.col(id_col).alias("id_b"), VX.as_double(F.col(vec_col)).alias("vb")
    ).select("id_b", "vb", VX.norm(F.col("vb")).alias("nb"))
    scored = a.crossJoin(F.broadcast(b)).select(
        "id_a",
        "id_b",
        F.round(
            VX.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
        ).alias("cosine"),
    )
    wa = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    wb = Window.partitionBy("id_b").orderBy(F.col("cosine").desc(), F.col("id_a"))
    ranked = scored.withColumn("rank_a", F.row_number().over(wa)).withColumn(
        "rank_b", F.row_number().over(wb)
    )
    ranked = ranked.persist()
    _SIM_PERSISTED.append(ranked)
    avg_a = (
        ranked.filter(F.col("rank_a") <= k)
        .groupBy("id_a")
        .agg(
            (
                F.sum(F.col("cosine").cast("decimal(38,6)")).cast("double")
                / F.lit(float(k))
            ).alias("avg_a")
        )
    )
    avg_b = (
        ranked.filter(F.col("rank_b") <= k)
        .groupBy("id_b")
        .agg(
            (
                F.sum(F.col("cosine").cast("decimal(38,6)")).cast("double")
                / F.lit(float(k))
            ).alias("avg_b")
        )
    )
    mutual = ranked.filter((F.col("rank_a") == 1) & (F.col("rank_b") == 1))
    # guard the zero-neighborhood denominator (all-orthogonal k-NN sets
    # sum to exactly 0): Spark's ANSI mode throws on x/0 where DuckDB
    # yields NULL — the when() makes both engines emit NULL, which the
    # threshold filter then drops identically
    denom = (F.col("avg_a") + F.col("avg_b")) / 2
    raw_margin = F.when(denom != 0.0, F.col("cosine") / denom)
    return (
        mutual.join(avg_a, "id_a")
        .join(avg_b, "id_b")
        # threshold on the RAW ratio (the rounded display value would
        # shift the boundary by up to 5e-7); the averages themselves are
        # engine-exact (decimal sum over exactly k terms / k)
        .filter(raw_margin > margin_threshold)
        .select(
            "id_a",
            "id_b",
            "cosine",
            F.round("avg_a", 6).alias("avg_a"),
            F.round("avg_b", 6).alias("avg_b"),
            F.round(raw_margin, 6).alias("margin"),
        )
    )
