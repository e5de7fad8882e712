"""Training-set construction inventory queries (round-4 additions).

Six operators a large-scale training-data pipeline runs between "corpus
cleaned" and "tokens served", complementing the dedup/quality family in
``llm_ops.py`` and the provenance family in ``corpus_ops.py``:

- ``dedup_containment`` — asymmetric shingle containment |A∩B|/|A|
  (the subset/quotation duplicates Jaccard-gated dedup misses);
- ``hard_negative_mining`` — per-anchor top-k nearest embeddings with a
  DIFFERENT label (the contrastive-training batch builder; random
  negatives are covered by ``negative_pair_sample``);
- ``embedding_int8_quant`` — per-dimension uint8 quantization
  parameters + exact reconstruction error (the 4x-store-shrink gate);
- ``embedding_centroid_silhouette`` — per-label separation from
  per-vector centroid affinities (label-quality gate before a
  contrastive run);
- ``tokenizer_fertility`` — per (source, lang) whitespace-vs-wordlike
  token fertility and chars/token (the mixture planner's cost model:
  token budgets are tokenizer-relative, and fertility is how a corpus
  slice's byte budget converts);
- ``curriculum_phase_plan`` — histogram-CDF tertile phase plan over
  document token counts (shortest-first curriculum; bucket-grain
  assignment so the plan costs one bounded shuffle at any corpus size).

Reference parity: none — beyond-parity LLM-pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de_polars_spark.functions import text as TX
from de_polars_spark.inventory.dialect_macros import render
from de_polars_spark.operators import dedup, similarity, vectors
from de_polars_spark.sources.registry import register_testdata

QUERIES: dict = {}
ORACLES: dict = {}

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_COS = (
    "ROUND(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


def _common(name: str, sql: str) -> None:
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_testdata(spark, sf_dir)
        return spark.sql(render(_sql, "spark"))

    fn.__name__ = f"q_{name}"
    QUERIES[name] = fn
    ORACLES[name] = render(sql, "duckdb")


# ---------------------------------------------------------------- #
# Asymmetric containment dedup                                      #
# ---------------------------------------------------------------- #
_CONT_T = 0.5
_CONT_N = 3


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_testdata(spark, sf_dir)
    return dedup.containment_pairs(
        t["documents"], "doc_id", "text", "lang",
        threshold=_CONT_T, shingle_n=_CONT_N,
    )


def _gram_list(n: int) -> str:
    gram = " || ' ' || ".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(n))
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len(toks) - {n - 1}), "
        f"i -> {gram})) ELSE []::VARCHAR[] END"
    )


QUERIES["dedup_containment"] = q_dedup_containment
ORACLES["dedup_containment"] = f"""
    WITH toks AS (SELECT doc_id, lang AS block, {_TOKS} AS toks FROM documents),
    post AS (
        SELECT doc_id, block, unnest({_gram_list(_CONT_N)}) AS g FROM toks
    ),
    sizes AS (SELECT doc_id, block, COUNT(*) AS n_sh FROM post GROUP BY 1, 2),
    inter AS (
        SELECT a.block, a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS n_common
        FROM post a JOIN post b ON a.block = b.block AND a.g = b.g
                               AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3
    ),
    scored AS (
        SELECT i.*, na.n_sh AS n_ia, nb.n_sh AS n_ib
        FROM inter i
        JOIN sizes na ON i.block = na.block AND i.ia = na.doc_id
        JOIN sizes nb ON i.block = nb.block AND i.ib = nb.doc_id
    )
    SELECT CASE WHEN n_ia < n_ib OR (n_ia = n_ib AND ia < ib)
                THEN ia ELSE ib END AS id_small,
           CASE WHEN n_ia < n_ib OR (n_ia = n_ib AND ia < ib)
                THEN ib ELSE ia END AS id_large,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(LEAST(n_ia, n_ib) AS BIGINT) AS n_small,
           CAST(GREATEST(n_ia, n_ib) AS BIGINT) AS n_large,
           ROUND(n_common / CAST(LEAST(n_ia, n_ib) AS DOUBLE), 6)
               AS containment
    FROM scored
    WHERE n_common / CAST(LEAST(n_ia, n_ib) AS DOUBLE) >= {_CONT_T}
"""


# ---------------------------------------------------------------- #
# Contrastive hard-negative mining                                  #
# ---------------------------------------------------------------- #
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_testdata(spark, sf_dir)
    corpus = t["embeddings"]
    anchors = corpus.filter(F.col("vec_id") % 100 == 0)
    out = similarity.hard_negative_topk(
        corpus, anchors, "vec_id", "embedding", "label", k=5
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


_QN_COS = _COS.format(a="q.v", b="e.v")
QUERIES["hard_negative_mining"] = q_hard_negative_mining
ORACLES["hard_negative_mining"] = f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               e.label AS neighbor_label, {_QN_COS} AS cosine
        FROM q JOIN e ON q.label <> e.label
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT scored.*, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, neighbor_id)
                   AS rank
        FROM scored
    ) ranked
    WHERE rank <= 5
"""


# ---------------------------------------------------------------- #
# int8 quantization profile                                         #
# ---------------------------------------------------------------- #
def q_embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_testdata(spark, sf_dir)
    return vectors.int8_quantization_profile(t["embeddings"], "embedding")


QUERIES["embedding_int8_quant"] = q_embedding_int8_quant
ORACLES["embedding_int8_quant"] = """
    WITH ex AS (
        SELECT i AS dim, v[i] AS val
        FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             unnest(generate_series(1, len(v))) AS u(i)
    ),
    stats AS (
        SELECT dim, MIN(val) AS vmin, MAX(val) AS vmax,
               CASE WHEN MAX(val) > MIN(val)
                    THEN (MAX(val) - MIN(val)) / 255.0 ELSE 1.0 END AS scale
        FROM ex GROUP BY dim
    ),
    err AS (
        SELECT s.dim, s.vmin, s.vmax, s.scale,
               s.vmin + LEAST(255.0, GREATEST(0.0,
                   FLOOR((e.val - s.vmin) / s.scale + 0.5))) * s.scale - e.val
                   AS err
        FROM ex e JOIN stats s ON e.dim = s.dim
    )
    SELECT CAST(dim - 1 AS BIGINT) AS dim,
           ROUND(vmin, 6) AS vmin,
           ROUND(vmax, 6) AS vmax,
           ROUND(scale, 6) AS scale,
           ROUND(CAST(SUM(CAST(err * err AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(*), 9) AS mse,
           ROUND(MAX(ABS(err)), 6) AS max_abs_err
    FROM err
    GROUP BY dim, vmin, vmax, scale
"""


# ---------------------------------------------------------------- #
# Centroid silhouette                                               #
# ---------------------------------------------------------------- #
def q_embedding_centroid_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = register_testdata(spark, sf_dir)
    return vectors.centroid_silhouette(t["embeddings"], "vec_id", "label", "embedding")


QUERIES["embedding_centroid_silhouette"] = q_embedding_centroid_silhouette
ORACLES["embedding_centroid_silhouette"] = """
    WITH ex AS (
        SELECT vec_id, label, i AS dim, v[i] AS val
        FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
             unnest(generate_series(1, len(v))) AS u(i)
    ),
    cent AS (
        SELECT clab, list(c ORDER BY dim) AS carr
        FROM (
            SELECT label AS clab, dim,
                   CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
                       AS c
            FROM ex GROUP BY 1, 2
        ) GROUP BY clab
    ),
    affin AS (
        SELECT v.vec_id, v.label, c.clab,
               ROUND(list_dot_product(v.arr, c.carr)
                     / (sqrt(list_dot_product(v.arr, v.arr))
                        * sqrt(list_dot_product(c.carr, c.carr))), 6) AS cos
        FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS arr
              FROM embeddings) v
        CROSS JOIN cent c
    ),
    per_vec AS (
        SELECT vec_id, label,
               MAX(CASE WHEN clab = label THEN cos END) AS self_cos,
               MAX(CASE WHEN clab <> label THEN cos END) AS best_other
        FROM affin GROUP BY 1, 2
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(CAST(self_cos AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_self_cos,
           ROUND(CAST(SUM(CAST(best_other AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_best_other_cos,
           ROUND((CAST(SUM(CAST(self_cos AS DECIMAL(38,6))) AS DOUBLE)
                  - CAST(SUM(CAST(best_other AS DECIMAL(38,6))) AS DOUBLE))
                 / COUNT(*), 6) AS separation
    FROM per_vec GROUP BY label
"""


# ---------------------------------------------------------------- #
# Tokenizer fertility by corpus slice                               #
# ---------------------------------------------------------------- #
_common(
    "tokenizer_fertility",
    f"""
    WITH d AS (
        SELECT source, lang,
               ARRAY_LEN(TOKENS(text)) AS ws_toks,
               ARRAY_LEN(REGEXP_ALL(text, '{TX.WORDLIKE_PATTERN}'))
                   AS wl_toks,
               length(text) AS n_chars
        FROM documents
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws_toks) AS BIGINT) AS ws_tokens,
           CAST(SUM(wl_toks) AS BIGINT) AS wordlike_tokens,
           ROUND(SUM(wl_toks) / CAST(SUM(ws_toks) AS DOUBLE), 6)
               AS fertility,
           ROUND(SUM(n_chars) / CAST(SUM(wl_toks) AS DOUBLE), 6)
               AS chars_per_token
    FROM d GROUP BY source, lang
    """,
)


# ---------------------------------------------------------------- #
# Curriculum phase plan (histogram-CDF tertiles)                    #
# ---------------------------------------------------------------- #
# Shortest-first curriculum over document token counts, planned at the
# HISTOGRAM grain (same two-phase shape as quality_prune_plan): the
# per-(token-count) histogram is one map-side-combinable shuffle with
# bounded cardinality, and phase assignment walks its ascending CDF —
# a whole bucket takes the phase where its first document lands
# (floor(3 * docs_before / n_total)), so equal-length documents never
# straddle phases and no per-document rank is ever computed. Integer
# arithmetic throughout: engine-exact.
_common(
    "curriculum_phase_plan",
    """
    WITH scored AS (
        SELECT ARRAY_LEN(TOKENS(text)) AS n_tokens FROM documents
    ),
    hist AS (
        SELECT n_tokens, COUNT(*) AS n,
               CAST(COUNT(*) AS BIGINT) * n_tokens AS tok
        FROM scored GROUP BY n_tokens
    ),
    cume AS (
        SELECT n_tokens, n, tok,
               COALESCE(SUM(n) OVER (ORDER BY n_tokens
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_before,
               SUM(n) OVER () AS n_total
        FROM hist
    )
    SELECT CAST(IDIV(n_before * 3, n_total) + 1 AS INT) AS phase,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_doc_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_doc_tokens
    FROM cume
    GROUP BY 1
    """,
)
