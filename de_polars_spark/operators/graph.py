"""Distributed PageRank over an undirected pair graph.

Ranks nodes of the duplicate-pair graph (or any edge list) by link
centrality — in a dedup pipeline this surfaces the "template" documents
whose near-copies pervade the corpus (high-centrality cluster cores are
kept or studied; satellites are dropped).

Execution shape per iteration: one join of the rank frame against the
edge list on the source key + one groupBy on the destination key — the
same two-shuffle round as label propagation, with the edge relation
(degree-annotated) checkpointed once and reused. The bounded iteration
count chains lazily into a single linear plan executed by one final
action — no per-round driver job; for unbounded iteration counts,
re-introduce a lineage cut every ~10 rounds.

Determinism contract (cross-engine exactness): neighbor contributions
``pr(v)/deg(v)`` are doubles, so their sum order would leak into the
result — each contribution is quantized to DECIMAL(38,6) before the
sum (exact, order-free), and the damped update is rounded to 6dp. By
induction every iteration's ranks are bit-identical in any engine that
follows the same recipe (the DuckDB oracle unrolls the iterations as
chained CTEs — SQL forbids aggregation inside a recursive term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, pr) after ``iterations`` damped rounds from pr=1.0.

    Undirected: each pair contributes an edge in both directions.
    """
    sym = pairs.select(
        F.col(id_a).cast("bigint").alias("u"), F.col(id_b).cast("bigint").alias("v")
    )
    edges = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    edges = edges.repartition("u").localCheckpoint(eager=True)
    deg = edges.groupBy("u").agg(F.count("*").alias("deg"))

    # the damped update runs in EXACT decimal — rounding the new rank to
    # 6dp between rounds lands on .5e-7 ties where engines' tie-breaking
    # differs (observed: 7/363 rows off by exactly 1e-6). The
    # contribution pr/deg is quantized with pure IEEE double ops —
    # ``floor(pr/deg * 1e6 + 0.5)`` (division, multiply by an exact
    # power of ten, add, floor are all correctly rounded and therefore
    # bit-identical in any IEEE-754 engine) — NOT with a double→decimal
    # cast: Spark casts via the double's shortest decimal repr with
    # HALF_UP while DuckDB rounds the binary value, and the two disagree
    # exactly on the x.xxxxxx5 boundary (observed at sf0.001 on the
    # capped pair graph: 4/355 rows off by 1e-6 per round). Everything
    # after the integer-scaled contributions is exact decimal
    # arithmetic, converted to double (correctly rounded,
    # engine-independent) for the next division.
    #
    # One join + one aggregation per round, nothing else:
    # - the rank frame carries the node's OWN degree (pr/deg needs it),
    # - the edge list carries the DESTINATION's degree (deg_v, attached
    #   once before iterating), so the aggregate can transport it into
    #   the next rank frame via max() — (node, deg) is functionally
    #   dependent, max is transport not arithmetic — with no deg re-join.
    # Rounds chain lazily into one plan: 5 rounds is a shallow linear
    # chain over the checkpointed edge list, and a single final action
    # lets AQE plan the whole chain instead of paying an eager
    # checkpoint job per round.
    edges = edges.join(
        deg.select(F.col("u").alias("v"), F.col("deg").alias("__deg_v")), "v"
    )
    ranks = deg.select("u", F.lit(1.0).alias("pr"), "deg")
    base_d = F.expr(f"CAST({1.0 - damping:.8f} AS DECIMAL(9,8))")
    damp_d = F.expr(f"CAST({damping:.8f} AS DECIMAL(9,8))")
    micro_d = F.expr("CAST(0.000001 AS DECIMAL(7,6))")
    for _ in range(iterations):
        contrib = edges.join(ranks, "u").select(
            F.col("v").alias("node"),
            F.col("__deg_v"),
            # integer-scaled 6dp quantization in pure IEEE double ops
            # (floor(double) is BIGINT in Spark — the sum is exact)
            F.floor(F.col("pr") / F.col("deg") * F.lit(1000000.0) + F.lit(0.5))
            .alias("__c"),
        )
        ranks = (
            contrib.groupBy("node")
            .agg(
                F.sum("__c").alias("__s"),
                F.max("__deg_v").alias("deg"),
            )
            .select(
                F.col("node").alias("u"),
                (
                    base_d
                    + damp_d * F.col("__s").cast("decimal(18,0)") * micro_d
                )
                .cast("double")
                .alias("pr"),
                "deg",
            )
        )
    return ranks.select(F.col("u").alias("node"), "pr")
