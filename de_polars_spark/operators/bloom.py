"""Engine-portable Bloom-filter join pre-filter.

The classic 100 TB shuffle-reduction pattern: build a Bloom filter over
the join keys of a *filtered* dimension (small after its predicate),
broadcast the bit set, and flag probe-side rows map-side BEFORE any
shuffle join — rows that cannot match never enter the exchange. Spark
itself injects this shape at runtime (``spark.sql.optimizer.runtime.
bloomFilter.enabled``, BloomFilterAggregate → might_contain); this
operator is the explicit, engine-reproducible version: positions come
from the md5-based :func:`~de_polars_spark.functions.text.hash60`, so an
external engine (the DuckDB oracle) reproduces the exact same bit set
and therefore the exact same false-positive rows.

Plan shape (audited):
- ``bloom_bits``: one shuffle (distinct over ≤ m positions) on a frame
  that is already small — at 100 TB the dimension side of a selective
  join is the small side by construction.
- ``bloom_flag``: k broadcast LEFT joins against the ≤ m-row bit table —
  map-only on the probe side, no shuffle, no explode, whole-stage
  codegen throughout. False negatives are impossible (asserted by the
  ``n_missed = 0`` column of the oracle-checked ``bloom_join_prefilter``
  inventory query, ``inventory/relational_ext.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from de_polars_spark.functions.text import hash60


def _position(key: Column, i: int, m: int) -> Column:
    """Bit position of hash i for a key — hash60 is non-negative, so
    plain ``%`` equals pmod and matches DuckDB's ``%`` exactly."""
    return hash60(F.concat(key.cast("string"), F.lit(f"#b{i}"))) % m


def bloom_bits(dim: DataFrame, key: str, m: int = 4096, k: int = 3) -> DataFrame:
    """Distinct Bloom bit positions (column ``pos``) for the dim keys.

    ≤ m rows regardless of dim size — always broadcastable.
    """
    positions = F.array(*[_position(F.col(key), i, m) for i in range(k)])
    return dim.select(F.explode(positions).alias("pos")).distinct()


def bloom_flag(
    probe: DataFrame, key: str, bits: DataFrame, m: int = 4096, k: int = 3,
    flag: str = "bloom_hit",
) -> DataFrame:
    """All probe rows plus a boolean ``flag``: every hash position set.

    k successive broadcast LEFT joins on distinct positions — each is a
    map-side BroadcastHashJoin that cannot duplicate rows. Filtering
    callers drop ``flag = false`` rows before their shuffle join.
    """
    out = probe
    hit = F.lit(True)
    for i in range(k):
        side = bits.select(F.col("pos").alias(f"_bpos{i}"))
        out = out.join(
            F.broadcast(side),
            _position(F.col(key), i, m) == F.col(f"_bpos{i}"),
            "left",
        )
        hit = hit & F.col(f"_bpos{i}").isNotNull()
    return out.withColumn(flag, hit).drop(*[f"_bpos{i}" for i in range(k)])
