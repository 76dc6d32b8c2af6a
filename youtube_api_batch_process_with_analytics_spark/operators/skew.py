"""Skew-handling utilities: salted aggregation and salted join.

At 100 TB a handful of hot keys (one viral channel, one bot user) can put
an entire shuffle partition on one executor. Two standard remedies, both
pure DataFrame compositions:

- **salted aggregation**: two-phase — aggregate on (key, salt) first
  (spreads a hot key over S partial cells), then re-aggregate on key.
  Correct for any associative aggregate; costs one extra (tiny) shuffle.
- **salted join**: explode the small side S× with every salt value, salt
  the big side row-wise, join on (key, salt). The hot key's rows land on
  S partitions instead of one. AQE's skew-join split covers plain
  scan-fed sort-merge joins, but empirically (Spark 4.1, pinned by
  tests/test_scale_plans.py vs tests/test_sampling_ranking.py) it does
  NOT fire when a join input derives from an aggregate — the tf ⋈ df
  posting-list shape — so explicit salting is the portable form and the
  only option there, as well as for aggregations.

Salts derive from a deterministic hash of a row-unique column — results
are bit-identical to the unsalted plan, which the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_agg_count_sum(
    df: DataFrame,
    key: str,
    value_col: str,
    unique_col: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe count+sum per key. The partial aggregate on
    (key, salt) does the heavy reduction; the final shuffle moves at most
    n_salts rows per key."""
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_s"),
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").cast("double").alias("total"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated n_salts× — a hot join key spreads over n_salts partitions."""
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(unique_col)), F.lit(n_salts))
    )
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_exploded, [key, "_salt"]).drop("_salt")
