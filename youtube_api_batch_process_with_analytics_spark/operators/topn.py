"""Top-N-per-group (reference T1).

The reference slices ``videos[:N]`` trusting RSS document order
(youtube_api_handler.py:536,940,974). The engine makes that an explicit
deterministic ranking window: partition by the group key, order by recency
descending with a unique-id tie-break.

Scale note: ``row_number`` over a partitioned window is a single shuffle on
the group key; with millions of groups the work distributes evenly (no
global sort). For heavily skewed groups Spark's AQE handles the stragglers;
a per-group N filter short-circuits the rest of the pipeline to N rows per
group before any further join/agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the first ``n`` rows per group under a deterministic order.

    ``order_cols`` must end with a unique tie-break column for determinism
    (SURVEY.md §7.5 'Top-N order').
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )
