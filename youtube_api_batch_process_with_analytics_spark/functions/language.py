"""Language-name resolution as a broadcast dimension join.

Reference: ``_get_full_language_name`` (youtube_api_handler.py:336-359) — a
dict lookup with a fallback chain: exact code → lowercase → base code before
'-' (en-US→en) → upper(code). The reference calls it per-record; the engine
expresses it as ONE broadcast left join against the language dimension with a
``coalesce`` fallback chain, so Catalyst plans a BroadcastHashJoin and the
lookup scales to any row count without per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def language_name_fallback(
    df: DataFrame,
    languages: DataFrame,
    code_col: str,
    out_col: str = "language_name",
) -> DataFrame:
    """Attach ``out_col`` resolving ``code_col`` through the fallback chain.

    ``languages`` must have columns ``id`` (code) and ``name``; it is tiny
    (83 rows in the reference's languagelist.json) so all three candidate
    joins broadcast.
    """
    code = F.col(code_col)
    lower = F.lower(code)
    base = F.substring_index(lower, "-", 1)

    dim = F.broadcast(
        languages.select(
            F.col("id").alias("_lang_id"), F.col("name").alias("_lang_name")
        )
    )

    out = (
        df.withColumn("_lc_lower", lower)
        .withColumn("_lc_base", base)
        .join(
            dim.select(
                F.col("_lang_id").alias("_k_exact"),
                F.col("_lang_name").alias("_n_exact"),
            ),
            F.col(code_col) == F.col("_k_exact"),
            "left",
        )
        .join(
            dim.select(
                F.col("_lang_id").alias("_k_lower"),
                F.col("_lang_name").alias("_n_lower"),
            ),
            F.col("_lc_lower") == F.col("_k_lower"),
            "left",
        )
        .join(
            dim.select(
                F.col("_lang_id").alias("_k_base"),
                F.col("_lang_name").alias("_n_base"),
            ),
            F.col("_lc_base") == F.col("_k_base"),
            "left",
        )
        .withColumn(
            out_col,
            F.coalesce(
                F.col("_n_exact"),
                F.col("_n_lower"),
                F.col("_n_base"),
                F.upper(code),
            ),
        )
    )
    drop = [c for c in out.columns if c.startswith(("_k_", "_n_", "_lc_"))]
    return out.drop(*drop)
