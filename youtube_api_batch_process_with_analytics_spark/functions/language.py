"""Language-name resolution as a codegen'd literal-map lookup.

Reference: ``_get_full_language_name`` (youtube_api_handler.py:336-359) — a
dict lookup with a fallback chain: exact code → lowercase → base code before
'-' (en-US→en) → upper(code). The reference holds the 83-entry
languagelist.json as an in-memory dict and calls it per record; the engine
does the same thing Spark-first: the dimension is collected once (it is
bounded — a language list, not data) and compiled into a literal ``map``
expression, so the whole fallback chain is a scalar ``coalesce`` inside
whole-stage codegen. Zero joins, zero shuffles, zero broadcasts on the probe
side — strictly cheaper at any scale than the 3-way broadcast-join
formulation, whose three differently-aliased dim subtrees defeat exchange
reuse and materialize the dimension three times per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Compiled map literals memoized per (session, dim logical plan): a language
# dimension is static within a run, and several formatter queries share the
# same dim, so the one collect job amortizes across the suite — the scalar
# analog of reusing one broadcast across stages.
_MAP_CACHE: dict[tuple[str, int], Column] = {}


def language_name_map(languages: DataFrame) -> Column:
    """Compile the language dimension into a literal map column.

    ``languages`` must have columns ``id`` (code) and ``name``. It is a
    bounded dimension (83 rows in the reference's languagelist.json), so one
    driver-side collect — the same materialization a broadcast would do —
    yields a constant the optimizer can fold. Null ids can never equal a
    non-null probe key (SQL join semantics), so they are dropped; ids are
    distinct-ed because map literals reject duplicate keys under ANSI mode.
    """
    key = (
        languages.sparkSession.sparkContext.applicationId,
        languages.semanticHash(),
    )
    cached = _MAP_CACHE.get(key)
    if cached is not None:
        return cached
    rows = (
        languages.select(F.col("id").cast("string"), F.col("name").cast("string"))
        .where(F.col("id").isNotNull())
        .dropDuplicates(["id"])
        .collect()
    )
    if not rows:
        # F.create_map() with no args yields map<void,void>; give it the
        # string type the lookups below expect.
        m = F.create_map().cast("map<string,string>")
    else:
        m = F.create_map(*[F.lit(x) for r in rows for x in (r["id"], r["name"])])
    _MAP_CACHE[key] = m
    return m


def language_name_fallback(
    df: DataFrame,
    languages: DataFrame,
    code_col: str,
    out_col: str = "language_name",
) -> DataFrame:
    """Attach ``out_col`` resolving ``code_col`` through the fallback chain
    exact → lower → base-before-'-' → upper(code); falsy codes (NULL or '')
    resolve to 'Unknown' like the reference's early return
    (youtube_api_handler.py:336-341)."""
    m = language_name_map(languages)
    code = F.col(code_col)
    # try_element_at, not element_at / m[key]: under ANSI mode (Spark 4
    # default) a plain map access throws on a missing key, and "missing"
    # is the normal case the fallback chain exists to handle.
    return df.withColumn(
        out_col,
        F.when(code.isNull() | (code == ""), F.lit("Unknown")).otherwise(
            F.coalesce(
                F.try_element_at(m, code),
                F.try_element_at(m, F.lower(code)),
                F.try_element_at(m, F.substring_index(F.lower(code), "-", 1)),
                F.upper(code),
            )
        ),
    )
