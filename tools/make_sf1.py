"""Generate an sf1 fixture tier (~10x sf0.1) for scale-cliff checks.

The shipped testdata stops at sf0.1; the gate's sf0.01 → sf0.1 step is one
decade, and size-dependent cliffs (AQE plan flips, broadcast-threshold
crossings, skew blow-ups) like to hide one decade further out. This builds
sf1 inside the repo (gitignored — ~100 MB of parquet) by replicating sf0.1
ten times with consistent key offsets, so every join/FK relationship and
every modular query invariant (doc_id % 100 benchmark slice, vec_id % 50
query stride) survives:

- fact/dim keys shift by COPY_STRIDE per copy, consistently on both sides
  of every FK (lineitem↔orders↔customer, lineitem↔part/supplier,
  events.user_id, doc_id, vec_id); nation/region stay single-copy dims.
- document text gets a per-copy token suffix (every whitespace token ->
  token||i) and source a per-copy suffix: texts across copies then share
  no shingles and no blocking keys, so LSH buckets, jaccard blocks, and
  fingerprint posting lists stay copy-local — candidate volumes scale
  LINEARLY with the corpus like a real 10x crawl, instead of
  quadratically like naive row duplication would force.
- embeddings shift vec_id per copy and apply a per-copy SIGNED
  PERMUTATION of the dimensions (copy 0 = identity): an exact float32
  isometry, so within-copy cosines/norms/quantizations are bit-identical
  to the source tier while cross-copy twins land at incoherent angles —
  duplicate groups, LSH buckets, and k-means cells stay copy-local and
  embedding-family candidate volume scales linearly, matching the text
  side (round-10 verdict item 5).

Every table is written as a DIRECTORY of per-copy part files — the
multi-split scan shape a real cluster sees, which also exercises the
spread() no-op path end-to-end (tests/test_scale_plans.py pins the plan;
this tier pins it at the data level).

The correctness contract is unchanged: the gate compares Spark vs DuckDB
on the SAME files, so the tier needs no distributional fidelity to the
driver's generator — only schema fidelity and self-consistency.

Usage: python tools/make_sf1.py [out_dir] [copies]
    (defaults: <repo>/testdata_sf1, 10 copies = sf1; 30 copies = sf3 —
    the round-7 verdict's stretch tier for super-linearity checks on the
    heavy span/dedup/CC family)

Copy-tag collision note: with ≤10 copies the per-copy token suffix is a
single digit, and single-character suffixes are concatenation-unambiguous
(equal suffixed tokens ⇒ equal original token AND equal copy). Beyond 10
copies the tag zero-pads to a fixed 2 chars for the same property —
variable-width tags would let ('x1' + '2') collide with ('x' + '12') and
leak shingles across copies, bending candidate volume super-linear. The
10-copy tier keeps the round-7 single-digit byte layout.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
COPY_STRIDE = 10_000_000  # multiple of every modular invariant in queries

# table -> list of BIGINT key columns to offset per copy
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
SINGLE_COPY = ("region", "nation")  # bounded dims, FK targets unchanged


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    # fixed-width tags keep suffixed tokens concatenation-unambiguous at
    # ANY copy count (f"{i:02d}" alone breaks again at copies > 100);
    # ≤10 copies keeps the historical single-digit byte layout
    width = len(str(copies - 1))
    tag = (lambda i: str(i)) if copies <= 10 else (lambda i: f"{i:0{width}d}")
    con = duckdb.connect()
    for t in SINGLE_COPY:
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{d}/part_0.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEY_COLS.items():
        d = os.path.join(out, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        for i in range(copies):
            sel = ", ".join(
                f"{c} + {i * COPY_STRIDE} AS {c}" if c in keys else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet') TO "
                f"'{d}/part_{i}.parquet' (FORMAT PARQUET)"
            )
    # embeddings: offset vec_id AND apply a per-copy SIGNED PERMUTATION of
    # the vector dimensions (round-10 verdict item 5 — fixture realism).
    # Plain replication copied vectors unchanged, so every replicated
    # vector was an exact duplicate of its 9 cross-copy twins:
    # dedup_embedding_cosine's OUTPUT grew quadratically by its own
    # contract and the growth tripwire saturated on a fixture artifact.
    # A signed permutation is an exact ISOMETRY in float32 (values are
    # moved and negated, never recomputed): all WITHIN-copy inner
    # products, norms, cosines, and quantized values are bit-identical to
    # the source tier — copy 0 keeps the identity transform so its
    # vectors are byte-identical to sf0.1 — while CROSS-copy twins of the
    # same source vector land at incoherent angles (expected cosine ~0),
    # so duplicate groups, LSH buckets, and FITTED k-means cells (Lloyd
    # on the vectors themselves) stay copy-local and candidate volume
    # scales LINEARLY with the corpus, matching the text side's per-copy
    # token suffix. Deliberate exception (round-11 advice): the
    # PRE-ASSIGNED `label` column is replicated unchanged, so at sf1+
    # each label cell mixes 10 cross-copy vectors at incoherent angles —
    # label-keyed centroids (similarity.py's label-IVF) degenerate
    # toward zero. That is geometric incoherence by construction, NOT a
    # parity hazard (both engines read the same fixture); the copy-local
    # property is claimed only for structure derived from the vector
    # values. Deterministic: seeded per copy index, same tier bytes on
    # every regeneration.
    import random

    emb_src = f"{SRC}/embeddings.parquet"
    dim = con.execute(
        f"SELECT len(embedding) FROM '{emb_src}' "
        "WHERE embedding IS NOT NULL LIMIT 1"
    ).fetchone()[0]
    d = os.path.join(out, "embeddings.parquet")
    os.makedirs(d, exist_ok=True)
    for i in range(copies):
        if i == 0:
            vec_expr = "embedding"
        else:
            rng = random.Random(20260816 + i)
            perm = list(range(dim))
            rng.shuffle(perm)
            terms = ", ".join(
                f"{'-' if rng.random() < 0.5 else ''}embedding[{p + 1}]"
                for p in perm
            )
            vec_expr = (
                f"CASE WHEN embedding IS NULL OR len(embedding) <> {dim} "
                f"THEN embedding ELSE CAST([{terms}] AS FLOAT[]) END"
            )
        con.execute(
            f"""
COPY (
  SELECT vec_id + {i * COPY_STRIDE} AS vec_id,
         {vec_expr} AS embedding,
         label
  FROM '{emb_src}'
) TO '{d}/part_{i}.parquet' (FORMAT PARQUET)
"""
        )
    # documents: offset doc_id, suffix every token and the blocking key so
    # dedup/jaccard/contamination candidate volume scales linearly.
    # EXCEPTION: the fixed BM25 retrieval terms keep their surface form in
    # every copy — suffixing them emptied bm25_search's result at this
    # tier (rows 0/0, a vacuous gate row); exempting three single tokens
    # cannot create cross-copy 3-token shingles, so dedup/jaccard/
    # contamination candidate volume still scales linearly.
    from youtube_api_batch_process_with_analytics_spark.operators.ranking import (
        BM25_QUERY_TERMS,
    )

    keep = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    d = os.path.join(out, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    for i in range(copies):
        suffixed = (
            "array_to_string(list_transform("
            "regexp_split_to_array(text, '[\\t\\n\\x0b\\f\\r ]+'), "
            f"t -> CASE WHEN t IN ({keep}) THEN t ELSE t || '{tag(i)}' END), ' ')"
        )
        con.execute(
            f"""
COPY (
  SELECT doc_id + {i * COPY_STRIDE} AS doc_id,
         {suffixed} AS text,
         lang,
         source || '_{tag(i)}' AS source,
         CAST(LENGTH({suffixed}) AS BIGINT) AS n_chars
  FROM '{SRC}/documents.parquet'
) TO '{d}/part_{i}.parquet' (FORMAT PARQUET)
"""
        )
    sizes = {}
    for t in list(SINGLE_COPY) + list(KEY_COLS) + ["embeddings", "documents"]:
        sizes[t] = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{t}.parquet/*.parquet'"
        ).fetchone()[0]
    print({"out": out, "rows": sizes})


if __name__ == "__main__":
    main()
