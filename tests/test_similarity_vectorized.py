"""The numpy GEMM kernel must agree with the fold-exact gated query.

`ann_cosine_topk` is the oracle-hash-matched baseline (sequential folds,
bit-identical to DuckDB). `cosine_topk_vectorized` is the production
kernel (Arrow batches + one matmul per batch). Summation order differs →
compare scores within 1e-9 and require identical neighbor rankings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.operators.similarity import (
    ann_cosine_topk,
    cosine_topk_vectorized,
)


def test_vectorized_matches_fold(spark, sf_dir):
    base = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["label"], r["cosine"])
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    fast = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["label"], r["cosine"])
        for r in cosine_topk_vectorized(spark, sf_dir).collect()
    }
    assert base.keys() == fast.keys()
    for k, (nb, lab, cos) in base.items():
        nb2, lab2, cos2 = fast[k]
        assert nb2 == nb and lab2 == lab, (k, (nb, nb2))
        assert abs(cos2 - cos) <= 1e-9, (k, cos, cos2)

    t0_base = len(base)
    assert t0_base > 0


def test_ivf_gemm_shortlist_matches_expression_path(spark, sf_dir):
    """ann_ivf_topk's GEMM shortlist + fold-exact rerank must reproduce
    the expression-only reference BIT-FOR-BIT (it prunes with the kernel
    but re-scores survivors with the same fold expression; a shortlist
    that ever dropped a true top-k candidate would differ here and in the
    oracle gate)."""
    from youtube_api_batch_process_with_analytics_spark.operators.similarity import (
        ann_ivf_topk,
    )

    ref = sorted(
        tuple(r) for r in ann_ivf_topk(spark, sf_dir, gemm_shortlist=False).collect()
    )
    got = sorted(tuple(r) for r in ann_ivf_topk(spark, sf_dir).collect())
    assert len(ref) > 0
    assert got == ref


def test_vectorized_local_topk_bounds_shuffle_volume(spark, sf_dir):
    """The GEMM stage must emit only per-batch local top-(k+1) candidate
    rows into the ranking shuffle — not all |Q|×N pairs. Upper bound:
    n_arrow_batches × |Q| × (TOP_K + 1); with default Arrow batching the
    fixture yields ≤ one batch per partition."""
    from youtube_api_batch_process_with_analytics_spark.operators.similarity import (
        QUERY_STRIDE,
        TOP_K,
        _vectorized_scored,
    )
    from youtube_api_batch_process_with_analytics_spark.sources import (
        load_table,
        spread,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    n = emb.count()
    nq = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0).count()
    n_parts = emb.rdd.getNumPartitions()
    arrow_batch = int(
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    )
    n_batches = n_parts + n // max(arrow_batch, 1)

    shuffled = _vectorized_scored(spark, sf_dir).count()
    cap = n_batches * nq * (TOP_K + 1)
    assert shuffled <= cap, (shuffled, cap)
    # and the cut is real: far fewer rows than the full pair expansion
    assert shuffled < nq * n, (shuffled, nq * n)


def test_vectorized_bound_attestation_green(spark, sf_dir):
    """The gated attestation rows: full top-k per query, within bound."""
    from youtube_api_batch_process_with_analytics_spark.operators.similarity import (
        TOP_K,
        ann_vectorized_bound,
    )

    rows = ann_vectorized_bound(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_ranked == TOP_K, r
        assert r.vec_within_bound is True, r


def test_ivf_gemm_shortlist_survives_duplicate_vector_tie_class(spark, tmp_path):
    """Round-8 review finding: a batch whose candidates are one big class
    of IDENTICAL vectors (cos = 1.0 with the query for every member —
    the exact shape replicated-embedding corpora produce) must shortlist
    the class's LOWEST vec_ids, because that is how the exact path and
    the oracle break rounded-cosine ties. An unrounded argpartition with
    no id tie-break keeps arbitrary class members. 30 identical vectors
    in ONE file (one Arrow batch) > keep=10 forces the selection to
    actually decide."""
    from youtube_api_batch_process_with_analytics_spark.operators.similarity import (
        EMB_DIM,
        IVF_TOP_K,
        ann_ivf_topk,
    )

    base = [float((d % 7) + 1) for d in range(EMB_DIM)]
    rows = [(i, base, 1) for i in range(31)]  # vec_id 0 is the query
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )

    got = ann_ivf_topk(spark, str(tmp_path)).collect()
    ref = ann_ivf_topk(spark, str(tmp_path), gemm_shortlist=False).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))
    by_rank = {r["rank"]: r["neighbor_id"] for r in got}
    # the tie class must resolve to the lowest non-query ids, in order
    assert [by_rank[k] for k in range(1, IVF_TOP_K + 1)] == [1, 2, 3, 4, 5]
