"""The numpy GEMM kernel must agree with the fold-exact gated query.

`ann_cosine_topk` is the oracle-hash-matched baseline (sequential folds,
bit-identical to DuckDB). `cosine_topk_vectorized` is the production
kernel (Arrow batches + one matmul per batch). Summation order differs →
compare scores within 1e-9 and require identical neighbor rankings.
"""

from __future__ import annotations

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
