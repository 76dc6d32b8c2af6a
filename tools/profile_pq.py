"""Stage-wise floor decomposition of the two PQ serving paths
(round-12 verdict item 7: ivf_pq_topk 1.32x / pq_adc_topk 1.51x DuckDB at
sf0.1 were the only untouched LLM paths above their twins — decide
whether the probed-cell join, the rerank, or a fixed per-query floor
dominates, and commit the measurement).

Times cumulative PREFIXES of each pipeline with the noop sink (min of N
warm reps, fits memoized by rep 1 — the bench's prepared-serving
convention), so stage cost = prefix[i] - prefix[i-1]:

  ivf_pq_topk:  cand | queries+probe | +adc shortlist | +rerank (full)
  pq_adc_topk:  codes | queries+tables | +adc shortlist | +rerank (full)

Usage: python tools/profile_pq.py <sf_dir> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from youtube_api_batch_process_with_analytics_spark.session import get_spark
from youtube_api_batch_process_with_analytics_spark.operators import clustering as cl


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def _ivf_prefixes(spark, sf_dir):
    """Rebuild ivf_pq_topk's stages verbatim (clustering.py:968)."""
    assigned, cents = cl._gate_kmeans(spark, sf_dir)
    books = cl._pq_fit(spark, sf_dir)
    width = cl.PQ_DIM // cl.PQ_M

    cand = assigned
    for m, bk in enumerate(books):
        cand = cand.withColumn(
            f"_sub{m}", F.slice("qvec", m * width + 1, width)
        ).withColumn(
            f"code_{m}", cl._int_assign_expr(bk, field="code", col=f"_sub{m}")
        )
    cand = cand.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cluster").alias("cell"),
        *[F.col(f"code_{m}") for m in range(cl.PQ_M)],
    )

    queries = cl._quantized(spark, sf_dir).filter(
        (F.col("vec_id") % cl.IVF_KM_QUERY_STRIDE == 0)
        & (F.col("vec_id") < cl.QUERY_ID_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec"))
    structs = ", ".join(
        f"named_struct('d', {cl._dist_sql(*cents[c], col='q_qvec')}, "
        f"'cell', {int(c)})"
        for c in sorted(cents)
    )
    probed_cells = F.expr(
        f"transform(slice(array_sort(array({structs})), 1, "
        f"{cl.IVF_KM_N_PROBE}), s -> s.cell)"
    )
    queries = queries.withColumn("_cells", probed_cells)
    for m, bk in enumerate(books):
        queries = queries.withColumn(
            f"_q{m}", F.slice("q_qvec", m * width + 1, width)
        ).withColumn(
            f"_dt{m}",
            F.array(
                *[
                    F.expr(cl._dist_sql(*bk[c], col=f"_q{m}"))
                    if c in bk
                    else F.lit(float("inf"))
                    for c in range(cl.PQ_K)
                ]
            ),
        )
    probed = queries.select(
        "query_id",
        "q_qvec",
        *[F.col(f"_dt{m}") for m in range(cl.PQ_M)],
        F.explode("_cells").alias("cell"),
    )

    pairs = F.broadcast(probed).join(cand, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = None
    for m in range(cl.PQ_M):
        term = F.element_at(F.col(f"_dt{m}"), F.col(f"code_{m}") + 1)
        adc = term if adc is None else adc + term
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    short = (
        pairs.withColumn("adc_dist", adc)
        .withColumn("_adc_rank", F.row_number().over(w_adc))
        .filter(F.col("_adc_rank") <= cl.IVF_PQ_SHORTLIST)
        .select("query_id", "q_qvec", "neighbor_id", "cell", "adc_dist")
    )
    full = cl.ivf_pq_topk(spark, sf_dir)
    return {"cand": cand, "probe": probed, "shortlist": short, "full": full}


def _adc_prefixes(spark, sf_dir):
    """Rebuild pq_adc_topk's stages verbatim (clustering.py:753)."""
    books = cl._pq_fit(spark, sf_dir)
    width = cl.PQ_DIM // cl.PQ_M
    codes = cl.pq_codes_query(spark, sf_dir)
    emb = cl._quantized(spark, sf_dir)
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < cl.QUERY_ID_CAP)
    ).select(F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec"))
    for m, cents in enumerate(books):
        queries = queries.withColumn(
            f"_q{m}", F.slice("q_qvec", m * width + 1, width)
        )
        tbl = F.array(
            *[
                F.expr(cl._dist_sql(*cents[c], col=f"_q{m}"))
                if c in cents
                else F.lit(float("inf"))
                for c in range(cl.PQ_K)
            ]
        )
        queries = queries.withColumn(f"_dt{m}", tbl)
    pairs = F.broadcast(
        queries.select(
            "query_id", "q_qvec", *[F.col(f"_dt{m}") for m in range(cl.PQ_M)]
        )
    ).crossJoin(codes.withColumnRenamed("vec_id", "neighbor_id")).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = None
    for m in range(cl.PQ_M):
        term = F.element_at(F.col(f"_dt{m}"), F.col(f"code_{m}") + 1)
        adc = term if adc is None else adc + term
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    short = (
        pairs.withColumn("adc_dist", adc)
        .withColumn("_adc_rank", F.row_number().over(w_adc))
        .filter(F.col("_adc_rank") <= 100)
        .select("query_id", "q_qvec", "neighbor_id", "adc_dist")
    )
    full = cl.pq_adc_topk(spark, sf_dir)
    return {"codes": codes, "tables": queries, "shortlist": short, "full": full}


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="profile_pq")
    # session warm-up (same as bench.py)
    _force(spark.range(1000).selectExpr("id", "id * 2 AS x"))
    para = spark.sparkContext.defaultParallelism
    _force(
        spark.range(0, para, 1, para).mapInPandas(
            lambda b: b, "id long"
        )
    )
    out: dict[str, dict[str, float]] = {}
    for qname, builder in (("ivf_pq_topk", _ivf_prefixes), ("pq_adc_topk", _adc_prefixes)):
        stages = builder(spark, sf_dir)  # rep-0 build pays the fit
        res: dict[str, float] = {}
        # construction (plan-assembly) cost of ONE full build, fits warm
        t0 = time.perf_counter()
        builder(spark, sf_dir)
        res["_plan_build"] = round(time.perf_counter() - t0, 3)
        for sname, df in stages.items():
            spark.sparkContext.setJobDescription(f"profile_pq {qname}:{sname}")
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _force(df)
                best = min(best, time.perf_counter() - t0)
            res[sname] = round(best, 3)
        out[qname] = res
        print(qname, json.dumps(res), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
