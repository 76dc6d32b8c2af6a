"""K-means clustering over the embedding column (Lloyd iterations).

The clustering job `ann_ivf_topk`'s docstring defers to: IVF's coarse cells
at production scale come from k-means over the corpus embeddings, not from
pre-existing labels. This is that job, expressed Spark-first:

- **assign** (the data-sized step): each vector scores against all k
  centroids via a broadcast — a map-only pass over the corpus, no shuffle.
  Argmin by squared L2 with deterministic tie-break (lowest cluster id).
- **update** (the shuffle): posexplode assigned vectors and take the
  per-(cluster, dimension) mean through DECIMAL sums — one partial-
  aggregable shuffle keyed on (cluster, pos), exact and order-independent.
- **centroids live on the driver** between iterations (k×d doubles, bounded
  by construction — the same contract as Spark ML's KMeans, whose
  ``clusterCenters`` are driver-held). Each iteration is one job; lineage
  never stacks because the new centroids re-enter as literals.

Initialization is deterministic — cluster c starts as the mean of vectors
with ``vec_id % k == c`` (random-partition init, seeded by the stable id) —
so results are reproducible run-to-run and differentially testable against
a NumPy replica (tests/test_clustering.py).

Non-reference extension (training-pipeline clustering; pairs with
operators/similarity.py's IVF probe/search plumbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec_col: str, centroid_lit) -> F.Column:
    """Sequential-fold squared L2 distance (deterministic order)."""
    return F.aggregate(
        F.zip_with(F.col(vec_col), centroid_lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _mean_by_key(assigned: DataFrame, key_col: str) -> DataFrame:
    """Per-(key, dimension) mean via DECIMAL sums, rebuilt into arrays."""
    ex = assigned.select(key_col, F.posexplode("vec").alias("pos", "val"))
    flat = ex.groupBy(key_col, "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(30,10)")).cast("double")
            / F.count("*")
        ).alias("c")
    )
    return flat.groupBy(key_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )


def kmeans_assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Attach ``cluster`` (argmin squared-L2 centroid) to ``emb``.

    ``emb`` needs ``vec_id`` and a double-array ``vec`` column. The k
    centroids enter as literal arrays, so assignment is a map-only pass in
    codegen — the right shape for the data-sized step at any scale. Ties
    break to the lowest cluster id (min over (dist, cluster) structs).
    """
    dists = F.array(
        *[
            F.struct(
                _sq_dist("vec", F.array(*[F.lit(float(x)) for x in c])).alias(
                    "d"
                ),
                F.lit(i).alias("cluster"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return emb.withColumn("cluster", F.array_min(dists)["cluster"])


def kmeans_lloyd(emb: DataFrame, k: int = 8, n_iter: int = 5) -> DataFrame:
    """Deterministic Lloyd k-means; returns ``vec_id, cluster``.

    Fixed ``n_iter`` rounds (no convergence probe — determinism and a
    bounded job count beat saving one late iteration; Lloyd's inertia is
    monotone so extra rounds never hurt correctness).
    """
    emb = emb.select("vec_id", "vec")
    return kmeans_assign(emb, kmeans_centroids(emb, k, n_iter)).select(
        "vec_id", "cluster"
    )


def kmeans_centroids(emb: DataFrame, k: int = 8, n_iter: int = 5) -> list[list[float]]:
    """The final centroid matrix (k×d, driver-side) for downstream IVF use.

    Each round collects the k×d matrix to the driver — bounded, exactly
    what Spark ML's KMeans does with ``clusterCenters`` — and re-enters it
    as literals, so plan depth per round is constant (no lineage stacking).
    """
    emb = emb.select("vec_id", "vec")
    # Random-partition init seeded by the stable id: cluster c = mean of
    # vectors with vec_id % k == c.
    seeded = emb.withColumn("cluster", (F.col("vec_id") % k).cast("int"))
    centroids = _collect_centroids(_mean_by_key(seeded, "cluster"), k)
    for _ in range(n_iter):
        assigned = kmeans_assign(emb, centroids)
        centroids = _collect_centroids(_mean_by_key(assigned, "cluster"), k)
    return centroids


def _collect_centroids(cent_df: DataFrame, k: int) -> list[list[float]]:
    """Driver-side k×d matrix; a cluster that lost every member keeps no
    row — re-seed it from the first surviving centroid so k stays fixed
    (deterministic, mirrors Spark ML's keep-alive for empty clusters)."""
    rows = {r[0]: list(r[1]) for r in cent_df.collect()}
    if not rows:
        raise ValueError("no vectors to cluster")
    fallback = rows[min(rows)]
    return [rows.get(c, fallback) for c in range(k)]
