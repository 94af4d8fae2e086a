"""Iterative clustering over embeddings: Lloyd's k-means expressed as
repeated DataFrame joins/aggregations — the IVF coarse quantizer for
similarity search at scale (SURVEY north-star: "IVF or LSH-bucketed variant
as the scale path"; the LSH variant is d3_ann_lsh_bucketed).

Iterative algorithms are the one place the driver contract allows a
rows-only check (no single SQL statement expresses a fixed-point loop), so
determinism is enforced structurally instead: centroids initialize from the
first k vectors by vec_id, every reduction is a decimal-exact sum, and ties
in assignment break on centroid id — two runs produce identical output, and
tests assert the k-means objective is non-increasing per iteration.

Scale shape per iteration: one broadcast of k centroids (k*dim doubles — KB
at any realistic k), one scan of the corpus computing argmin distance
JVM-side, one partial+final aggregation on k keys. No driver-side loops over
data — only over the k centroid rows collected per iteration (k is a model
hyperparameter, not data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

K = 8
N_ITER = 3  # demonstration default; convergence tested separately
DIM = 64


def kmeans_assign(
    vectors: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """Assign each vector to its nearest centroid (ties -> lowest id).

    Arrow-batched numpy kernel: a JVM expression formulation (k per-centroid
    zip_with folds chained through CASE) compiles a huge expression tree per
    iteration and ran 10x slower; batched argmin over a broadcast k x dim
    matrix is the shape that scales (centroids are KB-sized at any real k).
    numpy argmin returns the FIRST minimal index, so ties deterministically
    go to the lowest centroid id."""
    import numpy as np
    import pandas as pd

    cmat = np.array([c for _, c in sorted(centroids)], dtype=np.float64)
    cids = np.array([cid for cid, _ in sorted(centroids)])
    cnorm2 = (cmat * cmat).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            v = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ cmat.T) + cnorm2[None, :]
            best = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "e": pdf["e"],
                    "cluster": cids[best],
                    "dist2": d2[np.arange(len(best)), best],
                }
            )

    return vectors.mapInPandas(
        assign,
        schema="vec_id bigint, label int, e array<double>, cluster int, dist2 double",
    )


def kmeans_fit(vectors: DataFrame, k: int = K, n_iter: int = N_ITER):
    """Lloyd's iterations; returns (assignments DataFrame, objective list)."""
    first = (
        vectors.orderBy("vec_id").limit(k).collect()
    )  # k rows only — deterministic seed, not a data-sized collect
    centroids = [(i, list(r["e"])) for i, r in enumerate(first)]
    objectives: list[float] = []
    assigned = None
    for _ in range(n_iter):
        assigned = kmeans_assign(vectors, centroids)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.sum(F.element_at("e", i + 1).cast("decimal(27,6)")).alias(
                        f"s{i}"
                    )
                    for i in range(DIM)
                ],
                F.count("*").alias("n"),
                F.sum(F.col("dist2").cast("decimal(27,6)"))
                .cast("double")
                .alias("obj"),
            )
            .collect()
        )  # k rows — the only driver-side data each iteration
        objectives.append(sum(r["obj"] for r in stats))
        centroids = [
            (r["cluster"], [float(r[f"s{i}"]) / r["n"] for i in range(DIM)])
            for r in sorted(stats, key=lambda r: r["cluster"])
        ]
    return assigned, objectives


# --------------------------------------------------------------------------
# Rows-only entry (iterative fixed point — not single-statement SQL): the
# final cluster assignment + per-cluster sizes and within-cluster spread.
@query("d3_kmeans_ivf_clusters")
def d3_kmeans_ivf_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vectors = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    assigned, _ = kmeans_fit(vectors)
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.sum(F.col("dist2").cast("decimal(27,6)")).cast("double"), 6).alias(
            "within_ss"
        ),
        F.min("vec_id").alias("min_vec_id"),
    )
