"""Iterative clustering over embeddings: Lloyd's k-means expressed as
repeated DataFrame joins/aggregations — the IVF coarse quantizer for
similarity search at scale (SURVEY north-star: "IVF or LSH-bucketed variant
as the scale path"; the LSH variant is d3_ann_lsh_bucketed).

Exactness (upgraded from the rows-only check this query shipped with):
the loop runs entirely on the integer-micro grid — embeddings quantize to
``xu = floor(x * 1e6 + 0.5)`` (the d3_pca_* / d6_markov_stationary
discipline), so every distance is an EXACT int64, every per-cluster sum an
exact decimal, and the centroid update requantizes through one
correctly-rounded double division + ``floor(s/n + 0.5)`` — the identical
IEEE expression on both engines. That makes the full fixed-point loop
replayable as unrolled DuckDB CTEs and the query exactly oracle-checked;
ties in assignment break on centroid id on both sides (numpy ``argmin``
returns the first minimal index; the oracle ranks ``(d2, cid)``).

Numeric headroom (documented bounds, asserted nowhere because they are
static): |xu| <= ~2e6 for any |x| <= 2, so per-pair d2 <= 64 * (4e6)^2
~ 1e15 fits int64 with 4 orders to spare; per-cluster within-SS sums ride
DECIMAL(38,0)/HUGEINT and convert to double only at the end — keep that
conversion under 2^53 (true through sf0.1 by ~6x; at larger corpora scale
the micro grid down, same knob as the PCA matvec).

Scale shape per iteration: one broadcast of k centroids (k*dim int64 — KB
at any realistic k), one scan of the corpus computing argmin distance in an
Arrow-batched int64 kernel, one partial+final aggregation on k keys. No
driver-side loops over data — only over the k centroid rows collected per
iteration (k is a model hyperparameter, not data-sized).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

K = 8
N_ITER = 3  # demonstration default; convergence tested separately
DIM = 64


def _kmeans_k_budget() -> int:
    """Fail-loud ceiling on k (VERDICT r8 ask #2). ``kmeans_fit`` collects
    k centroid rows to the driver per iteration and ships k*dim int64
    through the task closure — KB at any pinned k, but
    d3_semdedup_cell_blocked derives k = n/128 from DATA, so at 10^9
    vectors the "k rows only" comments silently become ~8 M rows / ~4 GB.
    The budget makes that cliff explicit instead of an executor OOM:
    generous default (65,536 centroids = 32 MB of closure at dim 64,
    far past the SemDeDup paper's own production shape of 11k fixed cells
    for 234 M docs), SPARK_GRAFT_KMEANS_K_BUDGET overrides for a cluster
    with more driver headroom."""
    import os

    raw = os.environ.get("SPARK_GRAFT_KMEANS_K_BUDGET")
    return int(raw) if raw is not None else 65_536


def quantize_micros(e: DataFrame) -> DataFrame:
    """(vec_id, label, xu: array<long>) — embeddings on the integer-micro
    grid, the exact same expression as the oracle's ``ex`` CTEs."""
    xu = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast(
            "long"
        ),
    )
    return e.select("vec_id", "label", xu.alias("xu"))


def kmeans_assign(
    vectors: DataFrame, centroids: list[tuple[int, list[int]]]
) -> DataFrame:
    """Assign each vector to its nearest centroid (ties -> lowest id).

    Arrow-batched numpy kernel: a JVM expression formulation (k per-centroid
    zip_with folds chained through CASE) compiles a huge expression tree per
    iteration and ran 10x slower; batched argmin over a broadcast k x dim
    matrix is the shape that scales (centroids are KB-sized at any real k).
    All arithmetic is int64 — distances are exact, so the argmin is exact,
    and numpy returns the FIRST minimal index: ties deterministically go to
    the lowest centroid id."""
    import numpy as np
    import pandas as pd

    cmat = np.array([c for _, c in sorted(centroids)], dtype=np.int64)
    cids = np.array([cid for cid, _ in sorted(centroids)], dtype=np.int64)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["xu"].to_numpy()).astype(np.int64)
            # d2 = |v|^2 - 2 v.c + |c|^2 via exact integer matmul: the
            # expanded form needs O(batch*k) memory where the naive
            # (v - c) diff tensor needs O(batch*k*dim) — the difference
            # between 60 MB and 4 GB per batch once k is data-derived
            # (d3_semdedup_cell_blocked scales k ~ n/128). All terms stay
            # far inside int64 (|xu| <= ~2e6, dim 64 -> |v.c| <= 2.6e14),
            # so distances and the argmin remain exact.
            cross = v @ cmat.T
            d2 = (
                (v * v).sum(axis=1)[:, None]
                - 2 * cross
                + (cmat * cmat).sum(axis=1)[None, :]
            )
            best = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "xu": pdf["xu"],
                    "cluster": cids[best],
                    "d2": d2[np.arange(len(best)), best],
                }
            )

    return vectors.mapInPandas(
        assign,
        schema="vec_id bigint, label int, xu array<bigint>, cluster bigint, d2 bigint",
    )


def kmeans_fit(vectors: DataFrame, k: int = K, n_iter: int = N_ITER):
    """Lloyd's iterations on micro-grid vectors (from ``quantize_micros``);
    returns (assignments DataFrame, objective list in micro^2 units).

    Objectives are exact Python ints. Note the update requantizes the mean
    to the micro grid, so the classic Lloyd monotonicity holds only up to
    the rounding perturbation: rounding moves each centroid at most 0.5
    micro per dimension, adding at most ``n * dim * 0.25`` micro^2 to the
    objective (parallel-axis theorem) — callers asserting monotonicity must
    allow that slack."""
    budget = _kmeans_k_budget()
    if k > budget:
        raise ValueError(
            f"kmeans_fit k={k} exceeds KMEANS_K_BUDGET={budget}: centroid "
            f"state is driver-collected and closure-shipped each iteration "
            f"(k*dim int64), so data-derived k (e.g. SemDeDup's n/128) is "
            f"unbounded in the limit. Pin k to a model hyperparameter (the "
            f"SemDeDup paper fixes 11k cells for 234M docs) or raise "
            f"SPARK_GRAFT_KMEANS_K_BUDGET on a driver with the headroom."
        )
    # Optimization-round r10 note: persisting ``vectors`` here was tried
    # (each Lloyd pass re-executes the input plan) and reverted — it
    # benched neutral on the standalone kmeans query (3.32 -> 3.48 s) and
    # was implicated in the d3_semdedup_cell_blocked in-suite regression
    # (7.0 -> 46 s with the r10 persists; see OPTIMIZATION_r10.md).
    first = (
        vectors.orderBy("vec_id").limit(k).collect()
    )  # k rows only, k <= KMEANS_K_BUDGET (fail-loud above)
    centroids = [(i, [int(x) for x in r["xu"]]) for i, r in enumerate(first)]
    dim = len(centroids[0][1])
    objectives: list[int] = []
    assigned = None
    for _ in range(n_iter):
        assigned = kmeans_assign(vectors, centroids)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.sum(F.element_at("xu", i + 1).cast("decimal(38,0)")).alias(
                        f"s{i}"
                    )
                    for i in range(dim)
                ],
                F.count("*").alias("n"),
                F.sum(F.col("d2").cast("decimal(38,0)")).alias("obj"),
            )
            .collect()
        )  # k rows — the only driver-side data each iteration (budgeted)
        objectives.append(sum(int(r["obj"]) for r in stats))
        by_cid = {int(r["cluster"]): r for r in stats}
        centroids = [
            (
                cid,
                [
                    # floor(s/n + 0.5) over exact ints < 2^53: the identical
                    # IEEE expression the oracle runs (CAST(s AS DOUBLE)/n)
                    int(math.floor(float(int(by_cid[cid][f"s{i}"]))
                                   / int(by_cid[cid]["n"]) + 0.5))
                    for i in range(dim)
                ],
            )
            if cid in by_cid
            else (cid, cu)  # empty cluster keeps its centroid
            for cid, cu in centroids
        ]
    return assigned, objectives


def _kmeans_oracle(k: int = K, n_iter: int = N_ITER, dim: int = DIM) -> str:
    """The full fixed-point loop as unrolled CTEs: a{t} assigns against
    c{t-1} (rank on (d2, cid) = numpy first-minimal argmin), c{t} requantizes
    the per-cluster mean with the LEFT JOIN keeping empty clusters' previous
    centroids — mirroring kmeans_fit step for step."""
    sql = f"""
        WITH exq AS (
            SELECT vec_id, i AS pos,
                   CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000
                              + 0.5) AS BIGINT) AS xu
            FROM embeddings, (SELECT unnest(range({dim})) AS i)
        ),
        seed AS (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}) f
        ),
        c0 AS (
            SELECT s.cid, e.pos, e.xu AS cu
            FROM seed s JOIN exq e ON e.vec_id = s.vec_id
        )"""
    for t in range(1, n_iter + 1):
        sql += f""",
        d{t} AS (
            SELECT e.vec_id, c.cid,
                   SUM((e.xu - c.cu) * (e.xu - c.cu)) AS d2
            FROM exq e JOIN c{t - 1} c ON c.pos = e.pos
            GROUP BY e.vec_id, c.cid
        ),
        a{t} AS (
            SELECT vec_id, cid, d2 FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
                FROM d{t}) r
            WHERE rn = 1
        )"""
        if t < n_iter:
            sql += f""",
        s{t} AS (
            SELECT a.cid, e.pos, SUM(CAST(e.xu AS HUGEINT)) AS s,
                   COUNT(*) AS n
            FROM a{t} a JOIN exq e ON e.vec_id = a.vec_id
            GROUP BY a.cid, e.pos
        ),
        c{t} AS (
            SELECT c.cid, c.pos,
                   CAST(COALESCE(
                       floor(CAST(s.s AS DOUBLE) / s.n + 0.5),
                       c.cu) AS BIGINT) AS cu
            FROM c{t - 1} c
            LEFT JOIN s{t} s ON s.cid = c.cid AND s.pos = c.pos
        )"""
    sql += f"""
        SELECT CAST(cid AS BIGINT) AS cluster,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(CAST(d2 AS HUGEINT)) AS DOUBLE) / 1000000000000.0
                   AS within_ss,
               MIN(vec_id) AS min_vec_id
        FROM a{n_iter}
        GROUP BY cid"""
    return sql


# --------------------------------------------------------------------------
# The final cluster assignment + per-cluster sizes and within-cluster
# spread, exactly oracle-checked (the whole loop is exact integer/IEEE
# arithmetic — see module docstring). within_ss converts the exact
# micro^2 sum to double at the very end (identical conversion both
# engines while the sum stays under 2^53).
@query("d3_kmeans_ivf_clusters", oracle=_kmeans_oracle())
def d3_kmeans_ivf_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = quantize_micros(load_table(spark, sf_dir, "embeddings"))
    assigned, _ = kmeans_fit(vectors)
    return assigned.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_vectors"),
        (
            F.sum(F.col("d2").cast("decimal(38,0)")).cast("double")
            / F.lit(1000000000000.0)
        ).alias("within_ss"),
        F.min("vec_id").alias("min_vec_id"),
    )
