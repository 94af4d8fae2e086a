"""One-off ~sf1-equivalent dataset synthesis for empirical scale runs.

VERDICT r5 ask #3: tri-scale exactness (sf0.001/0.01/0.1) is proven, but
the 100 TB design claims were argued from plan shape only — this tool
makes them empirical by materializing a dataset 10x the bench scale and
timing the most expensive queries at both scales (tools/bench_scale.py).

The driver's seed-42 generator is not in this repo, so sf1 is synthesized
from the committed sf0.1 fixtures by KEY-SHIFTED REPLICATION (10 copies),
preserving the properties that drive plan cost while avoiding replication
artifacts:

- every entity keyspace scales 10x with foreign keys kept consistent
  inside each copy (custkey/orderkey/partkey/suppkey/user_id/doc_id/
  vec_id all shift by copy * (max+1)); region/nation stay fixed, like
  TPC-H dims;
- events keep their time span — 10x users at the same density per user,
  so per-user session/window state stays O(1) while the shuffled key
  count grows 10x (the scaling a cluster actually sees);
- document TEXTS are vocabulary-remapped per copy (every token gets a
  copy suffix), so copies are Jaccard-0 to each other — naive
  replication would make every doc a 10-way near-duplicate and inflate
  LSH candidate pairs ~45x, a data artifact, not a scaling fact;
  n_chars is recomputed after the remap;
- embedding VECTORS are circularly rotated by the copy index: naive
  replication makes every vector a 10-way EXACT duplicate, so semantic
  near-dup / ANN pair counts blow up ~45x (first measured run: 16.7x
  wall time on d3_semantic_dedup_clusters) — a data artifact; rotation
  preserves norms and the coordinate distribution while decorrelating
  copies.

Each table lands as a SINGLE parquet file named ``<table>.parquet`` —
the driver's layout — because the streaming file sources glob for that
exact file name (a part-file directory would stream zero rows).

Distortions to keep in mind when reading BENCH_SCALE.md: string-column
NDVs in lineitem stay constant (domain-bounded, correct), numeric NDVs
grow only with the keyspace, and the document vocabulary grows 10x
(real corpora grow sublinearly) — none of which change the plan shapes
under test.

Usage: python tools/gen_scale.py [out_dir]   (default /tmp/scale_sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10  # default; argv[2] overrides (r8: 100 for the sf10-equivalent)

# key columns shifted by copy * (max_key + 1); every other column rides
# along unchanged
KEY_SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]

# custkey/orderkey/... maxima must be consistent ACROSS tables referencing
# the same keyspace, so the shift modulus is the max over all referents
KEYSPACES: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
COL_TO_SPACE = {
    col: space for space, refs in KEYSPACES.items() for _, col in refs
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    from bigdatainvesttink_spark.io import load_table
    from bigdatainvesttink_spark.session import get_spark

    spark = get_spark("gen-scale")
    os.makedirs(out_dir, exist_ok=True)

    moduli: dict[str, int] = {}
    for space, refs in KEYSPACES.items():
        mx = 0
        for table, col in refs:
            v = (
                load_table(spark, SRC, table)
                .agg(F.max(col).alias("m"))
                .first()["m"]
            )
            mx = max(mx, int(v))
        moduli[space] = mx + 1

    copies_df = spark.range(copies).select(F.col("id").alias("__k"))

    def write_single_file(df, table: str) -> None:
        """One parquet FILE named <table>.parquet (driver layout —
        streaming sources pathGlobFilter on the exact file name)."""
        import glob
        import shutil

        stage = f"{out_dir}/_stage_{table}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dest = f"{out_dir}/{table}.parquet"
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        elif os.path.exists(dest):
            os.remove(dest)
        shutil.move(part, dest)
        shutil.rmtree(stage)

    for table in COPY_AS_IS:
        write_single_file(load_table(spark, SRC, table), table)
        print(f"{table}: copied as-is")

    for table, keys in KEY_SHIFTS.items():
        t0 = time.time()
        base = load_table(spark, SRC, table)
        df = base.crossJoin(F.broadcast(copies_df))
        for col in keys:
            df = df.withColumn(
                col,
                (
                    F.col(col)
                    + F.col("__k") * F.lit(moduli[COL_TO_SPACE[col]])
                ).cast("long"),
            )
        if table == "documents":
            # vocabulary remap: suffix every token with the copy number
            # for k>0 (copies become Jaccard-0 to each other); n_chars
            # follows the transformed text
            df = df.withColumn(
                "text",
                F.when(F.col("__k") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.when(t == "", t).otherwise(
                                F.concat(
                                    t,
                                    F.lit("x"),
                                    F.col("__k").cast("string"),
                                )
                            ),
                        ),
                        " ",
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if table == "embeddings":
            # circular rotation by the copy index decorrelates copies
            # (an exact-duplicate vector 10x over is a replication
            # artifact, not a distribution property). Rotation has only
            # `dim` distinct values, so copies past dim-1 additionally
            # NEGATE the vector (r8, copies=100 > dim=64): negation
            # preserves norms and the coordinate distribution, and
            # cosine(v, -v) = -1, so rotated-and-flipped copies stay
            # decorrelated for any copies < 2*dim.
            dim = base.select(F.size("embedding").alias("d")).first()["d"]
            rot = (F.col("__k") % dim).cast("int")
            rotated = F.when(rot == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.slice(
                        F.col("embedding"),
                        rot + 1,
                        F.lit(dim) - rot,
                    ),
                    F.slice(F.col("embedding"), F.lit(1), rot),
                )
            )
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("__k") < dim, rotated
                ).otherwise(F.transform(rotated, lambda x: -x)),
            )
        df = df.drop("__k")
        write_single_file(df, table)
        n = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
        print(f"{table}: {n} rows ({time.time()-t0:.1f}s)")

    print(f"scale dataset -> {out_dir}")


if __name__ == "__main__":
    main()
