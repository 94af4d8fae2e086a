"""Semantics tests for the corpus-curation operators (operators/curation.py):
cluster transitivity, pack-offset invariants, filter flag consistency, and
exact per-stratum sample size."""

from __future__ import annotations

from collections import Counter

from bigdatainvesttink_spark.operators.curation import (
    N_SHARDS,
    PACK_BUDGET,
    SHARD_STRIDE,
    d2_cc_clusters,
    d4_repetition_filter,
    d7_sequence_packing,
    d7_stratified_sample,
)
from tests.conftest import SF_SMALL


def test_cc_clusters_transitive(spark):
    rows = d2_cc_clusters(spark, SF_SMALL).collect()
    cluster = {r["doc_id"]: r["cluster_id"] for r in rows}
    sizes = Counter(r["cluster_id"] for r in rows)
    for r in rows:
        # canonical representative is the min doc_id of its own cluster
        assert r["cluster_id"] <= r["doc_id"]
        assert sizes[r["cluster_id"]] == r["cluster_size"]
    # exact copies (base, base+2e6) must always land in one cluster; when the
    # one-token mutant (base+1e6) of the same base is present, transitivity
    # must pull it in too even if (copy, mutant) never formed a direct pair.
    for base in {d for d in cluster if d < 1_000_000}:
        if base + 2_000_000 in cluster:
            assert cluster[base + 2_000_000] == cluster[base]
        if base + 1_000_000 in cluster and base + 2_000_000 in cluster:
            assert cluster[base + 1_000_000] == cluster[base]


def test_sequence_packing_invariants(spark):
    rows = d7_sequence_packing(spark, SF_SMALL).collect()
    assert rows
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["pack_offset"] < PACK_BUDGET
        by_shard.setdefault(r["pack_id"] // SHARD_STRIDE, []).append(r)
    assert set(by_shard) <= set(range(N_SHARDS))
    # within a shard, docs laid out by doc_id occupy contiguous token space
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["pack_id"] == shard * SHARD_STRIDE + off // PACK_BUDGET
            assert r["pack_offset"] == off % PACK_BUDGET
            off += r["n_tok"]


def test_repetition_filter_flag(spark):
    rows = d4_repetition_filter(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        expect = (
            r["n_tok"] >= 20
            and r["dup_2gram_frac"] <= 0.05
            and 0.01 <= r["stopword_frac"] <= 0.15
        )
        assert r["keep"] == expect
        assert 0.0 <= r["dup_2gram_frac"] < 1.0
    kept = {r["keep"] for r in rows}
    assert kept == {True, False}, "thresholds should split the corpus"


def test_stratified_sample_exact_tenth(spark):
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .filter("text <> ''")
        .groupBy("lang")
        .count()
        .collect()
    )
    expected = {r["lang"]: r["count"] // 10 for r in docs}
    got = Counter(
        r["lang"] for r in d7_stratified_sample(spark, SF_SMALL).collect()
    )
    assert dict(got) == {k: v for k, v in expected.items() if v > 0}
    # determinism: same rows on a rerun
    a = sorted(r["doc_id"] for r in d7_stratified_sample(spark, SF_SMALL).collect())
    b = sorted(r["doc_id"] for r in d7_stratified_sample(spark, SF_SMALL).collect())
    assert a == b
