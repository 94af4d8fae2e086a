"""Round-11 optimization internals: the scale-adaptive knobs and the
driver-side exact-arithmetic rewrites keep their contracts."""

from __future__ import annotations

import math

import pytest


def test_stream_state_partitions_derivation(monkeypatch):
    from bigdatainvesttink_spark.streaming import pipeline as P

    monkeypatch.delenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    # no key statistic -> the static default
    assert P._stream_state_partitions(None) == P.STREAM_STATE_PARTITIONS
    assert P._stream_state_partitions(0) == P.STREAM_STATE_PARTITIONS
    # ~8 sub-keys per partition, rounded up to a power of two
    assert P._stream_state_partitions(50, 1) == 8
    assert P._stream_state_partitions(4, 1) == 1
    assert P._stream_state_partitions(100, 1) == 16
    # salt multiplies the domain; the core budget caps it
    assert P._stream_state_partitions(50, 8) == 32
    assert P._stream_state_partitions(10_000, 1) == 32
    # explicit env override always wins
    monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "12")
    assert P._stream_state_partitions(50, 1) == 12


def test_checkpoint_mode_selection(monkeypatch):
    from bigdatainvesttink_spark.session import _reliable_checkpoint

    class _SC:
        def __init__(self, master):
            self.master = master

    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CKPT", raising=False)
    assert not _reliable_checkpoint(_SC("local[32]"))
    assert not _reliable_checkpoint(_SC("local[*]"))
    assert _reliable_checkpoint(_SC("yarn"))
    assert _reliable_checkpoint(_SC("spark://host:7077"))
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CKPT", "1")
    assert _reliable_checkpoint(_SC("local[32]"))
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CKPT", "0")
    assert not _reliable_checkpoint(_SC("yarn"))


def test_checkpointed_local_mode_cuts_lineage(spark):
    from pyspark.sql import functions as F

    from bigdatainvesttink_spark.session import checkpointed

    df = spark.range(1000).withColumn("x", F.col("id") % 7)
    ck = checkpointed(df)
    # lineage is cut: the checkpointed frame plans as an RDD scan leaf
    plan = ck._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    assert ck.count() == 1000
    assert ck.agg(F.sum("x")).collect()[0][0] == df.agg(
        F.sum("x")
    ).collect()[0][0]


def test_markov_p_rows_matches_engine_expression():
    """The driver-side quantization must be the bit-identical IEEE
    expression floor(n*1e6/sum_n + 0.5) the oracle (and the former
    in-engine window) evaluates."""
    from bigdatainvesttink_spark.operators.events_ops import _markov_p_rows

    counted = [("a", "b", 3), ("a", "c", 7), ("b", "a", 1)]
    rows = dict(
        ((s, d), p) for s, d, p in _markov_p_rows(counted)
    )
    assert rows[("a", "b")] == int(
        math.floor(3.0 * 1000000 / 10 + 0.5)
    )
    assert rows[("a", "c")] == int(
        math.floor(7.0 * 1000000 / 10 + 0.5)
    )
    assert rows[("b", "a")] == 1000000


def test_markov_grid_budget_fail_loud(monkeypatch):
    from bigdatainvesttink_spark.operators import events_ops as E

    monkeypatch.setattr(E, "MARKOV_GRID_BUDGET", 2)
    E._check_markov_grid_budget(2)  # at budget: fine
    with pytest.raises(ValueError, match="driver-collect budget"):
        E._check_markov_grid_budget(3)
