"""The domain-fixture materialization cache (fixtures.domain_table).

Domain tables are derived once per (process, sf_dir) and served from
scratch parquet thereafter — mirroring the reference, where the consumer
ingests into ClickHouse storage once and queries read the STORED tables
(from_rabbitmq_to_clickhouse.py:54-111). These tests pin the two load-bearing
properties: bit-identity with the oracle CTE derivation, and that cached
consumers actually read storage (no re-derivation windows in the plan).
"""

from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from bigdatainvesttink_spark import fixtures as fx
from tests.conftest import SF_SMALL


def test_cached_tables_bit_identical_to_cte_derivation(spark):
    fx.load_table(spark, SF_SMALL, "events").createOrReplaceTempView("events")
    spark.sql(fx.FIXTURE_SQL["trades"]).createOrReplaceTempView("trades")
    for name in ("companies", "trades", "order_book", "book_levels", "candles"):
        direct = sorted(map(str, spark.sql(fx.FIXTURE_SQL[name]).collect()))
        cached = sorted(map(str, fx.domain_table(spark, SF_SMALL, name).collect()))
        assert direct == cached, name
        # dtypes must survive the parquet round-trip unchanged (the oracle
        # hash compare is dtype-sensitive); nullability flips to True on a
        # parquet read, which the compare doesn't see
        assert [
            (f.name, f.dataType)
            for f in fx.domain_table(spark, SF_SMALL, name).schema.fields
        ] == [
            (f.name, f.dataType)
            for f in spark.sql(fx.FIXTURE_SQL[name]).schema.fields
        ], name


def test_cache_hit_serves_storage_not_a_replan(spark):
    fx.domain_table(spark, SF_SMALL, "candles")  # ensure materialized
    plan = (
        fx.domain_table(spark, SF_SMALL, "candles")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the OHLC derivation runs two windows over trades; a cached read is a
    # bare parquet scan of the materialized table
    assert "Window" not in plan
    assert "parquet" in plan.lower()


def test_cache_is_one_entry_per_sf_dir_and_table(spark):
    fx.domain_table(spark, SF_SMALL, "trades")
    assert any(k[1] == "trades" and SF_SMALL in k[0] for k in fx._FIX_CACHE)
    # a repeat call must reuse the entry, not materialize again
    n = len(fx._FIX_CACHE)
    fx.domain_table(spark, SF_SMALL, "trades")
    assert len(fx._FIX_CACHE) == n
