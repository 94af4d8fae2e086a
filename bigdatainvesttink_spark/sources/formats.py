"""File-format connectors (SURVEY.md §2-E "file formats / connectors"): the
reference speaks only AMQP + ClickHouse native protocol; the engine gets
Parquet (primary, columnar, pushdown), CSV, and JSON-lines via spark.read /
spark.write, plus partitioned writes with partition pruning on read-back.

Delta/Iceberg/Hudi would be classpath additions — gated behind import-try
(not present in this environment, noted as the production upgrade path).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import domain_table, oracle_on_domain
from ..registry import query


def has_delta() -> bool:
    try:  # pragma: no cover - classpath probe
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


# --------------------------------------------------------------------------
# CSV + JSON round-trip: write the companies dimension to both formats, read
# back with explicit schemas, verify against the source. Proves schema-on-
# read for both text formats end to end.
@query(
    "fmt_csv_json_roundtrip",
    oracle=oracle_on_domain(
        """
        SELECT 'csv' AS fmt, company_id, name, ticker, sector FROM companies
        UNION ALL
        SELECT 'json', company_id, name, ticker, sector FROM companies
        """
    ),
)
def fmt_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    companies = domain_table(spark, sf_dir, "companies")
    tmp = tempfile.mkdtemp(prefix="fmt_rt_")
    companies.write.mode("overwrite").option("header", True).csv(f"{tmp}/csv")
    companies.write.mode("overwrite").json(f"{tmp}/json")
    schema = "company_id string, name string, ticker string, sector string"
    from_csv = (
        spark.read.schema(schema).option("header", True).csv(f"{tmp}/csv")
    )
    from_json_f = spark.read.schema(schema).json(f"{tmp}/json")
    return from_csv.select(F.lit("csv").alias("fmt"), "*").unionByName(
        from_json_f.select(F.lit("json").alias("fmt"), "*")
    )


# --------------------------------------------------------------------------
# Partitioned parquet warehouse write + partition-pruned read-back: trades
# written partitioned by side; the 'buy'-only read-back must scan only the
# buy partition (PartitionFilters in the plan — asserted in tests).
@query(
    "fmt_partitioned_pruned_scan",
    oracle=oracle_on_domain(
        """
        SELECT company_id, COUNT(*) AS n_buys,
               CAST(SUM(CAST(price AS DECIMAL(27,6))) AS DOUBLE) AS price_sum
        FROM trades WHERE side = 'buy'
        GROUP BY company_id
        """
    ),
)
def fmt_partitioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    trades = domain_table(spark, sf_dir, "trades")
    tmp = tempfile.mkdtemp(prefix="fmt_part_")
    trades.write.mode("overwrite").partitionBy("side").parquet(f"{tmp}/trades")
    back = spark.read.parquet(f"{tmp}/trades").filter(F.col("side") == "buy")
    return back.groupBy("company_id").agg(
        F.count("*").alias("n_buys"),
        F.sum(F.col("price").cast("decimal(27,6)")).cast("double").alias("price_sum"),
    )


# --------------------------------------------------------------------------
# ORC round-trip: Spark's second first-class columnar format (vectorized
# reader + pushdown like parquet). DuckDB can't read ORC, so the oracle
# verifies VALUES (write->read-back must reproduce the companies dimension).
@query(
    "fmt_orc_roundtrip",
    oracle=oracle_on_domain(
        "SELECT company_id, name, ticker, sector FROM companies"
    ),
)
def fmt_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    companies = domain_table(spark, sf_dir, "companies")
    tmp = tempfile.mkdtemp(prefix="fmt_orc_")
    companies.write.mode("overwrite").orc(f"{tmp}/orc")
    return spark.read.orc(f"{tmp}/orc")


# --------------------------------------------------------------------------
# Schema evolution: a v1 write without the sector column and a widened v2
# write land in the same dataset; mergeSchema read-back unifies them with
# NULLs backfilling the legacy rows — the additive-column evolution every
# long-lived parquet dataset goes through. (Column renames/drops need a
# table format — the has_delta() upgrade path above.) The rollup groups by
# the evolved column, so the NULL bucket counts exactly the v1 rows.
@query(
    "fmt_schema_evolution",
    oracle=oracle_on_domain(
        """
        SELECT sector, COUNT(*) AS n_rows
        FROM (
            SELECT NULL AS sector FROM companies
            UNION ALL
            SELECT sector FROM companies
        ) evolved
        GROUP BY sector
        """
    ),
)
def fmt_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    companies = domain_table(spark, sf_dir, "companies")
    tmp = tempfile.mkdtemp(prefix="fmt_evo_")
    companies.select("company_id", "name").write.mode("overwrite").parquet(
        f"{tmp}/ds/v=1"
    )
    companies.select("company_id", "name", "sector").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/ds/v=2")
    evolved = spark.read.option("mergeSchema", True).parquet(f"{tmp}/ds")
    return evolved.groupBy("sector").agg(F.count("*").alias("n_rows"))
