"""File-format connectors (SURVEY.md §2-E "file formats / connectors"): the
reference speaks only AMQP + ClickHouse native protocol; the engine gets
Parquet (primary, columnar, pushdown), CSV, and JSON-lines via spark.read /
spark.write, plus partitioned writes with partition pruning on read-back.

Delta/Iceberg/Hudi would be classpath additions — gated behind import-try
(not present in this environment, noted as the production upgrade path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import domain_table, oracle_on_domain
from ..registry import query
from ..session import scratch_dir


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
    tmp = scratch_dir("fmt_rt_")
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
    tmp = scratch_dir("fmt_part_")
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
    tmp = scratch_dir("fmt_orc_")
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
    tmp = scratch_dir("fmt_evo_")
    companies.select("company_id", "name").write.mode("overwrite").parquet(
        f"{tmp}/ds/v=1"
    )
    companies.select("company_id", "name", "sector").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/ds/v=2")
    evolved = spark.read.option("mergeSchema", True).parquet(f"{tmp}/ds")
    return evolved.groupBy("sector").agg(F.count("*").alias("n_rows"))


# --------------------------------------------------------------------------
# CSV malformed-record modes — the reader-semantics contract a lake
# ingests text with: the same deterministically corrupted file (5 short
# rows, 5 type-bad rows injected among 50 clean ones) read under
# PERMISSIVE (every line lands, corruption captured in
# _corrupt_record) and DROPMALFORMED (bad lines vanish silently). The
# oracle prices the expected counts from the clean dimension, so what's
# verified is Spark's mode semantics themselves — the 100 TB relevance
# is that mode choice changes ROW COUNTS, which silently poisons
# downstream joins if unaudited (FAILFAST's throw is pytest-asserted,
# a count query can't express it).
@query(
    "fmt_csv_malformed_modes",
    oracle=oracle_on_domain(
        """
        , m AS (
            SELECT COUNT(*) AS n_good,
                   SUM(CASE WHEN CAST(substr(company_id, 5, 2) AS BIGINT)
                                 % 10 = 0 THEN 1 ELSE 0 END) AS n_short,
                   SUM(CASE WHEN CAST(substr(company_id, 5, 2) AS BIGINT)
                                 % 10 = 5 THEN 1 ELSE 0 END) AS n_typebad
            FROM companies
        )
        SELECT 'permissive' AS mode,
               CAST(n_good + n_short + n_typebad AS BIGINT) AS n_rows_read,
               CAST(n_good AS BIGINT) AS n_clean,
               CAST(n_short + n_typebad AS BIGINT) AS n_corrupt
        FROM m
        UNION ALL
        SELECT 'dropmalformed', CAST(n_good AS BIGINT),
               CAST(n_good AS BIGINT), CAST(0 AS BIGINT)
        FROM m
        """
    ),
)
def fmt_csv_malformed_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    companies = domain_table(spark, sf_dir, "companies")
    rank = F.substring("company_id", 5, 2).cast("long")
    good = companies.select(
        F.concat_ws(
            ",", "company_id", "name", "ticker", "sector", rank
        ).alias("value")
    )
    short_bad = companies.filter(rank % 10 == 0).select(
        F.concat_ws(",", "company_id", F.lit("onlytwo")).alias("value")
    )
    type_bad = companies.filter(rank % 10 == 5).select(
        F.concat_ws(
            ",", "company_id", "name", "ticker", "sector", F.lit("notanint")
        ).alias("value")
    )
    tmp = scratch_dir("fmt_malformed_")
    good.unionAll(short_bad).unionAll(type_bad).write.mode(
        "overwrite"
    ).text(f"{tmp}/csv")
    schema = (
        "company_id string, name string, ticker string, sector string,"
        " rank int, _corrupt_record string"
    )
    # Spark refuses queries that reference ONLY the corrupt column of a
    # lazily-parsed CSV (SQLSTATE 0A000); cache() materializes the full
    # parse first, per the error message's own guidance.
    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(f"{tmp}/csv")
        .cache()
    )
    p_row = permissive.agg(
        F.count("*").cast("long").alias("n_rows_read"),
        F.count_if(F.col("_corrupt_record").isNull())
        .cast("long")
        .alias("n_clean"),
        F.count_if(F.col("_corrupt_record").isNotNull())
        .cast("long")
        .alias("n_corrupt"),
    ).select(F.lit("permissive").alias("mode"), "*")
    dropped = (
        spark.read.schema(
            "company_id string, name string, ticker string, sector string,"
            " rank int"
        )
        .option("mode", "DROPMALFORMED")
        .csv(f"{tmp}/csv")
        # count(*) alone takes a no-parse fast path that never evaluates
        # the malformed-row drops; cache() forces the full parse so the
        # mode's row-count semantics are what's actually measured.
        .cache()
    )
    d_row = dropped.agg(
        F.count("*").cast("long").alias("n_rows_read"),
        F.count("*").cast("long").alias("n_clean"),
        F.lit(0).cast("long").alias("n_corrupt"),
    ).select(F.lit("dropmalformed").alias("mode"), "*")
    return p_row.unionAll(d_row)


# --------------------------------------------------------------------------
# Compression-codec roundtrip — the same companies dimension written
# with snappy / gzip / zstd / uncompressed parquet must read back
# BIT-IDENTICAL (md5-fold XOR checksum per codec equals the source's,
# computed once by the oracle and repeated per codec label); on-disk
# byte sizes are engine facts, so the codec-actually-compressed claim
# (zstd/gzip < uncompressed) lives in the pytest, not the oracle. The
# audit every lake runs once per Spark upgrade before flipping
# spark.sql.parquet.compression.codec at 100 TB.
_CODECS = ("snappy", "gzip", "zstd", "uncompressed")


@query(
    "fmt_compression_codecs",
    oracle=oracle_on_domain(
        " UNION ALL ".join(
            f"""
            SELECT '{codec}' AS codec, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   bit_xor(CAST(CAST('0x' || substr(md5(concat_ws('|',
                       company_id, name, ticker, sector)), 1, 15)
                       AS UBIGINT) AS BIGINT)) AS checksum
            FROM companies
            """
            for codec in _CODECS
        )
    ),
)
def fmt_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import stable_hash60

    companies = domain_table(spark, sf_dir, "companies")
    tmp = scratch_dir("fmt_codec_")
    out = None
    for codec in _CODECS:
        path = f"{tmp}/{codec}"
        companies.write.mode("overwrite").option(
            "compression", codec
        ).parquet(path)
        back = spark.read.parquet(path)
        digest = stable_hash60(
            F.concat_ws("|", "company_id", "name", "ticker", "sector")
        )
        row = back.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.bit_xor(digest).alias("checksum"),
        ).select(F.lit(codec).alias("codec"), "*")
        out = row if out is None else out.unionAll(row)
    return out
