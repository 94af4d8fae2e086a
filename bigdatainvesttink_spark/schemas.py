"""Domain StructTypes mirroring the reference's implied ClickHouse schema.

Column names/order are exactly the reference's INSERT column lists
(app/for_clickhouse/from_rabbitmq_to_clickhouse.py:54-111). Money is double
— the reference collapses Tinkoff Quotation ``units + nano/1e9`` to float
(app/for_rabbit/from_parser_to_rabbitmq.py:60-63) — and timestamps travel as
'yyyy-MM-dd HH:mm:ss' strings re-parsed by the consumer
(from_rabbitmq_to_clickhouse.py:164-170), i.e. second precision, tz
discarded.
"""

from __future__ import annotations

from pyspark.sql import types as T

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"  # from_parser_to_rabbitmq.py:59

COMPANIES = T.StructType(
    [
        T.StructField("company_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("sector", T.StringType()),
    ]
)

CANDLES = T.StructType(
    [
        T.StructField("company_id", T.StringType()),
        T.StructField("timestamp", T.TimestampNTZType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
    ]
)

TRADES = T.StructType(
    [
        T.StructField("company_id", T.StringType()),
        T.StructField("timestamp", T.TimestampNTZType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("side", T.StringType()),  # 'buy' | 'sell'
    ]
)

ORDER_BOOK = T.StructType(
    [
        T.StructField("company_id", T.StringType()),
        T.StructField("timestamp", T.TimestampNTZType()),
        T.StructField("bid_price", T.DoubleType()),
        T.StructField("bid_volume", T.LongType()),
        T.StructField("ask_price", T.DoubleType()),
        T.StructField("ask_volume", T.LongType()),
    ]
)

# Marker field -> table, exactly the consumer's content-based routing
# (from_rabbitmq_to_clickhouse.py:149-159).
DISPATCH_MARKERS = {
    "open": "candles",
    "side": "trades",
    "bid_price": "order_book",
    "name": "companies",
}

# Per-table required fields, exactly the consumer's validation lists
# (from_rabbitmq_to_clickhouse.py:124-131).
REQUIRED_FIELDS = {
    "candles": ["company_id", "timestamp", "open", "high", "low", "close", "volume"],
    "trades": ["company_id", "timestamp", "price", "volume", "side"],
    "order_book": [
        "company_id",
        "timestamp",
        "bid_price",
        "bid_volume",
        "ask_price",
        "ask_volume",
    ],
    "companies": ["company_id", "name", "ticker", "sector"],
}

DOMAIN_SCHEMAS = {
    "companies": COMPANIES,
    "candles": CANDLES,
    "trades": TRADES,
    "order_book": ORDER_BOOK,
}

# Wire schema: the producer serializes timestamps as strings
# (from_parser_to_rabbitmq.py:59,101,195); ingestion parses them.
def wire_schema(table: str) -> T.StructType:
    base = DOMAIN_SCHEMAS[table]
    return T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType() if isinstance(f.dataType, T.TimestampNTZType) else f.dataType,
            )
            for f in base.fields
        ]
    )
