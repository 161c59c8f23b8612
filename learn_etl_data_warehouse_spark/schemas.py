"""Explicit StructType registry.

The reference never declares schemas: Excel dims are type-inferred
(``server.py:26-48``) and the SQLite fact arrives as 16 all-TEXT columns
(``server.py:53-56``; every column of the OLTP table is typeless).  The
engine inverts that: every source has a declared StructType here, and the
raw fact is declared all-``StringType`` on purpose — typing happens in the
clean layer via explicit casts (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Ojol-parity schemas (reference assets/oltp, SURVEY §1.4) -----------

#: Raw fact extract — all strings, mirroring the typeless SQLite table
#: ``dummy_ojol_transactions_raw_only_query_get_transaction_list_koto``
#: (reference server.py:53-56).
RAW_FACT = T.StructType(
    [
        T.StructField(name, T.StringType(), True)
        for name in [
            "id",
            "date_process",
            "mode",
            "from_alamat",
            "from_kelurahanid",
            "transaction_from_latlng",
            "to_alamat",
            "to_kelurahanid",
            "transaction_to_latlng",
            "distance",
            "amount_delivery",
            "amount_merchant",
            "transaction_amount_total",
            "customer_id",
            "driver_id",
            "merchant_id",
        ]
    ]
)

DIM_KATEGORI = T.StructType(
    [
        T.StructField("category_id", T.LongType(), False),
        T.StructField("category_name", T.StringType(), True),
        T.StructField("category_is_food", T.LongType(), True),  # 0/1 at source
    ]
)

_PERSON_FIELDS = [
    T.StructField("user_id", T.LongType(), False),
    T.StructField("user_name", T.StringType(), True),
    T.StructField("user_email", T.StringType(), True),
    T.StructField("user_birthdate", T.TimestampType(), True),
    T.StructField("user_gender", T.StringType(), True),  # 'L'/'P'
    T.StructField("user_address", T.StringType(), True),
    T.StructField("user_lat", T.DoubleType(), True),
    T.StructField("user_lng", T.DoubleType(), True),
    T.StructField("kelurahan_id", T.LongType(), True),
    T.StructField("kelurahan_name", T.StringType(), True),
    T.StructField("kecamatan_name", T.StringType(), True),
]

DIM_USER = T.StructType(_PERSON_FIELDS)

DIM_DRIVER = T.StructType(
    _PERSON_FIELDS
    + [
        T.StructField("fleet_id", T.LongType(), True),
        T.StructField("fleet_merk", T.StringType(), True),
        T.StructField("fleet_type", T.StringType(), True),  # MOBIL/MOTOR
    ]
)

DIM_KELURAHAN = T.StructType(
    [
        T.StructField("kelurahan_id", T.LongType(), False),
        T.StructField("kelurahan_name", T.StringType(), True),
        T.StructField("kecamatan_name", T.StringType(), True),
    ]
)

DIM_MERCHANT = T.StructType(
    [
        T.StructField("merchant_id", T.LongType(), False),
        T.StructField("category_id", T.LongType(), True),
        T.StructField("merchant_name", T.StringType(), True),
        T.StructField("merchant_address", T.StringType(), True),
        T.StructField("merchant_address_lat", T.DoubleType(), True),
        T.StructField("merchant_address_lng", T.StringType(), True),
        T.StructField("kelurahan_id", T.StringType(), True),  # nullable, '6171010003.0' form
        T.StructField("kelurahan_name", T.StringType(), True),
        T.StructField("kecamatan_name", T.StringType(), True),
    ]
)

# --- Driver-generated fixture tables (/root/testdata, TESTDATA.md) -------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),  # JSON
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}
