"""Explicit StructTypes for every table the engine touches.

Two families:

1. SINAPI relational model — mirrors the reference DDL at
   ``/root/reference/autosinapi/core/database.py:96-133`` (tables
   insumos, composicoes, precos_insumos_mensal,
   custos_composicoes_mensal, composicao_insumos,
   composicao_subcomposicoes, manutencoes_historico).
2. Driver fixture tables (``/root/testdata/sf*/``) — TPC-H-ish star
   schema + events / documents / embeddings, per TESTDATA.md.

Schema-on-read with explicit StructType keeps scans prunable and makes
corrupt input fail loudly instead of silently widening types.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# SINAPI model (reference: database.py:96-133, DataModel.md:26-132)
# ---------------------------------------------------------------------------

# Catalog tables: PK codigo, lifecycle status (default ATIVO).
INSUMOS = T.StructType(
    [
        T.StructField("codigo", T.LongType(), False),
        T.StructField("descricao", T.StringType(), True),
        T.StructField("unidade", T.StringType(), True),
        T.StructField("classificacao", T.StringType(), True),
        T.StructField("status", T.StringType(), True),  # ATIVO | DESATIVADO
    ]
)

COMPOSICOES = T.StructType(
    [
        T.StructField("codigo", T.LongType(), False),
        T.StructField("descricao", T.StringType(), True),
        T.StructField("unidade", T.StringType(), True),
        T.StructField("grupo", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

# Monthly facts: composite PK (codigo, uf, data_referencia, regime).
# DecimalType for money keeps oracle-exact arithmetic
# (reference NUMERIC, database.py:104,109).
PRECOS_INSUMOS_MENSAL = T.StructType(
    [
        T.StructField("insumo_codigo", T.LongType(), False),
        T.StructField("uf", T.StringType(), False),
        T.StructField("data_referencia", T.DateType(), False),
        T.StructField("regime", T.StringType(), False),
        T.StructField("preco_mediano", T.DecimalType(18, 4), True),
    ]
)

CUSTOS_COMPOSICOES_MENSAL = T.StructType(
    [
        T.StructField("composicao_codigo", T.LongType(), False),
        T.StructField("uf", T.StringType(), False),
        T.StructField("data_referencia", T.DateType(), False),
        T.StructField("regime", T.StringType(), False),
        T.StructField("custo_total", T.DecimalType(18, 4), True),
    ]
)

# BOM edge tables: parent -> child with coefficient weight.
COMPOSICAO_INSUMOS = T.StructType(
    [
        T.StructField("composicao_pai_codigo", T.LongType(), False),
        T.StructField("insumo_filho_codigo", T.LongType(), False),
        T.StructField("coeficiente", T.DoubleType(), True),
    ]
)

COMPOSICAO_SUBCOMPOSICOES = T.StructType(
    [
        T.StructField("composicao_pai_codigo", T.LongType(), False),
        T.StructField("composicao_filho_codigo", T.LongType(), False),
        T.StructField("coeficiente", T.DoubleType(), True),
    ]
)

# Immutable maintenance-event log: PK (item_codigo, tipo_item,
# data_referencia, tipo_manutencao) (database.py:125-128).
MANUTENCOES_HISTORICO = T.StructType(
    [
        T.StructField("item_codigo", T.LongType(), False),
        T.StructField("tipo_item", T.StringType(), False),
        T.StructField("data_referencia", T.DateType(), False),
        T.StructField("tipo_manutencao", T.StringType(), False),
        T.StructField("descricao_item", T.StringType(), True),
    ]
)

SINAPI_SCHEMAS: dict[str, T.StructType] = {
    "insumos": INSUMOS,
    "composicoes": COMPOSICOES,
    "precos_insumos_mensal": PRECOS_INSUMOS_MENSAL,
    "custos_composicoes_mensal": CUSTOS_COMPOSICOES_MENSAL,
    "composicao_insumos": COMPOSICAO_INSUMOS,
    "composicao_subcomposicoes": COMPOSICAO_SUBCOMPOSICOES,
    "manutencoes_historico": MANUTENCOES_HISTORICO,
}

# ---------------------------------------------------------------------------
# Driver fixture tables (TESTDATA.md). Parquet carries its own schema;
# these StructTypes document the contract and back validation.
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
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
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON string
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

FIXTURE_TABLES = tuple(FIXTURE_SCHEMAS)
