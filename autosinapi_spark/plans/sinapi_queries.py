"""SINAPI parity-slice queries — the reference's signature dataflow,
oracle-checked end to end.

A reference-shaped wide frame (27 UF columns of decimal-comma price
strings, deterministically synthesized from ``part``) runs the
signature chain R1-unpivot -> C5/C6 coercion -> drop-null, and the
flagship q1 cost lookup (codigo, uf, data_referencia, regime + status
join, ``docs/DataModel.md:376-382``) reads the result exactly as an
API consumer would. The same operators power ``pipeline.py``'s real
CSV loads; these registered versions give the chain a per-round
CORRECTNESS row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load
from ..functions.coercion import decimal_comma_to_double
from .registry import register

UFS = (
    "AC AL AP AM BA CE DF ES GO MA MT MS MG PA PB PR PE PI RJ RN RS RO RR "
    "SC SP SE TO"
).split()

REF_DATE = "2024-01-01"
REGIME = "NAO_DESONERADO"


def _wide_precos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part -> reference-shaped wide price sheet (codigo + 27 UF string
    columns, ~9% cells empty like real sparse sheets)."""
    part = load(spark, sf_dir, "part")
    cols = [F.col("p_partkey").alias("codigo")]
    for i, uf in enumerate(UFS):
        txt = F.format_string(
            "%d,%02d",
            (F.col("p_partkey") * (i + 7)) % 10000,
            (F.col("p_partkey") + i) % 100,
        )
        cols.append(
            F.when((F.col("p_partkey") + i) % 11 != 0, txt).alias(uf)
        )
    return part.select(*cols)


def _uf_arm(i: int, uf: str) -> str:
    return f"""
    SELECT p_partkey AS codigo, '{uf}' AS uf,
           TRY_CAST(replace(printf('%d,%02d',
                                   (p_partkey * {i + 7}) % 10000,
                                   (p_partkey + {i}) % 100),
                            ',', '.') AS DOUBLE) AS preco_mediano
    FROM part WHERE (p_partkey + {i}) % 11 <> 0
    """


_PRECOS_SQL = "\n    UNION ALL\n".join(
    _uf_arm(i, uf) for i, uf in enumerate(UFS)
)


@register(
    "sinapi_unpivot_precos",
    _PRECOS_SQL,
    doc="SINAPI signature chain: 27-UF wide sheet -> R1 unpivot -> "
    "drop-null -> C5 decimal-comma coercion (processor.py:134-158); "
    "the oracle is the equivalent 27-arm UNION ALL.",
)
def sinapi_unpivot_precos(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _wide_precos(spark, sf_dir)
    long = wide.unpivot(["codigo"], UFS, "uf", "__txt").where(
        F.col("__txt").isNotNull()
    )
    return long.select(
        "codigo",
        "uf",
        decimal_comma_to_double("__txt").alias("preco_mediano"),
    )


@register(
    "sinapi_cost_lookup_q1",
    f"""
    WITH precos AS ({_PRECOS_SQL}),
    catalogo AS (
      SELECT p_partkey AS codigo, p_name AS descricao,
             CASE WHEN p_partkey % 10 = 0 THEN 'DESATIVADO'
                  ELSE 'ATIVO' END AS status
      FROM part
    )
    SELECT p.codigo, c.descricao, c.status,
           '{REF_DATE}' AS data_referencia, '{REGIME}' AS regime,
           p.preco_mediano
    FROM precos p JOIN catalogo c ON p.codigo = c.codigo
    WHERE p.uf = 'SP' AND p.codigo <= 500
    """,
    doc="Reference q1: price lookup by (codigo, uf, data_referencia, "
    "regime) with catalog status join (DataModel.md:376-382; J8) over "
    "the unpivoted monthly facts.",
)
def sinapi_cost_lookup_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    precos = sinapi_unpivot_precos(spark, sf_dir)
    part = load(spark, sf_dir, "part")
    catalogo = part.select(
        F.col("p_partkey").alias("codigo"),
        F.col("p_name").alias("descricao"),
        F.when(F.col("p_partkey") % 10 == 0, F.lit("DESATIVADO"))
        .otherwise(F.lit("ATIVO"))
        .alias("status"),
    )
    return (
        precos.where((F.col("uf") == "SP") & (F.col("codigo") <= 500))
        .join(broadcast(catalogo), "codigo")
        .select(
            "codigo",
            "descricao",
            "status",
            F.lit(REF_DATE).alias("data_referencia"),
            F.lit(REGIME).alias("regime"),
            "preco_mediano",
        )
    )
