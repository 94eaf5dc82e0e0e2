"""Landing-zone writes (K8 + S6's spirit): raw CSV -> columnar Parquet.

The reference converts heavy Excel sheets to CSV purely as an IO
workaround (``pre_processor.py:6-11``); the Spark-native equivalent is
normalizing every raw input into Parquet ONCE at landing so all
downstream scans get columnar pruning and pushdown for free.

Excel itself is gated: this container ships no openpyxl, so the
xlsx->csv step raises cleanly while the CSV/Parquet plumbing stays
fully real (environment constraint, mirrors S4/S6 being a
pre-conversion detail rather than engine semantics).
"""

from __future__ import annotations

from collections.abc import Iterable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .csv_source import read_discovered_csv


def land_csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    out_path: str,
    header_keywords: Iterable[str],
    sep: str = ";",
    two_row_header: bool = False,
) -> DataFrame:
    """Discover-read a SINAPI CSV and persist it columnar (K8)."""
    df = read_discovered_csv(
        spark, csv_path, header_keywords, sep=sep, two_row_header=two_row_header
    )
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def excel_to_csv(
    xlsx_path: str | Path,
    sheets: list[str],
    out_dir: str | Path,
    sep: str = ";",
) -> list[Path]:
    """S6 Excel->CSV pre-conversion — gated on an Excel reader.

    pandas.read_excel needs openpyxl, which this container does not
    ship; the function degrades to a clear error instead of a silent
    stub. (pre_processor.py:51-84.)
    """
    try:
        import pandas as pd

        pd.io.excel.ExcelFile  # probe the engine lazily
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Excel pre-conversion requires openpyxl, which is not "
            "installed in this environment"
        ) from exc
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for sheet in sheets:  # pragma: no cover - needs openpyxl
        df = pd.read_excel(xlsx_path, sheet_name=sheet, header=None)
        dest = out / f"{sheet}.csv"
        df.to_csv(dest, sep=sep, header=False, index=False)
        written.append(dest)
    return written
