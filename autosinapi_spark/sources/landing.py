"""Landing-zone writes (K8 + S6's spirit): raw CSV -> columnar Parquet.

The reference converts heavy Excel sheets to CSV purely as an IO
workaround (``pre_processor.py:6-11``); the Spark-native equivalent is
normalizing every raw input into Parquet ONCE at landing so all
downstream scans get columnar pruning and pushdown for free.

Excel needs no external library: ``excel_to_csv`` reads workbooks
through the engine's stdlib xlsx reader (``sources/xlsx.py``), so the
whole S4/S6 pre-conversion path runs for real in this container.
"""

from __future__ import annotations

import csv
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
    """S4/S6 Excel->CSV pre-conversion (pre_processor.py:51-84).

    Reads the workbook with the engine's stdlib xlsx reader (xlsx is a
    public zip-of-XML format; no openpyxl needed) and writes one CSV
    per requested sheet, header-less and index-less exactly like the
    reference's ``df.to_csv(header=False, index=False)``. Fields
    containing the separator, quotes, or newlines are quoted per RFC
    4180, matching pandas' default quoting.
    """
    from .xlsx import read_xlsx_rows

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for sheet in sheets:
        rows = read_xlsx_rows(xlsx_path, sheet)
        dest = out / f"{sheet}.csv"
        with open(dest, "w", encoding="utf-8", newline="") as fh:
            w = csv.writer(fh, delimiter=sep, lineterminator="\n")
            w.writerows(rows)
        written.append(dest)
    return written
