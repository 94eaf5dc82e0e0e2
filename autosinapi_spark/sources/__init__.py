"""Ingestion layer (SURVEY §2.1 S1-S8, §2.8 R2).

Pre-schema work — header discovery, column-name normalization,
sheet routing, zip handling — is driver-side Python operating on
METADATA (a bounded pre-scan of each file), exactly because Catalyst
cannot express "find my header row". Data always flows through
distributed ``spark.read`` scans; nothing row-scale ever funnels
through the driver.
"""

from .normalize import (
    find_header_row,
    flatten_two_row_header,
    normalize_name,
    standardize_id_names,
)
from .csv_source import read_discovered_csv
from .routing import route_sheet, route_file
from .archive import extract_zip
from .landing import land_csv_to_parquet

__all__ = [
    "find_header_row",
    "flatten_two_row_header",
    "normalize_name",
    "standardize_id_names",
    "read_discovered_csv",
    "route_sheet",
    "route_file",
    "extract_zip",
    "land_csv_to_parquet",
]
