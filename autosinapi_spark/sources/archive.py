"""Zip acquisition / extraction (S1-S3, K8).

The reference downloads ``SINAPI_{type}_{MM}_{YYYY}.zip`` over HTTP
(``downloader.py:67-140``), normalizes the name and extracts
(``etl_pipeline.py:212-241``). Network access is out of scope here;
the local-zip path is implemented fully and the HTTP fetch is an
explicit stub behind the same interface.
"""

from __future__ import annotations

import shutil
import zipfile
from pathlib import Path

ZIP_NAME_TEMPLATE = "SINAPI-{year}-{month:0>2}-formato-xlsx.zip"  # config.py:34
ALLOWED_INPUT_EXTENSIONS = {".xlsx", ".xls", ".csv", ".zip"}  # config.py:24


def validate_local_file(path: str | Path) -> Path:
    """S2: existence + extension check before ingestion
    (downloader.py:82-98)."""
    p = Path(path)
    if not p.is_file():
        raise FileNotFoundError(f"arquivo não encontrado: {p}")
    if p.suffix.lower() not in ALLOWED_INPUT_EXTENSIONS:
        raise ValueError(
            f"extensão inválida {p.suffix!r}; aceitas: "
            f"{sorted(ALLOWED_INPUT_EXTENSIONS)}"
        )
    return p


def normalize_zip_name(src: Path, year: int | str, month: int | str) -> Path:
    """Rename an arbitrary SINAPI zip to the standard name (S3 part 1)."""
    target = src.with_name(
        ZIP_NAME_TEMPLATE.format(year=year, month=str(month))
    )
    if src != target:
        shutil.move(str(src), str(target))
    return target


def extract_zip(zip_path: str | Path, out_dir: str | Path) -> list[Path]:
    """Extract every member; returns extracted paths (S3 part 2)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(out)
        return [out / n for n in zf.namelist()]


def download_sinapi_zip(year: int, month: int, save_dir: str | Path) -> Path:
    """S1 HTTP download — STUB: this environment has no network access.

    The reference GETs the Caixa URL with a 30s timeout
    (downloader.py:107, config.py:21-26). Wire `requests` here when
    deploying; the rest of the ingestion path consumes the returned
    local zip path and is fully implemented.
    """
    raise NotImplementedError(
        "network access unavailable; place the zip locally and call "
        "extract_zip()"
    )
