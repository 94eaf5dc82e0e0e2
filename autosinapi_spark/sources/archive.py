"""Zip acquisition / extraction (S1-S3, K8).

The reference downloads ``SINAPI_{type}_{MM}_{YYYY}.zip`` over HTTP
(``downloader.py:67-140``), normalizes the name and extracts
(``etl_pipeline.py:212-241``). The HTTP fetch takes an injectable
``fetcher`` transport: the SANDBOX default raises (so no run ever
touches the wire silently), and :func:`urllib_fetcher` is the real
stdlib transport — tested end-to-end in-sandbox over ``file://``
URLs, which ``urlopen`` serves without network, so fetch -> land ->
extract is exercised through the same code path deployment uses.
"""

from __future__ import annotations

import shutil
import zipfile
from pathlib import Path
from typing import Callable

ZIP_NAME_TEMPLATE = "SINAPI-{year}-{month:0>2}-formato-xlsx.zip"  # config.py:34
ALLOWED_INPUT_EXTENSIONS = {".xlsx", ".xls", ".csv", ".zip"}  # config.py:24

# S1 constants (reference config.py:21-26)
BASE_URL = "https://www.caixa.gov.br/Downloads/sinapi-a-vista-composicoes"
VALID_DOWNLOAD_TYPES = ("REFERENCIA", "DESONERADO")
DOWNLOAD_FILENAME_TEMPLATE = "SINAPI_{type}_{month}_{year}"
DOWNLOAD_TIMEOUT = 30


class DownloadError(RuntimeError):
    """Acquisition failure wrapper (reference exceptions.DownloadError)."""


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


def build_download_url(
    year: int | str, month: int | str, sheet_type: str = "REFERENCIA"
) -> str:
    """S1 URL construction (downloader.py:123-142): zero-pad year to 4
    and month to 2, validate the sheet type against the known set."""
    tipo = str(sheet_type).upper()
    if tipo not in VALID_DOWNLOAD_TYPES:
        raise ValueError(f"Tipo de planilha inválido: {tipo}")
    file_name = DOWNLOAD_FILENAME_TEMPLATE.format(
        type=tipo, month=str(month).zfill(2), year=str(year).zfill(4)
    )
    return f"{BASE_URL}/{file_name}.zip"


def _no_network_fetcher(url: str) -> bytes:
    """Default transport — this environment has no network access.

    Pass ``fetcher=urllib_fetcher`` (real stdlib transport, below)
    when deploying; the default raises so a sandboxed run can never
    attempt the wire silently. Everything downstream of the returned
    bytes is fully implemented and tested.
    """
    raise NotImplementedError(
        "network access unavailable; pass fetcher=urllib_fetcher (or "
        "another transport), or place the zip locally and call "
        "extract_zip()"
    )


def urllib_fetcher(url: str, timeout: int = DOWNLOAD_TIMEOUT) -> bytes:
    """Real transport over stdlib ``urllib.request`` — the deployment
    implementation of the reference's ``requests.get(url,
    timeout=...)`` (downloader.py:101-121), with the same timeout
    contract and no extra dependency.

    Also the reason S1 is no longer test-stubbed at the transport
    layer: ``urlopen`` serves ``file://`` URLs without any network, so
    the sandbox test suite drives the FULL fetch -> land -> extract
    path through this exact function (tests/test_sources.py); only
    the scheme differs at deployment. HTTP >= 400 raises
    ``urllib.error.HTTPError``, which ``download_sinapi_zip`` wraps in
    :class:`DownloadError` like every other transport failure.
    """
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


def download_sinapi_zip(
    year: int,
    month: int,
    save_dir: str | Path,
    sheet_type: str = "REFERENCIA",
    *,
    fetcher: Callable[[str], bytes] = _no_network_fetcher,
) -> Path:
    """S1: fetch the monthly zip and land it under ``save_dir``.

    ``fetcher`` is the injectable transport (url -> response bytes),
    mirroring the reference's mocked ``requests.Session``
    (tests/core/test_downloader.py:52-115). Transport errors are
    wrapped in :class:`DownloadError` like downloader.py:119-121;
    the deliberate no-network ``NotImplementedError`` of the default
    fetcher propagates as-is.
    """
    url = build_download_url(year, month, sheet_type)
    try:
        content = fetcher(url)
    except NotImplementedError:
        raise
    except Exception as exc:  # noqa: BLE001 — parity with reference wrap
        raise DownloadError(f"Erro no download: {exc}") from exc
    out_dir = Path(save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    target = out_dir / ZIP_NAME_TEMPLATE.format(year=year, month=str(month))
    target.write_bytes(content)
    return target
