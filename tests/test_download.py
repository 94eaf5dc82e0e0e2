"""S1 acquisition tests with an injected transport.

Mirrors the reference downloader suite
(``/root/reference/tests/core/test_downloader.py:52-115``): URL
construction for both sheet types, zero-padding, invalid-type
rejection, a successful fetch landing the normalized zip name, and
transport errors wrapped in ``DownloadError``.
"""

from __future__ import annotations

import zipfile

import pytest

from autosinapi_spark.sources.archive import (
    BASE_URL,
    DownloadError,
    build_download_url,
    download_sinapi_zip,
    extract_zip,
)


def test_build_url_referencia():
    url = build_download_url(2023, "01")
    assert "SINAPI_REFERENCIA_01_2023.zip" in url
    assert url.startswith(BASE_URL)


def test_build_url_desonerado():
    assert "SINAPI_DESONERADO_12_2023.zip" in build_download_url(
        "2023", "12", "DESONERADO"
    )


def test_build_url_zero_padding():
    # ints, not pre-padded strings (downloader.py:127-128 zfill)
    assert "SINAPI_REFERENCIA_01_2023.zip" in build_download_url(2023, 1)


def test_build_url_invalid_type():
    with pytest.raises(ValueError, match="Tipo de planilha inválido"):
        build_download_url(2023, 1, "INVALIDO")


def test_successful_download_lands_normalized_zip(tmp_path):
    seen = []

    def fetcher(url):
        seen.append(url)
        return b"conteudo do zip"

    got = download_sinapi_zip(2024, 3, tmp_path / "dl", fetcher=fetcher)
    assert seen == [f"{BASE_URL}/SINAPI_REFERENCIA_03_2024.zip"]
    assert got.name == "SINAPI-2024-03-formato-xlsx.zip"
    assert got.read_bytes() == b"conteudo do zip"


def test_download_network_error_wrapped(tmp_path):
    def fetcher(url):
        raise ConnectionError("Network error")

    with pytest.raises(DownloadError, match="Erro no download: Network error"):
        download_sinapi_zip(2024, 3, tmp_path, fetcher=fetcher)


def test_default_fetcher_raises_not_implemented(tmp_path):
    with pytest.raises(NotImplementedError, match="network access unavailable"):
        download_sinapi_zip(2024, 3, tmp_path)


def test_downloaded_zip_flows_into_extract(tmp_path):
    """End of S1 feeds S3: the landed bytes are a real zip archive."""
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("SINAPI_Referência_2024_03.xlsx", b"payload")

    got = download_sinapi_zip(2024, 3, tmp_path, fetcher=lambda _u: buf.getvalue())
    (member,) = extract_zip(got, tmp_path / "out")
    assert member.read_bytes() == b"payload"
