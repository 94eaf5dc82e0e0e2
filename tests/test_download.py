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


def test_urllib_fetcher_end_to_end_over_file_url(tmp_path):
    """The REAL stdlib transport, driven over a file:// URL (urlopen
    serves it without network): fetch -> land -> extract runs through
    the exact deployment code path, only the URL scheme differs."""
    import io
    import zipfile

    from autosinapi_spark.sources.archive import (
        download_sinapi_zip,
        extract_zip,
        urllib_fetcher,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("SINAPI_Custos.xlsx", b"planilha")
        zf.writestr("SINAPI_Insumos.csv", b"a;b\n1;2\n")
    src = tmp_path / "served.zip"
    src.write_bytes(buf.getvalue())

    landed = download_sinapi_zip(
        2024,
        7,
        tmp_path / "land",
        fetcher=lambda _url: urllib_fetcher(src.as_uri()),
    )
    assert landed.name == "SINAPI-2024-07-formato-xlsx.zip"
    members = extract_zip(landed, tmp_path / "out")
    assert sorted(m.name for m in members) == [
        "SINAPI_Custos.xlsx",
        "SINAPI_Insumos.csv",
    ]
    assert (tmp_path / "out" / "SINAPI_Custos.xlsx").read_bytes() == b"planilha"


def test_urllib_fetcher_missing_target_wraps_as_download_error(tmp_path):
    """A transport failure through the real fetcher (URLError on a
    missing file:// target) must wrap in DownloadError exactly like
    any other fetcher exception (downloader.py:119-121 parity)."""
    import pytest

    from autosinapi_spark.sources.archive import (
        DownloadError,
        download_sinapi_zip,
        urllib_fetcher,
    )

    missing = (tmp_path / "nope.zip").as_uri()
    with pytest.raises(DownloadError, match="Erro no download"):
        download_sinapi_zip(
            2024, 7, tmp_path, fetcher=lambda _url: urllib_fetcher(missing)
        )
