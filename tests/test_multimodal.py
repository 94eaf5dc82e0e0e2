"""Pin the multimodal mapInPandas UDFs against Python-computed truth."""

from __future__ import annotations

import numpy as np
import pytest

from autosinapi_spark.catalog import load
from autosinapi_spark.operators.multimodal import (
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
    synth_media_from_documents,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(20)
    return synth_media_from_documents(docs).cache()


def _expected_payloads(media):
    return {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }


def test_decode_matches_header_convention(media):
    payloads = _expected_payloads(media)
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    assert set(rows) == set(payloads)
    for mid, p in payloads.items():
        r = rows[mid]
        assert r["n_bytes"] == len(p)
        assert r["decoded_width"] == p[0] * 256 + p[1]
        assert r["decoded_height"] == p[2] * 256 + p[3]
        assert r["checksum"] == sum(p)


def test_feature_extraction_matches_numpy(media):
    payloads = _expected_payloads(media)
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    for mid, p in payloads.items():
        arr = np.frombuffer(p, dtype=np.uint8)
        assert rows[mid]["byte_mean"] == pytest.approx(float(arr.mean()))
        hist = np.bincount(arr // 16, minlength=16).tolist()
        assert rows[mid]["byte_hist"] == hist
        assert sum(rows[mid]["byte_hist"]) == len(p)


def test_frame_sampling_reassembles(media):
    payloads = _expected_payloads(media)
    frames = sample_frames(media, frame_bytes=64).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(payloads)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        # frames concatenate back to the exact payload (lossless split)
        assert b"".join(bytes(r["frame"]) for r in rows) == payloads[mid]
        assert all(len(bytes(r["frame"])) <= 64 for r in rows)


def test_resize_matches_numpy_truth(spark):
    """Nearest-neighbor resize of raw grayscale bitmaps vs pure-numpy
    truth: up- and down-scaling, identity passthrough, and the
    mismatched-payload -> NULL pixels contract."""
    rng = np.random.default_rng(3)
    img_a = rng.integers(0, 256, (12, 10), dtype=np.uint8)  # 10x12
    img_b = rng.integers(0, 256, (5, 7), dtype=np.uint8)  # 7x5
    rows = [
        (1, 10, 12, img_a.tobytes()),
        (2, 7, 5, img_b.tobytes()),
        (3, 10, 12, b"short"),  # length != w*h -> NULL pixels
        (4, None, 12, img_a.tobytes()),  # missing metadata -> NULL
    ]
    media = spark.createDataFrame(
        rows, "media_id LONG, width INT, height INT, payload BINARY"
    )
    out_w, out_h = 6, 8
    got = {
        r["media_id"]: r
        for r in resize_images(media, out_w, out_h).collect()
    }
    assert all(
        (r["out_width"], r["out_height"]) == (out_w, out_h)
        for r in got.values()
    )
    for mid, img in ((1, img_a), (2, img_b)):
        sh, sw = img.shape
        ri = np.arange(out_h) * sh // out_h
        ci = np.arange(out_w) * sw // out_w
        want = img[np.ix_(ri, ci)].tobytes()
        assert bytes(got[mid]["pixels"]) == want, f"media {mid}"
    assert got[3]["pixels"] is None
    assert got[4]["pixels"] is None

    # identity resize reproduces the input bit-for-bit
    same = resize_images(
        spark.createDataFrame(
            [(9, 10, 12, img_a.tobytes())],
            "media_id LONG, width INT, height INT, payload BINARY",
        ),
        10,
        12,
    ).collect()[0]
    assert bytes(same["pixels"]) == img_a.tobytes()

    with pytest.raises(ValueError, match="target size"):
        resize_images(media, 0, 4)


def test_frame_index_arithmetic(spark):
    """Pin the chunker's stride/bounds math on crafted payload lengths:
    frame count = max(1, ceil(L / k)), indices contiguous from 0, every
    frame full-size except a tail of exactly L - (n-1)*k bytes, and a
    zero-length payload still yields its single empty frame."""
    import math

    k = 64
    lengths = [0, 1, 63, 64, 65, 127, 128, 129, 200]
    rows = [(i, b"x" * L) for i, L in enumerate(lengths)]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")

    got: dict[int, list] = {}
    for r in sample_frames(media, frame_bytes=k).collect():
        got.setdefault(r["media_id"], []).append(r)
    for mid, L in enumerate(lengths):
        frames = sorted(got[mid], key=lambda r: r["frame_idx"])
        n = max(1, math.ceil(L / k))
        assert [f["frame_idx"] for f in frames] == list(range(n)), (
            f"L={L}: bad indices"
        )
        sizes = [len(bytes(f["frame"])) for f in frames]
        assert sizes[:-1] == [k] * (n - 1), f"L={L}: non-tail frame short"
        assert sizes[-1] == L - (n - 1) * k, f"L={L}: tail size"


def test_frame_sampling_every_nth_keeps_original_numbering(spark):
    """fps-downsample stride: every_nth=3 over a 10-frame payload keeps
    original frame indices 0, 3, 6, 9 with full-size slices at the
    right offsets (content checked byte-for-byte)."""
    k, nth, L = 8, 3, 80
    payload = bytes(i % 256 for i in range(L))
    media = spark.createDataFrame(
        [(1, payload)], "media_id LONG, payload BINARY"
    )
    frames = sorted(
        sample_frames(media, frame_bytes=k, every_nth=nth).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [f["frame_idx"] for f in frames] == [0, 3, 6, 9]
    for f in frames:
        off = f["frame_idx"] * k
        assert bytes(f["frame"]) == payload[off : off + k]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="every_nth"):
        sample_frames(media, frame_bytes=k, every_nth=0)


def test_documents_fixture_is_ascii_at_gate_sfs(duck):
    """The multimodal oracles replay byte arithmetic with CHARACTER
    functions (ord(substr), length, md5-of-substr), which equals the
    Spark side's byte arithmetic only while documents.text is pure
    ASCII (ADVICE r10: an accented pt-BR fixture would silently shift
    every slice). The oracle compare itself would still fail loudly,
    but THIS failure names the actual cause: if the fixture ever goes
    non-ASCII, rewrite those oracles to slice encode(text) blobs."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d = duckdb.connect()
        n = d.execute(
            "SELECT COUNT(*) FROM read_parquet(?) "
            "WHERE octet_length(encode(text)) != length(text)",
            [f"{sf}/documents.parquet"],
        ).fetchone()[0]
        d.close()
        assert n == 0, (
            f"{sf}: {n} non-ASCII documents — the multimodal oracles' "
            "char-slicing == byte-slicing assumption no longer holds"
        )
