"""Round-6 PNG codec tier (operators/multimodal, VERDICT r5 item 4):
stdlib-only PNG encode/decode — chunk walk + CRC verification,
multi-IDAT zlib inflate, all five per-row filter inversions."""

from __future__ import annotations

import struct
import zlib

import pytest

from gmall_flink_20_spark.operators import multimodal as M


def _expected_sum(mid: int) -> int:
    return 3 * sum(
        (mid + 3 * x + 7 * y) % 256
        for x in range(M._PNG_W)
        for y in range(M._PNG_H)
    )


@pytest.mark.parametrize("mid", [0, 1, 255, 256, 4095, 10**12 + 7])
def test_roundtrip_closed_form(mid):
    w, h, cs = M._png_decode(M._png_encode(mid))
    assert (w, h) == (M._PNG_W, M._PNG_H)
    assert cs == _expected_sum(mid)


def test_all_five_filters_present():
    # the encoder's y%5 cycling means the filtered stream carries every
    # filter type — decode exercises None/Sub/Up/Average/Paeth each call
    b = M._png_encode(42)
    # reassemble IDAT exactly as the decoder does
    off, idat = 8, bytearray()
    while off < len(b):
        (ln,) = struct.unpack_from(">I", b, off)
        ctype = b[off + 4 : off + 8]
        if ctype == b"IDAT":
            idat += b[off + 8 : off + 8 + ln]
        off += 12 + ln
    stream = zlib.decompress(bytes(idat))
    stride = M._PNG_W * 3
    fts = [stream[y * (stride + 1)] for y in range(M._PNG_H)]
    assert fts == [0, 1, 2, 3, 4]


def test_multi_idat_split():
    b = M._png_encode(7)
    off, n_idat = 8, 0
    while off < len(b):
        (ln,) = struct.unpack_from(">I", b, off)
        if b[off + 4 : off + 8] == b"IDAT":
            n_idat += 1
        off += 12 + ln
    assert n_idat == 2


def test_crc_tamper_detected():
    b = bytearray(M._png_encode(3))
    # flip one byte inside the first IDAT's data
    off = 8
    while True:
        (ln,) = struct.unpack_from(">I", bytes(b), off)
        if b[off + 4 : off + 8] == b"IDAT":
            b[off + 8] ^= 0xFF
            break
        off += 12 + ln
    with pytest.raises(ValueError, match="CRC"):
        M._png_decode(bytes(b))


def test_not_png_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        M._png_decode(b"BM123456")


def test_idat_before_ihdr_rejected():
    # ADVICE r6: a malformed payload with IDAT ahead of IHDR must raise
    # the documented ValueError, not NameError from unbound w/h
    good = M._png_encode(3)
    chunks, off = [], 8
    while off < len(good):
        (ln,) = struct.unpack_from(">I", good, off)
        chunks.append(good[off : off + 12 + ln])
        off += 12 + ln
    ihdr = [c for c in chunks if c[4:8] == b"IHDR"]
    rest = [c for c in chunks if c[4:8] != b"IHDR"]
    bad = good[:8] + b"".join(rest) + ihdr[0]
    with pytest.raises(ValueError, match="IDAT before IHDR"):
        M._png_decode(bad)


def test_missing_ihdr_rejected():
    # no IHDR and no IDAT at all: the post-walk guard still fires
    bad = b"\x89PNG\r\n\x1a\n" + M._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing IHDR"):
        M._png_decode(bad)


def test_encode_decode_dataframe_path(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = M.encode_png(df)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "mime",
    ]
    out = {r.media_id: r for r in M.decode_png(media).collect()}
    assert len(out) == 40
    for mid, r in out.items():
        assert (r.width, r.height) == (M._PNG_W, M._PNG_H)
        assert r.content_sum == _expected_sum(mid)
