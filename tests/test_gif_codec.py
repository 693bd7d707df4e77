"""Round-7 GIF87a codec tier: stdlib GIF-LZW encode/decode gates —
variable code widths, CLEAR/EOI, dictionary reset, the KwKwK case,
sub-block reassembly, and DataFrame-path round-trip."""

from __future__ import annotations

import random
import struct

import pytest

from gmall_flink_20_spark.operators import multimodal as M


# 0: big tier (0%101==0 → 96x64 swirl, 12-bit + CLEAR); 17: mid tier
# (40x24, 9→10-bit growth); 101/202: big tier; rest: base 9x6
@pytest.mark.parametrize("mid", [0, 1, 7, 17, 34, 101, 200, 202, 255, 4096])
def test_roundtrip_closed_form(mid):
    w, h, cs = M._gif_decode(M._gif_encode(mid))
    ew, eh, swirl = M._gif_geometry(mid)
    exp = 3 * sum(
        (mid + 5 * x + 11 * y + swirl * x * y) % 256
        for y in range(eh)
        for x in range(ew)
    )
    assert (w, h, cs) == (ew, eh, exp)


def test_gif_tiers_exercise_width_growth_and_clear():
    # ADVICE r7: the oracle-gated payloads themselves must hit the
    # variable-width and dict-reset paths, not only the unit tests.
    # Count CLEAR codes in the encoded stream (beyond the leading one)
    # by decoding with an instrumented reader: assert via stream size —
    # the big tier compresses to >2 sub-blocks and the mid tier's LZW
    # byte length exceeds what a 9-bit-only stream of 586 codes allows.
    big = M._gif_encode(101)
    mid = M._gif_encode(17)
    base = M._gif_encode(1)
    assert len(base) < len(mid) < len(big)
    # geometry tiers honored in the header
    import struct as _s

    assert _s.unpack_from("<HH", big, 6) == (M._GIF_BIG_W, M._GIF_BIG_H)
    assert _s.unpack_from("<HH", mid, 6) == (M._GIF_MID_W, M._GIF_MID_H)
    # the swirl payload is near-incompressible: > 1 byte/pixel at
    # 12-bit codes only happens after the width ladder is climbed
    n_px = M._GIF_BIG_W * M._GIF_BIG_H
    assert len(big) > 13 + 768 + n_px  # LZW stream exceeds raw pixels


def test_lzw_long_stream_dict_reset():
    # 20k random bytes force code-width growth to 12 bits AND at least
    # one dictionary reset (4096-entry table overflows several times)
    rng = random.Random(42)
    data = bytes(rng.randrange(256) for _ in range(20000))
    assert M._gif_lzw_decode(M._gif_lzw_encode(data)) == data


def test_lzw_kwkwk_case():
    # "aaaa..." generates the code==len(table) self-reference immediately
    data = b"\x05" * 64
    assert M._gif_lzw_decode(M._gif_lzw_encode(data)) == data


def test_not_gif_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        M._gif_decode(b"PNG12345678")


def test_missing_trailer_rejected():
    b = bytearray(M._gif_encode(3))
    with pytest.raises(ValueError, match="trailer"):
        M._gif_decode(bytes(b[:-1]))


def test_truncated_lzw_rejected():
    b = M._gif_encode(3)
    # image descriptor sits right after header(6) + LSD(7) + GCT(768);
    # (don't search for 0x2C — the grayscale palette contains byte 44)
    idx = 13 + 768
    assert b[idx] == 0x2C
    data_start = idx + 10 + 1  # descriptor + LZW min-code byte
    n0 = b[data_start]
    # keep the first sub-block's length byte but only a quarter of its
    # payload, then terminate: the stream is cut mid-code
    cut = b[: data_start + 1 + max(1, n0 // 4)]
    bad = cut + b"\x00\x3b"
    with pytest.raises(ValueError):
        M._gif_decode(bad)


def test_short_subblock_rejected():
    b = M._gif_encode(3)
    idx = 13 + 768
    data_start = idx + 11
    # drop everything after half the first sub-block with NO terminator:
    # the sub-block walk must fail cleanly, not IndexError
    bad = b[: data_start + 1 + b[data_start] // 2]
    with pytest.raises(ValueError, match="truncated GIF"):
        M._gif_decode(bad)


def test_gif_header_fields():
    b = M._gif_encode(9)
    assert b[:6] == b"GIF87a"
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    assert (sw, sh) == (M._GIF_W, M._GIF_H)
    assert flags & 0x80 and (2 << (flags & 7)) == 256


def test_encode_decode_dataframe_path(spark):
    df = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    out = {r.media_id: r for r in M.decode_gif(M.encode_gif(df)).collect()}
    assert len(out) == 120
    for mid in (0, 17, 39, 101):  # one of each tier incl. both big-tier ids
        ew, eh, swirl = M._gif_geometry(mid)
        exp = 3 * sum(
            (mid + 5 * x + 11 * y + swirl * x * y) % 256
            for y in range(eh)
            for x in range(ew)
        )
        assert out[mid].content_sum == exp
        assert (out[mid].width, out[mid].height) == (ew, eh)
