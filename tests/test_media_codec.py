"""The multimodal decode path must be a real byte parser: build→decode
round-trips, plus decoding hand-written files the builder never made
(top-down BMP, commented PPM, GIF with an extension block and a local
color table) to prove it isn't just the builder's inverse."""

import struct

import pytest

from durablestreams_spark.operators.media_codec import (
    build_bmp,
    build_gif,
    build_media,
    build_ppm,
    decode_media,
)


@pytest.mark.parametrize("w,h", [(1, 1), (13, 7), (64, 48)])
def test_bmp_roundtrip(w, h):
    assert decode_media(build_bmp(w, h, seed=5)) == (w, h, 1, "bmp")


@pytest.mark.parametrize("w,h", [(1, 1), (40, 9), (64, 48)])
def test_ppm_roundtrip(w, h):
    assert decode_media(build_ppm(w, h, seed=9)) == (w, h, 1, "ppm")


@pytest.mark.parametrize("frames", [1, 3, 8])
def test_gif_roundtrip(frames):
    assert decode_media(build_gif(33, 21, frames, seed=2)) == (33, 21, frames, "gif")


def test_build_media_matches_oracle_functions():
    """build_media's metadata must equal the SQL oracle's restatement:
    w = 1 + len % 64, h = 1 + (len // 64) % 48, fmt by doc_id % 3,
    gif frames 1 + doc_id % 8."""
    for doc_id, text in [(0, b"x" * 10), (1, b"y" * 100), (2, b"z" * 700), (14, b"")]:
        w, h, n, fmt = decode_media(build_media(doc_id, text))
        assert w == 1 + len(text) % 64
        assert h == 1 + (len(text) // 64) % 48
        assert fmt == ["bmp", "ppm", "gif"][doc_id % 3]
        assert n == (1 + doc_id % 8 if fmt == "gif" else 1)


def test_decodes_foreign_topdown_bmp():
    """A top-down BMP (negative biHeight) the builder never produces."""
    row = b"\x00\x00\x00\x00"  # 1px * 3B + 1B pad
    info = struct.pack("<IiiHHIIiiII", 40, 1, -2, 1, 24, 0, 8, 0, 0, 0, 0)
    bmp = struct.pack("<2sIHHI", b"BM", 14 + 40 + 8, 0, 0, 54) + info + row * 2
    assert decode_media(bmp) == (1, 2, 1, "bmp")


def test_decodes_foreign_commented_ppm():
    """P6 with an interleaved comment line — legal, builder never emits."""
    ppm = b"P6\n# made by hand\n3 2\n# another\n255\n" + b"\x01" * 18
    assert decode_media(ppm) == (3, 2, 1, "ppm")


def test_decodes_foreign_gif_with_extras():
    """GIF87a with a comment extension and a per-frame local color
    table — block shapes the builder never emits."""
    g = bytearray(b"GIF87a")
    g += struct.pack("<HH", 9, 4)
    g += bytes((0x00, 0, 0))  # no global color table
    g += b"\x21\xfe\x05hello\x00"  # comment extension, one sub-block
    # frame with a 2-entry local color table
    g += b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + bytes((0x80,))
    g += b"\x00\x00\x00\xff\xff\xff"  # local table (2 * RGB)
    g += bytes((2,)) + bytes((2, 0x44, 0x01)) + b"\x00"  # lzw data
    g += b"\x3b"
    assert decode_media(bytes(g)) == (9, 4, 1, "gif")


def test_unknown_magic_rejected():
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n")
