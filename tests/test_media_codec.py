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


# ---- pixel decode + resample --------------------------------------------


def test_bmp_pixel_roundtrip():
    """BMP stores bottom-up BGR rows with 4-byte stride padding; the
    decoder must hand back top-down RGB."""
    from durablestreams_spark.operators.media_codec import decode_pixels

    w, h, rgb = decode_pixels(build_bmp(5, 3, seed=7))[0]
    assert (w, h, len(rgb)) == (5, 3, 45)
    # builder pixel (x=2, y=1): v = 7+2+1 = 10, stored BGR(10,30,70)
    assert rgb[(1 * 5 + 2) * 3 : (1 * 5 + 2) * 3 + 3] == bytes((70, 30, 10))


def test_ppm_pixel_roundtrip():
    from durablestreams_spark.operators.media_codec import decode_pixels

    _w, _h, rgb = decode_pixels(build_ppm(4, 2, seed=1))[0]
    assert rgb == bytes((1 + i) & 0xFF for i in range(24))


def test_gif_lzw_frame_pixels():
    """Every frame's pixel must LZW-decode to its color-table entry —
    a wrong color table slice or bit-unpacking order changes the
    bytes."""
    from durablestreams_spark.operators.media_codec import decode_pixels

    frames = decode_pixels(build_gif(9, 4, 3, seed=2))
    assert len(frames) == 3
    for f, (fw, fh, p) in enumerate(frames):
        v = (2 + ((2 + f) & 3) * 85) & 0xFF
        assert (fw, fh, p) == (1, 1, bytes((v, v, v)))


def test_lzw_decoder_handles_growing_codes():
    """General LZW: a stream that actually grows the dictionary (not
    just clear-per-pixel like the builder emits) must decode — proves
    the decoder is not specialized to our encoder."""
    from durablestreams_spark.operators.media_codec import _lzw_decode

    # Classic LZW walkthrough, min_code_size=2 (clear=4, end=5):
    # codes: CLEAR 1 2 6(=1,2) END -> pixels 1 2 1 2.  Width bumps to
    # 4 bits only AFTER the code that fills the 3-bit space (giflib's
    # RunningCode rule), so 6 is still read at 3 bits, END at 4.
    codes = [(4, 3), (1, 3), (2, 3), (6, 3), (5, 4)]
    acc = bits = 0
    data = bytearray()
    for code, width in codes:
        acc |= code << bits
        bits += width
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        data.append(acc & 0xFF)
    assert _lzw_decode(2, bytes(data), 4) == bytes((1, 2, 1, 2))


def test_resize_nearest_downsamples_correctly():
    from durablestreams_spark.operators.media_codec import resize_nearest

    # 4x4 image whose pixel (x,y) = (y*4+x) in all channels
    rgb = bytes(v for i in range(16) for v in (i, i, i))
    out = resize_nearest(4, 4, rgb, 2, 2)
    # nearest with floor mapping: output (x,y) <- input (2x, 2y)
    assert out == bytes(v for i in (0, 2, 8, 10) for v in (i, i, i))


def test_resize_nearest_upsamples_1x1():
    from durablestreams_spark.operators.media_codec import resize_nearest

    out = resize_nearest(1, 1, bytes((9, 8, 7)), 3, 2)
    assert out == bytes((9, 8, 7)) * 6


def _encode_gif_frame(pixels: list[int], w: int, h: int) -> bytes:
    """Test-side GIF generator for ARBITRARY frame sizes: clear-per-
    pixel LZW (3-bit codes over a 4-color table), data split into
    proper <=255-byte sub-blocks — exercises the decoder's sub-block
    reassembly and long-stream paths the production builder's 1x1
    frames never reach."""
    acc = bits = 0
    data = bytearray()

    def emit(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += 3
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(4)  # CLEAR
    for p in pixels:
        emit(p & 3)
        emit(4)  # clear again: dictionary never grows
    emit(5)  # END
    if bits:
        data.append(acc & 0xFF)

    g = bytearray(b"GIF89a")
    g += struct.pack("<HH", w, h)
    g += bytes((0xF1, 0, 0))
    for i in range(4):
        g += bytes((i * 60, i * 60, i * 60))
    g += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    g += bytes((2,))
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        g += bytes((len(chunk),)) + chunk
    g += b"\x00\x3b"
    return bytes(g)


def test_gif_lzw_multi_subblock_frames():
    """Frames big enough that the LZW stream spans several 255-byte
    sub-blocks must still pixel-decode exactly."""
    from durablestreams_spark.operators.media_codec import decode_pixels

    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:  # hypothesis is in the container per the brief
        import random

        rnd = random.Random(7)
        for _ in range(10):
            w, h = rnd.randint(1, 25), rnd.randint(1, 25)
            pixels = [rnd.randint(0, 3) for _ in range(w * h)]
            fw, fh, rgb = decode_pixels(_encode_gif_frame(pixels, w, h))[0]
            expect = b"".join(bytes((p * 60,) * 3) for p in pixels)
            assert (fw, fh, rgb) == (w, h, expect)
        return

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=25),
        st.integers(min_value=1, max_value=25),
        st.randoms(use_true_random=False),
    )
    def check(w, h, rnd):
        pixels = [rnd.randint(0, 3) for _ in range(w * h)]
        fw, fh, rgb = decode_pixels(_encode_gif_frame(pixels, w, h))[0]
        expect = b"".join(bytes((p * 60,) * 3) for p in pixels)
        assert (fw, fh, rgb) == (w, h, expect)

    check()


def test_lzw_clear_resets_dictionary():
    """CLEAR mid-stream must drop every grown entry: a post-clear
    KwKwK code (== the fresh next_code) collides with a stale entry's
    id, and without the reset the decoder emits the dead entry's bytes
    instead of prev+prev[:1]."""
    from durablestreams_spark.operators.media_codec import _lzw_decode

    # min_code_size=2: clear=4, end=5, first free code=6.
    # Segment A grows entries 6=(1,2) and 7=(2,1); CLEAR; segment B
    # then uses code 6 as KwKwK (prev=(3) -> expect 3,3) — a stale
    # 6=(1,2) would surface as wrong pixels.
    codes = [
        (4, 3),          # CLEAR
        (1, 3), (2, 3),  # out 1,2          adds 6=(1,2)
        (1, 3),          # out 1            adds 7=(2,1), width->4
        (4, 4),          # CLEAR (back to 3-bit codes)
        (3, 3),          # out 3
        (6, 3),          # KwKwK: out 3,3   (stale table would say 1,2!)
        (5, 3),          # END
    ]
    acc = bits = 0
    data = bytearray()
    for code, width in codes:
        acc |= code << bits
        bits += width
        while bits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        data.append(acc & 0xFF)
    assert _lzw_decode(2, bytes(data), 7) == bytes((1, 2, 1, 3, 3, 3))


def test_wav_roundtrip_and_chunk_walk():
    """build_wav → decode_wav round-trips; the parser is a real chunk
    walker, so an extra LIST chunk between fmt and data must not
    confuse it, and malformed inputs raise."""
    import struct

    import pytest

    from durablestreams_spark.operators.media_codec import build_wav, decode_wav

    b = build_wav(37, 8000, 123)
    n, rate, total, peak = decode_wav(b)
    exp = [((123 * 31 + k * 997) % 2001) - 1000 for k in range(37)]
    assert (n, rate, total, peak) == (37, 8000, sum(exp), max(map(abs, exp)))

    # odd-length LIST chunk injected between fmt and data: the walker
    # must skip it (with word-alignment padding) and still find data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    patched = b[:fmt_end] + extra + b[fmt_end:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert decode_wav(patched) == (n, rate, total, peak)

    with pytest.raises(ValueError):
        decode_wav(b"nonsense bytes")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks


def test_feature_extract_branches_agree(spark):
    """The learned-encoder seam's two branches (onnxruntime
    InferenceSession vs pure-Python fallback) must produce identical
    rows; with no runtime on the host, the fallback must engage
    silently and the force-flag must be honored either way."""
    import os

    from durablestreams_spark.analytics.core import all_queries
    from durablestreams_spark.operators.multimodal import (
        onnx_encoder_available,
    )

    fn = all_queries()["multimodal_feature_extract"].fn
    sf = "/root/testdata/sf0.001"
    baseline = {tuple(r) for r in fn(spark, sf).collect()}
    assert len(baseline) > 0

    os.environ["SPARK_GRAFT_FORCE_NO_ONNX"] = "1"
    try:
        assert not onnx_encoder_available()
        forced = {tuple(r) for r in fn(spark, sf).collect()}
    finally:
        del os.environ["SPARK_GRAFT_FORCE_NO_ONNX"]
    assert forced == baseline

    if onnx_encoder_available():
        # host has onnxruntime: baseline above was the ONNX branch,
        # and the session must actually run a model
        from durablestreams_spark.operators.multimodal import _onnx_session

        sess = _onnx_session()
        import numpy as np

        (y,) = sess.run(None, {"x": np.eye(4, dtype=np.float32)})
        assert np.allclose(y, np.eye(4))


def test_phash_encoders_roundtrip_and_match_formula():
    """The re-encode fixture's core property, on real bytes: the same
    raster encoded as BMP and as PPM decodes back byte-identical, and
    dhash_bits over the decoded pixels equals the pure-formula hash
    the SQL oracle replays."""
    from durablestreams_spark.operators.media_codec import (
        decode_pixels,
        dhash_bits,
        encode_bmp_rgb,
        encode_ppm_rgb,
    )
    from durablestreams_spark.operators.multimodal import (
        PHASH_H,
        PHASH_W,
        _phash_pixel,
    )

    for d in (0, 7, 21, 90000007):
        rgb = bytes(
            _phash_pixel(d, i, False) for i in range(PHASH_W * PHASH_H * 3)
        )
        for enc in (encode_bmp_rgb, encode_ppm_rgb):
            w, h, back = decode_pixels(enc(PHASH_W, PHASH_H, rgb))[0]
            assert (w, h, back) == (PHASH_W, PHASH_H, rgb), enc
        # formula-side hash (what the oracle computes) == byte-side
        lums = []
        for r in range(8):
            gy = 2 * r
            row = []
            for c in range(9):
                gx = 2 * c
                p = 3 * (gy * PHASH_W + gx)
                row.append((rgb[p] + rgb[p + 1] + rgb[p + 2]) // 3)
            lums.append(row)
        want = 0
        for r in range(8):
            for c in range(8):
                if lums[r][c] > lums[r][c + 1]:
                    want |= 1 << (r * 8 + c)
        assert dhash_bits(PHASH_W, PHASH_H, rgb) == want


def test_phash_pigeonhole_matches_all_pairs_truth(spark):
    """Pigeonhole exactness: the banded equi-join matcher must return
    EXACTLY the all-pairs hamming<=PHASH_HAM truth over the fixture's
    hashes — 4x16 bands cannot miss a <=3 pair (>=1 intact band) and
    the verify step kills every >3 candidate.  Also pins the planted
    structure: every BMP<->PPM re-encode pair matches at hamming 0,
    and at least one perturbed pair matches at hamming >= 1."""
    import itertools

    from durablestreams_spark.operators.multimodal import (
        PHASH_HAM,
        PHASH_OFF,
        _phash_keys,
    )
    from durablestreams_spark.analytics.core import all_queries

    SF = "/root/testdata/sf0.001"
    keys = {
        r["media_id"]: (r["k0"], r["k1"], r["k2"], r["k3"])
        for r in _phash_keys(spark, SF).collect()
    }
    truth = set()
    for a, b in itertools.combinations(sorted(keys), 2):
        h = sum(bin(x ^ y).count("1") for x, y in zip(keys[a], keys[b]))
        if h <= PHASH_HAM:
            truth.add((a, b, h))
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in all_queries()["multimodal_phash_dedup"]
        .fn(spark, SF)
        .collect()
    }
    assert got == truth
    base = [m for m in keys if m < PHASH_OFF]
    assert base, "no planted media"
    for d in base:
        assert (d, d + PHASH_OFF, 0) in got, (
            f"re-encoded copy of {d} not matched at hamming 0"
        )
    assert any(h >= 1 for (_a, _b, h) in got), (
        "no perturbed pair matched — the hamming>0 path is vacuous"
    )


def test_phash_raster_vectorized_matches_scalar():
    """_phash_raster (numpy) must produce byte-identical rasters to
    the scalar _phash_pixel form the oracles replay."""
    from durablestreams_spark.operators.multimodal import (
        PHASH_H,
        PHASH_W,
        _phash_pixel,
        _phash_raster,
    )

    n = PHASH_W * PHASH_H * 3
    for d in (0, 7, 11, 22, 90000011):
        for noisy in (False, True):
            want = bytes(_phash_pixel(d, i, noisy) for i in range(n))
            assert _phash_raster(d, noisy) == want, (d, noisy)


def test_audio_encoders_roundtrip_and_match_formula():
    """The WAV PCM encoder/decoder round-trip, and the worker's
    fingerprint from REAL bytes must equal the direct frame-formula
    fingerprint — the parity that lets the SQL oracle replay only the
    65 frame amplitudes per doc."""
    from durablestreams_spark.operators.media_codec import (
        audio_fp_bits,
        decode_wav_pcm,
        encode_wav_pcm,
    )
    from durablestreams_spark.operators.multimodal import (
        AUDIO_ALT_PER,
        AUDIO_ALT_RATE,
        AUDIO_BASE_PER,
        AUDIO_BASE_RATE,
        AUDIO_FRAMES,
        _audio_amp,
    )

    for d in (0, 5, 35, 120):
        amps = [_audio_amp(d, f, False) for f in range(AUDIO_FRAMES)]
        base = [a for a in amps for _ in range(AUDIO_BASE_PER)]
        alt = [a for a in amps for _ in range(AUDIO_ALT_PER)]
        rb, sb = decode_wav_pcm(encode_wav_pcm(base, AUDIO_BASE_RATE))
        ra, sa = decode_wav_pcm(encode_wav_pcm(alt, AUDIO_ALT_RATE))
        assert (rb, list(sb)) == (AUDIO_BASE_RATE, base)
        assert (ra, list(sa)) == (AUDIO_ALT_RATE, alt)
        # frame-formula fingerprint: bit j iff amp(j+1) > amp(j)
        want = 0
        for j in range(AUDIO_FRAMES - 1):
            if amps[j + 1] > amps[j]:
                want |= 1 << j
        assert audio_fp_bits(sb, n_frames=AUDIO_FRAMES) == want
        # resample invariance: identical fingerprint from the 12 kHz
        # bytes even though every PCM byte differs
        assert audio_fp_bits(sa, n_frames=AUDIO_FRAMES) == want
        # volume invariance: doubling every sample flips nothing
        assert (
            audio_fp_bits([2 * s for s in sb], n_frames=AUDIO_FRAMES)
            == want
        )


def test_audio_replant_bytes_differ_from_seed_files():
    """The cross-doc re-recording plant must be byte-distinct from
    BOTH of its seed doc's encodes (review finding r15): it ships at
    a third rate, so a byte-level media dedup can never catch it —
    only the fingerprint rung can."""
    from durablestreams_spark.operators.media_codec import (
        encode_wav_pcm,
    )
    from durablestreams_spark.operators.multimodal import (
        AUDIO_FRAMES,
        AUDIO_MOD,
        AUDIO_OFF,
        _audio_amp,
        _audio_variant_rule,
    )

    found = 0
    for d in range(AUDIO_MOD, 500, AUDIO_MOD):
        variants = {m: (seed, noisy, per, rate)
                    for m, seed, noisy, per, rate in _audio_variant_rule(d)}
        re_id = d + 3 * AUDIO_OFF
        if re_id not in variants:
            continue
        found += 1
        seed, noisy, per, rate = variants[re_id]
        assert seed == d - AUDIO_MOD

        def _bytes(sd, ny, p, r):
            amps = [_audio_amp(sd, f, ny) for f in range(AUDIO_FRAMES)]
            return encode_wav_pcm(
                [a for a in amps for _ in range(p)], r
            )

        plant = _bytes(seed, noisy, per, rate)
        for m2, s2, n2, p2, r2 in _audio_variant_rule(seed):
            assert plant != _bytes(s2, n2, p2, r2), (d, m2)
    assert found > 0


def test_wav_decoder_rejects_corrupt_input_loudly():
    """Corrupt WAV input must raise ValueError, never decode
    partially (review findings r14): an over-long declared chunk
    length, a short fmt body, an odd data-chunk length, and a sample
    vector shorter than the fingerprint frame count."""
    import pytest as _pytest
    import struct

    from durablestreams_spark.operators.media_codec import (
        audio_fp_bits,
        decode_wav_pcm,
        encode_wav_pcm,
    )

    good = encode_wav_pcm([1, 2, 3, 4], 8000)
    # over-long declared data length: body silently truncated before
    data_at = good.index(b"data")
    bad_len = (
        good[: data_at + 4] + struct.pack("<I", 9999) + good[data_at + 8 :]
    )
    with _pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav_pcm(bad_len)
    # short fmt body: previously struct.error, now ValueError
    short_fmt = (
        b"RIFF" + struct.pack("<I", 16) + b"WAVE"
        + b"fmt " + struct.pack("<I", 8) + b"\x00" * 8
    )
    with _pytest.raises(ValueError, match="short fmt chunk"):
        decode_wav_pcm(short_fmt)
    # odd data-chunk length: previously dropped the trailing byte
    odd = (
        good[: data_at + 4]
        + struct.pack("<I", 3)
        + good[data_at + 8 : data_at + 11]
        + b"\x00"  # pad to word alignment so the walk stays in bounds
    )
    with _pytest.raises(ValueError, match="odd data chunk"):
        decode_wav_pcm(odd)
    # too few samples for the frame count: previously clamped to
    # deterministic-but-meaningless bits
    with _pytest.raises(ValueError, match="cannot fill"):
        audio_fp_bits([1, 2, 3], n_frames=65)


def test_audio_pigeonhole_matches_all_pairs_truth(spark):
    """Pigeonhole exactness for the audio matcher: banded equi-join ==
    all-pairs hamming<=AUDIO_HAM truth; every resampled pair matches
    at hamming 0 and at least one perturbed pair at hamming >= 1."""
    import itertools

    from durablestreams_spark.analytics.core import all_queries
    from durablestreams_spark.operators.multimodal import (
        AUDIO_HAM,
        AUDIO_OFF,
        _audio_fp_keys,
    )

    SF = "/root/testdata/sf0.001"
    keys = {
        r["media_id"]: (r["k0"], r["k1"], r["k2"], r["k3"])
        for r in _audio_fp_keys(spark, SF).collect()
    }
    truth = set()
    for a, b in itertools.combinations(sorted(keys), 2):
        h = sum(bin(x ^ y).count("1") for x, y in zip(keys[a], keys[b]))
        if h <= AUDIO_HAM:
            truth.add((a, b, h))
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in all_queries()["multimodal_audio_dedup"]
        .fn(spark, SF)
        .collect()
    }
    assert got == truth
    base = [m for m in keys if m < AUDIO_OFF]
    assert base, "no planted audio"
    for d in base:
        assert (d, d + AUDIO_OFF, 0) in got, (
            f"resampled copy of {d} not matched at hamming 0"
        )
    assert any(h >= 1 for (_a, _b, h) in got), (
        "no perturbed pair matched — the hamming>0 path is vacuous"
    )
