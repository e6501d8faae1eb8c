"""Pure-Python media codecs for the multimodal pipeline.

The container has no PIL/ffmpeg, but BMP / PPM / GIF metadata needs
only ``struct`` and byte arithmetic, so the *decode* step here is a
real codec, not a stub: :func:`decode_media` parses the actual bytes
(BITMAPINFOHEADER fields, the PPM ASCII header, a GIF block walk over
extensions / image descriptors / LZW sub-blocks) and works on any
spec-conformant file, not just ones we built.

:func:`build_media` is the fixture side: it emits small, structurally
valid files (the GIF LZW stream uses the clear-code-after-every-pixel
encoding, so a real decoder can decompress it) whose dimensions and
frame counts are deterministic functions of the inputs — which keeps
the DuckDB oracle for the graded queries expressible in plain SQL.

Beyond headers, :func:`decode_pixels` is a full pixel decode (BMP
bottom-up BGR rows with stride padding, PPM raw RGB, GIF frames
through a general variable-width LZW decoder and the global/local
color table) and :func:`resize_nearest` a numpy nearest-neighbor
resampler — the whole thumbnail path runs on real bytes end to end.

Scale note: these run inside ``mapInPandas`` workers over Arrow
batches, one call per row, O(payload) each — no state, no shuffle;
metadata decode is a header parse (cost independent of payload size),
pixel decode is O(pixels).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# builders — deterministic, structurally valid files
# ---------------------------------------------------------------------------


def build_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A valid 24-bpp bottom-up BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + padded pixel rows)."""
    row = width * 3
    pad = (4 - row % 4) % 4
    pixdata = bytearray()
    for y in range(height):
        for x in range(width):
            v = (seed + x + y) & 0xFF
            pixdata += bytes((v, (v * 3) & 0xFF, (v * 7) & 0xFF))
        pixdata += b"\x00" * pad
    size = 14 + 40 + len(pixdata)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixdata), 2835, 2835, 0, 0
    )
    return header + info + bytes(pixdata)


def build_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """A valid binary P6 PPM (ASCII header, raw RGB triples)."""
    head = f"P6\n{width} {height}\n255\n".encode()
    body = bytes(
        (seed + i) & 0xFF for i in range(width * height * 3)
    )
    return head + body


def _gif_lzw_1x1(pixel: int) -> bytes:
    """LZW stream for a 1x1 frame over a 4-color table: min code size 2,
    3-bit codes CLEAR(4) pixel END(5), packed LSB-first."""
    bits = 0
    acc = 0
    out = bytearray()
    for code in (4, pixel & 3, 5):
        acc |= code << bits
        bits += 3
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def build_gif(width: int, height: int, n_frames: int, seed: int = 0) -> bytes:
    """A valid animated GIF89a: logical screen ``width``x``height``,
    ``n_frames`` 1x1 sub-image frames (a frame may be smaller than the
    screen per spec — keeps the file tiny at any screen size)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes((0xF1, 0, 0))  # GCT present, size field 1 → 4 entries
    for i in range(4):  # global color table: 4 RGB entries
        v = (seed + i * 85) & 0xFF
        out += bytes((v, v, v))
    for f in range(n_frames):
        # graphics control extension (marks an animation frame)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", 10) + b"\x00\x00"
        # image descriptor: 1x1 sub-image at (0,0), no local table
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
        lzw = _gif_lzw_1x1(seed + f)
        out += bytes((2,))  # LZW minimum code size
        out += bytes((len(lzw),)) + lzw + b"\x00"  # one sub-block + terminator
    out += b"\x3b"
    return bytes(out)


def build_media(doc_id: int, payload: bytes) -> bytes:
    """Deterministic tiny media blob for a document row.  Format cycles
    by doc_id (bmp/ppm/gif); dimensions derive from the source payload
    length; GIF frame count from doc_id — all reproducible in the SQL
    oracle (see multimodal.py)."""
    n = len(payload)
    w = 1 + n % 64
    h = 1 + (n // 64) % 48
    kind = doc_id % 3
    if kind == 0:
        return build_bmp(w, h, seed=doc_id & 0xFF)
    if kind == 1:
        return build_ppm(w, h, seed=doc_id & 0xFF)
    return build_gif(w, h, 1 + doc_id % 8, seed=doc_id & 0xFF)


# ---------------------------------------------------------------------------
# decoder — a real header parser
# ---------------------------------------------------------------------------


def _decode_bmp(b: bytes) -> tuple[int, int, int, str]:
    if len(b) < 26:
        raise ValueError("truncated BMP")
    width, height = struct.unpack_from("<ii", b, 18)
    return width, abs(height), 1, "bmp"  # negative height = top-down rows


def _ppm_header(b: bytes) -> tuple[int, int, int]:
    """Parse the P6 header — "P6" ws width ws height ws maxval, with
    '#' comments allowed anywhere whitespace is — returning
    (width, height, offset of the raw pixel data).  The single shared
    grammar for metadata and pixel decode."""
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos] == 0x23:  # '#' comment to EOL
            while pos < len(b) and b[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(b) and b[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("bad PPM header")
        vals.append(int(b[start:pos]))
    # exactly one whitespace byte separates maxval from pixel data
    return vals[0], vals[1], pos + 1


def _decode_ppm(b: bytes) -> tuple[int, int, int, str]:
    w, h, _pos = _ppm_header(b)
    return w, h, 1, "ppm"


def _skip_subblocks(b: bytes, pos: int) -> int:
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _decode_gif(b: bytes) -> tuple[int, int, int, str]:
    width, height = struct.unpack_from("<HH", b, 6)
    flags = b[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            pos = _skip_subblocks(b, pos + 1)
        elif block == 0x2C:  # image descriptor
            lflags = b[pos + 8]
            pos += 9
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW minimum code size
            pos = _skip_subblocks(b, pos)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return width, height, n_frames, "gif"


def decode_media(payload: bytes) -> tuple[int, int, int, str]:
    """Parse (width, height, n_frames, format) out of a BMP, binary
    PPM, or GIF payload by reading its actual header bytes."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    raise ValueError(f"unrecognized media magic: {payload[:6]!r}")


# ---------------------------------------------------------------------------
# pixel decode + resample — still pure Python/numpy, no PIL
# ---------------------------------------------------------------------------


def _bmp_pixels(b: bytes) -> tuple[int, int, bytes]:
    """24-bpp BMP pixel data as top-down RGB bytes."""
    off = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    topdown = height < 0
    height = abs(height)
    row = width * 3
    stride = row + (4 - row % 4) % 4
    out = bytearray(row * height)
    for y in range(height):
        src = off + (y if topdown else height - 1 - y) * stride
        r = b[src : src + row]
        # BMP stores BGR — swap to RGB
        out[y * row : (y + 1) * row] = bytes(
            v for px in zip(r[2::3], r[1::3], r[0::3]) for v in px
        )
    return width, height, bytes(out)


def _ppm_pixels(b: bytes) -> tuple[int, int, bytes]:
    w, h, pos = _ppm_header(b)
    return w, h, b[pos : pos + w * h * 3]


def _lzw_decode(min_code_size: int, data: bytes, npix: int) -> bytes:
    """General GIF-flavor LZW decode (variable code width, LSB-first
    packing, CLEAR/END codes, 12-bit cap)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    base = {i: bytes((i,)) for i in range(clear)}
    table: dict[int, bytes] = dict(base)
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, total = 0, len(data) * 8
    while bitpos + code_size <= total and len(out) < npix:
        chunk = int.from_bytes(data[bitpos // 8 : bitpos // 8 + 4], "little")
        code = (chunk >> (bitpos % 8)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            # Full dictionary reset: stale high-code entries must not
            # survive, or a post-clear KwKwK code (== next_code) would
            # match a dead entry and decode garbage.
            code_size = min_code_size + 1
            table = dict(base)
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("corrupt LZW stream")
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    return bytes(out[:npix])


def _gif_pixels(b: bytes) -> list[tuple[int, int, bytes]]:
    """Each frame's sub-image as (width, height, RGB bytes), LZW-decoded
    through the global/local color table."""
    flags = b[10]
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = b[pos : pos + 3 * n]
        pos += 3 * n
    frames = []
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos = _skip_subblocks(b, pos + 1)
        elif block == 0x2C:
            fw, fh = struct.unpack_from("<HH", b, pos + 4)
            lflags = b[pos + 8]
            pos += 9
            table = gct
            if lflags & 0x80:
                n = 2 << (lflags & 0x07)
                table = b[pos : pos + 3 * n]
                pos += 3 * n
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while True:
                n = b[pos]
                pos += 1
                if n == 0:
                    break
                data += b[pos : pos + n]
                pos += n
            idx = _lzw_decode(min_code, bytes(data), fw * fh)
            rgb = bytearray()
            for i in idx:
                rgb += table[3 * i : 3 * i + 3]
            frames.append((fw, fh, bytes(rgb)))
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return frames


def decode_pixels(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Full pixel decode: list of (width, height, top-down RGB bytes)
    frames.  BMP/PPM yield one frame; GIF yields one per image block."""
    if payload[:2] == b"BM":
        return [_bmp_pixels(payload)]
    if payload[:2] == b"P6":
        return [_ppm_pixels(payload)]
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_pixels(payload)
    raise ValueError(f"unrecognized media magic: {payload[:6]!r}")


def resize_nearest(w: int, h: int, rgb: bytes, ow: int, oh: int) -> bytes:
    """Nearest-neighbor resample of top-down RGB bytes to (ow, oh) —
    the pure-numpy stand-in for PIL's thumbnail resampling."""
    import numpy as np

    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(oh) * h) // oh
    xs = (np.arange(ow) * w) // ow
    return a[ys][:, xs].tobytes()


# ---------------------------------------------------------------------------
# audio — canonical RIFF/WAVE 16-bit mono PCM
# ---------------------------------------------------------------------------


def build_wav(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """A valid 44-byte-header RIFF/WAVE file with 16-bit mono PCM.
    Samples are the deterministic integer sequence
    ``s_k = ((seed*31 + k*997) % 2001) - 1000`` so every PCM-level
    statistic (sum, peak) is restatable arithmetically in the SQL
    oracle while the decoder parses real bytes."""
    import struct

    pcm = b"".join(
        struct.pack("<h", ((seed * 31 + k * 997) % 2001) - 1000)
        for k in range(n_samples)
    )
    byte_rate = sample_rate * 2  # mono, 16-bit
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def decode_wav(b: bytes) -> tuple[int, int, int, int]:
    """Parse a RIFF/WAVE blob: walk the chunk list (not a fixed-44
    assumption — handles extra chunks like LIST/INFO), read the fmt
    chunk's sample rate, then fold the data chunk's 16-bit samples to
    (n_samples, sample_rate, sum_amplitude, peak_amplitude).  Raises
    ValueError on non-WAV bytes."""
    import struct

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    bits = None
    channels = None
    pcm = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + clen > len(b):
            # same loud-failure policy as decode_wav_pcm: an
            # over-long declared length must never silently truncate
            raise ValueError(
                f"truncated WAV chunk {cid!r}: declares {clen} bytes, "
                f"{len(b) - pos - 8} remain"
            )
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"short fmt chunk: {len(body)} bytes, need >= 16"
                )
            fmt_tag, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag}")
        elif cid == b"data":
            if clen % 2 != 0:
                raise ValueError(f"odd data chunk length {clen}")
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"expected 16-bit mono, got {bits}-bit x{channels}")
    n = len(pcm) // 2
    samples = struct.unpack(f"<{n}h", pcm)
    total = sum(samples)
    peak = max((abs(s) for s in samples), default=0)
    return n, sample_rate, total, peak


# ---------------------------------------------------------------------------
# raster encoders + difference hash (the pixel-space near-dup family)
# ---------------------------------------------------------------------------


def encode_bmp_rgb(width: int, height: int, rgb: bytes) -> bytes:
    """Encode a top-down RGB raster as a valid 24-bpp bottom-up BMP
    (BGR byte order, 4-byte row padding) — the re-encode side of the
    pixel-dedup fixture: the same raster shipped as BMP and as PPM
    must decode back byte-identical through decode_pixels."""
    assert len(rgb) == width * height * 3
    row = width * 3
    pad = (4 - row % 4) % 4
    pixdata = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            p = 3 * (y * width + x)
            r, g, b = rgb[p], rgb[p + 1], rgb[p + 2]
            pixdata += bytes((b, g, r))  # BGR
        pixdata += b"\x00" * pad
    size = 14 + 40 + len(pixdata)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, len(pixdata), 2835, 2835, 0, 0,
    )
    return header + info + bytes(pixdata)


def encode_ppm_rgb(width: int, height: int, rgb: bytes) -> bytes:
    """Encode a top-down RGB raster as a binary P6 PPM — byte-for-byte
    the raster after the ASCII header."""
    assert len(rgb) == width * height * 3
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def dhash_bits(width: int, height: int, rgb: bytes) -> int:
    """64-bit difference hash over the luminance grid: sample a 9x8
    nearest-neighbor grid (gx = c*width//9, gy = r*height//8), integer
    luminance (R+G+B)//3, bit j = r*8+c set iff lum(r,c) > lum(r,c+1).
    All-integer arithmetic so the SQL oracle replays it exactly."""
    bits = 0
    for r in range(8):
        gy = (r * height) // 8
        lums = []
        for c in range(9):
            gx = (c * width) // 9
            p = 3 * (gy * width + gx)
            lums.append((rgb[p] + rgb[p + 1] + rgb[p + 2]) // 3)
        for c in range(8):
            if lums[c] > lums[c + 1]:
                bits |= 1 << (r * 8 + c)
    return bits


def encode_wav_pcm(samples, sample_rate: int) -> bytes:
    """RIFF/WAVE 16-bit mono PCM from an EXPLICIT sample sequence —
    the audio analog of encode_bmp_rgb: the audio near-dup fixture
    builds real files from a deterministic signal and the decoder
    must earn the samples back from the bytes."""
    import struct

    pcm = b"".join(struct.pack("<h", int(s)) for s in samples)
    byte_rate = sample_rate * 2  # mono, 16-bit
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def decode_wav_pcm(b: bytes) -> tuple[int, tuple]:
    """(sample_rate, samples) via the same chunk walk as decode_wav —
    the full PCM vector, for consumers that fingerprint the signal
    rather than fold it to aggregates."""
    import struct

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    bits = None
    channels = None
    pcm = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + clen > len(b):
            # an over-long declared length must fail loudly, never
            # silently truncate the chunk body (review finding r14)
            raise ValueError(
                f"truncated WAV chunk {cid!r}: declares {clen} bytes, "
                f"{len(b) - pos - 8} remain"
            )
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"short fmt chunk: {len(body)} bytes, need >= 16"
                )
            fmt_tag, channels, sample_rate = struct.unpack_from(
                "<HHI", body, 0
            )
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag}")
        elif cid == b"data":
            if clen % 2 != 0:
                # 16-bit PCM can never carry an odd byte count —
                # dropping the trailing byte would decode a corrupt
                # file partially instead of rejecting it
                raise ValueError(f"odd data chunk length {clen}")
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"expected 16-bit mono, got {bits}-bit x{channels}")
    n = len(pcm) // 2
    return sample_rate, struct.unpack(f"<{n}h", pcm)


def audio_fp_bits(samples, n_frames: int = 65) -> int:
    """64-bit sign-of-delta audio fingerprint: split the PCM vector
    into ``n_frames`` equal-position frames (frame f = samples
    [f*n//F, (f+1)*n//F)), and set bit j iff frame j+1's mean
    amplitude exceeds frame j's.  The mean comparison is EXACT
    rational arithmetic — sum(j+1)*len(j) > sum(j)*len(j+1), never a
    floored mean, so the comparison cannot flip on a rounding edge
    when frame lengths differ.  Relative frame means are invariant
    to any resampling that preserves per-frame means (frames hold
    more samples of the same signal) and to positive volume scaling
    (c*a > c*b iff a > b, exact under cross-multiplication) — the
    two re-encodes the byte-level gate is blind to.  All-integer, so
    the SQL oracle (which replays the fixture's per-frame
    amplitudes — equal-valued within a frame, making the mean the
    amplitude itself) matches bit for bit."""
    n = len(samples)
    if n < n_frames:
        # every frame must hold >= 1 sample: a shorter vector would
        # yield deterministic-but-meaningless bits that could mask a
        # decoder regression returning too few samples (review
        # finding r14; the fixture always supplies 2-3 per frame)
        raise ValueError(
            f"{n} samples cannot fill {n_frames} fingerprint frames"
        )
    sums, lens = [], []
    for f in range(n_frames):
        lo = (f * n) // n_frames
        hi = ((f + 1) * n) // n_frames
        seg = samples[lo:hi]
        sums.append(sum(seg))
        lens.append(len(seg))
    bits = 0
    for j in range(n_frames - 1):
        if sums[j + 1] * lens[j] > sums[j] * lens[j + 1]:
            bits |= 1 << j
    return bits
