"""Baseline JFIF JPEG codec (kernels.jpegcodec): spec-structure checks,
roundtrip PSNR, and the generator-mix invariant."""

import struct

import numpy as np
import pytest

from s2geometry_spark.kernels.imagecodec import decode, gen_pixels, psnr_db
from s2geometry_spark.kernels.jpegcodec import decode_jpeg, encode_jpeg


def test_marker_structure_is_spec_compliant():
    buf = encode_jpeg(gen_pixels(7, 16, 16), 90)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    # walk the marker segments up to SOS
    pos, seen = 2, []
    while pos < len(buf):
        assert buf[pos] == 0xFF
        marker = buf[pos + 1]
        seen.append(marker)
        ln = struct.unpack_from(">H", buf, pos + 2)[0]
        pos += 2 + ln
        if marker == 0xDA:
            break
    assert seen[0] == 0xE0  # JFIF APP0
    assert seen.count(0xDB) == 2 and seen.count(0xC4) == 4
    assert 0xC0 in seen and seen[-1] == 0xDA


def test_entropy_stream_has_no_bare_ff():
    """Every 0xFF inside the scan must be stuffed (followed by 0x00) —
    the property real decoders rely on."""
    buf = encode_jpeg(gen_pixels(11, 24, 24), 98)
    # find SOS payload start
    pos = 2
    while True:
        marker = buf[pos + 1]
        ln = struct.unpack_from(">H", buf, pos + 2)[0]
        pos += 2 + ln
        if marker == 0xDA:
            break
    scan = buf[pos : len(buf) - 2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00
            i += 2
        else:
            i += 1


@pytest.mark.parametrize("idx,w,h", [(0, 8, 8), (1, 9, 21), (2, 24, 24), (3, 17, 11)])
def test_roundtrip_psnr(idx, w, h):
    p = gen_pixels(idx, w, h)
    d = decode_jpeg(encode_jpeg(p, 98))
    assert d.shape == p.shape
    assert psnr_db(p, d) >= 40.0


def test_flat_image_is_near_exact():
    p = np.full((16, 16, 3), 137, np.uint8)
    d = decode_jpeg(encode_jpeg(p, 90))
    assert psnr_db(p, d) >= 50.0


def test_quality_monotone():
    p = gen_pixels(5, 20, 20)
    psnrs = [psnr_db(p, decode_jpeg(encode_jpeg(p, q))) for q in (50, 75, 90, 98)]
    assert psnrs == sorted(psnrs)
    sizes = [len(encode_jpeg(p, q)) for q in (50, 75, 90, 98)]
    assert sizes == sorted(sizes)


def test_dispatch_through_generic_decode():
    p = gen_pixels(9, 12, 14)
    px, fmt = decode(encode_jpeg(p, 98))
    assert fmt == "jpeg"
    assert psnr_db(p, px) >= 40.0


def test_non_multiple_of_8_dims():
    for w, h in [(8, 9), (9, 8), (23, 17), (10, 26)]:
        p = gen_pixels(w * 31 + h, w, h)
        d = decode_jpeg(encode_jpeg(p, 98))
        assert d.shape == (h, w, 3)
        assert psnr_db(p, d) >= 40.0


def test_rejects_progressive_and_truncation():
    buf = bytearray(encode_jpeg(gen_pixels(4, 16, 16), 90))
    # find SOF0 and flip it to SOF2 (progressive)
    pos = 2
    while True:
        marker = buf[pos + 1]
        if marker == 0xC0:
            buf[pos + 1] = 0xC2
            break
        ln = struct.unpack_from(">H", bytes(buf), pos + 2)[0]
        pos += 2 + ln
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")


def test_generator_mix_invariant():
    from s2geometry_spark.kernels import imagecodec
    from s2geometry_spark.sources.images import FMTS, make_row

    assert "jpeg" in FMTS
    saw_jpeg = False
    for idx in range(len(FMTS) * 3):
        r = make_row(idx)
        px, fmt = imagecodec.decode(bytes(r["bytes"]))
        src = imagecodec.gen_pixels(idx, r["w"], r["h"])
        assert fmt == r["fmt"]
        if fmt in imagecodec.LOSSLESS:
            assert np.array_equal(px, src)
        else:
            assert imagecodec.psnr_db(src, px) >= imagecodec.PSNR_MIN_DB
        saw_jpeg |= fmt == "jpeg"
    assert saw_jpeg


def test_zigzag_matches_t81_spec_table():
    """ADVICE r3 regression: ZIGZAG must be the ITU-T T.81 Figure A.6
    order (NOT its transpose) so externally-decoded files aren't
    block-transposed."""
    from s2geometry_spark.kernels.jpegcodec import UNZIGZAG, ZIGZAG

    spec = [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert list(ZIGZAG) == spec
    assert list(ZIGZAG[UNZIGZAG]) == list(range(64))


def test_mjpeg_demux_and_decode():
    """MJPEG container: frame_offsets tiles the payload exactly, each
    extent is a complete JFIF frame, and decode_mjpeg equals per-frame
    decode_jpeg."""
    from s2geometry_spark.kernels.jpegcodec import (
        decode_mjpeg,
        encode_mjpeg,
        frame_offsets,
    )

    frames = np.stack([gen_pixels(100 + f, 14, 11) for f in range(5)])
    buf = encode_mjpeg(frames, 92)
    offs = frame_offsets(buf)
    assert len(offs) == 5
    assert offs[0][0] == 0 and offs[-1][1] == len(buf)
    for (s0, e0), (s1, _) in zip(offs, offs[1:]):
        assert e0 == s1
    dec = decode_mjpeg(buf)
    for (s, e), d in zip(offs, dec):
        assert buf[s : s + 2] == b"\xff\xd8" and buf[e - 2 : e] == b"\xff\xd9"
        assert np.array_equal(decode_jpeg(buf[s:e]), d)


def test_mjpeg_rejects_bad_payloads():
    from s2geometry_spark.kernels.jpegcodec import decode_mjpeg, encode_mjpeg

    with pytest.raises(ValueError):
        decode_mjpeg(b"")
    # non-uniform frame geometry is not a frame stack
    mixed = encode_mjpeg(gen_pixels(1, 8, 8)[None]) + encode_mjpeg(
        gen_pixels(2, 16, 8)[None]
    )
    with pytest.raises(ValueError):
        decode_mjpeg(mixed)
