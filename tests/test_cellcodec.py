"""EncodedS2CellIdVector codec: byte-size goldens ported from
encoded_s2cell_id_vector_test.cc:81-255 (sizes are the observable wire
contract), round-trip identity, lower_bound semantics, and malformed-
input rejection."""

import numpy as np
import pytest

from s2geometry_spark.kernels import cellcodec
from s2geometry_spark.kernels import cellid as ci

U = np.uint64
SENTINEL = (1 << 64) - 1


def roundtrip(ids, expected_bytes=None):
    v = np.array(ids, dtype=np.uint64)
    buf = cellcodec.encode_cell_ids(v)
    if expected_bytes is not None:
        assert len(buf) == expected_bytes, (len(buf), expected_bytes)
    out = cellcodec.decode_cell_ids(buf)
    assert out.dtype == np.uint64
    np.testing.assert_array_equal(out, v)
    return buf


# ---- goldens: encoded_s2cell_id_vector_test.cc:81-255 ----

def test_golden_sizes_small():
    roundtrip([], 2)                                   # Empty:81
    roundtrip([0], 3)                                  # None:85
    roundtrip([0, 0], 4)                               # NoneNone:89
    roundtrip([SENTINEL], 10)                          # Sentinel:93
    roundtrip([SENTINEL, SENTINEL], 11)                # SentinelSentinel:103
    roundtrip([0, SENTINEL, 0], 26)                    # NoneSentinelNone:107
    roundtrip([0x6, 0xE, 0x7E], 5)                     # InvalidCells:112
    roundtrip([0x3, 0x7, 0x177], 5)                    # OneByteLeafCells:117
    roundtrip([0xC, 0x1C, 0x47C], 5)                   # OneByteLevel29:123
    roundtrip([0x30, 0x70, 0x1770], 6)                 # OneByteLevel28:129
    roundtrip([0x300, 0x1C00, 0x7000, 0xFF00], 6)      # MixedLevels:135


def test_golden_maximum_shift_cell():
    # "0/00" = face 0, two child-0 steps -> level 2 (test.cc:97-101)
    cell = int(ci.from_debug_string(["0/00"])[0])
    roundtrip([cell], 3)


def test_golden_prefix_and_base():
    roundtrip(                                          # WithPrefix:140
        [0x1234567800000300, 0x1234567800001C00,
         0x1234567800007000, 0x123456780000FF00], 10)
    roundtrip(                                          # BaseValue:148
        [0x00FFFF0000000000, 0x0100FC0000000000,
         0x0100500000000000, 0x0100330000000000], 9)


def test_golden_face_and_children():
    faces = [int(np.asarray(ci.from_face(f)).reshape(-1)[0]) for f in range(6)]
    roundtrip(faces, 8)                                 # SixFaceCells:181
    parent = ci.from_debug_string(["3/012301230"])      # FourLevel10:189
    kids = [int(ci.child(parent, k)[0]) for k in range(4)]
    roundtrip(kids, 8)


def test_golden_covering_cells():
    # CoveringCells:218-255 — 97 mixed-level covering ids -> 488 bytes
    ids = [
        0x414A617F00000000, 0x414A61C000000000, 0x414A624000000000,
        0x414A63C000000000, 0x414A647000000000, 0x414A64C000000000,
        0x414A653000000000, 0x414A704000000000, 0x414A70C000000000,
        0x414A714000000000, 0x414A71B000000000, 0x414A7A7C00000000,
        0x414A7AC000000000, 0x414A8A4000000000, 0x414A8BC000000000,
        0x414A8C4000000000, 0x414A8D7000000000, 0x414A8DC000000000,
        0x414A914000000000, 0x414A91C000000000, 0x414A924000000000,
        0x414A942C00000000, 0x414A95C000000000, 0x414A96C000000000,
        0x414AB0C000000000, 0x414AB14000000000, 0x414AB34000000000,
        0x414AB3C000000000, 0x414AB44000000000, 0x414AB4C000000000,
        0x414AB6C000000000, 0x414AB74000000000, 0x414AB8C000000000,
        0x414AB94000000000, 0x414ABA1000000000, 0x414ABA3000000000,
        0x414ABBC000000000, 0x414ABE4000000000, 0x414ABEC000000000,
        0x414ABF4000000000, 0x46B5454000000000, 0x46B545C000000000,
        0x46B5464000000000, 0x46B547C000000000, 0x46B5487000000000,
        0x46B548C000000000, 0x46B5494000000000, 0x46B54A5400000000,
        0x46B54AC000000000, 0x46B54B4000000000, 0x46B54BC000000000,
        0x46B54C7000000000, 0x46B54C8004000000, 0x46B54EC000000000,
        0x46B55AD400000000, 0x46B55B4000000000, 0x46B55BC000000000,
        0x46B55C4000000000, 0x46B55C8100000000, 0x46B55DC000000000,
        0x46B55E4000000000, 0x46B5604000000000, 0x46B560C000000000,
        0x46B561C000000000, 0x46CA424000000000, 0x46CA42C000000000,
        0x46CA43C000000000, 0x46CA444000000000, 0x46CA45C000000000,
        0x46CA467000000000, 0x46CA469000000000, 0x46CA5FC000000000,
        0x46CA604000000000, 0x46CA60C000000000, 0x46CA674000000000,
        0x46CA679000000000, 0x46CA67F000000000, 0x46CA684000000000,
        0x46CA855000000000, 0x46CA8C4000000000, 0x46CA8CC000000000,
        0x46CA8E5400000000, 0x46CA8EC000000000, 0x46CA8F0100000000,
        0x46CA8FC000000000, 0x46CA900400000000, 0x46CA98C000000000,
        0x46CA994000000000, 0x46CA99C000000000, 0x46CA9A4000000000,
        0x46CA9AC000000000, 0x46CA9BD500000000, 0x46CA9E4000000000,
        0x46CA9EC000000000, 0x46CAF34000000000, 0x46CAF4C000000000,
        0x46CAF54000000000,
    ]
    assert len(ids) == 97
    roundtrip(ids, 488)


def test_header_shift_range():
    # MaxShiftRange:157 — extended shift byte 27 -> shift_code 56, valid
    ok = bytes([(31 << 3) + 1, 27, 1, 0])
    assert len(cellcodec.decode_cell_ids(ok)) == 0
    # ShiftOutOfRange:169 — 28 -> shift_code 57, must be rejected
    bad = bytes([(31 << 3) + 1, 28, 1, 0])
    with pytest.raises(ValueError):
        cellcodec.decode_cell_ids(bad)


def test_lower_bound_limits():
    # LowerBoundLimits:256-270: Begin(30).id()==1, End(30).id()==0xC<<60
    first, last = 1, 0xC000000000000000 - 1
    buf = cellcodec.encode_cell_ids(np.array([first, last], np.uint64))
    assert cellcodec.lower_bound(buf, 0) == 0
    assert cellcodec.lower_bound(buf, first) == 0
    assert cellcodec.lower_bound(buf, first + 2) == 1
    assert cellcodec.lower_bound(buf, last - 2) == 1
    assert cellcodec.lower_bound(buf, last) == 1
    assert cellcodec.lower_bound(buf, last + 2) == 2
    assert cellcodec.lower_bound(buf, SENTINEL) == 2


def test_lower_bound_matches_searchsorted():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.integers(0, 1 << 63, 500, dtype=np.uint64) | U(1))
    buf = cellcodec.encode_cell_ids(ids)
    targets = np.concatenate([ids[::7], ids[::5] + U(2), ids[::11] - U(2)])
    for t in targets.tolist():
        if t >= 0xC000000000000000:
            want = len(ids)
        else:
            want = int(np.searchsorted(ids, U(t), side="left"))
        assert cellcodec.lower_bound(buf, t) == want


def test_roundtrip_random_mixes():
    rng = np.random.default_rng(11)
    for trial in range(30):
        n = int(rng.integers(0, 200))
        lvl = int(rng.integers(0, 31))
        mode = trial % 3
        if mode == 0:  # same level: odd multiples of the level lsb
            pos = rng.integers(0, 1 << 20, n, dtype=np.uint64)
            step = np.uint64(2) << np.uint64(2 * (30 - lvl))
            lo = np.uint64(1) << np.uint64(2 * (30 - lvl))
            ids = lo + step * pos
        elif mode == 1:  # raw random (need not be valid cells)
            ids = rng.integers(0, 1 << 63, n, dtype=np.uint64)
        else:  # shared prefix
            pref = np.uint64(rng.integers(0, 1 << 24)) << np.uint64(40)
            ids = pref + rng.integers(0, 1 << 16, n, dtype=np.uint64)
        buf = cellcodec.encode_cell_ids(ids)
        np.testing.assert_array_equal(
            cellcodec.decode_cell_ids(buf), ids.astype(np.uint64)
        )
        # never larger than raw 8-byte encoding + header slack
        assert len(buf) <= 8 * max(1, n) + 11


def test_truncated_inputs_rejected():
    buf = cellcodec.encode_cell_ids(
        np.array([0x300, 0x1C00, 0x7000], np.uint64)
    )
    for cut in range(1, len(buf)):
        try:
            out = cellcodec.decode_cell_ids(buf[:cut])
        except ValueError:
            continue
        # a prefix that still parses must parse to a shorter vector
        assert len(out) < 3
