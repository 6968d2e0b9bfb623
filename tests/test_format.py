"""Golden tests for the format layer: tables, headers, frame geometry.

Expected table values are the QOA spec constants (https://qoaformat.org),
matching the reference's tables at /root/reference/src/lib.rs:22-27,847-864.
"""

import numpy as np

from qoaudio_tpu import format as fmt


def test_constants():
    assert fmt.QOA_SLICE_LEN == 20
    assert fmt.QOA_LMS_LEN == 4
    assert fmt.QOA_HEADER_SIZE == 8
    assert fmt.QOA_MAGIC == int.from_bytes(b"qoaf", "big")
    assert fmt.QOA_FRAME_LEN == 5120
    assert fmt.QOA_MAX_CHANNELS == 8


def test_quant_tab():
    expected = [7, 7, 7, 5, 5, 3, 3, 1, 0, 0, 2, 2, 4, 4, 6, 6, 6]
    assert fmt.QOA_QUANT_TAB.tolist() == expected


def test_reciprocal_tab():
    expected = [
        65536, 9363, 3121, 1457, 781, 475, 311, 216,
        156, 117, 90, 71, 57, 47, 39, 32,
    ]
    assert fmt.QOA_RECIPROCAL_TAB.tolist() == expected


def test_dequant_tab():
    dq = fmt.QOA_DEQUANT_TAB
    assert dq.shape == (16, 8)
    assert dq[0].tolist() == [1, -1, 3, -3, 5, -5, 7, -7]
    assert dq[1].tolist() == [5, -5, 18, -18, 32, -32, 49, -49]
    assert dq[7].tolist() == [228, -228, 760, -760, 1368, -1368, 2128, -2128]
    assert dq[15].tolist() == [
        1536, -1536, 5120, -5120, 9216, -9216, 14336, -14336,
    ]
    # odd codes are exact negations of even codes
    assert np.all(dq[:, 1::2] == -dq[:, 0::2])
    assert np.all(fmt.QOA_DEQUANT_MAG == dq[:, 0::2])


def test_scalefactor_tab():
    # round((s+1)^2.75)
    assert fmt.QOA_SCALEFACTOR_TAB.tolist() == [
        1, 7, 21, 45, 84, 138, 211, 304, 421, 562, 731, 928, 1157, 1419,
        1715, 2048,
    ]


def test_frame_size():
    # 8 header + 16 B LMS per channel + 8 B per slice per channel
    assert fmt.qoa_frame_size(2, 256) == 8 + 32 + 8 * 256 * 2
    assert fmt.qoa_frame_size(1, 1) == 8 + 16 + 8
    # fixture geometry: 467 full frames of 4136 B + final 2520 B
    assert fmt.qoa_frame_size(2, 256) == 4136
    assert fmt.qoa_frame_size(2, 155) == 2520


def test_file_header_roundtrip():
    data = fmt.pack_file_header(2_394_122)
    assert len(data) == 8
    assert fmt.unpack_file_header(data) == 2_394_122


def test_file_header_bad_magic():
    import pytest

    from qoaudio_tpu.errors import NotQoaFile

    with pytest.raises(NotQoaFile):
        fmt.unpack_file_header(b"nope0000")


def test_frame_header_roundtrip():
    word = fmt.pack_frame_header(2, 44100, 5120, 4136)
    assert fmt.unpack_frame_header(word) == (2, 44100, 5120, 4136)
    # bit layout: channels in the top byte
    assert word >> 56 == 2
    assert (word >> 32) & 0xFFFFFF == 44100
