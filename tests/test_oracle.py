"""Tests for the in-repo scalar/numpy oracle codec.

The oracle is the ground truth the device kernels are verified against, so
it is itself pinned hard against the real fixture's known geometry and the
reference's behavioral tests (round-trip bounds, streaming equivalence).
"""

import numpy as np
import pytest

from qoaudio_tpu import bitstream as bs
from qoaudio_tpu import format as fmt
from qoaudio_tpu import reference as ref

from conftest import (
    FIXTURE_SAMPLES_PER_CHANNEL,
    make_noise,
    make_sine,
)


def test_qoa_div_formula():
    # qoa_div = fixed-point reciprocal multiply with +0.5 bias, then a sign
    # correction that pushes any nonzero quotient away from zero; validate
    # against exact big-integer arithmetic in the non-wrapping range
    for sf in range(16):
        recip = int(fmt.QOA_RECIPROCAL_TAB[sf])
        for v in [-32768, -1000, -21, -3, -1, 0, 1, 2, 20, 999, 32767]:
            prod = v * recip + (1 << 15)
            assert abs(prod) < (1 << 31)  # no wrap for these inputs
            n = prod >> 16
            want = n + ((v > 0) - (v < 0)) - ((n > 0) - (n < 0))
            assert ref.qoa_div(v, sf) == want, (v, sf)
    # spot values: sf=0 (reciprocal 65536 => n = v rounded trivially)
    assert ref.qoa_div(5, 0) == 5
    assert ref.qoa_div(-5, 0) == -5
    # sf=1 (sf value 7): 10/7 -> 1, -3/7 -> -1 (pushed away from zero)
    assert ref.qoa_div(10, 1) == 1
    assert ref.qoa_div(-3, 1) == -1
    assert ref.qoa_div(0, 1) == 0


def test_qoa_div_wrapping_golden():
    # for large residuals the i32 multiply wraps by design
    # (src/lib.rs:606-617); pin the wrapped results
    assert ref.qoa_div(-70000, 0) == -4464
    assert ref.qoa_div(70000, 0) == 4464
    # not a wrap, but the reciprocal approximation is off-by-one vs true
    # rounded division here — pinned deliberately
    assert ref.qoa_div(-70000, 1) == -10001
    # interior wrap check computed from two's-complement arithmetic
    n = ref.wrap32(ref.wrap32(-70000 * 65536) + (1 << 15)) >> 16
    assert ref.qoa_div(-70000, 0) == n + (-1) - ((n > 0) - (n < 0))


def test_lms_predict_wrapping():
    l = ref.Lms([32767, 32767, 32767, 32767], [32767, 32767, 32767, 32767])
    # products near i32 max wrap; result must stay in i32
    p = l.predict()
    assert -(1 << 31) <= p < (1 << 31)
    # cross-check against explicit two's-complement arithmetic
    prod = ref.wrap32(32767 * 32767)
    p01 = ref.wrap32(prod + prod)
    expected = ref.wrap32(p01 + p01) >> 13
    assert p == expected


def test_scalar_vs_numpy_decoder_on_fixture_head(fixture_bytes):
    parsed = bs.parse_file(fixture_bytes)
    head = parsed.frames[:3]
    batch = bs.stack_frames(head)
    np_out = ref.decode_batch_np(batch)  # (F, W*20, C)
    for i, rec in enumerate(head):
        scalar = ref.decode_frame_record(rec)
        got = np_out[i, : rec.samples_per_channel].reshape(-1)
        assert np.array_equal(
            got, np.asarray(scalar, dtype=np.int16)
        ), f"frame {i} mismatch"


def test_numpy_decode_fixture_full(fixture_bytes):
    channels, rate, pcm = ref.decode_all_np(fixture_bytes)
    assert channels == 2
    assert rate == 44100
    assert pcm.shape == (FIXTURE_SAMPLES_PER_CHANNEL * 2,)
    # the signal should be loud, non-constant music
    assert pcm.std() > 1000


def test_encode_decode_sine_roundtrip():
    pcm = make_sine(1000, 1)
    data = ref.encode_all_py(pcm, 1, 44100, 1000)
    channels, rate, decoded = ref.decode_all_py(data)
    assert channels == 1
    assert rate == 44100
    assert len(decoded) == 1000
    diff = np.abs(np.asarray(decoded) - pcm.astype(np.int64))
    assert diff.max() < 8000  # reference's lossy bound (src/lib.rs:1225)


def test_encode_decode_ramp_roundtrip():
    # reference test_round_trip_audio signal (src/lib.rs:1185-1230)
    samples = np.array(
        [((i % 200) - 100) * 100 for i in range(1000)], dtype=np.int16
    )
    data = ref.encode_all_py(samples, 1, 44100, 1000)
    _, _, decoded = ref.decode_all_py(data)
    diff = np.abs(np.asarray(decoded) - samples.astype(np.int64))
    assert diff.max() < 8000


def test_encode_stereo_shape():
    pcm = make_sine(500, 2)
    data = ref.encode_all_py(pcm, 2, 44100, 500)
    channels, rate, decoded = ref.decode_all_py(data)
    assert channels == 2
    assert len(decoded) == 1000


def test_encode_short_tail_slice():
    # 70 samples -> final slice has 10 samples; exercises the left-shift
    pcm = make_noise(70, 1, seed=3, amplitude=20000)
    data = ref.encode_all_py(pcm, 1, 44100, 70)
    parsed = bs.parse_file(data)
    assert parsed.frames[0].n_windows == 4
    word = int(parsed.frames[0].slice_words[-1, 0])
    # bottom 30 bits (10 unused code slots) must be zero
    assert word & ((1 << 30) - 1) == 0
    _, _, decoded = ref.decode_all_py(data)
    assert len(decoded) == 70


def test_streaming_encode_equals_oneshot():
    # reference test_streaming_encode (src/lib.rs:1262-1297), small scale
    pcm = make_noise(12000, 2, seed=9, amplitude=25000)
    total = 12000

    oneshot = ref.encode_all_py(pcm, 2, 44100, total)

    enc = ref.PyEncoder(2, 44100, total)
    streamed = [fmt.pack_file_header(total)]
    offset = 0
    while offset < total:
        frame_len = min(total - offset, fmt.QOA_FRAME_LEN)
        start, end = offset * 2, (offset + frame_len) * 2
        streamed.append(
            enc.encode_frame_bytes(list(map(int, pcm[start:end])))
        )
        offset += frame_len
    assert b"".join(streamed) == oneshot


def test_encoder_validation():
    from qoaudio_tpu.errors import (
        InvalidChannels,
        InvalidSampleRate,
        InvalidSamples,
    )

    with pytest.raises(InvalidChannels):
        ref.PyEncoder(0, 44100, 10)
    with pytest.raises(InvalidChannels):
        ref.PyEncoder(9, 44100, 10)
    with pytest.raises(InvalidSampleRate):
        ref.PyEncoder(1, 0, 10)
    with pytest.raises(InvalidSamples):
        ref.PyEncoder(1, 44100, 0)


def test_fixture_reencode_rms(fixture_bytes):
    """decode -> re-encode (numpy-size-limited) -> decode, RMS < 500.

    Mirrors reference test_full_file_round_trip but on a prefix: the scalar
    oracle encoder is too slow for the whole fixture; the JAX encoder test
    covers the full file.
    """
    channels, rate, pcm = ref.decode_all_np(fixture_bytes)
    n = 3 * fmt.QOA_FRAME_LEN  # 3 frames per channel
    prefix = pcm[: n * channels]
    data = ref.encode_all_py(prefix, channels, rate, n)
    _, _, decoded = ref.decode_all_py(data)
    err = np.asarray(decoded, dtype=np.float64) - prefix.astype(np.float64)
    rms = np.sqrt((err**2).mean())
    assert rms < 500, rms
