"""Bit-exactness tests for the JAX encoder kernel.

The JAX encoder replaces the reference's sequential sorted-order
scalefactor search with an all-16-parallel evaluation + lexicographic
argmin; these tests pin byte equality against the scalar oracle (which
implements the original sequential search), i.e. they validate the
tie-break equivalence proof in SURVEY.md §3.3.
"""

import numpy as np
import pytest

from qoaudio_tpu import codec
from qoaudio_tpu import reference as ref
from qoaudio_tpu.types import QoaDesc

from conftest import make_noise, make_sine


def _check_bytes_equal(pcm, channels, rate, samples):
    want = ref.encode_all_py(pcm, channels, rate, samples)
    got = codec.encode_all(
        pcm, QoaDesc(channels, rate, samples), backend="jax"
    )
    assert got == want


def test_encode_sine_mono_exact():
    _check_bytes_equal(make_sine(1000, 1), 1, 44100, 1000)


def test_encode_sine_stereo_exact():
    _check_bytes_equal(make_sine(777, 2), 2, 44100, 777)


def test_encode_noise_exact():
    # noise stresses tie-breaks and scalefactor ordering
    _check_bytes_equal(make_noise(2100, 1, seed=2), 1, 22050, 2100)


def test_encode_multiframe_exact():
    # > 1 frame: carried LMS state across frame boundaries
    _check_bytes_equal(make_noise(11000, 2, seed=8), 2, 44100, 11000)


def test_encode_tail_slice_exact():
    # 70 samples: short final slice with the left-shift packing
    _check_bytes_equal(make_noise(70, 1, seed=3), 1, 44100, 70)


def test_encode_single_sample():
    _check_bytes_equal(np.array([12345], dtype=np.int16), 1, 44100, 1)


def test_encode_extremes_exact():
    # full-scale square wave: clamping and large residuals
    pcm = np.tile(
        np.array([32767] * 10 + [-32768] * 10, dtype=np.int16), 50
    )
    _check_bytes_equal(pcm, 1, 44100, 1000)


def test_encode_silence_exact():
    _check_bytes_equal(np.zeros(500, dtype=np.int16), 1, 44100, 500)


def test_encode_eight_channels_exact():
    _check_bytes_equal(make_noise(130, 8, seed=4), 8, 44100, 130)


def test_encode_validation():
    from qoaudio_tpu.errors import (
        InvalidChannels,
        InvalidSampleRate,
        InvalidSamples,
    )

    pcm = np.zeros(1000, dtype=np.int16)
    with pytest.raises(InvalidChannels):
        codec.encode_all(pcm, QoaDesc(0, 44100, 1000))
    with pytest.raises(InvalidChannels):
        codec.encode_all(pcm, QoaDesc(9, 44100, 1000))
    with pytest.raises(InvalidSampleRate):
        codec.encode_all(pcm, QoaDesc(1, 0, 1000))
    with pytest.raises(InvalidSamples):
        codec.encode_all(pcm, QoaDesc(1, 44100, 0))
    with pytest.raises(InvalidSamples):
        codec.encode_all(pcm, QoaDesc(1, 44100, 999))  # length mismatch


def test_fixture_roundtrip_rms(fixture_bytes):
    """Full-file: decode -> JAX re-encode -> decode, RMS < 500.

    Mirrors reference test_full_file_round_trip (src/lib.rs:1232-1259).
    """
    out = codec.decode_all(fixture_bytes)
    desc = QoaDesc(
        out.num_channels, out.sample_rate, out.samples_per_channel
    )
    data = codec.encode_all(out.samples, desc)
    again = codec.decode_all(data)
    err = again.samples.astype(np.float64) - out.samples.astype(np.float64)
    rms = np.sqrt((err**2).mean())
    assert rms < 500, rms


def test_fixture_prefix_encode_exact(fixture_bytes):
    """JAX encoder == scalar oracle on real music (3 frames, stereo)."""
    out = codec.decode_all(fixture_bytes)
    n = 3 * 5120
    prefix = out.samples[: n * 2]
    _check_bytes_equal(prefix, 2, 44100, n)


def test_validate_desc_rejects_unrepresentable_values():
    # the reference's u8/u32 field types make negative or >u32 values
    # unrepresentable (src/lib.rs:336-344); they must reject with the
    # same typed errors on every backend, not OverflowError/corrupt bytes
    import pytest

    from qoaudio_tpu import codec
    from qoaudio_tpu.errors import (
        InvalidChannels,
        InvalidSampleRate,
        InvalidSamples,
    )
    from qoaudio_tpu.types import QoaDesc

    pcm = np.zeros(40, np.int16)
    for desc, err in [
        (QoaDesc(-2, 44100, -20), InvalidChannels),
        (QoaDesc(0, 44100, 20), InvalidChannels),
        (QoaDesc(9, 44100, 20), InvalidChannels),
        (QoaDesc(2, -44100, 20), InvalidSampleRate),
        (QoaDesc(2, 0, 20), InvalidSampleRate),
        (QoaDesc(2, 1 << 32, 20), InvalidSampleRate),
        (QoaDesc(2, 44100, 0), InvalidSamples),
        (QoaDesc(2, 44100, -20), InvalidSamples),
    ]:
        for backend in ("jax", "numpy", "auto"):
            with pytest.raises(err):
                codec.encode_all(pcm, desc, backend=backend)


def test_decode_all_unknown_backend_fails_fast():
    import pytest

    from qoaudio_tpu import codec

    with pytest.raises(ValueError, match="unknown backend"):
        codec.decode_all(b"not even parsed", backend="cpu")
