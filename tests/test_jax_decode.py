"""Bit-exactness tests for the JAX decoder kernel against the oracle."""

import numpy as np

from qoaudio_tpu import bitstream as bs
from qoaudio_tpu import codec
from qoaudio_tpu import reference as ref
from qoaudio_tpu.ops.decode import decode_batch

from conftest import FIXTURE_SAMPLES_PER_CHANNEL, make_noise, make_sine


def test_decode_kernel_vs_oracle_fixture_head(fixture_bytes):
    parsed = bs.parse_file(fixture_bytes)
    batch = bs.stack_frames(parsed.frames[:4])
    want = ref.decode_batch_np(batch)
    got = decode_batch(batch)
    assert got.dtype == np.int16
    assert np.array_equal(got, want)


def test_decode_kernel_vs_oracle_fixture_full(fixture_bytes):
    parsed = bs.parse_file(fixture_bytes)
    batch = bs.stack_frames(parsed.frames)
    want = ref.decode_batch_np(batch)
    got = decode_batch(batch, pad_chains_to=1024)
    assert np.array_equal(got, want)


def test_decode_all_jax_fixture(fixture_bytes):
    out = codec.decode_all(fixture_bytes, backend="jax")
    assert out.num_channels == 2
    assert out.sample_rate == 44100
    assert out.samples.shape == (FIXTURE_SAMPLES_PER_CHANNEL * 2,)
    _, _, want = ref.decode_all_np(fixture_bytes)
    assert np.array_equal(out.samples, want)


def test_decode_all_backends_agree_synthetic():
    # synthetic multi-frame stream via the oracle encoder
    pcm = make_noise(11000, 2, seed=5, amplitude=28000)
    data = ref.encode_all_py(pcm, 2, 44100, 11000)
    a = codec.decode_all(data, backend="jax")
    b = codec.decode_all(data, backend="numpy")
    assert np.array_equal(a.samples, b.samples)
    assert a.num_channels == b.num_channels == 2


def test_decode_all_mono_short():
    pcm = make_sine(333, 1)
    data = ref.encode_all_py(pcm, 1, 8000, 333)
    out = codec.decode_all(data)
    assert out.num_channels == 1
    assert out.sample_rate == 8000
    assert len(out.samples) == 333
    _, _, want = ref.decode_all_py(data)
    assert np.array_equal(out.samples, np.asarray(want, dtype=np.int16))


def test_decode_all_eight_channels():
    pcm = make_noise(100, 8, seed=1, amplitude=20000)
    data = ref.encode_all_py(pcm, 8, 44100, 100)
    out = codec.decode_all(data)
    assert out.num_channels == 8
    _, _, want = ref.decode_all_py(data)
    assert np.array_equal(out.samples, np.asarray(want, dtype=np.int16))


def test_decode_wrapping_extreme_lms():
    """Adversarial stream: extreme LMS seeds exercise i32 wrap in predict."""
    import qoaudio_tpu.format as fmt

    rng = np.random.default_rng(11)
    words = rng.integers(0, 1 << 63, size=(8, 1), dtype=np.int64).astype(
        np.uint64
    )
    hist = np.array([[32767, -32768, 32767, -32768]], dtype=np.int32)
    wts = np.array([[-32768, -32768, 32767, 32767]], dtype=np.int32)
    frame = bs.build_frame_bytes(1, 44100, 160, hist, wts, words)
    data = fmt.pack_file_header(160) + frame
    out = codec.decode_all(data, backend="jax")
    _, _, want = ref.decode_all_py(data)
    assert np.array_equal(out.samples, np.asarray(want, dtype=np.int16))
