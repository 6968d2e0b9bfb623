"""Property/robustness tests — analogs of the reference fuzz harnesses.

* ``iter_all`` (fuzz/fuzz_targets/iter_all.rs): arbitrary bytes must never
  crash the decoder — only typed QoaError exceptions or clean termination.
* ``encode_round_trip`` (fuzz/fuzz_targets/encode_round_trip.rs): arbitrary
  PCM (1-8 channels) must always encode to decodable QOA of exactly the
  input shape.

Deterministic seeds stand in for libFuzzer's corpus.
"""

import os

import numpy as np
import pytest

from qoaudio_tpu import QoaDecoder, codec
from qoaudio_tpu import format as fmt
from qoaudio_tpu.errors import QoaError
from qoaudio_tpu.types import QoaDesc


def _random_blobs():
    rng = np.random.default_rng(1234)
    blobs = []
    for n in [0, 1, 4, 7, 8, 9, 16, 64, 333, 5000]:
        blobs.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    # valid magic + garbage
    for n in [0, 1, 4, 8, 40, 4000]:
        blobs.append(
            b"qoaf" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        )
    # valid-ish header then garbage
    blobs.append(fmt.pack_file_header(5120) + b"\xff" * 64)
    blobs.append(fmt.pack_file_header(5120) + b"\x00" * 64)
    return blobs


@pytest.mark.parametrize("i", range(18))
def test_arbitrary_bytes_never_crash_decode_all(i):
    blob = _random_blobs()[i]
    try:
        out = codec.decode_all(blob)
        assert out.samples.dtype == np.int16
    except QoaError:
        pass  # typed errors are the contract


@pytest.mark.parametrize("i", range(18))
def test_arbitrary_bytes_never_crash_iterator(i):
    blob = _random_blobs()[i]
    try:
        dec = QoaDecoder(blob)
        for count, _ in enumerate(dec):
            if count > 30000:
                break
    except QoaError:
        pass


def test_bit_flips_in_valid_stream(fixture_bytes):
    """Corrupting random bytes of a real stream must never crash."""
    rng = np.random.default_rng(7)
    head = bytearray(fixture_bytes[:20000])
    for _ in range(40):
        data = bytearray(head)
        pos = rng.integers(0, len(data))
        data[pos] ^= 1 << rng.integers(0, 8)
        try:
            out = codec.decode_all(bytes(data))
            assert len(out.samples) >= 0
        except QoaError:
            pass


@pytest.mark.parametrize(
    "channels,n",
    [(1, 1), (1, 19), (1, 20), (1, 21), (2, 777), (3, 40), (8, 61)],
)
def test_random_pcm_encode_roundtrip_shape(channels, n):
    rng = np.random.default_rng(n * 31 + channels)
    pcm = rng.integers(-32768, 32768, n * channels).astype(np.int16)
    data = codec.encode_all(pcm, QoaDesc(channels, 44100, n))
    out = codec.decode_all(data)
    assert out.num_channels == channels
    assert out.sample_rate == 44100
    assert len(out.samples) == n * channels
    # and the stream equals the scalar oracle's byte-for-byte
    from qoaudio_tpu import reference as ref

    assert data == ref.encode_all_py(pcm, channels, 44100, n)


# ---------------------------------------------------------------------------
# Generative property fuzzing (hypothesis) — the libFuzzer analogs proper.
# Reference contracts: fuzz/fuzz_targets/iter_all.rs:5-10 (arbitrary bytes
# never panic the decoder) and encode_round_trip.rs:5-47 (arbitrary PCM
# always encodes to decodable QOA of exact shape).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# QOA_FUZZ_SCALE multiplies every max_examples (default 1): a deep fuzz
# session is `QOA_FUZZ_SCALE=20 pytest tests/test_fuzz.py`.  Unparseable
# values fall back to 1 rather than aborting collection of this module.
try:
    _SCALE = max(1, int(os.environ.get("QOA_FUZZ_SCALE", "1")))
except ValueError:
    _SCALE = 1

_FUZZ_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


def _ex(n: int) -> int:
    return n * _SCALE


@settings(max_examples=_ex(250), **_FUZZ_SETTINGS)
@given(blob=st.binary(max_size=4096))
def test_hypothesis_arbitrary_bytes_decode(blob):
    try:
        out = codec.decode_all(blob)
        assert out.samples.dtype == np.int16
    except QoaError:
        pass


@settings(max_examples=_ex(150), **_FUZZ_SETTINGS)
@given(blob=st.binary(max_size=2048), data=st.data())
def test_hypothesis_magic_prefixed_bytes_iterator(data, blob):
    # bias toward streams that pass the magic check and exercise frame
    # parsing; also randomly legitimize the header sample count
    total = data.draw(st.integers(min_value=0, max_value=(1 << 32) - 1))
    stream = b"qoaf" + int(total).to_bytes(4, "big") + blob
    try:
        dec = QoaDecoder(stream)
        for count, _ in enumerate(dec):
            if count > 30000:
                break
    except QoaError:
        pass


@settings(max_examples=_ex(120), **_FUZZ_SETTINGS)
@given(
    channels=st.integers(min_value=1, max_value=8),
    n=st.integers(min_value=1, max_value=600),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_hypothesis_pcm_roundtrip_shape(channels, n, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, n * channels).astype(np.int16)
    data = codec.encode_all(pcm, QoaDesc(channels, 44100, n))
    out = codec.decode_all(data)
    assert (out.num_channels, out.sample_rate) == (channels, 44100)
    assert len(out.samples) == n * channels


@settings(max_examples=_ex(25), **_FUZZ_SETTINGS)
@given(
    channels=st.integers(min_value=1, max_value=4),
    n=st.integers(min_value=1, max_value=120),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_hypothesis_pcm_bytes_equal_oracle(channels, n, seed):
    # byte-exactness against the scalar oracle on small streams (the
    # oracle is pure Python; size kept modest for runtime)
    from qoaudio_tpu import reference as ref

    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, n * channels).astype(np.int16)
    data = codec.encode_all(pcm, QoaDesc(channels, 44100, n))
    assert data == ref.encode_all_py(pcm, channels, 44100, n)


@settings(max_examples=_ex(60), **_FUZZ_SETTINGS)
@given(data=st.data())
def test_hypothesis_truncations_of_valid_stream(data):
    # every prefix of a valid stream must decode cleanly or raise typed
    pcm = make_stream_pcm()
    stream = codec.encode_all(pcm, QoaDesc(2, 44100, len(pcm) // 2))
    cut = data.draw(st.integers(min_value=0, max_value=len(stream)))
    try:
        codec.decode_all(stream[:cut])
    except QoaError:
        pass


_STREAM_PCM = None


def make_stream_pcm():
    global _STREAM_PCM
    if _STREAM_PCM is None:
        rng = np.random.default_rng(42)
        _STREAM_PCM = rng.integers(-20000, 20000, 6000 * 2).astype(np.int16)
    return _STREAM_PCM


def test_adversarial_weight_wrap_bit_exact():
    """Full-scale square waves drive the LMS weights toward the wrapping
    regime (the reference notes overflow only ever affects the encoder's
    heuristic, src/lib.rs docs for qoa_div); every backend must still be
    byte-identical to the scalar oracle."""
    from qoaudio_tpu import reference as ref

    patterns = [
        np.tile(np.array([32767, -32768], np.int16), 600),
        np.tile(np.array([32767] * 3 + [-32768] * 3, np.int16), 200),
        np.tile(np.array([-32768], np.int16), 1200),
    ]
    for pcm in patterns:
        n = len(pcm)
        want = ref.encode_all_py(pcm, 1, 44100, n)
        for be in ("native", "jax"):
            try:
                got = codec.encode_all(pcm, QoaDesc(1, 44100, n), backend=be)
            except RuntimeError:
                continue  # backend unavailable
            assert got == want, be


@settings(max_examples=_ex(80), **_FUZZ_SETTINGS)
@given(data=st.data())
def test_hypothesis_truncation_item_fidelity(data):
    """A truncated stream must yield EXACTLY the reference's item sequence
    before terminating: EOF within a frame-header word is a clean end
    (src/lib.rs:205-215); EOF in the LMS state errors with no header
    yielded; EOF in the slice data yields the header plus every COMPLETE
    window's samples, then errors (src/lib.rs:291-330 reads one u64 per
    channel per window)."""
    from qoaudio_tpu.types import FrameHeader

    pcm = make_stream_pcm()
    n = len(pcm) // 2
    stream = codec.encode_all(pcm, QoaDesc(2, 44100, n))
    full = codec.decode_all(stream).samples
    cut = data.draw(st.integers(min_value=8, max_value=len(stream)))

    # analytic walk of the reference reader over stream[:cut]
    exp_headers = 0
    exp_samples = 0
    exp_error = False
    pos = 8
    while pos < cut:
        if cut - pos < 8:
            break  # partial header word: clean end
        word = int.from_bytes(stream[pos : pos + 8], "big")
        C, _rate, spc, _fsize = fmt.unpack_frame_header(word)
        lms = 16 * C
        if cut - pos - 8 < lms:
            exp_error = True  # EOF inside the LMS state
            break
        nw = -(-spc // 20)
        avail = (cut - pos - 8 - lms) // (8 * C)
        k = min(nw, avail)
        exp_headers += 1
        exp_samples += min(spc, 20 * k) * 2
        if k < nw:
            exp_error = True  # EOF inside the slice data
            break
        pos += 8 + lms + 8 * nw * C

    got_headers = 0
    got = []
    got_error = False
    try:
        dec = QoaDecoder(stream[:cut])
    except QoaError:
        # constructor-time failure (no decodable first frame)
        assert exp_headers == 0
        return
    try:
        for item in dec:
            if isinstance(item, FrameHeader):
                got_headers += 1
            else:
                got.append(item)
    except QoaError:
        got_error = True

    assert got_headers == exp_headers
    assert len(got) == exp_samples
    assert got_error == exp_error
    assert np.array_equal(
        np.asarray(got, dtype=np.int16), full[:exp_samples]
    )


@pytest.mark.parametrize("seed", [3, 17, 101])
def test_random_word_decode_differential(seed):
    """Adversarial VALID streams (random slice words + extreme LMS seeds):
    every decode backend must reproduce the scalar oracle bit-for-bit,
    including i32-wrapping predictions as weights drift over a full frame
    (reference decode uses wrapping arithmetic throughout,
    src/lib.rs:797-828)."""
    from qoaudio_tpu import bitstream as bs
    from qoaudio_tpu import reference as ref

    rng = np.random.default_rng(seed)
    C = int(rng.integers(1, 4))
    spc = 5120  # full frame: 256 windows of weight drift
    words = rng.integers(0, 1 << 63, size=(256, C), dtype=np.int64).astype(
        np.uint64
    ) | (rng.integers(0, 16, size=(256, C), dtype=np.uint64) << np.uint64(60))
    hist = rng.integers(-32768, 32768, (C, 4)).astype(np.int32)
    wts = rng.choice(
        np.array([-32768, -16384, 16383, 32767], np.int32), size=(C, 4)
    )
    frame = bs.build_frame_bytes(C, 44100, spc, hist, wts, words)
    data = fmt.pack_file_header(spc) + frame
    _, _, want = ref.decode_all_py(data)
    want = np.asarray(want, dtype=np.int16)
    for be in ("native", "jax", "numpy"):
        try:
            out = codec.decode_all(data, backend=be)
        except RuntimeError:
            continue  # backend unavailable
        assert np.array_equal(out.samples, want), be
