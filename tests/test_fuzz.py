"""Property/robustness tests — analogs of the reference fuzz harnesses.

* ``iter_all`` (fuzz/fuzz_targets/iter_all.rs): arbitrary bytes must never
  crash the decoder — only typed QoaError exceptions or clean termination.
* ``encode_round_trip`` (fuzz/fuzz_targets/encode_round_trip.rs): arbitrary
  PCM (1-8 channels) must always encode to decodable QOA of exactly the
  input shape.

Deterministic seeds stand in for libFuzzer's corpus.
"""

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
