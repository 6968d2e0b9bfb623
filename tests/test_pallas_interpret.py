"""Pallas decode kernel under the TPU INTERPRETER — runs on CPU.

`pltpu.force_tpu_interpret_mode()` executes Mosaic kernels op-by-op on
the host and is bit-faithful for the decode kernel (verified against
the oracle-pinned native engine on adversarial wrap-regime chains and
real-stream chains), so the kernel's logic is covered by the CPU suite
instead of only by the TPU-gated tests + bench parity gates.

The ENCODE kernel is deliberately NOT tested this way: interpreting its
16-scalefactor x 20-step planes takes > 8 minutes even at the minimum
tile (measured 2026-08-17), so its CPU-side pin remains the XLA kernel
equivalence on real hardware (tests/test_pallas.py + bench gates).

Word-endianness contract pinned here because it bit a test harness
once: the native engine takes RAW BIG-ENDIAN u64 slice words; the
Pallas kernel takes LOGICAL u32 halves (hi = logical >> 32).
"""

import numpy as np
import pytest

import jax


def _interpret_decode(words_logical, st, subs, wblk):
    from jax.experimental.pallas import tpu as pltpu

    from qoaudio_tpu.ops.pallas_decode import decode_chains_pallas

    hi = (words_logical >> np.uint64(32)).astype(np.uint32)
    lo = (words_logical & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(
            decode_chains_pallas(st, hi, lo, subs=subs, wblk=wblk)
        )


def test_pallas_decode_interpreted_matches_native_adversarial():
    from qoaudio_tpu import native
    from qoaudio_tpu.ops.pallas_decode import LANES

    if not native.available():
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(3)
    subs, wblk = 8, 8
    N, W = subs * LANES, wblk
    wl = rng.integers(0, 1 << 63, size=(W, N), dtype=np.int64).astype(
        np.uint64
    ) | (rng.integers(0, 16, size=(W, N), dtype=np.uint64) << np.uint64(60))
    st = rng.integers(-32768, 32768, size=(8, N)).astype(np.int32)
    out = _interpret_decode(wl, st, subs, wblk)
    want = native.decode_chains(wl.byteswap(), st)
    assert np.array_equal(out, want)


def test_pallas_decode_interpreted_matches_native_real_stream(fixture_bytes):
    from qoaudio_tpu import bitstream as bs
    from qoaudio_tpu import native
    from qoaudio_tpu.ops.pallas_decode import LANES

    if not native.available():
        pytest.skip("native engine unavailable")
    pa = bs.parse_file_arrays(fixture_bytes)
    assert pa is not None
    subs, wblk = 8, 8
    N, W = subs * LANES, wblk
    wl = np.zeros((W, N), np.uint64)
    st = np.zeros((8, N), np.int32)
    k = min(N, pa.words_be.shape[1])
    wl[:, :k] = pa.words_be[:W, :k].byteswap()
    st[:, :k] = pa.state[:, :k]
    out = _interpret_decode(wl, st, subs, wblk)
    want = native.decode_chains(wl.byteswap(), st)
    assert np.array_equal(out, want)
