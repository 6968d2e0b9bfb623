"""Pallas decode kernel under the TPU INTERPRETER — runs on CPU.

`pltpu.force_tpu_interpret_mode()` executes Mosaic kernels op-by-op on
the host and is bit-faithful for the decode kernel (verified against
the oracle-pinned native engine on adversarial wrap-regime chains and
real-stream chains), so the kernel's logic is covered by the CPU suite
instead of only by the TPU-gated tests + bench parity gates.

The ENCODE kernel is deliberately NOT interpret-tested: even the true
minimum shape (F=1, W=1 window, B=128 lanes) exceeds 500 s under
``force_tpu_interpret_mode`` (re-measured 2026-08-19; the 16x20
candidate planes interpret op-by-op) — closed.  Instead, the kernel's
window body (the 20-step recurrence, biased-domain rank accumulation,
and lexicographic argmin — everything except the grid/BlockSpec
plumbing, whose structure the decode tests above DO interpret) is pure
jax and executes directly on CPU: the tests below pin it word-for-word
against the XLA kernel, full and masked variants, on adversarial
inputs.

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


def _window_body_once(x_i16, lens_or_none, carry):
    """Run the Pallas encode kernel's window body directly on CPU (it is
    pure jax outside the pallas_call plumbing)."""
    import jax.numpy as jnp

    from qoaudio_tpu.ops.pallas_encode import _lane_constants, _window_body

    B = carry.shape[1]
    sfbits, recip, mags = _lane_constants(B)
    length = (
        None if lens_or_none is None
        else jnp.asarray(lens_or_none).reshape(1, B)
    )
    new_carry, wh, wl = _window_body(
        jnp.asarray(x_i16, jnp.int32), length, jnp.asarray(carry),
        sfbits, recip, mags,
    )
    return np.asarray(new_carry), np.asarray(wh), np.asarray(wl)


@pytest.mark.parametrize("masked", [False, True])
def test_pallas_encode_window_body_matches_xla_kernel(masked):
    """CPU-side execution pin for the Pallas ENCODE kernel's core: the
    window body (20-step recurrence, biased-rank accumulation,
    lexicographic argmin, word packing) must match the XLA kernel
    word-for-word on adversarial random windows — full (length=None
    specialization) and masked (random lengths 0..20) variants."""
    from qoaudio_tpu.ops.encode import encode_frames

    rng = np.random.default_rng(7 if masked else 5)
    B = 128
    x = rng.integers(-32768, 32768, size=(1, 1, 20, B)).astype(np.int16)
    carry = rng.integers(-65536, 65536, size=(8, B)).astype(np.int32)
    if masked:
        lens = rng.integers(0, 21, size=B).astype(np.int32)
    else:
        lens = np.full(B, 20, np.int32)
    # zero invalid samples like the host layout does (the kernels mask
    # their effects, but the XLA kernel reads them into the residual
    # formula before masking, so the INPUT contract is zero-padded)
    x[0, 0] = np.where(np.arange(20)[:, None] < lens[None, :], x[0, 0], 0)

    new_carry, wh, wl = _window_body_once(
        x[0, 0], None if not masked else lens, carry
    )
    want_state, want_snaps, want_hi, want_lo = encode_frames(
        carry, x, lens.reshape(1, 1, B)
    )
    assert np.array_equal(np.asarray(want_snaps)[0], carry)
    assert np.array_equal(wh, np.asarray(want_hi)[0, 0])
    assert np.array_equal(wl, np.asarray(want_lo)[0, 0])
    assert np.array_equal(new_carry, np.asarray(want_state))


def test_pallas_encode_window_body_real_stream(fixture_bytes):
    """Window body vs the XLA kernel on REAL music windows (the first
    full frame of the fixture, one window per chain)."""
    from qoaudio_tpu import codec
    from qoaudio_tpu.ops.encode import encode_frames, initial_encoder_state

    out = codec.decode_all(fixture_bytes)
    x_all, lens_all, F = codec.layout_pcm(
        out.samples, out.num_channels, out.samples_per_channel
    )
    B = 128
    # spread 128 windows of the first frame across the chains
    x = np.zeros((1, 1, 20, B), np.int16)
    lens = np.full(B, 20, np.int32)
    for j in range(B):
        x[0, 0, :, j] = x_all[0, j % x_all.shape[1], :, j % 2]
    st = initial_encoder_state(2, B)
    new_carry, wh, wl = _window_body_once(x[0, 0], None, st)
    want_state, _, want_hi, want_lo = encode_frames(
        st, x, lens.reshape(1, 1, B)
    )
    assert np.array_equal(wh, np.asarray(want_hi)[0, 0])
    assert np.array_equal(wl, np.asarray(want_lo)[0, 0])
    assert np.array_equal(new_carry, np.asarray(want_state))


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
