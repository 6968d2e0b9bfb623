"""TPU decoder kernel: batched LMS reconstruction over frame x channel chains.

Design (TPU-first, cf. SURVEY.md §3.2):

* Every QOA frame serializes a full LMS snapshot in its header
  (/root/reference/src/lib.rs:271-281), so **frames decode in parallel**.
  The chain axis N = frames x channels maps to VPU lanes; ``lax.scan`` runs
  over the <=256 slice windows of a frame with the 20-step recurrence fully
  unrolled in registers.
* All arithmetic is int32 with exact two's-complement wrapping, matching
  the reference's ``wrapping_*`` ops (src/lib.rs:797-828).  XLA int32 wraps.
* No gathers on device: the 16-entry scalefactor lookup is a constant-table
  masked sum evaluated **once per slice**, and the 8-entry dequant row
  collapses to four per-slice magnitudes selected by ``code >> 1`` with a
  sign flip on code parity (dequant values are +/- pairs).

The decoder always reconstructs all 20 samples of a slice and truncation of
short final slices happens on the host, exactly like the reference
(src/lib.rs:291-330).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import format as fmt

_SF_TAB = np.asarray(fmt.QOA_SCALEFACTOR_TAB, dtype=np.int32)  # (16,)
_I32 = jnp.int32


def _slice_magnitudes(sf):
    """Per-chain dequant magnitudes [m0..m3] for this slice's scalefactor.

    m_j == QOA_DEQUANT_MAG[sf, j], computed arithmetically from the
    scalefactor value (round-ties-away of sf_val * {0.75, 2.5, 4.5, 7}):
      m0 = (3v+2)>>2,  m1 = (5v+1)>>1,  m2 = (9v+1)>>1,  m3 = 7v
    The 16-way scalefactor-value select runs once per slice, not per sample.
    """
    sf = sf.astype(jnp.int32)
    sfv = jnp.zeros_like(sf)
    for s in range(16):
        sfv = sfv + jnp.where(sf == s, _I32(int(_SF_TAB[s])), _I32(0))
    m0 = (3 * sfv + 2) >> 2
    m1 = (5 * sfv + 1) >> 1
    m2 = (9 * sfv + 1) >> 1
    m3 = 7 * sfv
    return m0, m1, m2, m3


def _dequant(code, mags):
    """code (3-bit) -> dequantized residual, via magnitude select + parity."""
    m0, m1, m2, m3 = mags
    idx = code >> 1
    mag = jnp.where(
        idx < 2,
        jnp.where(idx == 0, m0, m1),
        jnp.where(idx == 2, m2, m3),
    )
    return jnp.where((code & 1) == 0, mag, -mag)


def _decode_slice(carry, xs):
    """One slice window for all chains: 20-step unrolled LMS recurrence.

    carry: int32 (8, N) — rows 0-3 history, rows 4-7 weights.
    xs: (sf (N,), codes (20, N)) int32.
    Returns updated carry and the 20 reconstructed samples (20, N) int16.
    """
    h0, h1, h2, h3, w0, w1, w2, w3 = [carry[i] for i in range(8)]
    sf, codes = xs
    mags = _slice_magnitudes(sf)

    outs = []
    for k in range(fmt.QOA_SLICE_LEN):
        prediction = (w0 * h0 + w1 * h1 + w2 * h2 + w3 * h3) >> 13
        dq = _dequant(codes[k].astype(jnp.int32), mags)
        recon = jnp.clip(prediction + dq, -32768, 32767)
        outs.append(recon.astype(jnp.int16))
        delta = dq >> 4
        w0 = w0 + jnp.where(h0 < 0, -delta, delta)
        w1 = w1 + jnp.where(h1 < 0, -delta, delta)
        w2 = w2 + jnp.where(h2 < 0, -delta, delta)
        w3 = w3 + jnp.where(h3 < 0, -delta, delta)
        h0, h1, h2, h3 = h1, h2, h3, recon

    new_carry = jnp.stack([h0, h1, h2, h3, w0, w1, w2, w3])
    return new_carry, jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=())
def decode_chains(state, sf, codes):
    """Decode all slice windows of N independent chains.

    Args:
      state: int32 (8, N) — initial LMS (history rows 0-3, weights 4-7).
      sf:    int32 (W, N) — per-window scalefactors.
      codes: int32 (W, 20, N) — 3-bit residual codes.

    Returns int16 (W, 20, N) reconstructed samples (untrimmed).
    """
    _, ys = jax.lax.scan(_decode_slice, state, (sf, codes))
    return ys


def decode_batch(
    batch,
    pad_chains_to: int | None = None,
    pad_windows_to: int | None = None,
) -> np.ndarray:
    """Decode a host FrameBatch on device -> int16 (F, W*20, C), untrimmed.

    ``pad_chains_to`` / ``pad_windows_to`` pad the chain / window axes (to
    limit jit recompilation across differently-sized files; padded chains
    and trailing padded windows decode garbage that is dropped).
    """
    F, W, C = batch.sf.shape
    N = F * C
    Np = max(pad_chains_to or N, N)
    Wp = max(pad_windows_to or W, W)

    state = np.zeros((8, Np), dtype=np.int32)
    state[0:4, :N] = batch.history.reshape(N, 4).T
    state[4:8, :N] = batch.weights.reshape(N, 4).T

    sf = np.zeros((Wp, Np), dtype=np.int8)
    sf[:W, :N] = batch.sf.transpose(1, 0, 2).reshape(W, N)
    codes = np.zeros((Wp, fmt.QOA_SLICE_LEN, Np), dtype=np.int8)
    codes[:W, :, :N] = (
        batch.codes.transpose(1, 3, 0, 2).reshape(W, fmt.QOA_SLICE_LEN, N)
    )

    ys = np.asarray(decode_chains(jnp.asarray(state), jnp.asarray(sf), jnp.asarray(codes)))
    ys = ys[:W, :, :N].reshape(W, fmt.QOA_SLICE_LEN, F, C)
    return ys.transpose(2, 0, 1, 3).reshape(F, W * fmt.QOA_SLICE_LEN, C)
