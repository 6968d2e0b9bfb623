"""TPU encoder kernel: all-16-scalefactor parallel search, bit-exact.

Redesign of the reference's sequential best-of-16 search
(/root/reference/src/lib.rs:495-596) for vector hardware:

* The reference insertion-sorts scalefactors by first-sample rank, walks
  them in order and early-exits.  Rank accumulation is monotone
  non-decreasing, so the pruning never discards the true winner, and the
  sequential winner equals the **lexicographic argmin over
  (total_rank, first_sample_rank, scalefactor)** (proof in SURVEY.md §3.3).
  The kernel therefore evaluates all 16 candidates as vector lanes and
  reduces with that exact tie-break — same bitstream, no data-dependent
  control flow.
* Ranks are u64 in the reference; here they are accumulated in two uint32
  limbs (per-step increments err^2 <= (2^16-1)^2 and penalty^2 fit u32;
  carries propagate to a hi limb).  This avoids 64-bit integers entirely,
  which keeps the kernel Pallas/Mosaic-friendly.
* The inter-slice LMS chain is inherently sequential (the bitstream
  depends on it), so it runs as ``lax.scan``; throughput comes from the
  16-candidate axis and from batching many channels/files as lanes
  (SURVEY.md §2.2).
* Slice words are packed on device into (hi, lo) uint32 halves; the host
  only concatenates bytes.  Short slices encode zero codes in their unused
  positions, reproducing the reference's final left-shift
  (src/lib.rs:484-487).

All int32 arithmetic wraps exactly like the reference's wrapping ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import format as fmt

_NSF = fmt.QOA_NUM_SCALEFACTORS  # 16
_SLEN = fmt.QOA_SLICE_LEN  # 20

_I32 = jnp.int32
_U32 = jnp.uint32

# Per-scalefactor constants as (16, 1) columns, broadcast over chains.
_RECIP_COL = np.asarray(fmt.QOA_RECIPROCAL_TAB, dtype=np.int32)[:, None]
_DEQ_MAG_COLS = [
    np.asarray(fmt.QOA_DEQUANT_MAG[:, j], dtype=np.int32)[:, None]
    for j in range(4)
]
_SF_HI = (np.arange(_NSF, dtype=np.uint32) << 28)[:, None]  # sf in u64 bits 60-63


def _quantize(clamped):
    """Scaled residual in [-8, 8] -> 3-bit code (QOA_QUANT_TAB, closed form).

    negative -> odd codes (magnitude capped at 7); non-negative -> even
    codes capped at 6.
    """
    qneg = jnp.minimum((((-clamped) >> 1) << 1) + 1, 7)
    qpos = jnp.minimum((clamped >> 1) << 1, 6)
    return jnp.where(clamped < 0, qneg, qpos)


def _sign(v):
    return (v > 0).astype(_I32) - (v < 0).astype(_I32)


def _encode_slice(carry, xs):
    """Encode one 20-sample window for all chains, all 16 sfs in parallel.

    carry: int32 (8, N) — rows 0-3 history, 4-7 weights (the channel's LMS).
    xs: (x (20, N) int32 samples, length (N,) int32 in [0, 20]).

    Returns new carry and (word_hi, word_lo) uint32 (N,) — the packed u64
    slice halves.  length == 0 passes state through unchanged (padding).
    """
    x, length = xs
    recip = jnp.asarray(_RECIP_COL)
    mag_cols = [jnp.asarray(c) for c in _DEQ_MAG_COLS]

    # broadcast the carried LMS to the 16-scalefactor axis: (16, N)
    H = [jnp.broadcast_to(carry[i], (_NSF,) + carry[i].shape) for i in range(4)]
    W = [jnp.broadcast_to(carry[4 + i], (_NSF,) + carry[i].shape) for i in range(4)]

    rank_lo = jnp.zeros_like(H[0], dtype=_U32)
    rank_hi = jnp.zeros_like(H[0])
    word_hi = jnp.broadcast_to(jnp.asarray(_SF_HI), H[0].shape)
    word_lo = jnp.zeros_like(H[0], dtype=_U32)
    first_lo = rank_lo
    first_hi = rank_hi

    for k in range(_SLEN):
        active = (length > k)[None, :]

        prediction = (W[0] * H[0] + W[1] * H[1] + W[2] * H[2] + W[3] * H[3]) >> 13
        ssum = W[0] * W[0] + W[1] * W[1] + W[2] * W[2] + W[3] * W[3]
        penalty = jnp.maximum((ssum >> 18) - 0x8FF, 0)
        pen_sq = (penalty * penalty).astype(_U32)

        sample = x[k][None, :].astype(_I32)  # inputs may be int16 (HBM-lean)
        residual = sample - prediction
        # qoa_div: wrapping reciprocal multiply, +0.5 bias, away-from-zero
        n = (residual * recip + (1 << 15)) >> 16
        scaled = n + _sign(residual) - _sign(n)
        clamped = jnp.clip(scaled, -8, 8)
        q = _quantize(clamped)
        idx = q >> 1
        mag = jnp.where(
            idx < 2,
            jnp.where(idx == 0, mag_cols[0], mag_cols[1]),
            jnp.where(idx == 2, mag_cols[2], mag_cols[3]),
        )
        dq = jnp.where((q & 1) == 0, mag, -mag)
        recon = jnp.clip(prediction + dq, -32768, 32767)

        err = (sample - recon).astype(_U32)
        err_sq = jnp.where(active, err * err, _U32(0))
        pen_sq = jnp.where(active, pen_sq, _U32(0))
        lo1 = rank_lo + err_sq
        c1 = (lo1 < rank_lo).astype(_I32)
        lo2 = lo1 + pen_sq
        c2 = (lo2 < lo1).astype(_I32)
        rank_lo = lo2
        rank_hi = rank_hi + c1 + c2
        if k == 0:
            first_lo, first_hi = rank_lo, rank_hi

        # pack the 3-bit code into the u64 halves (code k at bits 57-3k..59-3k)
        qa = jnp.where(active, q, 0).astype(_U32)
        if k <= 8:
            word_hi = word_hi | (qa << (25 - 3 * k))
        elif k == 9:
            word_hi = word_hi | (qa >> 2)
            word_lo = word_lo | ((qa & 3) << 30)
        else:
            word_lo = word_lo | (qa << (57 - 3 * k))

        # sign-sign LMS update, masked for padded positions
        delta = dq >> 4
        W = [
            jnp.where(active, W[t] + jnp.where(H[t] < 0, -delta, delta), W[t])
            for t in range(4)
        ]
        H = [
            jnp.where(active, nxt, H[t])
            for t, nxt in enumerate([H[1], H[2], H[3], recon])
        ]

    # Lexicographic argmin over the sf axis with key
    # (total_hi, total_lo, first_hi, first_lo), ties -> lowest sf: the
    # reference's sequential-search winner (proof in SURVEY.md §3.3).
    #
    # Structured as TWO cascaded 2-limb select chains: pass 1 finds the
    # minimum total rank (keys only); pass 2 masks the losers' first-sample
    # keys to +inf and selects min (first, sf) among the total-rank winners.
    # A single 4-limb comparison chain — however phrased (nested booleans,
    # integer arithmetic, or masked min-reductions) — trips a pathological
    # XLA:CPU codegen cliff, measured ~4,000x slower than this form; the
    # two-pass shape is also branch-free and VPU-friendly on TPU.
    m_hi, m_lo = rank_hi[0], rank_lo[0]
    for s in range(1, _NSF):
        better = (rank_hi[s] < m_hi) | ((rank_hi[s] == m_hi) & (rank_lo[s] < m_lo))
        m_hi = jnp.where(better, rank_hi[s], m_hi)
        m_lo = jnp.where(better, rank_lo[s], m_lo)
    is_min = (rank_hi == m_hi[None]) & (rank_lo == m_lo[None])
    fk_hi = jnp.where(is_min, first_hi, _I32(0x7FFFFFFF))
    fk_lo = jnp.where(is_min, first_lo, _U32(0xFFFFFFFF))

    b_hi, b_lo = fk_hi[0], fk_lo[0]
    bwh, bwl = word_hi[0], word_lo[0]
    bH = [H[t][0] for t in range(4)]
    bW = [W[t][0] for t in range(4)]
    for s in range(1, _NSF):
        # strict < in ascending sf order keeps the lowest sf among ties
        better = (fk_hi[s] < b_hi) | ((fk_hi[s] == b_hi) & (fk_lo[s] < b_lo))
        b_hi = jnp.where(better, fk_hi[s], b_hi)
        b_lo = jnp.where(better, fk_lo[s], b_lo)
        bwh = jnp.where(better, word_hi[s], bwh)
        bwl = jnp.where(better, word_lo[s], bwl)
        bH = [jnp.where(better, H[t][s], bH[t]) for t in range(4)]
        bW = [jnp.where(better, W[t][s], bW[t]) for t in range(4)]

    new_carry = jnp.stack(bH + bW)
    return new_carry, (bwh, bwl)


def _encode_frame_step(carry, xs):
    """One frame: emit the LMS snapshot, then scan the frame's 256 slices."""
    x, lens = xs  # (256, 20, N), (256, N)
    snapshot = carry
    carry, words = jax.lax.scan(_encode_slice, carry, (x, lens))
    return carry, (snapshot, words[0], words[1])


@jax.jit
def encode_frames(state, samples, lens):
    """Encode F frames x N chains, chaining LMS state across all slices.

    Args:
      state:   int32 (8, N) — carried LMS per chain (history 0-3, weights 4-7).
      samples: int32 (F, 256, 20, N) — de-interleaved, zero-padded PCM.
      lens:    int32 (F, 256, N) — valid samples per slice (0 for padding).

    Returns:
      (new_state (8, N),
       snapshots (F, 8, N)  — LMS at each frame start, for serialization,
       word_hi, word_lo (F, 256, N) uint32 — packed slice words).
    """
    state, (snaps, hi, lo) = jax.lax.scan(
        _encode_frame_step, state, (samples, lens)
    )
    return state, snaps, hi, lo


# canonical definition lives in codec.py (pure numpy, jax-free host path);
# re-exported here for the device-kernel callers
from ..codec import initial_encoder_state  # noqa: E402,F401
