"""Pallas/Mosaic TPU decoder kernel — the batched deployment path.

Frames decode in parallel (every QOA frame header carries a full LMS
snapshot, /root/reference/src/lib.rs:271-281), so the chain axis
(frames x channels) is the only parallel dimension that matters.  The
kernel packs 1024 chains per grid tile as a full (8, 128) int32 vreg
(sublanes x lanes), walks the slice windows sequentially with the LMS
carried in VMEM scratch across window blocks, and unpacks the 3-bit
residual codes from the raw u32 slice-word halves in-kernel — no host
code planes, no gathers (the 16-entry scalefactor table is a masked
select computed once per window, magnitudes from the spec's closed
forms, like ops/decode.py).

Reference semantics pinned: src/lib.rs:291-330 (slice loop; all 20
samples reconstructed, short tails trimmed by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import format as fmt

LANES = 128
_SLEN = fmt.QOA_SLICE_LEN
_I32 = jnp.int32
_U32 = jnp.uint32

_SF_TAB = [int(v) for v in fmt.QOA_SCALEFACTOR_TAB]

# (sublanes per tile, windows per VMEM block).  Throughput scales with
# chains per vector op up to the point where the carried LMS planes spill
# from registers to VMEM; a fresh sweep on v5e measured subs=32/wblk=32 at
# 5.83 Gsps vs subs=256/wblk=4 at 5.72 — statistically a tie — and the
# smaller tile both engages at 4096 chains (vs 32768) and stays well under
# the 16 MB scoped-VMEM limit that the widest tile overruns on large
# batches (row counts > 256).
_CONFIGS = ((32, 32), (16, 32), (8, 64))
MIN_TILE = 8 * LANES


def pick_tile(n_chains: int) -> tuple[int, int]:
    """Largest tile (subs*128 chains) not exceeding the batch."""
    for subs, wblk in _CONFIGS:
        if n_chains >= subs * LANES:
            return subs, wblk
    return _CONFIGS[-1]


def _make_kernel(subs: int):
    def kernel(hi_ref, lo_ref, state_ref, out_ref, carry_ref):
        wb = pl.program_id(1)

        @pl.when(wb == 0)
        def _init():
            carry_ref[:, :, :] = state_ref[:, :, :]

        st = carry_ref[:, :, :]  # (8, subs, LANES)

        def body(w, carry):
            H0, H1, H2, H3, W0, W1, W2, W3 = carry
            wh = hi_ref[w].astype(_U32)  # (subs, LANES)
            wl = lo_ref[w].astype(_U32)

            # scalefactor value from the top 4 bits: 16-way masked select,
            # then the dequant magnitudes from the closed forms
            sf = (wh >> 28).astype(_I32)
            sfv = jnp.zeros((subs, LANES), _I32)
            for i in range(16):
                sfv = jnp.where(sf == i, _SF_TAB[i], sfv)
            m0 = (3 * sfv + 2) >> 2
            m1 = (5 * sfv + 1) >> 1
            m2 = (9 * sfv + 1) >> 1
            m3 = 7 * sfv

            for k in range(_SLEN):
                # 3-bit code k lives at u64 bits [57-3k, 59-3k]
                if k <= 8:
                    code = ((wh >> (25 - 3 * k)) & 7).astype(_I32)
                elif k == 9:
                    code = (((wh & 1) << 2) | (wl >> 30)).astype(_I32)
                else:
                    code = ((wl >> (57 - 3 * k)) & 7).astype(_I32)
                p = (W0 * H0 + W1 * H1 + W2 * H2 + W3 * H3) >> 13
                idx = code >> 1
                m01 = jnp.where(idx == 0, m0, m1)
                m23 = jnp.where(idx == 2, m2, m3)
                m = jnp.where(idx < 2, m01, m23)
                dq = jnp.where((code & 1) == 0, m, -m)
                r = jnp.clip(p + dq, -32768, 32767)
                out_ref[w, k] = r.astype(jnp.int16)
                d = dq >> 4
                W0 = W0 + jnp.where(H0 < 0, -d, d)
                W1 = W1 + jnp.where(H1 < 0, -d, d)
                W2 = W2 + jnp.where(H2 < 0, -d, d)
                W3 = W3 + jnp.where(H3 < 0, -d, d)
                H0, H1, H2, H3 = H1, H2, H3, r
            return (H0, H1, H2, H3, W0, W1, W2, W3)

        carry = jax.lax.fori_loop(
            0, hi_ref.shape[0], body, tuple(st[i] for i in range(8))
        )
        carry_ref[:, :, :] = jnp.stack(carry)

    return kernel


@functools.partial(jax.jit, static_argnames=("subs", "wblk"))
def decode_chains_pallas(state, words_hi, words_lo, subs: int = 8,
                         wblk: int = 64):
    """Decode N chains from u32 slice-word halves -> (W, 20, N) int16.

    state: (8, N) int32 frame-start LMS; words_hi/lo: (W, N) uint32 —
    logical (byteswapped) u64 halves.  N must be a multiple of subs*128
    and W of wblk (pad with zero words; callers trim).  Use
    :func:`pick_tile` to choose (subs, wblk) for a batch.
    """
    W, N = words_hi.shape
    tile = subs * LANES
    assert N % tile == 0, f"pad the chain axis to a multiple of {tile}"
    assert W % wblk == 0, f"pad the window axis to a multiple of {wblk}"
    n_tiles = N // tile
    rows = N // LANES  # = n_tiles * subs

    hi = words_hi.reshape(W, rows, LANES)
    lo = words_lo.reshape(W, rows, LANES)
    st = state.reshape(8, rows, LANES)

    out = pl.pallas_call(
        _make_kernel(subs),
        grid=(n_tiles, W // wblk),
        in_specs=[
            pl.BlockSpec(
                (wblk, subs, LANES), lambda t, wb: (wb, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (wblk, subs, LANES), lambda t, wb: (wb, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, subs, LANES), lambda t, wb: (0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (wblk, _SLEN, subs, LANES), lambda t, wb: (wb, 0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((W, _SLEN, rows, LANES), jnp.int16),
        scratch_shapes=[pltpu.VMEM((8, subs, LANES), jnp.int32)],
    )(hi, lo, st)
    return out.reshape(W, _SLEN, N)


def available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
