"""Pallas decode bottleneck hunt (round-4 experiment, VERDICT r03 #1).

OUTCOME (recorded 2026-08-17, see CLAUDE.md): the r03 "7 Gsps structural
bottleneck" was a timing artifact — a blocking scalar fetch after every
launch pays the axon tunnel's per-launch RTT and floors any measurement
near 6-7 Gsps.  With chained launches + one sync (and a linearity check
over K, np.polyfit), the production kernel measures 44-59 Gsps.  None of
the store-shape variants below beats the per-sample int16 store
reproducibly across sessions; the sub-vreg-store hypothesis is closed.

Variants, all timed in ONE process on the real chip (A/B methodology per
CLAUDE.md), parity-checked against the production kernel before timing:

  v0       production kernel (per-sample (subs,128) int16 stores)
  nostore  same compute, NO per-sample stores (final carry only) -> pure
           compute ceiling
  storeonly no LMS recurrence, stores only -> pure store cost
  stack    accumulate 20 samples in registers, ONE stacked int16 store
           per window
  pack32   pack sample pairs into int32 lanes in-register, store 10 full
           int32 planes per window (consumer bitcasts outside the kernel)

Usage: python /tmp/pdec_exp.py [subs] [wblk]
"""
import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qoaudio_tpu import bitstream as bs
from qoaudio_tpu import format as fmt
from qoaudio_tpu.ops import pallas_decode as pd

LANES = 128
_SLEN = 20
_I32 = jnp.int32
_U32 = jnp.uint32
_SF_TAB = [int(v) for v in fmt.QOA_SCALEFACTOR_TAB]


def _body_common(wh, wl, carry, k):
    H0, H1, H2, H3, W0, W1, W2, W3 = carry
    if k <= 8:
        code = ((wh >> (25 - 3 * k)) & 7).astype(_I32)
    elif k == 9:
        code = (((wh & 1) << 2) | (wl >> 30)).astype(_I32)
    else:
        code = ((wl >> (57 - 3 * k)) & 7).astype(_I32)
    return code


def make_kernel(subs, mode):
    def kernel(hi_ref, lo_ref, state_ref, out_ref, carry_ref):
        wb = pl.program_id(1)

        @pl.when(wb == 0)
        def _init():
            carry_ref[:, :, :] = state_ref[:, :, :]

        st = carry_ref[:, :, :]

        def body(w, carry):
            H0, H1, H2, H3, W0, W1, W2, W3 = carry
            wh = hi_ref[w].astype(_U32)
            wl = lo_ref[w].astype(_U32)
            sf = (wh >> 28).astype(_I32)
            sfv = jnp.zeros((subs, LANES), _I32)
            for i in range(16):
                sfv = jnp.where(sf == i, _SF_TAB[i], sfv)
            m0 = (3 * sfv + 2) >> 2
            m1 = (5 * sfv + 1) >> 1
            m2 = (9 * sfv + 1) >> 1
            m3 = 7 * sfv
            outs = []
            for k in range(_SLEN):
                if k <= 8:
                    code = ((wh >> (25 - 3 * k)) & 7).astype(_I32)
                elif k == 9:
                    code = (((wh & 1) << 2) | (wl >> 30)).astype(_I32)
                else:
                    code = ((wl >> (57 - 3 * k)) & 7).astype(_I32)
                if mode == "storeonly":
                    r = code
                    out_ref[w, k] = r.astype(jnp.int16)
                    continue
                p = (W0 * H0 + W1 * H1 + W2 * H2 + W3 * H3) >> 13
                idx = code >> 1
                m01 = jnp.where(idx == 0, m0, m1)
                m23 = jnp.where(idx == 2, m2, m3)
                m = jnp.where(idx < 2, m01, m23)
                dq = jnp.where((code & 1) == 0, m, -m)
                r = jnp.clip(p + dq, -32768, 32767)
                if mode == "v0":
                    out_ref[w, k] = r.astype(jnp.int16)
                elif mode in ("stack", "pack32", "nostore"):
                    outs.append(r)
                d = dq >> 4
                W0 = W0 + jnp.where(H0 < 0, -d, d)
                W1 = W1 + jnp.where(H1 < 0, -d, d)
                W2 = W2 + jnp.where(H2 < 0, -d, d)
                W3 = W3 + jnp.where(H3 < 0, -d, d)
                H0, H1, H2, H3 = H1, H2, H3, r
            if mode == "stack":
                out_ref[w] = jnp.stack(outs).astype(jnp.int16)
            elif mode == "pack32":
                packed = [
                    (outs[2 * j] & 0xFFFF) | (outs[2 * j + 1] << 16)
                    for j in range(10)
                ]
                out_ref[w] = jnp.stack(packed)
            elif mode == "nostore":
                # keep the dependency alive without sample stores
                pass
            if mode == "storeonly":
                return carry
            return (H0, H1, H2, H3, W0, W1, W2, W3)

        carry = jax.lax.fori_loop(
            0, hi_ref.shape[0], body, tuple(st[i] for i in range(8))
        )
        carry_ref[:, :, :] = jnp.stack(carry)
        if mode == "nostore":
            out_ref[0, 0] = carry[3].astype(jnp.int16)

    return kernel


@functools.partial(jax.jit, static_argnames=("subs", "wblk", "mode"))
def run_variant(state, hi, lo, subs, wblk, mode):
    W, N = hi.shape
    tile = subs * LANES
    n_tiles = N // tile
    rows = N // LANES
    hi3 = hi.reshape(W, rows, LANES)
    lo3 = lo.reshape(W, rows, LANES)
    st3 = state.reshape(8, rows, LANES)
    if mode == "pack32":
        out_shape = jax.ShapeDtypeStruct((W, 10, rows, LANES), jnp.int32)
        out_block = (wblk, 10, subs, LANES)
    else:
        out_shape = jax.ShapeDtypeStruct((W, _SLEN, rows, LANES), jnp.int16)
        out_block = (wblk, _SLEN, subs, LANES)
    out = pl.pallas_call(
        make_kernel(subs, mode),
        grid=(n_tiles, W // wblk),
        in_specs=[
            pl.BlockSpec((wblk, subs, LANES), lambda t, wb: (wb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, subs, LANES), lambda t, wb: (wb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, subs, LANES), lambda t, wb: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_block, lambda t, wb: (wb, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, subs, LANES), jnp.int32)],
    )(hi3, lo3, st3)
    return out


def unpack32(out):
    # (W, 10, rows, LANES) int32 -> (W, 20, rows*LANES) int16
    W, J, rows, L = out.shape
    x = jax.lax.bitcast_convert_type(out, jnp.int16)  # (W,10,rows,L,2)
    x = jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(W, 20, rows * L)
    return x


def main():
    data = open('/root/repo/tests/fixtures/julien_baker_sprained_ankle.qoa', 'rb').read()
    pa = bs.parse_file_arrays(data)
    W0_, N0 = pa.words_be.shape
    Wp = 256
    logical = pa.words_be.copy().view(np.uint64).byteswap()
    N = 32768
    idx = np.arange(N) % N0
    hi = np.ascontiguousarray((logical[:Wp] >> np.uint64(32)).astype(np.uint32)[:, idx])
    lo = np.ascontiguousarray((logical[:Wp] & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, idx])
    state = np.ascontiguousarray(pa.state[:, idx])
    hi_d, lo_d = jax.device_put(hi), jax.device_put(lo)
    st_d = jax.device_put(state)

    # reference output from the production kernel
    subs0, wblk0 = pd.pick_tile(N)
    ref = pd.decode_chains_pallas(st_d, hi_d, lo_d, subs=subs0, wblk=wblk0)
    ref_h = np.asarray(ref)[:, :, :4096]
    print("warm + reference done", flush=True)

    total = Wp * 20 * N

    def timeit(fn, label):
        fn()  # compile+warm
        t0 = time.perf_counter(); fn(); fn()
        d2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(8):
            fn()
        d8 = time.perf_counter() - t0
        per = (d8 - d2) / 6
        print(f"{label}: {per*1e3:6.2f} ms = {total/per/1e9:6.2f} Gsps", flush=True)
        return total / per / 1e9

    configs = [(8, 64), (16, 32), (32, 32)]
    if len(sys.argv) > 2:
        configs = [(int(sys.argv[1]), int(sys.argv[2]))]
    results = {}
    for subs, wblk in configs:
        for mode in ("v0", "nostore", "storeonly", "stack", "pack32"):
            def go(mode=mode, subs=subs, wblk=wblk):
                o = run_variant(st_d, hi_d, lo_d, subs, wblk, mode)
                return int(np.asarray(o[0, 0, 0, 0]))
            # parity for the real-output variants
            if mode in ("v0", "stack"):
                got = np.asarray(run_variant(st_d, hi_d, lo_d, subs, wblk, mode))[:, :, :32, :].reshape(Wp, 20, 4096)
                assert np.array_equal(got, ref_h.reshape(Wp, 20, 4096)), (mode, subs)
            elif mode == "pack32":
                o = run_variant(st_d, hi_d, lo_d, subs, wblk, mode)
                got = np.asarray(unpack32(o))[:, :, :4096]
                assert np.array_equal(got, ref_h.reshape(Wp, 20, 4096)), (mode, subs)
            results[(subs, wblk, mode)] = timeit(go, f"subs={subs:3d} wblk={wblk:3d} {mode:9s}")
    print({f"{k}": round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
