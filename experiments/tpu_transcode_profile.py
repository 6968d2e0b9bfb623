"""Attribute the fused transcode pipeline's chip time stage by stage.

The bench corpus (32 files, 35.7 Msamples) runs the whole device
pipeline in ONE jit at ~105 ms (341 Msps chip rate).  Back-of-envelope:
the encode kernel at its measured 4.2 Gsps over the PADDED shape
(128 lanes x 256 frames x 5120) is ~40 ms (the padding itself is
structural for <= 128 chains, see CLAUDE.md), the decode kernel ~1 ms —
so ~60 ms were unattributed: the (Nd, W, 20) transpose, the per-file
relayout copies, the lens broadcast, or the per-file output packing.

Method: build jits that cut the pipeline after each stage and RETURN
that stage's full array (materialized in HBM; no fused-away work), time
K chained launches with ONE tiny sync fetch (axon methodology — see
CLAUDE.md), and difference the stages.  Suspect going in: decT
(Nd, W_enc, 20) pads its minor dim 20 -> (8,128) tiles on TPU, a ~6x
memory bloat on a ~170 M-element array.

Run: QOA_TEST_TPU must NOT force cpu; needs the real chip.

OUTCOME (2026-08-17, v5e via axon, K=5 chained, two runs x two reps,
bench corpus Nd=6976 Ndp=8192 Nep=128 F_pad=256):
    decode                 :   6-11 ms
    + transpose (Nd,W,20)  :   ~0    (fuses into the relayout copy)
    + relayout (shipped A) :  +40-44 ms   <-- the hidden cost
    + lens                 :   ~0
    + encode kernel        :  +59-67 ms
    + per-file packing     :   +3 ms
    total                  : ~114 ms (matches the ~105 ms bench capture)
Variant B relayout (ONE take along the chain-major axis with a
precomputed (F_pad*Nep,) row index — invalid slots point at row 0,
their lens are 0 so values never matter — then a majors-only
transpose): decode+relayout falls 49.2 ms -> 8.9-11.0 ms, i.e. the
relayout itself is ~FREE.  The shipped A form built 32 per-file blocks
with minor dim C in {1,2} (~64x tile bloat each) and concatenated them
along the minor axis.  B INTEGRATED into _relayout_encode_input.
POST-FIX RE-PROFILE (2026-08-19, integrated pipeline, same corpus,
two reps): decode 6.3-8.2 ms, +transpose ~0 (folds), +relayout
1.6-1.9 ms, +lens ~0, +encode 53.9-54.8 ms, +pack 1.9 ms; TOTAL
65.4-65.6 ms = ~545 Msps chip rate (vs 341 pre-fix; the ~480
projection was conservative).  The relayout A/B comparison is now a
wash (A 8.9-9.0 vs B 9.5-9.6 ms measured FROM decode) because the
shipped A *is* variant B.
The encode stage's ~63 ms is STRUCTURAL for this corpus: the longest
file's 256-frame chain serializes 256 grid steps at the 128-lane
minimum plane width (~0.25 ms/step); fewer real lanes cannot shrink a
step and frame-splitting a chain would change the bytes.  Projected
chip rate after B: ~35.7M / ~74 ms = ~480 Msps (from 341).
"""
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))


def main():
    import jax
    import jax.numpy as jnp

    from qoaudio_tpu import codec, format as fmt
    from qoaudio_tpu.bitstream import parse_file_arrays
    from qoaudio_tpu.codec import initial_encoder_state
    from qoaudio_tpu.parallel import corpus as C
    from qoaudio_tpu.ops.pallas_decode import (
        LANES as DL, decode_chains_pallas, pick_tile,
    )
    from qoaudio_tpu.ops.pallas_encode import encode_frames_pallas
    from qoaudio_tpu.types import QoaDesc

    assert jax.devices()[0].platform == "tpu", "needs the real chip"

    # ---- the bench corpus, verbatim shape ----
    data = open(os.path.join(
        HERE, "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    out = codec.decode_all(data, backend="native")
    stereo = out.samples.reshape(-1, 2)
    n_src = stereo.shape[0]
    files, pos = [], 0
    for i in range(32):
        spc_i = (64, 128, 256)[i % 3] * 5120
        ch = (2, 1, 2, 1)[i % 4]
        rate = (44100, 22050, 48000)[i % 3]
        idx = (pos + np.arange(spc_i)) % n_src
        blk = stereo[idx][:, :ch]
        files.append(
            (np.ascontiguousarray(blk).reshape(-1), QoaDesc(ch, rate, spc_i))
        )
        pos = (pos + spc_i + 9973) % n_src
    streams = [codec.encode_all(p, d, backend="native") for p, d in files]
    total = sum(d.samples * d.channels for _, d in files)
    print(f"corpus: {len(streams)} files, {total/1e6:.1f} Msamples")

    # ---- stage exactly like batch_transcode's TPU mesh=None path ----
    parsed = [parse_file_arrays(d) for d in streams]
    W = max(p.max_windows for p in parsed)
    doffs, n = [], 0
    for p in parsed:
        doffs.append(n)
        n += p.n_frames * p.channels
    Nd = n
    subs, wblk = pick_tile(Nd)
    tile = subs * DL
    Ndp = -(-Nd // tile) * tile
    Wp = -(-W // wblk) * wblk
    hi, lo, dstate = C._stage_word_halves(parsed, doffs, Wp, Ndp)

    eoffs, n = [], 0
    for p in parsed:
        eoffs.append(n)
        n += p.channels
    Ne = n
    Nep = -(-Ne // 128) * 128
    F_max = max(p.n_frames for p in parsed)
    chunk = min(64, codec._next_pow2(F_max))
    F_pad = -(-F_max // chunk) * chunk
    W_enc = max(
        fmt.QOA_SLICES_PER_FRAME if p.n_frames > 1 else p.max_windows
        for p in parsed
    )
    samples = np.zeros(Nep, np.int64)
    for p, eoff in zip(parsed, eoffs):
        samples[eoff : eoff + p.channels] = int(p.samples_per_frame.sum())
    metas = tuple(
        (p.n_frames, p.channels, doff, eoff)
        for p, doff, eoff in zip(parsed, doffs, eoffs)
    )
    state = initial_encoder_state(0, Nep)
    print(f"Nd={Nd} Ndp={Ndp} Ne={Ne} Nep={Nep} F_pad={F_pad} W_enc={W_enc}")
    print(f"padded enc lane-samples: {Nep*F_pad*fmt.QOA_FRAME_LEN/1e6:.0f} M")

    def make(stage):
        @jax.jit
        def f(dstate, hi, lo, samples_i32, st):
            dec = decode_chains_pallas(dstate, hi, lo, subs=subs, wblk=wblk)
            if stage == "decode":
                return dec
            decT = jnp.transpose(dec[:W_enc], (2, 0, 1))
            if stage == "transpose":
                return decT
            x_enc = C._relayout_encode_input(decT, metas, W_enc, F_pad, Ne,
                                             Nep)
            if stage == "relayout":
                return x_enc
            lens = C._transcode_lens(samples_i32, F_pad, W_enc)
            if stage == "lens":
                return x_enc, lens
            _, snaps, whi, wlo = encode_frames_pallas(st, x_enc, lens)
            if stage == "encode":
                return snaps, whi, wlo
            hp, lp, sp = [], [], []
            for F_i, ch, _doff, eoff in metas:
                hp.append(whi[:F_i, :, eoff : eoff + ch].reshape(-1))
                lp.append(wlo[:F_i, :, eoff : eoff + ch].reshape(-1))
                sp.append(
                    snaps[:F_i, :, eoff : eoff + ch]
                    .astype(jnp.int32).reshape(-1)
                )
            return jnp.concatenate(sp), jnp.concatenate(hp), \
                jnp.concatenate(lp)
        return f

    args = (
        jax.device_put(dstate), jax.device_put(hi), jax.device_put(lo),
        jnp.asarray(samples, jnp.int32), jax.device_put(state),
    )

    def sync(res):
        x = res[0] if isinstance(res, tuple) else res
        return int(np.asarray(jax.device_get(x.ravel()[0])))

    stages = ["decode", "transpose", "relayout", "lens", "encode", "pack"]
    fns = {}
    for st in stages:
        t0 = time.perf_counter()
        fns[st] = make(st)
        sync(fns[st](*args))  # compile + warm
        print(f"  compiled {st} in {time.perf_counter()-t0:.0f} s",
              flush=True)
    K = 5
    for rep in range(2):
        times = {}
        for st in stages:
            f = fns[st]
            sync(f(*args))  # warm re-run (page-in)
            t0 = time.perf_counter()
            r = None
            for _ in range(K):
                r = f(*args)
            sync(r)
            times[st] = (time.perf_counter() - t0) / K
        prev = 0.0
        print(f"rep {rep}:")
        for st in stages:
            ms = times[st] * 1e3
            print(f"  {st:9s}: {ms:7.2f} ms  (+{ms - prev*1e3:6.2f})")
            prev = times[st]

    # ---- relayout variants, decode included both times (same baseline):
    # vB = one major-axis take with a precomputed (F_pad*Nep,) row index
    # (invalid slots -> row 0; their lens are 0 so values don't matter),
    # then one majors-only transpose
    idx = np.zeros((F_pad, Nep), np.int32)
    for F_i, ch, doff, eoff in metas:
        for c in range(ch):
            idx[:F_i, eoff + c] = doff + np.arange(F_i) * ch + c
    idx_flat = jnp.asarray(idx.reshape(-1))

    @jax.jit
    def relayout_vB(dstate, hi, lo, samples_i32, st):
        dec = decode_chains_pallas(dstate, hi, lo, subs=subs, wblk=wblk)
        decT = jnp.transpose(dec[:W_enc], (2, 0, 1))  # (Ndp, W_enc, 20)
        x = jnp.take(decT, idx_flat, axis=0)          # (F_pad*Nep, W, 20)
        x = x.reshape(F_pad, Nep, W_enc, fmt.QOA_SLICE_LEN)
        return jnp.transpose(x, (0, 2, 3, 1))         # (F_pad, W, 20, Nep)

    t0 = time.perf_counter()
    xb = relayout_vB(*args)
    xb.block_until_ready()
    print(f"  compiled relayoutB in {time.perf_counter()-t0:.0f} s",
          flush=True)
    # parity vs the shipped relayout: equality holds wherever the slot is
    # valid (f < F_i); invalid slots differ (zeros vs row 0) by design
    xa = fns["relayout"](*args)
    va = np.asarray(jax.device_get(xa))
    vb = np.asarray(jax.device_get(xb))
    valid = np.zeros((F_pad, Nep), bool)
    for F_i, ch, _doff, eoff in metas:
        valid[:F_i, eoff : eoff + ch] = True
    m = valid[:, None, None, :]
    ok = np.array_equal(
        np.broadcast_to(m, va.shape) * va.astype(np.int32),
        np.broadcast_to(m, vb.shape) * vb.astype(np.int32),
    )
    print(f"  relayoutB parity on valid slots: {ok}")
    for rep in range(2):
        res = {}
        for nm, f in (("relayoutA", fns["relayout"]), ("relayoutB",
                                                       relayout_vB)):
            sync(f(*args))
            t0 = time.perf_counter()
            r = None
            for _ in range(K):
                r = f(*args)
            sync(r)
            res[nm] = (time.perf_counter() - t0) / K * 1e3
        print(f"  rep {rep}: A {res['relayoutA']:.2f} ms   "
              f"B {res['relayoutB']:.2f} ms")


if __name__ == "__main__":
    main()
