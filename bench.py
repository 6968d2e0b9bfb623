#!/usr/bin/env python
"""Headline benchmark: bit-exact QOA encode throughput on one chip.

Workload: real music PCM (the reference fixture decoded), batched across
the chain axis so the encoder kernel's 16-scalefactor lanes and the VPU
stay saturated — the deployment shape of this framework (batched corpus
transcode, BASELINE.json config 5).  The PCM working set is staged once
and stays HBM-resident; the timed region is the encode kernel chain.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference Rust encoder at ~41.3 Msamples/s on Apple M-series
(BASELINE.md).  Progress details go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_bench"),
)

FIXTURE = "/root/reference/fixtures/julien_baker_sprained_ankle.qoa"
RUST_ENCODE_MSAMPLES_PER_S = 41.3  # BASELINE.md (Apple M-series)

N_CHAINS = 2048  # 1024 stereo streams as vector lanes
BENCH_FRAMES = 64  # frames per stream in the resident working set
CHUNK_FRAMES = 32  # frames per kernel launch


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_pcm():
    from qoaudio_tpu import codec

    if os.path.exists(FIXTURE):
        with open(FIXTURE, "rb") as f:
            data = f.read()
        t0 = time.perf_counter()
        out = codec.decode_all(data)
        dt = time.perf_counter() - t0
        log(
            f"decode fixture: {len(out.samples)} samples in {dt*1e3:.0f} ms "
            f"end-to-end ({len(out.samples)/dt/1e6:.0f} Msamples/s incl. host)"
        )
        return out.samples, out.num_channels, out.samples_per_channel
    log("fixture missing; synthesizing 54-s stereo signal")
    rng = np.random.default_rng(0)
    n = 2_394_122
    t = np.arange(n) / 44100.0
    sig = (
        np.sin(2 * np.pi * 220 * t) * 9000
        + np.sin(2 * np.pi * 3313 * t) * 3000
        + rng.normal(0, 500, n)
    )
    pcm = np.stack([sig, np.roll(sig, 7)], -1).reshape(-1).astype(np.int16)
    return pcm, 2, n


def main():
    import jax

    from qoaudio_tpu import codec
    from qoaudio_tpu.ops.encode import encode_frames, initial_encoder_state

    log(f"devices: {jax.devices()}")
    pcm, channels, samples_per_channel = load_pcm()

    x, lens, F = codec.layout_pcm(pcm, channels, samples_per_channel)
    F_use = min(BENCH_FRAMES, F)
    reps = N_CHAINS // channels
    state = initial_encoder_state(channels, N_CHAINS)

    # working set: (F_use, 256, 20, N) int16 ~= BENCH_FRAMES*2.6 MB * N/256
    xp = np.repeat(x[:F_use], reps, axis=3)
    lp = np.repeat(
        lens[:F_use, :, None].astype(np.int32), N_CHAINS, axis=2
    )

    chunks = []
    for f0 in range(0, F_use, CHUNK_FRAMES):
        chunks.append(
            (
                jax.device_put(xp[f0 : f0 + CHUNK_FRAMES]),
                jax.device_put(lp[f0 : f0 + CHUNK_FRAMES]),
            )
        )
    del xp, lp

    def run_all(state):
        outs = []
        for cx, cl in chunks:
            state, snaps, hi, lo = encode_frames(state, cx, cl)
            outs.append((hi, lo))
        return state, outs

    st = jax.device_put(state)
    t0 = time.perf_counter()
    _, outs = run_all(st)
    jax.block_until_ready(outs)
    log(f"compile+first run: {time.perf_counter()-t0:.1f} s")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, outs = run_all(st)
        jax.block_until_ready(outs)
        best = min(best, time.perf_counter() - t0)

    total_samples = F_use * 5120 * N_CHAINS
    msps = total_samples / best / 1e6
    log(
        f"batched encode: {N_CHAINS // channels} streams x {F_use} frames x "
        f"{channels} ch in {best:.3f} s"
    )
    print(
        json.dumps(
            {
                "metric": "encode_msamples_per_sec_per_chip",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / RUST_ENCODE_MSAMPLES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
