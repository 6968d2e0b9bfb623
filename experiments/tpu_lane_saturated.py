"""Chip-side transcode rate at FULL encode-lane occupancy.

The bench corpus (32 files) has only 48 real encode chains padded to the
128-lane Pallas tile (~37% occupancy) and its F_pad is pinned by the
longest file (256 frames) — both documented structural caps for <=128
chains (CLAUDE.md 2026-08-17).  The north-star deployment shape is a
corpus that actually FILLS the lanes.  This harness builds one:

  128 stereo files x 64 frames each (length-bucketed, so F_pad is tight)
  -> Ne = 256 encode chains = Nep 256 (100% lane occupancy, two
     128-lane groups = exactly the kernel's 256-lane optimum block)
  -> 83.9 Msamples total.

Method: batch_transcode(..., return_fused_handle=True) stages the whole
pipeline device-resident; the handle re-dispatches decode -> relayout ->
lens -> encode -> packing in one launch with no host staging.  Timing is
the linearity-gated chained-launch slope (CLAUDE.md axon methodology);
the 32-file bench corpus runs in the SAME process for an apples-to-
apples occupancy comparison.  A 4-file spot parity gate (host pair)
runs before any timing.

OUTCOME (2026-08-19, v5e via axon, K in {2,4,8}, gated fits, first-rep
accepts with R^2 >= 0.9998):
    bench corpus   (48/128 chains, F_pad=256, 35.7 Msamples):
        60.1 ms/corpus =   594 Msps chip rate; e2e warm 1.71 s = 20.9
    saturated      (256/256 chains, F_pad=64,  83.9 Msamples):
        30.1 ms/corpus = 2,788 Msps chip rate; e2e warm 2.04 s = 41.0
    -> 4.69x the per-corpus chip rate at 5.3x the real-lane count: the
       bench corpus serializes 256 grid frame-steps for 48 real chains
       (37% of one tile), the saturated corpus runs 64 steps with all
       256 lanes real.  Occupancy converts padding into throughput
       exactly as the structural analysis predicted (CLAUDE.md
       2026-08-17); at the deployment shape the chip does 2.79 Gsps
       end-to-end transcode (decode+relayout+encode+packing in one
       launch).  e2e stays tunnel-bound (33.9 MB compressed up +
       staged halves; ~45 MB/s aggregate) but the larger payload
       amortizes fixed dispatch: 41 Msps = 1.2x the Rust host pair.
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))


def fit_slope(chain, Ks, name, min_r2=0.985, tries=3):
    ks = np.asarray(Ks, float)
    for rep in range(tries):
        ts = np.array([chain(int(k)) for k in Ks], float)
        slope, icept = np.polyfit(ks, ts, 1)
        pred = slope * ks + icept
        ss = float(((ts - ts.mean()) ** 2).sum())
        r2 = 1.0 - float(((ts - pred) ** 2).sum()) / ss if ss > 0 else 0.0
        print(
            f"  {name} rep{rep}: "
            + " ".join(f"K={int(k)}:{t*1e3:.0f}ms" for k, t in zip(ks, ts))
            + f" -> slope {slope*1e3:.1f} ms, R^2 {r2:.4f}",
            flush=True,
        )
        if slope > 0 and r2 >= min_r2:
            return slope
    print(f"  {name}: every rep rejected")
    return None


def build_corpus(stereo, spec):
    """spec: list of (samples_per_channel, channels, rate)."""
    from qoaudio_tpu import codec
    from qoaudio_tpu.types import QoaDesc

    n_src = stereo.shape[0]
    files, pos = [], 0
    for spc_i, ch, rate in spec:
        idx = (pos + np.arange(spc_i)) % n_src
        blk = stereo[idx][:, :ch]
        files.append(
            (np.ascontiguousarray(blk).reshape(-1), QoaDesc(ch, rate, spc_i))
        )
        pos = (pos + spc_i + 9973) % n_src
    streams = [codec.encode_all(p, d, backend="native") for p, d in files]
    total = sum(d.samples * d.channels for _, d in files)
    return streams, total


def run_corpus(label, streams, total):
    from qoaudio_tpu import codec
    from qoaudio_tpu.parallel.corpus import batch_transcode
    from qoaudio_tpu.types import QoaDesc

    print(
        f"{label}: {len(streams)} files, {total/1e6:.1f} Msamples, "
        f"{sum(len(s) for s in streams)/1e6:.1f} MB compressed",
        flush=True,
    )
    t0 = time.perf_counter()
    got, handle = batch_transcode(streams, return_fused_handle=True)
    e2e = time.perf_counter() - t0
    print(f"  e2e (cold, incl. compile): {e2e:.2f} s", flush=True)
    # spot parity: 4 files vs the host pair
    for i in list(range(0, len(streams), max(1, len(streams) // 4)))[:4]:
        out = codec.decode_all(streams[i], backend="native")
        want = codec.encode_all(
            out.samples,
            QoaDesc(out.num_channels, out.sample_rate,
                    out.samples_per_channel),
            backend="native",
        )
        assert got[i] == want, f"parity failure at file {i}"
    print("  spot parity (4 files): ok", flush=True)

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        batch_transcode(streams)
        best = min(best, time.perf_counter() - t0)
    print(f"  e2e (warm): {best:.2f} s = {total/best/1e6:.1f} Msps",
          flush=True)

    def chain(K):
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = handle()
        int(np.asarray(o[0][0]))
        return time.perf_counter() - t0

    chain(1)  # warm the fetch path
    per = fit_slope(chain, (2, 4, 8), f"{label} chip pipeline")
    if per is not None:
        print(
            f"  chip rate: {per*1e3:.1f} ms/corpus = "
            f"{total/per/1e6:.0f} Msps",
            flush=True,
        )
    return per


def main():
    import jax

    from qoaudio_tpu import codec

    assert jax.devices()[0].platform == "tpu", "needs the real chip"
    data = open(
        os.path.join(HERE, "..", "tests", "fixtures",
                     "julien_baker_sprained_ankle.qoa"), "rb"
    ).read()
    out = codec.decode_all(data, backend="native")
    stereo = out.samples.reshape(-1, 2)

    # the 32-file bench corpus (bench.py shape, verbatim) — ~37% occupancy
    bench_spec = [
        ((64, 128, 256)[i % 3] * 5120, (2, 1, 2, 1)[i % 4],
         (44100, 22050, 48000)[i % 3])
        for i in range(32)
    ]
    # 128 stereo files, 64 frames each — 256/256 encode lanes, tight F_pad
    sat_spec = [(64 * 5120, 2, (44100, 48000)[i % 2]) for i in range(128)]

    streams_b, total_b = build_corpus(stereo, bench_spec)
    streams_s, total_s = build_corpus(stereo, sat_spec)

    per_b = run_corpus("bench corpus (48/128 chains)", streams_b, total_b)
    per_s = run_corpus("saturated corpus (256/256 chains)", streams_s,
                       total_s)
    if per_b and per_s:
        print(
            f"occupancy effect: saturated corpus moves "
            f"{total_s/per_s/1e6:.0f} Msps vs {total_b/per_b/1e6:.0f} Msps "
            f"({(total_s/per_s)/(total_b/per_b):.2f}x) on the same chip",
            flush=True,
        )


if __name__ == "__main__":
    main()
