"""Length-bucketed batch_transcode vs the single launch, on chip.

The lane-saturated capture (tpu_lane_saturated.py) proved occupancy is
the transcode lever; the remaining padding waste at deployment scale is
MIXED LENGTHS: a single launch pads every lane to the longest file's
frame count, so short files in a long corpus burn whole padded tiles.
corpus._length_buckets (integrated behind batch_transcode(bucket="auto"))
partitions the corpus into frame-count buckets when that cuts padded
encode work >= 1/0.75.

Corpus here: 256 stereo files — 128 x 64 frames + 128 x 256 frames
(419.4 Msamples, 512 encode chains).  Single launch: F_pad 256 x
Nep 512 = 131,072 padded lane-frames.  Bucketed: 64x256 + 256x256 =
81,920 (1.6x less padded work, one extra dispatch).

Timing: linearity-gated chained launches through the fused handle(s)
(the composite handle dispatches every bucket per call), plus warm e2e.
Parity: bucket="auto" output must equal bucket=False byte-for-byte
(also pinned CPU-side in tests/test_parallel.py).

OUTCOME (2026-08-19, v5e via axon, K in {1,2,4}, gated fits accepted
first rep, R^2 0.9983-1.0000):
    single launch : 243.7 ms/corpus = 1,721 Msps chip rate
    bucketed      : 154.9 ms/corpus = 2,708 Msps chip rate -> 1.57x
    parity        : byte-for-byte identical
    (the padded-work model predicted 131,072/81,920 = 1.6x — the DP's
    cost function is calibrated)
    e2e warm: single 14.0 s = 29.9 Msps, bucketed 16.2 s = 26.0 Msps —
    on THIS rig e2e is tunnel-transfer-bound and the bucketed path's
    split staging costs ~15%; on hardware without the ~45 MB/s tunnel
    the chip rate is the deployment metric, so bucket="auto" stays the
    default.
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

from tpu_lane_saturated import build_corpus, fit_slope  # noqa: E402


def main():
    import jax

    from qoaudio_tpu import codec
    from qoaudio_tpu.parallel.corpus import _length_buckets, batch_transcode

    assert jax.devices()[0].platform == "tpu", "needs the real chip"
    data = open(
        os.path.join(HERE, "..", "tests", "fixtures",
                     "julien_baker_sprained_ankle.qoa"), "rb"
    ).read()
    out = codec.decode_all(data, backend="native")
    stereo = out.samples.reshape(-1, 2)

    spec = [(64 * 5120, 2, 44100)] * 128 + [(256 * 5120, 2, 48000)] * 128
    t0 = time.perf_counter()
    streams, total = build_corpus(stereo, spec)
    print(
        f"corpus: {len(streams)} files, {total/1e6:.1f} Msamples, "
        f"{sum(len(s) for s in streams)/1e6:.1f} MB compressed "
        f"(prep {time.perf_counter()-t0:.0f} s)",
        flush=True,
    )
    segs = _length_buckets(
        [spc // 5120 for spc, _, _ in spec], [ch for _, ch, _ in spec],
        128, 64,
    )
    assert segs is not None, "bucketing must trigger at this shape"
    print(f"buckets: {[len(s) for s in segs]} files", flush=True)

    results = {}
    for label, kw in (("single", dict(bucket=False)),
                      ("bucketed", dict(bucket="auto"))):
        t0 = time.perf_counter()
        outs, handle = batch_transcode(streams, return_fused_handle=True,
                                       **kw)
        print(f"{label}: cold e2e (incl. compile) "
              f"{time.perf_counter()-t0:.1f} s", flush=True)
        results[label] = outs

        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            batch_transcode(streams, **kw)
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

        chain(1)
        per = fit_slope(chain, (1, 2, 4), f"{label} chip pipeline")
        if per is not None:
            print(f"  chip rate: {per*1e3:.0f} ms/corpus = "
                  f"{total/per/1e6:.0f} Msps", flush=True)
            results[label + "_per"] = per

    assert results["single"] == results["bucketed"], "BYTE PARITY FAILURE"
    print("parity: bucketed == single launch, byte-for-byte", flush=True)
    if "single_per" in results and "bucketed_per" in results:
        print(
            f"bucketing speedup on chip: "
            f"{results['single_per']/results['bucketed_per']:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
