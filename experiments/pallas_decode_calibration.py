"""Decode-kernel launch-cost calibration (round-4 experiment).

Times K chained launches (one sync at the end) for K in {1,2,4,8,16,24}
and fits a line: the slope is the true per-launch execution cost, the
intercept the tunnel dispatch+fetch RTT.  OUTCOME (2026-08-17, 3 reps):
slope 2.8-3.5 ms/launch = 48-59 Gsps with a ~27-39 ms intercept — a
per-launch-synced measurement is dominated by the intercept, which is
exactly how the round-3 "7 Gsps decode bottleneck" illusion happened.
Always check linearity: some tunnel sessions return garbage (even
negative) slopes.
"""
import sys, time; sys.path.insert(0, '/root/repo')
import numpy as np, jax
from qoaudio_tpu import bitstream as bs
from qoaudio_tpu.ops import pallas_decode as pd

data = open('/root/repo/tests/fixtures/julien_baker_sprained_ankle.qoa','rb').read()
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
total = Wp * 20 * N

def launch():
    return pd.decode_chains_pallas(st_d, hi_d, lo_d, subs=32, wblk=32)
o = launch(); _ = int(np.asarray(o[0,0,0]))  # warm + tunnel

for rep in range(3):
    rows = []
    for K in (1, 2, 4, 8, 16, 24):
        t0 = time.perf_counter()
        for _ in range(K):
            o = launch()
        _ = int(np.asarray(o[0,0,0]))
        rows.append((K, time.perf_counter() - t0))
    ks = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    slope, icept = np.polyfit(ks, ts, 1)
    print("  ".join(f"K={k}:{t*1e3:.1f}ms" for k, t in rows), flush=True)
    print(f"rep{rep}: slope {slope*1e3:.2f} ms/launch -> {total/slope/1e9:.1f} Gsps, intercept {icept*1e3:.1f} ms", flush=True)
