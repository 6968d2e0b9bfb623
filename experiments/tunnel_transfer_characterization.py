"""Axon tunnel transfer characterization (round-4 experiment).

OUTCOME (2026-08-17):
  * D2H sustains ~29 MB/s on a single stream; 8 concurrent ~4 MB chunk
    fetches reach ~45-52 MB/s aggregate, flat through 64 chunks
    (utils/transfer.py implements exactly this).
  * H2D sustains ~120 MB/s warm.
  * Concurrent H2D+D2H of 16 MB each: 0.69-0.75 s vs 0.76-0.82 s serial
    — only ~10% overlap, i.e. the link is effectively half-duplex, so
    group-pipelined corpus transfers were not worth building.
  * The FIRST D2H fetch in a process intermittently takes 150-500 s
    (transient degradation windows, minutes long).
  * jax Arrays cache their host value after the first np.asarray — a
    repeated fetch of the SAME array measures ~0 s.  Always fetch fresh
    buffers when benchmarking transfers.
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax


def main():
    x = np.random.randint(0, 2**31, size=(32 * 1024 * 256,), dtype=np.uint32)
    xd = jax.device_put(x)
    xd.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(xd[:1024])
    print(f"first-fetch (tunnel warm-up): {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    a = np.asarray(xd)
    t1 = time.perf_counter() - t0
    print(f"single-stream D2H 32MB: {t1:.2f}s ({32/t1:.0f} MB/s)")
    assert np.array_equal(a, x)

    for trial, K in enumerate((2, 4, 8, 16)):
        y = jax.device_put(x ^ np.uint32(trial + 1))  # fresh buffer per trial
        y.block_until_ready()
        n = x.size // K
        parts = [y[i * n : (i + 1) * n] for i in range(K)]
        for p in parts:
            p.block_until_ready()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(min(K, 8)) as ex:
            outs = list(ex.map(np.asarray, parts))
        dt = time.perf_counter() - t0
        ok = np.array_equal(np.concatenate(outs), np.asarray(y))
        print(f"{K} chunks D2H 32MB: {dt:.2f}s ({32/dt:.0f} MB/s) exact={ok}")

    # duplex probe
    wd = jax.device_put(x ^ np.uint32(11))
    wd.block_until_ready()
    v = x ^ np.uint32(13)
    t0 = time.perf_counter()
    b = jax.device_put(v)
    b.block_until_ready()
    th = time.perf_counter() - t0
    zd = jax.device_put(x ^ np.uint32(9))
    zd.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(zd)
    td = time.perf_counter() - t0
    print(f"serial:     H2D {th:.2f}s + D2H {td:.2f}s = {th+td:.2f}s")
    wd2 = jax.device_put(x ^ np.uint32(17))
    wd2.block_until_ready()
    v2 = x ^ np.uint32(19)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(lambda: jax.device_put(v2).block_until_ready())
        f2 = ex.submit(lambda: np.asarray(wd2).sum())
        f1.result()
        f2.result()
    print(f"concurrent: H2D+D2H overlapped = {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
