"""Chunked-parallel H2D upload over the axon tunnel.

D2H on this tunnel gained 1.5-1.7x from 4 MB x 8-thread chunking
(utils/transfer.fetch_arrays: 29 -> 45-52 MB/s).  The transcode's
UPLOAD side (hi/lo word halves, ~17 MB at the bench corpus) is still a
single-stream `jax.device_put` — if H2D behaves like D2H, a chunked
upload saves ~100-120 ms of the ~800 ms transcode e2e.

Design constraint from the relayout finding: chunk along the MAJOR
(row) axis and reassemble with `jnp.concatenate(axis=0)` on device —
never the minor/lane axis (tile bloat).

This experiment:
  1. correctness: chunked upload + device concat == plain device_put,
     on whatever backend is available (runs on CPU too);
  2. perf (TPU only): A/B plain vs chunked on a 32 MB payload,
     best-of-5, plus a duplex probe (upload while a fetch drains).

OUTCOME: pending a healthy tunnel — the axon link was fully down for
the rest of round 4 (jax.devices() hung for 7+ hours); correctness
verified on CPU.  Run on TPU before integrating anything.
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

CHUNK_BYTES = 4 << 20
THREADS = 8


def put_chunked(x, device):
    """Upload x as parallel row chunks; returns one device array."""
    import jax
    import jax.numpy as jnp

    rows = x.shape[0]
    row_bytes = x.nbytes // max(rows, 1)
    rows_per = max(1, CHUNK_BYTES // max(row_bytes, 1))
    if rows <= rows_per:
        return jax.device_put(x, device)
    pieces = [x[i : i + rows_per] for i in range(0, rows, rows_per)]
    ex = ThreadPoolExecutor(max_workers=THREADS)
    futs = [ex.submit(jax.device_put, p, device) for p in pieces]
    parts = [f.result() for f in futs]
    ex.shutdown()
    return jnp.concatenate(parts, axis=0)


def main():
    import jax

    dev = jax.devices()[0]
    print("device:", dev)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 31, size=(2048, 4096), dtype=np.int64).astype(
        np.uint32
    )  # 32 MB

    a = np.asarray(jax.device_put(x, dev))
    b = np.asarray(put_chunked(x, dev))
    assert np.array_equal(a, b)
    print("correctness: chunked upload bit-identical")

    if dev.platform != "tpu":
        print("no TPU: perf section skipped")
        return

    def timed(fn):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            y = fn()
            _ = np.asarray(y.ravel()[0])  # force completion
            best = min(best, time.perf_counter() - t0)
        return best

    t_plain = timed(lambda: jax.device_put(x, dev))
    t_chunk = timed(lambda: put_chunked(x, dev))
    mb = x.nbytes / 1e6
    print(f"plain  : {t_plain*1e3:7.1f} ms = {mb/t_plain:6.1f} MB/s")
    print(f"chunked: {t_chunk*1e3:7.1f} ms = {mb/t_chunk:6.1f} MB/s "
          f"({t_plain/t_chunk:.2f}x)")


if __name__ == "__main__":
    main()
