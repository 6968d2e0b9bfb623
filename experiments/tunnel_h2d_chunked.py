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
     best-of-5, plus a chunk-size/thread sweep;
  3. overlap probe (TPU only): can an async-dispatched compute run
     while the next payload uploads?  Decides whether sub-batch
     pipelining of batch_transcode could hide the ~100 ms of chip
     compute under the ~680 ms upload.

OUTCOME (2026-08-18, v5e via axon, healthy tunnel):
  - chunked-parallel H2D is a WASH at every config tried (4 MB x 8
    threads 1.00x; sweep 1-16 MB x 2-16 threads all 0.97-1.03x):
    the tunnel SERIALIZES uploads; H2D sustains ~25 MB/s no matter
    how it is issued (D2H, by contrast, gained 1.5-1.7x from
    chunking).  Do NOT integrate put_chunked.
  - overlap probe: dispatching the compute THEN uploading measures
    upload+compute ~= max(upload, compute) when overlap works;
    result recorded below by the run.
Consequence for the e2e transcode number: with upload ~680 ms and
D2H ~220 ms both pinned by the link and only ~10% duplex overlap,
the e2e floor is ~0.9 s for the bench corpus (~40 Msps) regardless
of chip speed — the 1.5x-Rust e2e target is unreachable on THIS
tunnel; the chip-side rate (transcode_chip_msps) is the deployment
metric that reflects the framework.
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


def put_chunked(x, device, chunk_bytes=CHUNK_BYTES, threads=THREADS):
    """Upload x as parallel row chunks; returns one device array."""
    import jax
    import jax.numpy as jnp

    rows = x.shape[0]
    row_bytes = x.nbytes // max(rows, 1)
    rows_per = max(1, chunk_bytes // max(row_bytes, 1))
    if rows <= rows_per:
        return jax.device_put(x, device)
    pieces = [x[i : i + rows_per] for i in range(0, rows, rows_per)]
    ex = ThreadPoolExecutor(max_workers=threads)
    futs = [ex.submit(jax.device_put, p, device) for p in pieces]
    parts = [f.result() for f in futs]
    ex.shutdown()
    return jnp.concatenate(parts, axis=0)


def main(only=None):
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
    if only == "overlap":
        _overlap_probe(jax, x, dev)
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

    # chunk-size / thread sweep (best-of-3 each; the 4 MB x 8 default
    # was a wash — is ANY config better than plain?)
    for cb_mb in (1, 2, 8, 16):
        for th in (2, 4, 16):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                y = put_chunked(x, dev, cb_mb << 20, th)
                _ = np.asarray(y.ravel()[0])
                best = min(best, time.perf_counter() - t0)
            print(f"  chunk {cb_mb:2d} MB x {th:2d} thr: {best*1e3:7.1f} ms "
                  f"({t_plain/best:.2f}x vs plain)")

    _overlap_probe(jax, x, dev)


def _overlap_probe(jax, x, dev):
    # ---- overlap probe: does compute overlap an in-flight upload? ----
    # A compute long enough to matter: K chained launches of a matmul-ish
    # op on a resident buffer (~100+ ms), dispatched BEFORE the upload.
    import jax.numpy as jnp

    resident = jax.device_put(x[:, :2048].astype(np.float32))  # square

    @jax.jit
    def burn(a):
        for _ in range(8):
            a = jnp.tanh(a @ a)
        return a

    r = burn(resident)
    _ = np.asarray(r.ravel()[0])  # compile + warm

    def t_compute():
        t0 = time.perf_counter()
        rr = burn(resident)
        _ = np.asarray(rr.ravel()[0])
        return time.perf_counter() - t0

    def t_upload():
        t0 = time.perf_counter()
        y = jax.device_put(x, dev)
        _ = np.asarray(y.ravel()[0])
        return time.perf_counter() - t0

    def t_both():
        t0 = time.perf_counter()
        rr = burn(resident)  # async dispatch first
        y = jax.device_put(x, dev)  # upload while it computes?
        _ = np.asarray(y.ravel()[0])
        _ = np.asarray(rr.ravel()[0])
        return time.perf_counter() - t0

    tc = min(t_compute() for _ in range(3))
    tu = min(t_upload() for _ in range(3))
    tb = min(t_both() for _ in range(3))
    overlap = (tc + tu - tb) / min(tc, tu) if min(tc, tu) > 0 else 0.0
    print(f"compute alone : {tc*1e3:7.1f} ms")
    print(f"upload alone  : {tu*1e3:7.1f} ms")
    print(f"both          : {tb*1e3:7.1f} ms "
          f"(serial would be {(tc+tu)*1e3:.1f}; overlap {overlap*100:.0f}% "
          f"of the shorter leg)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
