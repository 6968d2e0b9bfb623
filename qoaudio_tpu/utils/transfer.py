"""Host<->device transfer helpers for remote-tunnel TPU backends.

The experimental "axon" platform tunnels the chip over a network link: a
single D2H stream sustains only ~29 MB/s, while concurrent streams reach
~45-50 MB/s in aggregate (measured on 32 MB payloads: 1 stream 29 MB/s;
8 x 4 MB chunks on 8 threads 45-52 MB/s, flat through 64 chunks).  These
helpers split large fetches into ~4 MB row chunks and pull them on a
shared thread pool; results are bit-identical to a direct fetch
(np.asarray releases the GIL during the transfer, so the overlap is
real).  Small arrays and CPU-backed arrays fetch directly.

UPLOADS (H2D) gain from the same treatment, but with a session-dependent
payoff and a different optimum: 1 MB chunks on a few threads measured
1.5-1.8x a plain ``jax.device_put`` on a healthy tunnel and an exact
wash (1.00x) in a session whose tunnel serialized uploads — never a loss
(experiments/tunnel_h2d_chunked.py, two sessions 2026-08-18).  Chunks
concatenate ON DEVICE along the row (major) axis — a majors-only copy,
never a minor-axis/tile-bloating one.  ``QOA_NO_CHUNKED_PUT=1`` opts
out.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_CHUNK_BYTES = 4 << 20
_MAX_THREADS = 8
_EXEC = None

_PUT_CHUNK_BYTES = 1 << 20
_PUT_THREADS = 4


def _executor():
    global _EXEC
    if _EXEC is None:
        from concurrent.futures import ThreadPoolExecutor

        _EXEC = ThreadPoolExecutor(
            max_workers=_MAX_THREADS, thread_name_prefix="qoa-d2h"
        )
    return _EXEC


def _chunkable(a) -> bool:
    """True for device arrays worth chunking (big, >=1-d, non-CPU)."""
    if isinstance(a, np.ndarray) or not hasattr(a, "devices"):
        return False
    if a.ndim < 1 or a.shape[0] < 2:
        return False
    if a.size * a.dtype.itemsize <= 2 * _CHUNK_BYTES:
        return False
    try:
        return next(iter(a.devices())).platform != "cpu"
    except Exception:
        return False


def fetch_arrays(arrays: Sequence) -> list:
    """Fetch device arrays to numpy with chunked, concurrent D2H streams.

    Returns ``[np.asarray(a) for a in arrays]`` bit-for-bit; large TPU
    arrays are pulled as parallel row-sliced chunks (see module note).
    """
    jobs = []  # (array_index, chunk_index, device_slice)
    outs: list = [None] * len(arrays)
    parts: dict = {}
    for i, a in enumerate(arrays):
        if not _chunkable(a):
            continue
        nbytes = a.size * a.dtype.itemsize
        n0 = a.shape[0]
        k = min(n0, max(2, round(nbytes / _CHUNK_BYTES)))
        bounds = [n0 * j // k for j in range(k + 1)]
        parts[i] = k
        for j in range(k):
            jobs.append((i, j, a[bounds[j] : bounds[j + 1]]))
    if jobs:
        fetched = list(_executor().map(lambda t: np.asarray(t[2]), jobs))
        by_arr: dict = {i: [None] * k for i, k in parts.items()}
        for (i, j, _), res in zip(jobs, fetched):
            by_arr[i][j] = res
        for i, chunks in by_arr.items():
            outs[i] = np.concatenate(chunks, axis=0)
    for i, a in enumerate(arrays):
        if outs[i] is None:
            outs[i] = np.asarray(a)
    return outs


def fetch_array(a) -> np.ndarray:
    """Single-array form of :func:`fetch_arrays`."""
    return fetch_arrays([a])[0]


def _put_chunkable(a, platform: Optional[str]) -> bool:
    """True for host arrays worth chunk-uploading (big, >=1-d, rows to
    split, destined for a non-CPU device)."""
    if platform == "cpu" or os.environ.get("QOA_NO_CHUNKED_PUT"):
        return False
    if not isinstance(a, np.ndarray) or a.ndim < 1 or a.shape[0] < 2:
        return False
    return a.nbytes > 2 * _PUT_CHUNK_BYTES


def put_arrays(arrays: Sequence, device=None) -> list:
    """Upload host arrays with chunked, concurrent H2D streams.

    Returns ``[jax.device_put(a, device) for a in arrays]`` bit-for-bit;
    large numpy arrays bound for a non-CPU device upload as parallel
    row-sliced chunks and concatenate on device along the row axis (see
    module note).  Device-resident and small arrays pass through a plain
    ``device_put``.
    """
    import jax
    import jax.numpy as jnp

    try:
        platform = (
            device.platform
            if device is not None
            else jax.devices()[0].platform
        )
    except Exception:
        platform = None

    jobs = []  # (array_index, chunk_index, host_slice)
    outs: list = [None] * len(arrays)
    parts: dict = {}
    for i, a in enumerate(arrays):
        if not _put_chunkable(a, platform):
            continue
        n0 = a.shape[0]
        k = min(n0, max(2, round(a.nbytes / _PUT_CHUNK_BYTES)))
        bounds = [n0 * j // k for j in range(k + 1)]
        parts[i] = k
        for j in range(k):
            jobs.append((i, j, a[bounds[j] : bounds[j + 1]]))
    if jobs:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=_PUT_THREADS, thread_name_prefix="qoa-h2d"
        ) as ex:
            up = list(ex.map(lambda t: jax.device_put(t[2], device), jobs))
        by_arr: dict = {i: [None] * k for i, k in parts.items()}
        for (i, j, _), res in zip(jobs, up):
            by_arr[i][j] = res
        for i, chunks in by_arr.items():
            outs[i] = jnp.concatenate(chunks, axis=0)
    for i, a in enumerate(arrays):
        if outs[i] is None:
            outs[i] = jax.device_put(a, device)
    return outs


def put_array(a, device=None):
    """Single-array form of :func:`put_arrays`."""
    return put_arrays([a], device)[0]
