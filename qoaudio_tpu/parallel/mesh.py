"""Device-mesh sharding for multi-chip corpus transcode.

The QOA workload is embarrassingly parallel across files/channels
(SURVEY.md §2.2): the chain axis N of the codec kernels shards over a 1-D
``jax.sharding.Mesh`` with no algorithmic point-to-point communication —
XLA partitions the elementwise work and only throughput statistics are
all-gathered.  Shardings ride ICI; there is no NCCL/MPI analog to port
(the reference is single-threaded scalar Rust).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def _spec_for_rank(rank: int) -> P:
    """PartitionSpec sharding only the last (chain) axis."""
    return P(*([None] * (rank - 1) + [DATA_AXIS]))


def shard_chain_arrays(mesh: Mesh, *arrays):
    """Device-put arrays with their last axis sharded across the mesh.

    The chain axis must be divisible by the mesh size (pad first).
    """
    out = []
    for a in arrays:
        spec = _spec_for_rank(np.ndim(a))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def encode_frames_sharded(mesh: Mesh, state, samples, lens):
    """Run the encoder kernel with all operands sharded over chains.

    state (8, N), samples (F, 256, 20, N), lens (F, 256, N); N must be a
    multiple of the mesh size.  Compiles to per-device partitions with no
    cross-device collectives in the hot loop.
    """
    from ..ops.encode import encode_frames

    state, samples, lens = shard_chain_arrays(mesh, state, samples, lens)
    return encode_frames(state, samples, lens)


def decode_chains_sharded(mesh: Mesh, state, sf, codes):
    """Run the decoder kernel with all operands sharded over chains."""
    from ..ops.decode import decode_chains

    state, sf, codes = shard_chain_arrays(mesh, state, sf, codes)
    return decode_chains(state, sf, codes)


def decode_chains_pallas_sharded(mesh: Mesh, state, hi, lo, subs, wblk):
    """Pallas decoder under shard_map: each device decodes its local chain
    shard (N must be a multiple of subs * 128 * mesh.size).  Like the
    encoder, the workload needs no cross-device communication."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    import functools

    from ..ops.pallas_decode import decode_chains_pallas

    fn = functools.partial(decode_chains_pallas, subs=subs, wblk=wblk)
    chain = P(None, DATA_AXIS)
    kwargs = dict(
        mesh=mesh,
        in_specs=(chain, chain, chain),
        out_specs=P(None, None, DATA_AXIS),
    )
    try:
        wrapped = shard_map(fn, check_vma=False, **kwargs)
    except TypeError:  # older jax spells the replication check differently
        wrapped = shard_map(fn, check_rep=False, **kwargs)
    state, hi, lo = shard_chain_arrays(mesh, state, hi, lo)
    return wrapped(state, hi, lo)


def encode_frames_pallas_sharded(mesh: Mesh, state, samples, lens):
    """Pallas encoder under shard_map: each device runs the Mosaic kernel
    on its local chain shard (N must be a multiple of 128 * mesh.size).

    The workload needs no cross-device communication — shard_map simply
    pins the per-device kernel launches (SPMD over ICI); collectives would
    only appear in surrounding reductions (e.g. corpus stats).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..ops.pallas_encode import encode_frames_pallas

    chain = P(None, DATA_AXIS)
    x_spec = P(None, None, None, DATA_AXIS)
    l_spec = P(None, None, DATA_AXIS)
    kwargs = dict(
        mesh=mesh,
        in_specs=(chain, x_spec, l_spec),
        out_specs=(chain, P(None, None, DATA_AXIS), l_spec, l_spec),
    )
    try:
        fn = shard_map(encode_frames_pallas, check_vma=False, **kwargs)
    except TypeError:  # older jax spells the replication check differently
        fn = shard_map(encode_frames_pallas, check_rep=False, **kwargs)
    state, samples, lens = shard_chain_arrays(mesh, state, samples, lens)
    return fn(state, samples, lens)
