"""Batched multi-file corpus transcode (the new top layer, SURVEY.md §1).

Packs the channels of many files into one chain axis so a whole corpus
encodes in a handful of kernel launches: files are padded to a common
frame count with zero-length slices (which pass LMS state through
unchanged), PCM stays device-resident across the chunked scan, and the
chain axis optionally shards over a device mesh.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional, Sequence

import numpy as np

from .. import bitstream as bs
from .. import codec
from .. import format as fmt
from ..types import DecodedQoa, QoaDesc


@dataclasses.dataclass
class CorpusFile:
    path: str
    desc: QoaDesc
    pcm: np.ndarray  # interleaved int16


@dataclasses.dataclass
class TranscodeReport:
    files: List[str]
    total_samples: int
    encode_seconds: float
    decode_seconds: float
    results: List[dict]
    ok: bool = True

    def lines(self) -> List[str]:
        out = []
        for r in self.results:
            out.append(
                f"{r['path']}: {r['samples']} samples, "
                f"compression {r['ratio']:.2f}x, rms {r['rms']:.1f}"
                + (", bit-exact re-decode" if r["exact"] else "")
            )
        msps_enc = self.total_samples / self.encode_seconds / 1e6
        msps_dec = self.total_samples / self.decode_seconds / 1e6
        out.append(
            f"corpus: {len(self.files)} files, {self.total_samples} samples; "
            f"decode {msps_dec:.1f} Msamples/s, encode {msps_enc:.1f} Msamples/s"
        )
        return out


def _jax_platform():
    """The active jax platform, or None when no backend can initialize
    (e.g. a clobbered environment) — callers degrade to the host engine."""
    try:
        import jax

        return jax.devices()[0].platform
    except Exception:
        return None


def _pick_kernel(mesh):
    """Choose the device kernel: Pallas on TPU (lanes padded to 128),
    the XLA kernel elsewhere; sharded variants when a mesh is given."""
    on_tpu = _jax_platform() == "tpu"
    if mesh is not None:
        if on_tpu:
            from .mesh import encode_frames_pallas_sharded

            return (
                lambda st, cx, cl: encode_frames_pallas_sharded(mesh, st, cx, cl),
                128 * mesh.size,
            )
        from .mesh import encode_frames_sharded

        return (
            lambda st, cx, cl: encode_frames_sharded(mesh, st, cx, cl),
            mesh.size,
        )
    if on_tpu:
        from ..ops.pallas_encode import encode_frames_pallas

        return encode_frames_pallas, 128
    from ..ops.encode import encode_frames

    return encode_frames, 1


def batch_encode(
    files: Sequence[tuple[np.ndarray, QoaDesc]],
    mesh=None,
    chunk_frames: int = 64,
) -> List[bytes]:
    """Encode many PCM streams in one batched chain axis.

    Returns QOA bytes per file, each bit-exact with single-file encoding
    (chains are independent lanes; padding slices are inert).  On TPU the
    Pallas kernel runs the hot loop (chains padded to its 128-lane tiles).
    """
    from ..codec import initial_encoder_state

    if not files:
        return []
    for pcm, desc in files:
        codec._validate_desc(desc)
        if np.asarray(pcm).size != desc.samples * desc.channels:
            from ..errors import InvalidSamples

            raise InvalidSamples()

    if mesh is None and _jax_platform() is None:
        # no usable jax backend (e.g. a clobbered environment): the host
        # engine still delivers the same bit-exact streams — with mono
        # files paired into the C==2 chain (codec._encode_two_mono_native)
        return codec.encode_all_batch(files)

    layouts = [codec.layout_pcm(pcm, d.channels, d.samples) for pcm, d in files]
    F_max = max(F for _, _, F in layouts)
    chunk = min(chunk_frames, codec._next_pow2(F_max))
    F_pad = -(-F_max // chunk) * chunk

    # Scan only the windows the corpus actually has: any multi-frame file
    # forces full 256-window frames, but a corpus of sub-frame clips scans
    # just ceil(max samples / 20) windows (trailing zero-length windows
    # pass LMS state through unchanged, so dropping them is bit-identical).
    W_use = max(
        fmt.QOA_SLICES_PER_FRAME
        if F > 1
        else -(-d.samples // fmt.QOA_SLICE_LEN)
        for (_, d), (_, _, F) in zip(files, layouts)
    )

    # chain offsets per file
    offsets = []
    n = 0
    for _, d in files:
        offsets.append(n)
        n += d.channels
    N = n

    kernel, n_multiple = _pick_kernel(mesh)
    N = -(-N // n_multiple) * n_multiple  # pad chains for kernel/mesh tiles

    # The leading min_i floor(samples_i / 5120) frames are FULL (20 valid
    # samples in every window of every chain): the specialized no-mask
    # Pallas kernel runs that region ~6% faster.
    full_kernel = None
    f_full_min = 0
    if mesh is None and _jax_platform() == "tpu":
        from ..ops.pallas_encode import encode_frames_pallas_full

        full_kernel = encode_frames_pallas_full
        f_full_min = min(d.samples // fmt.QOA_FRAME_LEN for _, d in files)

    state = initial_encoder_state(0, N)  # same init weights for every chain

    # Chunked scan; the carried state stays on device between chunks.
    # Memory model: the chain-wide staging array is assembled PER CHUNK
    # (never the whole corpus — peak host staging is chunk x 256 x 20 x N
    # int16), and completed chunks drain through a 2-deep staging window,
    # so chunk k-2's results transfer while chunk k computes (async
    # dispatch) and peak device memory for outputs is 3 chunks, not the
    # corpus.  The per-file layouts (~2x the input PCM) are the only
    # corpus-sized host allocation.
    from collections import deque

    words_parts = []
    snaps_parts = []
    staged = deque()

    def _drain_one():
        snaps_d, hi_d, lo_d = staged.popleft()
        snaps_parts.append(np.asarray(snaps_d))
        words_parts.append(
            (np.asarray(hi_d).astype(np.uint64) << np.uint64(32))
            | np.asarray(lo_d).astype(np.uint64)
        )

    for f0 in range(0, F_pad, chunk):
        cx = np.zeros((chunk, W_use, fmt.QOA_SLICE_LEN, N), np.int16)
        cl = np.zeros((chunk, W_use, N), np.int32)
        for (pcm, d), (xf, lf, F), off in zip(files, layouts, offsets):
            k = min(F - f0, chunk)
            if k > 0:
                cx[:k, :, :, off : off + d.channels] = xf[f0 : f0 + k, :W_use]
                cl[:k, :, off : off + d.channels] = lf[
                    f0 : f0 + k, :W_use, None
                ]
        # chunked-parallel H2D of the staging cube (the dominant upload on
        # the remote-tunnel TPU; utils/transfer module note).  Mesh paths
        # manage their own sharded placement.
        if full_kernel is not None and f0 + chunk <= f_full_min:
            if mesh is None:
                from ..utils.transfer import put_arrays

                (cx,) = put_arrays([cx])
            state, snaps, hi, lo = full_kernel(state, cx)
        else:
            if mesh is None:
                from ..utils.transfer import put_arrays

                cx, cl = put_arrays([cx, cl])
            state, snaps, hi, lo = kernel(state, cx, cl)
        staged.append((snaps, hi, lo))
        while len(staged) > 2:
            _drain_one()
    while staged:
        _drain_one()
    snaps = np.concatenate(snaps_parts)  # (F_pad, 8, N)
    words = np.concatenate(words_parts)  # (F_pad, 256, N)

    out: List[bytes] = []
    for (pcm, d), (xf, lf, F), off in zip(files, layouts, offsets):
        C = d.channels
        out.append(
            bs.assemble_stream_bytes(
                C,
                d.sample_rate,
                d.samples,
                np.ascontiguousarray(snaps[:, :, off : off + C]),
                np.ascontiguousarray(words[:, :, off : off + C]),
            )
        )
    return out


def _logical_words(words_be: np.ndarray) -> np.ndarray:
    """Raw big-endian u64 words -> logical values (byteswap allocates)."""
    return words_be.view(np.uint64).byteswap()


def _stage_word_halves(parsed, offs, Wp: int, Np: int):
    """Stage per-file slice words/state into dense (hi, lo, state) arrays
    for the Pallas decoder (shared by batch_decode and batch_transcode)."""
    hi = np.zeros((Wp, Np), np.uint32)
    lo = np.zeros((Wp, Np), np.uint32)
    state = np.zeros((8, Np), np.int32)
    for p, off in zip(parsed, offs):
        logical = _logical_words(p.words_be)
        k = p.n_frames * p.channels
        hi[: p.max_windows, off : off + k] = (logical >> np.uint64(32)).astype(
            np.uint32
        )
        lo[: p.max_windows, off : off + k] = (
            logical & np.uint64(0xFFFFFFFF)
        ).astype(np.uint32)
        state[:, off : off + k] = p.state
    return hi, lo, state


def _stage_words_be(parsed, offs, W: int, Np: int):
    """Stage per-file raw BE words/state into dense (words_be, state)."""
    words_be = np.zeros((W, Np), np.uint64)
    state = np.zeros((8, Np), np.int32)
    for p, off in zip(parsed, offs):
        k = p.n_frames * p.channels
        words_be[: p.max_windows, off : off + k] = p.words_be
        state[:, off : off + k] = p.state
    return words_be, state


def _code_planes(words_be: np.ndarray):
    """Raw BE words -> (sf, codes) int8 planes for the XLA decoder.

    int8 suffices (sf < 16, codes < 8; the kernel widens per window) and
    keeps the staging cube 4x smaller than the decoded PCM."""
    logical = _logical_words(words_be)
    W, Np = words_be.shape
    sf = (logical >> np.uint64(60)).astype(np.int8)
    codes = np.zeros((W, fmt.QOA_SLICE_LEN, Np), np.int8)
    for k in range(fmt.QOA_SLICE_LEN):
        codes[:, k] = ((logical >> np.uint64(57 - 3 * k)) & np.uint64(7)).astype(
            np.int8
        )
    return sf, codes


def _interleave_file(dec_sub, p) -> np.ndarray:
    """One file's chain-layout decode -> flat interleaved trimmed PCM.

    Uses the native fused interleave+trim when every non-final frame is
    window-aligned (its single trailing trim is only valid then); any
    non-aligned uniform geometry trims per frame instead — the same
    guard decode_all's host path applies (codec.py)."""
    from .. import native

    F, C = p.n_frames, p.channels
    W20 = p.max_windows * fmt.QOA_SLICE_LEN
    spf = p.samples_per_frame
    total = int(spf.sum())
    if native.available():
        if bool(np.all(spf[:-1] == W20)):
            return native.interleave_trim(dec_sub, F, C, total).reshape(-1)
        arr = native.interleave_trim(dec_sub, F, C, F * W20).reshape(F, W20, C)
    else:
        arr = (
            dec_sub.reshape(p.max_windows, fmt.QOA_SLICE_LEN, F, C)
            .transpose(2, 0, 1, 3)
            .reshape(F, W20, C)
        )
    return np.concatenate([arr[i, : spf[i]] for i in range(F)]).reshape(-1)


def batch_decode(streams: Sequence[bytes], mesh=None) -> List[DecodedQoa]:
    """Decode many QOA byte streams in ONE batched kernel launch.

    Decode has no cross-frame state (every frame header carries its LMS
    seed, reference src/lib.rs:271-281), so the chains of ALL files —
    frames x channels each — concatenate into one chain axis: the Pallas
    kernel on TPU, the native engine elsewhere; with ``mesh`` the chain
    axis shards over the devices (shard_map around the Pallas kernel on
    TPU — no cross-device communication).  Streams the fast arithmetic
    parser rejects fall back to per-file decoding; the REST of the corpus
    still batches.
    """
    from .. import native
    from ..bitstream import parse_file_arrays

    if not streams:
        return []
    parsed = [parse_file_arrays(d) for d in streams]
    if any(p is None for p in parsed):
        # decode the rejected streams per-file; everything else batches
        good = [(i, d) for i, (d, p) in enumerate(zip(streams, parsed)) if p]
        outs: List[Optional[DecodedQoa]] = [None] * len(streams)
        for i, (d, p) in enumerate(zip(streams, parsed)):
            if p is None:
                outs[i] = codec.decode_all(d)
        for (i, _), out in zip(
            good, batch_decode([d for _, d in good], mesh=mesh)
        ):
            outs[i] = out
        return outs

    W = max(p.max_windows for p in parsed)
    offs = []
    n = 0
    for p in parsed:
        offs.append(n)
        n += p.n_frames * p.channels
    N = n

    on_tpu = _jax_platform() == "tpu"
    if on_tpu:
        from ..ops.pallas_decode import LANES, decode_chains_pallas, pick_tile

        n_dev = mesh.size if mesh is not None else 1
        subs, wblk = pick_tile(-(-N // n_dev))
        tile = subs * LANES * n_dev
        Np = -(-N // tile) * tile
        Wp = -(-W // wblk) * wblk
        hi, lo, state = _stage_word_halves(parsed, offs, Wp, Np)
        from ..utils.transfer import fetch_array, put_arrays

        if mesh is not None:
            from .mesh import decode_chains_pallas_sharded

            dec = fetch_array(
                decode_chains_pallas_sharded(mesh, state, hi, lo, subs, wblk)
            )
        else:
            state_d, hi_d, lo_d = put_arrays([state, hi, lo])
            dec = fetch_array(
                decode_chains_pallas(state_d, hi_d, lo_d, subs=subs, wblk=wblk)
            )
    elif mesh is not None:
        # sharded XLA kernel (CPU/GPU meshes): code planes over chains
        from .mesh import decode_chains_sharded, round_up

        Np = round_up(N, mesh.size)
        words_be, state = _stage_words_be(parsed, offs, W, Np)
        sf, codes = _code_planes(words_be)
        dec = np.asarray(decode_chains_sharded(mesh, state, sf, codes))
    else:
        words_be, state = _stage_words_be(parsed, offs, W, N)
        if native.available():
            dec = native.decode_chains(words_be, state)
        else:
            from ..ops.decode import decode_chains

            sf, codes = _code_planes(words_be)
            dec = np.asarray(decode_chains(state.astype(np.int32), sf, codes))

    outs = []
    for p, off in zip(parsed, offs):
        k = p.n_frames * p.channels
        sub = np.ascontiguousarray(dec[: p.max_windows, :, off : off + k])
        outs.append(
            DecodedQoa(
                num_channels=p.channels,
                sample_rate=p.sample_rate,
                samples=_interleave_file(sub, p).astype(np.int16, copy=False),
            )
        )
    return outs


def _transcode_lens(samples_i32, F_pad: int, W_enc: int):
    """lens[f, w, j] = clip(min(samples_j - f*5120, 5120) - w*20, 0, 20)."""
    import jax.numpy as jnp

    f_i = jnp.arange(F_pad, dtype=jnp.int32)[:, None, None]
    w_i = jnp.arange(W_enc, dtype=jnp.int32)[None, :, None]
    spc = jnp.clip(
        samples_i32[None, None, :] - f_i * fmt.QOA_FRAME_LEN,
        0,
        fmt.QOA_FRAME_LEN,
    )
    return jnp.clip(spc - w_i * fmt.QOA_SLICE_LEN, 0, fmt.QOA_SLICE_LEN)


# Length-bucketing cost model (batch_transcode): one extra fused dispatch
# costs about this many padded lane-frames of encode work (~15 ms chip
# time at the measured ~1.8 us/lane-frame — one tunnel dispatch RTT), and
# a partition must beat the single launch by at least 1/MIN_GAIN before
# the extra dispatches are worth it.
_BUCKET_OVERHEAD = 8192.0
_BUCKET_MIN_GAIN = 0.75


def _length_buckets(frame_counts, chans, e_mult, chunk_frames):
    """Partition files into frame-count buckets minimizing padded encode
    work.

    The encode kernel's cost is F_pad x Nep padded lane-frames per launch
    (every lane runs every frame step: chains are indivisible, the grid
    cannot early-exit per lane — CLAUDE.md 2026-08-17), so a mixed-length
    corpus with more than one 128-lane tile of chains wastes whole tiles
    on the short files' padding.  Exact DP over the length-sorted order:
    cost(bucket) = F_pad * ceil(Ne/e_mult)*e_mult + _BUCKET_OVERHEAD, the
    optimal partition is contiguous in sorted order.  Returns a list of
    index lists (original input order within each bucket), or ``None``
    when one launch is within ``_BUCKET_MIN_GAIN`` of the optimum (the
    <=1-tile case always lands here, matching the structural analysis).
    """
    n = len(frame_counts)
    if n < 2:
        return None
    order = sorted(range(n), key=lambda i: (frame_counts[i], i))
    f_sorted = [frame_counts[i] for i in order]

    def fpad(fmax):
        chunk = min(chunk_frames, codec._next_pow2(int(fmax)))
        return -(-int(fmax) // chunk) * chunk

    fpads = np.asarray([fpad(f) for f in f_sorted], np.float64)
    csum = np.zeros(n + 1, np.float64)
    csum[1:] = np.cumsum([chans[i] for i in order])
    best = np.full(n + 1, np.inf)
    best[0] = 0.0
    cut = np.zeros(n + 1, np.int32)
    for i in range(1, n + 1):
        nep = np.ceil((csum[i] - csum[:i]) / e_mult) * e_mult
        cost = best[:i] + fpads[i - 1] * nep + _BUCKET_OVERHEAD
        j = int(np.argmin(cost))
        best[i], cut[i] = cost[j], j
    single = fpads[-1] * np.ceil(csum[n] / e_mult) * e_mult + _BUCKET_OVERHEAD
    if not best[n] < _BUCKET_MIN_GAIN * single:
        return None
    segs, i = [], n
    while i > 0:
        j = int(cut[i])
        segs.append(sorted(order[j:i]))
        i = j
    segs.reverse()
    return segs


class _CompositeFusedHandle:
    """Fused handles of every length bucket of one ``batch_transcode``
    call.  Calling it re-dispatches each bucket's pipeline in order and
    returns the LAST bucket's outputs — single-device launches execute
    in submission order, so syncing the returned arrays covers every
    bucket (the same ordering the chained-launch bench timing relies
    on)."""

    __slots__ = ("handles",)

    def __init__(self, handles):
        self.handles = handles

    def __call__(self):
        r = None
        for h in self.handles:
            r = h()
        return r


_TRANSCODE_FUSED_CACHE: dict = {}


class TranscodeFusedHandle:
    """Explicit handle onto a ``batch_transcode`` call's staged device
    pipeline, returned by ``batch_transcode(..., return_fused_handle=True)``.

    Holds the jitted fused pipeline (decode -> relayout -> lens -> encode ->
    tight packing) and its DEVICE-RESIDENT arguments, which pins the staged
    corpus in device memory for the handle's lifetime — drop the handle to
    free it.  Calling the handle re-dispatches the whole pipeline in one
    launch with no host staging; ``bench.py`` uses this to time the pure
    chip-side rate of the deployment pipeline (the e2e number minus tunnel
    transfers)."""

    __slots__ = ("fn", "args")

    def __init__(self, fn, args):
        self.fn = fn
        self.args = args

    def __call__(self):
        return self.fn(*self.args)


def _relayout_encode_input(decT, metas, W_enc: int, F_pad: int, Ne: int,
                           Nep: int):
    """Decode-chain layout -> encoder frame layout, (F_pad, W_enc, 20, Nep).

    decT: (Nd, W_enc, 20) transposed decode output.  ONE take along the
    chain (major) axis with a precomputed (F_pad*Nep,) row index, then a
    single majors-only transpose.  Invalid slots (f >= F_i, or pad lanes
    past Ne) point at row 0 — their ``lens`` are 0, so the encode kernel
    passes state through and their words/snaps are sliced away by the
    per-file packing; the values never matter.

    The previous per-file reshape/transpose/concat form built 32 blocks
    whose minor dim was C in {1, 2} — a ~64x tile bloat per block on TPU
    plus a 32-way concat along the minor axis — and measured ~40-43 ms
    on the bench corpus where this form measures ~0-2 ms
    (experiments/tpu_transcode_profile.py).  Shared by the fused jit
    pipeline and the mesh branch (eager on the global array) so the two
    cannot diverge.
    """
    import jax.numpy as jnp

    idx = np.zeros((F_pad, Nep), np.int32)
    for F_i, C, doff, eoff in metas:
        for c in range(C):
            idx[:F_i, eoff + c] = doff + np.arange(F_i) * C + c
    x = jnp.take(decT, jnp.asarray(idx.reshape(-1)), axis=0)
    x = x.reshape(F_pad, Nep, W_enc, fmt.QOA_SLICE_LEN)
    return jnp.transpose(x, (0, 2, 3, 1))


def _transcode_fused_fn(metas, W_enc: int, F_pad: int, Ne: int, Nep: int,
                        platform: str, dec_cfg=None):
    """Build (and cache per corpus signature) ONE jitted device function
    for the whole pipeline: decode (folded in on TPU) -> chain relayout ->
    lens -> full encode -> tight per-file packing of the outputs.

    Two structural costs dominated the first measurement on the
    remote-tunnel device ("axon": D2H sustains only ~20-40 MB/s and every
    dispatch pays real latency):
    * eager per-file relayout + chunked kernel calls = ~140 dispatches ->
      everything now traces into one executable (one dispatch);
    * fetching the dense (F_pad, W_enc, Nep) word cube moved ~1.7x the
      real compressed payload -> the kernel now concatenates each file's
      (F_i, W_enc, C_i) region into flat u32 buffers on device, so the
      fetch is exactly the compressed words + LMS snapshots.

    The per-file relayout is dense reshape/transpose (XLA copies; a single
    2-D gather over the chain axis compiles to a pathologically slow
    scatter on TPU), concatenated once along the encode-chain axis.
    """
    import jax
    import jax.numpy as jnp

    key = (metas, W_enc, F_pad, Ne, Nep, platform, dec_cfg)
    fn = _TRANSCODE_FUSED_CACHE.get(key)
    if fn is not None:
        return fn
    if platform == "tpu":
        from ..ops.pallas_decode import decode_chains_pallas
        from ..ops.pallas_encode import encode_frames_pallas as enc_kernel
    else:
        from ..ops.encode import encode_frames as enc_kernel

    def _pipeline(dec, samples_i32, state):
        decT = jnp.transpose(dec[:W_enc], (2, 0, 1))  # (Nd, W_enc, 20)
        x_enc = _relayout_encode_input(decT, metas, W_enc, F_pad, Ne, Nep)
        lens = _transcode_lens(samples_i32, F_pad, W_enc)
        _, snaps, whi, wlo = enc_kernel(state, x_enc, lens)
        # tight per-file packing: only real compressed data crosses D2H
        hp, lp, sp = [], [], []
        for F_i, C, _doff, eoff in metas:
            hp.append(whi[:F_i, :, eoff : eoff + C].reshape(-1))
            lp.append(wlo[:F_i, :, eoff : eoff + C].reshape(-1))
            sp.append(
                snaps[:F_i, :, eoff : eoff + C].astype(jnp.int32).reshape(-1)
            )
        return (
            jnp.concatenate(sp),
            jnp.concatenate(hp),
            jnp.concatenate(lp),
        )

    if platform == "tpu":
        subs, wblk = dec_cfg

        @jax.jit
        def fused(dstate, hi, lo, samples_i32, state):
            dec = decode_chains_pallas(dstate, hi, lo, subs=subs, wblk=wblk)
            return _pipeline(dec, samples_i32, state)
    else:
        fused = jax.jit(_pipeline)

    if len(_TRANSCODE_FUSED_CACHE) >= 32:  # bound compile-cache growth
        _TRANSCODE_FUSED_CACHE.pop(next(iter(_TRANSCODE_FUSED_CACHE)))
    _TRANSCODE_FUSED_CACHE[key] = fused
    return fused


def batch_transcode(
    streams: Sequence[bytes],
    chunk_frames: int = 64,
    mesh=None,
    *,
    return_fused_handle: bool = False,
    bucket="auto",
):
    """Transcode many QOA streams with PCM **HBM-resident end to end**
    (the BASELINE.json north-star deployment shape): the decode kernel's
    output re-lays out ON DEVICE into the encoder's frame layout and feeds
    the encode kernel directly — only the compressed slice words and LMS
    snapshots ever return to the host.

    The device re-layout is pure indexing: with standard 5120-sample input
    frames, decoded sample (frame f, window w, offset k) of a file IS
    encoder sample (f, w, k), so one gather over the chain axis maps
    decode chains (file x frame x channel) onto encode chains
    (file x channel) and ``lens`` derives from per-file sample counts with
    broadcast arithmetic.  Single-frame files of any length satisfy this
    trivially; multi-frame streams with non-standard uniform frame sizes
    (or streams the arithmetic parser rejects) fall back to the host
    decode -> encode pair, which produces identical bytes.

    With ``mesh`` both the decode chain axis and the encode chain axis
    shard independently over the devices (no hot-loop collectives — the
    chains are embarrassingly parallel; only the relayout reshards).

    With ``return_fused_handle=True`` the return value is
    ``(outs, handle)`` where ``handle`` is a :class:`TranscodeFusedHandle`
    onto the staged single-dispatch device pipeline, or ``None`` when no
    fused pipeline ran (empty corpus, no jax backend, or the ``mesh``
    path).  When part of the corpus falls back to the host pair, the
    handle covers the device-eligible subset.

    ``bucket="auto"`` (default) splits a mixed-length corpus with more
    than one lane tile of encode chains into frame-count buckets, each
    its own fused dispatch, whenever that reduces padded encode work by
    >= 1/0.75 (every lane runs every padded frame step, so short files
    in a long corpus waste whole tiles; see :func:`_length_buckets`).
    Bucketing never changes bytes — chains are independent lanes.
    ``bucket=False`` forces the single launch.
    """
    import jax
    import jax.numpy as jnp

    from ..bitstream import parse_file_arrays

    def _ret(outs, handle=None):
        return (outs, handle) if return_fused_handle else outs

    if not streams:
        return _ret([])

    def _host_pair(d: bytes) -> bytes:
        out = codec.decode_all(d)
        return codec.encode_all(
            out.samples,
            QoaDesc(out.num_channels, out.sample_rate, out.samples_per_channel),
        )

    if _jax_platform() is None:
        # batch the encode side so mono files pair into the C==2 chain
        # (codec._encode_two_mono_native) instead of paying per-file mono16
        decoded = [codec.decode_all(d) for d in streams]
        return _ret(
            codec.encode_all_batch(
                [
                    (
                        o.samples,
                        QoaDesc(
                            o.num_channels, o.sample_rate,
                            o.samples_per_channel,
                        ),
                    )
                    for o in decoded
                ]
            )
        )
    parsed = [parse_file_arrays(d) for d in streams]

    def _eligible(p) -> bool:
        return p is not None and (
            p.n_frames == 1
            or int(p.samples_per_frame[0]) == fmt.QOA_FRAME_LEN
        )

    if not all(_eligible(p) for p in parsed):
        # only the rejected streams pay the host decode->encode pair; the
        # rest of the corpus still runs the device pipeline
        good = [
            (i, d) for i, (d, p) in enumerate(zip(streams, parsed)) if _eligible(p)
        ]
        outs: List[Optional[bytes]] = [None] * len(streams)
        for i, (d, p) in enumerate(zip(streams, parsed)):
            if not _eligible(p):
                outs[i] = _host_pair(d)
        sub_handle = None
        if good:
            sub_outs, sub_handle = batch_transcode(
                [d for _, d in good],
                chunk_frames=chunk_frames,
                mesh=mesh,
                return_fused_handle=True,
                bucket=bucket,
            )
            for (i, _), data in zip(good, sub_outs):
                outs[i] = data
        return _ret(outs, sub_handle)

    on_tpu = _jax_platform() == "tpu"

    # ---- length bucketing: mixed lengths over >1 tile of chains ----
    if bucket:
        _, e_mult_b = _pick_kernel(mesh)
        segs = _length_buckets(
            [p.n_frames for p in parsed],
            [p.channels for p in parsed],
            max(1, e_mult_b),
            chunk_frames,
        )
        if segs is not None:
            outs = [None] * len(streams)
            handles = []
            for seg in segs:
                sub, h = batch_transcode(
                    [streams[i] for i in seg],
                    chunk_frames=chunk_frames,
                    mesh=mesh,
                    return_fused_handle=True,
                    bucket=False,
                )
                if h is not None:
                    handles.append(h)
                for i, b in zip(seg, sub):
                    outs[i] = b
            return _ret(
                outs, _CompositeFusedHandle(handles) if handles else None
            )

    # ---- decode: all files' chains in one launch ----
    W = max(p.max_windows for p in parsed)
    doffs = []
    n = 0
    for p in parsed:
        doffs.append(n)
        n += p.n_frames * p.channels
    Nd = n

    n_dev = mesh.size if mesh is not None else 1
    if on_tpu:
        from ..ops.pallas_decode import LANES as DL, decode_chains_pallas, pick_tile

        subs, wblk = pick_tile(-(-Nd // n_dev))
        tile = subs * DL * n_dev
        Ndp = -(-Nd // tile) * tile
        Wp = -(-W // wblk) * wblk
        hi, lo, dstate = _stage_word_halves(parsed, doffs, Wp, Ndp)
        if mesh is not None:
            from .mesh import decode_chains_pallas_sharded

            dec = decode_chains_pallas_sharded(mesh, dstate, hi, lo, subs, wblk)
        else:
            dec = None  # folded into the fused pipeline dispatch below
    else:
        from ..ops.decode import decode_chains

        Ndp = -(-Nd // n_dev) * n_dev
        words_be, dstate = _stage_words_be(parsed, doffs, W, Ndp)
        sf, codes = _code_planes(words_be)
        if mesh is not None:
            from .mesh import decode_chains_sharded

            dec = decode_chains_sharded(mesh, dstate, sf, codes)
        else:
            dec = decode_chains(
                jax.device_put(dstate.astype(np.int32)),
                jax.device_put(sf),
                jax.device_put(codes),
            )  # (W, 20, Ndp)

    # ---- on-device re-layout + encode ----
    from ..codec import initial_encoder_state

    eoffs = []
    n = 0
    for p in parsed:
        eoffs.append(n)
        n += p.channels
    Ne = n
    kernel, e_mult = _pick_kernel(mesh)
    Nep = -(-Ne // e_mult) * e_mult

    F_max = max(p.n_frames for p in parsed)
    chunk = min(chunk_frames, codec._next_pow2(F_max))
    F_pad = -(-F_max // chunk) * chunk
    W_enc = max(
        fmt.QOA_SLICES_PER_FRAME if p.n_frames > 1 else p.max_windows
        for p in parsed
    )

    samples = np.zeros(Nep, np.int64)  # samples/channel per enc chain
    for p, eoff in zip(parsed, eoffs):
        samples[eoff : eoff + p.channels] = int(p.samples_per_frame.sum())

    metas = tuple(
        (p.n_frames, p.channels, doff, eoff)
        for p, doff, eoff in zip(parsed, doffs, eoffs)
    )
    state = initial_encoder_state(0, Nep)
    handle = None
    if mesh is None:
        # the WHOLE device pipeline (decode on TPU, relayout, lens, encode,
        # tight packing) in ONE jitted dispatch, cached per corpus
        # signature; the three flat output buffers fetch concurrently
        if on_tpu:
            fn = _transcode_fused_fn(
                metas, W_enc, F_pad, Ne, Nep, "tpu", dec_cfg=(subs, wblk)
            )
            # chunked-parallel H2D: the staged word halves are the bulk of
            # the e2e upload (~2x the compressed payload); see
            # utils/transfer module note
            from ..utils.transfer import put_arrays

            dstate_d, hi_d, lo_d, state_d = put_arrays(
                [dstate, hi, lo, state]
            )
            args = (
                dstate_d,
                hi_d,
                lo_d,
                jnp.asarray(samples, jnp.int32),
                state_d,
            )
            if return_fused_handle:
                handle = TranscodeFusedHandle(fn, args)
            sp_d, hp_d, lp_d = fn(*args)
        else:
            fn = _transcode_fused_fn(
                metas, W_enc, F_pad, Ne, Nep, _jax_platform()
            )
            args = (
                dec, jnp.asarray(samples, jnp.int32), jax.device_put(state)
            )
            if return_fused_handle:
                handle = TranscodeFusedHandle(fn, args)
            sp_d, hp_d, lp_d = fn(*args)
        from ..utils.transfer import fetch_arrays

        sp, hp, lp = fetch_arrays([sp_d, hp_d, lp_d])

        out: List[bytes] = []
        o_w = o_s = 0
        for (F_i, C, _doff, _eoff), p in zip(metas, parsed):
            nw = F_i * W_enc * C
            words_f = (
                hp[o_w : o_w + nw].astype(np.uint64) << np.uint64(32)
            ) | lp[o_w : o_w + nw].astype(np.uint64)
            snaps_f = sp[o_s : o_s + F_i * 8 * C].reshape(F_i, 8, C)
            o_w += nw
            o_s += F_i * 8 * C
            out.append(
                bs.assemble_stream_bytes(
                    C,
                    p.sample_rate,
                    int(p.samples_per_frame.sum()),
                    snaps_f,
                    words_f.reshape(F_i, W_enc, C),
                )
            )
        return _ret(out, handle)
    else:
        # mesh path: explicit shard_map kernels (not fusable under one jit);
        # relayout runs eagerly and XLA reshards between stages
        decT = jnp.transpose(dec[:W_enc], (2, 0, 1))  # (Nd, W_enc, 20)
        x_enc = _relayout_encode_input(decT, metas, W_enc, F_pad, Ne, Nep)
        lens = _transcode_lens(jnp.asarray(samples, jnp.int32), F_pad, W_enc)
        state_d = jax.device_put(state)
        words_parts, snaps_parts = [], []
        for f0 in range(0, F_pad, chunk):
            state_d, snaps, whi, wlo = kernel(
                state_d, x_enc[f0 : f0 + chunk], lens[f0 : f0 + chunk]
            )
            words_parts.append((whi[:, :, :Ne], wlo[:, :, :Ne]))
            snaps_parts.append(snaps[:, :, :Ne])
        words = np.concatenate(
            [
                (np.asarray(h).astype(np.uint64) << np.uint64(32))
                | np.asarray(l).astype(np.uint64)
                for h, l in words_parts
            ]
        )  # (F_pad, W_enc, Ne)
        snaps = np.concatenate([np.asarray(s) for s in snaps_parts])

    # ---- host byte assembly (compressed-domain only, vectorized) ----
    out: List[bytes] = []
    for p, eoff in zip(parsed, eoffs):
        C = p.channels
        out.append(
            bs.assemble_stream_bytes(
                C,
                p.sample_rate,
                int(p.samples_per_frame.sum()),
                np.ascontiguousarray(snaps[:, :, eoff : eoff + C]),
                np.ascontiguousarray(words[:, :, eoff : eoff + C]),
            )
        )
    return _ret(out)


def transcode_corpus(
    paths: Sequence[str],
    out_dir: Optional[str] = None,
    verify: bool = True,
    mesh=None,
) -> TranscodeReport:
    """Decode a set of QOA files, re-encode them batched, verify, report."""
    datas = []
    for p in paths:
        with open(p, "rb") as f:
            datas.append(f.read())
    t0 = time.perf_counter()
    outs = batch_decode(datas, mesh=mesh)
    decoded = [
        CorpusFile(
            path=p,
            desc=QoaDesc(d.num_channels, d.sample_rate, d.samples_per_channel),
            pcm=d.samples,
        )
        for p, d in zip(paths, outs)
    ]
    decode_seconds = time.perf_counter() - t0

    t0 = time.perf_counter()
    encoded = batch_encode([(c.pcm, c.desc) for c in decoded], mesh=mesh)
    encode_seconds = time.perf_counter() - t0

    results = []
    ok = True
    total = 0
    for c, data in zip(decoded, encoded):
        total += len(c.pcm)
        r = {
            "path": c.path,
            "samples": len(c.pcm),
            "ratio": (len(c.pcm) * 2) / len(data),
            "rms": 0.0,
            "exact": False,
        }
        if verify:
            again = codec.decode_all(data)
            err = again.samples.astype(np.float64) - c.pcm.astype(np.float64)
            r["rms"] = float(np.sqrt((err**2).mean()))
            r["exact"] = bool(np.array_equal(again.samples, c.pcm))
            if r["rms"] >= 500:
                ok = False
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.splitext(os.path.basename(c.path))[0] + ".qoa"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(data)
        results.append(r)

    return TranscodeReport(
        files=list(paths),
        total_samples=total,
        encode_seconds=encode_seconds,
        decode_seconds=decode_seconds,
        results=results,
        ok=ok,
    )
