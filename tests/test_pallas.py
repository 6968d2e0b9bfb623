"""Pallas TPU encoder kernel tests.

The test suite runs on CPU (see conftest), where Mosaic is unavailable —
these tests skip there and run when pointed at a real TPU
(JAX_PLATFORMS unset / tpu).  The kernel's bit-exactness against the XLA
kernel (itself pinned to the scalar oracle) is also exercised by bench.py
on every round's TPU run.
"""

import numpy as np
import pytest

import jax


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")


def test_pallas_matches_xla_kernel():
    from qoaudio_tpu.ops.encode import encode_frames, initial_encoder_state
    from qoaudio_tpu.ops.pallas_encode import encode_frames_pallas

    rng = np.random.default_rng(3)
    F, N = 2, 128
    x = rng.integers(-32768, 32767, (F, 256, 20, N)).astype(np.int16)
    lens = np.full((F, 256, N), 20, np.int32)
    lens[-1, 200:] = 0  # padded windows
    lens[-1, 199] = 7  # short final slice
    state = initial_encoder_state(0, N)

    s1, sn1, hi1, lo1 = encode_frames_pallas(state, x, lens)
    s2, sn2, hi2, lo2 = encode_frames(state, x, lens)
    assert np.array_equal(np.asarray(hi1), np.asarray(hi2))
    assert np.array_equal(np.asarray(lo1), np.asarray(lo2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(sn1), np.asarray(sn2))


def test_pallas_decode_matches_xla_kernel():
    from qoaudio_tpu.ops.decode import decode_chains
    from qoaudio_tpu.ops import pallas_decode as pd

    rng = np.random.default_rng(7)
    N, W = 1024, 256
    hi = rng.integers(0, 2**32, (W, N), dtype=np.uint32)
    lo = rng.integers(0, 2**32, (W, N), dtype=np.uint32)
    state = rng.integers(-20000, 20000, (8, N)).astype(np.int32)
    subs, wblk = pd.pick_tile(N)
    got = np.asarray(pd.decode_chains_pallas(state, hi, lo, subs=subs, wblk=wblk))
    u64 = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    sf = (u64 >> np.uint64(60)).astype(np.int8)
    codes = np.zeros((W, 20, N), np.int8)
    for k in range(20):
        codes[:, k] = ((u64 >> np.uint64(57 - 3 * k)) & np.uint64(7)).astype(np.int8)
    want = np.asarray(decode_chains(state, sf, codes))
    assert np.array_equal(got, want)


def test_pallas_full_window_variant_matches_masked():
    # the no-mask specialization (the batch-transcode hot path) must be
    # bit-identical to the masked kernel when every window is full
    from qoaudio_tpu.codec import initial_encoder_state
    from qoaudio_tpu.ops.pallas_encode import (
        encode_frames_pallas,
        encode_frames_pallas_full,
    )

    rng = np.random.default_rng(11)
    F, N = 2, 128
    x = rng.integers(-32768, 32767, (F, 256, 20, N)).astype(np.int16)
    lens = np.full((F, 256, N), 20, np.int32)
    state = initial_encoder_state(0, N)
    s1, sn1, hi1, lo1 = encode_frames_pallas(state, x, lens)
    s2, sn2, hi2, lo2 = encode_frames_pallas_full(state, x)
    assert np.array_equal(np.asarray(hi1), np.asarray(hi2))
    assert np.array_equal(np.asarray(lo1), np.asarray(lo2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(sn1), np.asarray(sn2))


def test_pallas_sharded_one_device_mesh():
    # the shard_map + Mosaic composition that a real multi-chip pod runs
    # (corpus._pick_kernel selects it whenever a mesh is given on TPU),
    # executed here on a 1-device mesh and checked against the XLA kernel
    from qoaudio_tpu.ops.encode import encode_frames, initial_encoder_state
    from qoaudio_tpu.parallel.mesh import (
        encode_frames_pallas_sharded,
        make_mesh,
    )

    mesh = make_mesh(n_devices=1)
    rng = np.random.default_rng(5)
    F, N = 1, 128
    x = rng.integers(-32768, 32767, (F, 256, 20, N)).astype(np.int16)
    lens = np.full((F, 256, N), 20, np.int32)
    lens[0, 100:] = 0  # padded windows
    lens[0, 99] = 13  # short final slice
    state = initial_encoder_state(0, N)

    s1, sn1, hi1, lo1 = encode_frames_pallas_sharded(mesh, state, x, lens)
    s2, sn2, hi2, lo2 = encode_frames(state, x, lens)
    assert np.array_equal(np.asarray(hi1), np.asarray(hi2))
    assert np.array_equal(np.asarray(lo1), np.asarray(lo2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(sn1), np.asarray(sn2))


def test_corpus_batch_encode_sharded_pallas_on_tpu():
    # end-to-end corpus path on the TPU mesh route: chain padding to
    # 128 x mesh.size, chunked scan through the sharded Mosaic kernel,
    # per-file reassembly — streams must equal the host engine's
    from qoaudio_tpu import codec
    from qoaudio_tpu.parallel.corpus import batch_encode
    from qoaudio_tpu.parallel.mesh import make_mesh
    from qoaudio_tpu.types import QoaDesc

    mesh = make_mesh(n_devices=1)
    rng = np.random.default_rng(6)
    files = []
    for spc, ch in ((5130, 2), (2100, 1), (777, 3)):
        pcm = rng.integers(-28000, 28000, spc * ch).astype(np.int16)
        files.append((pcm, QoaDesc(ch, 44100, spc)))
    streams = batch_encode(files, mesh=mesh)
    for (pcm, d), got in zip(files, streams):
        assert got == codec.encode_all(pcm, d), (d.channels, d.samples)


def test_pallas_wide_block_matches_xla_kernel():
    # N=512 picks the 256-lane production block (two 128-chain groups per
    # plane); must stay bit-exact vs the XLA kernel, and explicit block
    # widths must agree with each other
    from qoaudio_tpu.ops.encode import encode_frames, initial_encoder_state
    from qoaudio_tpu.ops.pallas_encode import (
        _pick_block,
        encode_frames_pallas,
    )

    assert _pick_block(512) == 256
    rng = np.random.default_rng(17)
    F, N = 1, 512
    x = rng.integers(-32768, 32767, (F, 256, 20, N)).astype(np.int16)
    lens = np.full((F, 256, N), 20, np.int32)
    lens[0, 250:] = 0
    lens[0, 249] = 11
    state = initial_encoder_state(0, N)
    s1, sn1, hi1, lo1 = encode_frames_pallas(state, x, lens)  # default 256
    s2, sn2, hi2, lo2 = encode_frames(state, x, lens)
    assert np.array_equal(np.asarray(hi1), np.asarray(hi2))
    assert np.array_equal(np.asarray(lo1), np.asarray(lo2))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(sn1), np.asarray(sn2))
    s3, sn3, hi3, lo3 = encode_frames_pallas(state, x, lens, block_lanes=512)
    assert np.array_equal(np.asarray(hi3), np.asarray(hi2))
    assert np.array_equal(np.asarray(lo3), np.asarray(lo2))


def test_batch_decode_sharded_pallas_on_tpu():
    # corpus decode through shard_map + the Mosaic decode kernel
    from qoaudio_tpu import codec
    from qoaudio_tpu.parallel.corpus import batch_decode
    from qoaudio_tpu.parallel.mesh import make_mesh
    from qoaudio_tpu.types import QoaDesc

    mesh = make_mesh(n_devices=1)
    rng = np.random.default_rng(23)
    files = [(rng.integers(-28000, 28000, 5200 * 2).astype(np.int16),
              QoaDesc(2, 44100, 5200)),
             (rng.integers(-28000, 28000, 777).astype(np.int16),
              QoaDesc(1, 44100, 777))]
    streams = [codec.encode_all(pcm, d) for pcm, d in files]
    outs = batch_decode(streams, mesh=mesh)
    for got, s in zip(outs, streams):
        assert np.array_equal(got.samples, codec.decode_all(s).samples)


def test_batch_transcode_device_resident_on_tpu():
    # the full HBM-resident pipeline on the real chip: Mosaic decode ->
    # on-device relayout -> Mosaic encode; only compressed data crosses
    from qoaudio_tpu import codec
    from qoaudio_tpu.parallel.corpus import batch_transcode
    from qoaudio_tpu.types import QoaDesc

    rng = np.random.default_rng(29)
    files = [(rng.integers(-28000, 28000, 5120 * 2 * 2).astype(np.int16),
              QoaDesc(2, 44100, 5120 * 2)),
             (rng.integers(-28000, 28000, 4000).astype(np.int16),
              QoaDesc(1, 44100, 4000))]
    streams = [codec.encode_all(pcm, d) for pcm, d in files]
    got = batch_transcode(streams)
    for s, g in zip(streams, got):
        out = codec.decode_all(s)
        want = codec.encode_all(
            out.samples,
            QoaDesc(out.num_channels, out.sample_rate, out.samples_per_channel),
        )
        assert g == want
