"""Host batch encode with mono pairing (codec.encode_all_batch).

Two mono files interleave into the pairwise C==2 chain's two channels
(each channel's scalefactor decisions are independent, so the split
streams must be byte-identical to encoding each file alone); a 16-frame
fallback-rate probe routes straggler-heavy content to per-file mono16
instead.  The reference has no cross-file axis at all (QoaEncoder
encodes one stream, src/lib.rs:336-469) — this is a beyond-parity host
throughput feature; bit-exactness with per-file encoding is the
contract under test.  Design: experiments/cpp_encode_dual_mono.py.
"""

import numpy as np
import pytest

from qoaudio_tpu import QoaDesc, codec, native
from qoaudio_tpu import format as fmt
from qoaudio_tpu.codec import encode_all, encode_all_batch

from conftest import make_noise, make_sine

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable (no g++?)"
)

R = 44100


def mono(pcm):
    return pcm, QoaDesc(1, R, len(pcm))


def assert_batch_matches_per_file(items):
    outs = encode_all_batch(items)
    assert len(outs) == len(items)
    for i, (pcm, d) in enumerate(items):
        assert outs[i] == encode_all(pcm, d), f"item {i} diverged"


def test_pair_equal_lengths():
    assert_batch_matches_per_file(
        [mono(make_sine(3 * R)), mono(make_sine(3 * R, freq=261.0))]
    )


def test_pair_unequal_lengths_and_partial_windows():
    # unequal lengths: the longer file's surplus windows finish mono16;
    # lengths off the 20-sample grid exercise the partial-final-window
    # tails (never paired — the kernel's lens is shared across channels)
    assert_batch_matches_per_file(
        [
            mono(make_sine(3 * R + 7)),
            mono(make_sine(2 * R + 13, freq=330.0)),
        ]
    )


def test_pair_crosses_frame_boundaries_unaligned():
    # the shared prefix ends mid-frame of the longer file: its finish
    # must not re-snapshot the frame in progress
    n1 = fmt.QOA_FRAME_LEN * 2 + fmt.QOA_FRAME_LEN // 3
    n2 = fmt.QOA_FRAME_LEN * 4 + 101
    assert_batch_matches_per_file(
        [mono(make_sine(n1)), mono(make_sine(n2, freq=220.0))]
    )


def _record_modes(monkeypatch):
    """Record (channels, n_windows) of every native.encode_file call."""
    calls = []
    real = native.encode_file

    def spy(pcm, lens, W, interval, state):
        calls.append((pcm.shape[1], W))
        return real(pcm, lens, W, interval, state)

    monkeypatch.setattr(native, "encode_file", spy)
    return calls


def test_probe_bails_on_noise_and_still_matches(monkeypatch):
    # noise-like content exceeds the fallback-rate threshold in the
    # 16-frame probe (calibration: random ~1.99/window vs threshold 1.5);
    # the rest must run per-file mono16 — pin the mode switch through the
    # call shapes so a silent policy regression cannot hide behind
    # byte-identity (bytes are identical on every path)
    a = make_noise(6 * R, seed=1)
    b = make_noise(6 * R, seed=2)
    assert_batch_matches_per_file([mono(a), mono(b)])
    calls = _record_modes(monkeypatch)
    codec._encode_two_mono_native(
        a, QoaDesc(1, R, len(a)), b, QoaDesc(1, R, len(b))
    )
    probe_w = codec._DUAL_MONO_PROBE_FRAMES * fmt.QOA_SLICES_PER_FRAME
    paired = [(c, w) for c, w in calls if c == 2]
    assert paired == [(2, probe_w)]  # the probe, and ONLY the probe
    assert sum(w for c, w in calls if c == 1) >= 2 * probe_w  # mono rest


def test_probe_stays_paired_on_tonal(monkeypatch):
    calls = _record_modes(monkeypatch)
    n = 6 * R
    codec._encode_two_mono_native(
        make_sine(n), QoaDesc(1, R, n),
        make_sine(n, freq=261.0), QoaDesc(1, R, n),
    )
    wp = n // fmt.QOA_SLICE_LEN
    # probe + one paired rest call cover the whole shared prefix; the
    # only mono calls are the per-file padded-grid tails
    assert sum(w for c, w in calls if c == 2) == wp


def test_tiny_files_and_subwindow_pairing():
    assert_batch_matches_per_file(
        [
            mono(make_sine(11)),  # shorter than one window: wp == 0
            mono(make_sine(R // 2)),
            mono(make_sine(fmt.QOA_SLICE_LEN)),  # exactly one window
            mono(make_sine(fmt.QOA_FRAME_LEN)),  # exactly one frame
        ]
    )


def test_odd_mono_count_and_mixed_channels_preserve_order():
    rng = np.random.default_rng(5)
    stereo = rng.integers(-9000, 9000, (R, 2)).astype(np.int16)
    items = [
        mono(make_sine(R)),
        (stereo, QoaDesc(2, R, R)),
        mono(make_sine(2 * R, freq=330.0)),
        mono(make_sine(R + 3, freq=550.0)),  # odd mono leftover
    ]
    assert_batch_matches_per_file(items)


def test_pairing_sorts_by_length():
    # four mono files with very different lengths: nearest lengths must
    # pair (max shared prefix), and order must be restored on return
    items = [
        mono(make_sine(4 * R)),
        mono(make_sine(R // 4, freq=220.0)),
        mono(make_sine(4 * R + 9, freq=330.0)),
        mono(make_sine(R // 4 + 1, freq=550.0)),
    ]
    assert_batch_matches_per_file(items)


def test_empty_and_single():
    assert encode_all_batch([]) == []
    assert_batch_matches_per_file([mono(make_sine(R))])


def test_validation_errors_propagate():
    from qoaudio_tpu.errors import InvalidSamples

    with pytest.raises(InvalidSamples):
        encode_all_batch([(np.zeros(10, np.int16), QoaDesc(1, R, 11))])


def test_batch_encode_no_jax_fallback_pairs(monkeypatch):
    # parallel.corpus.batch_encode without a usable jax backend routes
    # through encode_all_batch (mono pairing) and stays bit-exact
    from qoaudio_tpu.parallel import corpus

    monkeypatch.setattr(corpus, "_jax_platform", lambda: None)
    items = [
        mono(make_sine(2 * R)),
        mono(make_sine(2 * R + 7, freq=330.0)),
    ]
    outs = corpus.batch_encode(items)
    for (pcm, d), out in zip(items, outs):
        assert out == encode_all(pcm, d)


def test_fallback_counter_binding():
    # monotone, int, and advanced by an encode that has any stragglers
    f0 = native.encode_fallbacks()
    assert isinstance(f0, int)
    encode_all(make_noise(R, seed=3), QoaDesc(1, R, R), backend="native")
    assert native.encode_fallbacks() >= f0


def test_batch_transcode_no_jax_fallback_pairs(monkeypatch):
    # the jax-less batch_transcode fallback decodes per file but batches
    # the encode side, so mono streams pair — output bytes unchanged
    from qoaudio_tpu.parallel import corpus

    streams = [
        encode_all(make_sine(2 * R), QoaDesc(1, R, 2 * R)),
        encode_all(make_sine(2 * R + 9, freq=330.0), QoaDesc(1, R, 2 * R + 9)),
    ]
    want = corpus.batch_transcode(streams)
    monkeypatch.setattr(corpus, "_jax_platform", lambda: None)
    assert corpus.batch_transcode(streams) == want
