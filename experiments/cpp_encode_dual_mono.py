"""Dual-mono host encode: pair two mono FILES in the stereo chain.

Mono encode is structurally ~half the stereo Msps: every sample needs
its own step16g chain step regardless of lane fill, and one mono file
has no second independent work stream (CLAUDE.md, 2026-08-17).  But a
CORPUS of mono files does: the pairwise C==2 kernel's two channels make
fully independent decisions (per-channel argmin, stragglers, wrap
fallbacks — nothing crosses channels), so interleaving two mono files
as a fake stereo signal and splitting the per-channel outputs must be
byte-identical to encoding each alone, at close to the stereo chain's
per-sample cost — i.e. up to 2x aggregate mono throughput.

Orchestration (all shipped kernels, no custom build):
  phase 1  interleave the files' common FULL-window prefix (lens is
           shared across channels, so only full-20 windows can pair;
           a partial window only ever ends a file) -> one C==2
           qoa_encode_file call, interval 256 = both files' frame
           starts (both window grids start at w=0, so boundaries
           coincide).
  phase 2  each file's remaining windows (the longer file's tail plus
           any partial final window) continue as mono calls chunked at
           global 256-window boundaries, snapshotting the carried LMS
           manually at each frame start.
Streams assemble per file with the production assembler and compare
against codec.encode_all(backend="native").

Gates: byte-identity on every pairing (equal lengths, unequal lengths,
partial finals, sub-window file) x (music-like, noisy, random, sine)
signals.  Timing: aggregate Msps of N mono files, paired vs sequential
mono16, interleaved best-of-N in ONE process (the interleave/split
staging copies are INSIDE the dual timing).

OUTCOME (2026-08-19, 1-core shared VM, idle, interleaved best-of-10):
WIN on tonal/real-music content, LOSS on noise-like content — the
pairwise path re-admits the scalar stragglers that mono16 structurally
lacks (fast16 only re-vectorizes >2-qualifier windows):
    fixture L+R    : mono16 53.7 -> dual 73.6 Msps agg (1.37x)
    sine 2x10s     : mono16 54.0 -> dual 85.0 Msps agg (1.57x)
    music 2x10s    : mono16 51.8 -> dual 64.2 Msps agg (1.24x)
    noisy 2x10s    : mono16 52.0 -> dual 41.0 Msps agg (0.79x)
    random 2x10s   : mono16 30.9 -> dual 23.6 Msps agg (0.76x)
The native fallback counter (wrap + fast16 + scalar-straggler events)
separates the classes cleanly per paired window: sine 0.00,
fixture 0.40, synth music 1.24 | noisy 1.77, random 1.99 — breakeven
~1.5/window.  Integrated as codec.encode_all_batch with a one-shot
16-frame paired probe against that threshold, then ONE unmonitored
native call for the rest in the chosen mode.  Finer-grained adaptive
controllers were built and measured first and all lost: a per-frame
gate pays ~20us/call ctypes tax (18% on mono) AND trips on transient
spikes (10.5% of fixture frames exceed 1.5 around a 0.403 mean ->
fixture fell to 0.97x); 8-frame blocks with fixed-cadence retry got
fixture 1.23x / noisy 0.86x; EWMA + exponential-backoff probing got
fixture 1.27x / noisy 0.91x.  The one-shot probe ends at fixture
1.40x / sine 1.62x / noisy 0.93x / random 0.92x (production
codec._encode_two_mono_native A/B) — don't resurrect the controllers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from qoaudio_tpu import format as fmt
from qoaudio_tpu import bitstream as bs
from qoaudio_tpu import native
from qoaudio_tpu.codec import encode_all, initial_encoder_state
from qoaudio_tpu.types import QoaDesc

SL = fmt.QOA_SLICE_LEN          # 20
WPF = fmt.QOA_SLICES_PER_FRAME  # 256
R = 44100


def signals(n, seed, kind):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    if kind == "sine":
        x = 12000 * np.sin(2 * np.pi * 440 * t / R)
    elif kind == "music":
        x = (
            9000 * np.sin(2 * np.pi * 220 * t / R)
            + 4000 * np.sin(2 * np.pi * 661 * t / R + 0.7)
            + 1500 * np.sin(2 * np.pi * 1313 * t / R)
        ) * (0.5 + 0.5 * np.sin(2 * np.pi * t / R / 3))
        x += rng.normal(0, 180, n)
    elif kind == "noisy":
        x = 8000 * np.sin(2 * np.pi * 330 * t / R) + rng.normal(0, 2500, n)
    else:  # random
        x = rng.integers(-32768, 32768, n)
    return np.clip(x, -32768, 32767).astype(np.int16)


def mono_encode_bytes(pcm):
    return encode_all(pcm, QoaDesc(1, R, len(pcm)), backend="native")


def _padded_lens(T):
    F = -(-T // fmt.QOA_FRAME_LEN)
    Wtot = F * WPF
    nw = -(-T // SL)
    lens = np.zeros(Wtot, np.int32)
    lens[:nw] = SL
    lens[nw - 1] = T - (nw - 1) * SL
    return lens, Wtot, F


def _finish_mono(pcm_pad, lens, w_start, state, words_out, snap_at):
    """Run windows [w_start, len(lens)) of one mono file, snapshotting the
    carried LMS into snap_at[w // WPF] at every frame-start boundary."""
    w = w_start
    Wtot = len(lens)
    while w < Wtot:
        if w % WPF == 0:
            snap_at[w // WPF] = state[:, 0]
        n = min(WPF - w % WPF, Wtot - w)
        words_out[w : w + n, 0] = native.encode_windows(
            pcm_pad[w * SL : (w + n) * SL].reshape(-1, 1),
            lens[w : w + n],
            n,
            state,
        )[:, 0]
        w += n


def dual_encode_bytes(a, b):
    """Encode two mono int16 arrays, paired; returns (bytes_a, bytes_b)."""
    Ta, Tb = len(a), len(b)
    wp = min(Ta // SL, Tb // SL)  # common full-window prefix
    lens_a, Wa, Fa = _padded_lens(Ta)
    lens_b, Wb, Fb = _padded_lens(Tb)
    words_a = np.zeros((Wa, 1), np.uint64)
    words_b = np.zeros((Wb, 1), np.uint64)
    snaps_a = np.zeros((Fa, 8), np.int32)
    snaps_b = np.zeros((Fb, 8), np.int32)
    state2 = np.ascontiguousarray(initial_encoder_state(2))

    if wp:
        inter = np.empty((wp * SL, 2), np.int16)
        inter[:, 0] = a[: wp * SL]
        inter[:, 1] = b[: wp * SL]
        w2, s2 = native.encode_file(
            inter, np.full(wp, SL, np.int32), wp, WPF, state2
        )
        words_a[:wp, 0] = w2[:, 0]
        words_b[:wp, 0] = w2[:, 1]
        snaps_a[: s2.shape[0]] = s2[:, :, 0]
        snaps_b[: s2.shape[0]] = s2[:, :, 1]

    # tails: zero-pad each file's pcm to its padded window grid (lens==0
    # windows pass state through but the kernel still indexes their rows)
    for pcm, T, W, lens, words, snaps, c in (
        (a, Ta, Wa, lens_a, words_a, snaps_a, 0),
        (b, Tb, Wb, lens_b, words_b, snaps_b, 1),
    ):
        if wp >= W:
            continue
        pad = np.zeros(W * SL, np.int16)
        pad[:T] = pcm
        st = np.ascontiguousarray(state2[:, c : c + 1])
        _finish_mono(pad, lens, wp, st, words, snaps)

    ba = bs.assemble_stream_bytes(
        1, R, Ta, snaps_a.reshape(Fa, 8, 1), words_a.reshape(Fa, WPF, 1)
    )
    bb = bs.assemble_stream_bytes(
        1, R, Tb, snaps_b.reshape(Fb, 8, 1), words_b.reshape(Fb, WPF, 1)
    )
    return ba, bb


def check():
    cases = [
        ("equal", 10 * R, 10 * R),
        ("unequal", 10 * R, 7 * R + 13),
        ("partials", 5 * R + 7, 3 * R + 19),
        ("subwindow", 11, 5 * R),
        ("one-frame", fmt.QOA_FRAME_LEN, fmt.QOA_FRAME_LEN * 2 + 77),
    ]
    for kind in ("sine", "music", "noisy", "random"):
        for name, na, nb in cases:
            A = signals(na, 1, kind)
            B = signals(nb, 2, kind)
            da, db = dual_encode_bytes(A, B)
            assert da == mono_encode_bytes(A), (kind, name, "A")
            assert db == mono_encode_bytes(B), (kind, name, "B")
    print("byte-identity: all pairings x all signals OK")


def bench():
    reps = 10
    for kind in ("sine", "music", "noisy", "random"):
        for name, na, nb in (("2x10s", 10 * R, 10 * R),
                             ("uneq", 10 * R, 6 * R + 11)):
            A = signals(na, 3, kind)
            B = signals(nb, 4, kind)
            tm = []
            td = []
            for _ in range(reps):  # interleaved A/B, same process
                t0 = time.perf_counter()
                mono_encode_bytes(A)
                mono_encode_bytes(B)
                tm.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                dual_encode_bytes(A, B)
                td.append(time.perf_counter() - t0)
            tot = (na + nb) / 1e6
            m, d = tot / min(tm), tot / min(td)
            print(f"{kind:6s} {name:6s}: mono16 {m:6.1f} -> dual {d:6.1f} "
                  f"Msps agg ({d / m:.2f}x)")


if __name__ == "__main__":
    check()
    bench()
