"""argmin_halves extraction: kill the 6x64-byte stack round trip.

argmin_halves ends by memcpy-ing SIX full vectors to a stack array and
reloading 12 scalars — every reload is a 4-byte read of a 64-byte store
(store-to-load forwarding cannot forward, ~10-12 stall cycles each), in
the phase the rdtsc attribution bills at 26% of the encode
(argmin+stragglers+writeback).  The straggler code already avoids this
exact pattern for its winner extraction ("a variable vector subscript
compiles to a 64-byte stack spill + reload; the permute form has no
store-forward stall").

vE extracts lanes 0 and 8 directly instead: lane 0 via castsi512_si128
+ cvtsi (free), lane 8 via one extracti32x4 per vector — 12 extracts,
no stores, no stalls.

Gates: byte-identical words + state vs the shipped kernel on the
stereo fixture, mono fixture-L (exercises the fast16 argmin tail
indirectly — it shares argmin_halves), noisy, and uniform random.
Timing: same-process interleaved best-of-12 via qoa_encode_file.

OUTCOME (2026-08-17, 1-core shared VM, interleaved best-of-12, two
sessions): a WASH — CLOSED, v0 ships unchanged.
    fixture 0.864x / 0.981x, mono-L 1.006x / 0.992x, sine 0.996x /
    0.993x, noisy 0.989x / 1.018x, random 0.958x / 0.993x.
The 6x64-byte spill + 12 scalar reloads happen once per window OFF the
step chain's critical path; out-of-order execution hides the
store-forward stalls behind the next window's sample-0 evaluation (and
the extract forms burn the same two ports the chain saturates).  Same
lesson as the q/word post-hoc cut: only ops ON the 19-step chain's
issue ports matter.  Don't retry.
"""
import ctypes
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "qoaudio_tpu", "native", "qoa_kernels.cpp")

TAIL_OLD = """  int32_t d[16 * 6];
  std::memcpy(d + 0, &mlane, 64);
  std::memcpy(d + 16, &mh_r, 64);
  std::memcpy(d + 32, &ml_r, 64);
  std::memcpy(d + 48, &mh_f, 64);
  std::memcpy(d + 64, &ml_f, 64);
  std::memcpy(d + 80, &msf, 64);
  HalfWin out;
  for (int h = 0; h < 2; ++h) {
    const int b = h * 8;
    out.lane[h] = d[b];
    out.total[h] = (uint64_t(uint32_t(d[16 + b])) << 32) |
                   uint32_t(d[32 + b] ^ (int32_t)0x80000000);
    out.first[h] = (uint64_t(uint32_t(d[48 + b])) << 32) |
                   uint32_t(d[64 + b] ^ (int32_t)0x80000000);
    out.sf[h] = d[80 + b];
  }
  return out;"""

TAIL_NEW = """  // every lane of a half holds that half's reduction result, so lanes 0
  // and 8 suffice; direct extracts avoid the 64-byte stack round trip
  // (4-byte reloads of a 64-byte store cannot store-forward)
  auto l0 = [](v16i v) {
    return _mm_cvtsi128_si32(_mm512_castsi512_si128((__m512i)v));
  };
  auto l8 = [](v16i v) {
    return _mm_cvtsi128_si32(_mm512_extracti32x4_epi32((__m512i)v, 2));
  };
  HalfWin out;
  out.lane[0] = l0(mlane);
  out.lane[1] = l8(mlane);
  out.sf[0] = l0(msf);
  out.sf[1] = l8(msf);
  out.total[0] = (uint64_t(uint32_t(l0(mh_r))) << 32) |
                 uint32_t(l0(ml_r) ^ (int32_t)0x80000000);
  out.total[1] = (uint64_t(uint32_t(l8(mh_r))) << 32) |
                 uint32_t(l8(ml_r) ^ (int32_t)0x80000000);
  out.first[0] = (uint64_t(uint32_t(l0(mh_f))) << 32) |
                 uint32_t(l0(ml_f) ^ (int32_t)0x80000000);
  out.first[1] = (uint64_t(uint32_t(l8(mh_f))) << 32) |
                 uint32_t(l8(ml_f) ^ (int32_t)0x80000000);
  return out;"""


def vE(src):
    assert TAIL_OLD in src
    return src.replace(TAIL_OLD, TAIL_NEW)


def build(name, transform):
    src = transform(open(SRC).read())
    work = f"/tmp/qoa_argx_{name}.cpp"
    so = f"/tmp/qoa_argx_{name}.so"
    open(work, "w").write(src)
    subprocess.run(
        ["g++", "-O3", "-march=native", "-mprefer-vector-width=512",
         "-fno-strict-aliasing", "-shared", "-fPIC", "-o", so, work],
        check=True,
    )
    lib = ctypes.CDLL(so)
    i64 = ctypes.c_int64
    p_i16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_u64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.qoa_encode_file.argtypes = [
        p_i16, p_i32, i64, i64, i64, p_i32, p_u64, p_i32
    ]
    return lib


def signals():
    import sys
    sys.path.insert(0, os.path.join(HERE, ".."))
    from qoaudio_tpu import codec

    data = open(os.path.join(
        HERE, "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    out = codec.decode_all(data, backend="native")
    fix = np.ascontiguousarray(out.samples.reshape(-1, 2))
    n = 1200000
    t = np.arange(n)
    rng = np.random.default_rng(3)
    base = 9000 * np.sin(2 * np.pi * 220 * t / 44100)
    mk = lambda a: np.ascontiguousarray(
        np.stack([a, np.roll(a, 7)], axis=1).astype(np.int16))
    return {
        "fixture": (fix, 2),
        "mono-L": (np.ascontiguousarray(fix[:, :1]), 1),
        "sine": (mk(base), 2),
        "noisy": (mk(base + rng.normal(0, 900, n)), 2),
        "random": (rng.integers(-32768, 32768, (n, 2)).astype(np.int16), 2),
    }


def encode(lib, pcm, C):
    spc = pcm.shape[0]
    W = -(-spc // 20)
    lens = np.full(W, 20, np.int32)
    lens[-1] = spc - (W - 1) * 20
    x = np.zeros((W * 20, C), np.int16)
    x[:spc] = pcm
    st = np.zeros((8, C), np.int32)
    st[6] = -(1 << 13)
    st[7] = 1 << 14
    words = np.zeros((W, C), np.uint64)
    snaps = np.empty((-(-W // 256), 8, C), np.int32)
    t0 = time.perf_counter()
    lib.qoa_encode_file(x, lens, W, C, 256, st, words, snaps)
    dt = time.perf_counter() - t0
    return words, st, dt


def main():
    libs = {"v0": build("v0", lambda s: s), "vE": build("vE", vE)}
    sigs = signals()

    for name, (pcm, C) in sigs.items():
        ref = encode(libs["v0"], pcm, C)
        got = encode(libs["vE"], pcm, C)
        assert np.array_equal(ref[0], got[0]), (name, "words")
        assert np.array_equal(ref[1], got[1]), (name, "state")
    print("bit-exactness gate: vE identical to v0 (5 signals)")

    N = 12
    for name, (pcm, C) in sigs.items():
        best = {k: float("inf") for k in libs}
        for _ in range(N):
            for k, lib in libs.items():
                best[k] = min(best[k], encode(lib, pcm, C)[2])
        tot = pcm.size
        print(f"  {name:8s}: v0 {tot/best['v0']/1e6:6.1f}   "
              f"vE {tot/best['vE']/1e6:6.1f}  Msps "
              f"({best['v0']/best['vE']:.3f}x)")


if __name__ == "__main__":
    main()
