"""Clamp-codegen latency cut in the C++ encoder chain (round-4 experiment).

Finding (objdump on the shipped .so): GCC compiles the reconstruction
clamp in step16g — `r = r < min ? min : r; r = r > max ? max : r;` — to a
compare->masked-add->compare->blend chain (~9 cycles of latency through
k-registers) instead of vpminsd/vpmaxsd (2 cycles), and the clamp sits on
the serial 19-step LMS recurrence that is 61% of single-file encode time
(see cpp_encode_phase_profile.py).  The identical source idiom in the
DECODE kernel does compile to vpminsd/vpmaxsd, so this is a codegen
cliff specific to the encoder's mask-heavy context, fixable by forcing
the intrinsics.

Variants, A/B'd in ONE process (the shared VM varies +-25% across
sessions; same-process best-of-N only):
  v0: shipped source
  v1: vpminsd/vpmaxsd intrinsics for the r clamp (step16g + step16) and
      the scaled clamp (step16)
  v2: v1 + vpshufb for the d16 low-half broadcast (saves 1 more cycle on
      the weight-update path: dq->d->shufb vs dq->d->slld->ternlog)

Every variant is bit-exactness-gated against v0 on the full fixture.

ARCHIVED: measured v1/v2 = 1.029x vs v0 (2026-08-17); the winning form
(further improved by cpp_step_opcount.py's v4) is now in-tree, so the
source anchors below match the PRE-rewrite qoa_kernels.cpp (commit
aabd58e) and this script no longer runs against the current tree.
"""
import ctypes
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "qoaudio_tpu", "native", "qoa_kernels.cpp",
)

CLAMP_R_OLD = """  v16i r = (v16i)((v16u)p + (v16u)dq);
  r = r < vbroadcast(-32768) ? vbroadcast(-32768) : r;
  r = r > vbroadcast(32767) ? vbroadcast(32767) : r;"""
CLAMP_R_NEW = """  v16i r = (v16i)_mm512_max_epi32(
      _mm512_min_epi32((__m512i)(v16i)((v16u)p + (v16u)dq),
                       (__m512i)vbroadcast(32767)),
      (__m512i)vbroadcast(-32768));"""

CLAMP_S_OLD = """  scaled = scaled < vbroadcast(-8) ? vbroadcast(-8) : scaled;
  scaled = scaled > vbroadcast(8) ? vbroadcast(8) : scaled;"""
CLAMP_S_NEW = """  scaled = (v16i)_mm512_max_epi32(
      _mm512_min_epi32((__m512i)scaled, (__m512i)vbroadcast(8)),
      (__m512i)vbroadcast(-8));"""

D16_OLD = "  v16i d16 = (d << 16) | (d & vbroadcast(0xFFFF));"
D16_NEW = """  typedef char v64b __attribute__((vector_size(64)));
  const v64b kDupLo16 = {
      0, 1, 0, 1, 4, 5, 4, 5, 8, 9, 8, 9, 12, 13, 12, 13,
      0, 1, 0, 1, 4, 5, 4, 5, 8, 9, 8, 9, 12, 13, 12, 13,
      0, 1, 0, 1, 4, 5, 4, 5, 8, 9, 8, 9, 12, 13, 12, 13,
      0, 1, 0, 1, 4, 5, 4, 5, 8, 9, 8, 9, 12, 13, 12, 13};
  v16i d16 = (v16i)_mm512_shuffle_epi8((__m512i)d, (__m512i)kDupLo16);"""


def build_variant(name, patches):
    src = open(SRC).read()
    for old, new in patches:
        assert old in src, f"{name}: pattern not found: {old[:60]}..."
        src = src.replace(old, new)
    work = f"/tmp/qoa_clamp_{name}.cpp"
    so = f"/tmp/qoa_clamp_{name}.so"
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


def main():
    from qoaudio_tpu import codec

    data = open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    out = codec.decode_all(data, backend="native")
    pcm = np.ascontiguousarray(out.samples.reshape(-1, 2))
    spc = out.samples_per_channel
    C = 2
    W = -(-spc // 20)
    lens = np.full(W, 20, np.int32)
    lens[-1] = spc - (W - 1) * 20

    variants = {
        "v0": build_variant("v0", []),
        "v1": build_variant(
            "v1", [(CLAMP_R_OLD, CLAMP_R_NEW), (CLAMP_S_OLD, CLAMP_S_NEW)]
        ),
        "v2": build_variant(
            "v2",
            [(CLAMP_R_OLD, CLAMP_R_NEW), (CLAMP_S_OLD, CLAMP_S_NEW),
             (D16_OLD, D16_NEW)],
        ),
    }

    def init_state():
        st = np.zeros((8, C), np.int32)
        st[6] = -(1 << 13)
        st[7] = 1 << 14
        return np.ascontiguousarray(st)

    def run(lib, words):
        st = init_state()
        snaps = np.empty((-(-W // 256), 8, C), np.int32)
        t0 = time.perf_counter()
        lib.qoa_encode_file(pcm, lens, W, C, 256, st, words, snaps)
        return time.perf_counter() - t0

    # bit-exactness gate first
    words = {n: np.zeros((W, C), np.uint64) for n in variants}
    for n, lib in variants.items():
        run(lib, words[n])
    for n in variants:
        assert np.array_equal(words[n], words["v0"]), f"{n} diverges from v0!"
    print("bit-exactness gate: all variants identical on the fixture")

    # interleaved A/B, best-of-N per variant, all in this process
    N = 10
    best = {n: float("inf") for n in variants}
    w = np.zeros((W, C), np.uint64)
    for i in range(N):
        for n, lib in variants.items():
            best[n] = min(best[n], run(lib, w))
    for n in variants:
        msps = spc * C / best[n] / 1e6
        print(f"  {n}: {best[n]*1e3:6.1f} ms = {msps:6.1f} Msps "
              f"({best['v0']/best[n]:.3f}x vs v0)")


if __name__ == "__main__":
    main()
