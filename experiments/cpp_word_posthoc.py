"""Post-hoc word rebuild: cut the q/word path out of the encoder chain.

The 19-step continuation (step16g) is ISSUE-WIDTH-bound (~2 512-bit ALU
ports saturated; experiments/cpp_step_opcount.py), so the only lever is
removing ops from the step.  The last untried cut from the round-3/4
notes: the 3-bit code q (1 maskz_mov + 3 masked adds) and the word
accumulation (1-2 512-bit shift + or, 4 ops at k==9) exist only so the
eventual WINNING lane's slice word is ready — 15 losing lanes compute
them for nothing, every step.

Variants (same-process interleaved best-of-N, bit-exactness-gated,
stereo fixture via qoa_encode_file like the shipped path):
  v0: shipped qoa_kernels.cpp
  vA: step16g stores dq (one 64-byte store, off the ALU ports) and drops
      q + word entirely; after the argmin, the winner's word is rebuilt
      scalar from the stored dq plane (q = 2*(|dq|>=M1 .. >=M3) + (dq<0)
      — the dequant magnitudes are strictly increasing and nonzero, so
      the inverse is exact).  Net: -6 vector ALU ops, +1 store per step,
      +~9 scalar ops/step/channel post-argmin.
  vB: keep q, store it, drop only the word shift/or accumulation;
      post-argmin just ORs the stored q's.  (-2..4 vector ops, +1 store.)

OUTCOME (2026-08-17, fixture, stereo, both variants bit-exact, N=12
interleaved, SEVEN sessions): NO reproducible win — vA 0.93-1.12x
(mean 1.01), vB 0.94-1.08x (mean 0.99) vs v0.  Even interleaved
best-of-12 scatters +-9% across sessions on this shared VM, and the
mean is a wash: the ~6 removed vector ALU ops are repaid by the
64-byte store plus the post-argmin scalar rebuild competing for the
same issue slots.  The q/word-path cut is CLOSED; v0 ships unchanged.
"""
import ctypes
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "qoaudio_tpu", "native", "qoa_kernels.cpp")

SIG_OLD = "                                                   __mmask32& wovfB) {"
SIG_NEW = ("                                                   __mmask32& wovfB,\n"
           "                                                   int32_t* dq_out) {")

Q_OLD = """  const __m512i kTwo = _mm512_set1_epi32(2);
  __m512i q = _mm512_maskz_mov_epi32(kneg, _mm512_set1_epi32(1));
  q = _mm512_mask_add_epi32(q, c2, q, kTwo);
  q = _mm512_mask_add_epi32(q, c4, q, kTwo);
  q = _mm512_mask_add_epi32(q, c6, q, kTwo);
  __m512i dq = _mm512_mask_sub_epi32(m, kneg, z, m);
"""
Q_NEW_A = """  __m512i dq = _mm512_mask_sub_epi32(m, kneg, z, m);
  _mm512_storeu_si512((void*)dq_out, dq);
"""

WORD_OLD = """  v16u qa = (v16u)(v16i)q;
  if (k <= 8) {
    S.word_hi |= qa << (25 - 3 * k);
  } else if (k == 9) {
    S.word_hi |= qa >> 2;
    S.word_lo |= (qa & 3) << 30;
  } else {
    S.word_lo |= qa << (57 - 3 * k);
  }
"""
WORD_NEW_B = """  _mm512_storeu_si512((void*)dq_out, q);
"""

BUF_OLD = """    Cont16 K[NV];
    // wrap-risk flags as k-register masks end to end"""
BUF_NEW = """    Cont16 K[NV];
    alignas(64) int32_t dqbuf[kSliceLen * NV * 16];
    // wrap-risk flags as k-register masks end to end"""

CALL_OLD = "        step16g(K[v], sample, k, wlim[v], wovfA[v], wovfB[v]);"
CALL_NEW = ("        step16g(K[v], sample, k, wlim[v], wovfA[v], wovfB[v],\n"
            "                dqbuf + (k * NV + v) * 16);")

MAT_OLD = """        B.word = (uint64_t((uint32_t)lane32((v16i)S.word_hi)) << 32) |
                 (uint32_t)lane32((v16i)S.word_lo);
      }"""
MAT_NEW_A = """        B.word = (uint64_t((uint32_t)lane32((v16i)S.word_hi)) << 32) |
                 (uint32_t)lane32((v16i)S.word_lo);
        const int32_t sv_w = kSfTab[b_sf];
        const int32_t M1 = mag1(sv_w), M2 = mag2(sv_w), M3 = mag3(sv_w);
        for (int kk = 1; kk < len; ++kk) {
          const int32_t dd = dqbuf[(kk * NV + c / 2) * 16 + l];
          const int32_t ad = dd < 0 ? -dd : dd;
          const uint32_t qq =
              2u * (uint32_t)((ad >= M1) + (ad >= M2) + (ad >= M3)) +
              (uint32_t)(dd < 0);
          B.word |= (uint64_t)qq << (57 - 3 * kk);
        }
      }"""
MAT_NEW_B = """        B.word = (uint64_t((uint32_t)lane32((v16i)S.word_hi)) << 32) |
                 (uint32_t)lane32((v16i)S.word_lo);
        for (int kk = 1; kk < len; ++kk)
          B.word |= (uint64_t)(uint32_t)dqbuf[(kk * NV + c / 2) * 16 + l]
                    << (57 - 3 * kk);
      }"""


def _common(src: str) -> str:
    for old, new in ((SIG_OLD, SIG_NEW), (BUF_OLD, BUF_NEW),
                     (CALL_OLD, CALL_NEW)):
        assert old in src, old
        src = src.replace(old, new)
    return src


def vA(src: str) -> str:
    src = _common(src)
    for old, new in ((Q_OLD, Q_NEW_A), (WORD_OLD, ""), (MAT_OLD, MAT_NEW_A)):
        assert old in src, old[:60]
        src = src.replace(old, new)
    return src


def vB(src: str) -> str:
    src = _common(src)
    for old, new in ((WORD_OLD, WORD_NEW_B), (MAT_OLD, MAT_NEW_B)):
        assert old in src, old[:60]
        src = src.replace(old, new)
    return src


def build(name, transform):
    src = open(SRC).read()
    src = transform(src)
    work = f"/tmp/qoa_posthoc_{name}.cpp"
    so = f"/tmp/qoa_posthoc_{name}.so"
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
    import sys
    sys.path.insert(0, os.path.join(HERE, ".."))
    from qoaudio_tpu import codec

    data = open(os.path.join(
        HERE, "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    out = codec.decode_all(data, backend="native")
    pcm = np.ascontiguousarray(out.samples.reshape(-1, 2))
    spc = out.samples_per_channel
    C = 2
    W = -(-spc // 20)
    lens = np.full(W, 20, np.int32)
    lens[-1] = spc - (W - 1) * 20

    variants = {
        "v0": build("v0", lambda s: s),
        "vA": build("vA", vA),
        "vB": build("vB", vB),
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

    words = {n: np.zeros((W, C), np.uint64) for n in variants}
    for n, lib in variants.items():
        run(lib, words[n])
    for n in variants:
        assert np.array_equal(words[n], words["v0"]), f"{n} diverges from v0!"
    print("bit-exactness gate: all variants identical on the fixture")

    N = 12
    best = {n: float("inf") for n in variants}
    w = np.zeros((W, C), np.uint64)
    for _ in range(N):
        for n, lib in variants.items():
            best[n] = min(best[n], run(lib, w))
    for n in variants:
        msps = spc * C / best[n] / 1e6
        print(f"  {n}: {best[n]*1e3:6.1f} ms = {msps:6.1f} Msps "
              f"({best['v0']/best[n]:.3f}x vs v0)")


if __name__ == "__main__":
    main()
