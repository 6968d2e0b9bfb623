"""Op-count cut in the C++ encoder chain via mask-register forms (round 4).

Follow-up to cpp_clamp_codegen.py: the v2 asm shows the 19-step
continuation loop at ~93 instructions/step, i.e. ~40+ cycles of pure
2-port vector issue — THROUGHPUT-bound, not latency-bound (the serial
recurrence path is only ~24 cycles).  So the lever is op count.

GCC's vector-extension codegen materializes every compare mask as a
-1/0 vector (vpcmp -> k -> vmovdqa32{k}{z}) and then does arithmetic
with it; AVX-512 mask-register forms fuse each of those pairs:
  * (c & D) + m        -> one masked add        (3 ops -> 1)
  * (x ^ neg) - neg    -> one masked subtract   (3 ops -> 1)
  * rank_hi -= (a < b) -> cmp + one masked add  (4 ops -> 2)
  * wrapflag vector OR -> kmask accumulators folded once per window
q is rebuilt with masked adds of 2 (its csum path shared nothing once m
uses masked adds).  Net: ~93 -> ~75 instructions/step.

Variants (same-process interleaved best-of-N, bit-exactness-gated):
  v2: clamp intrinsics + vpshufb d16 (cpp_clamp_codegen.py winner)
  v4: v2 + full mask-register step16g rewrite
  v5: v4 + unrolled len==20 specialization (immediate word shifts)

OUTCOME (2026-08-17, fixture, stereo, all bit-exact): v4 = 1.15x vs v2,
1.167x vs the shipped v0 (same-process head-to-head; kernel 86.5 -> 101
Msps); v5's full unroll LOSES the entire v4 gain (84.8 Msps) — do not
retry unrolling.  v4 was applied to qoa_kernels.cpp, so the anchors
below match the PRE-rewrite source (commit aabd58e) and this script no
longer runs against the current tree.
"""
import ctypes
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cpp_clamp_codegen import (  # noqa: E402
    CLAMP_R_OLD, CLAMP_R_NEW, CLAMP_S_OLD, CLAMP_S_NEW, D16_OLD, D16_NEW, SRC,
)

# ---- v4: full mask-register step16g ------------------------------------

STEP16G_OLD_START = "__attribute__((always_inline)) inline void step16g(Cont16& S, v16i sample,\n                                                   int k, v16i& wrapflag) {"
# everything from the signature to the closing brace of step16g
STEP16G_NEW = r"""
typedef char v64b __attribute__((vector_size(64)));

__attribute__((always_inline)) inline void step16g(Cont16& S, v16i sample,
                                                   int k, __mmask16& wlim,
                                                   __mmask32& wovfA,
                                                   __mmask32& wovfB) {
  const __m512i z = _mm512_setzero_si512();
  const __m512i HA = (__m512i)S.HA, HB = (__m512i)S.HB;
  const __m512i WA = (__m512i)S.WA, WB = (__m512i)S.WB;
  __m512i p = _mm512_srai_epi32(
      _mm512_add_epi32(_mm512_madd_epi16(WA, HA), _mm512_madd_epi16(WB, HB)),
      13);
  __m512i pen = _mm512_max_epi32(
      _mm512_sub_epi32(
          _mm512_srai_epi32(_mm512_add_epi32(_mm512_madd_epi16(WA, WA),
                                             _mm512_madd_epi16(WB, WB)),
                            18),
          _mm512_set1_epi32(0x8FF)),
      z);
  __m512i residual = _mm512_sub_epi32((__m512i)sample, p);
  __mmask16 kneg = _mm512_cmplt_epi32_mask(residual, z);
  __mmask16 c2 = _mm512_cmple_epi32_mask((__m512i)S.T2P, residual) |
                 _mm512_cmple_epi32_mask(residual, (__m512i)S.T2N);
  __mmask16 c4 = _mm512_cmple_epi32_mask((__m512i)S.T4P, residual) |
                 _mm512_cmple_epi32_mask(residual, (__m512i)S.T4N);
  __mmask16 c6 = _mm512_cmple_epi32_mask((__m512i)S.T6P, residual) |
                 _mm512_cmple_epi32_mask(residual, (__m512i)S.T6N);
  wlim |= _mm512_cmp_epi32_mask(_mm512_abs_epi32(residual),
                                (__m512i)S.WLIM, _MM_CMPINT_NLE);
  __m512i m = _mm512_mask_add_epi32((__m512i)S.M0, c2, (__m512i)S.M0,
                                    (__m512i)S.D1);
  m = _mm512_mask_add_epi32(m, c4, m, (__m512i)S.D2);
  m = _mm512_mask_add_epi32(m, c6, m, (__m512i)S.D3);
  const __m512i kTwo = _mm512_set1_epi32(2);
  __m512i q = _mm512_maskz_mov_epi32(kneg, _mm512_set1_epi32(1));
  q = _mm512_mask_add_epi32(q, c2, q, kTwo);
  q = _mm512_mask_add_epi32(q, c4, q, kTwo);
  q = _mm512_mask_add_epi32(q, c6, q, kTwo);
  __m512i dq = _mm512_mask_sub_epi32(m, kneg, z, m);
  __m512i r = _mm512_max_epi32(
      _mm512_min_epi32(_mm512_add_epi32(p, dq), _mm512_set1_epi32(32767)),
      _mm512_set1_epi32(-32768));
  __m512i err = _mm512_sub_epi32((__m512i)sample, r);
  __m512i err_sq = _mm512_mullo_epi32(err, err);
  __m512i pen_sq = _mm512_mullo_epi32(pen, pen);
  const __m512i lo0 = (__m512i)S.rank_lo;
  __m512i lo1 = _mm512_add_epi32(lo0, err_sq);
  __mmask16 ca = _mm512_cmplt_epu32_mask(lo1, lo0);
  __m512i lo2 = _mm512_add_epi32(lo1, pen_sq);
  __mmask16 cb = _mm512_cmplt_epu32_mask(lo2, lo1);
  const __m512i kOneV = _mm512_set1_epi32(1);
  __m512i hi = (__m512i)S.rank_hi;
  hi = _mm512_mask_add_epi32(hi, ca, hi, kOneV);
  hi = _mm512_mask_add_epi32(hi, cb, hi, kOneV);
  S.rank_lo = (v16u)lo2;
  S.rank_hi = (v16u)hi;
  v16u qa = (v16u)(v16i)q;
  if (k <= 8) {
    S.word_hi |= qa << (25 - 3 * k);
  } else if (k == 9) {
    S.word_hi |= qa >> 2;
    S.word_lo |= (qa & 3) << 30;
  } else {
    S.word_lo |= qa << (57 - 3 * k);
  }
  __m512i d = _mm512_srai_epi32(dq, 4);
  const v64b kDupLo16 = {
      0, 1, 0, 1, 4, 5, 4, 5, 8, 9, 8, 9, 12, 13, 12, 13,
      0, 1, 0, 1, 4, 5, 4, 5, 8, 9, 8, 9, 12, 13, 12, 13,
      0, 1, 0, 1, 4, 5, 4, 5, 8, 9, 8, 9, 12, 13, 12, 13,
      0, 1, 0, 1, 4, 5, 4, 5, 8, 9, 8, 9, 12, 13, 12, 13};
  __m512i d16 = _mm512_shuffle_epi8(d, (__m512i)kDupLo16);
  __mmask32 mA = _mm512_cmplt_epi16_mask(HA, z);
  __mmask32 mB = _mm512_cmplt_epi16_mask(HB, z);
  __m512i sdA = _mm512_mask_sub_epi16(d16, mA, z, d16);
  __m512i sdB = _mm512_mask_sub_epi16(d16, mB, z, d16);
  __m512i wa2 = _mm512_add_epi16(WA, sdA);
  __m512i wb2 = _mm512_add_epi16(WB, sdB);
  wovfA |= _mm512_cmpneq_epi16_mask(wa2, _mm512_adds_epi16(WA, sdA));
  wovfB |= _mm512_cmpneq_epi16_mask(wb2, _mm512_adds_epi16(WB, sdB));
  S.WA = (v16i)wa2;
  S.WB = (v16i)wb2;
  S.HA = (v16i)(((v16u)S.HA >> 16) | ((v16u)S.HB << 16));
  S.HB = (v16i)(((v16u)S.HB >> 16) | ((v16u)(v16i)r << 16));
}
"""

WRAPDECL_OLD = """    Cont16 K[NV];
    v16i wrapflag[NV];
    for (int v = 0; v < NV; ++v) {
      Cont16& S = K[v];
      wrapflag[v] = v16i{};"""
WRAPDECL_NEW = """    Cont16 K[NV];
    v16i wrapflag[NV];
    __mmask16 wlim[NV];
    __mmask32 wovfA[NV], wovfB[NV];
    for (int v = 0; v < NV; ++v) {
      Cont16& S = K[v];
      wrapflag[v] = v16i{};
      wlim[v] = 0;
      wovfA[v] = 0;
      wovfB[v] = 0;"""

CONT_OLD = """    // ---- continuation: samples 1..len-1, top-8 lanes per channel ----
    for (int k = 1; k < len; ++k) {
      const int16_t* xp = xw + k * C;
      for (int v = 0; v < NV; ++v) {
        const int32_t sa = xp[2 * v];
        const int32_t sb = xp[2 * v + 1 < C ? 2 * v + 1 : 2 * v];
        v16i sample = {sa, sa, sa, sa, sa, sa, sa, sa,
                       sb, sb, sb, sb, sb, sb, sb, sb};
        step16g(K[v], sample, k, wrapflag[v]);
      }
    }"""
CONT_NEW_V4 = """    // ---- continuation: samples 1..len-1, top-8 lanes per channel ----
    for (int k = 1; k < len; ++k) {
      const int16_t* xp = xw + k * C;
      for (int v = 0; v < NV; ++v) {
        const int32_t sa = xp[2 * v];
        const int32_t sb = xp[2 * v + 1 < C ? 2 * v + 1 : 2 * v];
        v16i sample = {sa, sa, sa, sa, sa, sa, sa, sa,
                       sb, sb, sb, sb, sb, sb, sb, sb};
        step16g(K[v], sample, k, wlim[v], wovfA[v], wovfB[v]);
      }
    }
    for (int v = 0; v < NV; ++v)
      wrapflag[v] |= (v16i)_mm512_movm_epi32(wlim[v]) |
                     (v16i)_mm512_movm_epi16(wovfA[v] | wovfB[v]);"""
CONT_NEW_V5 = """    // ---- continuation: samples 1..len-1, top-8 lanes per channel ----
    if (len == 20) {
      for (int v = 0; v < NV; ++v) {
#pragma GCC unroll 20
        for (int k = 1; k < 20; ++k) {
          const int16_t* xp = xw + k * C;
          const int32_t sa = xp[2 * v];
          const int32_t sb = xp[2 * v + 1 < C ? 2 * v + 1 : 2 * v];
          v16i sample = {sa, sa, sa, sa, sa, sa, sa, sa,
                         sb, sb, sb, sb, sb, sb, sb, sb};
          step16g(K[v], sample, k, wlim[v], wovfA[v], wovfB[v]);
        }
      }
    } else {
      for (int k = 1; k < len; ++k) {
        const int16_t* xp = xw + k * C;
        for (int v = 0; v < NV; ++v) {
          const int32_t sa = xp[2 * v];
          const int32_t sb = xp[2 * v + 1 < C ? 2 * v + 1 : 2 * v];
          v16i sample = {sa, sa, sa, sa, sa, sa, sa, sa,
                         sb, sb, sb, sb, sb, sb, sb, sb};
          step16g(K[v], sample, k, wlim[v], wovfA[v], wovfB[v]);
        }
      }
    }
    for (int v = 0; v < NV; ++v)
      wrapflag[v] |= (v16i)_mm512_movm_epi32(wlim[v]) |
                     (v16i)_mm512_movm_epi16(wovfA[v] | wovfB[v]);"""


def replace_step16g(src: str) -> str:
    """Swap the whole step16g function body for the mask-register form."""
    start = src.index(STEP16G_OLD_START)
    # function ends at the first "\n}\n" after the signature
    end = src.index("\n}\n", start) + len("\n}\n")
    return src[:start] + STEP16G_NEW + src[end:]


def v4_patches(src: str) -> str:
    for old, new in ((CLAMP_R_OLD, CLAMP_R_NEW), (CLAMP_S_OLD, CLAMP_S_NEW)):
        assert old in src
        src = src.replace(old, new)
    src = replace_step16g(src)
    assert WRAPDECL_OLD in src
    src = src.replace(WRAPDECL_OLD, WRAPDECL_NEW)
    assert CONT_OLD in src
    src = src.replace(CONT_OLD, CONT_NEW_V4)
    return src


def v5_patches(src: str) -> str:
    src = v4_patches(src)
    src = src.replace(CONT_NEW_V4, CONT_NEW_V5)
    return src


def build(name, transform):
    src = open(SRC).read()
    src = transform(src)
    work = f"/tmp/qoa_step_{name}.cpp"
    so = f"/tmp/qoa_step_{name}.so"
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


def v2_transform(src):
    for old, new in ((CLAMP_R_OLD, CLAMP_R_NEW), (CLAMP_S_OLD, CLAMP_S_NEW),
                     (D16_OLD, D16_NEW)):
        assert old in src
        src = src.replace(old, new)
    return src


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
        "v2": build("v2", v2_transform),
        "v4": build("v4", v4_patches),
        "v5": build("v5", v5_patches),
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
        assert np.array_equal(words[n], words["v2"]), f"{n} diverges from v2!"
    print("bit-exactness gate: all variants identical on the fixture")

    N = 10
    best = {n: float("inf") for n in variants}
    w = np.zeros((W, C), np.uint64)
    for _ in range(N):
        for n, lib in variants.items():
            best[n] = min(best[n], run(lib, w))
    for n in variants:
        msps = spc * C / best[n] / 1e6
        print(f"  {n}: {best[n]*1e3:6.1f} ms = {msps:6.1f} Msps "
              f"({best['v2']/best[n]:.3f}x vs v2)")


if __name__ == "__main__":
    main()
