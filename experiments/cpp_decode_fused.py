"""Register-resident window-fused host decode kernel (round 4).

The shipped qoa_decode_chains streams all 14 state/word planes through
memory for EVERY sample step (decode_lane_step: ~14 loads + 9 stores per
sample) — objdump shows ~125 instructions per vectorized step, and the
fixture kernel time (9.7 ms = ~96 cycles per 16-lane step) is memory-op
bound, not ALU bound.  The encoder's continuation solved the same
problem by keeping the whole window recurrence in registers.

v2 here does the same for decode: per 16-chain group the LMS state
lives in 8 zmm registers across ALL windows; each window loads two
512-bit word vectors, byte-swaps in-register, unpacks hi/lo planes and
per-sf magnitudes with permutes, runs the 20-step recurrence entirely
in registers (~34 ops/step), and stores only the int16 samples.  Two
independent chain groups interleave (G=2) to cover the ~16-cycle serial
latency of the prediction multiply chain.  State stays FULL int32
(unlike the encoder there is no fallback path: adversarial streams
wrap the weights, so no 16-bit packing) — all arithmetic wraps exactly
like the reference (src/lib.rs:291-330).

Gates: bit-exact vs the shipped kernel on (a) the real fixture layout
and (b) 300-window random-word/random-state chains (weight-wrap
regimes).  Timing: same-process interleaved best-of-N at the fixture
shape, N padded to 32 for both variants.

OUTCOME (2026-08-17): WIN, integrated.  v2 beat the shipped plane kernel
1.69x / 2.21x / 2.22x across three same-process best-of-12 sessions at
the fixture shape (e.g. 4.75 -> 2.81 ms), both gates bit-exact.  Shipped
as the default qoa_decode_chains for N >= 32 on AVX-512 builds (ragged
tails pad into a 32-column scratch block; plane path kept for narrow N
and non-AVX-512 build tiers).  decode_all e2e moved 312-434 -> ~589 Msps
idle (~3.1x Rust).  This harness predates the integration: it appends v2
source to qoa_kernels.cpp, so re-running it against the post-integration
source fails with duplicate symbols — anchor it at commit 9275e1a.
"""
import ctypes
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "qoaudio_tpu", "native", "qoa_kernels.cpp")

V2_SRC = r"""
// ---- experiment: register-resident window-fused decode (G=2) ----
namespace {

inline __m512i bswap64x8(__m512i v) {
  const v64b kRev8 = {
      7, 6, 5, 4, 3, 2, 1, 0, 15, 14, 13, 12, 11, 10, 9, 8,
      7, 6, 5, 4, 3, 2, 1, 0, 15, 14, 13, 12, 11, 10, 9, 8,
      7, 6, 5, 4, 3, 2, 1, 0, 15, 14, 13, 12, 11, 10, 9, 8,
      7, 6, 5, 4, 3, 2, 1, 0, 15, 14, 13, 12, 11, 10, 9, 8};
  return _mm512_shuffle_epi8(v, (__m512i)kRev8);
}

struct DecGroup {
  __m512i H0, H1, H2, H3, W0, W1, W2, W3;
  __m512i whi, wlo, m0, m1, m2, m3;
};

__attribute__((always_inline)) inline void dec_load_window(
    DecGroup& G, const uint64_t* row) {
  const __m512i a = bswap64x8(_mm512_loadu_si512((const void*)row));
  const __m512i b = bswap64x8(_mm512_loadu_si512((const void*)(row + 8)));
  const __m512i kLo = _mm512_set_epi32(30, 28, 26, 24, 22, 20, 18, 16,
                                       14, 12, 10, 8, 6, 4, 2, 0);
  const __m512i kHi = _mm512_set_epi32(31, 29, 27, 25, 23, 21, 19, 17,
                                       15, 13, 11, 9, 7, 5, 3, 1);
  G.wlo = _mm512_permutex2var_epi32(a, kLo, b);
  G.whi = _mm512_permutex2var_epi32(a, kHi, b);
  const __m512i sf = _mm512_srli_epi32(G.whi, 28);
  G.m0 = _mm512_permutexvar_epi32(sf, (__m512i)kMag0V);
  G.m1 = _mm512_permutexvar_epi32(sf, (__m512i)kMag1V);
  G.m2 = _mm512_permutexvar_epi32(sf, (__m512i)kMag2V);
  G.m3 = _mm512_permutexvar_epi32(sf, (__m512i)kMag3V);
}

template <int K>
__attribute__((always_inline)) inline void dec_step(DecGroup& G, int16_t* o) {
  const __m512i z = _mm512_setzero_si512();
  __m512i code;
  if constexpr (K <= 8) {
    code = _mm512_and_si512(_mm512_srli_epi32(G.whi, 25 - 3 * K),
                            _mm512_set1_epi32(7));
  } else if constexpr (K == 9) {
    code = _mm512_or_si512(
        _mm512_slli_epi32(_mm512_and_si512(G.whi, _mm512_set1_epi32(1)), 2),
        _mm512_srli_epi32(G.wlo, 30));
  } else {
    code = _mm512_and_si512(_mm512_srli_epi32(G.wlo, 57 - 3 * K),
                            _mm512_set1_epi32(7));
  }
  __m512i p = _mm512_srai_epi32(
      _mm512_add_epi32(
          _mm512_add_epi32(_mm512_mullo_epi32(G.W0, G.H0),
                           _mm512_mullo_epi32(G.W1, G.H1)),
          _mm512_add_epi32(_mm512_mullo_epi32(G.W2, G.H2),
                           _mm512_mullo_epi32(G.W3, G.H3))),
      13);
  const __mmask16 b0 = _mm512_test_epi32_mask(code, _mm512_set1_epi32(2));
  const __mmask16 b1 = _mm512_test_epi32_mask(code, _mm512_set1_epi32(4));
  const __mmask16 bneg = _mm512_test_epi32_mask(code, _mm512_set1_epi32(1));
  __m512i m = _mm512_mask_blend_epi32(
      b1, _mm512_mask_blend_epi32(b0, G.m0, G.m1),
      _mm512_mask_blend_epi32(b0, G.m2, G.m3));
  const __m512i dq = _mm512_mask_sub_epi32(m, bneg, z, m);
  const __m512i r = _mm512_max_epi32(
      _mm512_min_epi32(_mm512_add_epi32(p, dq), _mm512_set1_epi32(32767)),
      _mm512_set1_epi32(-32768));
  _mm256_storeu_si256((__m256i*)o, _mm512_cvtepi32_epi16(r));
  const __m512i d = _mm512_srai_epi32(dq, 4);
  const __m512i dn = _mm512_sub_epi32(z, d);
  G.W0 = _mm512_add_epi32(
      G.W0, _mm512_mask_blend_epi32(_mm512_movepi32_mask(G.H0), d, dn));
  G.W1 = _mm512_add_epi32(
      G.W1, _mm512_mask_blend_epi32(_mm512_movepi32_mask(G.H1), d, dn));
  G.W2 = _mm512_add_epi32(
      G.W2, _mm512_mask_blend_epi32(_mm512_movepi32_mask(G.H2), d, dn));
  G.W3 = _mm512_add_epi32(
      G.W3, _mm512_mask_blend_epi32(_mm512_movepi32_mask(G.H3), d, dn));
  G.H0 = G.H1;
  G.H1 = G.H2;
  G.H2 = G.H3;
  G.H3 = r;
}

}  // namespace

extern "C" void qoa_decode_chains_v2(const uint64_t* words_be,
                                     const int32_t* st, int64_t W,
                                     int64_t N, int16_t* out) {
  // N must be a multiple of 32 (two 16-chain groups in flight)
  for (int64_t g = 0; g + 32 <= N; g += 32) {
    DecGroup A, B;
    A.H0 = _mm512_loadu_si512((const void*)(st + 0 * N + g));
    B.H0 = _mm512_loadu_si512((const void*)(st + 0 * N + g + 16));
    A.H1 = _mm512_loadu_si512((const void*)(st + 1 * N + g));
    B.H1 = _mm512_loadu_si512((const void*)(st + 1 * N + g + 16));
    A.H2 = _mm512_loadu_si512((const void*)(st + 2 * N + g));
    B.H2 = _mm512_loadu_si512((const void*)(st + 2 * N + g + 16));
    A.H3 = _mm512_loadu_si512((const void*)(st + 3 * N + g));
    B.H3 = _mm512_loadu_si512((const void*)(st + 3 * N + g + 16));
    A.W0 = _mm512_loadu_si512((const void*)(st + 4 * N + g));
    B.W0 = _mm512_loadu_si512((const void*)(st + 4 * N + g + 16));
    A.W1 = _mm512_loadu_si512((const void*)(st + 5 * N + g));
    B.W1 = _mm512_loadu_si512((const void*)(st + 5 * N + g + 16));
    A.W2 = _mm512_loadu_si512((const void*)(st + 6 * N + g));
    B.W2 = _mm512_loadu_si512((const void*)(st + 6 * N + g + 16));
    A.W3 = _mm512_loadu_si512((const void*)(st + 7 * N + g));
    B.W3 = _mm512_loadu_si512((const void*)(st + 7 * N + g + 16));
    for (int64_t w = 0; w < W; ++w) {
      const uint64_t* row = words_be + w * N + g;
      dec_load_window(A, row);
      dec_load_window(B, row + 16);
      int16_t* o = out + w * kSliceLen * N + g;
#define QOA_DSTEP(K)                  \
  dec_step<K>(A, o + (int64_t)K * N); \
  dec_step<K>(B, o + (int64_t)K * N + 16)
      QOA_DSTEP(0); QOA_DSTEP(1); QOA_DSTEP(2); QOA_DSTEP(3); QOA_DSTEP(4);
      QOA_DSTEP(5); QOA_DSTEP(6); QOA_DSTEP(7); QOA_DSTEP(8); QOA_DSTEP(9);
      QOA_DSTEP(10); QOA_DSTEP(11); QOA_DSTEP(12); QOA_DSTEP(13);
      QOA_DSTEP(14); QOA_DSTEP(15); QOA_DSTEP(16); QOA_DSTEP(17);
      QOA_DSTEP(18); QOA_DSTEP(19);
#undef QOA_DSTEP
    }
  }
}
"""


def build():
    src = open(SRC).read()
    src += V2_SRC
    work = "/tmp/qoa_decfused.cpp"
    so = "/tmp/qoa_decfused.so"
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
    for fn in (lib.qoa_decode_chains, lib.qoa_decode_chains_v2):
        fn.argtypes = [p_u64, p_i32, i64, i64, p_i16]
        fn.restype = None
    return lib


def main():
    import sys
    sys.path.insert(0, os.path.join(HERE, ".."))
    from qoaudio_tpu import bitstream as bs
    from qoaudio_tpu.parallel import corpus

    lib = build()

    data = open(os.path.join(
        HERE, "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    p = bs.parse_file_arrays(data)
    N0 = p.n_frames * p.channels
    N = -(-N0 // 32) * 32
    W = p.max_windows
    words, state = corpus._stage_words_be([p], [0], W, N)
    words = np.ascontiguousarray(words)
    state = np.ascontiguousarray(state)

    def run(fn, out):
        t0 = time.perf_counter()
        fn(words, state, W, N, out)
        return time.perf_counter() - t0

    o0 = np.empty((W, 20, N), np.int16)
    o2 = np.empty((W, 20, N), np.int16)
    run(lib.qoa_decode_chains, o0)
    run(lib.qoa_decode_chains_v2, o2)
    assert np.array_equal(o0, o2), "fixture divergence!"

    # adversarial gate: random words + random i16 state, long chains so
    # the weights wander far outside i16 (wrap regimes)
    rng = np.random.default_rng(7)
    Wa, Na = 300, 64
    aw = rng.integers(0, 1 << 63, size=(Wa, Na), dtype=np.int64).astype(
        np.uint64
    )
    ast = rng.integers(-32768, 32768, size=(8, Na)).astype(np.int32)
    a0 = np.empty((Wa, 20, Na), np.int16)
    a2 = np.empty((Wa, 20, Na), np.int16)
    lib.qoa_decode_chains(np.ascontiguousarray(aw), np.ascontiguousarray(ast),
                          Wa, Na, a0)
    lib.qoa_decode_chains_v2(np.ascontiguousarray(aw),
                             np.ascontiguousarray(ast), Wa, Na, a2)
    assert np.array_equal(a0, a2), "adversarial divergence!"
    print("bit-exactness gates: fixture + adversarial random words")

    NREP = 12
    best0 = best2 = float("inf")
    for _ in range(NREP):
        best0 = min(best0, run(lib.qoa_decode_chains, o0))
        best2 = min(best2, run(lib.qoa_decode_chains_v2, o2))
    sps = W * 20 * N0
    print(f"  v0: {best0*1e3:6.2f} ms = {sps/best0/1e6:7.1f} Msps")
    print(f"  v2: {best2*1e3:6.2f} ms = {sps/best2/1e6:7.1f} Msps "
          f"({best0/best2:.3f}x vs v0)")


if __name__ == "__main__":
    main()
