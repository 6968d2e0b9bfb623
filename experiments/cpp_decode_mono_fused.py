"""Fused decode -> interleaved PCM for MONO streams (round 4).

The stereo fusion (experiments/cpp_decode_interleaved.py, 1.9-2.2x) maps
one stereo sample pair to one u32 column of the 20x32 tile.  For C == 1
the chains ARE frames, so after the same 16xu32 in-register transpose
each result register interleaves TWO frames' samples:

    r[k]  = [f_a s0, f_b s0, f_a s1, f_b s1, ..., f_a s15, f_b s15]
    tail  = [f_a s16, f_b s16, ..., f_a s19, f_b s19]   (8 int16 in segs)

Two vpermi2w per frame pair de-interleave those 40+8 int16 into the two
20-sample frame rows, stored with 20-lane masked stores at their final
positions (frame f, samples w*20..w*20+20).  Per frame that is one
vpermi2w + one masked store — the same store count as the stereo path.

Gates: bit-exact vs decode_chains+interleave_trim on (a) the fixture's
LEFT channel re-encoded as a mono stream and (b) adversarial
random-word/random-state chains.  Timing: same-process best-of-N of the
pair vs the fused kernel at the mono-fixture shape.

OUTCOME (2026-08-17): WIN, integrated.  Bit-exact on fixture-mono +
adversarial random-word gates first try.  Same-process best-of-16 at the
mono-fixture shape (W=256, N=448 after block rounding):
    v0 pair (decode_chains + interleave): 3.31 ms =  692.8 Msps
    v1 fused decode->mono PCM           : 1.62 ms = 1415.3 Msps  (2.04x)
Same mechanism as stereo: the (W,20,N) intermediate round-trip was the
cost; per frame the extra work vs stereo is one vpermi2w + a 20-lane
masked store instead of a full store + 128-bit tail store.
"""
import ctypes
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "qoaudio_tpu", "native", "qoa_kernels.cpp")

V1_SRC = r"""
// ---- experiment: fully-fused decode -> mono PCM ----
#ifdef QOA_FUSED_DECODE
namespace {

// Transpose a 20x32 int16 tile (20 sample steps x 32 mono frame columns,
// viewed as 16 u32 columns of frame PAIRS) and store each frame's 20
// samples at dst[j] (j = 0..31).
__attribute__((always_inline)) inline void tile_store_mono(
    const uint32_t* tile /* [20][16] */, int16_t* const* dst /* [32] */) {
  __m512i r[16];
  for (int i = 0; i < 16; ++i)
    r[i] = _mm512_loadu_si512((const void*)(tile + i * 16));
  __m512i a[16];
  for (int i = 0; i < 8; ++i) {
    a[2 * i] = _mm512_unpacklo_epi32(r[2 * i], r[2 * i + 1]);
    a[2 * i + 1] = _mm512_unpackhi_epi32(r[2 * i], r[2 * i + 1]);
  }
  for (int i = 0; i < 4; ++i) {
    r[4 * i + 0] = _mm512_unpacklo_epi64(a[4 * i + 0], a[4 * i + 2]);
    r[4 * i + 1] = _mm512_unpackhi_epi64(a[4 * i + 0], a[4 * i + 2]);
    r[4 * i + 2] = _mm512_unpacklo_epi64(a[4 * i + 1], a[4 * i + 3]);
    r[4 * i + 3] = _mm512_unpackhi_epi64(a[4 * i + 1], a[4 * i + 3]);
  }
  for (int i = 0; i < 2; ++i)
    for (int j = 0; j < 4; ++j) {
      a[8 * i + j] = _mm512_shuffle_i32x4(r[8 * i + j], r[8 * i + j + 4],
                                          0x88);
      a[8 * i + j + 4] = _mm512_shuffle_i32x4(r[8 * i + j],
                                              r[8 * i + j + 4], 0xdd);
    }
  for (int j = 0; j < 8; ++j) {
    r[j] = _mm512_shuffle_i32x4(a[j], a[j + 8], 0x88);
    r[j + 8] = _mm512_shuffle_i32x4(a[j], a[j + 8], 0xdd);
  }
  const __m512i t16 = _mm512_loadu_si512((const void*)(tile + 16 * 16));
  const __m512i t17 = _mm512_loadu_si512((const void*)(tile + 17 * 16));
  const __m512i t18 = _mm512_loadu_si512((const void*)(tile + 18 * 16));
  const __m512i t19 = _mm512_loadu_si512((const void*)(tile + 19 * 16));
  const __m512i u0 = _mm512_unpacklo_epi32(t16, t17);
  const __m512i u1 = _mm512_unpackhi_epi32(t16, t17);
  const __m512i v0 = _mm512_unpacklo_epi32(t18, t19);
  const __m512i v1 = _mm512_unpackhi_epi32(t18, t19);
  alignas(64) uint32_t segs[4][16];
  _mm512_store_si512((void*)segs[0], _mm512_unpacklo_epi64(u0, v0));
  _mm512_store_si512((void*)segs[1], _mm512_unpackhi_epi64(u0, v0));
  _mm512_store_si512((void*)segs[2], _mm512_unpacklo_epi64(u1, v1));
  _mm512_store_si512((void*)segs[3], _mm512_unpackhi_epi64(u1, v1));
  // de-interleave each frame pair: even int16 lanes of r[k] (+ even tail
  // lanes) = frame 2k, odd = frame 2k+1
  const __m512i kEven = _mm512_set_epi16(
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      32 + 6, 32 + 4, 32 + 2, 32 + 0,
      30, 28, 26, 24, 22, 20, 18, 16, 14, 12, 10, 8, 6, 4, 2, 0);
  const __m512i kOdd = _mm512_set_epi16(
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      32 + 7, 32 + 5, 32 + 3, 32 + 1,
      31, 29, 27, 25, 23, 21, 19, 17, 15, 13, 11, 9, 7, 5, 3, 1);
  const __mmask32 k20 = (1u << 20) - 1;
  for (int k = 0; k < 16; ++k) {
    // column k's 128-bit tail (steps 16..19 of the frame pair) sits at
    // offset (k >> 2) * 4 u32 inside segs[k & 3]
    const __m512i tl = _mm512_castsi128_si512(
        _mm_load_si128((const __m128i*)(segs[k & 3] + (k >> 2) * 4)));
    _mm512_mask_storeu_epi16(
        (void*)dst[2 * k], k20, _mm512_permutex2var_epi16(r[k], kEven, tl));
    _mm512_mask_storeu_epi16(
        (void*)dst[2 * k + 1], k20,
        _mm512_permutex2var_epi16(r[k], kOdd, tl));
  }
}

}  // namespace

extern "C" void qoa_decode_interleaved_mono(
    const uint64_t* words_be, const int32_t* st, int64_t W, int64_t N,
    int64_t spc /* == W*20 */, int16_t* out) {
  alignas(64) int16_t tile[20 * 32];
  for (int64_t g = 0; g + 32 <= N; g += 32) {
    DecGroup A, B;
    dec_load_state(A, st, N, g);
    dec_load_state(B, st, N, g + 16);
    for (int64_t w = 0; w < W; ++w) {
      const uint64_t* row = words_be + w * N + g;
      dec_load_window(A, row);
      dec_load_window(B, row + 16);
#define QOA_DSTEP(K)                      \
  dec_step<K>(A, tile + (int64_t)K * 32); \
  dec_step<K>(B, tile + (int64_t)K * 32 + 16)
      QOA_DSTEP(0); QOA_DSTEP(1); QOA_DSTEP(2); QOA_DSTEP(3); QOA_DSTEP(4);
      QOA_DSTEP(5); QOA_DSTEP(6); QOA_DSTEP(7); QOA_DSTEP(8); QOA_DSTEP(9);
      QOA_DSTEP(10); QOA_DSTEP(11); QOA_DSTEP(12); QOA_DSTEP(13);
      QOA_DSTEP(14); QOA_DSTEP(15); QOA_DSTEP(16); QOA_DSTEP(17);
      QOA_DSTEP(18); QOA_DSTEP(19);
#undef QOA_DSTEP
      int16_t* dst[32];
      for (int j = 0; j < 32; ++j)
        dst[j] = out + (g + j) * spc + w * 20;
      tile_store_mono(reinterpret_cast<const uint32_t*>(tile), dst);
    }
  }
}
#endif  // QOA_FUSED_DECODE
"""


def build():
    src = open(SRC).read()
    src += V1_SRC
    work = "/tmp/qoa_decmono.cpp"
    so = "/tmp/qoa_decmono.so"
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
    lib.qoa_decode_chains.argtypes = [p_u64, p_i32, i64, i64, p_i16]
    lib.qoa_decode_chains.restype = None
    lib.qoa_interleave.argtypes = [p_i16, i64, i64, i64, i64, p_i16]
    lib.qoa_interleave.restype = None
    lib.qoa_decode_interleaved_mono.argtypes = [
        p_u64, p_i32, i64, i64, i64, p_i16,
    ]
    lib.qoa_decode_interleaved_mono.restype = None
    return lib


def pair(lib, words, state, W, N, dec_buf, out):
    lib.qoa_decode_chains(words, state, W, N, dec_buf.reshape(-1))
    lib.qoa_interleave(dec_buf.reshape(-1), W, N, 1, N * W * 20,
                       out.reshape(-1))


def main():
    import sys
    sys.path.insert(0, os.path.join(HERE, ".."))
    from qoaudio_tpu import bitstream as bs, codec
    from qoaudio_tpu.types import QoaDesc

    lib = build()

    data = open(os.path.join(
        HERE, "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    st_out = codec.decode_all(data)
    left = st_out.samples.reshape(-1, 2)[:, 0].copy()
    mono = codec.encode_all(left, QoaDesc(1, 44100, len(left)))
    pa = bs.parse_file_arrays(mono)
    assert pa.channels == 1
    N0 = pa.n_frames
    N = N0 - (N0 % 32)
    W = pa.words_be.shape[0]
    words = np.ascontiguousarray(pa.words_be[:, :N])
    state = np.ascontiguousarray(pa.state[:, :N])
    spc = W * 20

    dec_buf = np.empty((W, 20, N), np.int16)
    o0 = np.empty(N * spc, np.int16)
    o1 = np.empty(N * spc, np.int16)
    pair(lib, words, state, W, N, dec_buf, o0)
    lib.qoa_decode_interleaved_mono(words, state, W, N, spc, o1)
    assert np.array_equal(o0, o1), "fixture-mono divergence!"

    rng = np.random.default_rng(19)
    Wa, Na = 40, 64
    aw = rng.integers(0, 1 << 63, size=(Wa, Na), dtype=np.int64).astype(
        np.uint64)
    ast = rng.integers(-32768, 32768, size=(8, Na)).astype(np.int32)
    spca = Wa * 20
    da = np.empty((Wa, 20, Na), np.int16)
    a0 = np.empty(Na * spca, np.int16)
    a1 = np.empty(Na * spca, np.int16)
    pair(lib, np.ascontiguousarray(aw), np.ascontiguousarray(ast), Wa, Na,
         da, a0)
    lib.qoa_decode_interleaved_mono(
        np.ascontiguousarray(aw), np.ascontiguousarray(ast), Wa, Na, spca, a1)
    assert np.array_equal(a0, a1), "adversarial divergence!"
    print("bit-exactness gates: fixture-mono + adversarial random words")

    best0 = best1 = float("inf")
    for _ in range(16):
        t0 = time.perf_counter()
        pair(lib, words, state, W, N, dec_buf, o0)
        best0 = min(best0, time.perf_counter() - t0)
        t0 = time.perf_counter()
        lib.qoa_decode_interleaved_mono(words, state, W, N, spc, o1)
        best1 = min(best1, time.perf_counter() - t0)
    sps = W * 20 * N
    print(f"  v0 pair : {best0*1e3:6.2f} ms = {sps/best0/1e6:7.1f} Msps")
    print(f"  v1 fused: {best1*1e3:6.2f} ms = {sps/best1/1e6:7.1f} Msps "
          f"({best0/best1:.3f}x vs pair)")


if __name__ == "__main__":
    main()
