"""Fully-fused decode -> interleaved PCM (round 4).

After the register-resident fused kernel + mallopt, decode_all e2e is
parse ~1.0 ms + kernel ~2.9 ms + interleave ~2.2 ms.  The interleave
term is DRAM-bound: the (W, 20, N) intermediate is written (9.6 MB) and
re-read (9.6 MB) purely to transpose chain-major samples to interleaved
frame-major PCM.

v3 here eliminates the intermediate: each 32-chain block stores its 20
per-step int16 vectors to a 20x32 L1 stack tile; after the window, an
in-register 16xu32 transpose network (treating a stereo sample pair as
one u32 column) turns the tile into 16 frame rows of 40 int16, stored
straight to their final interleaved positions (frame f, samples
w*20..w*20+20).  C=2 only in this experiment (the dominant case; C=1 is
the same with u16 columns).  Uniform frames, window-aligned spc, full
tail frame — the fixture shape; production integration would mask the
final window / fall back for the ragged cases.

Gates: bit-exact vs decode_chains+interleave_trim on (a) the fixture
and (b) random-word/random-state streams (wrap regimes).  Timing:
same-process best-of-N of the PAIR (decode+interleave) vs v3 at the
fixture shape.

OUTCOME (2026-08-17): WIN, integrated.  Bit-exact on fixture +
adversarial random-word gates after fixing the lane-order remap (the
unpack32/unpack64/shuffle128 stage order lands lanes in IDENTITY order;
the bit-reversal guess was wrong — pattern-tested).  Same-process
best-of-16 at the fixture shape, three sessions:
    v0 pair (decode_chains + interleave): 5.22 / 5.95 / 6.20 ms
    v3 fused decode->interleaved        : 2.71 / 2.75 / 3.16 ms
    speedup: 1.92x / 2.17x / 1.96x
The (W,20,N) intermediate round-trip (2 x 9.6 MB of DRAM traffic at the
fixture) was the cost; the 20x32 L1 tile + in-register 16xu32 transpose
replaces it with stores straight to final interleaved positions.
"""
import ctypes
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "qoaudio_tpu", "native", "qoa_kernels.cpp")

V3_SRC = r"""
// ---- experiment: fully-fused decode -> interleaved stereo PCM ----
#ifdef QOA_FUSED_DECODE
namespace {

// Transpose a 20x16 u32 tile (20 sample steps x 16 stereo column-pairs)
// to 16 frame rows of 20 u32 and store each at its interleaved
// destination (frame j's samples w*20..w*20+20).  Rows 0..15 go through
// the standard 16x16 unpack/permute network; rows 16..19 transpose as a
// 4x16 block appended per frame row.
__attribute__((always_inline)) inline void tile_store_stereo(
    const uint32_t* tile /* [20][16] */, int16_t* const* dst /* [16] */) {
  __m512i r[16];
  for (int i = 0; i < 16; ++i)
    r[i] = _mm512_loadu_si512((const void*)(tile + i * 16));
  // stage 1: 32-bit unpack
  __m512i a[16];
  for (int i = 0; i < 8; ++i) {
    a[2 * i] = _mm512_unpacklo_epi32(r[2 * i], r[2 * i + 1]);
    a[2 * i + 1] = _mm512_unpackhi_epi32(r[2 * i], r[2 * i + 1]);
  }
  // stage 2: 64-bit unpack
  for (int i = 0; i < 4; ++i) {
    r[4 * i + 0] = _mm512_unpacklo_epi64(a[4 * i + 0], a[4 * i + 2]);
    r[4 * i + 1] = _mm512_unpackhi_epi64(a[4 * i + 0], a[4 * i + 2]);
    r[4 * i + 2] = _mm512_unpacklo_epi64(a[4 * i + 1], a[4 * i + 3]);
    r[4 * i + 3] = _mm512_unpackhi_epi64(a[4 * i + 1], a[4 * i + 3]);
  }
  // stage 3: 128-bit lanes
  for (int i = 0; i < 2; ++i)
    for (int j = 0; j < 4; ++j) {
      a[8 * i + j] = _mm512_shuffle_i32x4(r[8 * i + j], r[8 * i + j + 4],
                                          0x88);
      a[8 * i + j + 4] = _mm512_shuffle_i32x4(r[8 * i + j],
                                              r[8 * i + j + 4], 0xdd);
    }
  // stage 4: 256-bit halves
  for (int j = 0; j < 8; ++j) {
    r[j] = _mm512_shuffle_i32x4(a[j], a[j + 8], 0x88);
    r[j + 8] = _mm512_shuffle_i32x4(a[j], a[j + 8], 0xdd);
  }
  // r[k] now holds column k of rows 0..15 (verified by pattern test: the
  // unpack32/unpack64/shuffle128 stage order lands lanes in identity
  // order, no bit-reversal remap needed).
  // rows 16..19 -> per-column 4xu32 segments, via a 4x16 gather of the
  // tail rows with masked 128-bit extracts (cheap: 4 loads + shuffles)
  const __m512i t16 = _mm512_loadu_si512((const void*)(tile + 16 * 16));
  const __m512i t17 = _mm512_loadu_si512((const void*)(tile + 17 * 16));
  const __m512i t18 = _mm512_loadu_si512((const void*)(tile + 18 * 16));
  const __m512i t19 = _mm512_loadu_si512((const void*)(tile + 19 * 16));
  const __m512i u0 = _mm512_unpacklo_epi32(t16, t17);  // cols 0,1,4,5,8,9,12,13
  const __m512i u1 = _mm512_unpackhi_epi32(t16, t17);  // cols 2,3,6,7,10,11,14,15
  const __m512i v0 = _mm512_unpacklo_epi32(t18, t19);
  const __m512i v1 = _mm512_unpackhi_epi32(t18, t19);
  const __m512i w0 = _mm512_unpacklo_epi64(u0, v0);  // col 0,4,8,12 segs
  const __m512i w1 = _mm512_unpackhi_epi64(u0, v0);  // col 1,5,9,13
  const __m512i w2 = _mm512_unpacklo_epi64(u1, v1);  // col 2,6,10,14
  const __m512i w3 = _mm512_unpackhi_epi64(u1, v1);  // col 3,7,11,15
  alignas(64) uint32_t segs[4][16];
  _mm512_store_si512((void*)segs[0], w0);
  _mm512_store_si512((void*)segs[1], w1);
  _mm512_store_si512((void*)segs[2], w2);
  _mm512_store_si512((void*)segs[3], w3);
  for (int k = 0; k < 16; ++k) {
    const int col = k;
    int16_t* o = dst[col];
    _mm512_storeu_si512((void*)o, r[k]);
    // tail 4 u32: segs[col % 4][(col / 4) * 4 .. +4]
    _mm_storeu_si128((__m128i*)(o + 32),
                     _mm_loadu_si128((const __m128i*)(
                         segs[col & 3] + (col >> 2) * 4)));
  }
}

}  // namespace

extern "C" void qoa_decode_interleaved_stereo(
    const uint64_t* words_be, const int32_t* st, int64_t W, int64_t N,
    int64_t spc /* samples per frame, == W*20 here */, int16_t* out) {
  // N % 32 == 0, C == 2, window-aligned uniform frames (experiment scope)
  alignas(64) int16_t tile[20 * 32];
  for (int64_t g = 0; g + 32 <= N; g += 32) {
    DecGroup A, B;
    dec_load_state(A, st, N, g);
    dec_load_state(B, st, N, g + 16);
    const int64_t f_base = g / 2;  // first stereo frame of this block
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
      int16_t* dst[16];
      for (int j = 0; j < 16; ++j)
        dst[j] = out + ((f_base + j) * spc + w * 20) * 2;
      tile_store_stereo(reinterpret_cast<const uint32_t*>(tile), dst);
    }
  }
}
#endif  // QOA_FUSED_DECODE
"""


def build():
    src = open(SRC).read()
    src += V3_SRC
    work = "/tmp/qoa_decilv.cpp"
    so = "/tmp/qoa_decilv.so"
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
    lib.qoa_decode_interleaved_stereo.argtypes = [
        p_u64, p_i32, i64, i64, i64, p_i16,
    ]
    lib.qoa_decode_interleaved_stereo.restype = None
    return lib


def pair(lib, words, state, W, N, dec_buf, out):
    lib.qoa_decode_chains(words, state, W, N, dec_buf.reshape(-1))
    F = N // 2
    lib.qoa_interleave(dec_buf.reshape(-1), W, F, 2, F * W * 20,
                       out.reshape(-1))


def main():
    import sys
    sys.path.insert(0, os.path.join(HERE, ".."))
    from qoaudio_tpu import bitstream as bs

    lib = build()

    data = open(os.path.join(
        HERE, "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    pa = bs.parse_file_arrays(data)
    assert pa.channels == 2
    N0 = pa.n_frames * 2
    N = N0 - (N0 % 32)  # experiment scope: whole blocks only
    W = pa.words_be.shape[0]
    words = np.ascontiguousarray(pa.words_be[:, :N])
    state = np.ascontiguousarray(pa.state[:, :N])
    F = N // 2
    spc = W * 20

    dec_buf = np.empty((W, 20, N), np.int16)
    o0 = np.empty((F * spc, 2), np.int16)
    o3 = np.empty((F * spc, 2), np.int16)
    pair(lib, words, state, W, N, dec_buf, o0)
    lib.qoa_decode_interleaved_stereo(words, state, W, N, spc, o3.reshape(-1))
    assert np.array_equal(o0, o3), "fixture divergence!"

    rng = np.random.default_rng(11)
    Wa, Na = 40, 64
    aw = rng.integers(0, 1 << 63, size=(Wa, Na), dtype=np.int64).astype(
        np.uint64)
    ast = rng.integers(-32768, 32768, size=(8, Na)).astype(np.int32)
    Fa, spca = Na // 2, Wa * 20
    da = np.empty((Wa, 20, Na), np.int16)
    a0 = np.empty((Fa * spca, 2), np.int16)
    a3 = np.empty((Fa * spca, 2), np.int16)
    pair(lib, np.ascontiguousarray(aw), np.ascontiguousarray(ast), Wa, Na,
         da, a0)
    lib.qoa_decode_interleaved_stereo(
        np.ascontiguousarray(aw), np.ascontiguousarray(ast), Wa, Na, spca,
        a3.reshape(-1))
    assert np.array_equal(a0, a3), "adversarial divergence!"
    print("bit-exactness gates: fixture + adversarial random words")

    best0 = best3 = float("inf")
    for _ in range(16):
        t0 = time.perf_counter()
        pair(lib, words, state, W, N, dec_buf, o0)
        best0 = min(best0, time.perf_counter() - t0)
        t0 = time.perf_counter()
        lib.qoa_decode_interleaved_stereo(words, state, W, N, spc,
                                          o3.reshape(-1))
        best3 = min(best3, time.perf_counter() - t0)
    sps = W * 20 * N
    print(f"  v0 pair : {best0*1e3:6.2f} ms = {sps/best0/1e6:7.1f} Msps")
    print(f"  v3 fused: {best3*1e3:6.2f} ms = {sps/best3/1e6:7.1f} Msps "
          f"({best0/best3:.3f}x vs pair)")


if __name__ == "__main__":
    main()
