"""Raw-bytes fused decode: eliminate the host parse gather (round 4).

After the decode->interleaved fusion, decode_all e2e is ~0.7 ms parse +
~2.5 ms kernel.  The parse cost is almost entirely gather_frames: a
strided scatter relayouting frame-major slice words into the (W, N)
chain cube (1.9 MB written + re-read by the kernel) plus the LMS gather.

But the kernel does not NEED the chain cube: in the frame layout the two
channels of window w are ADJACENT u64s (one slice per channel per
window, reference src/lib.rs:468-491), so a 16-chain group (8 stereo
frames) can assemble its two word vectors with 8x128-bit loads + 6
inserts straight from the file bytes — ~12 extra ops against ~680
compute ops per window-group.  LMS state loads once per 16-frame block
with a scalar gather (256 ops per ~164k decoded samples — noise).

This kernel reads the ORIGINAL file buffer: zero staging, zero parse
gather; the only remaining host work is the vectorized header
validation.  Experiment scope: C == 2, F_full %% 16 == 0 (production
integration routes the remainder + tail frame through the array-based
fused kernel).

Gates: bit-exact vs the production path (parse_file_arrays +
decode_interleaved_stereo) on the fixture's 16-aligned prefix and on a
synthetic re-encoded stream.  Timing: best-of-N of
(parse_file_arrays + array kernel) vs (validation-equivalent header scan
+ raw kernel).

OUTCOME (2026-08-17): WIN, integrated.  Bit-exact on the fixture prefix
AND adversarial random-word/wrap-LMS hand-built streams.  Same-process
best-of-16 full-pipeline timings (parse+kernel vs header-scan+raw),
three sessions:
    arrays: 3.71 / 4.56 / 4.31 ms   raw: 2.58 / 3.03 / 2.79 ms
    speedup: 1.44x / 1.50x / 1.54x  (raw ~1570-1840 Msps)
The win is exactly the parse gather it deletes (~0.7 ms: the strided
words scatter + LMS gather + the cube's DRAM round trip); the in-kernel
8x128-bit load merge costs ~12 ops against ~680 compute ops per
window-group.
"""
import ctypes
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "qoaudio_tpu", "native", "qoa_kernels.cpp")

RAW_SRC = r"""
// ---- experiment: raw-bytes fused stereo decode ----
#ifdef QOA_FUSED_DECODE
namespace {

// Merge 8 frames' (window-w, both-channels) u64 pairs into one vector,
// then finish exactly like dec_load_window (bswap + half-plane split +
// magnitude gather).
__attribute__((always_inline)) inline void dec_load_window_raw(
    DecGroup& G, const uint8_t* base, int64_t fstride) {
  __m512i a = _mm512_castsi128_si512(
      _mm_loadu_si128((const __m128i*)base));
  a = _mm512_inserti32x4(
      a, _mm_loadu_si128((const __m128i*)(base + fstride)), 1);
  a = _mm512_inserti32x4(
      a, _mm_loadu_si128((const __m128i*)(base + 2 * fstride)), 2);
  a = _mm512_inserti32x4(
      a, _mm_loadu_si128((const __m128i*)(base + 3 * fstride)), 3);
  __m512i b = _mm512_castsi128_si512(
      _mm_loadu_si128((const __m128i*)(base + 4 * fstride)));
  b = _mm512_inserti32x4(
      b, _mm_loadu_si128((const __m128i*)(base + 5 * fstride)), 1);
  b = _mm512_inserti32x4(
      b, _mm_loadu_si128((const __m128i*)(base + 6 * fstride)), 2);
  b = _mm512_inserti32x4(
      b, _mm_loadu_si128((const __m128i*)(base + 7 * fstride)), 3);
  a = bswap64x8(a);
  b = bswap64x8(b);
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

// One 16-frame block straight from frame bytes: scalar LMS gather once,
// then the fused per-window decode + in-register transpose store.
static void decode_raw_block16f_stereo(const uint8_t* frames,
                                       int64_t fstride, int64_t W,
                                       int64_t out_stride, int16_t* out) {
  alignas(64) int32_t st[8 * 32];
  for (int j = 0; j < 16; ++j) {
    const uint8_t* p = frames + j * fstride + 8;
    for (int c = 0; c < 2; ++c)
      for (int r = 0; r < 4; ++r) {
        const uint8_t* h = p + c * 16 + 2 * r;
        const uint8_t* wt = p + c * 16 + 8 + 2 * r;
        st[r * 32 + 2 * j + c] =
            (int32_t)(int16_t)((uint16_t(h[0]) << 8) | h[1]);
        st[(4 + r) * 32 + 2 * j + c] =
            (int32_t)(int16_t)((uint16_t(wt[0]) << 8) | wt[1]);
      }
  }
  DecGroup A, B;
  dec_load_state(A, st, 32, 0);
  dec_load_state(B, st, 32, 16);
  alignas(64) int16_t tile[20 * 32];
  const uint8_t* wbase = frames + 8 + 32;  // frame header u64 + 2x16B LMS
  for (int64_t w = 0; w < W; ++w) {
    const uint8_t* rowp = wbase + w * 16;
    dec_load_window_raw(A, rowp, fstride);
    dec_load_window_raw(B, rowp + 8 * fstride, fstride);
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
      dst[j] = out + j * out_stride + w * 40;
    tile_store_stereo(reinterpret_cast<const uint32_t*>(tile), dst);
  }
}

}  // namespace

extern "C" void qoa_decode_interleaved_stereo_raw(
    const uint8_t* data, int64_t offset, int64_t F_full, int64_t frame_bytes,
    int64_t W, int16_t* out) {
  const int64_t stride = W * 20 * 2;
  for (int64_t f = 0; f + 16 <= F_full; f += 16)
    decode_raw_block16f_stereo(data + offset + f * frame_bytes, frame_bytes,
                               W, stride, out + f * stride);
}
#endif  // QOA_FUSED_DECODE
"""


def build():
    src = open(SRC).read()
    src += RAW_SRC
    work = "/tmp/qoa_decraw.cpp"
    so = "/tmp/qoa_decraw.so"
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
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.qoa_decode_interleaved_stereo.argtypes = [p_u64, p_i32, i64, i64,
                                                  p_i16]
    lib.qoa_decode_interleaved_stereo.restype = None
    lib.qoa_decode_interleaved_stereo_raw.argtypes = [
        p_u8, i64, i64, i64, i64, p_i16,
    ]
    lib.qoa_decode_interleaved_stereo_raw.restype = None
    return lib


def main():
    import sys
    sys.path.insert(0, os.path.join(HERE, ".."))
    from qoaudio_tpu import bitstream as bs
    from qoaudio_tpu import format as fmt

    lib = build()

    data = open(os.path.join(
        HERE, "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    pa = bs.parse_file_arrays(data)
    assert pa.channels == 2
    W = pa.words_be.shape[0]
    spc = W * 20
    F16 = (pa.n_frames - 1) // 16 * 16  # full frames only, 16-aligned
    frame_bytes = fmt.qoa_frame_size(2, W)
    buf = np.frombuffer(data, np.uint8)

    # production path: parse + array kernel (prefix slice for comparison)
    words = np.ascontiguousarray(pa.words_be[:, : F16 * 2])
    state = np.ascontiguousarray(pa.state[:, : F16 * 2])
    o0 = np.empty((F16 * spc, 2), np.int16)
    o1 = np.empty((F16 * spc, 2), np.int16)
    lib.qoa_decode_interleaved_stereo(words, state, W, F16 * 2,
                                      o0.reshape(-1))
    lib.qoa_decode_interleaved_stereo_raw(buf, 8, F16, frame_bytes, W,
                                          o1.reshape(-1))
    assert np.array_equal(o0, o1), "fixture divergence!"
    print(f"bit-exactness gate: fixture ({F16} frames)")

    # adversarial gate: random words + wrap-regime LMS, hand-built frames
    rng = np.random.default_rng(29)
    Wa, Fa = 6, 32
    spca = Wa * 20
    frames = []
    for _ in range(Fa):
        w = rng.integers(0, 1 << 63, size=(Wa, 2), dtype=np.int64).astype(
            np.uint64) | (
            rng.integers(0, 16, size=(Wa, 2), dtype=np.uint64) << np.uint64(60))
        hist = rng.integers(-32768, 32768, (2, 4)).astype(np.int32)
        wts = rng.choice(
            np.array([-32768, -16384, 16383, 32767], np.int32), size=(2, 4))
        frames.append(bs.build_frame_bytes(2, 44100, spca, hist, wts, w))
    adv = fmt.pack_file_header(spca * Fa) + b"".join(frames)
    pa2 = bs.parse_file_arrays(adv)
    fb2 = fmt.qoa_frame_size(2, Wa)
    a0 = np.empty((Fa * spca, 2), np.int16)
    a1 = np.empty((Fa * spca, 2), np.int16)
    lib.qoa_decode_interleaved_stereo(
        np.ascontiguousarray(pa2.words_be), np.ascontiguousarray(pa2.state),
        Wa, Fa * 2, a0.reshape(-1))
    lib.qoa_decode_interleaved_stereo_raw(
        np.frombuffer(adv, np.uint8), 8, Fa, fb2, Wa, a1.reshape(-1))
    assert np.array_equal(a0, a1), "adversarial divergence!"
    print("bit-exactness gate: adversarial random words + wrap-regime LMS")

    # timing: full pipelines at the fixture shape
    best_arr = best_raw = float("inf")
    for _ in range(16):
        t0 = time.perf_counter()
        p2 = bs.parse_file_arrays(data)
        w2 = np.ascontiguousarray(p2.words_be[:, : F16 * 2])
        s2 = np.ascontiguousarray(p2.state[:, : F16 * 2])
        lib.qoa_decode_interleaved_stereo(w2, s2, W, F16 * 2, o0.reshape(-1))
        best_arr = min(best_arr, time.perf_counter() - t0)
        t0 = time.perf_counter()
        # raw path host work: header-uniformity scan (same validation)
        hdrs = np.frombuffer(
            data, dtype=">u8", count=F16 * (frame_bytes // 8), offset=8
        ).reshape(F16, frame_bytes // 8)[:, 0]
        assert bool((hdrs == hdrs[0]).all())
        lib.qoa_decode_interleaved_stereo_raw(buf, 8, F16, frame_bytes, W,
                                              o1.reshape(-1))
        best_raw = min(best_raw, time.perf_counter() - t0)
    sps = F16 * spc * 2
    print(f"  arrays (parse+kernel): {best_arr*1e3:6.2f} ms = "
          f"{sps/best_arr/1e6:7.1f} Msps")
    print(f"  raw bytes            : {best_raw*1e3:6.2f} ms = "
          f"{sps/best_raw/1e6:7.1f} Msps ({best_arr/best_raw:.3f}x)")


if __name__ == "__main__":
    main()
