"""Frame-axis blocking for the chain->interleaved transpose (round 4).

After the fused decode kernel, interleave_trim is a peer of the kernel
itself in decode_all's attribution (~3 ms each at the fixture shape).
The shipped transpose_trim blocks only the time axis (B=64 t-steps, all
F frames): per t-block the reads touch ~64 x F/16 = ~1900 cache lines
(~120 KB for the fixture's F=936 u32 chain-pair columns) — spilling L1,
so every line is refetched from L2 per t-block.

v2 adds frame-axis blocking (BF=64): the per-tile working set drops to
64t x 4 lines reads + 64f x 4 lines writes = ~32 KB, L1-resident.

Gates: bit-exact vs the shipped qoa_interleave on the fixture layout and
on random shapes incl. trimmed tails.  Timing: same-process interleaved
best-of-N at the fixture shape.

OUTCOME (2026-08-17): WASH — v2 0.984x vs v0 at the fixture shape (2.19
vs 2.22 ms best-of-16, same process, gates bit-exact on fixture + 20
random shapes).  The transpose is not L1-miss bound here.  The run DID
expose that reusing output buffers makes interleave ~2.2 ms where the
bench attribution (fresh allocation per call) showed 2.9-3.4 ms — which
led to the real fix: glibc mmap page-fault overhead on every large
buffer, removed process-wide via native._tune_allocator (mallopt).  NOT
integrated; anchored at commit 741d36e.
"""
import ctypes
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "qoaudio_tpu", "native", "qoa_kernels.cpp")

V2_SRC = r"""
// ---- experiment: frame-blocked transpose_trim ----
namespace {
template <typename E>
static void transpose_trim_v2(const E* __restrict__ in, int64_t rows,
                              int64_t F, int64_t total, E* __restrict__ out) {
  constexpr int64_t B = 64, BF = 64;
  for (int64_t t0 = 0; t0 < rows; t0 += B) {
    const int64_t t1 = t0 + B < rows ? t0 + B : rows;
    for (int64_t f0 = 0; f0 < F; f0 += BF) {
      const int64_t f1 = f0 + BF < F ? f0 + BF : F;
      for (int64_t f = f0; f < f1; ++f) {
        const int64_t left = total - f * rows;
        if (left <= t0) continue;
        const int64_t te = t1 < left ? t1 : left;
        E* __restrict__ dst = out + f * rows;
        const E* __restrict__ src = in + f;
        for (int64_t t = t0; t < te; ++t) dst[t] = src[t * F];
      }
    }
  }
}
}  // namespace

extern "C" void qoa_interleave_v2(const int16_t* in, int64_t W, int64_t F,
                                  int64_t C, int64_t total, int16_t* out) {
  const int64_t rows = W * kSliceLen;
  switch (C) {
    case 1:
      transpose_trim_v2(reinterpret_cast<const uint16_t*>(in), rows, F, total,
                        reinterpret_cast<uint16_t*>(out));
      break;
    case 2:
      transpose_trim_v2(reinterpret_cast<const uint32_t*>(in), rows, F, total,
                        reinterpret_cast<uint32_t*>(out));
      break;
    case 4:
      transpose_trim_v2(reinterpret_cast<const uint64_t*>(in), rows, F, total,
                        reinterpret_cast<uint64_t*>(out));
      break;
    default:
      transpose_trim_generic(in, rows, F, C, total, out);
  }
}
"""


def build():
    src = open(SRC).read()
    src += V2_SRC
    work = "/tmp/qoa_ilv.cpp"
    so = "/tmp/qoa_ilv.so"
    open(work, "w").write(src)
    subprocess.run(
        ["g++", "-O3", "-march=native", "-mprefer-vector-width=512",
         "-fno-strict-aliasing", "-shared", "-fPIC", "-o", so, work],
        check=True,
    )
    lib = ctypes.CDLL(so)
    i64 = ctypes.c_int64
    p_i16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    for fn in (lib.qoa_interleave, lib.qoa_interleave_v2):
        fn.argtypes = [p_i16, i64, i64, i64, i64, p_i16]
        fn.restype = None
    return lib


def main():
    import sys
    sys.path.insert(0, os.path.join(HERE, ".."))
    from qoaudio_tpu import bitstream as bs
    from qoaudio_tpu import native

    lib = build()

    data = open(os.path.join(
        HERE, "..", "tests", "fixtures", "julien_baker_sprained_ankle.qoa",
    ), "rb").read()
    pa = bs.parse_file_arrays(data)
    dec = native.decode_chains(pa.words_be, pa.state)
    F, C, W = pa.n_frames, pa.channels, dec.shape[0]
    total = int(pa.samples_per_frame.sum())
    dec = np.ascontiguousarray(dec)

    o0 = np.empty((total, C), np.int16)
    o2 = np.empty((total, C), np.int16)
    lib.qoa_interleave(dec.reshape(-1), W, F, C, total, o0.reshape(-1))
    lib.qoa_interleave_v2(dec.reshape(-1), W, F, C, total, o2.reshape(-1))
    assert np.array_equal(o0, o2), "fixture divergence!"

    rng = np.random.default_rng(3)
    for _ in range(20):
        Wr = int(rng.integers(1, 40))
        Fr = int(rng.integers(1, 50))
        Cr = int(rng.choice([1, 2, 4, 3]))
        rows = Wr * 20
        tot = int(rng.integers((Fr - 1) * rows + 1, Fr * rows + 1))
        d = rng.integers(-32768, 32768, size=(Wr, 20, Fr * Cr)).astype(np.int16)
        a = np.empty((tot, Cr), np.int16)
        b = np.empty((tot, Cr), np.int16)
        lib.qoa_interleave(d.reshape(-1), Wr, Fr, Cr, tot, a.reshape(-1))
        lib.qoa_interleave_v2(d.reshape(-1), Wr, Fr, Cr, tot, b.reshape(-1))
        assert np.array_equal(a, b), f"random divergence W={Wr} F={Fr} C={Cr}"
    print("bit-exactness gates: fixture + 20 random shapes")

    def run(fn, out):
        t0 = time.perf_counter()
        fn(dec.reshape(-1), W, F, C, total, out.reshape(-1))
        return time.perf_counter() - t0

    best0 = best2 = float("inf")
    for _ in range(16):
        best0 = min(best0, run(lib.qoa_interleave, o0))
        best2 = min(best2, run(lib.qoa_interleave_v2, o2))
    print(f"  v0: {best0*1e3:6.2f} ms")
    print(f"  v2: {best2*1e3:6.2f} ms ({best0/best2:.3f}x vs v0)")


if __name__ == "__main__":
    main()
