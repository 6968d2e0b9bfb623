"""Fine-grained attribution of the encoder's argmin+straggler+writeback
phase (round-4 follow-up; the phase is ~26% after the chain rewrite).

Splits the per-window tail into:
  3a  argmin_halves vector reductions (hws loop)
  3b  wrap-flag check + winner ScalarLane materialization
  3c  straggler qualification + scalar straggler scans
  3d  word/state writeback

Anchors target the CURRENT (post-mask-rewrite) qoa_kernels.cpp.
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
WORK = "/tmp/qoa_prof3.cpp"
SO = "/tmp/qoa_prof3.so"


def build():
    src = open(SRC).read()
    src = src.replace(
        "int64_t g_fallback_count = 0;",
        """int64_t g_fallback_count = 0;
#include <x86intrin.h>
uint64_t g_prof[8] = {0,0,0,0,0,0,0,0};
#define PROF_T(i) { uint64_t _now = __rdtsc(); g_prof[i] += _now - _last; _last = _now; }""",
    )
    # start the clock at the winners section
    src = src.replace(
        """    // ---- winners: one vectorized lexicographic argmin per pair vector
    //      (both channels at once), then per-channel stragglers ----
    HalfWin hws[NV];""",
        """    // ---- winners: one vectorized lexicographic argmin per pair vector
    //      (both channels at once), then per-channel stragglers ----
    uint64_t _last = __rdtsc();
    HalfWin hws[NV];""",
    )
    src = src.replace(
        """    for (int c = 0; c < C; ++c) {
      const Cont16& S = K[c / 2];
      const int base = (c & 1) ? 8 : 0;""",
        """    PROF_T(0)
    for (int c = 0; c < C; ++c) {
      const Cont16& S = K[c / 2];
      const int base = (c & 1) ? 8 : 0;""",
    )
    src = src.replace(
        """      // Stragglers: a pruned lane can still win if its first-sample rank""",
        """      PROF_T(1)
      // Stragglers: a pruned lane can still win if its first-sample rank""",
    )
    src = src.replace(
        """    no_stragglers:
      words[w * C + c] = B.word;""",
        """    no_stragglers:
      PROF_T(2)
      words[w * C + c] = B.word;""",
    )
    src = src.replace(
        """      state[6 * C + c] = B.w2;
      state[7 * C + c] = B.w3;
    }
  }
}""",
        """      state[6 * C + c] = B.w2;
      state[7 * C + c] = B.w3;
      PROF_T(3)
    }
  }
}""",
    )
    src = src.replace(
        "int64_t qoa_encode_fallbacks(void) { return g_fallback_count; }",
        """int64_t qoa_encode_fallbacks(void) { return g_fallback_count; }
void qoa_prof_read(uint64_t* out) { for (int i = 0; i < 8; ++i) out[i] = g_prof[i]; }""",
    )
    open(WORK, "w").write(src)
    subprocess.run(
        ["g++", "-O3", "-march=native", "-mprefer-vector-width=512",
         "-fno-strict-aliasing", "-shared", "-fPIC", "-o", SO, WORK],
        check=True,
    )


def main():
    build()
    from qoaudio_tpu import codec, native

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

    lib = ctypes.CDLL(SO)
    i64 = ctypes.c_int64
    p_i16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_u64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.qoa_encode_file.argtypes = [p_i16, p_i32, i64, i64, i64, p_i32, p_u64, p_i32]
    lib.qoa_prof_read.argtypes = [p_u64]

    def init_state():
        st = np.zeros((8, C), np.int32)
        st[6] = -(1 << 13)
        st[7] = 1 << 14
        return np.ascontiguousarray(st)

    words = np.zeros((W, C), np.uint64)
    snaps = np.empty((-(-W // 256), 8, C), np.int32)
    best = 1e9
    for _ in range(8):
        st = init_state()
        t0 = time.perf_counter()
        lib.qoa_encode_file(pcm, lens, W, C, 256, st, words, snaps)
        best = min(best, time.perf_counter() - t0)
    prof = np.zeros(8, np.uint64)
    lib.qoa_prof_read(prof)
    total_cyc = prof.sum()
    print(f"best e2e kernel: {best*1e3:.1f} ms = {spc*2/best/1e6:.1f} Msps")
    n_runs = 8
    for n, v in zip(
        ["3a argmin_halves", "3b wrapchk+B-mat", "3c stragglers", "3d writeback"],
        prof[:4],
    ):
        print(f"  {n:18s} {v/total_cyc*100:5.1f}%  "
              f"({v/n_runs/(W*1.0):5.1f} cyc/window avg)")
    st2 = init_state()
    w2, _ = native.encode_file(pcm, lens, W, 256, st2)
    print("bit-exact vs repo engine:", np.array_equal(words, w2))


if __name__ == "__main__":
    main()
