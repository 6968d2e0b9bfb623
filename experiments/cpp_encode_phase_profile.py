"""C++ encoder phase attribution (round-4 experiment).

Builds a copy of native/qoa_kernels.cpp with rdtsc counters around the
four phases of the per-window encode and runs the full fixture encode.

OUTCOME (2026-08-17, fixture, stereo, bit-exact vs the repo engine):
  sample-0 full-16 + pairwise selection   9.3%
  Cont16 gather/pack                      8.4%
  19-step continuation chain             60.9%
  argmin + stragglers + writeback        21.4%
The 19-step chain is a true serial latency recurrence; there is no
barrier between a window's argmin/straggler phase and the next window's
sample-0 work, so the out-of-order core already overlaps them — the
round-3 "speculate the previous scalefactor" idea has nothing to hide
and was closed (see CLAUDE.md).
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
WORK = "/tmp/qoa_prof_exp.cpp"
SO = "/tmp/qoa_prof_exp.so"


def build():
    src = open(SRC).read()
    src = src.replace(
        "int64_t g_fallback_count = 0;",
        """int64_t g_fallback_count = 0;
#include <x86intrin.h>
uint64_t g_prof[5] = {0,0,0,0,0};
#define PROF_T(i) { uint64_t _now = __rdtsc(); g_prof[i] += _now - _last; _last = _now; }""",
    )
    src = src.replace(
        """    const int len = lens[w];
    if (len <= 0) continue;
    const int16_t* xw = x + w * kSliceLen * C;""",
        """    const int len = lens[w];
    if (len <= 0) continue;
    const int16_t* xw = x + w * kSliceLen * C;
    uint64_t _last = __rdtsc();""",
    )
    src = src.replace(
        "    // ---- blend the survivors of channel pairs",
        "    PROF_T(0)\n    // ---- blend the survivors of channel pairs",
    )
    src = src.replace(
        "    // ---- continuation: samples 1..len-1",
        "    PROF_T(1)\n    // ---- continuation: samples 1..len-1",
    )
    src = src.replace(
        "    // ---- winners: one vectorized lexicographic argmin",
        "    PROF_T(2)\n    // ---- winners: one vectorized lexicographic argmin",
    )
    src = src.replace(
        """      state[6 * C + c] = B.w2;
      state[7 * C + c] = B.w3;
    }
  }
}""",
        """      state[6 * C + c] = B.w2;
      state[7 * C + c] = B.w3;
    }
    PROF_T(3)
  }
}""",
    )
    src = src.replace(
        "int64_t qoa_encode_fallbacks(void) { return g_fallback_count; }",
        """int64_t qoa_encode_fallbacks(void) { return g_fallback_count; }
void qoa_prof_read(uint64_t* out) { for (int i = 0; i < 5; ++i) out[i] = g_prof[i]; }""",
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
    pcm = out.samples.reshape(-1, 2)
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
        lib.qoa_encode_file(np.ascontiguousarray(pcm), lens, W, C, 256, st, words, snaps)
        best = min(best, time.perf_counter() - t0)
    prof = np.zeros(5, np.uint64)
    lib.qoa_prof_read(prof)
    total = prof.sum()
    print(f"best e2e kernel: {best*1e3:.1f} ms = {spc*2/best/1e6:.1f} Msps")
    for n, v in zip(
        ["sample0+pairsel", "gather/pack", "19-step chain", "argmin+straggler+wb"],
        prof[:4],
    ):
        print(f"  {n:22s} {v/total*100:5.1f}%")
    st2 = init_state()
    w2, _ = native.encode_file(pcm, lens, W, 256, st2)
    print("bit-exact vs repo engine:", np.array_equal(words, w2))


if __name__ == "__main__":
    main()
