"""Test configuration.

Tests run on the plain SINGLE-device CPU client.  Do NOT provision a
multi-device virtual CPU client here: on a 1-core host the multi-device
CPU client costs ~1 ms of cross-thread handoff PER XLA OP (measured:
the encoder slice body runs in 0.3 ms on the 1-device client and ~1,300 ms
on the 8-device client), which made round 1's suite unrunnable.
Multi-device sharding semantics are tested on a 1-device mesh in-process,
and on a real virtual 8-device client in a SUBPROCESS with a tiny graph
(tests/test_parallel.py::test_multichip_dryrun_subprocess, which drives
the same code path the driver's dryrun uses).
"""

import os
import sys

# Do NOT enable the persistent compilation cache here: serializing the
# encoder's unrolled-scan executable hangs for minutes (measured: the
# compile takes 11 s, the cache write does not finish in 400 s) — it was
# the actual cause of round 1's unrunnable suite.  Instead the kernels are
# padded to canonical shapes (codec._CHUNK_LADDER / _CANON_CHAINS) so the
# whole suite shares a handful of in-process compiles.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The host image's sitecustomize registers the remote-TPU ("axon") platform
# via jax.config, which overrides JAX_PLATFORMS from the environment — force
# the config back to CPU before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

FIXTURE_PATH = "/root/reference/fixtures/julien_baker_sprained_ankle.qoa"

# Fixture geometry, independently verified by a frame walk (see SURVEY.md §0).
FIXTURE_SAMPLES_PER_CHANNEL = 2_394_122
FIXTURE_CHANNELS = 2
FIXTURE_SAMPLE_RATE = 44_100
FIXTURE_FRAMES = 468
FIXTURE_LAST_FRAME_SAMPLES = 3_082


@pytest.fixture(scope="session")
def fixture_bytes():
    if not os.path.exists(FIXTURE_PATH):
        pytest.skip("reference fixture not available")
    with open(FIXTURE_PATH, "rb") as f:
        return f.read()


def make_sine(samples_per_channel, channels=1, freq=440.0, rate=44100):
    """Deterministic test signal: sine (+ cosine for ch 2, etc.)."""
    t = np.arange(samples_per_channel, dtype=np.float64) / rate
    chans = []
    for c in range(channels):
        phase = c * np.pi / 2
        chans.append(
            (np.sin(2 * np.pi * freq * t + phase) * 16384.0).astype(np.int16)
        )
    return np.stack(chans, axis=-1).reshape(-1)  # interleaved


def make_noise(samples_per_channel, channels=1, seed=0, amplitude=30000):
    rng = np.random.default_rng(seed)
    return rng.integers(
        -amplitude, amplitude, size=samples_per_channel * channels
    ).astype(np.int16)


@pytest.fixture
def sine_mono():
    return make_sine(4410, 1)


@pytest.fixture
def sine_stereo():
    return make_sine(4410, 2)
