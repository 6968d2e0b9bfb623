"""Test configuration.

Tests run on CPU with a virtual 8-device platform so that sharding tests
exercise real multi-device code paths without TPU hardware.  This must be
set before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env preselects the TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache: the encoder kernel's unrolled scan body is
# expensive to compile on CPU; cache it across test runs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

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
