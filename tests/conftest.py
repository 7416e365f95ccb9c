"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so pjit/shard_map
mesh code paths are exercised without TPU hardware (the pattern the
reference lacks entirely — see SURVEY.md §4).  Must run before any jax
import in the test process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize pins jax to the TPU backend; force CPU for tests
# (config.update wins over the pinned platform).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent XLA compilation cache: repeated test runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(seed=0)


def make_sine_wav_bytes(duration_sec: float = 0.2, sample_rate: int = 16000,
                        freq: float = 440.0) -> bytes:
    """Synthetic 16-bit mono PCM WAV, the reference's test-audio pattern
    (reference api/tests/test_file_asr.py:135-143)."""
    import io
    import wave

    t = np.arange(int(sample_rate * duration_sec)) / sample_rate
    audio = (0.1 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(audio.tobytes())
    return buf.getvalue()


@pytest.fixture()
def sine_wav_bytes():
    return make_sine_wav_bytes()
