"""Native C++ helper library tests (auto-builds via make on first use)."""

import numpy as np
import pytest

from ttasr import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native library not built and no toolchain")


def test_levenshtein_matches_reference():
    from Levenshtein import distance

    import random

    random.seed(1)
    pool = "abc中文字元xyz 123"
    for _ in range(100):
        a = "".join(random.choice(pool) for _ in range(random.randint(0, 50)))
        b = "".join(random.choice(pool) for _ in range(random.randint(0, 50)))
        assert native.levenshtein(a, b) == distance(a, b)


def test_resample_tone():
    sr_from, sr_to = 44100, 16000
    t = np.arange(sr_from) / sr_from
    audio = (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = native.resample(audio, sr_from, sr_to)
    assert abs(len(out) - sr_to) <= 2
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * sr_to / len(out)
    assert abs(peak_hz - 440.0) < 5.0


def test_pcm_roundtrip():
    audio = (0.5 * np.sin(np.linspace(0, 20, 1000))).astype(np.float32)
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    out = native.pcm16_to_f32(pcm)
    assert np.abs(out - audio).max() < 1e-3
