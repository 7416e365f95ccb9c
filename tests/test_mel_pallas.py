"""Golden test: fused Pallas log-mel vs the XLA reference path."""

import numpy as np
import pytest

from ttasr.ops.mel import log_mel_spectrogram
from ttasr.ops.mel_pallas import log_mel_spectrogram_pallas


@pytest.mark.parametrize("n_mels", [80, 128])
def test_pallas_mel_matches_xla(n_mels):
    rng = np.random.default_rng(1)
    audio = (
        0.2 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)
        + 0.02 * rng.standard_normal(32000)
    ).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels))
    got = np.asarray(log_mel_spectrogram_pallas(audio, n_mels=n_mels,
                                                interpret=True))
    assert got.shape == ref.shape == (n_mels, 3000)
    assert np.max(np.abs(got - ref)) < 2e-4


def test_pallas_mel_batched():
    rng = np.random.default_rng(2)
    audio = (0.1 * rng.standard_normal((2, 16000))).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio))
    got = np.asarray(log_mel_spectrogram_pallas(audio, interpret=True))
    assert got.shape == ref.shape == (2, 80, 3000)
    assert np.max(np.abs(got - ref)) < 2e-4
