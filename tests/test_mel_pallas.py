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


def test_encoder_attention_kernel_matches_reference():
    import jax.numpy as jnp

    from ttasr.models.whisper.model import _attention
    from ttasr.ops.encoder_attention_pallas import encoder_self_attention

    rng = np.random.default_rng(5)
    B, T, H, D = 2, 150, 4, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32) * 0.3
    got = np.asarray(encoder_self_attention(q, k, v, interpret=True), np.float32)
    ref = np.asarray(_attention(q, k, v), np.float32)
    assert np.abs(got - ref).max() < 2e-3
