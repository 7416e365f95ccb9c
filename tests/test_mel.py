"""Golden tests: mel frontend vs transformers.WhisperFeatureExtractor."""

import numpy as np
import pytest

from ttasr.ops.mel import log_mel_spectrogram, mel_filter_bank, N_FRAMES


@pytest.fixture(scope="module")
def hf_fe():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor()


@pytest.mark.parametrize("seconds", [0.5, 2.0, 30.0])
def test_log_mel_matches_hf(hf_fe, seconds):
    rng = np.random.default_rng(42)
    n = int(16000 * seconds)
    audio = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
    golden = hf_fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    ours = np.asarray(log_mel_spectrogram(audio))
    assert ours.shape == golden.shape == (80, N_FRAMES)
    assert np.max(np.abs(ours - golden)) < 2e-4


def test_log_mel_128(hf_fe):
    from transformers import WhisperFeatureExtractor

    fe128 = WhisperFeatureExtractor(feature_size=128)
    rng = np.random.default_rng(7)
    audio = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
    golden = fe128(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    ours = np.asarray(log_mel_spectrogram(audio, n_mels=128))
    assert ours.shape == (128, N_FRAMES)
    assert np.max(np.abs(ours - golden)) < 2e-4


def test_batched_matches_single():
    rng = np.random.default_rng(3)
    batch = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    out_b = np.asarray(log_mel_spectrogram(batch))
    out_0 = np.asarray(log_mel_spectrogram(batch[0]))
    out_1 = np.asarray(log_mel_spectrogram(batch[1]))
    assert out_b.shape == (2, 80, N_FRAMES)
    np.testing.assert_allclose(out_b[0], out_0, atol=1e-6)
    np.testing.assert_allclose(out_b[1], out_1, atol=1e-6)


def test_mel_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    golden = hf_fb(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    )
    ours = mel_filter_bank(80)
    assert np.max(np.abs(ours - golden)) < 1e-6


def test_mel_int16_input_matches_f32():
    """int16 PCM input converts on device (/32768) and must match the
    f32 path bit-for-bit — int16 -> f32 is exact."""
    import numpy as np

    from ttasr.ops.mel import log_mel_spectrogram

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((2, 48000)) * 0.2 * 32767.0).clip(
        -32768, 32767).astype(np.int16)
    ref = log_mel_spectrogram(pcm.astype(np.float32) / 32768.0, n_mels=80)
    got = log_mel_spectrogram(pcm, n_mels=80)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
