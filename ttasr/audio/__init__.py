"""Audio I/O, resampling, and VAD.

Replaces the reference's librosa/libsndfile/soxr host decode path
(reference ``asr_core.py:156``, ``api/file_asr.py:271``) and the
``wave``-based PCM writer (``api/stt_streaming/src/audio_utils.py:5-29``).
WAV parse/serialize is pure numpy (optionally accelerated by the C++
helper in :mod:`ttasr.native`); other containers decode through ffmpeg
when present. Resampling is polyphase on host, jit-compiled on device.
"""

from ttasr.audio.io import (
    load_audio,
    read_wav_bytes,
    write_wav,
    pcm16_bytes_to_float32,
    float32_to_pcm16_bytes,
    save_audio_to_file,
)
from ttasr.audio.resample import resample_poly_host

__all__ = [
    "load_audio",
    "read_wav_bytes",
    "write_wav",
    "pcm16_bytes_to_float32",
    "float32_to_pcm16_bytes",
    "save_audio_to_file",
    "resample_poly_host",
]
