"""Fused Pallas log-mel kernel for TPU.

One kernel fuses framing, windowed real-DFT, power, mel projection, and
log10 — frames and power spectra never round-trip through HBM (the XLA
reference path in :mod:`ttasr.ops.mel` materializes the (B, 3000, 400)
frame tensor).

Framing trick (Mosaic wants static, lane-aligned ops): 4 frames of hop
160 span exactly 640 samples, so the sample window reshapes statically
into 640-sample rows, and each frame is a 400-sample sub-span of the
1280-wide ``concat(rows[:-1], rows[1:])``.  Rather than slicing at
unaligned offsets, the shift is folded into the DFT basis: four
pre-shifted (1280, 256) cos/sin matrices, one per ``frame % 4`` group,
selected by a grid axis.  The kernel body is then two MXU matmuls + a
mel matmul with no dynamic indexing at all.

Grid: (batch, frame_blocks, 4 shift groups); audio stays in HBM, each
program DMAs its overlapping window into VMEM.  Frames come out grouped
by ``frame % 4``; a static gather outside restores order, followed by
the global max-8 clamp and (x+4)/4 rescale.

Numerical contract: matches :func:`ttasr.ops.mel.log_mel_spectrogram`
(and therefore WhisperFeatureExtractor) to ~1e-4.
"""

from __future__ import annotations

import functools

import numpy as np

from ttasr.ops.mel import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_FREQS,
    N_SAMPLES,
    _dft_basis,
    mel_filter_bank,
)

FRAME_BLOCK = 128                    # frames per (batch, block) cell
LANE = 128
_GROUP = 4                           # frames per 640-sample row
_ROW = _GROUP * HOP_LENGTH           # 640
_QROWS = FRAME_BLOCK // _GROUP       # 32 frames per shift group

_WIDE = 2 * _ROW                     # 1280: row + next row
_FREQ_PAD = ((N_FREQS + LANE - 1) // LANE) * LANE   # 256
_BLOCK_SAMPLES = FRAME_BLOCK * HOP_LENGTH           # 20480
_WINDOW_SAMPLES = (_QROWS + 1) * _ROW               # 21120 (covers the tail)


@functools.lru_cache(maxsize=4)
def _shifted_constants(n_mels: int):
    """DFT bases with the per-group frame shift folded in.

    Returns cos/sin of shape (4, _WIDE, _FREQ_PAD) and the mel filterbank
    (_FREQ_PAD, n_mels_pad).
    """
    cos, sin = _dft_basis()  # (400, 201), hann window folded in
    cos_s = np.zeros((_GROUP, _WIDE, _FREQ_PAD), np.float32)
    sin_s = np.zeros((_GROUP, _WIDE, _FREQ_PAD), np.float32)
    for r in range(_GROUP):
        off = r * HOP_LENGTH
        cos_s[r, off : off + N_FFT, :N_FREQS] = cos
        sin_s[r, off : off + N_FFT, :N_FREQS] = sin
    n_mels_pad = ((n_mels + LANE - 1) // LANE) * LANE
    fb = np.zeros((_FREQ_PAD, n_mels_pad), np.float32)
    fb[:N_FREQS, :n_mels] = mel_filter_bank(n_mels)
    return cos_s, sin_s, fb


@functools.lru_cache(maxsize=1)
def _ungroup_index() -> np.ndarray:
    """Grouped row (f%4)*_QROWS + f//4 -> frame f, within one block."""
    idx = np.empty((FRAME_BLOCK,), np.int32)
    for f in range(FRAME_BLOCK):
        idx[f] = (f % _GROUP) * _QROWS + f // _GROUP
    return idx


def _mel_kernel(audio_hbm, cos_ref, sin_ref, fb_ref, out_ref,
                window_scratch, dma_sem):
    """One (batch, frame-block, shift-group) grid cell."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)

    copy = pltpu.make_async_copy(
        audio_hbm.at[pl.ds(i, 1), pl.ds(j * _BLOCK_SAMPLES, _WINDOW_SAMPLES)],
        window_scratch,
        dma_sem,
    )
    copy.start()
    copy.wait()

    # Two lane-aligned flat loads (offsets 0 and 640) reshaped to rows;
    # avoids a sublane-offset slice that Mosaic cannot concat.
    rows_a = window_scratch[0, : _QROWS * _ROW].reshape(_QROWS, _ROW)
    rows_b = window_scratch[0, _ROW : (_QROWS + 1) * _ROW].reshape(_QROWS, _ROW)
    wide = jnp.concatenate([rows_a, rows_b], axis=1)        # (32, 1280)

    re = jnp.dot(wide, cos_ref[0], preferred_element_type=jnp.float32)
    im = jnp.dot(wide, sin_ref[0], preferred_element_type=jnp.float32)
    power = re * re + im * im                               # (32, 256)
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[0, 0, :, :] = jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_spectrogram_pallas(audio, n_mels: int = 80, *,
                               interpret: bool = False):
    """Pallas-fused Whisper log-mel. audio: (n,) or (B, n) float32.

    Returns (n_mels, 3000) / (B, n_mels, 3000), identical normalization
    to the XLA path.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    audio = jnp.asarray(audio, jnp.float32)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    b, n = audio.shape
    if n < N_SAMPLES:
        audio = jnp.pad(audio, ((0, 0), (0, N_SAMPLES - n)))
    elif n > N_SAMPLES:
        audio = audio[:, :N_SAMPLES]

    half = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")
    n_blocks = -(-N_FRAMES // FRAME_BLOCK)
    need = (n_blocks - 1) * _BLOCK_SAMPLES + _WINDOW_SAMPLES
    padded = jnp.pad(padded, ((0, 0), (0, max(0, need - padded.shape[1]))))

    cos_s, sin_s, fb = _shifted_constants(n_mels)
    n_mels_pad = fb.shape[1]

    out = pl.pallas_call(
        _mel_kernel,
        grid=(b, n_blocks, _GROUP),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # audio stays in HBM
            pl.BlockSpec((1, _WIDE, _FREQ_PAD), lambda i, j, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WIDE, _FREQ_PAD), lambda i, j, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FREQ_PAD, n_mels_pad), lambda i, j, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _QROWS, n_mels_pad), lambda i, j, r: (i, j * _GROUP + r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_blocks * _GROUP, _QROWS, n_mels_pad), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((1, _WINDOW_SAMPLES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded, jnp.asarray(cos_s), jnp.asarray(sin_s), jnp.asarray(fb))

    # restore frame order within each block (grouped-by-(f%4) layout)
    grouped = out.reshape(b, n_blocks, FRAME_BLOCK, n_mels_pad)
    ungroup = jnp.asarray(_ungroup_index())
    ordered = jnp.take(grouped, ungroup, axis=2)
    log_spec = ordered.reshape(b, n_blocks * FRAME_BLOCK, n_mels_pad)
    log_spec = log_spec[:, :N_FRAMES, :n_mels]

    peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    result = jnp.swapaxes(log_spec, 1, 2)
    return result[0] if squeeze else result
