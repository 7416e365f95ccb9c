"""Train the in-repo VAD conv net on a synthesized speech/noise corpus.

Usage:  python tools/train_vad.py [--steps 600] [--out ttasr/audio/data/vad_weights.npz]

Speech synthesis is physics-grounded: a glottal pulse train with pitch
contour and jitter drives 3 formant resonators; syllabic amplitude
modulation (2–8 Hz) with pauses; random fricative-like noise bursts.
Negatives: white/pink noise, hum (+harmonics), pure/vibrato tones,
music-like sustained chords, clicks, silence.  Frame labels mark where
the speech envelope is active.  See ttasr/audio/vad_model.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttasr.audio.vad_model import (  # noqa: E402
    N_MELS,
    SAMPLE_RATE,
    WINDOW,
    _forward,
    init_vad_params,
    log_mel_frames,
    mel_filterbank,
)

SR = SAMPLE_RATE


def _formant_filter(x, freq, bw, sr=SR):
    """2nd-order resonator (all-pole)."""
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * freq / sr
    return lfilter([1.0], [1.0, -2 * r * np.cos(theta), r * r], x)


def synth_speech(rng, seconds=3.0):
    """Speech-like signal + per-frame labels."""
    n = int(SR * seconds)
    t = np.arange(n) / SR
    # pitch contour 80-300 Hz with slow wander + jitter
    f0 = rng.uniform(90, 250)
    contour = f0 * (1 + 0.15 * np.sin(2 * np.pi * rng.uniform(0.3, 1.5) * t))
    contour *= 1 + 0.02 * rng.standard_normal(n).cumsum() / np.sqrt(np.arange(1, n + 1))
    phase = 2 * np.pi * np.cumsum(contour) / SR
    # glottal-ish pulse train: rectified+sharpened harmonic sum
    voiced = np.maximum(np.sin(phase), 0.0) ** 3
    # formants (F1-F3 random per "speaker")
    sig = np.zeros(n)
    for lo, hi, bw in ((300, 900, 80), (900, 2200, 120), (2200, 3200, 200)):
        sig += _formant_filter(voiced, rng.uniform(lo, hi), bw) * rng.uniform(0.5, 1.0)
    sig /= np.max(np.abs(sig)) + 1e-9
    # syllabic envelope: 2-8 Hz with hard pauses
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.0, 8.0) * t + rng.uniform(0, 6)))
    env = env ** rng.uniform(1.0, 2.0)
    # utterance gating: speech bursts with silence gaps
    gate = np.zeros(n)
    pos = 0
    while pos < n:
        burst = int(SR * rng.uniform(0.4, 1.5))
        gap = int(SR * rng.uniform(0.2, 1.0))
        gate[pos : pos + burst] = 1.0
        pos += burst + gap
    # fricative bursts (unvoiced): high-passed noise in short spans
    fric = rng.standard_normal(n) * 0.15
    fric = np.diff(fric, prepend=0.0)  # crude high-pass
    fric_gate = (rng.random(n // (SR // 10) + 1) < 0.2).repeat(SR // 10)[:n]
    out = (sig * env + fric * fric_gate * env) * gate
    out = out / (np.max(np.abs(out)) + 1e-9) * rng.uniform(0.2, 0.9)
    # frame labels: envelope*gate active
    act = (env * gate)
    frames = act[: (n // WINDOW) * WINDOW].reshape(-1, WINDOW).mean(axis=1)
    labels = (frames > 0.25).astype(np.float32)
    return out.astype(np.float32), labels


def synth_negative(rng, seconds=3.0):
    """Non-speech signal + zero labels."""
    n = int(SR * seconds)
    t = np.arange(n) / SR
    kind = rng.integers(0, 6)
    if kind == 0:    # white noise
        out = rng.standard_normal(n) * rng.uniform(0.05, 0.5)
    elif kind == 1:  # pink-ish noise
        w = rng.standard_normal(n)
        out = np.cumsum(w) / np.sqrt(np.arange(1, n + 1))
        out = out / (np.max(np.abs(out)) + 1e-9) * rng.uniform(0.1, 0.6)
    elif kind == 2:  # hum + harmonics
        f = rng.choice([50.0, 60.0])
        out = sum(np.sin(2 * np.pi * f * k * t) / k for k in range(1, 6))
        out = out / np.max(np.abs(out)) * rng.uniform(0.1, 0.5)
    elif kind == 3:  # pure/vibrato tone
        f = rng.uniform(200, 2000)
        vib = 1 + 0.01 * np.sin(2 * np.pi * 5.5 * t)
        out = np.sin(2 * np.pi * f * vib * t) * rng.uniform(0.1, 0.6)
    elif kind == 4:  # music-like sustained chord (harmonic, no syllabic AM)
        root = rng.uniform(110, 440)
        out = np.zeros(n)
        for ratio in (1.0, 1.25, 1.5, 2.0):
            for h in range(1, 4):
                out += np.sin(2 * np.pi * root * ratio * h * t + rng.uniform(0, 6)) / h
        out = out / np.max(np.abs(out)) * rng.uniform(0.1, 0.6)
        out *= 0.8 + 0.2 * np.sin(2 * np.pi * 0.3 * t)  # slow swell only
    else:            # clicks over silence
        out = np.zeros(n)
        for _ in range(rng.integers(2, 8)):
            p = rng.integers(0, n - 100)
            out[p : p + 50] = rng.standard_normal(50) * 0.8
    labels = np.zeros(n // WINDOW, np.float32)
    return out.astype(np.float32), labels


def make_example(rng, seconds=3.0):
    """Speech at random SNR over a negative background, or pure negative."""
    if rng.random() < 0.55:
        sp, lab = synth_speech(rng, seconds)
        bg, _ = synth_negative(rng, seconds)
        snr_db = rng.uniform(0, 30)
        sp_pow = np.mean(sp ** 2) + 1e-9
        bg_pow = np.mean(bg ** 2) + 1e-9
        bg = bg * np.sqrt(sp_pow / bg_pow / (10 ** (snr_db / 10)))
        return (sp + bg).astype(np.float32), lab
    return synth_negative(rng, seconds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        "ttasr", "audio", "data", "vad_weights.npz"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_platforms", "cpu")

    fb = mel_filterbank()
    rng = np.random.default_rng(args.seed)
    params = {k: jnp.asarray(v) for k, v in init_vad_params(args.seed).items()}
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mel_batch, labels):
        def loss_fn(p):
            probs = jax.vmap(lambda m: _forward(p, m))(mel_batch)
            eps = 1e-6
            bce = -(labels * jnp.log(probs + eps)
                    + (1 - labels) * jnp.log(1 - probs + eps))
            return jnp.mean(bce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n_frames = int(SR * args.seconds) // WINDOW
    for it in range(args.steps):
        mels, labs = [], []
        for _ in range(args.batch):
            audio, lab = make_example(rng, args.seconds)
            mel = np.asarray(log_mel_frames(jnp.asarray(audio), fb))
            mels.append(mel[:n_frames])
            labs.append(lab[:n_frames])
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(np.stack(mels)), jnp.asarray(np.stack(labs)),
        )
        if (it + 1) % 50 == 0:
            print(f"step {it+1}/{args.steps} loss {float(loss):.4f}")

    # held-out accuracy
    correct = total = 0
    eval_rng = np.random.default_rng(args.seed + 1)
    for _ in range(40):
        audio, lab = make_example(eval_rng, args.seconds)
        mel = np.asarray(log_mel_frames(jnp.asarray(audio), fb))[:n_frames]
        probs = np.asarray(_forward(params, jnp.asarray(mel)))
        correct += ((probs > 0.5) == (lab[:n_frames] > 0.5)).sum()
        total += len(lab[:n_frames])
    print(f"held-out frame accuracy: {correct/total:.3f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
