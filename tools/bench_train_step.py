"""Train-step throughput on the real TPU (the reference's 4th baseline).

The reference sizes fine-tuning at "200 h of audio ≈ 72 h on a ≥40 GB
GPU" (reference README.md:108) with the run.sh recipe: batch 4, ≤30 s
windows, fp16 + gradient checkpointing, AdamW (run.sh:13-37).  This tool
times OUR equivalent — the jitted mixed-precision train step
(f32 master + bf16 compute, remat) from ttasr/train/train_step.py — at
the same recipe shape and reports steps/s, audio-seconds trained per
wall-second, and train MFU.

whisper-large-v3 AdamW f32 state (~25 GB) does not fit one 16 GB v5e —
the reference's 40 GB GPU sizing has the same wall — so the single-chip
numbers run small/medium; large-v3 training is the sharded-mesh path
(ttasr/parallel, driver dryrun).  Usage:

    python tools/bench_train_step.py [--model medium] [--batch 4]
                                     [--steps 8] [--label-len 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np  # noqa: E402


def train_flops(cfg, batch: int, label_len: int) -> float:
    """Analytic fwd+bwd matmul FLOPs for one step (3x forward rule)."""
    from ttasr.core.flops import encoder_flops

    t_src = cfg.max_source_positions
    d, ffn, n_layers = cfg.d_model, cfg.ffn_dim, cfg.decoder_layers
    p = label_len
    dec = batch * n_layers * (
        8 * p * d * d            # self q,k,v,out
        + 4 * p * p * d          # self scores + attention·V
        + 4 * p * d * d          # cross q,out
        + 4 * t_src * d * d      # cross k,v over encoder states
        + 4 * p * t_src * d      # cross scores + attention·V
        + 4 * p * d * ffn        # mlp
    )
    unembed = batch * 2 * p * d * cfg.vocab_size
    fwd = encoder_flops(cfg, batch) + dec + unembed
    return 3.0 * fwd             # bwd ≈ 2x fwd for matmul-dominated nets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="medium")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--label-len", type=int, default=200)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--freeze-encoder", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ttasr.core.flops import peak_tflops
    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.model import init_params
    from ttasr.train.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = get_config(args.model)
    params = init_params(cfg, seed=0)
    optimizer = make_optimizer(learning_rate=1e-5, warmup_steps=500)
    step_fn = make_train_step(
        cfg, optimizer, remat=not args.no_remat,
        freeze_encoder=args.freeze_encoder, compute_dtype=jnp.bfloat16,
    )
    state = init_train_state(params, optimizer)

    rng = np.random.default_rng(0)
    b, lab = args.batch, args.label_len
    batch = {
        "mel": jnp.asarray(
            rng.standard_normal((b, cfg.num_mel_bins, 3000)), jnp.float32),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, cfg.vocab_size, (b, lab)), jnp.int32),
        "labels": jnp.asarray(
            rng.integers(0, cfg.vocab_size, (b, lab)), jnp.int32),
        "num_frames": jnp.full((b,), 3000, jnp.int32),
    }

    t0 = time.perf_counter()
    state, loss = step_fn(state, batch)
    np.asarray(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = step_fn(state, batch)
    np.asarray(loss)                     # axon: fetch to host to sync
    step_s = (time.perf_counter() - t0) / args.steps

    audio_s = b * 30.0
    flops = train_flops(cfg, b, lab)
    out = {
        "metric": f"whisper-{args.model}_train_step",
        "value": round(step_s, 4),
        "unit": "s/step",
        "steps_per_s": round(1.0 / step_s, 3),
        "audio_s_per_wall_s": round(audio_s / step_s, 1),
        "train_rtf": round(step_s / audio_s, 5),
        "mfu_train": round(flops / step_s / (peak_tflops() * 1e12), 4),
        "batch": b,
        "label_len": lab,
        "remat": not args.no_remat,
        "loss": float(np.asarray(loss)),
        "compile_s": round(compile_s, 1),
        "baseline": "reference: 200 h audio ~= 72 h on >=40 GB GPU "
                    "(README.md:108)",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
