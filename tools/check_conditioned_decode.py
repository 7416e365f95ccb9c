"""TPU compile/execute check for the conditioned-prompt decode shapes.

The fused flat-cache kernels were benchmarked with width-16 prompts
(cache len <= 144); ``condition_on_previous_text`` uses the 256-wide
prompt buffer, growing the cache to 480 slots — the self-attention
megakernel's K/V blocks are ~3 MB each there, near the VMEM budget
with double buffering.  This drives beam-5 decode through the largest
bucket on the real TPU and checks tokens match the unfused path.

Usage: python tools/check_conditioned_decode.py [--model large-v3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large-v3")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--sample-len", type=int, default=224)
    p.add_argument("--check-tokens", action="store_true",
                   help="also run the unfused int8 path and report beam "
                        "token agreement (NOT asserted: Mosaic and XLA "
                        "accumulate bf16 differently, so near-tie beam "
                        "picks legitimately diverge — the asserted "
                        "numeric check is tools/check_step_parity.py)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.decode import (
        MAX_PROMPT,
        DecodingOptions,
        TokenizerInfo,
        beam_decode,
        pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    cfg = get_config(args.model)
    tok = build_byte_fallback_tokenizer()
    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    opts = DecodingOptions(beam_size=5, sample_len=args.sample_len,
                           kv_int8=True, cross_kv_int8=True)

    rng = np.random.default_rng(0)
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    qparams = fuse_qkv(quantize_params(params))
    mel_like = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.max_source_positions, cfg.d_model)) * 0.1,
        jnp.bfloat16)

    # conditioned prompt: previous-text tokens fill the 256 buffer
    prev = list(rng.integers(100, 5000, 180))
    prompt_ids = ([tok.sot_prev] + prev
                  + list(tok.sot_sequence("zh", "transcribe",
                                          predict_timestamps=True)))
    prompt, pad = pad_prompts([prompt_ids] * args.batch, tok.eot,
                              width=MAX_PROMPT)
    print(f"prompt width {prompt.shape[1]}, cache grows to "
          f"{prompt.shape[1] + args.sample_len}")

    out = beam_decode(qparams, cfg, mel_like, prompt, pad,
                      jax.random.PRNGKey(0), opts=opts, ti=ti)
    toks = np.asarray(out["tokens"])
    print("fused conditioned decode OK:", toks.shape,
          "lengths", np.asarray(out["lengths"]))

    if args.check_tokens:
        out2 = beam_decode(quantize_params(params), cfg, mel_like, prompt,
                           pad, jax.random.PRNGKey(0), opts=opts, ti=ti)
        t2 = np.asarray(out2["tokens"])
        n = np.asarray(out2["lengths"])
        agree = np.mean([
            np.mean(toks[b, : n[b]] == t2[b, : n[b]]) if n[b] else 1.0
            for b in range(args.batch)
        ])
        print(f"beam token agreement vs unfused path: {agree:.3f} "
              "(ties diverge under bf16 reassociation; see "
              "tools/check_step_parity.py for the asserted logits check)")


if __name__ == "__main__":
    main()
