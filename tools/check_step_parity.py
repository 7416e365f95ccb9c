"""TPU numeric parity of one fused decode step vs the unfused int8 path.

Token-level equality between the two paths holds in interpret mode
(tests/test_decoder_kernels.py) but NOT on the real TPU, where Mosaic
and XLA tile/accumulate bf16 matmuls differently — near-tie argmax
decisions then diverge, which is expected.  This check separates that
benign divergence from a real kernel bug by comparing the STEP LOGITS:
both paths prefill the same prompt (the prefill math is identical —
only the cache write layout differs) and then run one incremental step;
the logits must agree to bf16-accumulation tolerance.

Usage: python tools/check_step_parity.py [--model large-v3]
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
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--tol", type=float, default=0.03)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.decode import _prefill, _step, pad_prompts
    from ttasr.models.whisper.model import init_cache, init_params
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    cfg = get_config(args.model)
    tok = build_byte_fallback_tokenizer()
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    qparams = quantize_params(params)       # unfused int8 (XLA path)
    fparams = fuse_qkv(qparams)             # fused kernels (flat cache)

    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.max_source_positions, cfg.d_model)) * 0.1,
        jnp.bfloat16)
    prompt_ids = tok.sot_sequence("zh", "transcribe", predict_timestamps=True)
    prompt, pad = pad_prompts([prompt_ids] * args.batch, tok.eot)
    width = prompt.shape[1]
    max_len = width + args.steps + 4

    def run(prms, flat):
        @jax.jit
        def go(prms, enc_out, prompt, pad, tokens):
            cache = init_cache(prms, cfg, enc_out, max_len=max_len,
                               kv_int8=True, cross_kv_int8=True,
                               flat_kv=flat)
            hidden, cache = _prefill(prms, cfg, prompt, pad, cache)
            outs = []
            for i in range(args.steps):
                logits, cache = _step(prms, cfg, tokens[:, i : i + 1],
                                      jnp.asarray(width + i, jnp.int32),
                                      pad, cache)
                outs.append(logits)
            return jnp.stack(outs, 1)

        tokens = jnp.asarray(
            rng.integers(100, 5000, (args.batch, args.steps)), jnp.int32)
        return np.asarray(go(prms, enc_out, jnp.asarray(prompt),
                             jnp.asarray(pad), tokens).astype(jnp.float32)), tokens

    rng_state = rng.bit_generator.state
    logits_u, _ = run(qparams, flat=False)
    rng.bit_generator.state = rng_state     # same forced token sequence
    logits_f, _ = run(fparams, flat=True)

    diff = np.abs(logits_f - logits_u)
    scale = np.abs(logits_u).max()
    rel = diff.max() / (scale + 1e-9)
    # agreement of the top-1 token per step (argmax stability)
    agree = (logits_f.argmax(-1) == logits_u.argmax(-1)).mean()
    print(f"max|Δlogit|={diff.max():.4f}  scale={scale:.2f}  rel={rel:.4f}  "
          f"argmax agreement={agree:.3f}")
    assert rel < args.tol, (
        f"fused step logits diverge beyond bf16 tolerance: rel={rel:.4f}")
    print("step-logit parity OK")


if __name__ == "__main__":
    main()
