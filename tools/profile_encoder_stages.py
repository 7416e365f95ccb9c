"""Per-stage encoder microprofile on the real TPU.

Breaks the large-v3 encoder pass into stages (conv stem, qkv projections,
merged attention kernel, out-proj, MLP, layernorms) and times each as a
32-layer fori_loop so the axon relay's ~25 ms dispatch cost amortizes
(see tools/profile_decode.py).  Guides the fused-encoder-block work
(VERDICT round-2 #2).

Usage: python tools/profile_encoder_stages.py [--batch 8] [--compute int8]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--compute", default="int8", choices=["int8", "bfloat16"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.model import (
        _ln, _mlp, _proj, encode, init_params,
    )
    from ttasr.ops.encoder_attention_pallas import (
        TQ_MERGED, encoder_attention_merged,
    )

    cfg = get_config("large-v3")
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    if args.compute == "int8":
        from ttasr.ops.quant import quantize_params

        params = quantize_params(params)
    enc = params["encoder"]
    rng = np.random.default_rng(0)
    b, t, d = args.batch, 1500, cfg.d_model
    t_pad = -(-t // TQ_MERGED) * TQ_MERGED
    mel = jnp.asarray(rng.standard_normal(
        (b, cfg.num_mel_bins, 3000)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(
        (b, t_pad, d)).astype(np.float32)).astype(jnp.bfloat16)
    n_layers = cfg.encoder_layers
    dh = d // cfg.encoder_heads

    def blk0(name):
        w = enc["blocks"][name]
        if isinstance(w, dict):
            return {"q": w["q"][0], "s": w["s"][0]}
        return w[0]

    def timed(name, fn, x0, *weights):
        """Times ``fn(x, *weights)`` over iters*32 loop iterations with the
        stage OUTPUT feeding the next iteration's INPUT (the
        profile_decode.py pattern).  A loop-invariant body gets hoisted
        by XLA and the measurement collapses to one ~25 ms relay RPC —
        the first version of this tool measured exactly that for every
        stage."""
        d_in = x0.shape[-1]

        @jax.jit
        def run(x, *ws):
            def body(i, x):
                out = fn(x, *ws)
                return out[..., :d_in].astype(x.dtype)

            final = jax.lax.fori_loop(0, args.iters * n_layers, body, x)
            # scalar result: fetching the (B, T, D) carrier through the
            # axon relay costs ~300 ms for 31 MB and buries the signal
            return jnp.sum(final.astype(jnp.float32))

        out = run(x0, *weights)
        np.asarray(out)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(run(x0, *weights))
            times.append(time.perf_counter() - t0)
        per_pass = min(times) / args.iters
        print(json.dumps({"stage": name,
                          "ms_per_pass_32layers": round(per_pass * 1e3, 2),
                          "batch": b, "compute": args.compute}))
        return per_pass

    # full pass reference
    def full(params, mel):
        return encode(params, cfg, mel)

    @jax.jit
    def full_loop(params, mel):
        def body(i, m):
            out = encode(params, cfg, m[..., :3000])
            return m * (1.0 + 0.0 * out.sum().astype(m.dtype))

        final = jax.lax.fori_loop(0, args.iters, body, mel)
        return jnp.sum(final.astype(jnp.float32))  # scalar fetch

    np.asarray(full_loop(params, mel))
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        np.asarray(full_loop(params, mel))
        times.append(time.perf_counter() - t0)
    print(json.dumps({"stage": "FULL encoder pass",
                      "ms_per_pass": round(min(times) / args.iters * 1e3, 2),
                      "batch": b, "compute": args.compute}))

    # stages (one layer's weights, looped 32x).  Weights are jit
    # ARGUMENTS: a closure-captured array becomes a compile-time constant
    # shipped to the remote compile service (413 over ~10 MB —
    # PERF_NOTES round-2 gotchas).
    timed("ln1", lambda x, s, b: _ln(x, s, b),
          x, blk0("ln1_s"), blk0("ln1_b"))
    timed("qkv_proj (3 matmuls)",
          lambda x, wq, bq, wk, wv, bv: (
              _proj(x, wq, bq) + _proj(x, wk) + _proj(x, wv, bv)),
          x, blk0("wq"), blk0("bq"), blk0("wk"), blk0("wv"), blk0("bv"))
    q = (x * (dh ** -0.5)).astype(jnp.bfloat16)
    timed("merged attention kernel",
          lambda q: encoder_attention_merged(q, q, q, t), q)
    timed("out_proj", lambda x, w, b: _proj(x, w, b),
          x, blk0("wo"), blk0("bo"))
    timed("mlp (ln2+w1+gelu+w2)",
          lambda x, s, b, w1, b1, w2, b2: _mlp(
              _ln(x, s, b), {"w1": w1, "b1": b1, "w2": w2, "b2": b2}),
          x, blk0("ln2_s"), blk0("ln2_b"),
          blk0("w1"), blk0("b1"), blk0("w2"), blk0("b2"))


if __name__ == "__main__":
    main()
