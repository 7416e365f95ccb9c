"""Encoder A/B on the real TPU: XLA attention vs the merged pair kernel.

Times ITERS sequential encoder passes inside one jitted fori_loop
(axon RPC latency amortized; see tools/profile_decode.py).

Usage: python tools/profile_encoder.py [--batch 8] [--iters 5]
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
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.model import encode, init_params

    cfg = get_config("large-v3")
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (args.batch, cfg.num_mel_bins, 3000)).astype(np.float32))

    def loop(fused):
        @jax.jit
        def run(params, mel):
            def body(i, m):
                out = encode(params, cfg, m[..., :3000],
                             fused_attention=fused)
                # fold a scalar back in to serialize iterations
                return m * (1.0 + 0.0 * out.sum().astype(m.dtype))

            return jax.lax.fori_loop(0, args.iters, body, mel)
        return run

    for fused in (False, True):
        fn = loop(fused)
        out = fn(params, mel)
        np.asarray(out)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(fn(params, mel))
            times.append(time.perf_counter() - t0)
        per = min(times) / args.iters
        print(json.dumps({"stage": f"encoder_fused={fused}",
                          "ms_per_pass": round(per * 1e3, 2),
                          "batch": args.batch}))


if __name__ == "__main__":
    main()
