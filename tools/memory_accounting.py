"""Per-chip HBM accounting for sharded large-v3 training (VERDICT r3 #4).

The reference sizes its fine-tune workload at a >=40 GB GPU
(reference README.md:108, run.sh recipe: batch 4, <=30 s windows, fp16 +
gradient checkpointing).  large-v3 AdamW f32 state alone (~12.4 GB) plus
f32 master params (~6.2 GB) and grads (~6.2 GB) exceeds one 16 GB v5e —
this tool proves the sharded mesh trainer fits by accounting every
resident tensor class per chip from the REAL sharding specs
(``param_pspecs`` for params/grads, ``zero1_moment_spec`` for AdamW m/v),
with no compilation and no device memory:

    python tools/memory_accounting.py --model large-v3 --data 4 --model-axis 2

Shapes come from ``jax.eval_shape`` over the real ``init_params`` (no
allocation); per-chip bytes from ``NamedSharding.shard_shape``.  The
activation estimate is analytic (remat: layer-boundary residuals + the
logits/loss buffers) and labeled as such.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def account(model: str = "large-v3", data: int = 4, model_axis: int = 2,
            batch: int = 4, dcn: int = 1, devices=None) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.model import init_params
    from ttasr.parallel.sharding import (
        create_mesh,
        param_pspecs,
        sanitize_spec,
        zero1_moment_spec,
    )

    cfg = get_config(model)
    if dcn > 1:
        from ttasr.parallel.distributed import create_multislice_mesh

        mesh = create_multislice_mesh(model=model_axis, devices=devices,
                                      force_slices=dcn)
    else:
        mesh = create_mesh(data=data, model=model_axis, devices=devices)

    # abstract params: shapes/dtypes only, nothing allocated
    abstract = jax.eval_shape(
        lambda: init_params(cfg, seed=0, dtype=jnp.float32))
    specs = param_pspecs(abstract)

    def shard_bytes(leaf, spec):
        s = sanitize_spec(spec, leaf.shape, mesh)
        shard_shape = NamedSharding(mesh, s).shard_shape(leaf.shape)
        return int(np.prod(shard_shape)) * leaf.dtype.itemsize

    def moment_bytes(leaf, spec):
        s = zero1_moment_spec(spec, leaf.shape, mesh)
        shard_shape = NamedSharding(mesh, s).shard_shape(leaf.shape)
        return int(np.prod(shard_shape)) * leaf.dtype.itemsize

    param_b = sum(jax.tree.leaves(jax.tree.map(shard_bytes, abstract, specs)))
    grad_b = param_b  # grads carry the params' shardings
    m_b = sum(jax.tree.leaves(jax.tree.map(moment_bytes, abstract, specs)))
    moments_b = 2 * m_b  # AdamW mu + nu
    moments_repl_b = 2 * param_b  # what replicated (non-ZeRO) state costs

    # analytic activation estimate at the run.sh shape (batch 4, 30 s):
    # remat keeps layer-boundary residuals (bf16 compute) + mel + enc_out
    # + decoder logits/log_softmax (f32, the dominant pair).
    b_local = max(batch // (data * dcn), 1)
    seq_e, seq_d = cfg.max_source_positions, 448
    d = cfg.d_model
    resid = (cfg.encoder_layers * b_local * seq_e * d
             + cfg.decoder_layers * b_local * seq_d * d) * 2  # bf16
    logits = 2 * b_local * seq_d * cfg.vocab_size * 4         # f32 ×2 bufs
    mel = b_local * cfg.num_mel_bins * 3000 * 4
    act_b = resid + logits + mel

    total = param_b + grad_b + moments_b + act_b
    return {
        "model": model,
        "mesh": dict(mesh.shape),
        "batch_global": batch,
        "per_chip_gb": {
            "params_f32": param_b / 2**30,
            "grads_f32": grad_b / 2**30,
            "adamw_moments_zero1": moments_b / 2**30,
            "adamw_moments_if_replicated": moments_repl_b / 2**30,
            "activations_est": act_b / 2**30,
            "total": total / 2**30,
            "total_if_replicated_moments": (
                param_b + grad_b + moments_repl_b + act_b) / 2**30,
        },
    }


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="large-v3")
    parser.add_argument("--data", type=int, default=4)
    parser.add_argument("--model-axis", type=int, default=2)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--dcn", type=int, default=1)
    args = parser.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count="
        f"{args.data * args.model_axis * args.dcn}")
    stats = account(args.model, args.data, args.model_axis, args.batch,
                    args.dcn)
    print(f"{stats['model']} on mesh {stats['mesh']} "
          f"(global batch {stats['batch_global']}):")
    for k, v in stats["per_chip_gb"].items():
        print(f"  {k:34s} {v:7.2f} GiB/chip")


if __name__ == "__main__":
    main()
