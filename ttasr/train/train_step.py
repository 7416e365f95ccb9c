"""Jitted training step: loss, optimizer, mesh-sharded update.

Replaces Seq2SeqTrainer.train() internals (reference train_asr.py:697-716,
run.sh hyperparameters): AdamW + linear warmup, label smoothing off,
-100 masking, gradient clipping, optional remat (the reference's
``gradient_checkpointing``, run.sh:37), optional mixed precision
(``compute_dtype=bfloat16`` casts the forward only; master params and
grads stay f32).  Data parallelism shards the batch over the mesh
"data" axis; tensor parallelism (mesh "model" axis) reuses the
inference shardings.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ttasr.models.whisper.config import WhisperConfig
from ttasr.models.whisper.model import decode_train, encode
from ttasr.train.spec_augment import SpecAugmentConfig, spec_augment

LABEL_PAD = -100


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


jax.tree_util.register_dataclass(
    TrainState, data_fields=["step", "params", "opt_state"], meta_fields=[]
)


def cross_entropy_loss(logits, targets, label_pad: int = LABEL_PAD):
    """Masked token-mean cross entropy. logits (B,T,V) f32, targets (B,T)."""
    mask = (targets != label_pad).astype(jnp.float32)
    safe_targets = jnp.where(targets == label_pad, 0, targets)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[..., 0]
    total = jnp.sum(mask)
    return -jnp.sum(token_ll * mask) / jnp.maximum(total, 1.0)


def make_optimizer(learning_rate: float = 1e-5, warmup_steps: int = 500,
                   total_steps: int = 2000, weight_decay: float = 0.0,
                   max_grad_norm: float = 1.0) -> optax.GradientTransformation:
    """AdamW with linear warmup + linear decay (HF Trainer defaults;
    run.sh:17,24 lr 1e-5 warmup 500)."""
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.linear_schedule(
                learning_rate, 0.0, max(total_steps - warmup_steps, 1)
            ),
        ],
        [warmup_steps],
    )
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )


def loss_fn(params, cfg: WhisperConfig, batch, *, remat: bool = False,
            freeze_encoder: bool = False, compute_dtype=None):
    if compute_dtype is not None:
        # Mixed precision: f32 master params (the optimizer state) with a
        # low-precision forward/backward — grads flow back through the
        # cast and land in f32.  The reference's fp16 Trainer recipe
        # (run.sh:36) mapped to the TPU-native bf16 idiom.
        def cast(path, x):
            if not (hasattr(x, "astype")
                    and jnp.issubdtype(x.dtype, jnp.floating)):
                return x
            # stem convs stay f32: conv_general_dilated's transpose can't
            # mix a f32 cotangent with bf16 kernels, and two small convs
            # cost nothing next to the transformer stack
            if any("conv" in getattr(k, "key", "") for k in path):
                return x
            return x.astype(compute_dtype)

        params = jax.tree_util.tree_map_with_path(cast, params)
    enc_params = params
    if freeze_encoder:
        enc_params = jax.tree.map(jax.lax.stop_gradient, params)
    enc_out = encode(enc_params, cfg, batch["mel"], remat=remat,
                     fused_attention=False)
    if freeze_encoder:
        enc_out = jax.lax.stop_gradient(enc_out)
    logits = decode_train(params, cfg, batch["decoder_input_ids"], enc_out,
                          remat=remat)
    return cross_entropy_loss(logits, batch["labels"])


def make_train_step(cfg: WhisperConfig, optimizer: optax.GradientTransformation,
                    *, mesh=None, remat: bool = False,
                    freeze_encoder: bool = False,
                    spec_augment_cfg: Optional[SpecAugmentConfig] = None,
                    compute_dtype=None, seed: int = 0) -> Callable:
    """Build the jitted (optionally mesh-sharded) train step.

    With a mesh, params follow :func:`ttasr.parallel.param_pspecs` and the
    batch shards over "data"; XLA emits the grad all-reduce over ICI.
    ``spec_augment_cfg`` enables input-feature masking (reference
    train_asr.py:139-144), keyed deterministically off the step counter.
    """

    def train_step(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
        if spec_augment_cfg is not None:
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
            batch = dict(batch)
            batch["mel"] = spec_augment(
                rng, batch["mel"], batch["num_frames"], spec_augment_cfg
            )
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg, batch, remat=remat,
                              freeze_encoder=freeze_encoder,
                              compute_dtype=compute_dtype)
        )(state.params)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_opt_state), loss

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    # Params/opt_state keep the shardings they were placed with
    # (ttasr.parallel.shard_params / zero1_opt_state).  The batch shards
    # dim 0 over every data-like axis — ("dcn_data","data") on a
    # multi-slice mesh, so the gradient all-reduce decomposes into an
    # intra-slice ICI reduce plus an inter-slice DCN reduce — for every
    # leaf (prefix spec: robust to optional keys like num_frames).
    batch_axes = (("dcn_data", "data") if "dcn_data" in mesh.axis_names
                  else "data")
    return jax.jit(
        train_step,
        in_shardings=(None, NamedSharding(mesh, P(batch_axes))),
        donate_argnums=(0,),
    )


def init_train_state(params, optimizer, mesh=None) -> TrainState:
    """Init the train state; with a mesh, the AdamW moments shard over
    the data axis (ZeRO-1, :func:`ttasr.parallel.sharding.shard_opt_state`)
    so large-v3's ~12.4 GB f32 m/v never sits replicated per chip."""
    opt_state = optimizer.init(params)
    if mesh is not None:
        from ttasr.parallel.sharding import shard_opt_state

        opt_state = shard_opt_state(opt_state, params, mesh)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
    )
