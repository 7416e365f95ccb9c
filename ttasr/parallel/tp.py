"""Tensor-parallel FUSED decode via shard_map (VERDICT round-3 #2).

Under GSPMD the int8 engine had to abandon its fused Pallas decode
kernels (a ``pallas_call`` has no SPMD sharding rule, so pjit would
replicate it); the mesh path served the ~1.4x slower unfused XLA graph.
This module keeps the fast path on a mesh by running the SAME kernels
per-shard inside ``shard_map``:

- the batch splits over the ``data`` axis (pure DP — the decode
  bookkeeping is per-audio already);
- attention heads split over the ``model`` axis: each shard's decoder
  blocks carry only its heads' qkv / cross-q / cross-KV columns, so the
  self- and cross-KV cache streams — the dominant per-step HBM terms —
  split across chips.  Merged attention outputs ``all_gather`` (tiled,
  ~BK x d_model f32, a few hundred KB over ICI) before the replicated
  attn-out / MLP weights, because the fused kernels fold wo@attn +
  residual + LayerNorm into one kernel — the collective must land at
  the head-merge boundary (see ``decode._tp_gather``).
- **v2 (row-parallel, default when shapes divide)**: wo / wo_c / w2
  ROW-split and w1/b1 column-split over ``model``, so the per-chip
  weight stream also shrinks ~n x.  The fused kernels run partial-sum
  variants (ops.decoder_blocks_pallas.matmul_int8_partial /
  ln_q_cross_int8, ops.decoder_mlp_pallas.mlp_int8_fused(partial=True))
  and the shards ``psum`` — 3 collectives/layer of (BK, D) f32 vs v1's
  2 all_gathers of the same volume; tools/comms_accounting.py prices
  the trade per mesh size.  The unembed stays replicated (top-k needs
  the full vocab row anyway).  TTASR_TP_ROW_PARALLEL=0 forces v1
  (replicated wo/MLP, attention-only sharding).

Parity: the per-shard math is the single-chip kernel math on local
heads; the gather restores head order exactly, so tokens match the
single-chip fused path bit-for-bit in interpret mode
(tests/test_parallel.py::test_tp_fused_decode_token_parity).

Replaces the NCCL/torch.distributed role of the reference's latent
multi-GPU path (SURVEY.md §2.3 "TP required for whisper-large-v3").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

_COL_SPLIT_KEYS = ("wq_c", "wk_c", "wv_c")
_COL_BIAS_KEYS = ("bq_c", "bv_c")


def tp_eligible(params, cfg, mesh) -> bool:
    """The fused TP decode needs: quantized unfused decoder weights, the
    self-attn kernel's head_dim-64 layout, and evenly divisible heads
    with an even local head count (the attnout+cross kernel pairs
    heads)."""
    if mesh is None or "model" not in mesh.axis_names:
        return False
    n = mesh.shape["model"]
    blocks = params["decoder"]["blocks"]
    from ttasr.ops.quant import is_quantized

    if not ("wq" in blocks and is_quantized(blocks["wq"])):
        return False
    h = cfg.decoder_heads
    dh = cfg.d_model // h
    if dh != 64:
        return False
    if n == 1:
        return True
    return h % n == 0 and (h // n) % 2 == 0


def _split_cols(leaf, n: int, part: int):
    """Slice a column-split (output-dim) weight/bias leaf for shard
    ``part``: quantized leaves slice q and s together (per-output-channel
    scales keep dims, so the last axis is the output axis for both)."""
    def sl(x):
        width = x.shape[-1] // n
        return x[..., part * width:(part + 1) * width]

    if isinstance(leaf, dict):  # quantized {q, s}
        return {"q": sl(leaf["q"]), "s": sl(leaf["s"])}
    return sl(leaf)


def _split_rows(leaf, n: int, part: int):
    """Slice a row-split (input-dim) weight leaf for shard ``part``
    (TP v2): only q's row axis (-2 — leaves are layer-stacked
    (L, D_in, D_out)) splits; the per-OUTPUT-channel scales stay full
    width (the scale is linear in the partial sum, each shard applies
    it to its partial before the psum)."""
    def sl(x):
        width = x.shape[-2] // n
        return x[..., part * width:(part + 1) * width, :]

    if isinstance(leaf, dict):  # quantized {q, s}
        return {"q": sl(leaf["q"]), "s": leaf["s"]}
    return sl(leaf)


def build_tp_decoder(params, n_shards: int,
                     row_parallel: bool = False) -> Tuple[Dict, Dict]:
    """Per-shard fused decoder param tree, stacked on a leading axis.

    Input: QUANTIZED, UNFUSED params (ttasr.ops.quant.quantize_params
    output).  For each shard i the self-attn q/k/v column slices fuse
    into the kernel's ``wqkv`` layout (mirroring ops.quant.fuse_qkv, but
    per shard — a plain column split of the global fused tensor would
    hand shard 0 all of q plus half of k, which is why GSPMD could not
    shard the fused layout).  Returns (tree, stacked) where ``stacked``
    is a same-structure pytree of bools marking leaves with the leading
    shard axis (shard_map in_spec P("model") vs P()).

    ``row_parallel`` (TP v2, VERDICT r4 #6a): additionally ROW-split
    wo / wo_c / w2 (input dim) and column-split w1 / b1, so the per-chip
    weight stream shrinks ~n_shards x; the decode path psums the partial
    sums (DecodingOptions.tp_row_parallel must be set to match).
    """
    import jax.numpy as jnp

    dec = params["decoder"]
    blocks = dec["blocks"]

    new_blocks: Dict[str, Any] = {}
    stacked_blocks: Dict[str, Any] = {}

    def stack(parts):
        if isinstance(parts[0], dict):
            return {k: jnp.stack([p[k] for p in parts]) for k in parts[0]}
        return jnp.stack(parts)

    # fused wqkv per shard
    wq, wk, wv = blocks["wq"], blocks["wk"], blocks["wv"]
    bq, bv = blocks["bq"], blocks["bv"]
    qkv_parts = []
    bqkv_parts = []
    for i in range(n_shards):
        q_i = _split_cols(wq, n_shards, i)
        k_i = _split_cols(wk, n_shards, i)
        v_i = _split_cols(wv, n_shards, i)
        qkv_parts.append({
            "q": jnp.concatenate([q_i["q"], k_i["q"], v_i["q"]], axis=-1),
            "s": jnp.concatenate([q_i["s"], k_i["s"], v_i["s"]], axis=-1),
        })
        bq_i = _split_cols(bq, n_shards, i)
        bqkv_parts.append(jnp.concatenate(
            [bq_i, jnp.zeros_like(bq_i), _split_cols(bv, n_shards, i)],
            axis=-1))
    new_blocks["wqkv"] = stack(qkv_parts)
    stacked_blocks["wqkv"] = {"q": True, "s": True}
    new_blocks["bqkv"] = stack(bqkv_parts)
    stacked_blocks["bqkv"] = True

    row_split = ("wo", "wo_c", "w2") if row_parallel else ()
    col_extra = ("w1", "b1") if row_parallel else ()
    for key, leaf in blocks.items():
        if key in ("wq", "wk", "wv", "bq", "bv"):
            continue
        if key in _COL_SPLIT_KEYS or key in _COL_BIAS_KEYS or key in col_extra:
            new_blocks[key] = stack(
                [_split_cols(leaf, n_shards, i) for i in range(n_shards)])
            stacked_blocks[key] = (
                {"q": True, "s": True} if isinstance(leaf, dict) else True)
        elif key in row_split:
            new_blocks[key] = stack(
                [_split_rows(leaf, n_shards, i) for i in range(n_shards)])
            stacked_blocks[key] = (
                {"q": True, "s": True} if isinstance(leaf, dict) else True)
        else:
            new_blocks[key] = leaf
            stacked_blocks[key] = (
                {"q": False, "s": False} if isinstance(leaf, dict) else False)

    new_dec = {k: (new_blocks if k == "blocks" else v)
               for k, v in dec.items()}
    stacked_dec = {
        k: (stacked_blocks if k == "blocks" else
            ({"q": False, "s": False} if isinstance(v, dict) and "q" in v
             else False))
        for k, v in dec.items()
    }
    return {"decoder": new_dec}, {"decoder": stacked_dec}


def place_tp_params(tp_params, stacked, mesh):
    """Put the stacked decoder on the mesh: stacked leaves shard their
    leading axis over "model"; the rest replicate."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x, is_stacked):
        spec = P("model") if is_stacked else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tp_params, stacked)


def _tp_specs(stacked):
    from jax.sharding import PartitionSpec as P

    import jax

    return jax.tree.map(lambda s: P("model") if s else P(), stacked)


def _unstack(tp_params, stacked):
    import jax

    return jax.tree.map(
        lambda x, s: x[0] if s else x, tp_params, stacked)


# jitted shard_map wrappers, cached per (mesh, cfg, opts, ti, beam/greedy)
_FN_CACHE: dict = {}


def _get_decode_fn(mesh, cfg, opts, ti, stacked_key, stacked, *,
                   beam: bool, row_parallel: bool = False):
    key = (id(mesh), cfg, opts, ti, stacked_key, beam, row_parallel)
    fn = _FN_CACHE.get(key)
    if fn is not None:
        return fn

    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ttasr.models.whisper.decode import _beam_decode, _greedy_decode

    data_n = mesh.shape.get("data", 1)
    specs = _tp_specs(stacked)
    tp_opts = dataclasses.replace(opts, tp_axis="model",
                                  tp_row_parallel=row_parallel)
    out_spec = {k: P("data") for k in
                ("tokens", "lengths", "sum_logprob", "no_speech_prob")}

    if beam:
        def body(p, enc, prompt, pad, rng):
            return _beam_decode(_unstack(p, stacked), cfg, enc, prompt, pad,
                                rng, opts=tp_opts, ti=ti)

        in_specs = (specs, P("data"), P("data"), P("data"), P())
    else:
        def body(p, enc, prompt, pad, rng, temp):
            # the key arrives replicated (P()); fold the data-shard index
            # in so temperature>0 sampling draws independent noise per
            # shard — identical keys would correlate row i across every
            # shard, diverging from single-chip sampling statistics
            # (ADVICE round 4 #3)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            return _greedy_decode(_unstack(p, stacked), cfg, enc, prompt,
                                  pad, rng, temp, opts=tp_opts, ti=ti)

        in_specs = (specs, P("data"), P("data"), P("data"), P(), P("data"))

    smapped = shard_map(body, mesh=mesh, in_specs=in_specs,
                        out_specs=out_spec, check_vma=False)

    def padded(p, enc, prompt, pad, rng, temp=None):
        import jax.numpy as jnp

        b = enc.shape[0]
        b_pad = -(-b // data_n) * data_n
        if b_pad != b:
            extra = b_pad - b
            enc = jnp.concatenate(
                [enc, jnp.broadcast_to(enc[:1], (extra,) + enc.shape[1:])])
            prompt = jnp.concatenate(
                [prompt, jnp.broadcast_to(prompt[:1],
                                          (extra,) + prompt.shape[1:])])
            pad = jnp.concatenate(
                [pad, jnp.broadcast_to(pad[:1], (extra,))])
            if temp is not None:
                temp = jnp.concatenate(
                    [temp, jnp.broadcast_to(temp[:1], (extra,))])
        out = (smapped(p, enc, prompt, pad, rng) if temp is None
               else smapped(p, enc, prompt, pad, rng, temp))
        if b_pad != b:
            out = {k: v[:b] for k, v in out.items()}
        return out

    fn = jax.jit(padded, static_argnames=())
    _FN_CACHE[key] = fn
    return fn


class TPDecoder:
    """Holds the mesh-placed stacked decoder and dispatches fused decode.

    Built once by WhisperEngine when the mesh + model shape qualify
    (:func:`tp_eligible`); ``beam``/``greedy`` mirror the signatures of
    decode.beam_decode / decode.greedy_decode minus params.
    """

    def __init__(self, params_quantized, cfg, mesh,
                 row_parallel: Optional[bool] = None):
        import os

        n = mesh.shape["model"]
        if row_parallel is None:
            # TP v2 by default when the shapes divide: the wo/wo_c/MLP
            # weight stream then splits over the model axis instead of
            # replicating (VERDICT r4 #6a).  TTASR_TP_ROW_PARALLEL=0
            # forces the v1 replicated-weight path.
            env = os.environ.get("TTASR_TP_ROW_PARALLEL", "1")
            row_parallel = (env.lower() not in ("0", "false", "no")
                            and n > 1 and cfg.ffn_dim % n == 0
                            and cfg.d_model % n == 0)
        self.row_parallel = bool(row_parallel)
        tree, stacked = build_tp_decoder(params_quantized, n,
                                         row_parallel=self.row_parallel)
        self.params = place_tp_params(tree, stacked, mesh)
        self.stacked = stacked
        # hashable cache key for the stacked structure (the pytree of
        # bools is a dict — not hashable; its repr is stable)
        self.stacked_key = repr(stacked)
        self.cfg = cfg
        self.mesh = mesh

    def beam(self, enc_out, prompt, pad_len, rng, *, opts, ti):
        fn = _get_decode_fn(self.mesh, self.cfg, opts, ti,
                            self.stacked_key, self.stacked, beam=True,
                            row_parallel=self.row_parallel)
        return fn(self.params, enc_out, np.asarray(prompt),
                  np.asarray(pad_len), rng)

    def greedy(self, enc_out, prompt, pad_len, rng, temperature, *,
               opts, ti):
        import jax.numpy as jnp

        fn = _get_decode_fn(self.mesh, self.cfg, opts, ti,
                            self.stacked_key, self.stacked, beam=False,
                            row_parallel=self.row_parallel)
        b = enc_out.shape[0]
        temp = jnp.broadcast_to(
            jnp.asarray(temperature, jnp.float32), (b,))
        return fn(self.params, enc_out, np.asarray(prompt),
                  np.asarray(pad_len), rng, temp)
