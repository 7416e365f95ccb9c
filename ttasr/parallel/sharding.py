"""Mesh + sharding rules for the Whisper param pytree.

Tensor-parallel layout (Megatron-style column/row split, expressed as
PartitionSpecs; XLA lowers the implied collectives onto ICI):

- ``wq/wk/wv``  (L, d, d)   -> split the head/output dim:  P(None, None, "model")
- ``wo``        (L, d, d)   -> split the input dim:        P(None, "model", None)
- ``w1``        (L, d, ffn) -> split ffn:                  P(None, None, "model")
- ``w2``        (L, ffn, d) -> split ffn:                  P(None, "model", None)
- biases of column-split projections follow their outputs.
- ``embed``     (V, d)      -> split vocab:                P("model", None)
- layer norms, conv stems, positions: replicated.

Batch axes of activations shard over "data" (pure DP) — one spec from
:func:`data_pspec`.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def create_mesh(data: int = 1, model: int = 1, devices=None):
    """Build a Mesh(("data","model")) over the available devices."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    n = data * model
    if n > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


# column-split (output dim sharded) / row-split (input dim sharded) names
# ``wqkv``/``bqkv`` are the fused decoder qkv layout (ttasr.ops.quant
# .fuse_qkv): a concat of three column-split projections along the output
# dim, so the concat itself column-splits.
_COL_SPLIT = {"wq", "wk", "wv", "wq_c", "wk_c", "wv_c", "w1", "wqkv"}
_ROW_SPLIT = {"wo", "wo_c", "w2"}
_COL_BIAS = {"bq", "bv", "bq_c", "bv_c", "b1", "bqkv"}


def _leaf_spec(name: str, ndim: int, path: tuple):
    from jax.sharding import PartitionSpec as P

    in_blocks = "blocks" in path
    if name in _COL_SPLIT:
        return P(None, None, "model") if in_blocks else P(None, "model")
    if name in _ROW_SPLIT:
        return P(None, "model", None) if in_blocks else P("model", None)
    if name in _COL_BIAS:
        return P(None, "model") if in_blocks else P("model")
    if name == "embed":
        return P("model", None)
    return P()  # replicate: norms, conv stems, positions, row biases


def param_pspecs(params) -> Dict:
    """PartitionSpec pytree matching the param pytree."""
    import jax

    def spec(path, leaf):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        name = keys[-1]
        if name in ("q", "s") and len(keys) >= 2:
            # quantized leaf: the parent carries the weight name; scale
            # tensors ("s") of column-split weights shard like biases.
            parent = keys[-2]
            if name == "s":
                from jax.sharding import PartitionSpec as P

                if parent in _COL_SPLIT:
                    return (P(None, None, "model") if "blocks" in keys
                            else P(None, "model"))
                return P()
            name = parent
        return _leaf_spec(name, getattr(leaf, "ndim", 0), keys)

    return jax.tree_util.tree_map_with_path(spec, params)


def sanitize_spec(spec, shape, mesh):
    """Drop sharded axes that don't divide the dimension (e.g. an odd
    vocab size on a 2-way model axis falls back to replication)."""
    from jax.sharding import PartitionSpec as P

    cleaned = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            cleaned.append(None)
            continue
        axis_size = mesh.shape[axis]
        cleaned.append(axis if dim % axis_size == 0 else None)
    return P(*cleaned)


def shard_params(params, mesh):
    """Place params on the mesh according to :func:`param_pspecs`."""
    import jax
    from jax.sharding import NamedSharding

    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, sanitize_spec(s, x.shape, mesh))
        ),
        params,
        specs,
    )


def data_pspec(ndim: int = 1):
    """Batch-sharded spec: first axis over "data", rest replicated."""
    from jax.sharding import PartitionSpec as P

    return P("data", *([None] * (ndim - 1)))


# ---------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over the data axis
# ---------------------------------------------------------------------------

def _data_axes(mesh) -> tuple:
    return tuple(a for a in ("dcn_data", "data")
                 if a in mesh.axis_names and mesh.shape[a] > 1)


def zero1_moment_spec(param_spec, shape, mesh):
    """Extend a param's (sanitized) spec with data-axis sharding on the
    first free divisible dim — each data shard owns a slice of the AdamW
    m/v moments (ZeRO-1 stage: optimizer state partitioned over data
    parallelism; GSPMD inserts the gather at update time).

    Whisper's stacked-block layout makes dim 0 the layer axis (e.g.
    (32, 1280, 1280)), which divides typical data-axis sizes — so the
    moments of the big matrices shard cleanly even when the tensor dims
    are taken by the model axis.
    """
    from jax.sharding import PartitionSpec as P

    axes = _data_axes(mesh)
    if not axes:
        return sanitize_spec(param_spec, shape, mesh)
    dsize = int(np.prod([mesh.shape[a] for a in axes]))
    entry = axes if len(axes) > 1 else axes[0]
    base = list(tuple(sanitize_spec(param_spec, shape, mesh)))
    base += [None] * (len(shape) - len(base))
    for i, (dim, ax) in enumerate(zip(shape, base)):
        if ax is None and dim % dsize == 0 and dim >= dsize:
            base[i] = entry
            break
    return P(*base)


def shard_opt_state(opt_state, params, mesh):
    """Place an optax state on the mesh with ZeRO-1 moment sharding.

    Subtrees with the params' tree structure (AdamW ``mu``/``nu``) get
    :func:`zero1_moment_spec` placement; scalar bookkeeping (step counts)
    replicates.  Numerically identical to replicated state — only the
    placement changes; XLA lowers the implied reduce-scatter/all-gather.

    Reference context: large-v3 AdamW f32 state is ~12.4 GB and does not
    fit one 16 GB v5e next to params+grads (the reference sizes the same
    workload at a >=40 GB GPU, README.md:108) — sharding m/v over the
    data axis is what makes the run.sh recipe fit the mesh.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    specs = param_pspecs(params)
    pstruct = jax.tree.structure(params)

    def is_moment_tree(node):
        try:
            return jax.tree.structure(node) == pstruct
        except Exception:
            return False

    def place(node):
        if is_moment_tree(node):
            return jax.tree.map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(mesh, zero1_moment_spec(s, x.shape, mesh))
                ),
                node, specs,
            )
        return jax.device_put(node, NamedSharding(mesh, P()))

    return jax.tree.map(place, opt_state, is_leaf=is_moment_tree)
