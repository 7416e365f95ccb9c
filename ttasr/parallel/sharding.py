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
