"""Distributed execution: mesh construction and sharding rules.

The reference has no explicit parallelism (latent NCCL via HF Trainer,
never exercised — SURVEY.md §2.3).  Here parallelism is first-class:
a ``Mesh(("data", "model"))`` with batch sharded over ``data`` (DP) and
attention heads / MLP hidden / vocab sharded over ``model`` (TP), with
XLA inserting all-reduces over ICI.
"""

from ttasr.parallel.sharding import (
    create_mesh,
    param_pspecs,
    shard_params,
    data_pspec,
)

__all__ = ["create_mesh", "param_pspecs", "shard_params", "data_pspec"]
