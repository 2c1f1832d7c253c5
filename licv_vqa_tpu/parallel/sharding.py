"""Sharding rules: how model params and batches lay out on the mesh.

The reference's parallelism is DDP/ZeRO-2 over NCCL (SURVEY.md §2.5); here
the entire distribution strategy is a set of ``PartitionSpec`` rules and XLA
GSPMD inserts the collectives over ICI:

- ``dp``: batch leading dim.  Gradients for the tiny ICV pytree reduce with
  one ``psum`` emitted by ``jit``.
- ``tp``: Megatron-style within-layer sharding of the frozen LMM — column
  split on QKV / MLP-in projections (output features), row split on the
  output projections (input features), so each block needs one all-reduce.
  Norms/embeddings replicate.  This is what lets the 9B frozen model exceed
  one chip's HBM.
- ``sp``: sequence dim of (B, S) batch leaves (``P(dp, sp)``); ring attention
  (parallel/ring.py) rotates K/V shards around the ``sp`` axis with
  ``ppermute`` so no device ever holds the full sequence.  Model params never
  shard over ``sp``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import AXIS_DP, AXIS_TP

# leaf-name → which axis of the kernel gets the tp shards.
_COLUMN_SPLIT = {"wq", "wk", "wv", "w_gate", "w_up", "fc", "w1"}  # out-features
_ROW_SPLIT = {"wo", "w_down", "c_proj", "w2"}  # in-features
_COLUMN_BIAS = {"bq", "bk", "bv", "b1"}


def _leaf_spec(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    name = names[-1] if names else ""
    nd = leaf.ndim
    if name in _COLUMN_SPLIT and nd >= 2:
        return P(*([None] * (nd - 1) + [AXIS_TP]))
    if name in _ROW_SPLIT and nd >= 2:
        return P(*([None] * (nd - 2) + [AXIS_TP, None]))
    if name in _COLUMN_BIAS and nd >= 1:
        return P(*([None] * (nd - 1) + [AXIS_TP]))
    if name == "lm_head" and nd == 2:  # (D, V): shard vocab
        return P(None, AXIS_TP)
    return P()


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a model param pytree."""
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def batch_spec(batch: Any) -> Any:
    """Every batch leaf shards its leading dim over dp."""
    return jax.tree.map(lambda _: P(AXIS_DP), batch)


def shard_params_and_batch(mesh: Mesh, params: Any, batch: Any):
    p = jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            param_specs(params),
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    b = jax.device_put(batch, NamedSharding(mesh, P(AXIS_DP)))
    return p, b
