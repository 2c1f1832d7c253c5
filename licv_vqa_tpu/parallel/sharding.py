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


def _quantized_specs(path: tuple, leaf: dict) -> dict:
    """Specs for an int8 ``{"q","s"}`` / int4 ``{"q4","s"}`` weight leaf.

    The split rule is keyed on the PARENT name (``wq``/``wo``/…): classifying
    on the inner ``q``/``s`` keys would match nothing and silently replicate
    the whole quantized LMM — exactly the model tp exists to fit.  Layouts
    (ops/quantize.py): ``q`` (…, in, out); int8 ``s`` (…, 1, out) per-output
    scales; int4 ``q4`` (…, in/2, out) nibble-packed; int4 ``s``
    (…, in/G, 1, out) group scales along the contraction.
    """
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    parent = names[-1] if names else ""
    out = {}
    for key, sub in leaf.items():
        nd = sub.ndim
        if parent == "lm_head":
            # int8 head ({"q" (D, V), "s" (1, V)}): vocab-shard both, like
            # the dense lm_head rule above — per-output scales follow their
            # columns
            out[key] = P(*([None] * (nd - 1) + [AXIS_TP]))
        elif parent in _COLUMN_SPLIT:
            # out-features is the LAST dim of every component
            out[key] = P(*([None] * (nd - 1) + [AXIS_TP]))
        elif parent in _ROW_SPLIT:
            if key in ("q", "q4"):  # (…, in[/2], out): shard the contraction
                out[key] = P(*([None] * (nd - 2) + [AXIS_TP, None]))
            elif key == "s" and nd >= 3 and sub.shape[-2] == 1:
                # int4 group scales (…, in/G, 1, out) follow the contraction
                # split; int8 per-output scales (…, 1, out) replicate.
                # Distinguish by rank relative to q/q4: int8 s has the same
                # rank as q with a singleton -2; int4 s has one EXTRA dim.
                q_nd = leaf["q"].ndim if "q" in leaf else leaf["q4"].ndim
                if nd == q_nd + 1:
                    out[key] = P(*([None] * (nd - 3) + [AXIS_TP, None, None]))
                else:
                    out[key] = P()
            else:
                out[key] = P()
        else:
            out[key] = P()
    return out


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a model param pytree.

    Quantized weight leaves (int8/int4 dicts) get per-component specs so a
    ``lmm.quantize`` model still tp-shards (trainer ``strategy=dp_tp``,
    ``infer_tp`` serving) instead of silently replicating.
    """
    from ..ops.quantize import is_any_quantized_leaf

    def spec(path, leaf):
        if is_any_quantized_leaf(leaf):
            return _quantized_specs(path, leaf)
        return _leaf_spec(path, leaf)

    return jax.tree_util.tree_map_with_path(
        spec, params, is_leaf=is_any_quantized_leaf
    )


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
