"""Int8 weight-only quantization for the frozen LMM (decode acceleration).

Decode is weight-bandwidth bound (ARCHITECTURE.md): streaming int8 weights
halves HBM traffic vs bf16, and the dequant (one multiply per tile) fuses
into the matmul.  Per-OUTPUT-channel symmetric scales keep the error small on
LLM weight matrices; the ICV itself, norms, embeddings and the LM head stay
in bf16/f32.

A quantized leaf is ``{"q": int8 (..., in, out), "s": f32 (..., 1, out)}``;
``dequantize_tree`` restores a compute-dtype tree at scan-body entry, so the
layer code is unchanged — it just reads half the bytes from HBM.

Opt-in (outputs are NOT bit-identical to bf16): ``lmm.quantize=int8`` in the
config / ``quantize_layer_stack`` in code.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

_QKEYS = ("q", "s")


def is_quantized_leaf(x: Any) -> bool:
    return isinstance(x, dict) and set(x.keys()) == set(_QKEYS)


def quantize_array(w: jax.Array) -> dict:
    """Per-output-channel (last axis) symmetric int8."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # over in-features
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def _should_quantize(path: tuple, leaf: Any) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return False
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    # norm params live under an ``ln*`` dict as {"w","b"} (openflamingo's
    # gated-xattn ln_attn/ln_ff) — the bare "w" leaf key must not match the
    # projection patterns below
    if any(n.startswith("ln") for n in names):
        return False
    name = next((n for n in names[::-1] if n), "")
    # quantize the big projections; never norms/gates/latents
    return name.startswith(("w", "fc", "c_proj", "ff_"))


def quantize_layer_stack(layers: Any) -> Any:
    """Quantize every weight matrix in a (stacked) layer pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: quantize_array(leaf)
        if _should_quantize(path, leaf)
        else leaf,
        layers,
    )


def dequantize_tree(tree: Any, dtype) -> Any:
    """Restore compute-dtype weights; int8→dtype + per-channel scale fuses
    into the consuming matmul."""

    def dq(leaf):
        if is_quantized_leaf(leaf):
            return (leaf["q"].astype(jnp.float32) * leaf["s"]).astype(dtype)
        return leaf

    return jax.tree.map(dq, tree, is_leaf=is_quantized_leaf)


def quantize_kv_rows(x: jax.Array) -> tuple:
    """Per-(…, head) symmetric int8 over the LAST (head_dim) axis.

    For K/V cache rows (B, s, H, Dh): each token×head vector gets one scale
    — returns ``(q int8 (..., Dh), s f32 (..., 1))``; dequant is a fused
    elementwise multiply on the attention read."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jax.Array, s: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * s).astype(dtype)


def quantization_error(w: jax.Array) -> float:
    """Relative Frobenius error of round-tripping one matrix (diagnostics)."""
    qd = quantize_array(w)
    back = qd["q"].astype(jnp.float32) * qd["s"]
    wf = w.astype(jnp.float32)
    return float(jnp.linalg.norm(back - wf) / jnp.maximum(jnp.linalg.norm(wf), 1e-9))
