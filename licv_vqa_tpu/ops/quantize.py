"""Int8/int4 weight-only quantization for the frozen LMM (decode acceleration).

Decode is weight-bandwidth bound (ARCHITECTURE.md): streaming int8 weights
halves HBM traffic vs bf16 (int4 quarters it), and the dequant fuses into
the matmul.  The ICV itself, norms, embeddings and the LM head stay in
bf16/f32.

- int8 leaf: ``{"q": int8 (..., in, out), "s": f32 (..., 1, out)}`` —
  per-OUTPUT-channel symmetric scales (scale commutes with the contraction,
  so ``qdot`` can scale on the output).
- int4 leaf: ``{"q4": uint8 (..., in/2, out), "s": bf16 (..., in/G, 1, out)}``
  — GROUP-WISE symmetric scales over G input features per output channel
  (15 levels need finer granularity than a whole column; round-to-nearest,
  G=64 default).  Scales vary along the contraction, so dequant happens on
  the weight read (XLA fuses the unpack+widen+multiply into the matmul
  operand).  Storage is NIBBLE-PACKED uint8 (two signed 4-bit values + 8;
  low nibble = in-feature ``i``, high nibble = in-feature ``i + in/2``, so
  dequant is a half-plane concat, never an interleave) rather than
  jnp.int4: HBM bytes are identical, and materialized S4 arrays cannot
  cross a jit boundary on the axon TPU backend (device_put of the
  packed-tile layout recurses).

``dequantize_tree`` restores a compute-dtype tree at scan-body entry, so the
layer code is unchanged — it just reads fewer bytes from HBM.

Opt-in (outputs are NOT bit-identical to bf16): ``lmm.quantize=int8|int4``
in the config / ``quantize_layer_stack(..., mode=...)`` in code.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

_QKEYS = ("q", "s")
_Q4KEYS = ("q4", "s")
INT4_GROUP = 64


def is_quantized_leaf(x: Any) -> bool:
    return isinstance(x, dict) and set(x.keys()) == set(_QKEYS)


def is_quantized4_leaf(x: Any) -> bool:
    return isinstance(x, dict) and set(x.keys()) == set(_Q4KEYS)


def is_any_quantized_leaf(x: Any) -> bool:
    return is_quantized_leaf(x) or is_quantized4_leaf(x)


def quantize_array(w: jax.Array) -> dict:
    """Per-output-channel (last axis) symmetric int8."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # over in-features
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def _int4_group(k: int, group: int = INT4_GROUP) -> int:
    for g in (group, 64, 32):
        if k % g == 0:
            return g
    return k  # degenerate: one group per column


# MSE-optimal clipping candidates (fractions of the group absmax).  Plain
# absmax scaling wastes levels on the group's single largest weight; a short
# per-group search recovers ~10% of the RMS error for free (data-free RTN —
# the standard llama.cpp/AWQ-less recipe).
_INT4_CLIP_CANDS = (1.0, 0.95, 0.9, 0.85)


@partial(jax.jit, static_argnames=("group",))
def _quantize_int4_jit(w: jax.Array, group: int) -> dict:
    *lead, k, n = w.shape
    g = group
    wf = w.astype(jnp.float32).reshape(*lead, k // g, g, n)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., k/g, 1, n)
    best_e = best_s = None
    for c in _INT4_CLIP_CANDS:
        s = jnp.maximum(amax * c, 1e-8) / 7.0
        q = jnp.clip(jnp.round(wf / s), -7, 7)
        e = jnp.sum((q * s - wf) ** 2, axis=-2, keepdims=True)
        if best_e is None:
            best_e, best_s = e, s
        else:
            best_s = jnp.where(e < best_e, s, best_s)
            best_e = jnp.minimum(e, best_e)
    best_s = best_s.astype(jnp.bfloat16).astype(jnp.float32)  # storage dtype
    qi = jnp.clip(jnp.round(wf / best_s), -7, 7).astype(jnp.int8)
    qi = qi.reshape(*lead, k, n)
    # nibble-pack HALF-PLANES (low nibble = in-feature i, high = i + k/2):
    # dequant is then a plane concat — no element interleave — and the
    # Pallas kernel can dot each plane against its x half directly.
    # MIXED-PLANE encoding (dictated by what Mosaic legalizes — 8-bit masks
    # and i8→bf16 casts yes, 8-bit/16-bit shifts NO):
    #   low nibble  = q_lo + 8          (biased; (u & 15) as i8 = q_lo + 8)
    #   high nibble = q_hi two's compl. ((u & 0xF0) as i8 = 16 * q_hi)
    # so the kernel unpacks both planes with two masks and zero shifts; the
    # 16× folds into the high-plane scales and the +8 into one tiny
    # correction matmul outside the kernel.
    k2 = k // 2
    lo = (qi[..., :k2, :] + 8).astype(jnp.uint8)
    hi = (qi[..., k2:, :].astype(jnp.uint8)) & 0xF
    packed = lo | (hi << 4)
    return {"q4": packed, "s": best_s.astype(jnp.bfloat16)}


def quantize_array_int4(w: jax.Array, group: int = INT4_GROUP) -> dict:
    """Group-wise (G input features × one output channel) symmetric int4,
    nibble-packed into uint8 (see module docstring for the leaf format).

    Round-to-nearest with a per-group MSE-optimal clip search.  Expect ~10%
    relative weight RMS error at G=64 (vs ~0.4% for per-channel int8) —
    int4 is a serving-throughput/accuracy TRADE-OFF; validate task metrics
    on real checkpoints before production use.  Scales are bf16 (6% byte
    overhead at G=64; scale rounding adds ~0.4% error, negligible vs the
    4-bit grid)."""
    *_, k, _ = w.shape
    if k % 2:
        raise ValueError(f"int4 nibble packing requires even in-features, got {k}")
    return _quantize_int4_jit(w, _int4_group(k, group))


def dequantize_int4(leaf: dict, dtype) -> jax.Array:
    packed, s = leaf["q4"], leaf["s"]
    *lead, k2, n = packed.shape
    k = 2 * k2
    kg = s.shape[-3]
    lo = (packed & 0xF).astype(jnp.int8) - 8  # biased low plane
    hi = jax.lax.shift_right_arithmetic(  # two's-complement high plane
        jax.lax.bitcast_convert_type(packed, jnp.int8), jnp.int8(4)
    )
    q = jnp.concatenate([lo, hi], axis=-2)  # half-plane layout (see pack)
    wf = q.astype(jnp.float32).reshape(*lead, kg, k // kg, n) * s
    return wf.reshape(*lead, k, n).astype(dtype)


def _should_quantize(path: tuple, leaf: Any) -> bool:
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return False
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    # norm params live under a norm-named dict as {"w","b"} (openflamingo's
    # gated-xattn ln_attn/ln_ff, the perceiver's ctx_ln/lat_ln/mlp_ln/q_ln/
    # k_ln) — the bare "w" leaf key must not match the projection patterns
    # below
    if any(
        n.startswith("ln") or n.endswith("_ln") or "norm" in n for n in names
    ):
        return False
    name = next((n for n in names[::-1] if n), "")
    # quantize the big projections; never norms/gates/latents
    return name.startswith(("w", "fc", "c_proj", "ff_"))


def quantize_layer_stack(layers: Any, mode: str = "int8") -> Any:
    """Quantize every weight matrix in a (stacked) layer pytree."""
    quant = {"int8": quantize_array, "int4": quantize_array_int4}[mode]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: quant(leaf)
        if _should_quantize(path, leaf)
        else leaf,
        layers,
    )


def dequantize_tree(tree: Any, dtype) -> Any:
    """Restore compute-dtype weights; the int→dtype widen + scale multiply
    fuses into the consuming matmul."""

    def dq(leaf):
        if is_quantized_leaf(leaf):
            return (leaf["q"].astype(jnp.float32) * leaf["s"]).astype(dtype)
        if is_quantized4_leaf(leaf):
            return dequantize_int4(leaf, dtype)
        return leaf

    return jax.tree.map(dq, tree, is_leaf=is_any_quantized_leaf)


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


def quantization_error(w: jax.Array, mode: str = "int8") -> float:
    """Relative Frobenius error of round-tripping one matrix (diagnostics)."""
    if mode == "int4":
        back = dequantize_int4(quantize_array_int4(w), jnp.float32)
    else:
        qd = quantize_array(w)
        back = qd["q"].astype(jnp.float32) * qd["s"]
    wf = w.astype(jnp.float32)
    return float(jnp.linalg.norm(back - wf) / jnp.maximum(jnp.linalg.norm(wf), 1e-9))
