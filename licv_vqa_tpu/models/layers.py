"""Transformer building blocks as pure functions over param pytrees.

Functional (no module framework): params are nested dicts of arrays, every
block is ``f(params, inputs, ...) -> outputs``.  This keeps scan-stacking of
layer params, sharding annotation, and weight conversion fully explicit.

Numerical conventions match HF LLaMA/Mistral so converted checkpoints are
bit-comparable: RMSNorm in f32, RoPE in the rotate-half formulation, softmax
in f32, SwiGLU MLP.  Kernels are stored (in_features, out_features).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def rms_norm(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    w: jax.Array, b: Optional[jax.Array], x: jax.Array, eps: float
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Rotary position embeddings (HF rotate-half convention)
# ---------------------------------------------------------------------------


def rope_cos_sin(
    positions: jax.Array,  # (B, S) int32
    head_dim: int,
    theta: float,
) -> tuple[jax.Array, jax.Array]:
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # (Dh/2,)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (B, S, Dh/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (B, S, Dh)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, H, Dh); cos/sin: (B, S, Dh)."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# ALiBi (MPT backbone for OpenFlamingo)
# ---------------------------------------------------------------------------


def alibi_slopes(n_heads: int) -> jax.Array:
    import math

    def pow2slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3.0)))
        return start ** jnp.arange(1, n + 1, dtype=jnp.float32)

    if math.log2(n_heads).is_integer():
        return pow2slopes(n_heads)
    closest = 2 ** math.floor(math.log2(n_heads))
    base = pow2slopes(closest)
    extra = pow2slopes(2 * closest)[0::2][: n_heads - closest]
    return jnp.concatenate([base, extra])


def alibi_bias(
    n_heads: int, q_pos: jax.Array, k_pos: jax.Array
) -> jax.Array:
    """ALiBi additive bias (B, H, Sq, Sk): ``-slope_h · (q_pos − k_pos)``."""
    slopes = alibi_slopes(n_heads)  # (H,)
    rel = (q_pos[:, :, None] - k_pos[:, None, :]).astype(jnp.float32)  # (B,Sq,Sk)
    return -slopes[None, :, None, None] * rel[:, None, :, :]


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """(B, S, KV, Dh) → (B, S, KV*n_rep, Dh)."""
    if n_rep == 1:
        return x
    b, s, kv, dh = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, kv, n_rep, dh)).reshape(
        b, s, kv * n_rep, dh
    )


def dot_product_attention(
    q: jax.Array,  # (B, Sq, H, Dh)
    k: jax.Array,  # (B, Sk, H, Dh)
    v: jax.Array,  # (B, Sk, H, Dh)
    bias: Optional[jax.Array] = None,  # broadcastable to (B, H, Sq, Sk)
    mask: Optional[jax.Array] = None,  # bool, broadcastable to (B, H, Sq, Sk)
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """MXU-friendly attention; softmax accumulates in f32."""
    dh = q.shape[-1]
    scale = scale if scale is not None else 1.0 / jnp.sqrt(dh).astype(jnp.float32)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def flash_attention_tpu(
    q: jax.Array,  # (B, S, H, Dh)
    k: jax.Array,
    v: jax.Array,
    valid: jax.Array,  # (B, S) 1=real token (right padding)
    scale: Optional[float] = None,
) -> jax.Array:
    """Causal flash attention via the Pallas TPU kernel (training/prefill).

    Padding is expressed as segment ids (pads form their own segment, so real
    tokens never attend them); outputs at pad positions are garbage and must
    be masked by the loss, same contract as the XLA path.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, s, h, dh = q.shape
    scale = float(scale if scale is not None else 1.0 / np.sqrt(dh))
    seg = valid.astype(jnp.int32) + 1  # pads=1, real=2 (0 is reserved-ish)
    # 256 is the v5e sweet spot (fits VMEM comfortably at dh=128) and keeps
    # the Mosaic program small — 512-blocks at seq 2048 stalled the axon
    # remote-compile path for >9 min in round 1 (TODO.md).  The kernel
    # requires blocks to DIVIDE s (flash_attention_usable guarantees
    # s % 128 == 0, but not s % 256: e.g. the ICL sweep's 384-token
    # bucket) — fall back to 128-blocks on odd 128-multiples.
    blk = 256 if s % 256 == 0 else 128
    blk = min(blk, s)
    sizes = BlockSizes(
        block_q=blk,
        block_k_major=blk,
        block_k=blk,
        block_b=1,
        block_q_major_dkv=blk,
        block_k_major_dkv=blk,
        block_k_dkv=blk,
        block_q_dkv=blk,
        block_k_major_dq=blk,
        block_k_dq=blk,
        block_q_dq=blk,
    )
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=True,
        sm_scale=scale,
        block_sizes=sizes,
    )
    return out.transpose(0, 2, 1, 3)


def flash_attention_usable(cfg, q_len: int, n_heads: int, head_dim: int) -> bool:
    """Static predicate: shapes the Pallas kernel tiles cleanly AND we are on
    a real TPU (the Mosaic kernel does not lower on the CPU test mesh)."""
    return (
        getattr(cfg, "attention_impl", "xla") == "flash"
        and jax.default_backend() == "tpu"
        and q_len >= 256
        and q_len % 128 == 0
        and head_dim % 128 == 0
    )


def flash_bidir_usable(s: int) -> bool:
    """Static predicate for the NON-causal (vision tower) flash path: real
    TPU only (Mosaic does not lower on the CPU test mesh), and only LONG
    vision sequences.  Measured on v5e (ViT-H s=257, bs=8, 32L): the Pallas
    kernel LOSES to XLA at short s (17 ms vs 4 ms — per-grid-cell Mosaic
    overhead at 128-blocks dominates when the whole score matrix is ~256 KB),
    but at SigLIP-NaViT lengths (s=4900: XLA materializes a (B,H,S,S) f32
    score tensor ≈ 1.5 GB/image) the flash kernel is the only sane path.
    ``LICV_VIT_FLASH=0`` kills the path."""
    import os

    return (
        jax.default_backend() == "tpu"
        and s >= 1024
        and os.environ.get("LICV_VIT_FLASH", "1") != "0"
    )


def flash_attention_bidir_tpu(
    q: jax.Array,  # (B, S, H, Dh)
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,  # (B, S) bool; None = all real
    scale: Optional[float] = None,
) -> jax.Array:
    """Bidirectional flash attention for the vision towers (Pallas TPU).

    S pads to the next 128 multiple; padded/invalid tokens go to segment 1
    (real tokens segment 2), so REAL tokens never attend them.  Outputs at
    invalid positions are garbage-by-contract: every consumer masks them
    (idefics2 perceiver ``kv_mask``; the CLIP towers have no invalid
    tokens).  Note the XLA path instead lets invalid QUERIES attend valid
    keys — both conventions only differ at positions downstream masks."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, s, h, dh = q.shape
    scale = float(scale if scale is not None else 1.0 / np.sqrt(dh))
    sp = -(-s // 128) * 128
    pad = sp - s
    if pad:
        pad4 = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = (jnp.pad(x, pad4) for x in (q, k, v))
    if valid is None:
        seg_row = jnp.ones((b, s), jnp.int32)
    else:
        seg_row = valid.astype(jnp.int32)
    seg = jnp.pad(seg_row, ((0, 0), (0, pad))) + 1  # real=2, pad/invalid=1
    blk = min(128, sp)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=False,
        sm_scale=scale,
        block_sizes=sizes,
    )
    return out.transpose(0, 2, 1, 3)[:, :s]


def causal_mask(
    q_positions: jax.Array,  # (B, Sq) absolute positions
    k_positions: jax.Array,  # (B, Sk)
    k_valid: Optional[jax.Array] = None,  # (B, Sk) bool padding mask
) -> jax.Array:
    """(B, 1, Sq, Sk) boolean mask: causal ∧ key-valid."""
    m = k_positions[:, None, :] <= q_positions[:, :, None]  # (B, Sq, Sk)
    if k_valid is not None:
        m = m & k_valid[:, None, :]
    return m[:, None, :, :]


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------


def swiglu_mlp(p: dict, x: jax.Array, a8: bool = False) -> jax.Array:
    from ..ops.int8_matmul import qdot

    gate = qdot(x, p["w_gate"], preferred_element_type=jnp.float32, a8=a8)
    up = qdot(x, p["w_up"], preferred_element_type=jnp.float32, a8=a8)
    h = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(
        x.dtype
    )
    return qdot(h, p["w_down"], preferred_element_type=jnp.float32, a8=a8).astype(
        x.dtype
    )


def gelu_mlp(p: dict, x: jax.Array, a8: bool = False) -> jax.Array:
    from ..ops.int8_matmul import qdot

    h = qdot(x, p["w_up"], preferred_element_type=jnp.float32, a8=a8).astype(
        jnp.float32
    )
    if "b_up" in p:
        h = h + p["b_up"].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    out = qdot(h, p["w_down"], preferred_element_type=jnp.float32, a8=a8).astype(
        jnp.float32
    )
    if "b_down" in p:
        out = out + p["b_down"].astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Init helpers
# ---------------------------------------------------------------------------


def dense_init(key, shape, dtype, scale: float = 0.02):
    # generate directly in the target dtype: avoids a transient f32 copy that
    # can OOM when random-initializing multi-GB bf16 weight stacks on-chip
    gen_dtype = dtype if dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    return (jax.random.normal(key, shape, gen_dtype) * scale).astype(dtype)
