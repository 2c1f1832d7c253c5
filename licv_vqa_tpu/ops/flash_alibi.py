"""Pallas TPU flash attention with in-kernel ALiBi (MPT / OpenFlamingo).

The stock Pallas flash kernel takes ALiBi only as a materialized
``(B, H, S, S)`` bias operand — which defeats flash's whole point at ICL
teacher lengths.  This kernel computes the bias on the fly from the per-head
slope: q blocks stream; each (batch, head) program keeps the full K/V rows
resident in VMEM (S·Dh·2B ≈ 0.5–1 MiB at S=2048–4096, and the block index
map is constant in the q-block grid dim so Mosaic fetches K/V once per
(b, h)); scores, softmax, and the ALiBi term run in f32 on (blk_q, S) tiles.

Contract matches ``layers.flash_attention_tpu``: RIGHT-padded batches
(``valid`` marks real tokens; q_pos == absolute index for all real tokens),
causal, outputs at pad positions are garbage and must be masked by the loss.

Gradient: ``custom_vjp`` recomputes through the dense XLA path — the hot
user is the 32-shot TEACHER forward, which is ``stop_gradient``-ed in the
ICV objective (icv/module.py), so the backward never runs there; a student
forward long enough to fire the kernel still gets correct (dense-recompute)
gradients.

Reference behavior being replaced: the reference runs HF MPT's eager ALiBi
attention under baukit hooks (reference: utils.py:51-67 model stack).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -0.7 * float(np.finfo(np.float32).max)


def _kernel(slope_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, *, scale, blk_q):
    iq = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)  # (blk_q, dh)
    k = k_ref[0, 0].astype(jnp.float32)  # (S, dh)
    v = v_ref[0, 0].astype(jnp.float32)
    valid = valid_ref[0]  # (1, S) int32
    slope = slope_ref[0, 0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (blk_q, S)
    seq = s.shape[1]
    qpos = iq * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, seq), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (blk_q, seq), 1)
    s = s - slope * (qpos - kpos).astype(jnp.float32)
    mask = (kpos <= qpos) & (valid > 0)
    s = jnp.where(mask, s, NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(mask, p, 0.0)
    l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _flash_alibi_fwd_impl(
    q: jax.Array,  # (B, S, H, Dh)
    k: jax.Array,
    v: jax.Array,
    valid: jax.Array,  # (B, S) 1=real (right padding)
    slopes: jax.Array,  # (H,) f32
    *,
    scale: float,
    blk_q: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    b, s, h, dh = q.shape
    if blk_q is None:  # largest v5e-friendly block dividing the (padded) seq
        blk_q = 256 if s % 256 == 0 else 128
    assert s % blk_q == 0, (s, blk_q)
    qt = q.transpose(0, 2, 1, 3)  # (B, H, S, Dh)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    valid2 = valid.astype(jnp.int32).reshape(b, 1, s)
    # (H, 1, 128): the (1, 1, 128) block's last two dims EQUAL the array's,
    # satisfying the Mosaic (8, 128) tiling rule for small per-head rows
    slopes2 = jnp.broadcast_to(
        slopes.astype(jnp.float32)[:, None, None], (h, 1, 128)
    )

    grid = (b, h, s // blk_q)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, blk_q=blk_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda bi, hi, qi: (hi, 0, 0)),
            pl.BlockSpec((1, 1, blk_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)),
            # constant in qi: Mosaic keeps K/V resident across q blocks
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, blk_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), q.dtype),
        interpret=interpret,
    )(slopes2, qt, kt, vt, valid2)
    return out.transpose(0, 2, 1, 3)


def _dense_reference(q, k, v, valid, slopes, scale):
    from ..models import layers as L

    b, s = q.shape[0], q.shape[1]
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    bias = -slopes.astype(jnp.float32)[None, :, None, None] * (
        pos[:, :, None] - pos[:, None, :]
    ).astype(jnp.float32)[:, None]
    mask = L.causal_mask(pos, pos, valid.astype(bool))
    return L.dot_product_attention(q, k, v, bias=bias, mask=mask, scale=scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_alibi_attention(q, k, v, valid, slopes, scale):
    return _flash_alibi_fwd_impl(q, k, v, valid, slopes, scale=scale)


def _fwd(q, k, v, valid, slopes, scale):
    return _flash_alibi_fwd_impl(q, k, v, valid, slopes, scale=scale), (
        q, k, v, valid, slopes,
    )


def _bwd(scale, res, g):
    q, k, v, valid, slopes = res
    # dense recompute — only ever taken by a differentiated long student
    # forward; the hot teacher forward is stop_gradient-ed
    _, vjp = jax.vjp(
        lambda q, k, v: _dense_reference(q, k, v, valid, slopes, scale), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


flash_alibi_attention.defvjp(_fwd, _bwd)


def flash_alibi_usable(cfg, q_len: int, head_dim: int) -> bool:
    """Static predicate mirroring ``layers.flash_attention_usable``."""
    return (
        getattr(cfg, "attention_impl", "xla") == "flash"
        and jax.default_backend() == "tpu"
        and q_len >= 128
        and q_len % 128 == 0
        and head_dim % 128 == 0
    )
