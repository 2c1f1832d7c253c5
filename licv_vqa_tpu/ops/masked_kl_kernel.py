"""Fused masked temperature-KL as a Pallas TPU kernel with custom VJP.

SURVEY.md §7 names masked-KL as a Pallas candidate: the XLA formulation
materializes two (B,S,V) softmaxes plus their logs (~6 full passes over the
logits); this kernel computes the per-row KL in ONE pass per operand (rows
resident in VMEM), and the backward recomputes the softmaxes in a single
fused pass that emits BOTH input gradients.

Math (per row, ε from the reference's ``kl_eps``):

    p = softmax(s),  q = softmax(t)
    KL = Σ_j q_j (log(q_j+ε) − log(p_j+ε))

    ∂KL/∂s_i = p_i·C − q_i p_i/(p_i+ε),      C = Σ_j q_j p_j/(p_j+ε)
    ∂KL/∂t_j = q_j (A_j − Σ_i q_i A_i),      A_i = log(q_i+ε) − log(p_i+ε)
                                                   + q_i/(q_i+ε)

(ε→0 recovers the classic p−q / q·(A−EA) forms.)  Temperature scaling and
the ×T² factor stay OUTSIDE the op, so learnable-temperature gradients flow
through both scaled operands by the ordinary chain rule.

Inputs are the (B,S,V) ALREADY temperature-scaled logits and the (B,S) answer
mask; output is the masked mean of per-row KLs.  Exposed via
``masked_kl_divergence(..., impl="pallas")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_softmax(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _kl_fwd_kernel(eps, stu_ref, tea_ref, out_ref):
    p = _row_softmax(stu_ref[:].astype(jnp.float32))
    q = _row_softmax(tea_ref[:].astype(jnp.float32))
    kl = jnp.sum(q * (jnp.log(q + eps) - jnp.log(p + eps)), axis=-1, keepdims=True)
    out_ref[:] = kl


def _kl_bwd_kernel(eps, stu_ref, tea_ref, g_ref, dstu_ref, dtea_ref):
    p = _row_softmax(stu_ref[:].astype(jnp.float32))
    q = _row_softmax(tea_ref[:].astype(jnp.float32))
    g = g_ref[:]  # (R, 1) per-row cotangent (mask weight folded in)
    c = jnp.sum(q * p / (p + eps), axis=-1, keepdims=True)
    dstu_ref[:] = (g * (p * c - q * p / (p + eps))).astype(dstu_ref.dtype)
    a = jnp.log(q + eps) - jnp.log(p + eps) + q / (q + eps)
    ea = jnp.sum(q * a, axis=-1, keepdims=True)
    dtea_ref[:] = (g * (q * (a - ea))).astype(dtea_ref.dtype)


def _tile_rows(n: int, v: int = 0) -> int:
    """Largest row tile that divides ``n`` AND keeps one (r, v) f32 block
    within a VMEM-friendly budget (the bwd kernel holds ~5 such blocks:
    stu, tea, g, dstu, dtea)."""
    # Measured on v5e: the fwd kernel's scoped-VMEM stack holds ~6 (r, v) f32
    # blocks (double-buffered inputs + softmax intermediates) against a 16 MiB
    # limit — r=32 at v=32000 OOMed at 24.4M.  1 MiB/block keeps ~6 MiB total.
    budget = 1024 * 1024  # 1 MiB per block
    for r in (256, 128, 64, 32, 16, 8):
        if n % r == 0 and (v == 0 or r * v * 4 <= budget or r == 8):
            return r
    return 8  # pad upstream guarantees multiples of 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rowwise_kl(stu2d, tea2d, eps: float, interpret: bool):
    return _rowwise_kl_fwd_impl(stu2d, tea2d, eps, interpret)


def _rowwise_kl_fwd_impl(stu2d, tea2d, eps, interpret):
    n, v = stu2d.shape
    r = _tile_rows(n, v)
    return pl.pallas_call(
        functools.partial(_kl_fwd_kernel, eps),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(stu2d, tea2d)


def _rowwise_kl_fwd(stu2d, tea2d, eps, interpret):
    return _rowwise_kl_fwd_impl(stu2d, tea2d, eps, interpret), (stu2d, tea2d)


def _rowwise_kl_bwd(eps, interpret, res, g):
    stu2d, tea2d = res
    n, v = stu2d.shape
    r = _tile_rows(n, v)
    dstu, dtea = pl.pallas_call(
        functools.partial(_kl_bwd_kernel, eps),
        out_shape=(
            jax.ShapeDtypeStruct((n, v), stu2d.dtype),
            jax.ShapeDtypeStruct((n, v), tea2d.dtype),
        ),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((r, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(stu2d, tea2d, g.astype(jnp.float32))
    return dstu, dtea


_rowwise_kl.defvjp(_rowwise_kl_fwd, _rowwise_kl_bwd)


def masked_kl_pallas(
    student_scaled: jax.Array,  # (B, S, V) logits ALREADY divided by T
    teacher_scaled: jax.Array,  # (B, S, V) aligned, scaled
    mask: jax.Array,  # (B, S) bool
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Masked mean of per-row KLs (×T² applied by the caller)."""
    b, s, v = student_scaled.shape
    n = b * s
    # pad rows to a sublane multiple; padded rows carry zero weight (the
    # fwd/bwd impls pick their own row-tile size via _tile_rows(n, v))
    pad = (-n) % 8
    stu2d = student_scaled.reshape(n, v)
    tea2d = teacher_scaled.reshape(n, v)
    w = mask.reshape(n).astype(jnp.float32)
    if pad:
        stu2d = jnp.pad(stu2d, ((0, pad), (0, 0)))
        tea2d = jnp.pad(tea2d, ((0, pad), (0, 0)))
        w = jnp.pad(w, (0, pad))
    denom = jnp.maximum(jnp.sum(w), 1.0)
    kl = _rowwise_kl(stu2d, tea2d, eps, interpret)[:, 0]  # (N',)
    # weighted mean as a dot so the custom VJP sees per-row cotangents w/Σw
    return jnp.dot(kl, w) / denom
