"""Fused ICV residual-stream injection: ``h' = (h+v) / ‖h+v‖₂ · ‖h‖₂``.

This is the core intervention of L-ICV.  The reference applies it through a
baukit ``TraceDict`` forward hook that fires per layer per decode step from
Python (reference: icv_src/icv_model/icv_intervention.py:61-86; its README:14
notes the hook path "consumes more GPU memory and slow[s] the inference
speed").  Here it is a native term inside the scanned decoder layer, so XLA
fuses it into the surrounding matmuls — zero host round-trips — and a Pallas
kernel is provided for the standalone op.

Math (per token, last dim D): ``s = h + v``; ``h' = s * (‖h‖₂ / ‖s‖₂)``.
Norms accumulate in float32 regardless of the compute dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 0.0  # the reference adds no epsilon; keep bit-for-bit semantics


def icv_inject_reference(h: jax.Array, shift: jax.Array) -> jax.Array:
    """Pure-jnp injection. ``h``: (..., D); ``shift`` broadcastable to ``h``."""
    hf = h.astype(jnp.float32)
    sf = hf + shift.astype(jnp.float32)
    h_norm = jnp.linalg.norm(hf, axis=-1, keepdims=True)
    s_norm = jnp.linalg.norm(sf, axis=-1, keepdims=True)
    return (sf * (h_norm / s_norm)).astype(h.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _inject_kernel(h_ref, v_ref, out_ref):
    h = h_ref[:].astype(jnp.float32)
    s = h + v_ref[:].astype(jnp.float32)
    h_sq = jnp.sum(h * h, axis=-1, keepdims=True)
    s_sq = jnp.sum(s * s, axis=-1, keepdims=True)
    # ratio of norms via rsqrt of ratio of squares: one transcendental/row
    scale = jax.lax.rsqrt(s_sq) * jnp.sqrt(h_sq)
    out_ref[:] = (s * scale).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _icv_inject_pallas(
    h: jax.Array, shift: jax.Array, block_rows: int = 256, interpret: bool = False
):
    """h: (B, S, D); shift: (D,), (B, D) or (B, 1, D) — row-constant only
    (the dispatch gate sends per-position shifts to the jnp fallback)."""
    b, s, d = h.shape
    if shift.ndim == 3:
        shift = shift[:, 0]  # (B, 1, D) → (B, D); gate guarantees S dim == 1
    shift = jnp.broadcast_to(shift, (b, d))
    shift = shift[:, None, :]  # (B, 1, D) so the block can equal the array dims
    ts = min(block_rows, _round_up(s, 8))
    grid = (b, pl.cdiv(s, ts))
    return pl.pallas_call(
        _inject_kernel,
        out_shape=jax.ShapeDtypeStruct(h.shape, h.dtype),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, ts, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ts, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(h, shift)


# ---------------------------------------------------------------------------
# Public op with custom VJP (forward = Pallas, backward = fused XLA)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def icv_inject(h: jax.Array, shift: jax.Array) -> jax.Array:
    """Injection with Pallas forward on TPU, jnp fallback elsewhere."""
    return _dispatch(h, shift)


def _dispatch(h, shift):
    # the kernel broadcasts ONE shift row per batch element; a per-position
    # (B, S>1, D) shift must take the jnp path or position 0's row would be
    # silently applied everywhere
    row_constant = shift.ndim <= 2 or shift.shape[-2] == 1
    if (
        h.ndim == 3
        and row_constant
        and jax.default_backend() == "tpu"
        and h.shape[-1] % 128 == 0
    ):
        return _icv_inject_pallas(h, shift)
    return icv_inject_reference(h, shift)


def _fwd(h, shift):
    return _dispatch(h, shift), (h, shift)


def _bwd(res, g):
    h, shift = res
    # Differentiate the reference formulation; XLA fuses this into a few
    # elementwise passes.  d/dh includes the h-norm term; d/dv only the
    # s-path.  Let n_h=‖h‖, n_s=‖s‖, r=n_h/n_s, out = s*r.
    hf = h.astype(jnp.float32)
    sf = hf + jnp.broadcast_to(shift, h.shape).astype(jnp.float32)
    gf = g.astype(jnp.float32)
    n_h = jnp.linalg.norm(hf, axis=-1, keepdims=True)
    n_s = jnp.linalg.norm(sf, axis=-1, keepdims=True)
    r = n_h / n_s
    gs = jnp.sum(gf * sf, axis=-1, keepdims=True)
    # d out/d s = r * (I - s sᵀ/n_s²);  d out/d n_h = s/n_s
    ds = r * (gf - sf * (gs / (n_s * n_s)))
    dn_h = gs / n_s  # scalar per row
    dh_extra = dn_h * (hf / n_h)
    dh = (ds + dh_extra).astype(h.dtype)
    dv_full = ds.astype(jnp.float32)
    # reduce to shift's shape (it broadcasts over leading/seq dims)
    dv = _reduce_to_shape(dv_full, shift.shape).astype(shift.dtype)
    return dh, dv


def _reduce_to_shape(x: jax.Array, shape: tuple) -> jax.Array:
    while x.ndim > len(shape):
        x = x.sum(axis=0)
    for i, (xs, ts) in enumerate(zip(x.shape, shape)):
        if ts == 1 and xs != 1:
            x = x.sum(axis=i, keepdims=True)
    return x


icv_inject.defvjp(_fwd, _bwd)
