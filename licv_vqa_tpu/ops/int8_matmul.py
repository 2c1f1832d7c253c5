"""Pallas TPU kernel: bf16-activation x int8-weight matmul for decode.

Decode is weight-bandwidth bound.  The ``dequantize_tree`` path asks XLA to
fuse ``(q.int8 -> f32 * s -> bf16) @ x``; whether the int8 stream survives
fusion or a bf16 copy gets materialized is up to the compiler.  This kernel
makes the good schedule explicit: int8 weight tiles stream HBM->VMEM, are
widened to bf16 *in VMEM*, hit the MXU against the (tiny-M) activations, and
the per-output-channel scale is applied to the (M, Nt) accumulator — so HBM
sees exactly one int8 byte per weight.

Layout contract matches ``ops.quantize.quantize_array``: ``q (K, N) int8``,
``s (1, N) f32`` (per-OUTPUT-channel symmetric scales; scaling commutes with
the K-contraction).  Used at decode step shapes (M = batch, K/N = 4k-11k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)  # widen int8 tile in VMEM
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


def _pick_tile(n: int, k: int) -> int:
    # q block is (K, Nt) int8, double-buffered, + its bf16 widening: keep
    # K*Nt under ~2 MiB so the scoped-VMEM stack stays well inside 16 MiB.
    budget = 2 * 1024 * 1024
    for nt in (1024, 512, 256, 128):
        if n % nt == 0 and k * nt <= budget:
            return nt
    return 0


def int8_matmul_usable(m: int, k: int, n: int) -> bool:
    """Gate for the standalone Pallas kernel — OFF by default.

    Measured on v5e (32L/4096d idefics int8 decode, bs=8): in ISOLATION the
    kernel ties the best XLA schedule (338 vs 342 us on 4096x11008), but
    INSIDE the decoder ``lax.scan`` it breaks XLA's cross-op pipelining and
    loses end-to-end (322 tok/s vs 425.8 for scale-on-output vs 405 for
    dequantize_tree).  The winning in-scan schedule is the scale-on-output
    fallback in ``qdot`` below; set ``LICV_INT8_PALLAS=1`` to re-enable the
    kernel for experiments.  m <= 64: decode steps only — prefill/training
    matmuls are compute-bound (autodiff through the kernel path is handled
    by ``_frozen_weight_vjp`` in ``qdot``)."""
    import os

    return (
        os.environ.get("LICV_INT8_PALLAS") == "1"
        and jax.default_backend() == "tpu"
        and m % 8 == 0
        and m <= 64
        and k % 32 == 0
        and _pick_tile(n, k) > 0
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_matmul_pallas(
    x: jax.Array,  # (M, K) bf16/f32
    q: jax.Array,  # (K, N) int8
    s: jax.Array,  # (1, N) f32
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, n = q.shape
    nt = _pick_tile(n, k)
    if nt == 0:
        raise ValueError(f"untileable int8 matmul shape K={k} N={n}")
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(n // nt,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nt), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, nt), lambda j: (0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), q, s.astype(jnp.float32))


def _frozen_weight_vjp(matmul, dense_weight):
    """Make a Pallas quantized-weight matmul differentiable w.r.t. ``x``.

    The kernels define no VJP rule, but the quantized weight stacks are
    frozen in ICV training (only the encoder trains — reference
    icv_src/icv_module.py), so the only cotangent ever needed is the
    activation one: ``gx = gy @ W^T`` with ``W`` the exact dequantized
    weight — the same linear map the kernel applies, up to bf16 rounding.
    ``dense_weight`` is a thunk so the widened weight is materialized only
    on the backward pass; inference pays nothing.
    """

    @jax.custom_vjp
    def f(xm):
        return matmul(xm)

    def fwd(xm):
        return matmul(xm), jnp.zeros((), xm.dtype)

    def bwd(x_proto, gy):
        wdq = dense_weight().astype(jnp.float32)
        gx = jnp.dot(gy.astype(jnp.float32), wdq.T)
        return (gx.astype(x_proto.dtype),)

    f.defvjp(fwd, bwd)
    return f


def quantize_act_rows(x: jax.Array):
    """Dynamic per-row symmetric int8 quantization of activations.

    ``x (..., K)`` → ``(int8 plane, f32 scale (..., 1))`` with
    ``scale = absmax/127`` over the contraction dim.  Per-row scales commute
    out of a ``(..., K) @ (K, N)`` contraction (they are constant along K),
    so ``(x_q @ w_q) * sx * sw`` recovers the product of the two rounded
    operands exactly — the only error is the two roundings themselves.
    All-zero rows get a floor scale instead of a 0/0."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _w8a8_dot(x: jax.Array, q: jax.Array, s: jax.Array, out_dtype):
    """int8-activation x int8-weight matmul on the MXU's double-rate path.

    Both operands enter ``dot_general`` as int8 with an int32 accumulator —
    on TPU XLA lowers s8s8s32 to the MXU at 2x the bf16 FLOP rate (v5e: 394
    TOPS vs 197 TFLOPS), which is the whole point: prefill/bind matmuls are
    compute-bound, unlike decode where the int8 win is pure bandwidth.  The
    per-row activation scale and per-output-column weight scale both commute
    out of the K-contraction and apply to the f32 accumulator."""
    xq, xs = quantize_act_rows(x)
    acc = jax.lax.dot_general(
        xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * s).astype(out_dtype)


def qdot(x: jax.Array, w, preferred_element_type=None, a8: bool = False):
    """``x @ w`` where ``w`` is a plain array OR a ``{"q", "s"}`` int8 /
    ``{"q4", "s"}`` int4 quantized leaf.  Leading dims of ``x`` are
    flattened.  Quantized decode-shaped matmuls take the Pallas kernel
    (wrapped with an activation-only VJP so ``jax.grad`` works through it);
    everything else falls back to dequant(+scale-on-output)+dot, which is
    natively differentiable.

    ``a8=True`` (callers gate it on a static token count — see
    ``decoder.W8A8_MIN_TOKENS``) additionally quantizes the ACTIVATIONS
    per-row and runs the int8xint8->int32 MXU path (``_w8a8_dot``) when
    ``w`` is an int8 leaf — a compute-side ~2x for prefill/bind shapes, at
    the cost of one extra rounding on the activations (not bit-parity with
    the weight-only path; opt in with ``lmm.w8a8_prefill=true``).  int4
    leaves ignore ``a8``: their group scales vary along the contraction, so
    scale-on-output — which the int32 accumulator requires — is impossible.
    Gradients route through the dequantized weight (straight-through on the
    activation rounding), matching the frozen-weight training contract."""
    from .quantize import dequantize_int4, is_quantized4_leaf, is_quantized_leaf

    if is_quantized4_leaf(w):
        packed, s = w["q4"], w["s"]
        lead = x.shape[:-1]
        m = 1
        for d in lead:
            m *= d
        if packed.ndim == 2:
            from .int4_matmul import int4_matmul_pallas, int4_matmul_usable

            k2, n = packed.shape
            k, kg = 2 * k2, s.shape[-3]
            g = k // kg
            mp = -(-m // 8) * 8  # kernel wants sublane-aligned M; beam
            if int4_matmul_usable(mp, k, n, g):  # decode is M=beams (e.g. 3)
                xm = x.reshape(m, k)
                if mp != m:
                    xm = jnp.pad(xm, ((0, mp - m), (0, 0)))
                odt = preferred_element_type or x.dtype
                mm = _frozen_weight_vjp(
                    lambda xv: int4_matmul_pallas(
                        xv, packed, s.reshape(kg, n), g, out_dtype=odt
                    ),
                    lambda: dequantize_int4(w, jnp.bfloat16),
                )
                return mm(xm)[:m].reshape(*lead, n)
        # fallback: dequantize on the weight read.  Group scales vary along
        # the contraction so scale-on-output is impossible, and XLA
        # materializes the widened weight — slower than bf16; the Pallas
        # kernel above is the production decode path.
        wdq = dequantize_int4(w, x.dtype)
        return jnp.dot(x, wdq, preferred_element_type=preferred_element_type)
    if not is_quantized_leaf(w):
        return jnp.dot(x, w, preferred_element_type=preferred_element_type)
    out_dtype = preferred_element_type or x.dtype
    q, s = w["q"], w["s"]
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    if a8:
        mm = _frozen_weight_vjp(
            lambda xv: _w8a8_dot(xv, q, s, out_dtype),
            lambda: q.astype(jnp.float32) * s,
        )
        return mm(x.reshape(m, q.shape[0])).reshape(*lead, q.shape[1])
    if int8_matmul_usable(m, q.shape[0], q.shape[1]):
        mm = _frozen_weight_vjp(
            lambda xv: int8_matmul_pallas(xv, q, s, out_dtype=out_dtype),
            lambda: q.astype(jnp.float32) * s,
        )
        return mm(x.reshape(m, q.shape[0])).reshape(*lead, q.shape[1])
    # scale-on-output: per-output-channel scales commute with the contraction,
    # so the int8->compute-dtype widening feeds the dot without an extra
    # full-weight f32 multiply pass
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * s).astype(out_dtype)
