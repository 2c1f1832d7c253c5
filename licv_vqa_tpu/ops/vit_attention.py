"""Pallas TPU kernel: fused short-sequence bidirectional attention (ViT).

The ViT-H tower's attention (s=257, head_dim=80) runs at ~10% MFU through
XLA: the einsum pair materializes (B, H, S, S) f32 scores in HBM, pays two
extra layout passes around the f32 softmax, and the head_dim-80 contraction
pads to 128 lanes.  The whole per-(batch, head) problem is tiny (~41 KB per
Q/K/V tile, 264 KB of f32 scores), so ONE kernel cell can hold a GROUP of
heads in VMEM and run QK^T -> softmax -> PV back-to-back on the MXU/VPU
with zero HBM round-trips for the scores.

This is NOT flash attention: no online softmax, no K/V streaming — the
whole (S, S) score block lives in VMEM, which is exactly right for s <= ~1k
where flash's block machinery previously LOST to XLA (layers.py
flash_bidir_usable: 17 ms vs 4 ms at s=257).  The group dimension G batches
heads per grid cell to amortize Mosaic's per-cell overhead.

Semantics match ``layers.dot_product_attention`` (f32 scores/softmax, probs
cast to the value dtype for PV, optional key-validity mask); tested
element-close on CPU interpret mode and validated on-chip by
tools/exp_vit_attn.py.  Reference context: the reference runs this tower
through HF's eager ViT attention on CUDA (CLIPVisionTransformer); the
kernel is the TPU-shaped answer to the same bandwidth problem.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # blocks: (G, S, Dh); one batched dot per cell keeps G heads' scores
    # resident in VMEM — no HBM score tensor, no separate softmax pass
    q = q_ref[:]
    k = k_ref[:]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)  # (G, S, S)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[:],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _kernel_masked(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    q = q_ref[:]
    k = k_ref[:]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)
    # mask block is (1, G, S) — Mosaic requires the last two block dims be
    # 8/128-tileable OR equal to the full array dims, so the mask rides in
    # as one leading grid dim + full (G, S) trailing dims
    scores = jnp.where(
        m_ref[0][:, None, :] != 0, scores, jnp.finfo(jnp.float32).min
    )
    probs = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[:],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _pick_group(bh: int, s: int, dh: int) -> int:
    """Heads per grid cell: largest divisor of B·H whose VMEM footprint
    (Q/K/V/O tiles + f32 scores, double-buffered inputs) stays well under
    the ~16 MB budget."""
    budget = 12 * 1024 * 1024
    for g in (16, 8, 4, 2, 1):
        if bh % g:
            continue
        tiles = 4 * g * s * dh * 2 * 2  # q,k,v,o bf16, x2 double-buffer
        scores = g * s * s * 4 * 2  # scores + probs f32
        if tiles + scores <= budget:
            return g
    return 1


def vit_attention_usable(s: int, dh: int) -> bool:
    """Gate — DEFAULT OFF (``LICV_VIT_FUSED_ATTN=1`` opts in on real TPU;
    ``LICV_VIT_ATTN_INTERPRET=1`` forces it through the Pallas interpreter
    for CPU integration tests).

    Measured verdict (v5e, ViT-H s=257 dh=80, bs=8): standalone the kernel
    is 1.7x XLA's attention (889 vs 1525 us — tools/exp_vit_attn.py), but
    IN-TOWER the full ViT forward is ~3% SLOWER with it (26.24 vs
    25.42 ms, same-session A/B via bench_prefill_tpu --vision-breakdown):
    XLA fuses the in-context attention with the surrounding projections
    well (its serial in-tower attention cost is ~141 us/layer, not the
    standalone probe's 1525 us — that baseline paid jit-boundary layout
    passes), and the pallas_call boundary forfeits that fusion.  Same
    story as the masked-KL kernel: correct, validated, kept as an
    alternative; XLA stays the default."""
    import os

    if os.environ.get("LICV_VIT_ATTN_INTERPRET") == "1":
        return s <= 1024
    return (
        jax.default_backend() == "tpu"
        and s <= 1024
        and os.environ.get("LICV_VIT_FUSED_ATTN", "0") == "1"
    )


def vit_attention_tpu(
    q: jax.Array,  # (B, S, H, Dh)
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,  # (B, S) bool key mask; None = all
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused bidirectional attention for short vision sequences.

    Matches ``layers.dot_product_attention(q, k, v, mask=valid[:,None,None,:])``
    up to f32 reduction order.  Invalid QUERY rows attend only valid keys
    (same convention as the XLA path — their outputs are masked downstream
    either way)."""
    import os

    # env resolved OUTSIDE the jitted core so the jit cache keys on the
    # effective interpret flag (CPU integration tests flip it per-test)
    interpret = interpret or os.environ.get("LICV_VIT_ATTN_INTERPRET") == "1"
    return _vit_attention_jit(q, k, v, valid, scale, interpret)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _vit_attention_jit(q, k, v, valid, scale, interpret):
    b, s, h, dh = q.shape
    scale = float(scale if scale is not None else 1.0 / np.sqrt(dh))
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, s, dh)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, s, dh)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, s, dh)
    g = _pick_group(b * h, s, dh)
    grid = (b * h // g,)
    spec = pl.BlockSpec((g, s, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if valid is None:
        out = pl.pallas_call(
            functools.partial(_kernel, scale=scale),
            out_shape=jax.ShapeDtypeStruct((b * h, s, dh), q.dtype),
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(qt, kt, vt)
    else:
        vm = jnp.repeat(valid.astype(jnp.int32), h, axis=0)  # (B*H, S)
        vm = vm.reshape(b * h // g, g, s)
        mspec = pl.BlockSpec(
            (1, g, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_kernel_masked, scale=scale),
            out_shape=jax.ShapeDtypeStruct((b * h, s, dh), q.dtype),
            grid=grid,
            in_specs=[spec, spec, spec, mspec],
            out_specs=spec,
            interpret=interpret,
        )(qt, kt, vt, vm)
    return out.reshape(b, h, s, dh).transpose(0, 2, 1, 3)
