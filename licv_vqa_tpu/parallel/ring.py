"""Ring attention over the ``sp`` mesh axis (sequence parallelism).

The reference has no sequence parallelism (its teacher forward materializes
full (B, H, S, S) score tensors on one GPU); SURVEY.md §5.7 plumbs an ``sp``
mesh axis for exactly this op.  Long ICL teacher sequences (32 shots ≈ 2-8K
tokens) shard their sequence dim across ``sp`` devices; each device keeps its
local Q block resident and the K/V blocks rotate around the ring via
``ppermute`` (one ICI hop per step), with softmax accumulated online in f32
— the flash-attention recurrence, distributed.  Per-device score memory
drops from (B, H, S, S) to (B, H, S/sp, S/sp) and K/V are never
all-gathered.

Built on ``shard_map`` over an ``AbstractMesh`` (static axis names/sizes
only, resolved against the caller's concrete mesh from the operand
shardings), so model code needs no mesh object — just a ``RingSpec``.

Semantics match ``layers.dot_product_attention`` with a causal+padding mask
built from absolute positions: scale → optional tanh softcap → optional
ALiBi bias → mask → softmax(f32).  Heads may be tp-sharded; ALiBi slopes are
sliced per tp shard.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import AbstractMesh, PartitionSpec as P

from ..core.mesh import AXIS_DP, AXIS_SP, AXIS_TP


@dataclasses.dataclass(frozen=True)
class RingSpec:
    """Static mesh description for the ring (hashable; safe inside jit)."""

    mesh_axes: tuple  # ((name, size), ...) — full mesh, in order
    dp_axis: str = AXIS_DP
    tp_axis: str = AXIS_TP
    sp_axis: str = AXIS_SP

    @classmethod
    def from_mesh(cls, mesh) -> "RingSpec":
        return cls(
            mesh_axes=tuple((n, mesh.shape[n]) for n in mesh.axis_names)
        )

    @property
    def sp_size(self) -> int:
        return dict(self.mesh_axes)[self.sp_axis]

    @property
    def tp_size(self) -> int:
        return dict(self.mesh_axes).get(self.tp_axis, 1)

    def abstract_mesh(self) -> AbstractMesh:
        names = tuple(n for n, _ in self.mesh_axes)
        sizes = tuple(s for _, s in self.mesh_axes)
        return AbstractMesh(sizes, names)


def _ring_body(
    q: jax.Array,  # (B, Sq, H, Dh) local block, compute dtype
    k: jax.Array,  # (B, Sk, H, Dh) local block
    v: jax.Array,
    q_pos: jax.Array,  # (B, Sq) absolute positions
    k_pos: jax.Array,  # (B, Sk)
    k_valid: jax.Array,  # (B, Sk) bool
    *,
    sp_axis: str,
    sp_size: int,
    tp_axis: Optional[str],
    vary_axes: tuple,
    scale: float,
    n_heads_total: int,
    alibi: bool,
    logit_softcap: Optional[float],
) -> jax.Array:
    b, sq, h, dh = q.shape
    neg = jnp.finfo(jnp.float32).min

    if alibi:
        from ..models.layers import alibi_slopes

        slopes = alibi_slopes(n_heads_total)  # (H_total,)
        if tp_axis is not None and n_heads_total != h:
            off = jax.lax.axis_index(tp_axis) * h
            slopes = jax.lax.dynamic_slice(slopes, (off,), (h,))
    def absorb(o, m, l, k_c, v_c, kp_c, kval_c):
        """Online-softmax update of (o, m, l) with one K/V block.

        Operand dtypes mirror ``layers.dot_product_attention``: the two
        einsums keep the inputs' dtype (bf16 in training — full-rate MXU)
        and accumulate in f32 via ``preferred_element_type``; only the
        softmax statistics (m, l, p) live in f32.  An explicit f32 cast of
        q/k/v here would halve MXU throughput on the sp path, which exists
        precisely for the longest, most attention-bound sequences."""
        s = (
            jnp.einsum(
                "bqhd,bkhd->bhqk", q, k_c,
                preferred_element_type=jnp.float32,
            )
            * jnp.float32(scale)
        )
        if logit_softcap:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        if alibi:
            rel = (q_pos[:, :, None] - kp_c[:, None, :]).astype(jnp.float32)
            s = s - slopes[None, :, None, None] * rel[:, None, :, :]
        mask = (kp_c[:, None, :] <= q_pos[:, :, None]) & kval_c[:, None, :]
        s = jnp.where(mask[:, None, :, :], s, neg)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])  # rows of all-neg give exp(0)=1 —
        p = jnp.where(mask[:, None, :, :], p, 0.0)  # re-mask kills them
        l_new = l * corr + jnp.sum(p, axis=-1)
        pv_ = jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(v_c.dtype), v_c,
            preferred_element_type=jnp.float32,
        )
        return o * corr.transpose(0, 2, 1)[..., None] + pv_, m_new, l_new

    perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]
    rot = lambda x: jax.lax.ppermute(x, sp_axis, perm)

    def step(carry, _):
        # rotate FIRST, then absorb: the local block is absorbed before the
        # scan, so only sp-1 rotations run — no dead final ppermute
        o, m, l, k_c, v_c, kp_c, kval_c = carry
        k_c, v_c, kp_c, kval_c = rot(k_c), rot(v_c), rot(kp_c), rot(kval_c)
        o, m, l = absorb(o, m, l, k_c, v_c, kp_c, kval_c)
        return (o, m, l, k_c, v_c, kp_c, kval_c), None

    # constant-initialized carries must be marked varying over the manual
    # axes (jax>=0.9 vma check) to match the data-dependent carry outputs
    pv = lambda x: jax.lax.pcast(x, vary_axes, to="varying")
    o0 = pv(jnp.zeros((b, sq, h, dh), jnp.float32))
    m0 = pv(jnp.full((b, h, sq), neg, jnp.float32))
    l0 = pv(jnp.zeros((b, h, sq), jnp.float32))
    o0, m0, l0 = absorb(o0, m0, l0, k, v, k_pos, k_valid)
    if sp_size > 1:
        (o, _, l, *_), _ = jax.lax.scan(
            step, (o0, m0, l0, k, v, k_pos, k_valid), None, length=sp_size - 1
        )
    else:
        o, l = o0, l0
    out = jnp.where(l.transpose(0, 2, 1)[..., None] > 0, o / jnp.maximum(
        l.transpose(0, 2, 1)[..., None], 1e-30
    ), 0.0)
    return out.astype(q.dtype)


def ring_self_attention(
    spec: RingSpec,
    q: jax.Array,  # (B, S, H, Dh) — S GLOBAL, sharded over sp by the specs
    k: jax.Array,  # (B, S, H, Dh) — kv already GQA-repeated to H heads
    v: jax.Array,
    q_pos: jax.Array,  # (B, S) absolute positions
    k_valid: jax.Array,  # (B, S) bool/int — 1 = real key
    scale: Optional[float] = None,
    n_heads_total: Optional[int] = None,
    alibi: bool = False,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """Causal self-attention with the sequence dim ring-sharded over sp.

    Requires S % sp == 0 (the trainer pads sequences to an sp multiple).
    Numerically equivalent to the dense masked softmax path (f32 tolerance).
    """
    h_total = int(n_heads_total if n_heads_total is not None else q.shape[2])
    scale = float(scale if scale is not None else q.shape[-1] ** -0.5)
    dp, tp, sp = spec.dp_axis, spec.tp_axis, spec.sp_axis
    tp_heads = tp if spec.tp_size > 1 and h_total % spec.tp_size == 0 else None
    qkv_spec = P(dp, sp, tp_heads, None)
    seq_spec = P(dp, sp)

    vary = (dp, sp) + ((tp_heads,) if tp_heads else ())
    fn = partial(
        _ring_body,
        sp_axis=sp,
        sp_size=spec.sp_size,
        tp_axis=tp_heads,
        vary_axes=vary,
        scale=scale,
        n_heads_total=h_total,
        alibi=alibi,
        logit_softcap=logit_softcap,
    )
    return jax.shard_map(
        fn,
        mesh=spec.abstract_mesh(),
        in_specs=(qkv_spec, qkv_spec, qkv_spec, seq_spec, seq_spec, seq_spec),
        out_specs=qkv_spec,
    )(q, k, v, q_pos, q_pos, k_valid.astype(bool))
