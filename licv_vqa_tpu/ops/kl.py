"""Masked temperature-KL distillation loss with static shapes.

The reference boolean-masks student/teacher logits into flat ``(N, V)``
tensors and takes an elementwise KL (reference: icv_src/icv_module.py:107-134
with masks from :136-148).  Boolean gather is shape-dynamic, which XLA cannot
compile; we exploit the mask structure instead (SURVEY.md §2.2): both masks
select the *same per-sample count* of contiguous answer+EOS positions —
student positions start at ``query_x_length``, teacher positions at
``in_context_length``.  So the teacher row for student position ``t`` is
``t - query_x_length + in_context_length``: one static-shape
``take_along_axis`` gather, then a weighted mean over the student mask.
Mathematically identical to the reference loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def answer_region_mask(
    input_ids: jax.Array,  # (B, S) int
    lengths: jax.Array,  # (B,) int — prompt length before the answer region
    pad_token_id: int,
) -> jax.Array:
    """Positions with ``index >= length`` that are not padding.

    Mirrors ``VQAICVModule.get_mask`` (reference: icv_src/icv_module.py:136-148).
    """
    b, s = input_ids.shape
    idx = jnp.arange(s, dtype=lengths.dtype)[None, :]
    mask = idx >= lengths[:, None]
    return mask & (input_ids != pad_token_id)


def aligned_teacher_gather(
    teacher_logits: jax.Array,  # (B, S_tea, V)
    in_context_length: jax.Array,  # (B,)
    query_x_length: jax.Array,  # (B,)
    student_seq_len: int,
) -> jax.Array:
    """Gather teacher logits aligned to student positions: (B, S_stu, V)."""
    s_tea = teacher_logits.shape[1]
    t = jnp.arange(student_seq_len, dtype=jnp.int32)[None, :]
    pos = t - query_x_length[:, None].astype(jnp.int32) + in_context_length[
        :, None
    ].astype(jnp.int32)
    pos = jnp.clip(pos, 0, s_tea - 1)
    return jnp.take_along_axis(teacher_logits, pos[:, :, None], axis=1)


def masked_kl_divergence(
    student_logits: jax.Array,  # (B, S, V) — aligned
    teacher_logits: jax.Array,  # (B, S, V) — aligned (see gather above)
    mask: jax.Array,  # (B, S) bool — student answer-region mask
    temperature: jax.Array | float,
    eps: float = 1e-6,
    impl: str = "xla",  # "xla" | "pallas" | "pallas_interpret"
) -> jax.Array:
    """``mean_masked[ Σ_V p_tea (log(p_tea+ε) − log(p_stu+ε)) ] · T²``.

    Float32 math regardless of input dtype (reference computes in the model's
    autocast dtype; we lift to f32, which only tightens numerics).
    ``impl="pallas"`` uses the fused kernel (ops/masked_kl_kernel.py).
    """
    t = jnp.asarray(temperature, jnp.float32)
    stu = student_logits.astype(jnp.float32) / t
    tea = teacher_logits.astype(jnp.float32) / t
    if impl.startswith("pallas"):
        from .masked_kl_kernel import masked_kl_pallas

        kl = masked_kl_pallas(
            stu, tea, mask, eps=eps, interpret=impl == "pallas_interpret"
        )
        return kl * (t * t)
    p_stu = jax.nn.softmax(stu, axis=-1)
    p_tea = jax.nn.softmax(tea, axis=-1)
    per_pos = jnp.sum(
        p_tea * (jnp.log(p_tea + eps) - jnp.log(p_stu + eps)), axis=-1
    )  # (B, S)
    w = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return (jnp.sum(per_pos * w) / denom) * (t * t)


def shifted_cross_entropy(
    logits: jax.Array,  # (B, S, V)
    labels: jax.Array,  # (B, S) int; -100 = ignore
    ignore_index: int = -100,
) -> jax.Array:
    """HF-convention causal LM loss: logits[:, :-1] vs labels[:, 1:], mean
    over non-ignored positions.  The reference feeds ``labels=input_ids``
    verbatim (reference: icv_src/icv_module.py:94-98), so padding positions
    participate exactly as they do in the HF models' built-in loss.
    """
    lg = logits[:, :-1, :].astype(jnp.float32)
    lb = labels[:, 1:]
    valid = lb != ignore_index
    lb_safe = jnp.where(valid, lb, 0)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, lb_safe[:, :, None], axis=-1)[:, :, 0]
    w = valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
