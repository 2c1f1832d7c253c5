"""ICV training objective and jitted train step.

Replaces the reference's LightningModule (reference: icv_src/icv_module.py):
teacher = frozen LMM on the full 32-shot ICL prompt (no ICV, no grad);
student = same LMM zero-shot with the ICV injected; loss = masked
temperature-KL on the answer-token logits (+ optional hard CE).  The
~131K-param trainable pytree makes ZeRO/CPU-offload unnecessary (SURVEY.md
§2.5): gradients are one tiny ``psum`` emitted by ``jit`` from the mesh
shardings.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops import (
    aligned_teacher_gather,
    answer_region_mask,
    masked_kl_divergence,
    shifted_cross_entropy,
)
from .encoder import GlobalICVEncoder, ICVParams


@dataclasses.dataclass(frozen=True)
class ICVModuleConfig:
    """Mirror of config/icv_module/icv_module.yaml (reference keys)."""

    hard_loss_weight: float = 0.0
    only_hard_loss: bool = False
    init_temperature: float = 1.0
    decay_ratio: float = -1.0
    decay_per_step: float = -1.0
    min_temperature: float = 1.0
    learnable_t: bool = False
    kl_eps: float = 1e-6
    kl_impl: str = "xla"  # "xla" | "pallas".  The fused Pallas kernel is
    # hardware-validated CORRECT (rel 6e-8 fwd, <2e-6 grads) but measured
    # SLOWER than XLA's fusion on v5e (10.2 vs 8.7 ms fwd+bwd at
    # 8x256x32000, tools/validate_kl_tpu.py 2026-08-18) — XLA already fuses
    # the masked log-softmax chain well.  Default stays "xla"; the kernel is
    # kept as a validated alternative.
    log_alpha: bool = True
    # True (default): pad positions excluded from the hard CE.  False
    # reproduces the reference EXACTLY (labels = raw input_ids incl. pads,
    # reference: icv_src/icv_module.py:94-98 — see SURVEY.md §2.2).
    mask_ce_padding: bool = True
    alpha_lr: float = 1e-2
    icv_lr: float = 1e-4
    weight_decay: float = 1e-3
    warm_steps: float = 0.1
    gradient_clip_val: float = 1.0
    accumulate_grad_batches: int = 1

    @classmethod
    def from_config(cls, cfg, trainer_cfg=None) -> "ICVModuleConfig":
        kw = dict(
            hard_loss_weight=float(cfg.get("hard_loss_weight", 0.0)),
            only_hard_loss=bool(cfg.get("only_hard_loss", False)),
            init_temperature=float(cfg.get("init_temperature", 1.0)),
            decay_ratio=float(cfg.get("decay_ratio", -1)),
            decay_per_step=float(cfg.get("decay_per_step", -1)),
            # the reference config key is misspelled "min_tmeprature"
            min_temperature=float(
                cfg.get("min_tmeprature", cfg.get("min_temperature", 1.0))
            ),
            learnable_t=bool(cfg.get("learnable_t", False)),
            kl_eps=float(cfg.get("kl_eps", 1e-6)),
            kl_impl=str(cfg.get("kl_impl", "xla")),
            log_alpha=bool(cfg.get("log_alpha", True)),
            mask_ce_padding=bool(cfg.get("mask_ce_padding", True)),
            alpha_lr=float(cfg.get("alpha_lr", 1e-2)),
            icv_lr=float(cfg.get("icv_lr", 1e-4)),
            weight_decay=float(cfg.get("weight_decay", 1e-3)),
            warm_steps=float(cfg.get("warm_steps", 0.1)),
        )
        if trainer_cfg is not None:
            kw["gradient_clip_val"] = float(trainer_cfg.get("gradient_clip_val", 1.0))
            kw["accumulate_grad_batches"] = int(
                trainer_cfg.get("accumulate_grad_batches", 1)
            )
        return cls(**kw)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def icv_loss_fn(
    trainable: dict,  # {"encoder": ICVParams, "temperature": f32 scalar}
    model_params: Any,  # frozen LMM pytree
    batch: dict,  # query_inputs / inputs / query_x_length / in_context_length
    forward_fn: Callable,  # (model_params, inputs, icv_scaled|None) -> logits
    encoder: GlobalICVEncoder,
    cfg: ICVModuleConfig,
    pad_token_id: int,
    head_fn: Optional[Callable] = None,  # (model_params, hidden) -> logits
) -> tuple[jax.Array, dict]:
    """Reference forward semantics (icv_src/icv_module.py:71-119).

    ``head_fn``: when provided, the TEACHER path returns post-norm hidden
    states (``forward_fn(..., return_hidden=True)``), gathers the
    student-aligned window FIRST and only then applies the LM head — the
    (B, S_tea, V) f32 teacher logits (1 GB at bs=4, s_tea=2048, V=32000)
    never materialize, only the (B, S_stu, V) window.  Mathematically
    identical (the head is per-position, so it commutes with the gather);
    pinned by tests/test_icv_module.py."""
    # Frozen means frozen AT THE TRACE level too: without this, the student
    # scan's transpose materializes ZERO cotangent buffers for its weight
    # xs (a bf16 copy of the whole dequantized xattn stack — 688 MB at the
    # flagship shape, the single largest allocation in the bs=4
    # remat=inner OOM dump).  Grads over model_params are never requested
    # (value_and_grad runs over ``trainable`` only), so this is a pure
    # memory/DCE win.
    model_params = jax.lax.stop_gradient(model_params)
    # THE injection-tensor formula lives in one place (encoder.scaled_icv);
    # re-deriving it here could silently diverge from the inference path
    icv_scaled = encoder.scaled_icv(trainable["encoder"])  # (L, D)

    query_inputs = batch["query_inputs"]
    stu_logits = forward_fn(model_params, query_inputs, icv_scaled)  # (B,Ss,V) f32

    # rows the trainer zero-padded to a dp multiple have an all-zero
    # attention_mask; they must be inert in BOTH losses (real rows always
    # attend to at least one token)
    row_valid = query_inputs["attention_mask"].astype(bool).any(axis=1)  # (B,)

    metrics = {}
    loss = jnp.float32(0.0)

    if cfg.hard_loss_weight or cfg.only_hard_loss:
        if cfg.mask_ce_padding:
            # pads excluded — strictly better signal than the reference's raw
            # labels (quirk per SURVEY.md §2.2)
            labels = jnp.where(
                query_inputs["attention_mask"].astype(bool),
                query_inputs["input_ids"],
                -100,
            )
        else:
            # reference-exact for REAL rows: labels = input_ids verbatim,
            # within-row pads included.  dp-padding rows are still ignored —
            # they don't exist in the reference's batch at all.
            labels = jnp.where(
                row_valid[:, None], query_inputs["input_ids"], -100
            )
        ce = shifted_cross_entropy(stu_logits, labels)
        metrics["ce_loss"] = ce
        if cfg.only_hard_loss:
            metrics["loss"] = ce
            return ce, metrics
        loss = loss + cfg.hard_loss_weight * ce

    teacher_inputs = batch["inputs"]

    stu_mask = answer_region_mask(
        query_inputs["input_ids"], batch["query_x_length"], pad_token_id
    )
    # dp-padding rows are all-zero: when pad_token_id != 0 their tokens
    # don't look like padding to answer_region_mask, so gate on row validity
    stu_mask = stu_mask & row_valid[:, None]
    if head_fn is not None:
        # gather-before-head: see docstring (teacher logits only at the
        # student-aligned window, never the full (B, S_tea, V) tensor)
        tea_hidden = jax.lax.stop_gradient(
            forward_fn(model_params, teacher_inputs, None, return_hidden=True)
        )
        tea_aligned = head_fn(
            model_params,
            aligned_teacher_gather(
                tea_hidden,
                batch["in_context_length"],
                batch["query_x_length"],
                stu_logits.shape[1],
            ),
        )
    else:
        tea_logits = jax.lax.stop_gradient(
            forward_fn(model_params, teacher_inputs, None)
        )
        tea_aligned = aligned_teacher_gather(
            tea_logits,
            batch["in_context_length"],
            batch["query_x_length"],
            stu_logits.shape[1],
        )
    kl = masked_kl_divergence(
        stu_logits,
        tea_aligned,
        stu_mask,
        trainable["temperature"],
        cfg.kl_eps,
        impl=cfg.kl_impl,
    )
    metrics["kl_loss"] = kl
    loss = loss + kl
    metrics["loss"] = loss
    return loss, metrics


# ---------------------------------------------------------------------------
# Optimizer: two LR groups + transformers-style cosine schedule with warmup
# ---------------------------------------------------------------------------


def cosine_schedule_with_warmup(peak_lr: float, warmup_steps: int, total_steps: int):
    """Exact ``transformers.get_cosine_schedule_with_warmup`` factor curve
    (reference: icv_src/icv_module.py:203-205)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(1.0, warmup_steps)
        rest = jnp.maximum(1.0, total_steps - warmup_steps)
        progress = (step - warmup_steps) / rest
        factor = jnp.where(
            step < warmup_steps,
            step / warm,
            jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress))),
        )
        return peak_lr * factor

    return schedule


def make_lr_schedules(cfg: ICVModuleConfig, total_steps: int) -> dict:
    """Per-group cosine-with-warmup schedules, keyed like the optimizer
    groups.  Exposed separately so the trainer can log the CURRENT LR
    (reference: ``LearningRateMonitor``, train.py:55-58)."""
    warmup = (
        int(cfg.warm_steps * total_steps)
        if isinstance(cfg.warm_steps, float) and cfg.warm_steps < 1
        else int(cfg.warm_steps)
    )
    return {
        "icv": cosine_schedule_with_warmup(cfg.icv_lr, warmup, total_steps),
        "alpha": cosine_schedule_with_warmup(cfg.alpha_lr, warmup, total_steps),
    }


def make_optimizer(cfg: ICVModuleConfig, total_steps: int) -> optax.GradientTransformation:
    schedules = make_lr_schedules(cfg, total_steps)

    def adamw(schedule, weight_decay):
        return optax.adamw(learning_rate=schedule, weight_decay=weight_decay)

    def label_fn(tree):
        # reference groups: any param named *alpha* at alpha_lr, rest at icv_lr
        return {
            "encoder": {"icv": "icv", "alpha": "alpha"},
            "temperature": "temp",
        }

    groups = optax.multi_transform(
        {
            "icv": adamw(schedules["icv"], cfg.weight_decay),
            "alpha": adamw(schedules["alpha"], cfg.weight_decay),
            # DELIBERATE DEVIATION: with learnable_t the reference registers
            # temperature as a Parameter but never adds it to any optimizer
            # group (configure_optimizers iterates icv_encoder params only,
            # reference: icv_src/icv_module.py:171-209), so T silently never
            # trains there.  Here learnable_t actually updates T (at icv_lr,
            # NO weight decay — decay toward 0 would be meaningless for a
            # softmax temperature).
            "temp": adamw(schedules["icv"], 0.0),
        },
        label_fn,
    )
    # clip the JOINT global norm over all trainable params BEFORE splitting
    # into groups — PL's gradient_clip_val clips all trainable params
    # together (reference: config/trainer/*.yaml:7); clipping per group
    # would allow a combined norm up to sqrt(#groups)x the bound and distort
    # the icv/alpha update ratio whenever only one group spikes
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val)
        if cfg.gradient_clip_val and cfg.gradient_clip_val > 0
        else optax.identity(),
        groups,
    )
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
    return tx


# ---------------------------------------------------------------------------
# Train state + step
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainState:
    params: dict  # trainable: {"encoder": {...}, "temperature": ()}
    opt_state: Any
    step: jax.Array


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)


def init_train_state(
    key, encoder: GlobalICVEncoder, cfg: ICVModuleConfig, optimizer
) -> TrainState:
    params = {
        "encoder": encoder.init(key),
        "temperature": jnp.asarray(cfg.init_temperature, jnp.float32),
    }
    return TrainState(
        params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32)
    )


def decay_temperature(state: TrainState, cfg: ICVModuleConfig) -> TrainState:
    """Step decay (reference: icv_src/icv_module.py:150-158; the reference
    silently de-registers the Parameter on first decay — here temperature is
    simply a value that decays when enabled).

    ``decay_per_step`` counts OPTIMIZER steps (the reference's
    ``global_step``), while ``state.step`` counts micro-batches — with
    gradient accumulation the decay fires once per optimizer-step boundary,
    not once per micro-batch."""
    if cfg.decay_ratio < 0:
        return state
    if cfg.decay_per_step <= 0:
        # the reference crashes here too (on_train_start returns before
        # setting self.decay_per_step, icv_src/icv_module.py:55-56, so
        # decay_temperature hits an AttributeError) — fail loudly instead of
        # silently decaying every optimizer step
        raise ValueError(
            "decay_ratio is set but decay_per_step is not: give a positive "
            "int (optimizer steps) or a float in (0,1) (fraction of total)"
        )
    accum = max(int(cfg.accumulate_grad_batches), 1)
    opt_step = state.step // accum
    dps = jnp.int32(int(cfg.decay_per_step))
    should = (
        (opt_step % dps == 0) & (opt_step != 0) & (state.step % accum == 0)
    )
    t = jnp.where(
        should,
        jnp.maximum(state.params["temperature"] * cfg.decay_ratio, cfg.min_temperature),
        state.params["temperature"],
    )
    params = dict(state.params)
    params["temperature"] = t
    return TrainState(params=params, opt_state=state.opt_state, step=state.step)


def make_train_step(
    forward_fn: Callable,
    encoder: GlobalICVEncoder,
    cfg: ICVModuleConfig,
    optimizer,
    pad_token_id: int,
    lr_schedules: Optional[dict] = None,  # from make_lr_schedules (for logging)
    head_fn: Optional[Callable] = None,  # gather-before-head teacher path
):
    """Build the jittable train step: grads w.r.t. the tiny trainable pytree
    only; the frozen LMM params are a non-differentiated argument."""

    def step(state: TrainState, model_params, batch):
        state = decay_temperature(state, cfg)
        grad_fn = jax.value_and_grad(icv_loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(
            state.params,
            model_params,
            batch,
            forward_fn,
            encoder,
            cfg,
            pad_token_id,
            head_fn,
        )
        if not cfg.learnable_t:
            grads["temperature"] = jnp.zeros_like(grads["temperature"])
        if not encoder.alpha_learnable:
            # reference freezes alpha via requires_grad=alpha_learnable
            # (global_icv_encoder.py:26-29): no grad AND no weight decay
            grads["encoder"]["alpha"] = jnp.zeros_like(grads["encoder"]["alpha"])
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if cfg.decay_ratio >= 0 or not cfg.learnable_t:
            params["temperature"] = state.params["temperature"]
        if not encoder.alpha_learnable:
            params["encoder"]["alpha"] = state.params["encoder"]["alpha"]
        metrics["temperature"] = params["temperature"]
        metrics["grad_norm"] = optax.global_norm(grads)
        if lr_schedules is not None:
            # reference logs per-group LR via LearningRateMonitor
            # (train.py:55-58); the schedule counter is OPTIMIZER steps
            opt_step = state.step // max(int(cfg.accumulate_grad_batches), 1)
            for name, sched in lr_schedules.items():
                metrics[f"lr-{name}"] = sched(opt_step)
        if cfg.log_alpha:  # reference: icv_src/icv_module.py:164-167
            alpha = encoder.get_alpha(params["encoder"])
            for i in range(alpha.shape[0]):
                metrics[f"alpha/alpha-{i}"] = alpha[i]
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step
