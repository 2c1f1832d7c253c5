#!/usr/bin/env python
"""Flagship train-step benchmark: compile wall-clock + step time per remat
mode (VERDICT r2 next #4).

The round-2 nested remat (``remat_mode="both"``: jax.checkpoint around BOTH
the group scan body and the inner layer scan body, models/idefics.py) made
the train step's remote compile take ~28 minutes through the axon tunnel
even at tiny shapes — structural, not shape-driven.  This tool measures, per
mode, (a) pure compile time via AOT ``jit(...).lower(...).compile()`` and
(b) steady-state step time, at both the tiny CLI shape (reproduces the
compile blowup cheaply) and the flagship shape (32L/4096d int8 frozen
weights, the hot loop of reference icv_src/icv_module.py:103-105).

Each mode runs in its own subprocess with a hard budget so a pathological
compile cannot eat the session.

Usage:
    python tools/bench_train_step_tpu.py                  # tiny, all modes
    python tools/bench_train_step_tpu.py --flagship       # 32L, best modes
    python tools/bench_train_step_tpu.py --run tiny:inner # one child
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S_STU = 256  # student (zero-shot query) length
PROMPT_IMG = 1


def _build(shape: str, mode: str):
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.icv.encoder import GlobalICVEncoder
    from licv_vqa_tpu.icv.module import (
        ICVModuleConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
    )

    if shape == "tiny":
        cfg = IdeficsConfig.tiny()
        s_tea, s_stu, bs = 64, 32, 2
        quantize = False
    else:  # flagship: 32L 4096d, int8 frozen weights (bf16 exceeds one v5e)
        cfg = IdeficsConfig.idefics_9b()
        s_tea = int(os.environ.get("TRAINBENCH_SEQ", 2048))
        s_stu, bs = S_STU, int(os.environ.get("TRAINBENCH_BS", 4))
        quantize = True
    cfg = dataclasses.replace(cfg, remat_mode=mode)

    def init():
        p = init_idefics_params(jax.random.PRNGKey(0), cfg)
        if quantize:
            from licv_vqa_tpu.ops.quantize import quantize_layer_stack

            p["layers"] = quantize_layer_stack(p["layers"])
            p["xattn"] = quantize_layer_stack(p["xattn"])
        return p

    params = jax.jit(init)()
    jax.block_until_ready(params["final_norm"])

    train_forward, _ = make_idefics_forward_fns(cfg, eos_token_id=2)
    t = cfg.text
    encoder = GlobalICVEncoder(t.d_model, t.n_layers)
    mcfg = ICVModuleConfig(hard_loss_weight=0.5, warm_steps=0)
    tx = make_optimizer(mcfg, total_steps=100)
    state = init_train_state(jax.random.PRNGKey(1), encoder, mcfg, tx)
    # gather-before-head teacher path (what train.py ships via
    # bundle.head_fn): the (B, S_tea, V) teacher logits never materialize —
    # the memory lever for remat=inner at bs>=4 on 16 GB.
    # TRAINBENCH_LEGACY_HEAD=1 restores the full-logits path for A/B.
    head_fn = None
    if os.environ.get("TRAINBENCH_LEGACY_HEAD", "0") != "1":
        from licv_vqa_tpu.models.decoder import logits_from_hidden

        head_fn = lambda p, h: logits_from_hidden(t, p, h)  # noqa: E731
    step = make_train_step(
        train_forward, encoder, mcfg, tx, pad_token_id=0, head_fn=head_fn
    )

    rng = np.random.default_rng(0)
    img_hw = cfg.vision.image_size

    def inputs(s):
        ids = rng.integers(3, t.vocab_size - 10, size=(bs, s)).astype(np.int32)
        ids[:, 1] = cfg.image_token_id
        return {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((bs, s), jnp.int32),
            "pixel_values": jnp.asarray(
                rng.normal(size=(bs, PROMPT_IMG, img_hw, img_hw, 3)).astype(
                    np.float32
                )
            ),
            "pixel_valid": jnp.ones((bs, PROMPT_IMG), bool),
        }

    batch = {
        "query_inputs": inputs(s_stu),
        "inputs": inputs(s_tea),
        "query_x_length": jnp.full((bs,), s_stu // 2, jnp.int32),
        "in_context_length": jnp.full((bs,), s_tea - s_stu // 2, jnp.int32),
    }

    # ---- roofline FLOPs model (the % columns VERDICT r3 #8 asks for) ----
    # teacher fwd: 2·P_act FLOPs/token over bs·s_tea tokens; student:
    # fwd 2 + remat recompute 2 + activation-grad bwd 2 (frozen weights →
    # no dW matmuls) = 6·P_act per token over bs·s_stu; heads at D·V per
    # position (teacher head only over the GATHERED s_stu window with the
    # shipped head_fn path); ViT fwd per image on both streams (no tower
    # bwd: nothing trainable upstream of the latents).
    from licv_vqa_tpu.ops.quantize import is_any_quantized_leaf

    import jax as _jax

    def _n(x):
        if isinstance(x, dict) and "q" in x:
            return x["q"].size
        return x.size

    p_act = sum(
        _n(l)
        for key in ("layers", "xattn")
        for l in _jax.tree.leaves(params[key], is_leaf=is_any_quantized_leaf)
    )
    d, v = t.d_model, t.vocab_size
    vit_flops = 2.0 * sum(
        _n(l)
        for key in ("vision", "perceiver")
        if key in params
        for l in _jax.tree.leaves(params[key], is_leaf=is_any_quantized_leaf)
    )
    head = 2.0 * d * v
    flops = (
        2.0 * p_act * bs * s_tea  # teacher fwd
        + 6.0 * p_act * bs * s_stu  # student fwd + recompute + dX bwd
        + head * bs * s_stu  # teacher head over the gathered window
        + 3.0 * head * bs * s_stu  # student head fwd + recompute + bwd
        + vit_flops * bs * 2 * PROMPT_IMG  # both streams' image encodes
    )
    meta = dict(s_tea=s_tea, s_stu=s_stu, bs=bs, model_tflops=round(flops / 1e12, 1))
    return step, state, params, batch, meta


def _child(spec: str) -> None:
    shape, mode = spec.split(":")
    import jax

    # persist the expensive flagship compiles (AOT .compile() goes through
    # the same compiler client, so entries land in the cache too) — a killed
    # tunnel mid-bench no longer costs the whole compile on retry
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    step, state, params, batch, meta = _build(shape, mode)
    jit_step = jax.jit(step, donate_argnums=(0,))

    t0 = time.perf_counter()
    lowered = jit_step.lower(state, params, batch)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    state, metrics = compiled(state, params, batch)
    loss0 = float(np.asarray(metrics["loss"]))  # hard sync
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = compiled(state, params, batch)
        _ = float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / reps
    tok_s = meta["bs"] * (meta["s_tea"] + meta["s_stu"]) / dt
    out = {
        "shape": shape,
        "mode": mode,
        **meta,
        "trace_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "step_ms": round(dt * 1e3, 1),
        "tokens_per_sec": round(tok_s, 0),
        "loss": round(loss0, 4),
    }
    if "model_tflops" in meta:
        # bf16 MXU peak (197 TFLOPS on v5e): train matmuls are bf16 even
        # with int8 frozen weights (dequant-into-matmul, weight-only)
        mfu = meta["model_tflops"] * 1e12 / dt / 197e12
        out["mfu_pct_bf16_peak"] = round(100 * mfu, 1)
    print(json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--modes", default=None)
    ap.add_argument("--budget", type=int, default=2400)
    args = ap.parse_args()
    shape = "flagship" if args.flagship else "tiny"
    modes = (args.modes or ("inner,policy,outer,both" if shape == "tiny"
                            else "inner,both")).split(",")
    for mode in modes:
        spec = f"{shape}:{mode}"
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", spec],
                capture_output=True, text=True, timeout=args.budget,
            )
        except subprocess.TimeoutExpired:
            print(f"{spec}: exceeded {args.budget}s budget", flush=True)
            continue
        out = proc.stdout.strip().splitlines()
        if proc.returncode == 0 and out:
            print(out[-1], flush=True)
        else:
            print(
                f"{spec}: rc={proc.returncode} in {time.monotonic()-t0:.0f}s\n"
                f"{proc.stderr[-1500:]}",
                flush=True,
            )


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--run":
        _child(sys.argv[2])
    else:
        main()
