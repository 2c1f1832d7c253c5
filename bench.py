#!/usr/bin/env python
"""Headline benchmark: ICV-steered decode throughput per chip.

Measures greedy decode tokens/sec/chip on the flagship Idefics architecture
(hidden 4096, heads 32, ff 11008, gated cross-attn every 4 layers, ViT-H
tower, perceiver) with the ICV injected at EVERY decoder layer — the exact
hot path the reference drives through per-layer-per-token baukit hooks
(reference: inference.py:300-321, README:14 notes the hook overhead).

Robustness contract (round-2, after the round-1 rc=124):
- variants run CHEAPEST-KNOWN-GOOD FIRST, each in its own subprocess with a
  hard wall-clock budget, so one bad variant can never eat the driver's
  whole budget;
- every successful variant's JSON line is printed and flushed IMMEDIATELY —
  a later timeout cannot un-bank an earlier result;
- failures print the child's full traceback to stderr (never swallowed).

Weights are random bf16 — throughput is architecture + runtime bound, not
weight bound.  Baseline for ``vs_baseline``: the reference's A100 + baukit
hook path at the same per-token work, estimated at 15 tokens/s/device (bs=1
beam-3 decode with 32 hooked layers — see BASELINE.md; the repo publishes no
number, so the driver tracks our absolute value round over round).
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_TOKENS_PER_SEC = 15.0
PROMPT_LEN = 64
MAX_NEW = 32

# Roofline constants, shared by run() and run_eval_shape() so a
# recalibration cannot leave one of the two reporting a stale ceiling.
DATASHEET_HBM_GBPS = 819.0  # v5e datasheet
MEASURED_STREAM_BPS = 615.0e9  # measured sustained stream (v5e, this repo;
# tools/bench_decode_breakdown.py `stream`/`matmul`: 503-615 GB/s)
MXU_BF16_FLOPS = 197.0e12  # v5e peak
MXU_INT8_OPS = 394.0e12  # v5e int8 double-rate peak (w8a8 bind/prefill path)
VIT_H_FLOPS_PER_IMAGE = 2 * 630e6 * 257  # ViT-H/14: ~630M params × 257 toks
LM_FLOPS_PER_TOKEN = 2 * 9e9  # flagship 9B decoder prefill
KV_HEADS, KV_HEAD_DIM = 32, 128  # flagship KV geometry (K and V each)

# (child spec, per-variant budget seconds), in order.
# 16L bf16 measured good on hardware since round 1 → banked first (547.9
# tok/s on v5e with the round-3 row-update KV cache); 32L int8 is the
# flagship full depth on one v5e (544.2 tok/s at bs=8 — 97.0% of the
# measured-bandwidth ceiling); bs=64 + int8 KV cache amortizes the weight
# stream 8× and halves cache traffic (serving-throughput headline: 1789.2
# tok/s/chip measured on v5e with w8a8 prefill, 63.8% of the int8-peak
# ceiling).  The LAST variant is the reference's own eval shape (bs=1,
# num_beams=3, max_new_tokens=5 — config/inference.yaml:11,26-30) in
# questions/sec/chip — its headline is the best schedule's: the POOLED
# eval chain (P·K beam rows + next prefill share each weight stream,
# infer/eval_chain.py) measured 37.0 q/s/chip on v5e (60.5% of its own
# per-schedule roofline; serial per-question dispatch measures 10.5,
# overlapped chain 15.4) — printed last: the driver parses the final line.
VARIANTS = (
    # (spec, per-variant budget, reserve): a variant is SKIPPED unless
    # budget + reserve seconds remain — reserve protects the headline
    # variant's budget from optional extras.
    ("16:bf16:bs8", int(os.environ.get("BENCH_BUDGET_V0", 720)), 0),
    ("32:int8:bs8", int(os.environ.get("BENCH_BUDGET_V1", 720)), 0),
    # bs=64 throughput: static batching stays the banked measurement — on
    # one 16 GB v5e behind a ~30-50 ms/dispatch relay it beats every
    # host-driven continuous configuration on this UNIFORM workload
    # (engine sweep: 0.4-0.65x static; fused+merged OOMs at 64 slots —
    # r4 session log / STATUS).  The engine's wins are ragged/ICL/online
    # workloads (tools/bench_serving_tpu.py); `:serve` runs that variant.
    ("32:int8:bs64:kv8", int(os.environ.get("BENCH_BUDGET_V2", 600)), 0),
    ("8:bf16:bs8", int(os.environ.get("BENCH_BUDGET_V3", 300)), 0),
    # batched eval throughput: the reference's decode settings (beam-3,
    # max_new=5) at bs=8 — a serving view its bs=1 Python loop can't reach.
    # OPTIONAL: runs only if the bs=1 headline's budget stays fully covered.
    (
        "32:int8:bs8:eval",
        int(os.environ.get("BENCH_BUDGET_V5", 600)),
        int(os.environ.get("BENCH_BUDGET_V4", 900)) + 60,
    ),
    # the beam-decode compile can take several minutes through the tunnel;
    # give the headline variant room (measured ~mid-hundreds of seconds).
    # LAST on purpose: the driver parses the final JSON line as the round's
    # headline, and that must stay the reference's own eval shape (bs=1).
    ("32:int8:bs1:eval", int(os.environ.get("BENCH_BUDGET_V4", 900)), 0),
)


def build(n_layers: int, quantize: bool = False, kv8: bool = False):
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
    )

    cfg9 = IdeficsConfig.idefics_9b()
    cfg = dataclasses.replace(
        cfg9,
        text=dataclasses.replace(
            cfg9.text,
            n_layers=n_layers,
            kv_cache_dtype="int8" if kv8 else "bf16",
            # int8 builds run bind/prefill matmuls w8a8 on the int8 MXU
            # double-rate path (measured 1.43-1.47x at s=2048 on v5e,
            # tools/bench_prefill_tpu.py); decode steps stay weight-only by
            # the static token gate, so decode numbers are unaffected.
            w8a8_prefill=quantize,
        ),
    )

    # ONE compiled program for the whole init (+ on-device quantization):
    # per-op eager dispatch through the remote-compile tunnel costs seconds
    def init():
        p = init_idefics_params(jax.random.PRNGKey(0), cfg)
        if quantize:
            from licv_vqa_tpu.ops.quantize import quantize_array, quantize_layer_stack

            p["layers"] = quantize_layer_stack(p["layers"])
            p["xattn"] = quantize_layer_stack(p["xattn"])
            # the head is re-streamed every decode step; int8 saves ~130 MB
            # of the per-step byte budget (_stream_bytes counts leaf bytes,
            # so the roofline tightens to match)
            p["lm_head"] = quantize_array(p["lm_head"])
            # bind-phase weights (lmm.quantize_vision equivalent): halves
            # the ViT+resampler stream; decode rooflines are unaffected
            # (vision runs once per question, outside the decode loop)
            p["vision"]["layers"] = quantize_layer_stack(p["vision"]["layers"])
            p["perceiver"]["blocks"] = quantize_layer_stack(
                p["perceiver"]["blocks"]
            )
        return p

    params = jax.jit(init)()
    jax.block_until_ready(params["final_norm"])
    _, bind_decode = make_idefics_forward_fns(cfg, eos_token_id=2)
    return cfg, params, bind_decode


def run(n_layers: int, quantize: bool = False, bs: int = 8, kv8: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.decode import greedy_generate

    cfg, params, bind_decode = build(n_layers, quantize=quantize, kv8=kv8)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 32000, size=(bs, PROMPT_LEN)).astype(np.int32)
    ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(bs, 1, 224, 224, 3)).astype(np.float32)
    valid = np.ones((bs, 1), bool)
    icv = (
        jnp.asarray(rng.normal(size=(cfg.text.n_layers, 4096)).astype(np.float32))
        * 0.1
    ).astype(jnp.bfloat16)

    @jax.jit
    def gen(params, ids, mask, pixels, valid, icv):
        fwd = bind_decode(params, pixels, valid, ids, icv, PROMPT_LEN + MAX_NEW + 1)
        return greedy_generate(
            fwd, ids, mask, max_new_tokens=MAX_NEW, eos_token_id=-1, pad_token_id=0
        )

    args = (
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(pixels),
        jnp.asarray(valid),
        icv,
    )

    def sync(x):
        # through the axon tunnel block_until_ready is unreliable; a host
        # readback of the last generated column is a hard sync point
        return np.asarray(x[:, -1])

    sync(gen(*args))  # compile + warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(gen(*args))
    dt = (time.perf_counter() - t0) / reps
    tok_per_sec = bs * MAX_NEW / dt
    variant = ("int8w" if quantize else "bf16") + ("_kv8" if kv8 else "")

    # Roofline: greedy decode is HBM-bandwidth bound — every decoder/xattn
    # weight byte is read once per STEP (amortized over the batch), plus the
    # KV cache.  Naive ceiling uses the 819 GB/s datasheet number; the
    # ACHIEVABLE ceiling uses the measured v5e streaming bandwidth
    # (tools/bench_decode_breakdown.py `stream`/`matmul` variants: 503-615
    # GB/s sustained on the int8 layer stack) and charges the bind+prefill
    # phases (MXU-bound) amortized over MAX_NEW, since this metric times
    # them too.  (VERDICT r2 #2: naive-roofline % at bs=64 was unexplained
    # — most of the "gap" was an unachievable denominator.)
    stream_bytes = _stream_bytes(params)
    cache_len = PROMPT_LEN + MAX_NEW + 1
    # k+v per (token, head): head_dim × (1B int8 + 4B scale | 2B bf16)
    per_head = KV_HEAD_DIM * 1 + 4 if kv8 else KV_HEAD_DIM * 2
    kv_bytes = n_layers * bs * cache_len * KV_HEADS * per_head * 2
    ceiling = bs * DATASHEET_HBM_GBPS * 1e9 / (stream_bytes + kv_bytes)
    vis_flops = bs * VIT_H_FLOPS_PER_IMAGE
    prefill_flops = bs * LM_FLOPS_PER_TOKEN * PROMPT_LEN
    t_step_bound = (stream_bytes + kv_bytes) / MEASURED_STREAM_BPS
    # int8 builds bind/prefill w8a8 → the MXU ceiling is the int8 peak
    mxu_peak = MXU_INT8_OPS if quantize else MXU_BF16_FLOPS
    t_bind_bound = (vis_flops + prefill_flops) / mxu_peak
    # MAX_NEW-1 decode forwards emit MAX_NEW tokens (the first token comes
    # from prefill logits; the last needs no forward — infer/decode.py)
    achievable = bs * MAX_NEW / ((MAX_NEW - 1) * t_step_bound + t_bind_bound)
    return {
        "metric": f"icv_steered_greedy_decode_tokens_per_sec_per_chip"
        f"_idefics{n_layers}L4096d_{variant}_bs{bs}",
        "value": round(tok_per_sec, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_per_sec / BASELINE_TOKENS_PER_SEC, 2),
        "baseline_estimated": True,  # 15 tok/s is an estimate; ref publishes none
        "roofline_tokens_per_sec": round(ceiling, 1),
        "pct_of_hbm_roofline": round(100.0 * tok_per_sec / ceiling, 1),
        "achievable_tokens_per_sec": round(achievable, 1),
        "pct_of_achievable": round(100.0 * tok_per_sec / achievable, 1),
        "weight_stream_gb_per_step": round((stream_bytes + kv_bytes) / 1e9, 3),
    }


def _stream_bytes(params) -> int:
    """Decoder+xattn+head weight bytes read once per decode step."""
    import jax

    from licv_vqa_tpu.ops.quantize import is_quantized_leaf

    def leaf_bytes(x):
        if isinstance(x, dict) and "q" in x and "s" in x:
            return x["q"].size + x["s"].size * x["s"].dtype.itemsize
        return x.size * x.dtype.itemsize

    return sum(
        leaf_bytes(l)
        for key in ("layers", "xattn", "final_norm", "lm_head")
        for l in jax.tree.leaves(params[key], is_leaf=is_quantized_leaf)
    )


def run_eval_shape(n_layers: int = 32, bs: int = 1, quantize: bool = True) -> dict:
    """The reference's own eval workload, end-to-end on device: image encode
    → gated-xattn KV bind → prefill → beam-3 decode of 5 tokens (reference:
    config/inference.yaml:11,26-30; inference.py:300-321).  Value is
    questions/sec/chip; host prompt assembly + detokenize are <1 ms/question
    (pure-Python string work) and excluded."""
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.decode import beam_generate

    NUM_BEAMS, EVAL_MAX_NEW = 3, 5
    cfg, params, bind_decode = build(n_layers, quantize=quantize, kv8=False)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 32000, size=(bs, PROMPT_LEN)).astype(np.int32)
    ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(bs, 1, 224, 224, 3)).astype(np.float32)
    valid = np.ones((bs, 1), bool)
    icv = (
        jnp.asarray(rng.normal(size=(cfg.text.n_layers, 4096)).astype(np.float32))
        * 0.1
    ).astype(jnp.bfloat16)
    max_len = PROMPT_LEN + EVAL_MAX_NEW + 1

    def _gen(params, ids, mask, pixels, valid, icv):
        fwd = bind_decode(params, pixels, valid, ids, icv, max_len)
        return beam_generate(
            fwd, ids, mask, max_new_tokens=EVAL_MAX_NEW, eos_token_id=-1,
            pad_token_id=0, num_beams=NUM_BEAMS, length_penalty=0.0,
        )

    gen = jax.jit(_gen)

    args = (
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(pixels),
        jnp.asarray(valid),
        icv,
    )

    def sync(x):
        return np.asarray(x[:, -1])

    sync(gen(*args))  # compile + warmup
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(gen(*args))
    dt = (time.perf_counter() - t0) / reps
    qps_serial = bs / dt

    # The shipped eval loop (infer/runner.py icv_inference) keeps TWO
    # generations in flight (async dispatch, infer_pipeline=2), so question
    # k+1's dispatch/host work overlaps question k's device compute and the
    # per-call host→device round trip (~30 ms through the axon tunnel at
    # bs=1) is off the critical path.  Measure the same schedule here: this
    # is the sustained questions/sec a user's eval run actually sees.
    pending = []
    t0 = time.perf_counter()
    for _ in range(reps):
        pending.append(gen(*args))
        if len(pending) >= 2:
            sync(pending.pop(0))
    while pending:
        sync(pending.pop(0))
    dt_pipe = (time.perf_counter() - t0) / reps
    qps = max(bs / dt_pipe, qps_serial)  # pipelining can only help; guard noise

    # Depth-4 arm (same executable, deeper FIFO): through the tunnel the
    # per-call dispatch itself costs ~10-30 ms of host time, so depth 2 may
    # not fully hide it.  Diagnostic only unless it wins enough to justify
    # changing the shipped infer_pipeline default.
    pending = []
    t0 = time.perf_counter()
    for _ in range(reps):
        pending.append(gen(*args))
        if len(pending) >= 4:
            sync(pending.pop(0))
    while pending:
        sync(pending.pop(0))
    qps_pipe4 = bs / ((time.perf_counter() - t0) / reps)

    # Device-time view: chain `reps` whole questions inside ONE jitted
    # fori_loop (serial dependency: the winning beam's last token perturbs
    # the pixels, so XLA cannot CSE or reorder the iterations) and pay a
    # single host readback — per-question DEVICE time with zero relay sync,
    # i.e. what a non-tunneled deployment gets per chip.  Best effort: the
    # headline must survive a failure (or a budget-eating compile) here —
    # skipped outright when the parent's per-variant deadline is close (a
    # cold-cache chain compile must never cost the whole variant's JSON).
    qps_device = None
    child_deadline = float(os.environ.get("BENCH_CHILD_DEADLINE", "inf"))
    try:
        if time.time() > child_deadline - 240:
            raise TimeoutError("variant deadline near — skipping device view")

        @jax.jit
        def gen_chain(params, ids, mask, pixels, valid, icv):
            def body(_, px):
                out = _gen(params, ids, mask, px, valid, icv)
                eps = (out[0, -1] % 3 - 1).astype(px.dtype) * 1e-6
                return px + eps

            return jax.lax.fori_loop(0, reps, body, pixels)[0, 0, 0, 0, 0]

        np.asarray(gen_chain(*args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(gen_chain(*args))
        qps_device = bs / ((time.perf_counter() - t0) / reps)
    except Exception as e:  # pragma: no cover - hardware-path diagnostics
        print(f"bench: eval-shape device view failed: {e!r}", file=sys.stderr)

    # Overlapped chain (infer/eval_chain.py): question i+1's prefill packs
    # into question i's FIRST beam step (merged lanes — 4 weight-stream
    # passes/question instead of 5).  Token-exact vs per-question
    # beam_generate (tests/test_eval_chain.py).  Best effort like the
    # device view.
    qps_overlap = None
    try:
        if time.time() > child_deadline - 240:
            raise TimeoutError("variant deadline near — skipping overlap arm")
        from licv_vqa_tpu.infer.eval_chain import make_idefics_eval_chain

        chain = jax.jit(
            make_idefics_eval_chain(
                cfg, 2, num_beams=NUM_BEAMS, max_new_tokens=EVAL_MAX_NEW,
                transition_eos_token_id=-1,
            )
        )
        stackq = lambda x: jnp.asarray(  # noqa: E731
            np.broadcast_to(np.asarray(x)[None], (reps,) + np.asarray(x).shape)
        )
        cargs = (
            params, stackq(ids), stackq(mask), stackq(pixels), stackq(valid),
            icv,
        )
        np.asarray(chain(*cargs))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(chain(*cargs))
        qps_overlap = reps * bs / (time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - hardware-path diagnostics
        print(f"bench: eval-shape overlap arm failed: {e!r}", file=sys.stderr)

    # POOLED chain (infer/eval_chain.py::make_idefics_pooled_eval_chain):
    # P = max_new-1 staggered question groups in ONE scan — every weight
    # stream serves P*K beam rows + one prefill, completing ~1 question per
    # pass instead of per 4.  Token-exact vs per-question beam_generate
    # (tests/test_eval_chain.py).  Best effort like the other arms.
    qps_pooled = None
    pool_n = 32  # questions per dispatch (P drain passes amortize over N)
    try:
        if time.time() > child_deadline - 240:
            raise TimeoutError("variant deadline near — skipping pooled arm")
        from licv_vqa_tpu.infer.eval_chain import (
            make_idefics_pooled_eval_chain,
        )

        pooled = jax.jit(
            make_idefics_pooled_eval_chain(
                cfg, 2, num_beams=NUM_BEAMS, max_new_tokens=EVAL_MAX_NEW,
                transition_eos_token_id=-1,
            )
        )
        stackn = lambda x: jnp.asarray(  # noqa: E731
            np.broadcast_to(
                np.asarray(x)[None], (pool_n,) + np.asarray(x).shape
            )
        )
        pargs = (
            params, stackn(ids), stackn(mask), stackn(pixels), stackn(valid),
            icv,
        )
        np.asarray(pooled(*pargs))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(pooled(*pargs))
        qps_pooled = pool_n * bs / (time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - hardware-path diagnostics
        print(f"bench: eval-shape pooled arm failed: {e!r}", file=sys.stderr)

    # phase split: a bind+prefill-only program isolates everything before the
    # 5-step beam scan; decode time = total − bind+prefill.  Best effort —
    # the headline must survive a failure here.
    split = {}
    try:
        @jax.jit
        def bind_prefill(params, ids, mask, pixels, valid, icv):
            fwd = bind_decode(params, pixels, valid, ids, icv, max_len)
            from licv_vqa_tpu.infer.decode import _positions_from_mask

            logits, _ = fwd(ids, mask, _positions_from_mask(mask), None)
            return logits[:, -1, :1]

        np.asarray(bind_prefill(*args))  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(bind_prefill(*args))
        bp_ms = (time.perf_counter() - t0) / reps * 1e3
        split = {
            "bind_prefill_ms": round(bp_ms, 1),
            "beam_decode_ms": round(dt * 1e3 - bp_ms, 1),
        }
    except Exception as e:  # pragma: no cover - hardware-path diagnostics
        print(f"bench: eval-shape split failed: {e!r}", file=sys.stderr)

    # Rooflines PER SCHEDULE (VERDICT r4 weak #1: one 5-pass ceiling was
    # charged to every arm, so the 4-pass overlapped headline read >100%).
    # Each arm's ceiling charges exactly the weight-stream passes its
    # schedule performs; decode passes are weight-stream bound (beams share
    # each step's weight read), prefill/vision are MXU bound, and a merged
    # pass costs max(stream, packed-prefill MXU) since the prefill matmuls
    # ride the decode pass's weight read.  Uses the MEASURED v5e streaming
    # bandwidth (tools/bench_decode_breakdown.py), not datasheet.
    stream_bytes = _stream_bytes(params)
    kv_bytes = (
        n_layers * bs * NUM_BEAMS * max_len * KV_HEADS * KV_HEAD_DIM * 2 * 2
    )  # bf16 K+V
    vis_flops = bs * VIT_H_FLOPS_PER_IMAGE
    prefill_flops = bs * LM_FLOPS_PER_TOKEN * PROMPT_LEN
    mxu_peak = MXU_INT8_OPS if quantize else MXU_BF16_FLOPS
    t_vis = vis_flops / mxu_peak
    t_pref_mxu = prefill_flops / mxu_peak
    t_pass = (stream_bytes + kv_bytes) / MEASURED_STREAM_BPS
    # plain: 1 prefill pass + EVAL_MAX_NEW-1 beam-step passes (the last
    # beam transition reuses in-hand logits — infer/decode.py)
    t_plain = (
        t_vis
        + max(t_pref_mxu, stream_bytes / MEASURED_STREAM_BPS)
        + (EVAL_MAX_NEW - 1) * t_pass
    )
    # overlapped: the prefill folds into the first beam pass (4 passes at
    # the eval shape — infer/eval_chain.py)
    t_overlap = (
        t_vis
        + max(t_pref_mxu, t_pass)
        + (EVAL_MAX_NEW - 2) * t_pass
    )
    # pooled: ~one merged pass per question, P*K beam rows share each
    # weight read; (N+P)/N drain passes; KV traffic covers the whole pool
    p_depth = EVAL_MAX_NEW - 1
    kv_pool = kv_bytes * p_depth
    t_pooled = (
        t_vis
        + (pool_n + p_depth)
        / pool_n
        * max(
            t_pref_mxu,
            (stream_bytes + kv_pool) / MEASURED_STREAM_BPS,
        )
    )
    ceil_plain = bs / t_plain
    ceil_overlap = bs / t_overlap
    ceil_pooled = bs / t_pooled
    variant = "int8w" if quantize else "bf16"
    # headline = the shipped runner's best schedule: `infer_chain` (r4)
    # scans whole questions inside one dispatch, so the per-question relay
    # sync (~30 ms through the axon tunnel — NOT chip time) amortizes over
    # the chain; the OVERLAPPED chain (eval_chain.py) additionally packs
    # the next question's prefill into the first beam step.  The pipelined
    # (depth-2, one dispatch per question) and serial views stay in the
    # JSON for continuity with r2/r3 numbers.
    candidates = [
        (qps, "pipelined(depth=2)", ceil_plain),
        (qps_device, f"chained(infer_chain={reps})", ceil_plain),
        (
            qps_overlap,
            f"chained+overlapped_prefill(infer_chain={reps})",
            ceil_overlap,
        ),
        (
            qps_pooled,
            f"pooled(groups={EVAL_MAX_NEW - 1},n={pool_n})",
            ceil_pooled,
        ),
    ]
    headline, schedule, ceiling = max(
        ((v, s, c) for v, s, c in candidates if v is not None),
        key=lambda t: t[0],
    )
    out = {
        "metric": f"icv_steered_eval_questions_per_sec_per_chip"
        f"_idefics{n_layers}L4096d_{variant}_bs{bs}_beam3_maxnew5",
        "value": round(headline, 2),
        "unit": "questions/s/chip",
        "schedule": schedule,
        # baseline at the same shape: 15 tok/s estimate ÷ 5 tokens/question
        "vs_baseline": round(
            headline / (BASELINE_TOKENS_PER_SEC / EVAL_MAX_NEW), 2
        ),
        "baseline_estimated": True,
        # the WINNING schedule's own ceiling (per-schedule pass counts);
        # the per-arm ceilings ride alongside for the phase accounting
        "roofline_questions_per_sec": round(ceiling, 2),
        "pct_of_hbm_roofline": round(100.0 * headline / ceiling, 1),
        "roofline_plain_qps": round(ceil_plain, 2),
        "roofline_overlapped_qps": round(ceil_overlap, 2),
        "roofline_pooled_qps": round(ceil_pooled, 2),
        "tokens_per_sec_per_chip": round(headline * EVAL_MAX_NEW, 2),
        "questions_per_sec_pipelined": round(qps, 2),
        # strictly serial dispatch→sync latency view (infer_pipeline=1)
        "questions_per_sec_serial": round(qps_serial, 2),
        "latency_ms_per_question": round(1e3 * bs / qps_serial, 1),
        "questions_per_sec_pipeline4": round(qps_pipe4, 2),
    }
    if qps_device is not None:
        out["questions_per_sec_device"] = round(qps_device, 2)
        out["device_ms_per_question"] = round(1e3 * bs / qps_device, 1)
    if qps_overlap is not None:
        out["questions_per_sec_overlapped"] = round(qps_overlap, 2)
    if qps_pooled is not None:
        out["questions_per_sec_pooled"] = round(qps_pooled, 2)
    out.update(split)
    return out


def run_serving(
    n_layers: int = 32, n_slots: int = 64, quantize: bool = True,
    kv8: bool = True,
) -> dict:
    """Continuous-serving steady state at the bs=64 shape: the slot pool
    decodes in lockstep while admissions ride the MERGED admit+decode
    program (chunked prefill — the admission's prefill matmuls pack into
    the pool step's weight stream, so prefills no longer stall the pool;
    infer/serving.py::_build_merged_admit, models/idefics.py::
    make_idefics_merged_admit_fn).  Same per-request work as the static
    bs=64 variant (prompt PROMPT_LEN, one image, MAX_NEW tokens, ICV on),
    so the static variant's achievable ceiling carries over; the value is
    useful tokens/s/chip over a 3×n_slots-request stream on a WARM engine.
    A same-child static pass (the old variant's exact measurement) is
    reported alongside for continuity."""
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.serving import Request, ServingEngine
    from licv_vqa_tpu.models.idefics import (
        make_idefics_merged_admit_fn,
        make_idefics_serving_fns,
    )

    cfg, params, bind_decode = build(n_layers, quantize=quantize, kv8=kv8)
    rng = np.random.default_rng(0)
    icv = (
        jnp.asarray(rng.normal(size=(cfg.text.n_layers, 4096)).astype(np.float32))
        * 0.1
    ).astype(jnp.bfloat16)

    n_req = int(os.environ.get("BENCH_SERVE_REQS", 3)) * n_slots
    ids_all = rng.integers(3, 32000, size=(n_req, PROMPT_LEN)).astype(np.int32)
    ids_all[:, 1] = cfg.image_token_id
    pixels_all = rng.normal(size=(n_req, 1, 224, 224, 3)).astype(np.float32)
    reqs = [
        Request(
            uid=i, input_ids=ids_all[i], pixel_values=pixels_all[i],
            max_new=MAX_NEW,
        )
        for i in range(n_req)
    ]

    # lever knobs (chip-sweepable): sync_steps trades host round trips for
    # refill latency; admit size trades ViT/prefill batch efficiency for
    # refill-wave length; harvest_lag=0 frees finished slots immediately
    # (measured: the lag-1 idle was the whole engine-vs-static gap at
    # uniform bs=64); merged admits are the chunked-prefill program.
    sync_steps = int(os.environ.get("BENCH_SERVE_SYNC", 4))
    admit = int(os.environ.get("BENCH_SERVE_ADMIT", 8))
    lag = int(os.environ.get("BENCH_SERVE_LAG", 0))
    use_merged = os.environ.get("BENCH_SERVE_MERGED", "1") != "0"

    prefill, decode, axes = make_idefics_serving_fns(cfg, eos_token_id=-1)
    merged = (
        make_idefics_merged_admit_fn(cfg, eos_token_id=-1)
        if use_merged
        else None
    )
    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=-1,  # no EOS in the random stream: every request runs MAX_NEW
        pad_token_id=0,
        n_slots=n_slots, out_cap=MAX_NEW, prompt_buckets=(PROMPT_LEN,),
        sync_steps=sync_steps, admit_sizes=(admit,), icv_scaled=icv,
        merged_admit_fn=merged, merged_admit_in_run=use_merged,
        harvest_lag=lag,
    )

    # fused arm: the WHOLE workload as one on-device lax.while_loop (merged
    # admissions advance the pool inside the admit branch) — zero host
    # round trips after the one-shot upload; the regime where the ~30-50 ms
    # per-dispatch relay cost of the host-driven loop disappears entirely.
    fused = os.environ.get("BENCH_SERVE_FUSED", "0") == "1"

    def one_pass():
        engine.steps_run = 0
        for r in reqs:
            engine.submit(r)
        t0 = time.perf_counter()
        got = engine.run_fused() if fused else engine.run()
        dt = time.perf_counter() - t0
        useful = sum(len(v) for v in got.values())
        return useful, dt

    one_pass()  # compile + warm every program (plain fill + merged admits)
    useful, dt = one_pass()
    tok_per_sec = useful / dt
    merged_admits = engine.merged_admits
    # occupancy diagnostic: useful slot-steps / dispatched slot-steps (the
    # gap = finished-but-unrefilled idle + short-pool refill waves)
    if fused:
        pool_steps = engine.fused_stats["decode_iters"]
    else:
        pool_steps = engine.steps_run
    occupancy = useful / max(pool_steps * n_slots, 1)

    # same-child static pass: the previous rounds' exact bs=64 measurement
    from licv_vqa_tpu.infer.decode import greedy_generate

    @jax.jit
    def gen(params, ids, mask, pixels, valid, icv):
        fwd = bind_decode(params, pixels, valid, ids, icv, PROMPT_LEN + MAX_NEW + 1)
        return greedy_generate(
            fwd, ids, mask, max_new_tokens=MAX_NEW, eos_token_id=-1,
            pad_token_id=0,
        )

    sids = jnp.asarray(ids_all[:n_slots])
    smask = jnp.ones_like(sids)
    spx = jnp.asarray(pixels_all[:n_slots])
    spv = jnp.ones((n_slots, 1), bool)

    def sync(x):
        return np.asarray(x[:, -1])

    sync(gen(params, sids, smask, spx, spv, icv))  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(gen(params, sids, smask, spx, spv, icv))
    static_tok_s = n_slots * MAX_NEW / ((time.perf_counter() - t0) / reps)

    # achievable ceiling: identical accounting to run() at this shape
    stream_bytes = _stream_bytes(params)
    cache_len = PROMPT_LEN + MAX_NEW
    per_head = KV_HEAD_DIM * 1 + 4 if kv8 else KV_HEAD_DIM * 2
    kv_bytes = n_layers * n_slots * cache_len * KV_HEADS * per_head * 2
    t_step_bound = (stream_bytes + kv_bytes) / MEASURED_STREAM_BPS
    mxu_peak = MXU_INT8_OPS if quantize else MXU_BF16_FLOPS
    t_bind_bound = (
        n_slots * VIT_H_FLOPS_PER_IMAGE
        + n_slots * LM_FLOPS_PER_TOKEN * PROMPT_LEN
    ) / mxu_peak
    achievable = n_slots * MAX_NEW / ((MAX_NEW - 1) * t_step_bound + t_bind_bound)
    variant = ("int8w" if quantize else "bf16") + ("_kv8" if kv8 else "")
    return {
        "metric": f"icv_steered_serving_tokens_per_sec_per_chip"
        f"_idefics{n_layers}L4096d_{variant}_slots{n_slots}_chunked_prefill",
        "value": round(tok_per_sec, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_per_sec / BASELINE_TOKENS_PER_SEC, 2),
        "baseline_estimated": True,
        "achievable_tokens_per_sec": round(achievable, 1),
        "pct_of_achievable": round(100.0 * tok_per_sec / achievable, 1),
        "static_batch_tokens_per_sec": round(static_tok_s, 2),
        "speedup_vs_static_batch": round(tok_per_sec / static_tok_s, 2),
        "merged_admits": int(merged_admits),
        "slot_occupancy": round(occupancy, 3),
        "scheduler": "fused" if fused else "host",
        "sync_steps": sync_steps,
        "admit_size": admit,
        "harvest_lag": lag,
        "requests": n_req,
        "weight_stream_gb_per_step": round((stream_bytes + kv_bytes) / 1e9, 3),
    }


def _child(spec: str) -> None:
    """Run one variant ('<layers>:<int8|bf16>[:bs<N>][:kv8][:eval][:serve]');
    print JSON."""
    # persistent compile cache: the beam/flash compiles through the tunnel
    # cost minutes; a prior session's entries make re-benches near-free.
    # Children only run after preflight, so the backend probe cannot hang.
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parts = spec.split(":")
    n_layers, kind = parts[0], parts[1]
    bs = 8
    kv8 = False
    eval_shape = False
    serve = False
    for p in parts[2:]:
        if p.startswith("bs"):
            bs = int(p[2:])
        elif p == "kv8":
            kv8 = True
        elif p == "eval":
            eval_shape = True
        elif p == "serve":
            serve = True
    if serve:
        result = run_serving(
            int(n_layers), n_slots=bs, quantize=(kind == "int8"), kv8=kv8
        )
    elif eval_shape:
        result = run_eval_shape(int(n_layers), bs=bs, quantize=(kind == "int8"))
    else:
        result = run(int(n_layers), quantize=(kind == "int8"), bs=bs, kv8=kv8)
    print(json.dumps(result), flush=True)


def _preflight(timeout_s: int = 240) -> bool:
    """One cheap device probe before spending variant budgets: a dead TPU
    tunnel (relay exited → remote-compile port refuses) otherwise burns the
    full budget across variants with opaque per-variant tracebacks."""
    code = (
        "import jax, jax.numpy as jnp; "
        "print(jax.devices()); "
        # a CPU fallback (e.g. plugin fails at platform registration) must
        # NOT pass preflight — its timings would be banked as per-chip TPU
        # metrics
        "assert jax.default_backend() == 'tpu', jax.default_backend(); "
        "print(float(jnp.ones((8, 8)).sum()))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(
            f"bench: device preflight hung >{timeout_s}s — TPU tunnel wedged "
            "or dead; aborting before spending variant budgets",
            file=sys.stderr, flush=True,
        )
        return False
    if proc.returncode != 0:
        print(
            "bench: device preflight failed — TPU unreachable (dead tunnel "
            f"relay?):\n{proc.stderr[-1000:]}",
            file=sys.stderr, flush=True,
        )
        return False
    return True


def _relay_port_open(port: int = 8083, timeout_s: float = 3.0) -> bool:
    """Cheap liveness probe of the axon relay's remote-compile port — a
    refused connect means the tunnel process is gone (a wedged-but-alive
    tunnel still accepts)."""
    import socket

    try:
        with socket.create_connection(("127.0.0.1", port), timeout=timeout_s):
            return True
    except OSError:
        return False


def prewarm() -> None:
    """AOT-populate the persistent compile cache for EVERY variant.

    Round-3 postmortem (VERDICT r3 weak #2): a program-changing commit after
    the last cache-warming run left `32:int8:bs8` paying a cold flagship
    compile through the tunnel inside its 720s budget — the variant banked
    nothing.  Run `python bench.py --prewarm` after ANY commit that changes a
    compiled program (model code, decode loop, quantization, shapes); each
    variant then re-runs inside its normal budget at deserialization cost.

    Each variant runs in its own child with a generous budget and a FAR
    deadline so even the best-effort extras (eval-shape device view, phase
    split) compile into the cache.  Failures are reported but don't stop the
    sweep — a partial prewarm still helps.
    """
    if not _preflight():
        raise SystemExit("prewarm aborted: no usable accelerator")
    budget = int(os.environ.get("BENCH_PREWARM_BUDGET_S", 1800))
    for spec, _, _ in VARIANTS:
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", spec],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=budget,
                env={**os.environ,
                     "BENCH_CHILD_DEADLINE": str(time.time() + budget)},
            )
            ok = proc.returncode == 0
            tail = "" if ok else f"\n{proc.stderr[-1500:]}"
        except subprocess.TimeoutExpired as e:
            ok, tail = False, f" (timeout)\n{(e.stderr or '')[-800:]}"
        print(
            f"prewarm: {spec} {'ok' if ok else 'FAILED'} in "
            f"{time.monotonic() - t0:.0f}s{tail}",
            file=sys.stderr, flush=True,
        )


def main() -> None:
    deadline = time.monotonic() + float(os.environ.get("BENCH_BUDGET_S", 1560))
    # a tunnel merely WEDGED (1-5 min after a killed process) recovers, and a
    # dead relay is sometimes restarted by the harness between runs — so on
    # failure, poll the relay port through a bounded window and re-probe the
    # moment it accepts, instead of one blind fixed-sleep retry
    if not _preflight():
        wait_s = float(os.environ.get("BENCH_PREFLIGHT_WAIT_S", 300))
        print(
            f"bench: preflight failed — polling tunnel for up to {wait_s:.0f}s "
            "(wedge vs dead relay)",
            file=sys.stderr, flush=True,
        )
        wait_deadline = time.monotonic() + wait_s
        ok = False
        while time.monotonic() < wait_deadline:
            time.sleep(15)
            if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") and not _relay_port_open():
                continue  # relay definitely down: skip the 4-min full probe
            if _preflight():
                ok = True
                break
        if not ok:
            raise SystemExit("bench aborted: no usable accelerator (see stderr)")
    banked = 0
    for spec, budget, reserve in VARIANTS:
        if banked and ":bf16:" in spec:
            continue  # smaller bf16 fallbacks add nothing once one is banked
        remaining = deadline - time.monotonic()
        if remaining < 60:
            print("bench: global budget exhausted, stopping", file=sys.stderr)
            break
        if reserve and remaining < budget + reserve:
            print(
                f"bench: skipping optional {spec} — {remaining:.0f}s left "
                f"cannot cover it plus the {reserve}s headline reserve",
                file=sys.stderr, flush=True,
            )
            continue
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", spec],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True,
                text=True,
                timeout=min(budget, remaining),
                # children skip best-effort extras (eval-shape device view)
                # when this deadline nears, so a cold-cache compile cannot
                # cost the variant's whole JSON line
                env={**os.environ,
                     "BENCH_CHILD_DEADLINE":
                         str(time.time() + min(budget, remaining))},
            )
        except subprocess.TimeoutExpired as e:
            print(
                f"bench: variant {spec} hit its {budget}s budget; "
                f"stderr tail: {(e.stderr or '')[-800:]}",
                file=sys.stderr,
                flush=True,
            )
            continue
        dt = time.monotonic() - t0
        if proc.returncode == 0 and proc.stdout.strip():
            # bank immediately — forward the child's JSON line verbatim
            line = proc.stdout.strip().splitlines()[-1]
            print(line, flush=True)
            print(f"bench: variant {spec} ok in {dt:.0f}s", file=sys.stderr)
            banked += 1
        else:
            print(
                f"bench: variant {spec} failed rc={proc.returncode} in "
                f"{dt:.0f}s\n{proc.stderr[-2000:]}",
                file=sys.stderr,
                flush=True,
            )
    if not banked:
        raise SystemExit("bench failed at all variants")


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--run":
        _child(sys.argv[2])
    elif len(sys.argv) == 2 and sys.argv[1] == "--prewarm":
        prewarm()
    else:
        main()
