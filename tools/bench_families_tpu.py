#!/usr/bin/env python
"""TPU decode throughput for the OTHER two model families at full depth.

bench.py's headline is the Idefics-9B architecture; this banks the same
protocol (bs=8, 64-token prompt, 32 new tokens, ICV at every layer, int8
weight-only so full depth fits one v5e) for Idefics2-8B-base (Mistral GQA +
SigLIP + perceiver connector) and OpenFlamingo-9B (MPT/ALiBi + ViT-L +
gated xattn).  Results recorded in STATUS.md.

Usage: python tools/bench_families_tpu.py [--eval-shape] [idefics2|openflamingo] ...
  --eval-shape: reference eval workload instead (bs=1 beam-3 max_new=5;
  serial wall q/s + device-time q/s via a chained fori_loop, one readback).
Env: BENCH_BS (default 8), BENCH_KV8=1 (int8 KV cache), EVAL_REPS (default 10).
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BS = int(os.environ.get("BENCH_BS", 8))
KV8 = os.environ.get("BENCH_KV8", "0") == "1"
PROMPT_LEN = 64
MAX_NEW = 32


def _build_family(family: str):
    """Family → (cfg, int8 params, bind_decode, img_hw); weights are
    synthesized directly in int8 so the bf16 init never exists in HBM."""
    import jax
    import jax.numpy as jnp

    if family == "idefics2":
        from licv_vqa_tpu.models.idefics2 import (
            Idefics2Config,
            init_idefics2_params,
            make_idefics2_forward_fns,
        )

        cfg = Idefics2Config.idefics2_8b()
        if KV8:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, text=dataclasses.replace(cfg.text, kv_cache_dtype="int8")
            )
        init_fn, make_fns = init_idefics2_params, make_idefics2_forward_fns
        img_hw = 448  # variable-resolution tower; keep the bench prefill lean
    elif family == "openflamingo":
        from licv_vqa_tpu.models.openflamingo import (
            OpenFlamingoConfig,
            init_openflamingo_params,
            make_openflamingo_forward_fns,
        )

        cfg = OpenFlamingoConfig.openflamingo_9b()
        if KV8:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, text=dataclasses.replace(cfg.text, kv_cache_dtype="int8")
            )
        init_fn, make_fns = init_openflamingo_params, make_openflamingo_forward_fns
        img_hw = cfg.vision.image_size
    else:
        raise ValueError(family)

    # Synthesize int8 weights DIRECTLY from shapes: materializing the full
    # bf16 init and then quantizing peaks over one v5e's HBM for Mistral-7B
    # (d_ff 14336) — for a timing bench random int8 + constant scales are
    # equivalent, and the bf16 copy never exists.
    from licv_vqa_tpu.ops.quantize import _should_quantize

    shapes = jax.eval_shape(lambda k: init_fn(k, cfg), jax.random.PRNGKey(0))

    def synth():
        base = jax.random.PRNGKey(0)
        idx = iter(range(1 << 20))

        def leaf(path, sd):
            key = jax.random.fold_in(base, next(idx))
            group = getattr(path[0], "key", "")
            if group in ("layers", "xattn") and _should_quantize(path, sd):
                q = jax.random.randint(key, sd.shape, -127, 128, jnp.int8)
                s = jnp.full(sd.shape[:-2] + (1, sd.shape[-1]), 2e-4, jnp.float32)
                return {"q": q, "s": s}
            if not jnp.issubdtype(sd.dtype, jnp.floating):
                return jnp.zeros(sd.shape, sd.dtype)
            return (jax.random.normal(key, sd.shape, jnp.float32) * 0.02).astype(
                sd.dtype
            )

        return jax.tree_util.tree_map_with_path(leaf, shapes)

    params = jax.jit(synth)()
    jax.block_until_ready(jax.tree.leaves(params)[0])
    _, bind_decode = make_fns(cfg, eos_token_id=2)
    return cfg, params, bind_decode, img_hw


def _make_inputs(cfg, family: str, img_hw: int, bs: int):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.text.vocab_size - 8, size=(bs, PROMPT_LEN)).astype(
        np.int32
    )
    if family == "idefics2":
        # inline image tokens: a contiguous image_seq_len run in the prompt
        ids[:, 1 : 1 + cfg.image_seq_len // 2] = cfg.image_token_id
    else:
        ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(bs, 1, img_hw, img_hw, 3)).astype(np.float32)
    valid = np.ones((bs, 1), bool)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)).astype(np.float32)
        * 0.1
    ).astype(jnp.bfloat16)
    return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels),
            jnp.asarray(valid), icv)


def bench_family(family: str) -> dict:
    import jax

    from licv_vqa_tpu.infer.decode import greedy_generate

    cfg, params, bind_decode, img_hw = _build_family(family)
    args = (params,) + _make_inputs(cfg, family, img_hw, BS)

    @jax.jit
    def gen(params, ids, mask, pixels, valid, icv):
        fwd = bind_decode(params, pixels, valid, ids, icv, PROMPT_LEN + MAX_NEW + 1)
        return greedy_generate(
            fwd, ids, mask, max_new_tokens=MAX_NEW, eos_token_id=-1, pad_token_id=0
        )

    np.asarray(gen(*args)[:, -1])  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(gen(*args)[:, -1])
    dt = (time.perf_counter() - t0) / reps
    tok = BS * MAX_NEW / dt
    print(f"{family}: full-depth int8 ICV-steered greedy decode "
          f"{tok:.1f} tok/s/chip (bs={BS}{', kv8' if KV8 else ''})", flush=True)
    return {"family": family, "tokens_per_sec": tok}


def bench_family_eval(family: str) -> dict:
    """Reference eval workload per family: bs=1, beam-3, max_new=5
    (config/inference.yaml:11,26-30).  Reports serial wall q/s AND the
    device-time view (EVAL_REPS questions chained in one fori_loop, one
    readback — zero relay sync, same trick as bench_prefill_tpu)."""
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.decode import beam_generate

    NUM_BEAMS, EVAL_MAX_NEW, reps = 3, 5, int(os.environ.get("EVAL_REPS", 10))
    cfg, params, bind_decode, img_hw = _build_family(family)
    args = (params,) + _make_inputs(cfg, family, img_hw, 1)
    max_len = PROMPT_LEN + EVAL_MAX_NEW + 1

    def _gen(params, ids, mask, pixels, valid, icv):
        fwd = bind_decode(params, pixels, valid, ids, icv, max_len)
        return beam_generate(
            fwd, ids, mask, max_new_tokens=EVAL_MAX_NEW, eos_token_id=-1,
            pad_token_id=0, num_beams=NUM_BEAMS, length_penalty=0.0,
        )

    gen = jax.jit(_gen)
    np.asarray(gen(*args)[:, -1])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(gen(*args)[:, -1])
    qps_serial = reps / (time.perf_counter() - t0)

    @jax.jit
    def gen_chain(params, ids, mask, pixels, valid, icv):
        def body(_, px):
            out = _gen(params, ids, mask, px, valid, icv)
            return px + (out[0, -1] % 3 - 1).astype(px.dtype) * 1e-6

        return jax.lax.fori_loop(0, reps, body, pixels)[0, 0, 0, 0, 0]

    np.asarray(gen_chain(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(gen_chain(*args))
    qps_device = reps / (time.perf_counter() - t0)
    print(f"{family}: eval shape (bs=1 beam-3 max_new=5) "
          f"{qps_serial:.2f} q/s serial wall, {qps_device:.2f} q/s device-time",
          flush=True)
    return {"family": family, "qps_serial": qps_serial, "qps_device": qps_device}


if __name__ == "__main__":
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    argv = sys.argv[1:]
    eval_shape = "--eval-shape" in argv
    fams = [a for a in argv if not a.startswith("--")] or [
        "idefics2", "openflamingo"
    ]
    for fam in fams:
        (bench_family_eval if eval_shape else bench_family)(fam)
