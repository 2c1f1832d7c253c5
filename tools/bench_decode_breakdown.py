#!/usr/bin/env python
"""Per-step time breakdown of the 32L int8 decode on real TPU hardware.

The headline decode runs at ~56% of the naive HBM roofline (bench.py).  This
tool brackets where the per-step milliseconds go by timing stripped-down
variants of the same 32-iteration layer scan at identical weight layout:

- ``stream``   : scan only REDUCES every weight leaf (pure HBM read) — the
                 achievable streaming-bandwidth ceiling, which is what the
                 roofline should be measured against (not datasheet GB/s).
- ``matmul``   : all per-layer projections (q/k/v/o + SwiGLU) on a (B,1,D)
                 activation, no attention/cache — weight stream + MXU cost.
- ``attn``     : matmul + real cached attention (dynamic_update_slice into
                 the (L,B,S,H,Dh) cache via scan xs/ys, softmax over S).
- ``full``     : the production text-decoder step (adds norms, rope, ICV,
                 lm_head) via models.decoder.forward_hidden.

Run: python tools/bench_decode_breakdown.py [modes...]
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# BRK_BS=64 BRK_KV=int8 reproduce the bs=64 serving variant's shape
BS = int(os.environ.get("BRK_BS", 8))
CACHE = int(os.environ.get("BRK_CACHE", 97))
KV_DTYPE = os.environ.get("BRK_KV", "bf16")  # bf16 | int8 (full variant)
QUANT = os.environ.get("BRK_Q", "int8")  # int8 | int4 | none (weight quant)
STEPS = 32
L = 32


def build_params(quantize=True):
    import jax
    import jax.numpy as jnp
    from licv_vqa_tpu.models.config import DecoderConfig
    from licv_vqa_tpu.models.decoder import init_decoder_params
    from licv_vqa_tpu.ops.quantize import quantize_layer_stack

    cfg = DecoderConfig(
        vocab_size=32000,
        d_model=4096,
        n_layers=L,
        n_heads=32,
        n_kv_heads=32,
        d_ff=11008,
        norm_type="rmsnorm",
        activation="silu_glu",
        positional="rope",
        dtype=jnp.bfloat16,
        kv_cache_dtype=KV_DTYPE,
    )

    def init():
        p = init_decoder_params(jax.random.PRNGKey(0), cfg)
        if quantize and QUANT != "none":
            p["layers"] = quantize_layer_stack(p["layers"], mode=QUANT)
        return p

    p = jax.jit(init)()
    jax.block_until_ready(p["final_norm"])
    return cfg, p


def timeit(fn, args, reps=3):
    import jax
    import numpy as np

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # hard sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main(modes):
    import jax
    import jax.numpy as jnp
    from licv_vqa_tpu.models.decoder import forward_hidden, logits_from_hidden
    from licv_vqa_tpu.ops.int8_matmul import qdot

    assert jax.default_backend() == "tpu", jax.default_backend()
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg, params = build_params()
    layers = params["layers"]

    def leaf_bytes(x):
        if isinstance(x, dict) and set(x) == {"q", "s"}:
            return x["q"].size + x["s"].size * 4
        if isinstance(x, dict) and set(x) == {"q4", "s"}:
            return x["q4"].size + x["s"].size * 2
        return x.size * x.dtype.itemsize

    from licv_vqa_tpu.ops.quantize import is_any_quantized_leaf as is_quantized_leaf

    wbytes = sum(
        leaf_bytes(l) for l in jax.tree.leaves(layers, is_leaf=is_quantized_leaf)
    )
    per_head = 128 + 4 if KV_DTYPE == "int8" else 128 * 2
    kvbytes = L * BS * CACHE * 32 * per_head * 2
    # per-step matmul FLOPs (projections + SwiGLU): 2 × layer weights × BS
    n_weights = sum(
        (
            x["q"].size
            if isinstance(x, dict) and "q" in x
            else 2 * x["q4"].size
            if isinstance(x, dict)
            else x.size
        )
        for x in jax.tree.leaves(layers, is_leaf=is_quantized_leaf)
    )
    flops_step = 2.0 * n_weights * BS
    print(
        f"bs={BS} cache={CACHE} kv={KV_DTYPE}; layer-stack bytes/step: "
        f"{wbytes/1e9:.3f} GB; kv cache: {kvbytes/1e9:.3f} GB; "
        f"matmul {flops_step/1e9:.0f} GFLOP/step",
        flush=True,
    )

    results = {}

    if "stream" in modes:
        nsteps = 8  # enough reps to time; keeps the compiled program small

        @jax.jit
        def stream(layers):
            def body(acc, p_l):
                # cheapest full-read reduce: per-leaf max of the raw payload
                s = jnp.float32(0)
                for x in jax.tree.leaves(
                    p_l,
                    is_leaf=lambda y: isinstance(y, dict)
                    and set(y) in ({"q", "s"}, {"q4", "s"}),
                ):
                    payload = (
                        x.get("q", x.get("q4")) if isinstance(x, dict) else x
                    )
                    s = s + jnp.max(payload).astype(jnp.float32)
                return acc + s, None

            def step(acc, _):
                acc, _ = jax.lax.scan(body, acc, layers)
                return acc, None

            acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=nsteps)
            return acc

        dt = timeit(stream, (layers,))
        bw = nsteps * wbytes / dt / 1e9
        results["stream"] = dt / nsteps * STEPS
        print(f"stream : {dt*1e3/nsteps:7.2f} ms/step  ({bw:.0f} GB/s achieved)",
              flush=True)

    x0 = jnp.zeros((BS, 1, 4096), jnp.bfloat16) + 0.01

    if "matmul" in modes:
        @jax.jit
        def matmul_only(layers, x):
            def body(h, p_l):
                a = p_l["attn"]
                q = qdot(h, a["wq"])
                k = qdot(h, a["wk"])
                v = qdot(h, a["wv"])
                h = h + qdot(q + k + v, a["wo"]).astype(h.dtype)
                m = p_l["mlp"]
                g = qdot(h, m["w_gate"], preferred_element_type=jnp.float32)
                u = qdot(h, m["w_up"], preferred_element_type=jnp.float32)
                z = (jax.nn.silu(g) * u).astype(h.dtype)
                h = h + qdot(z, m["w_down"]).astype(h.dtype)
                return h, None

            def step(h, _):
                h, _ = jax.lax.scan(body, h, layers)
                return h, None

            h, _ = jax.lax.scan(step, x, None, length=STEPS)
            return h

        dt = timeit(matmul_only, (layers, x0))
        results["matmul"] = dt
        print(
            f"matmul : {dt*1e3/STEPS:7.2f} ms/step  "
            f"({STEPS*wbytes/dt/1e9:.0f} GB/s weight stream, "
            f"MXU-MFU {100*STEPS*flops_step/dt/394e12:.1f}% of int8 peak)",
            flush=True,
        )

    if "attn" in modes:
        from licv_vqa_tpu.models import layers as LY

        k_cache = jnp.zeros((L, BS, CACHE, 32, 128), jnp.bfloat16)
        v_cache = jnp.zeros_like(k_cache)

        @jax.jit
        def attn_variant(layers, x, k_cache, v_cache):
            def body(h, xs):
                p_l, kc, vc = xs
                a = p_l["attn"]
                b, s = h.shape[:2]
                q = qdot(h, a["wq"]).reshape(b, s, 32, 128)
                k = qdot(h, a["wk"]).reshape(b, s, 32, 128)
                v = qdot(h, a["wv"]).reshape(b, s, 32, 128)
                kc = jax.lax.dynamic_update_slice(kc, k, (0, 64, 0, 0))
                vc = jax.lax.dynamic_update_slice(vc, v, (0, 64, 0, 0))
                at = LY.dot_product_attention(q, kc, vc)
                h = h + qdot(at.reshape(b, s, 4096), a["wo"]).astype(h.dtype)
                m = p_l["mlp"]
                g = qdot(h, m["w_gate"], preferred_element_type=jnp.float32)
                u = qdot(h, m["w_up"], preferred_element_type=jnp.float32)
                z = (jax.nn.silu(g) * u).astype(h.dtype)
                h = h + qdot(z, m["w_down"]).astype(h.dtype)
                return h, (kc, vc)

            def step(carry, _):
                h, kc, vc = carry
                h, kv = jax.lax.scan(body, h, (layers, kc, vc))
                return (h, kv[0], kv[1]), None

            (h, kc, vc), _ = jax.lax.scan(
                step, (x, k_cache, v_cache), None, length=STEPS
            )
            return h

        dt = timeit(attn_variant, (layers, x0, k_cache, v_cache))
        results["attn"] = dt
        print(f"attn   : {dt*1e3/STEPS:7.2f} ms/step", flush=True)

    if "full" in modes:
        from licv_vqa_tpu.models.decoder import init_kv_cache

        cache0 = init_kv_cache(cfg, BS, CACHE)
        cache0 = dict(cache0, index=jnp.asarray(64, jnp.int32))
        icv = jnp.zeros((L, 4096), jnp.bfloat16) + 0.01
        tok = jnp.ones((BS, 1), jnp.int32)
        ones = jnp.ones((BS, 1), jnp.int32)

        @jax.jit
        def full(params, cache, icv):
            def step(carry, t):
                h_prev, cache = carry
                pos = jnp.full((BS, 1), 64, jnp.int32) + t
                h, cache = forward_hidden(
                    cfg, params, h_prev, ones, icv_scaled=icv, cache=cache,
                    positions=pos,
                )
                lg = logits_from_hidden(cfg, params, h)
                return (h_prev, cache), lg[:, -1, :1]

            emb = params["embed"][tok].astype(cfg.dtype)
            (_, cache), lgs = jax.lax.scan(
                step, (emb, cache), jnp.arange(STEPS)
            )
            return lgs

        dt = timeit(full, (params, cache0, icv))
        results["full"] = dt
        print(
            f"full   : {dt*1e3/STEPS:7.2f} ms/step ({BS*STEPS/dt:.1f} tok/s; "
            f"{STEPS*(wbytes+kvbytes)/dt/1e9:.0f} GB/s effective, "
            f"MXU-MFU {100*STEPS*flops_step/dt/394e12:.1f}%)",
            flush=True,
        )

    return results


if __name__ == "__main__":
    main(sys.argv[1:] or ["stream", "matmul", "attn", "full"])
