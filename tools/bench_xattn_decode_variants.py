#!/usr/bin/env python
"""Race two idefics decode-scan structures at full scale (32L int8, bs=8).

The production decode is a FLAT layer scan with cond-gated cross-attention:
each of the 8 xattn groups' params is fetched with ``dynamic_index_in_dim``
(a ~200MB gather copy per fire) and the KV cache flows through scan xs/ys
(full 0.4GB re-written every step).  The breakdown bench (decode ~18.8ms vs
14.3ms for the text-only decoder) points at exactly those two costs.

Variant ``carry``: outer scan over GROUPS (xattn params arrive as scan xs —
streamed, no gather) wrapping an inner scan over the group's layers; the
stacked KV cache rides the CARRY and only the new token's row is written
per layer (in-place carry aliasing), never the whole cache.

Both variants share weights, inputs, and the bound image-latent K/V; outputs
are checked identical before timing.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BS = 8
PROMPT = 64
STEPS = 32


def main(mode="both"):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench_decode_breakdown import timeit  # noqa
    import bench

    from licv_vqa_tpu.models import layers as LY
    from licv_vqa_tpu.models.decoder import decoder_layer, logits_from_hidden
    from licv_vqa_tpu.models.idefics import (
        encode_images,
        gated_xattn_block,
        idefics_forward,
        image_attention_onehot,
        last_image_onehot,
        precompute_xattn_kv,
    )
    from licv_vqa_tpu.models.decoder import init_kv_cache

    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg, params, _ = bench.build(32, quantize=True)
    t = cfg.text
    interval = cfg.cross_layer_interval
    n_groups = t.n_layers // interval

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 32000, size=(BS, PROMPT)).astype(np.int32)
    ids[:, 1] = cfg.image_token_id
    pixels = jnp.asarray(rng.normal(size=(BS, 1, 224, 224, 3)).astype(np.float32))
    valid = jnp.ones((BS, 1), bool)
    icv = (jnp.zeros((t.n_layers, t.d_model)) + 0.01).astype(jnp.bfloat16)
    max_len = PROMPT + STEPS + 1

    @jax.jit
    def prepare(params, pixels, valid, prompt_ids):
        latents = encode_images(cfg, params, pixels)
        pv = valid[:, None, :].astype(jnp.float32)
        onehot = last_image_onehot(prompt_ids, cfg.image_token_id, 1) * pv
        xattn_kv = precompute_xattn_kv(cfg, params, latents)
        prefill_onehot = (
            image_attention_onehot(prompt_ids, cfg.image_token_id, 2, 1) * pv
        )
        mask = jnp.ones((BS, PROMPT), jnp.int32)
        pos = jnp.arange(PROMPT, dtype=jnp.int32)[None].repeat(BS, 0)
        cache = init_kv_cache(t, BS, max_len)
        _, cache = idefics_forward(
            cfg, params, prompt_ids, mask, latents, prefill_onehot,
            icv_scaled=icv, cache=cache, positions=pos, xattn_kv=xattn_kv,
            last_logit_only=True,
        )
        return latents, onehot, xattn_kv, cache

    latents, onehot, xattn_kv, cache0 = jax.tree.map(
        jnp.asarray, prepare(params, pixels, valid, jnp.asarray(ids))
    )
    np.asarray(cache0["index"])

    n_lat = latents.shape[1]
    xmask = jnp.repeat(onehot, n_lat, axis=-1) > 0
    gate = jnp.any(xmask, axis=-1).astype(jnp.float32)
    xmask4 = xmask[:, None, :, :]

    tok0 = jnp.full((BS, 1), 17, jnp.int32)
    ones = jnp.ones((BS, 1), jnp.int32)

    # ---- variant A: the production flat-scan forward ----------------------
    # latents / masks / precomputed xattn K/V / icv are explicit jit ARGS:
    # closure arrays get inlined as program constants and OOM the chip
    @jax.jit
    def flat(params, cache, tok, latents, onehot, xattn_kv, icv):
        def step(carry, i):
            tok, cache = carry
            pos = jnp.full((BS, 1), PROMPT, jnp.int32) + i
            lg, cache = idefics_forward(
                cfg, params, tok, ones, latents, onehot, icv_scaled=icv,
                cache=cache, positions=pos, xattn_kv=xattn_kv,
            )
            nxt = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)[:, None]
            return (nxt, cache), nxt

        (_, cache), toks = jax.lax.scan(step, (tok, cache), jnp.arange(STEPS))
        return toks[:, :, 0].T

    # ---- variant B: group scan + carry cache ------------------------------
    def regroup(x):
        return x.reshape((n_groups, interval) + x.shape[1:])

    gicv = regroup(icv)
    glayers = None
    if mode in ("carry", "both"):
        # donate the flat stack into the regrouped one — a plain reshape
        # would double-resident the 6.5GB layer buffers and OOM the chip
        glayers = jax.jit(
            lambda l: jax.tree.map(regroup, l), donate_argnums=0
        )(params["layers"])
        jax.block_until_ready(jax.tree.leaves(glayers)[0])
        if mode == "carry":
            params = dict(params, layers=None)

    @jax.jit
    def carry_cache(params, cache, tok, latents, xmask4, gate, xattn_kv, icv, glayers, gicv):
        k0, v0 = cache["k"], cache["v"]
        cache_pos0, cache_valid0 = cache["pos"], cache["valid"]
        index0 = cache["index"]

        def step(carry, i):
            tok, k_all, v_all, cache_pos, cache_valid, index = carry
            pos = jnp.full((BS, 1), PROMPT, jnp.int32) + i
            h = params["embed"][tok].astype(t.dtype)
            cos, sin = LY.rope_cos_sin(pos, t.head_dim, t.rope_theta)
            cache_pos = jax.lax.dynamic_update_slice(cache_pos, pos, (0, index))
            cache_valid = jax.lax.dynamic_update_slice(
                cache_valid, jnp.ones((BS, 1), bool), (0, index)
            )
            written = (
                jnp.arange(max_len, dtype=jnp.int32)[None, :] < index + 1
            )
            mask = (
                (cache_pos[:, None, :] <= pos[:, :, None])
                & cache_valid[:, None, :]
                & written[:, None, :]
            )[:, None, :, :]

            def group_body(gc, xs):
                h, k_all, v_all = gc
                xp, lp, icv_g, kv_g, gi = xs
                h = gated_xattn_block(
                    cfg, xp, h, latents, xmask4, gate, kv=kv_g
                )

                def layer_body(lc, xs2):
                    h, k_all, v_all = lc
                    p_l, icv_row, lj = xs2
                    li = gi * interval + lj
                    kc = jax.lax.dynamic_index_in_dim(k_all, li, 0, False)
                    vc = jax.lax.dynamic_index_in_dim(v_all, li, 0, False)
                    h, new_kv = decoder_layer(
                        t, p_l, h, cos, sin, mask, None, icv_row,
                        (kc, vc, index),
                    )
                    k_row = jax.lax.dynamic_slice(
                        new_kv[0], (0, index, 0, 0),
                        (BS, 1, t.n_kv_heads, t.head_dim),
                    )
                    v_row = jax.lax.dynamic_slice(
                        new_kv[1], (0, index, 0, 0),
                        (BS, 1, t.n_kv_heads, t.head_dim),
                    )
                    k_all = jax.lax.dynamic_update_slice(
                        k_all, k_row[None], (li, 0, index, 0, 0)
                    )
                    v_all = jax.lax.dynamic_update_slice(
                        v_all, v_row[None], (li, 0, index, 0, 0)
                    )
                    return (h, k_all, v_all), None

                (h, k_all, v_all), _ = jax.lax.scan(
                    layer_body, (h, k_all, v_all),
                    (lp, icv_g, jnp.arange(interval)),
                )
                return (h, k_all, v_all), None

            kvs = xattn_kv  # already grouped (G, ...) by the bind
            (h, k_all, v_all), _ = jax.lax.scan(
                group_body, (h, k_all, v_all),
                (params["xattn"], glayers, gicv, kvs, jnp.arange(n_groups)),
            )
            h = LY.rms_norm(params["final_norm"], h, t.norm_eps)
            lg = logits_from_hidden(t, params, h)
            nxt = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)[:, None]
            return (nxt, k_all, v_all, cache_pos, cache_valid, index + 1), nxt

        carry = (tok, k0, v0, cache_pos0, cache_valid0, index0)
        _, toks = jax.lax.scan(step, carry, jnp.arange(STEPS))
        return toks[:, :, 0].T

    if mode == "bind":
        # where do the ~77ms of bind+prefill go at the bench shape?
        mask_np = jnp.ones((BS, PROMPT), jnp.int32)
        pos_np = jnp.arange(PROMPT, dtype=jnp.int32)[None].repeat(BS, 0)
        ids_j = jnp.asarray(ids)

        # IMPORTANT: reduce outputs to scalars inside jit — fetching a full
        # K/V leaf to host through the axon tunnel (~50MB/s) dominates the
        # timing otherwise (a 16MB readback measured as "1.8s of compute")
        f_vis = jax.jit(lambda p, px: jnp.sum(encode_images(cfg, p, px)))
        f_lat = jax.jit(lambda p, px: encode_images(cfg, p, px))
        f_kv = jax.jit(
            lambda p, lat: sum(
                jnp.sum(x) for x in jax.tree.leaves(
                    precompute_xattn_kv(cfg, p, lat)
                )
            )
        )
        f_kv_full = jax.jit(lambda p, lat: precompute_xattn_kv(cfg, p, lat))

        @jax.jit
        def f_prefill(p, prompt_ids, lat, xkv, oh):
            cache = init_kv_cache(t, BS, max_len)
            _, cache = idefics_forward(
                cfg, p, prompt_ids, mask_np, lat, oh, icv_scaled=icv,
                cache=cache, positions=pos_np, xattn_kv=xkv,
                last_logit_only=True,
            )
            return cache["index"]

        pv = valid[:, None, :].astype(jnp.float32)
        oh = (
            image_attention_onehot(ids_j, cfg.image_token_id, 2, 1) * pv
        )
        dt_v = timeit(f_vis, (params, pixels))
        lat = f_lat(params, pixels)
        dt_k = timeit(f_kv, (params, lat))
        xkv = f_kv_full(params, lat)
        dt_p = timeit(f_prefill, (params, ids_j, lat, xkv, oh))
        print(
            f"bind breakdown (bs={BS}): vision+perceiver {dt_v*1e3:.1f}ms, "
            f"xattn-KV precompute {dt_k*1e3:.1f}ms, "
            f"64-token prefill {dt_p*1e3:.1f}ms",
            flush=True,
        )
        return

    if mode in ("flat", "both"):
        args_a = (params, cache0, tok0, latents, onehot, xattn_kv, icv)
        a = np.asarray(flat(*args_a))
        print("flat tokens[0,:8]:", a[0, :8].tolist(), "sum:", int(a.sum()),
              flush=True)
        dt_a = timeit(flat, args_a)
        print(f"flat  : {dt_a*1e3/STEPS:6.2f} ms/step "
              f"({BS*STEPS/dt_a:.1f} tok/s)", flush=True)
    if mode in ("carry", "both"):
        args_b = (params, cache0, tok0, latents, xmask4, gate, xattn_kv, icv,
                  glayers, gicv)
        b = np.asarray(carry_cache(*args_b))
        print("carry tokens[0,:8]:", b[0, :8].tolist(), "sum:", int(b.sum()),
              flush=True)
        dt_b = timeit(carry_cache, args_b)
        print(f"carry : {dt_b*1e3/STEPS:6.2f} ms/step "
              f"({BS*STEPS/dt_b:.1f} tok/s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
