"""OpenFlamingo-9B: MPT-7B backbone + CLIP ViT-L/14 tower + Flamingo blocks.

Replaces the reference's ``OpenFlamingoInterface`` (reference: utils.py:51-67,
config/lmm/openflamingov2-9B.yaml: MPT language encoder, cross-attention
every 4 layers).  ICV injection site: language-block output
(``layer_format "model.lang_encoder.transformer.blocks.<L>"``).

Architecture notes:

- MPT decoder: ALiBi (translation-invariant form — equivalent to HF's
  key-position-only bias under softmax), bias-free LayerNorm, fused-QKV
  (split at conversion), 4x GELU MLP.  Parity-tested against HF
  ``MptForCausalLM``.
- Flamingo gated cross-attention fires BEFORE decoder block ``l`` when
  ``(l+1) % every == 0`` (open_flamingo convention — end of each group, vs
  Idefics' start-of-group).  Gates are scalar ``tanh(g)`` initialized 0; text
  tokens attend only the most recent preceding image's latents; FF is a
  bias-free GELU MLP.
- Perceiver resampler reuses the Idefics/Flamingo block (concat-kv latents,
  LayerNorms) at ViT-L width.

The open_flamingo package is not in this image, so the multimodal assembly is
built from the public architecture description; the MPT text path has a
numerical parity test, the flamingo-specific parts are covered by structural
and decode tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import layers as L
from .config import BLOCK_OUTPUT, DecoderConfig, PerceiverConfig, VisionConfig
from .decoder import (
    _positions_from_mask,
    decoder_layer,
    init_kv_cache,
    init_layer_params,
    logits_from_hidden,
)
from .idefics import image_attention_onehot, last_image_onehot
from .perceiver import init_perceiver_params, perceiver_forward
from .vision import init_vision_params, vision_forward


@dataclasses.dataclass(frozen=True)
class OpenFlamingoConfig:
    text: DecoderConfig
    vision: VisionConfig
    perceiver: PerceiverConfig
    cross_attn_every_n_layers: int = 4
    xattn_heads: int = 8
    xattn_head_dim: int = 64
    xattn_ff_mult: int = 4
    image_token_id: int = 50277
    media_token: str = "<image>"

    @classmethod
    def openflamingo_9b(cls, dtype=jnp.bfloat16) -> "OpenFlamingoConfig":
        """OpenFlamingo-9B (MPT-7B + ViT-L/14; reference:
        config/lmm/openflamingov2-9B.yaml — 32 layers, hidden 4096,
        cross_attn_every_n_layers=4)."""
        return cls(
            text=DecoderConfig(
                vocab_size=50432,
                d_model=4096,
                n_layers=32,
                n_heads=32,
                n_kv_heads=32,
                d_ff=16384,
                norm_eps=1e-5,
                positional="alibi",
                norm_type="layernorm",
                activation="gelu",
                tie_embeddings=True,
                injection_site=BLOCK_OUTPUT,
                dtype=dtype,
            ),
            vision=VisionConfig(
                image_size=224,
                patch_size=14,
                d_model=1024,
                n_layers=24,
                n_heads=16,
                d_ff=4096,
                use_class_token=True,
                use_pre_norm=True,
                use_post_norm=True,
                dtype=dtype,
            ),
            perceiver=PerceiverConfig(
                n_latents=64,
                n_layers=6,
                n_heads=8,
                head_dim=64,
                d_model=1024,
                d_ff=4096,
                activation="gelu",  # open_flamingo FeedForward
                dtype=dtype,
            ),
        )

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "OpenFlamingoConfig":
        return cls(
            text=DecoderConfig(
                vocab_size=130,
                d_model=64,
                n_layers=4,
                n_heads=4,
                n_kv_heads=4,
                d_ff=256,
                norm_eps=1e-5,
                positional="alibi",
                norm_type="layernorm",
                activation="gelu",
                tie_embeddings=True,
                dtype=dtype,
            ),
            vision=VisionConfig(
                image_size=28,
                patch_size=14,
                d_model=32,
                n_layers=2,
                n_heads=2,
                d_ff=64,
                use_post_norm=True,
                dtype=dtype,
            ),
            perceiver=PerceiverConfig(
                n_latents=4,
                n_layers=2,
                n_heads=2,
                head_dim=16,
                d_model=32,
                d_ff=64,
                activation="gelu",
                dtype=dtype,
            ),
            cross_attn_every_n_layers=2,
            xattn_heads=2,
            xattn_head_dim=16,
            image_token_id=125,
        )


def init_flamingo_xattn_params(key, cfg: OpenFlamingoConfig, n_xattn: int) -> dict:
    t = cfg.text
    d, de = t.d_model, cfg.perceiver.d_model
    nh, dh = cfg.xattn_heads, cfg.xattn_head_dim
    f = cfg.xattn_ff_mult * d
    ks = jax.random.split(key, 6)

    def w(k, shape):
        return L.dense_init(k, (n_xattn, *shape), t.dtype)

    return {
        "ln_attn": {
            "w": jnp.ones((n_xattn, d), t.dtype),
            "b": jnp.zeros((n_xattn, d), t.dtype),
        },
        "wq": w(ks[0], (d, nh * dh)),
        "wkv": w(ks[1], (de, 2 * nh * dh)),
        "wo": w(ks[2], (nh * dh, d)),
        "attn_gate": jnp.zeros((n_xattn,), t.dtype),
        "ln_ff": {
            "w": jnp.ones((n_xattn, d), t.dtype),
            "b": jnp.zeros((n_xattn, d), t.dtype),
        },
        "ff_up": w(ks[3], (d, f)),
        "ff_down": w(ks[4], (f, d)),
        "ff_gate": jnp.zeros((n_xattn,), t.dtype),
    }


def init_openflamingo_params(key, cfg: OpenFlamingoConfig) -> dict:
    t = cfg.text
    ks = jax.random.split(key, 6)
    n_xattn = t.n_layers // cfg.cross_attn_every_n_layers
    return {
        "embed": L.dense_init(ks[0], (t.vocab_size, t.d_model), t.dtype),
        "layers": init_layer_params(ks[1], t, t.n_layers),
        "xattn": init_flamingo_xattn_params(ks[2], cfg, n_xattn),
        "final_norm": jnp.ones((t.d_model,), t.dtype),
        "final_norm_b": jnp.zeros((t.d_model,), t.dtype),
        "vision": init_vision_params(ks[3], cfg.vision),
        "perceiver": init_perceiver_params(ks[4], cfg.perceiver, qk_layer_norms=False),
    }


def encode_media(cfg: OpenFlamingoConfig, params: dict, pixel_values: jax.Array):
    """(B, N_img, H, W, 3) → latents (B, N_img·n_lat, De).  ViT tokens are
    post-layernormed with the class token dropped (open_clip token output)."""
    b, n_img = pixel_values.shape[:2]
    flat = pixel_values.reshape((b * n_img,) + pixel_values.shape[2:])
    # tower stays weight-only under w8a8: per-row activation-quantize costs
    # more than the int8 MXU saves at ViT shapes (see idefics.encode_images)
    a8 = cfg.text.w8a8_prefill
    feats = vision_forward(cfg.vision, params["vision"], flat, a8=False)
    feats = feats[:, 1:, :]  # drop class token
    latents = perceiver_forward(cfg.perceiver, params["perceiver"], feats, a8=a8)
    return latents.reshape(b, n_img * latents.shape[1], latents.shape[2])


def flamingo_xattn_block(
    cfg: OpenFlamingoConfig,
    p: dict,
    h: jax.Array,
    media: jax.Array,  # (B, Nk, De)
    media_mask: jax.Array,  # (B, 1, S, Nk) bool
    gate: jax.Array,  # (B, S)
    kv_pre: Optional[tuple] = None,  # precomputed (k, v) each (B, Nk, nh, dh)
):
    b, s, d = h.shape
    nh, dh = cfg.xattn_heads, cfg.xattn_head_dim
    from ..ops.int8_matmul import qdot
    from .decoder import W8A8_MIN_TOKENS

    a8 = cfg.text.w8a8_prefill and s >= W8A8_MIN_TOKENS  # static-shape gate
    a8_med = cfg.text.w8a8_prefill and media.shape[1] >= W8A8_MIN_TOKENS

    x = L.layer_norm(p["ln_attn"]["w"], p["ln_attn"]["b"], h, cfg.text.norm_eps)
    q = qdot(x, p["wq"], a8=a8).reshape(b, s, nh, dh)
    if kv_pre is not None:
        # media K/V are decode-invariant: precomputed once at bind time
        k, v = kv_pre
    else:
        kv = qdot(media, p["wkv"], a8=a8_med).reshape(b, -1, 2, nh, dh)
        k, v = kv[:, :, 0], kv[:, :, 1]
    attn = L.dot_product_attention(q, k, v, mask=media_mask)
    attn = qdot(attn.reshape(b, s, nh * dh), p["wo"], a8=a8).astype(h.dtype)
    attn = attn * gate[:, :, None].astype(attn.dtype)
    h = h + jnp.tanh(p["attn_gate"]).astype(h.dtype) * attn

    x2 = L.layer_norm(p["ln_ff"]["w"], p["ln_ff"]["b"], h, cfg.text.norm_eps)
    # open_flamingo FeedForward uses nn.GELU() — exact erf, not tanh-approx
    z = jax.nn.gelu(
        qdot(x2, p["ff_up"], preferred_element_type=jnp.float32, a8=a8).astype(
            jnp.float32
        ),
        approximate=False,
    ).astype(h.dtype)
    ff = qdot(z, p["ff_down"], a8=a8).astype(h.dtype)
    return h + jnp.tanh(p["ff_gate"]).astype(h.dtype) * ff


def precompute_xattn_kv(
    cfg: OpenFlamingoConfig, params: dict, media_latents: jax.Array
) -> tuple:
    """K/V of the media latents for every gated-xattn block, (G,B,Nk,nh,dh)
    each — decode-invariant, computed once at bind time (see idefics.py)."""
    t = cfg.text
    b, n_k = media_latents.shape[:2]
    nh, dh = cfg.xattn_heads, cfg.xattn_head_dim
    from ..ops.int8_matmul import qdot
    from .decoder import W8A8_MIN_TOKENS

    a8 = t.w8a8_prefill and n_k >= W8A8_MIN_TOKENS  # bind-time latents

    def one_group(w):
        # qdot fuses int8 dequant into the matmul (see idefics.py — whole-
        # stack dequant up-front materialized GBs of transients)
        kv = qdot(media_latents, w, a8=a8).reshape(b, n_k, 2, nh, dh)
        return kv[:, :, 0].astype(t.dtype), kv[:, :, 1].astype(t.dtype)

    return jax.vmap(one_group)(params["xattn"]["wkv"])


def openflamingo_forward(
    cfg: OpenFlamingoConfig,
    params: dict,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    media_latents: jax.Array,
    media_onehot: jax.Array,  # (B, S, N_img)
    icv_scaled: Optional[jax.Array] = None,
    cache: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
    remat: bool = False,
    xattn_kv: Optional[tuple] = None,  # precomputed (G,B,Nk,nh,dh) k/v
    last_logit_only: bool = False,  # decode prefill: skip S-1 lm_head cols
    ring_spec=None,  # parallel.ring.RingSpec: sp-shard the train forward
    prefill_flash: Optional[jax.Array] = None,  # mask: empty-cache prefill
    return_hidden: bool = False,  # post-norm hidden instead of logits (the
    # teacher path gathers the answer window BEFORE the tied (D,V) head)
):
    t = cfg.text
    every = cfg.cross_attn_every_n_layers
    n_groups = t.n_layers // every
    b, s = input_ids.shape
    h = params["embed"][input_ids].astype(t.dtype)
    ring = None

    if cache is None:
        if positions is None:
            positions = _positions_from_mask(attention_mask)
        if ring_spec is not None:
            ring = (ring_spec, positions, attention_mask.astype(bool))
            mask = None
        else:
            mask = L.causal_mask(
                positions, positions, attention_mask.astype(bool)
            )
        index = None
        cache_pos = cache_valid = None
        k_pos = positions
    else:
        index = cache["index"]
        from .decoder import decode_cache_view

        mask, cache_pos, cache_valid = decode_cache_view(
            cache, positions, attention_mask, s
        )
        k_pos = cache_pos
    # with the ring, ALiBi is applied per block inside the kernel
    bias = None if ring is not None else L.alibi_bias(t.n_heads, positions, k_pos)

    n_lat = media_latents.shape[1] // media_onehot.shape[-1]
    xmask = jnp.repeat(media_onehot, n_lat, axis=-1) > 0
    gate = jnp.any(xmask, axis=-1).astype(jnp.float32)
    xmask = xmask[:, None, :, :]

    if cache is not None:
        # DECODE: flat layer scan with cond-gated xattn (see idefics.py — the
        # nested group-scan copies the full KV cache per token)
        have_icv = icv_scaled is not None
        icv_xs = (
            jax.tree.map(
                lambda x: x.astype(t.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                icv_scaled,
            )
            if have_icv
            else jnp.zeros((t.n_layers, 1), t.dtype)
        )

        def flat_body(h, xs):
            p_l, icv_row, kv_l, li = xs

            def do_xattn(hh):
                g = li // every
                xp = jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, g, 0, keepdims=False),
                    params["xattn"],
                )
                kv_g = (
                    jax.tree.map(
                        lambda x: jax.lax.dynamic_index_in_dim(
                            x, g, 0, keepdims=False
                        ),
                        xattn_kv,
                    )
                    if xattn_kv is not None
                    else None
                )
                return flamingo_xattn_block(
                    cfg, xp, hh, media_latents, xmask, gate, kv_pre=kv_g
                )

            # flamingo: xattn BEFORE the block that closes each group.
            # n_layers < every has ZERO groups: cond traces BOTH branches,
            # so do_xattn would index an empty stack — skip statically.
            # (Unlike idefics, the every-1 phase means g = li//every never
            # exceeds n_groups-1 for any depth, so no clamp guard needed.)
            if n_groups > 0:
                h = jax.lax.cond(
                    li % every == every - 1, do_xattn, lambda hh: hh, h
                )
            icv_arg = icv_row if have_icv else None
            h, new_kv = decoder_layer(
                t, p_l, h, None, None, mask, bias, icv_arg,
                (kv_l[0], kv_l[1], index),
                flash_valid=prefill_flash,
            )
            return h, new_kv

        h, kv_out = jax.lax.scan(
            flat_body,
            h,
            (
                params["layers"],
                icv_xs,
                (cache["k"], cache["v"]),
                jnp.arange(t.n_layers),
            ),
        )
        # kv_out stacks each layer's NEW rows; one bulk write (see
        # decoder.apply_kv_rows — avoids re-materializing the full cache)
        from .decoder import apply_kv_rows

        new_cache = dict(
            apply_kv_rows(cache, kv_out[0], kv_out[1]),
            pos=cache_pos,
            valid=cache_valid,
            index=index + s,
        )
        h = L.layer_norm(params["final_norm"], params["final_norm_b"], h, t.norm_eps)
        if last_logit_only:
            h = h[:, -1:, :]  # left-padded decode prompts: last pos is live
        logits = jnp.dot(h, params["embed"].T, preferred_element_type=jnp.float32)
        return logits, new_cache

    # TRAIN/no-cache grouped scan — the cached/decode path returned above.
    if n_groups * every != t.n_layers:
        raise ValueError(
            f"openflamingo train forward needs n_layers ({t.n_layers}) "
            f"divisible by cross_attn_every_n_layers ({every})"
        )

    def regroup(x):
        return x.reshape((n_groups, every) + x.shape[1:])

    glayers = jax.tree.map(regroup, params["layers"])
    have_icv = icv_scaled is not None
    if have_icv:
        icv_cast = jax.tree.map(
            lambda x: x.astype(t.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            icv_scaled,
        )
        icv_xs = jax.tree.map(regroup, icv_cast)
    else:
        icv_xs = jnp.zeros((n_groups, every, 1), t.dtype)

    def one_layer(h, xs_l):
        p_l, icv_row = xs_l
        icv_arg = icv_row if have_icv else None
        h, _ = decoder_layer(
            t, p_l, h, None, None, mask, bias, icv_arg, None,
            flash_valid=attention_mask, ring=ring,
        )
        return h, None

    def group_body(h, xs):
        xp, lp, icv_g = xs
        first = jax.tree.map(lambda x: x[: every - 1], (lp, icv_g))
        last = jax.tree.map(lambda x: x[every - 1], (lp, icv_g))

        inner = jax.checkpoint(one_layer) if remat else one_layer
        h, _ = jax.lax.scan(inner, h, first)
        # flamingo runs gated cross-attention BEFORE the block closing a group
        # (checkpointed under remat: the group scan's VJP otherwise saves
        # each iteration's DEQUANTIZED xattn weight planes stacked — see
        # idefics.py group_body)
        xattn_fn = lambda hh: flamingo_xattn_block(  # noqa: E731
            cfg, xp, hh, media_latents, xmask, gate
        )
        if remat:
            xattn_fn = jax.checkpoint(xattn_fn)
        h = xattn_fn(h)
        h, _ = one_layer(h, last)
        return h, None

    if remat:
        group_body = jax.checkpoint(group_body)
    h, _ = jax.lax.scan(group_body, h, (params["xattn"], glayers, icv_xs))

    h = L.layer_norm(params["final_norm"], params["final_norm_b"], h, t.norm_eps)
    if return_hidden:
        return h, None
    # MPT ties the LM head to the embedding table
    logits = jnp.dot(h, params["embed"].T, preferred_element_type=jnp.float32)
    return logits, None


def make_openflamingo_forward_fns(
    cfg: OpenFlamingoConfig, eos_token_id: int, params=None
):
    del params  # weights are explicit args (see idefics.make_idefics_forward_fns)

    def train_forward(
        model_params, inputs, icv_scaled, ring_spec=None, return_hidden=False
    ):
        latents = encode_media(cfg, model_params, inputs["pixel_values"])
        onehot = image_attention_onehot(
            inputs["input_ids"],
            cfg.image_token_id,
            eos_token_id,
            inputs["pixel_values"].shape[1],
        ) * inputs["pixel_valid"][:, None, :].astype(jnp.float32)
        logits, _ = openflamingo_forward(
            cfg,
            model_params,
            inputs["input_ids"],
            inputs["attention_mask"],
            latents,
            onehot,
            icv_scaled=icv_scaled,
            remat=True,
            ring_spec=ring_spec,
            return_hidden=return_hidden,
        )
        return logits

    def bind_images(
        model_params, pixel_values, pixel_valid, prompt_ids, icv_scaled, max_len
    ):
        latents = encode_media(cfg, model_params, pixel_values)
        n_img = pixel_values.shape[1]
        pv = pixel_valid[:, None, :].astype(jnp.float32)
        prefill_onehot = (
            image_attention_onehot(prompt_ids, cfg.image_token_id, eos_token_id, n_img)
            * pv
        )
        step_onehot = last_image_onehot(prompt_ids, cfg.image_token_id, n_img) * pv
        xattn_kv = precompute_xattn_kv(cfg, model_params, latents)

        def forward_fn(input_ids, attention_mask, positions, cache):
            b = input_ids.shape[0]
            prefill = cache is None
            if prefill:
                cache = init_kv_cache(cfg.text, b, max_len)
                onehot, lat, xkv = prefill_onehot, latents, xattn_kv
            else:
                rep = b // latents.shape[0]
                lat = jnp.repeat(latents, rep, axis=0)
                xkv = jax.tree.map(lambda x: jnp.repeat(x, rep, axis=1), xattn_kv)
                so = jnp.repeat(step_onehot, rep, axis=0)
                onehot = jnp.broadcast_to(so, (b, input_ids.shape[1], so.shape[-1]))
            return openflamingo_forward(
                cfg,
                model_params,
                input_ids,
                attention_mask,
                lat,
                onehot,
                icv_scaled=icv_scaled,
                cache=cache,
                positions=positions,
                xattn_kv=xkv,
                last_logit_only=prefill,
                prefill_flash=attention_mask if prefill else None,
            )

        return forward_fn

    return train_forward, bind_images


# per-slot media for the continuous-batching engine (infer/serving.py):
# batch axis of each key's subtree (xattn k/v are (G, B, Nk, h, dh))
SERVING_MEDIA_AXES = {"latents": 0, "step_onehot": 0, "xattn_kv": 1}


def make_openflamingo_merged_admit_fn(
    cfg: OpenFlamingoConfig, eos_token_id: int
):
    """ONE program = one pool decode step + one admission-group prefill for
    the MPT/ALiBi family (see ``idefics.make_idefics_merged_admit_fn`` for
    the chunked-prefill rationale).  Decoder projections + MLP + the tied
    lm_head pack over both token streams (``decoder.merged_decoder_layer``
    with per-lane ALiBi biases — no rope); the gated xattn runs per lane
    BEFORE each group-closing layer (``li % every == every-1``, flamingo's
    phase — openflamingo_forward's decode scan).

    Contract: identical to ``idefics.make_idefics_merged_admit_fn``."""
    t = cfg.text
    every = cfg.cross_attn_every_n_layers
    n_groups = t.n_layers // every
    from .decoder import (
        _norm,
        apply_kv_rows,
        decode_cache_view,
        merged_decoder_layer,
    )

    def merged_step(
        params, dec_tok, dec_adv, dec_pos, cache, media, icv_scaled,
        pixels, pv_in, ids, mask, cache_len,
    ):
        b1 = dec_tok.shape[0]
        b2, s2 = ids.shape

        # ---- prefill-lane media (ViT-L + perceiver + xattn KV) ----
        latents_p = encode_media(cfg, params, pixels)
        n_img = pixels.shape[1]
        pvf = pv_in[:, None, :].astype(jnp.float32)
        prefill_onehot = (
            image_attention_onehot(ids, cfg.image_token_id, eos_token_id, n_img)
            * pvf
        )
        step_onehot = last_image_onehot(ids, cfg.image_token_id, n_img) * pvf
        xattn_kv_p = precompute_xattn_kv(cfg, params, latents_p)
        pos_p = _positions_from_mask(mask)
        cache_p = init_kv_cache(t, b2, cache_len)

        # ---- per-lane attention views / ALiBi ----
        index_d = cache["index"]
        mask_d, cache_pos_d, cache_valid_d = decode_cache_view(
            cache, dec_pos, dec_adv, 1
        )
        index_p = cache_p["index"]
        mask_p, cache_pos_p, cache_valid_p = decode_cache_view(
            cache_p, pos_p, mask, s2
        )
        bias_d = L.alibi_bias(t.n_heads, dec_pos, cache_pos_d)
        bias_p = L.alibi_bias(t.n_heads, pos_p, cache_pos_p)

        # ---- per-lane xattn masks (decode: step onehot; prefill: full) ----
        onehot_d = jnp.broadcast_to(
            media["step_onehot"], (b1, 1, media["step_onehot"].shape[-1])
        )
        n_lat_d = media["latents"].shape[1] // onehot_d.shape[-1]
        xmask_d = jnp.repeat(onehot_d, n_lat_d, axis=-1) > 0
        gate_d = jnp.any(xmask_d, axis=-1).astype(jnp.float32)
        xmask_d = xmask_d[:, None, :, :]
        n_lat_p = latents_p.shape[1] // prefill_onehot.shape[-1]
        xmask_p = jnp.repeat(prefill_onehot, n_lat_p, axis=-1) > 0
        gate_p = jnp.any(xmask_p, axis=-1).astype(jnp.float32)
        xmask_p = xmask_p[:, None, :, :]

        h_d = params["embed"][dec_tok].astype(t.dtype)
        h_p = params["embed"][ids].astype(t.dtype)

        have_icv = icv_scaled is not None
        icv_xs = (
            jax.tree.map(
                lambda x: x.astype(t.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                icv_scaled,
            )
            if have_icv
            else jnp.zeros((t.n_layers, 1), t.dtype)
        )

        def body(carry, xs):
            h_d, h_p = carry
            p_l, icv_row, kv_d_l, kv_p_l, li = xs

            def do_xattn(hh):
                hd, hp = hh
                g = li // every
                pick = lambda ax: lambda x: jax.lax.dynamic_index_in_dim(  # noqa: E731
                    x, g, ax, keepdims=False
                )
                xp = jax.tree.map(pick(0), params["xattn"])
                kv_gd = jax.tree.map(pick(0), media["xattn_kv"])
                kv_gp = jax.tree.map(pick(0), xattn_kv_p)
                hd = flamingo_xattn_block(
                    cfg, xp, hd, media["latents"], xmask_d, gate_d,
                    kv_pre=kv_gd,
                )
                hp = flamingo_xattn_block(
                    cfg, xp, hp, latents_p, xmask_p, gate_p, kv_pre=kv_gp
                )
                return hd, hp

            if n_groups > 0:
                h_d, h_p = jax.lax.cond(
                    li % every == every - 1, do_xattn, lambda hh: hh,
                    (h_d, h_p),
                )
            icv_arg = icv_row if have_icv else None
            h_d, h_p, nk_d, nk_p = merged_decoder_layer(
                t, p_l, h_d, h_p, None, None,
                mask_d, (kv_d_l[0], kv_d_l[1], index_d),
                mask_p, (kv_p_l[0], kv_p_l[1], index_p),
                mask,  # prefill_flash: prefill into an empty cache
                icv_arg, icv_arg,
                bias_d=bias_d, bias_p=bias_p,
            )
            return (h_d, h_p), (nk_d, nk_p)

        (h_d, h_p), (kv_d_out, kv_p_out) = jax.lax.scan(
            body,
            (h_d, h_p),
            (
                params["layers"],
                icv_xs,
                (cache["k"], cache["v"]),
                (cache_p["k"], cache_p["v"]),
                jnp.arange(t.n_layers),
            ),
        )
        new_cache = dict(
            apply_kv_rows(cache, kv_d_out[0], kv_d_out[1]),
            pos=cache_pos_d, valid=cache_valid_d, index=index_d + 1,
        )
        new_cache_p = dict(
            apply_kv_rows(cache_p, kv_p_out[0], kv_p_out[1]),
            pos=cache_pos_p, valid=cache_valid_p, index=index_p + s2,
        )

        # final norm per lane, ONE packed tied-embedding head read
        h_d = _norm(t, params["final_norm"], params.get("final_norm_b"), h_d)
        h_pl = _norm(
            t, params["final_norm"], params.get("final_norm_b"),
            h_p[:, -1:, :],
        )
        logits = logits_from_hidden(
            t, params, jnp.concatenate([h_d, h_pl], axis=0)
        )
        media_p = {
            "latents": latents_p,
            "step_onehot": step_onehot,
            "xattn_kv": xattn_kv_p,
        }
        return (
            logits[:b1], new_cache,
            logits[b1:, -1, :].astype(jnp.float32), new_cache_p, media_p,
            pos_p[:, -1] + 1,
        )

    return merged_step


def make_openflamingo_serving_fns(cfg: OpenFlamingoConfig, eos_token_id: int):
    """Slot-oriented (prefill, decode_step) for the continuous-batching
    engine (``infer/serving.py``); see ``make_idefics_serving_fns`` for the
    contract.  Every decode step cross-attends the slot's media latents, so
    the engine persists ``{latents, step_onehot, xattn_kv}`` per slot."""

    def prefill(
        params, pixel_values, pixel_valid, input_ids, attention_mask,
        icv_scaled, cache_len,
    ):
        latents = encode_media(cfg, params, pixel_values)
        n_img = pixel_values.shape[1]
        pv = pixel_valid[:, None, :].astype(jnp.float32)
        prefill_onehot = (
            image_attention_onehot(
                input_ids, cfg.image_token_id, eos_token_id, n_img
            )
            * pv
        )
        step_onehot = (
            last_image_onehot(input_ids, cfg.image_token_id, n_img) * pv
        )
        xattn_kv = precompute_xattn_kv(cfg, params, latents)
        positions = _positions_from_mask(attention_mask)
        cache = init_kv_cache(cfg.text, input_ids.shape[0], cache_len)
        logits, cache = openflamingo_forward(
            cfg,
            params,
            input_ids,
            attention_mask,
            latents,
            prefill_onehot,
            icv_scaled=icv_scaled,
            cache=cache,
            positions=positions,
            xattn_kv=xattn_kv,
            last_logit_only=True,
            prefill_flash=attention_mask,
        )
        media = {
            "latents": latents,
            "step_onehot": step_onehot,
            "xattn_kv": xattn_kv,
        }
        return (
            logits[:, -1, :].astype(jnp.float32),
            cache,
            media,
            positions[:, -1] + 1,
        )

    def decode_step(
        params, token_ids, attention_mask, positions, cache, icv_scaled, media
    ):
        b, s = token_ids.shape
        onehot = jnp.broadcast_to(
            media["step_onehot"], (b, s, media["step_onehot"].shape[-1])
        )
        return openflamingo_forward(
            cfg,
            params,
            token_ids,
            attention_mask,
            media["latents"],
            onehot,
            icv_scaled=icv_scaled,
            cache=cache,
            positions=positions,
            xattn_kv=media["xattn_kv"],
        )

    return prefill, decode_step, SERVING_MEDIA_AXES
