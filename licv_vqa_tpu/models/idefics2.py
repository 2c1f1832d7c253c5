"""Idefics2-8B-base: Mistral backbone + SigLIP tower + perceiver connector,
image features spliced INLINE into the token stream.

Replaces the reference's ``Idefics2Interface`` (reference: utils.py:68-78).
The ICV injection site is the decoder MLP SUBLAYER output — the semantics of
the reference's ``layer_format: "model.model.text_model.layers.<L>.mlp"``
(reference: config/lmm/idefics2-8B-base.yaml:8) — handled by the decoder's
``injection_site=MLP_OUTPUT``.

Architecture mirrors HF ``Idefics2ForConditionalGeneration``: SigLIP ViT
(post-LN, biased patch conv, tanh-gelu), connector = SwiGLU modality
projection (vision→text width) + RMSNorm GQA perceiver (3 layers, 64
latents), Mistral decoder (GQA 8 kv heads).  Each ``<image>`` placeholder run
of 64 tokens is replaced by that image's 64 latents via a static-shape
cumsum gather (HF uses ``masked_scatter``).  Fixed square resolution — the
NaViT variable-resolution path always sees a full patch mask here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import layers as L
from .config import DecoderConfig, MLP_OUTPUT, VisionConfig
from .decoder import (
    _positions_from_mask,
    causal_lm_forward,
    forward_hidden,
    init_decoder_params,
    init_kv_cache,
    logits_from_hidden,
)
from .vision import init_vision_params, vision_forward

IMAGE_SEQ_LEN = 64


@dataclasses.dataclass(frozen=True)
class Idefics2PerceiverCfg:
    n_latents: int = 64
    n_layers: int = 3
    n_heads: int = 16
    n_kv_heads: int = 4
    head_dim: int = 96
    d_model: int = 4096
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16


@dataclasses.dataclass(frozen=True)
class Idefics2Config:
    text: DecoderConfig
    vision: VisionConfig
    perceiver: Idefics2PerceiverCfg
    image_token_id: int = 32001
    image_seq_len: int = IMAGE_SEQ_LEN

    @classmethod
    def idefics2_8b(cls, dtype=jnp.bfloat16) -> "Idefics2Config":
        """Idefics2-8B-base shapes (reference: config/lmm/idefics2-8B-base.yaml
        — 32 layers, hidden 4096; SigLIP-SO400M tower, Mistral-7B text)."""
        return cls(
            text=DecoderConfig(
                vocab_size=32003,
                d_model=4096,
                n_layers=32,
                n_heads=32,
                n_kv_heads=8,
                d_ff=14336,
                norm_eps=1e-5,
                injection_site=MLP_OUTPUT,
                dtype=dtype,
            ),
            vision=VisionConfig(
                # 980 = the POSITION-TABLE reference size (70×70 buckets);
                # actual inputs are variable-resolution (longest edge ≤ 980,
                # shortest ≥ 378 — HF Idefics2ImageProcessor defaults)
                image_size=980,
                patch_size=14,
                d_model=1152,
                n_layers=27,
                n_heads=16,
                d_ff=4304,
                use_class_token=False,
                use_pre_norm=False,
                use_post_norm=True,
                patch_bias=True,
                activation="gelu_tanh",
                dtype=dtype,
            ),
            perceiver=Idefics2PerceiverCfg(dtype=dtype),
        )

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "Idefics2Config":
        return cls(
            text=DecoderConfig(
                vocab_size=120,
                d_model=64,
                n_layers=4,
                n_heads=4,
                n_kv_heads=2,
                d_ff=128,
                norm_eps=1e-5,
                injection_site=MLP_OUTPUT,
                dtype=dtype,
            ),
            vision=VisionConfig(
                image_size=28,
                patch_size=14,
                d_model=32,
                n_layers=2,
                n_heads=2,
                d_ff=64,
                use_class_token=False,
                use_pre_norm=False,
                use_post_norm=True,
                patch_bias=True,
                activation="gelu_tanh",
                dtype=dtype,
            ),
            perceiver=Idefics2PerceiverCfg(
                n_latents=4,
                n_layers=2,
                n_heads=2,
                n_kv_heads=1,
                head_dim=16,
                d_model=64,
                dtype=dtype,
            ),
            image_token_id=118,
            image_seq_len=4,
        )


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_idefics2_params(key, cfg: Idefics2Config) -> dict:
    t, p, v = cfg.text, cfg.perceiver, cfg.vision
    ks = jax.random.split(key, 12)
    n, d, hd = p.n_layers, p.d_model, p.head_dim

    def w(k, shape, dtype=t.dtype):
        return L.dense_init(k, shape, dtype)

    perceiver = {
        "latents": jnp.ones((p.n_latents, d), t.dtype),
        "layers": {
            "lat_norm": jnp.ones((n, d), t.dtype),
            "ctx_norm": jnp.ones((n, d), t.dtype),
            "wq": w(ks[0], (n, d, p.n_heads * hd)),
            "wk": w(ks[1], (n, d, p.n_kv_heads * hd)),
            "wv": w(ks[2], (n, d, p.n_kv_heads * hd)),
            "wo": w(ks[3], (n, p.n_heads * hd, d)),
            "post_norm": jnp.ones((n, d), t.dtype),
            "mlp": {
                "w_gate": w(ks[4], (n, d, 4 * d)),
                "w_up": w(ks[5], (n, d, 4 * d)),
                "w_down": w(ks[6], (n, 4 * d, d)),
            },
        },
        "final_norm": jnp.ones((d,), t.dtype),
    }
    connector = {
        "w_gate": w(ks[7], (v.d_model, t.d_ff)),
        "w_up": w(ks[8], (v.d_model, t.d_ff)),
        "w_down": w(ks[9], (t.d_ff, t.d_model)),
    }
    params = init_decoder_params(ks[10], t)
    vision = init_vision_params(ks[11], v)
    vision["patch_bias"] = jnp.zeros((v.d_model,), v.dtype)
    return {
        **params,
        "vision": vision,
        "connector": connector,
        "perceiver": perceiver,
    }


# ---------------------------------------------------------------------------
# Connector forward
# ---------------------------------------------------------------------------


def _perceiver_layer(
    cfg: Idefics2PerceiverCfg, p, latents, context, kv_mask=None, a8: bool = False
):
    from ..ops.int8_matmul import qdot
    from .decoder import W8A8_MIN_TOKENS

    b, nl, d = latents.shape
    nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    a8_lat = a8 and nl >= W8A8_MIN_TOKENS  # static token gates (w8a8)
    a8_kv = a8 and nl + context.shape[1] >= W8A8_MIN_TOKENS
    lat = L.rms_norm(p["lat_norm"], latents, cfg.norm_eps)
    ctx = L.rms_norm(p["ctx_norm"], context, cfg.norm_eps)
    kv_in = jnp.concatenate([ctx, lat], axis=1)
    q = qdot(lat, p["wq"], a8=a8_lat).reshape(b, nl, nh, hd)
    k = qdot(kv_in, p["wk"], a8=a8_kv).reshape(b, -1, nkv, hd)
    v = qdot(kv_in, p["wv"], a8=a8_kv).reshape(b, -1, nkv, hd)
    k = L.repeat_kv(k, nh // nkv)
    v = L.repeat_kv(v, nh // nkv)
    attn = L.dot_product_attention(q, k, v, mask=kv_mask)
    latents = latents + qdot(
        attn.reshape(b, nl, nh * hd), p["wo"], a8=a8_lat
    ).astype(latents.dtype)
    x = L.rms_norm(p["post_norm"], latents, cfg.norm_eps)
    return latents + L.swiglu_mlp(p["mlp"], x, a8=a8_lat)


def patch_mask_from_pixel_mask(pixel_mask: jax.Array, patch: int) -> jax.Array:
    """(B*, H, W) pixel validity → (B*, gh, gw) patch validity: a patch is
    valid iff ALL its pixels are (HF Idefics2Model.get_image_features)."""
    b = pixel_mask.shape[0]
    gh, gw = pixel_mask.shape[1] // patch, pixel_mask.shape[2] // patch
    sub = pixel_mask.reshape(b, gh, patch, gw, patch).astype(jnp.int32)
    return sub.sum(axis=(2, 4)) == patch * patch


def encode_images2(
    cfg: Idefics2Config,
    params: dict,
    pixel_values: jax.Array,
    pixel_attention_mask: Optional[jax.Array] = None,  # (B, N_img, H, W)
):
    """(B, N_img, H, W, 3) → per-image latents (B, N_img, image_seq_len, D).

    NaViT variable resolution: images are aspect-preserving-resized and
    batch-padded on the host; ``pixel_attention_mask`` marks real pixels.
    Padded patches are masked out of the ViT self-attention AND the
    perceiver's context keys (HF Idefics2 semantics)."""
    b, n_img = pixel_values.shape[:2]
    flat = pixel_values.reshape((b * n_img,) + pixel_values.shape[2:])
    patch_mask = None
    if pixel_attention_mask is not None:
        pm = pixel_attention_mask.reshape(
            (b * n_img,) + pixel_attention_mask.shape[2:]
        )
        patch_mask = patch_mask_from_pixel_mask(pm, cfg.vision.patch_size)
    from .decoder import W8A8_MIN_TOKENS

    # tower stays weight-only under w8a8: per-row activation-quantize costs
    # more than the int8 MXU saves at ViT shapes (see idefics.encode_images)
    a8 = cfg.text.w8a8_prefill
    feats = vision_forward(
        cfg.vision, params["vision"], flat, patch_mask=patch_mask, a8=False
    )
    feats = L.swiglu_mlp(  # modality projection
        params["connector"],
        feats,
        a8=a8 and feats.shape[1] >= W8A8_MIN_TOKENS,
    )
    pcfg = cfg.perceiver
    latents = jnp.broadcast_to(
        params["perceiver"]["latents"][None],
        (feats.shape[0], pcfg.n_latents, pcfg.d_model),
    ).astype(feats.dtype)
    kv_mask = None
    if patch_mask is not None:
        ctx_valid = patch_mask.reshape(b * n_img, -1)
        lat_valid = jnp.ones((b * n_img, pcfg.n_latents), bool)
        kv_mask = jnp.concatenate([ctx_valid, lat_valid], axis=1)[:, None, None, :]

    def body(latents, p):
        return _perceiver_layer(pcfg, p, latents, feats, kv_mask=kv_mask, a8=a8), None

    latents, _ = jax.lax.scan(body, latents, params["perceiver"]["layers"])
    latents = L.rms_norm(params["perceiver"]["final_norm"], latents, pcfg.norm_eps)
    return latents.reshape(b, n_img, pcfg.n_latents, pcfg.d_model)


def merge_image_embeds(
    input_ids: jax.Array,  # (B, S)
    inputs_embeds: jax.Array,  # (B, S, D)
    image_latents: jax.Array,  # (B, N_img, image_seq_len, D)
    image_token_id: int,
) -> jax.Array:
    """Replace the k-th ``<image>`` token with the k-th flattened latent —
    static-shape equivalent of HF's ``masked_scatter``."""
    b, s, d = inputs_embeds.shape
    flat = image_latents.reshape(b, -1, d)
    is_img = input_ids == image_token_id
    k = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
    k = jnp.clip(k, 0, flat.shape[1] - 1)
    gathered = jnp.take_along_axis(flat, k[:, :, None], axis=1)
    return jnp.where(is_img[:, :, None], gathered.astype(inputs_embeds.dtype), inputs_embeds)


# ---------------------------------------------------------------------------
# Full forward + bundle closures
# ---------------------------------------------------------------------------


def idefics2_forward(
    cfg: Idefics2Config,
    params: dict,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    image_latents: Optional[jax.Array],  # None for pure decode steps
    icv_scaled: Optional[jax.Array] = None,
    cache: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
    remat: bool = False,
    prefill_flash: Optional[jax.Array] = None,
    last_logit_only: bool = False,  # decode prefill: skip S-1 lm_head cols
    ring_spec=None,
    return_hidden: bool = False,  # post-norm hidden instead of logits (the
    # teacher path gathers the answer window BEFORE the (D,V) head)
):
    embeds = params["embed"][input_ids].astype(cfg.text.dtype)
    if image_latents is not None:
        embeds = merge_image_embeds(
            input_ids, embeds, image_latents, cfg.image_token_id
        )
    h, new_cache = forward_hidden(
        cfg.text,
        params,
        embeds,
        attention_mask,
        icv_scaled=icv_scaled,
        cache=cache,
        positions=positions,
        remat=remat,
        prefill_flash=prefill_flash,
        ring_spec=ring_spec,
    )
    if last_logit_only:
        h = h[:, -1:, :]  # left-padded decode prompts: last pos is live
    if return_hidden:
        return h, new_cache
    return logits_from_hidden(cfg.text, params, h), new_cache


def make_idefics2_forward_fns(cfg: Idefics2Config, eos_token_id: int, params=None):
    del eos_token_id  # no EOS-dependent image masking for inline tokens
    del params  # weights are explicit args (see idefics.make_idefics_forward_fns)

    def train_forward(
        model_params, inputs, icv_scaled, ring_spec=None, return_hidden=False
    ):
        latents = encode_images2(
            cfg,
            model_params,
            inputs["pixel_values"],
            pixel_attention_mask=inputs.get("pixel_attention_mask"),
        )
        latents = latents * inputs["pixel_valid"][:, :, None, None].astype(
            latents.dtype
        )
        logits, _ = idefics2_forward(
            cfg,
            model_params,
            inputs["input_ids"],
            inputs["attention_mask"],
            latents,
            icv_scaled=icv_scaled,
            remat=True,
            ring_spec=ring_spec,
            return_hidden=return_hidden,
        )
        return logits

    def bind_images(
        model_params,
        pixel_values,
        pixel_valid,
        prompt_ids,
        icv_scaled,
        max_len,
        pixel_attention_mask=None,
    ):
        del prompt_ids
        latents = encode_images2(
            cfg, model_params, pixel_values, pixel_attention_mask=pixel_attention_mask
        )
        latents = latents * pixel_valid[:, :, None, None].astype(latents.dtype)

        def forward_fn(input_ids, attention_mask, positions, cache):
            b = input_ids.shape[0]
            prefill_flash = None
            prefill = cache is None
            if prefill:
                cache = init_kv_cache(cfg.text, b, max_len)
                lat = latents
                prefill_flash = attention_mask
            else:
                lat = None  # image tokens only occur in the prompt
            return idefics2_forward(
                cfg,
                model_params,
                input_ids,
                attention_mask,
                lat,
                icv_scaled=icv_scaled,
                cache=cache,
                positions=positions,
                prefill_flash=prefill_flash,
                last_logit_only=prefill,
            )

        return forward_fn

    return train_forward, bind_images


# no per-slot media: image latents merge into the prompt embeds at prefill
# and never feed decode steps (infer/serving.py scatters nothing)
SERVING_MEDIA_AXES: dict = {}


def make_idefics2_merged_admit_fn(cfg: Idefics2Config, eos_token_id: int):
    """ONE program = one pool decode step + one admission-group prefill with
    every decoder projection packed over both token streams — idefics2's
    form of the chunked-prefill merged step (see
    ``idefics.make_idefics_merged_admit_fn`` for the rationale and
    ``decoder.merged_decoder_layer`` for the packing).  Simpler than the
    gated-xattn families: image latents merge into the prefill lane's
    embeddings (``merge_image_embeds``) and decode steps carry no media, so
    the ONLY per-lane work is attention (pool cache vs fresh prefill cache).

    Contract (``ServingEngine._build_merged_admit`` / eval_chain)::

        merged_step(params, dec_tok (B1,1), dec_adv (B1,1), dec_pos (B1,1),
                    cache, media={}, icv_scaled,
                    pixels, pv, ids, mask, cache_len)
          -> (dec_logits (B1,1,V), new_cache,
              pre_last_logits (B2,V) f32, pre_cache, pre_media={},
              pre_next_pos)
    """
    del eos_token_id  # inline image tokens need no EOS packing
    t = cfg.text
    from .decoder import (
        _norm,
        apply_kv_rows,
        decode_cache_view,
        merged_decoder_layer,
    )

    def merged_step(
        params, dec_tok, dec_adv, dec_pos, cache, media, icv_scaled,
        pixels, pv, ids, mask, cache_len, pixel_attention_mask=None,
    ):
        del media  # idefics2 decode carries no media state
        b2, s2 = ids.shape

        # ---- prefill-lane embeds: vision tower + latent merge ----
        latents = encode_images2(
            cfg, params, pixels, pixel_attention_mask=pixel_attention_mask
        )
        latents = latents * pv[:, :, None, None].astype(latents.dtype)
        h_p = merge_image_embeds(
            ids, params["embed"][ids].astype(t.dtype), latents,
            cfg.image_token_id,
        )
        pos_p = _positions_from_mask(mask)
        cache_p = init_kv_cache(t, b2, cache_len)

        # ---- per-lane attention views / rope ----
        index_d = cache["index"]
        mask_d, cache_pos_d, cache_valid_d = decode_cache_view(
            cache, dec_pos, dec_adv, 1
        )
        index_p = cache_p["index"]
        mask_p, cache_pos_p, cache_valid_p = decode_cache_view(
            cache_p, pos_p, mask, s2
        )
        rope_d = L.rope_cos_sin(dec_pos, t.head_dim, t.rope_theta)
        rope_p = L.rope_cos_sin(pos_p, t.head_dim, t.rope_theta)

        h_d = params["embed"][dec_tok].astype(t.dtype)

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
            p_l, icv_row, kv_d_l, kv_p_l = xs
            icv_arg = icv_row if have_icv else None
            h_d, h_p, nk_d, nk_p = merged_decoder_layer(
                t, p_l, h_d, h_p, rope_d, rope_p,
                mask_d, (kv_d_l[0], kv_d_l[1], index_d),
                mask_p, (kv_p_l[0], kv_p_l[1], index_p),
                mask,  # prefill_flash: prefill into an empty cache
                icv_arg, icv_arg,
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

        # final norm per lane, ONE packed lm_head read for both lanes
        h_d = _norm(t, params["final_norm"], params.get("final_norm_b"), h_d)
        h_pl = _norm(
            t, params["final_norm"], params.get("final_norm_b"),
            h_p[:, -1:, :],
        )
        b1 = dec_tok.shape[0]
        logits = logits_from_hidden(
            t, params, jnp.concatenate([h_d, h_pl], axis=0)
        )
        return (
            logits[:b1], new_cache,
            logits[b1:, -1, :].astype(jnp.float32), new_cache_p, {},
            pos_p[:, -1] + 1,
        )

    return merged_step


def make_idefics2_serving_fns(cfg: Idefics2Config, eos_token_id: int):
    """Slot-oriented (prefill, decode_step) for the continuous-batching
    engine (``infer/serving.py``); see ``make_idefics_serving_fns`` for the
    contract.  Idefics2 merges image latents into the prompt embeddings, so
    decode steps carry NO media state (``media == {}``).  NaViT variable
    resolution rides the optional ``pixel_attention_mask`` kwarg (the engine
    passes it per admission group; mixed resolutions split into
    shape-homogeneous groups)."""
    del eos_token_id  # image binding needs no EOS packing here

    def prefill(
        params, pixel_values, pixel_valid, input_ids, attention_mask,
        icv_scaled, cache_len, pixel_attention_mask=None,
    ):
        latents = encode_images2(
            cfg, params, pixel_values,
            pixel_attention_mask=pixel_attention_mask,
        )
        latents = latents * pixel_valid[:, :, None, None].astype(latents.dtype)
        positions = _positions_from_mask(attention_mask)
        cache = init_kv_cache(cfg.text, input_ids.shape[0], cache_len)
        logits, cache = idefics2_forward(
            cfg,
            params,
            input_ids,
            attention_mask,
            latents,
            icv_scaled=icv_scaled,
            cache=cache,
            positions=positions,
            prefill_flash=attention_mask,
            last_logit_only=True,
        )
        return (
            logits[:, -1, :].astype(jnp.float32),
            cache,
            {},
            positions[:, -1] + 1,
        )

    def decode_step(
        params, token_ids, attention_mask, positions, cache, icv_scaled, media
    ):
        del media
        return idefics2_forward(
            cfg,
            params,
            token_ids,
            attention_mask,
            None,
            icv_scaled=icv_scaled,
            cache=cache,
            positions=positions,
        )

    return prefill, decode_step, SERVING_MEDIA_AXES
