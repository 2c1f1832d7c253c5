"""Idefics-9B: LLaMA backbone + CLIP ViT-H tower + perceiver + gated
cross-attention, with the ICV injected natively in the decoder scan.

Replaces the reference's ``IdeficsInterface`` from the external
``lmm_icl_interface`` package (reference: utils.py:40-50) and the baukit hook
layer addressing ``model.model.layers.<LAYER_NUM>`` (reference:
config/lmm/idefics-9B.yaml:7) — the injection site is the decoder-block
output inside the scan body.

Architecture mirrors HF ``IdeficsForVisionText2Text`` so converted
checkpoints are numerically comparable:

- gated cross-attn fires BEFORE decoder layer ``i`` when
  ``i % cross_layer_interval == 0``; layers are scanned in GROUPS of
  ``interval`` so cross-attn params are not padded across all layers;
- each text token cross-attends ONLY to the most recent preceding image
  (one-hot mask computed from ``<image>`` token positions), output gated by
  ``tanh(alpha)`` and zeroed for tokens with no preceding image;
- optional per-head-dim RMSNorm on q/k (``qk_layer_norms``) — in the gated
  CROSS-attention only: HF's decoder self-attention never receives the flag,
  and the real Idefics-9B checkpoint carries no self-attn q/k norms
  (verified at full scale by tools/fullscale_convert_check.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.icv_inject import icv_inject_reference
from . import layers as L
from .config import BLOCK_OUTPUT, DecoderConfig, PerceiverConfig, VisionConfig
from .decoder import (
    _positions_from_mask,
    decoder_layer,
    init_kv_cache,
    init_layer_params,
    logits_from_hidden,
)
from .perceiver import init_perceiver_params, perceiver_forward
from .vision import init_vision_params, vision_forward


@dataclasses.dataclass(frozen=True)
class IdeficsConfig:
    text: DecoderConfig
    vision: VisionConfig
    perceiver: PerceiverConfig
    cross_layer_interval: int = 4
    qk_layer_norms: bool = False
    qk_layer_norms_perceiver: bool = False
    alpha_type: str = "float"  # "float" | "vector"
    additional_vocab_size: int = 2
    image_token_id: int = 32001  # <image> in the extended vocab
    use_resampler: bool = True
    # train-forward rematerialization structure (see idefics_forward),
    # measured on v5e by tools/bench_train_step_tpu.py:
    #   "both"   — nested checkpoint on the group body AND the layer body
    #              (residual per GROUP; cheapest memory).  The DEFAULT: the
    #              only mode that fits the flagship 32L s_tea=2048 bs=4
    #              int8 step on one chip (13s AOT compile, 1.60s/step; the
    #              r2 "28-minute compile" does not reproduce via
    #              jit(...).lower().compile() — tiny-shape compiles are
    #              2-13s in every mode);
    #   "inner"  — checkpoint per layer only (OOMs at the flagship shape);
    #   "outer"  — checkpoint per group only;
    #   "policy" — per-layer checkpoint, dots-with-no-batch-dims saved
    #              (fastest backward, highest memory; OOMs at flagship).
    remat_mode: str = "both"

    @classmethod
    def idefics_9b(cls, dtype=jnp.bfloat16) -> "IdeficsConfig":
        """Idefics-9B shapes (reference: config/lmm/idefics-9B.yaml — 32
        layers, hidden 4096; vision = OpenCLIP ViT-H/14)."""
        return cls(
            text=DecoderConfig(
                vocab_size=32002,
                d_model=4096,
                n_layers=32,
                n_heads=32,
                n_kv_heads=32,
                d_ff=11008,
                injection_site=BLOCK_OUTPUT,
                dtype=dtype,
            ),
            vision=VisionConfig(
                image_size=224,
                patch_size=14,
                d_model=1280,
                n_layers=32,
                n_heads=16,
                d_ff=5120,
                dtype=dtype,
            ),
            perceiver=PerceiverConfig(
                n_latents=64,
                n_layers=6,
                n_heads=16,
                head_dim=96,
                d_model=1280,
                d_ff=5120,
                dtype=dtype,
            ),
            cross_layer_interval=4,
            qk_layer_norms=True,
            qk_layer_norms_perceiver=True,
            additional_vocab_size=2,
            image_token_id=32001,
        )

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "IdeficsConfig":
        """Tiny-random config for tests (the reference's debug idiom,
        reference: config/train.yaml:15)."""
        return cls(
            text=DecoderConfig(
                vocab_size=110,
                d_model=64,
                n_layers=4,
                n_heads=4,
                n_kv_heads=4,
                d_ff=128,
                dtype=dtype,
            ),
            vision=VisionConfig(
                image_size=28,
                patch_size=14,
                d_model=32,
                n_layers=2,
                n_heads=2,
                d_ff=64,
                dtype=dtype,
            ),
            perceiver=PerceiverConfig(
                n_latents=4,
                n_layers=2,
                n_heads=2,
                head_dim=16,
                d_model=32,
                d_ff=64,
                dtype=dtype,
            ),
            cross_layer_interval=2,
            qk_layer_norms=True,
            qk_layer_norms_perceiver=True,
            additional_vocab_size=2,
            image_token_id=108,
        )


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_xattn_params(key, cfg: IdeficsConfig, n_xattn: int) -> dict:
    t = cfg.text
    d, de = t.d_model, cfg.perceiver.d_model
    nh, dh = t.n_heads, t.head_dim
    f = t.d_ff
    ks = jax.random.split(key, 8)

    def w(k, shape):
        return L.dense_init(k, (n_xattn, *shape), t.dtype)

    p = {
        "ln1": jnp.ones((n_xattn, d), t.dtype),
        "ln2": jnp.ones((n_xattn, d), t.dtype),
        "attn": {
            "wq": w(ks[0], (d, nh * dh)),
            "wk": w(ks[1], (de, nh * dh)),
            "wv": w(ks[2], (de, nh * dh)),
            "wo": w(ks[3], (nh * dh, d)),
        },
        "mlp": {
            "w_gate": w(ks[4], (d, f)),
            "w_up": w(ks[5], (d, f)),
            "w_down": w(ks[6], (f, d)),
        },
        "alpha_xattn": jnp.zeros(
            (n_xattn, d) if cfg.alpha_type == "vector" else (n_xattn,), t.dtype
        ),
        "alpha_dense": jnp.zeros(
            (n_xattn, d) if cfg.alpha_type == "vector" else (n_xattn,), t.dtype
        ),
    }
    if cfg.qk_layer_norms:
        p["attn"]["q_norm"] = jnp.ones((n_xattn, dh), t.dtype)
        p["attn"]["k_norm"] = jnp.ones((n_xattn, dh), t.dtype)
    return p


def init_idefics_params(key, cfg: IdeficsConfig) -> dict:
    t = cfg.text
    ks = jax.random.split(key, 6)
    # NOTE: cfg.qk_layer_norms applies ONLY to the gated cross-attention
    # blocks (HF IdeficsDecoderLayer never passes it to its self-attention);
    # the real Idefics-9B checkpoint has no self_attn q/k layernorms —
    # verified against the full-scale meta state dict
    # (tools/fullscale_convert_check.py).
    layers = init_layer_params(ks[0], t, t.n_layers)
    n_xattn = t.n_layers // cfg.cross_layer_interval
    return {
        "embed": L.dense_init(ks[1], (t.vocab_size, t.d_model), t.dtype),
        "layers": layers,
        "xattn": init_xattn_params(ks[2], cfg, n_xattn),
        "final_norm": jnp.ones((t.d_model,), t.dtype),
        "lm_head": L.dense_init(ks[3], (t.d_model, t.vocab_size), t.dtype),
        "vision": init_vision_params(ks[4], cfg.vision),
        "perceiver": init_perceiver_params(
            ks[5], cfg.perceiver, cfg.qk_layer_norms_perceiver
        ),
    }


# ---------------------------------------------------------------------------
# Image attention plumbing
# ---------------------------------------------------------------------------


def image_attention_onehot(
    input_ids: jax.Array, image_token_id: int, eos_token_id: int, n_images: int
) -> jax.Array:
    """(B, S, N_img) one-hot: each token attends to the most recent preceding
    ``<image>`` token (HF ``image_attention_mask_for_packed_input_ids``
    semantics): tokens strictly after an EOS attend to none UNTIL the next
    ``<image>`` token resets the EOS state (``seen_eod = False`` in the HF
    loop) — so EOS-packed multi-episode sequences keep per-episode image
    attention."""
    b, s = input_ids.shape
    is_img = input_ids == image_token_id
    count = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1  # -1 before any
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    img_pos = jax.lax.cummax(jnp.where(is_img, pos, -1), axis=1)
    eos_cm = jax.lax.cummax(
        jnp.where(input_ids == eos_token_id, pos, -1), axis=1
    )
    # the EOS position itself still attends (HF checks seen_eod BEFORE
    # setting it) — compare against the most recent eos STRICTLY before t
    eos_excl = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), eos_cm[:, :-1]], axis=1
    )
    valid = img_pos > eos_excl  # also false while img_pos == -1 (no image)
    onehot = jax.nn.one_hot(jnp.maximum(count, 0), n_images, dtype=jnp.float32)
    return onehot * valid[:, :, None].astype(jnp.float32)


def last_image_onehot(
    input_ids: jax.Array, image_token_id: int, n_images: int
) -> jax.Array:
    """(B, 1, N_img) one-hot of the LAST image in the prompt — the mask every
    generated token uses during decode."""
    count = jnp.sum((input_ids == image_token_id).astype(jnp.int32), axis=1) - 1
    onehot = jax.nn.one_hot(jnp.maximum(count, 0), n_images, dtype=jnp.float32)
    return (onehot * (count >= 0)[:, None].astype(jnp.float32))[:, None, :]


def encode_images(
    cfg: IdeficsConfig, params: dict, pixel_values: jax.Array
) -> jax.Array:
    """(B, N_img, H, W, 3) → image latents (B, N_img·n_lat, De)."""
    b, n_img = pixel_values.shape[:2]
    flat = pixel_values.reshape((b * n_img,) + pixel_values.shape[2:])
    # w8a8 governs the LM-side bind matmuls but NOT the ViT tower: at the
    # tower's shapes the per-row activation-quantize (VPU, scales with
    # B·n_patches) outweighs the int8-MXU gain — measured on v5e at bs=64
    # int8+a8 286 ms vs 208 ms weight-only-class, and a wash at bs=8
    # (tools/bench_prefill_tpu.py --vision-breakdown).  Tower weights stay
    # int8 (weight-only) under lmm.quantize_vision.
    a8 = cfg.text.w8a8_prefill
    feats = vision_forward(cfg.vision, params["vision"], flat, a8=False)
    if cfg.use_resampler:
        feats = perceiver_forward(cfg.perceiver, params["perceiver"], feats, a8=a8)
    return feats.reshape(b, n_img * feats.shape[1], feats.shape[2])


# ---------------------------------------------------------------------------
# Gated cross-attention block
# ---------------------------------------------------------------------------


def gated_xattn_block(
    cfg: IdeficsConfig,
    p: dict,  # single block params
    h: jax.Array,  # (B, S, D)
    image_latents: jax.Array,  # (B, N_img*n_lat, De)
    img_mask: jax.Array,  # (B, 1, S, N_img*n_lat) bool
    gate: jax.Array,  # (B, S) 1.0 where the token attends ≥1 image
    kv: Optional[tuple] = None,  # precomputed (k, v) each (B, Nk, nh, dh)
) -> jax.Array:
    t = cfg.text
    b, s, d = h.shape
    nh, dh = t.n_heads, t.head_dim
    from ..ops.int8_matmul import qdot
    from .decoder import W8A8_MIN_TOKENS

    a8 = t.w8a8_prefill and s >= W8A8_MIN_TOKENS  # static-shape gate
    a8_img = t.w8a8_prefill and image_latents.shape[1] >= W8A8_MIN_TOKENS

    x = L.rms_norm(p["ln1"], h, t.norm_eps)
    q = qdot(x, p["attn"]["wq"], a8=a8).reshape(b, s, nh, dh)
    if "q_norm" in p["attn"]:
        q = L.rms_norm(p["attn"]["q_norm"], q, t.norm_eps)
    if kv is not None:
        # image K/V are decode-invariant: precomputed once at bind time
        # (k_norm already applied) — the per-step wk/wv matmuls vanish.
        k, v = kv
    else:
        k = qdot(image_latents, p["attn"]["wk"], a8=a8_img).reshape(b, -1, nh, dh)
        v = qdot(image_latents, p["attn"]["wv"], a8=a8_img).reshape(b, -1, nh, dh)
        if "k_norm" in p["attn"]:
            k = L.rms_norm(p["attn"]["k_norm"], k, t.norm_eps)
    attn = L.dot_product_attention(q, k, v, mask=img_mask)
    attn = qdot(attn.reshape(b, s, nh * dh), p["attn"]["wo"], a8=a8).astype(h.dtype)
    attn = attn * gate[:, :, None].astype(attn.dtype)
    h = h + jnp.tanh(p["alpha_xattn"]).astype(h.dtype) * attn

    x2 = L.rms_norm(p["ln2"], h, t.norm_eps)
    mlp = L.swiglu_mlp(p["mlp"], x2, a8=a8)
    return h + jnp.tanh(p["alpha_dense"]).astype(h.dtype) * mlp


def precompute_xattn_kv(
    cfg: IdeficsConfig, params: dict, image_latents: jax.Array
) -> tuple:
    """K/V projections of the image latents for EVERY gated-xattn block,
    (G, B, Nk, nh, dh) each, with k_norm applied.

    The image latents never change during decode, so these matmuls — which
    otherwise nearly double the per-step decode FLOPs (Nk=64 latent rows per
    image vs 1 new token) — run exactly once at bind time."""
    t = cfg.text
    b, n_k = image_latents.shape[:2]
    nh, dh = t.n_heads, t.head_dim
    from ..ops.int8_matmul import qdot
    from .decoder import W8A8_MIN_TOKENS

    a8 = t.w8a8_prefill and n_k >= W8A8_MIN_TOKENS  # bind-time, n_k = 64/img

    def one_group(attn_p):
        # qdot fuses int8 dequant into the matmul — dequantizing the whole
        # xattn stack up-front materialized GBs of transients (measured
        # 1.7s isolated on v5e for what is a ~10ms matmul)
        k = qdot(image_latents, attn_p["wk"], a8=a8).reshape(b, n_k, nh, dh)
        v = qdot(image_latents, attn_p["wv"], a8=a8).reshape(b, n_k, nh, dh)
        if "k_norm" in attn_p:
            k = L.rms_norm(attn_p["k_norm"], k, t.norm_eps)
        return k.astype(t.dtype), v.astype(t.dtype)

    return jax.vmap(one_group)(params["xattn"]["attn"])


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def idefics_forward(
    cfg: IdeficsConfig,
    params: dict,
    input_ids: jax.Array,  # (B, S)
    attention_mask: jax.Array,  # (B, S)
    image_latents: jax.Array,  # (B, N_img*n_lat, De) from encode_images
    image_attn_onehot: jax.Array,  # (B, S, N_img) incl. pixel_valid masking
    icv_scaled: Optional[jax.Array] = None,  # (L, D)
    cache: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
    remat: bool = False,
    prefill_flash: Optional[jax.Array] = None,
    xattn_kv: Optional[tuple] = None,  # precomputed (G,B,Nk,nh,dh) k/v
    last_logit_only: bool = False,  # decode prefill: skip S-1 lm_head cols
    ring_spec=None,  # parallel.ring.RingSpec: sp-shard the train forward
    return_hidden: bool = False,  # post-norm hidden instead of logits (the
    # teacher path gathers the answer window BEFORE the (D,V) head)
):
    """Returns (logits f32 (B,S,V), new_cache)."""
    t = cfg.text
    interval = cfg.cross_layer_interval
    n_groups = t.n_layers // interval
    b, s = input_ids.shape

    h = params["embed"][input_ids].astype(t.dtype)

    # self-attention mask / positions (same construction as decoder.py)
    if cache is None:
        if positions is None:
            positions = _positions_from_mask(attention_mask)
        if ring_spec is not None:
            ring = (ring_spec, positions, attention_mask.astype(bool))
            mask = None
        else:
            ring = None
            mask = L.causal_mask(
                positions, positions, attention_mask.astype(bool)
            )
        index = None
        cache_pos = cache_valid = None
    else:
        index = cache["index"]
        if positions is None:
            raise ValueError("positions required when decoding with a cache")
        from .decoder import decode_cache_view

        mask, cache_pos, cache_valid = decode_cache_view(
            cache, positions, attention_mask, s
        )

    cos, sin = L.rope_cos_sin(positions, t.head_dim, t.rope_theta)

    # cross-attention mask: expand per-image one-hot over that image's latents
    n_lat = image_latents.shape[1] // image_attn_onehot.shape[-1]
    xmask = jnp.repeat(image_attn_onehot, n_lat, axis=-1) > 0  # (B, S, N_img*n_lat)
    gate = jnp.any(xmask, axis=-1).astype(jnp.float32)  # (B, S)
    xmask = xmask[:, None, :, :]  # (B, 1, S, Nk)

    if cache is not None:
        # DECODE: one FLAT scan over layers with cond-gated cross-attention.
        # The nested group-scan costs a full extra KV-cache copy per token
        # (measured 2.3x slower); a single-level scan matches the text-only
        # decoder's bandwidth profile.
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
                g = li // interval
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
                return gated_xattn_block(
                    cfg, xp, hh, image_latents, xmask, gate, kv=kv_g
                )

            # a config with n_layers < interval has ZERO xattn groups — the
            # cond body would index an empty stack (slice of shape (0,));
            # skip xattn entirely (static: group count is a trace constant).
            # The li//interval < n_groups guard covers non-divisible depths,
            # where dynamic_index_in_dim would otherwise CLAMP and silently
            # reuse the last group's weights.
            if n_groups > 0:
                h = jax.lax.cond(
                    (li % interval == 0) & (li // interval < n_groups),
                    do_xattn,
                    lambda hh: hh,
                    h,
                )
            icv_arg = icv_row if have_icv else None
            h, new_kv = decoder_layer(
                cfg.text, p_l, h, cos, sin, mask, None, icv_arg,
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
        h = L.rms_norm(params["final_norm"], h, t.norm_eps)
        if last_logit_only:
            # prompts are LEFT-padded for decode, so the last position is the
            # real continuation point; the lm_head over all S prefill
            # positions is S× the needed work (S=64 → ~134 GFLOP saved/bind)
            h = h[:, -1:, :]
        return logits_from_hidden(t, params, h), new_cache

    # TRAIN/no-cache: grouped scan (memory-efficient with remat) — the
    # cached/decode path returned above.
    if n_groups * interval != t.n_layers:
        raise ValueError(
            f"idefics train forward needs n_layers ({t.n_layers}) divisible "
            f"by cross_layer_interval ({interval}) — the grouped remat scan "
            "stacks layers as (groups, interval, ...)"
        )

    # group-stack the per-layer leaves: (L, ...) → (G, interval, ...)
    def regroup(x):
        return x.reshape((n_groups, interval) + x.shape[1:])

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
        icv_xs = jnp.zeros((n_groups, interval, 1), t.dtype)

    mode = (cfg.remat_mode if remat else "none")

    def group_body(h, xs):
        xp, lp, icv_g = xs
        # checkpoint the xattn block whenever ANY remat is on: without it
        # the group scan's VJP saves each iteration's residuals STACKED —
        # including the dequantized int8 weight planes the backward needs
        # (a bf16 [G, d_ff, D] copy of the whole xattn MLP stack: 688 MB at
        # the flagship shape, the top allocation in the bs=4 OOM dump).
        # Rematerializing recomputes the dequant from the int8 xs instead.
        xattn_fn = lambda hh: gated_xattn_block(  # noqa: E731
            cfg, xp, hh, image_latents, xmask, gate
        )
        if mode != "none":
            xattn_fn = jax.checkpoint(xattn_fn)
        h = xattn_fn(h)

        def layer_body(h, xs_l):
            p_l, icv_row = xs_l
            icv_arg = icv_row if have_icv else None
            h, _ = decoder_layer(
                cfg.text, p_l, h, cos, sin, mask, None, icv_arg, None,
                flash_valid=attention_mask, ring=ring,
            )
            return h, None

        if mode in ("both", "inner"):
            layer_body = jax.checkpoint(layer_body)
        elif mode == "policy":
            layer_body = jax.checkpoint(
                layer_body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        h, _ = jax.lax.scan(layer_body, h, (lp, icv_g))
        return h, None

    if mode in ("both", "outer"):
        group_body = jax.checkpoint(group_body)
    h, _ = jax.lax.scan(group_body, h, (params["xattn"], glayers, icv_xs))

    h = L.rms_norm(params["final_norm"], h, t.norm_eps)
    if return_hidden:
        return h, None
    return logits_from_hidden(t, params, h), None


def make_idefics_forward_fns(cfg: IdeficsConfig, eos_token_id: int, params=None):
    """Build (train_forward, bind_images) closures.

    ``params`` is ALWAYS passed explicitly (first argument of both returned
    functions) so that jitted callers trace the weights as arguments — a
    closure would bake multi-GB weights into the program as constants.
    The optional ``params`` parameter is accepted only for b/c and ignored.
    """
    del params

    def train_forward(
        model_params, inputs, icv_scaled, ring_spec=None, return_hidden=False
    ):
        latents = encode_images(cfg, model_params, inputs["pixel_values"])
        onehot = image_attention_onehot(
            inputs["input_ids"],
            cfg.image_token_id,
            eos_token_id,
            inputs["pixel_values"].shape[1],
        )
        onehot = onehot * inputs["pixel_valid"][:, None, :].astype(jnp.float32)
        logits, _ = idefics_forward(
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
        latents = encode_images(cfg, model_params, pixel_values)
        n_img = pixel_values.shape[1]
        pv = pixel_valid[:, None, :].astype(jnp.float32)
        prefill_onehot = (
            image_attention_onehot(
                prompt_ids, cfg.image_token_id, eos_token_id, n_img
            )
            * pv
        )
        step_onehot = (
            last_image_onehot(prompt_ids, cfg.image_token_id, n_img) * pv
        )
        xattn_kv = precompute_xattn_kv(cfg, model_params, latents)

        def forward_fn(input_ids, attention_mask, positions, cache):
            b = input_ids.shape[0]
            prefill_flash = None
            prefill = cache is None
            if prefill:
                cache = init_kv_cache(cfg.text, b, max_len)
                onehot = prefill_onehot
                lat = latents
                xkv = xattn_kv
                prefill_flash = attention_mask
            else:
                # during beam decode the batch may be beam-expanded
                rep = b // latents.shape[0]
                lat = jnp.repeat(latents, rep, axis=0)
                xkv = jax.tree.map(
                    lambda x: jnp.repeat(x, rep, axis=1), xattn_kv
                )
                so = jnp.repeat(step_onehot, rep, axis=0)
                onehot = jnp.broadcast_to(
                    so, (b, input_ids.shape[1], so.shape[-1])
                )
            return idefics_forward(
                cfg,
                model_params,
                input_ids,
                attention_mask,
                lat,
                onehot,
                icv_scaled=icv_scaled,
                cache=cache,
                positions=positions,
                prefill_flash=prefill_flash,
                xattn_kv=xkv,
                last_logit_only=prefill,
            )

        return forward_fn

    return train_forward, bind_images


# per-slot media state the continuous-batching engine must persist for
# decode steps (infer/serving.py): batch axis of each key's subtree
SERVING_MEDIA_AXES = {"latents": 0, "step_onehot": 0, "xattn_kv": 1}


def make_idefics_merged_admit_fn(cfg: IdeficsConfig, eos_token_id: int):
    """ONE program = one pool decode step + one admission-group prefill,
    with every decoder-layer projection packed over both token streams
    (``decoder.merged_decoder_layer``) — the XLA-static-shape form of
    chunked prefill: admissions no longer stall the pool, and the prefill
    matmuls ride the decode step's per-layer weight stream (read ONCE from
    HBM for both lanes) instead of paying their own.

    Contract (consumed by ``ServingEngine._build_merged_admit``)::

        merged_step(params, dec_tok (B1,1), dec_adv (B1,1), dec_pos (B1,1),
                    cache, media, icv_scaled,
                    pixels, pv, ids, mask, cache_len)
          -> (dec_logits (B1,1,V), new_cache,
              pre_last_logits (B2,V) f32, pre_cache, pre_media, pre_next_pos)

    Decode-lane semantics are EXACTLY ``make_idefics_serving_fns``'s
    ``decode_step`` (same embedding/mask/rope/xattn/ICV math — row-wise
    identical in exact arithmetic; the packed matmuls carry the usual bf16
    batch-shape kernel-selection caveat already documented for the engine).
    Prefill-lane semantics are exactly the serving ``prefill``.  Gated
    xattn runs per lane (its weights are read once per lane — the lanes'
    sequence lengths differ so their xattn can't share one attention call);
    only the DECODER projections + MLP + lm_head pack."""
    t = cfg.text
    interval = cfg.cross_layer_interval
    n_groups = t.n_layers // interval
    from .decoder import (
        apply_kv_rows,
        decode_cache_view,
        merged_decoder_layer,
    )

    def merged_step(
        params, dec_tok, dec_adv, dec_pos, cache, media, icv_scaled,
        pixels, pv, ids, mask, cache_len,
    ):
        b1 = dec_tok.shape[0]
        b2, s2 = ids.shape

        # ---- prefill-lane media (vision tower + resampler + xattn KV) ----
        latents_p = encode_images(cfg, params, pixels)
        n_img = pixels.shape[1]
        pvf = pv[:, None, :].astype(jnp.float32)
        prefill_onehot = (
            image_attention_onehot(ids, cfg.image_token_id, eos_token_id, n_img)
            * pvf
        )
        step_onehot = last_image_onehot(ids, cfg.image_token_id, n_img) * pvf
        xattn_kv_p = precompute_xattn_kv(cfg, params, latents_p)
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
                g = li // interval
                pick = lambda ax: lambda x: jax.lax.dynamic_index_in_dim(
                    x, g, ax, keepdims=False
                )
                xp = jax.tree.map(pick(0), params["xattn"])
                kv_gd = jax.tree.map(pick(0), media["xattn_kv"])
                kv_gp = jax.tree.map(pick(0), xattn_kv_p)
                hd = gated_xattn_block(
                    cfg, xp, hd, media["latents"], xmask_d, gate_d, kv=kv_gd
                )
                hp = gated_xattn_block(
                    cfg, xp, hp, latents_p, xmask_p, gate_p, kv=kv_gp
                )
                return hd, hp

            if n_groups > 0:
                h_d, h_p = jax.lax.cond(
                    (li % interval == 0) & (li // interval < n_groups),
                    do_xattn,
                    lambda hh: hh,
                    (h_d, h_p),
                )
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

        # final norm per lane, ONE packed lm_head read for both lanes
        h_d = L.rms_norm(params["final_norm"], h_d, t.norm_eps)  # (B1,1,D)
        h_pl = L.rms_norm(params["final_norm"], h_p[:, -1:, :], t.norm_eps)
        logits = logits_from_hidden(
            t, params, jnp.concatenate([h_d, h_pl], axis=0)
        )  # (B1+B2, 1, V)
        dec_logits = logits[:b1]
        last_p = logits[b1:, -1, :].astype(jnp.float32)

        media_p = {
            "latents": latents_p,
            "step_onehot": step_onehot,
            "xattn_kv": xattn_kv_p,
        }
        return (
            dec_logits, new_cache, last_p, new_cache_p, media_p,
            pos_p[:, -1] + 1,
        )

    return merged_step


def make_idefics_serving_fns(cfg: IdeficsConfig, eos_token_id: int):
    """Slot-oriented (prefill, decode_step) pair for the continuous-batching
    serving engine (``infer/serving.py``).

    Unlike ``bind_images`` — which closes over one request batch's media —
    these keep the media state EXPLICIT so the engine can scatter it into
    per-slot buffers at admission and feed the whole slot batch at decode:

    - ``prefill(params, pixels, pixel_valid, input_ids, attention_mask,
      icv_scaled, cache_len) -> (last_logits, cache, media, next_pos)``
      runs image encode + bind + prefill into a FRESH cache of length
      ``cache_len`` (the prompt bucket).
    - ``decode_step(params, token_ids, attention_mask, positions, cache,
      icv_scaled, media) -> (logits, cache)`` advances one token for every
      slot; ``media`` rows belong to whatever request occupies each slot.
    """

    def prefill(
        params, pixel_values, pixel_valid, input_ids, attention_mask,
        icv_scaled, cache_len,
    ):
        latents = encode_images(cfg, params, pixel_values)
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
        logits, cache = idefics_forward(
            cfg,
            params,
            input_ids,
            attention_mask,
            latents,
            prefill_onehot,
            icv_scaled=icv_scaled,
            cache=cache,
            positions=positions,
            prefill_flash=attention_mask,
            xattn_kv=xattn_kv,
            last_logit_only=True,
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
        return idefics_forward(
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
