"""CLIP-style ViT vision tower (Idefics-9B's OpenCLIP ViT-H/14).

Patchify is a reshape + one big matmul (stride==kernel convolution is exactly
that), which lands on the MXU directly.  Pre-LN encoder, biased projections,
GELU MLP — matching HF ``IdeficsVisionTransformer`` so converted weights are
bit-comparable.  Returns ``last_hidden_state`` (NO post-layernorm), which is
what the perceiver consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import VisionConfig
from . import layers as L


def init_vision_params(key, cfg: VisionConfig) -> dict:
    d, f, p = cfg.d_model, cfg.d_ff, cfg.patch_size
    ks = jax.random.split(key, 10)
    n = cfg.n_layers

    def w(k, shape):
        return L.dense_init(k, shape, cfg.dtype)

    params = {
        "patch_embed": w(ks[0], (p * p * 3, d)),
        "pos_embed": w(ks[1], (cfg.n_patches, d)),
        # post_ln exists in both CLIP and SigLIP checkpoints; pre_ln is
        # CLIP-only (SigLIP state dicts have none — full-scale check)
        "post_ln": {"w": jnp.ones((d,), cfg.dtype), "b": jnp.zeros((d,), cfg.dtype)},
        "layers": {
            "ln1": {
                "w": jnp.ones((n, d), cfg.dtype),
                "b": jnp.zeros((n, d), cfg.dtype),
            },
            "ln2": {
                "w": jnp.ones((n, d), cfg.dtype),
                "b": jnp.zeros((n, d), cfg.dtype),
            },
            "attn": {
                "wq": w(ks[2], (n, d, d)),
                "bq": jnp.zeros((n, d), cfg.dtype),
                "wk": w(ks[3], (n, d, d)),
                "bk": jnp.zeros((n, d), cfg.dtype),
                "wv": w(ks[4], (n, d, d)),
                "bv": jnp.zeros((n, d), cfg.dtype),
                "wo": w(ks[5], (n, d, d)),
                "bo": jnp.zeros((n, d), cfg.dtype),
            },
            "mlp": {
                "w1": w(ks[6], (n, d, f)),
                "b1": jnp.zeros((n, f), cfg.dtype),
                "w2": w(ks[7], (n, f, d)),
                "b2": jnp.zeros((n, d), cfg.dtype),
            },
        },
    }
    if cfg.use_pre_norm:
        params["pre_ln"] = {
            "w": jnp.ones((d,), cfg.dtype),
            "b": jnp.zeros((d,), cfg.dtype),
        }
    if cfg.use_class_token:
        params["class_embed"] = w(ks[8], (d,))
    return params


def patchify(pixels: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) → (B, N, P·P·3) in (p_h, p_w, channel) order — matches a
    stride-P conv with kernel layout (kh, kw, C, D)."""
    b, h, w, c = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, P, P, C)
    return x.reshape(b, gh * gw, patch * patch * c)


def _vit_layer(
    cfg: VisionConfig, p: dict, h: jax.Array, mask=None, valid=None,
    a8: bool = False,
) -> jax.Array:
    from ..ops.int8_matmul import qdot

    b, s, d = h.shape
    nh, dh = cfg.n_heads, d // cfg.n_heads
    x = L.layer_norm(p["ln1"]["w"], p["ln1"]["b"], h, cfg.norm_eps)
    a = p["attn"]
    q = (qdot(x, a["wq"], a8=a8) + a["bq"]).reshape(b, s, nh, dh)
    k = (qdot(x, a["wk"], a8=a8) + a["bk"]).reshape(b, s, nh, dh)
    v = (qdot(x, a["wv"], a8=a8) + a["bv"]).reshape(b, s, nh, dh)
    if L.flash_bidir_usable(s):
        # Pallas flash for LONG vision sequences only (SigLIP-NaViT 4900
        # patches): avoids XLA's (B, H, S, S) f32 score materialization
        # (~1.5 GB/image at s=4900).  At ViT-H's s=257 XLA wins (see
        # flash_bidir_usable).  ``valid`` covers the NaViT patch mask
        # (invalid outputs are consumed by nothing: the perceiver kv_mask
        # drops them).
        attn = L.flash_attention_bidir_tpu(q, k, v, valid=valid)
    else:
        from ..ops.vit_attention import vit_attention_tpu, vit_attention_usable

        if vit_attention_usable(s, dh):
            # fused whole-score-in-VMEM Pallas kernel — OPT-IN only
            # (LICV_VIT_FUSED_ATTN=1): measured ~3% slower than XLA's
            # in-tower fused attention at ViT-H shapes on v5e (see
            # vit_attention_usable).  ``mask`` here is always the
            # key-validity form (== valid)
            attn = vit_attention_tpu(q, k, v, valid)
        else:
            attn = L.dot_product_attention(q, k, v, mask=mask)
    h = h + (
        qdot(attn.reshape(b, s, d), a["wo"], a8=a8) + a["bo"]
    ).astype(h.dtype)

    x2 = L.layer_norm(p["ln2"]["w"], p["ln2"]["b"], h, cfg.norm_eps)
    m = p["mlp"]
    z = (qdot(x2, m["w1"], a8=a8) + m["b1"]).astype(jnp.float32)
    if cfg.activation == "quick_gelu":  # OpenAI CLIP: x·σ(1.702x)
        z = z * jax.nn.sigmoid(1.702 * z)
    else:
        z = jax.nn.gelu(z, approximate=cfg.activation == "gelu_tanh")
    z = z.astype(h.dtype)
    h = h + (qdot(z, m["w2"], a8=a8) + m["b2"]).astype(h.dtype)
    return h


def navit_position_ids(
    grid_h: int, grid_w: int, table_side: int, patch_mask: jax.Array
) -> jax.Array:
    """NaViT bucketized position ids (HF Idefics2VisionEmbeddings semantics,
    arXiv 2307.06304): each image occupies the top-left ``nb_h × nb_w``
    rectangle of the padded grid; its patches map to a fixed
    ``table_side²``-entry position table by bucketizing fractional
    coordinates.  ``patch_mask``: (B, gh, gw) bool.  Returns (B, gh·gw) int32
    (invalid patches → 0, they are attention-masked anyway)."""
    nb_h = jnp.sum(patch_mask[:, :, 0].astype(jnp.int32), axis=1)  # (B,)
    nb_w = jnp.sum(patch_mask[:, 0, :].astype(jnp.int32), axis=1)
    eps = 1.0 - 1e-6
    frac_h = (
        jnp.arange(grid_h, dtype=jnp.float32)[None, :]
        / jnp.maximum(nb_h, 1)[:, None].astype(jnp.float32)
        * eps
    )
    frac_w = (
        jnp.arange(grid_w, dtype=jnp.float32)[None, :]
        / jnp.maximum(nb_w, 1)[:, None].astype(jnp.float32)
        * eps
    )
    # torch.bucketize(v, arange(1/S, 1, 1/S), right=True) == floor(v·S)
    bh = jnp.clip(jnp.floor(frac_h * table_side).astype(jnp.int32), 0, table_side - 1)
    bw = jnp.clip(jnp.floor(frac_w * table_side).astype(jnp.int32), 0, table_side - 1)
    pos = (bh[:, :, None] * table_side + bw[:, None, :]).reshape(
        patch_mask.shape[0], -1
    )
    return jnp.where(patch_mask.reshape(patch_mask.shape[0], -1), pos, 0)


def vision_forward(
    cfg: VisionConfig,
    params: dict,
    pixels: jax.Array,
    patch_mask: jax.Array = None,  # (B, gh, gw) bool — NaViT variable res
    a8: bool = False,  # int8-MXU path for int8-quantized layers (w8a8)
) -> jax.Array:
    """(B, H, W, 3) float → last_hidden_state (B, N, D).

    SigLIP-family towers (no class token) use NaViT bucketized position ids,
    so the input H×W may differ from ``cfg.image_size`` (the position-table
    reference size, e.g. 980 for Idefics2 — reference: utils.py:68-78 wraps
    the HF processor that emits variable-resolution grids).  ``patch_mask``
    marks valid patches of batch-padded images; invalid patches are masked
    out of attention."""
    b, hh, ww, _ = pixels.shape
    x = patchify(pixels.astype(cfg.dtype), cfg.patch_size)
    h = jnp.dot(x, params["patch_embed"])
    if "patch_bias" in params:
        h = h + params["patch_bias"]
    if cfg.use_class_token:
        cls = jnp.broadcast_to(
            params["class_embed"][None, None, :], (h.shape[0], 1, h.shape[-1])
        )
        h = jnp.concatenate([cls, h], axis=1)
        h = h + params["pos_embed"][None, : h.shape[1], :]
        attn_mask = None
        valid = None
    else:
        gh, gw = hh // cfg.patch_size, ww // cfg.patch_size
        table_side = cfg.image_size // cfg.patch_size
        if patch_mask is None:
            patch_mask = jnp.ones((b, gh, gw), bool)
        pos_ids = navit_position_ids(gh, gw, table_side, patch_mask)
        h = h + params["pos_embed"][pos_ids]
        flat = patch_mask.reshape(b, -1)
        attn_mask = flat[:, None, None, :]  # mask keys of padded patches
        valid = flat
    if cfg.use_pre_norm:
        h = L.layer_norm(params["pre_ln"]["w"], params["pre_ln"]["b"], h, cfg.norm_eps)

    from .decoder import W8A8_MIN_TOKENS

    a8 = a8 and h.shape[1] >= W8A8_MIN_TOKENS  # static token gate

    def body(h, p):
        return _vit_layer(cfg, p, h, mask=attn_mask, valid=valid, a8=a8), None

    h, _ = jax.lax.scan(body, h, params["layers"])
    if cfg.use_post_norm:
        h = L.layer_norm(
            params["post_ln"]["w"], params["post_ln"]["b"], h, cfg.norm_eps
        )
    return h
