"""Perceiver resampler (Flamingo-style): N image patches → 64 latents.

Matches HF ``IdeficsPerceiverResampler``: learned latents, per-block
cross-attention where keys/values are the CONCAT of context and latents,
optional per-head-dim LayerNorm on q/k, LN→fc→ReLU→proj MLP, final LayerNorm.
Blocks are scan-stacked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import PerceiverConfig
from . import layers as L


def init_perceiver_params(key, cfg: PerceiverConfig, qk_layer_norms: bool) -> dict:
    d, hd, nh, f, n = cfg.d_model, cfg.head_dim, cfg.n_heads, cfg.d_ff, cfg.n_layers
    ks = jax.random.split(key, 8)

    def w(k, shape):
        return L.dense_init(k, shape, cfg.dtype)

    blocks = {
        "ctx_ln": {"w": jnp.ones((n, d), cfg.dtype), "b": jnp.zeros((n, d), cfg.dtype)},
        "lat_ln": {"w": jnp.ones((n, d), cfg.dtype), "b": jnp.zeros((n, d), cfg.dtype)},
        "wq": w(ks[0], (n, d, nh * hd)),
        "wk": w(ks[1], (n, d, nh * hd)),
        "wv": w(ks[2], (n, d, nh * hd)),
        "wo": w(ks[3], (n, nh * hd, d)),
        "mlp_ln": {"w": jnp.ones((n, d), cfg.dtype), "b": jnp.zeros((n, d), cfg.dtype)},
        "fc": w(ks[4], (n, d, f)),
        "c_proj": w(ks[5], (n, f, d)),
    }
    if qk_layer_norms:
        blocks["q_ln"] = {
            "w": jnp.ones((n, hd), cfg.dtype),
            "b": jnp.zeros((n, hd), cfg.dtype),
        }
        blocks["k_ln"] = {
            "w": jnp.ones((n, hd), cfg.dtype),
            "b": jnp.zeros((n, hd), cfg.dtype),
        }
    return {
        "latents": w(ks[6], (cfg.n_latents, d)),
        "blocks": blocks,
        "final_ln": {"w": jnp.ones((d,), cfg.dtype), "b": jnp.zeros((d,), cfg.dtype)},
    }


def perceiver_forward(
    cfg: PerceiverConfig, params: dict, context: jax.Array, a8: bool = False
) -> jax.Array:
    """context: (B, N_patches, D) → (B, n_latents, D)."""
    from ..ops.int8_matmul import qdot
    from .decoder import W8A8_MIN_TOKENS

    b = context.shape[0]
    nh, hd = cfg.n_heads, cfg.head_dim
    latents = jnp.broadcast_to(
        params["latents"][None], (b, cfg.n_latents, context.shape[-1])
    ).astype(context.dtype)
    # static token gates (w8a8 on int8-quantized blocks): latent-side rows
    # are n_latents (64 at full scale), kv-side adds the patch context
    a8_lat = a8 and cfg.n_latents >= W8A8_MIN_TOKENS
    a8_kv = a8 and cfg.n_latents + context.shape[1] >= W8A8_MIN_TOKENS

    def block(latents, p):
        ctx = L.layer_norm(p["ctx_ln"]["w"], p["ctx_ln"]["b"], context, cfg.norm_eps)
        lat = L.layer_norm(p["lat_ln"]["w"], p["lat_ln"]["b"], latents, cfg.norm_eps)
        kv_in = jnp.concatenate([ctx, lat], axis=1)
        nl, nk = lat.shape[1], kv_in.shape[1]
        q = qdot(lat, p["wq"], a8=a8_lat).reshape(b, nl, nh, hd)
        k = qdot(kv_in, p["wk"], a8=a8_kv).reshape(b, nk, nh, hd)
        v = qdot(kv_in, p["wv"], a8=a8_kv).reshape(b, nk, nh, hd)
        if "q_ln" in p:
            q = L.layer_norm(p["q_ln"]["w"], p["q_ln"]["b"], q, cfg.norm_eps)
            k = L.layer_norm(p["k_ln"]["w"], p["k_ln"]["b"], k, cfg.norm_eps)
        attn = L.dot_product_attention(q, k, v)
        latents = latents + qdot(
            attn.reshape(b, nl, nh * hd), p["wo"], a8=a8_lat
        ).astype(latents.dtype)
        x = L.layer_norm(p["mlp_ln"]["w"], p["mlp_ln"]["b"], latents, cfg.norm_eps)
        x = qdot(x, p["fc"], a8=a8_lat)
        if cfg.activation == "gelu":  # open_flamingo FeedForward (exact erf)
            x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(
                latents.dtype
            )
        else:  # HF IdeficsPerceiverResampler MLP
            x = jax.nn.relu(x)
        latents = latents + qdot(x, p["c_proj"], a8=a8_lat).astype(latents.dtype)
        return latents, None

    latents, _ = jax.lax.scan(block, latents, params["blocks"])
    return L.layer_norm(
        params["final_ln"]["w"], params["final_ln"]["b"], latents, cfg.norm_eps
    )
