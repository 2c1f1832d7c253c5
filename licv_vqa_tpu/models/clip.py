"""CLIP dual encoder (ViT-B/32 class) in JAX — RICE's retrieval featurizer.

The reference encodes RICE features with transformers' torch CLIP on the
host (reference: icv_src/utils/mm_topk_retriver.py:26,82-106); here both
towers run on the TPU so the whole retrieval pipeline (encode → matmul →
``lax.top_k``) is on-device (SURVEY.md §2.4).

The vision tower reuses ``models.vision`` (CLIP layout: class token,
pre-layernorm, biased projections) with the OpenAI ``quick_gelu`` MLP; the
text tower is the same pre-LN encoder run with a causal+padding mask, final
layernorm, EOT pooling (HF pools at ``input_ids.argmax(-1)`` — the EOT token
has the highest id in the CLIP vocab), then the learned projections to the
shared embedding space.  ``convert_hf_clip`` maps a transformers
``CLIPModel`` state dict; parity is tested against tiny-random HF CLIP.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .config import VisionConfig
from . import layers as L
from .vision import _vit_layer, init_vision_params, vision_forward


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    max_positions: int = 77
    d_model: int = 512
    n_layers: int = 12
    n_heads: int = 8
    d_ff: int = 2048
    norm_eps: float = 1e-5
    activation: str = "quick_gelu"
    # HF pooling contract (modeling_clip.py): eos_token_id == 2 (the OpenAI
    # checkpoints' legacy value) pools at argmax(input_ids) — EOT is the
    # highest id; any other value pools at the FIRST position equal to it.
    eos_token_id: int = 2
    dtype: jnp.dtype = jnp.float32


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    vision: VisionConfig = dataclasses.field(
        default_factory=lambda: VisionConfig(
            image_size=224,
            patch_size=32,
            d_model=768,
            n_layers=12,
            n_heads=12,
            d_ff=3072,
            activation="quick_gelu",
            dtype=jnp.float32,
        )
    )
    text: ClipTextConfig = dataclasses.field(default_factory=ClipTextConfig)
    projection_dim: int = 512

    @classmethod
    def vit_b32(cls) -> "ClipConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ClipConfig":
        return cls(
            vision=VisionConfig(
                image_size=32,
                patch_size=8,
                d_model=32,
                n_layers=2,
                n_heads=4,
                d_ff=64,
                activation="quick_gelu",
                dtype=jnp.float32,
            ),
            text=ClipTextConfig(
                vocab_size=128, max_positions=16, d_model=24, n_layers=2,
                n_heads=4, d_ff=48,
            ),
            projection_dim=16,
        )


def init_clip_params(key, cfg: ClipConfig) -> dict:
    kv, kt, kp1, kp2, ke, kpos = jax.random.split(key, 6)
    t = cfg.text
    n, d, f = t.n_layers, t.d_model, t.d_ff
    ks = jax.random.split(kt, 8)

    def w(k, shape):
        return L.dense_init(k, shape, t.dtype)

    text = {
        "token_embed": w(ke, (t.vocab_size, d)),
        "pos_embed": w(kpos, (t.max_positions, d)),
        "final_ln": {"w": jnp.ones((d,), t.dtype), "b": jnp.zeros((d,), t.dtype)},
        "layers": {
            "ln1": {"w": jnp.ones((n, d), t.dtype), "b": jnp.zeros((n, d), t.dtype)},
            "ln2": {"w": jnp.ones((n, d), t.dtype), "b": jnp.zeros((n, d), t.dtype)},
            "attn": {
                "wq": w(ks[0], (n, d, d)),
                "bq": jnp.zeros((n, d), t.dtype),
                "wk": w(ks[1], (n, d, d)),
                "bk": jnp.zeros((n, d), t.dtype),
                "wv": w(ks[2], (n, d, d)),
                "bv": jnp.zeros((n, d), t.dtype),
                "wo": w(ks[3], (n, d, d)),
                "bo": jnp.zeros((n, d), t.dtype),
            },
            "mlp": {
                "w1": w(ks[4], (n, d, f)),
                "b1": jnp.zeros((n, f), t.dtype),
                "w2": w(ks[5], (n, f, d)),
                "b2": jnp.zeros((n, d), t.dtype),
            },
        },
    }
    return {
        "vision": init_vision_params(kv, cfg.vision),
        "text": text,
        "visual_projection": L.dense_init(
            kp1, (cfg.vision.d_model, cfg.projection_dim), jnp.float32
        ),
        "text_projection": L.dense_init(
            kp2, (t.d_model, cfg.projection_dim), jnp.float32
        ),
    }


def clip_image_features(cfg: ClipConfig, params: dict, pixels: jax.Array):
    """(B, H, W, 3) normalized floats → (B, P) projected features.

    HF semantics: ``pooled = post_layernorm(last_hidden[:, 0])`` then
    ``visual_projection`` (modeling_clip.py CLIPVisionTransformer)."""
    h = vision_forward(cfg.vision, params["vision"], pixels)
    pooled = L.layer_norm(
        params["vision"]["post_ln"]["w"],
        params["vision"]["post_ln"]["b"],
        h[:, 0, :],
        cfg.vision.norm_eps,
    )
    return jnp.dot(pooled, params["visual_projection"])


def clip_text_features(
    cfg: ClipConfig,
    params: dict,
    input_ids: jax.Array,  # (B, S) int32, right-padded
    attention_mask: jax.Array,  # (B, S) 1=real
):
    """HF semantics: causal encoder, final layernorm, EOT pooling per the
    ``eos_token_id`` contract (see ClipTextConfig), ``text_projection``."""
    t = cfg.text
    p = params["text"]
    b, s = input_ids.shape
    h = p["token_embed"][input_ids] + p["pos_embed"][None, :s, :]

    pos = jnp.arange(s, dtype=jnp.int32)
    mask = (pos[None, :] <= pos[:, None])[None, None, :, :] & attention_mask[
        :, None, None, :
    ].astype(bool)

    # reuse the ViT encoder layer (identical pre-LN block structure)
    vcfg = VisionConfig(
        d_model=t.d_model,
        n_layers=t.n_layers,
        n_heads=t.n_heads,
        d_ff=t.d_ff,
        norm_eps=t.norm_eps,
        activation=t.activation,
        dtype=t.dtype,
    )

    def body(h, lp):
        return _vit_layer(vcfg, lp, h, mask=mask), None

    h, _ = jax.lax.scan(body, h.astype(t.dtype), p["layers"])
    h = L.layer_norm(p["final_ln"]["w"], p["final_ln"]["b"], h, t.norm_eps)
    if t.eos_token_id == 2:
        eot = jnp.argmax(input_ids, axis=-1)
    else:
        eot = jnp.argmax((input_ids == t.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = h[jnp.arange(b), eot]
    return jnp.dot(pooled, params["text_projection"])


# ---------------------------------------------------------------------------
# HF CLIPModel converter
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    return t.detach().cpu().float().numpy() if hasattr(t, "detach") else np.asarray(t)


def _stack_text_layers(sd: dict, prefix: str, n: int) -> dict:
    def take(fmt, transpose=False):
        mats = [_np(sd[fmt.format(i=i)]) for i in range(n)]
        out = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(out)

    return {
        "ln1": {
            "w": take(prefix + ".layers.{i}.layer_norm1.weight"),
            "b": take(prefix + ".layers.{i}.layer_norm1.bias"),
        },
        "ln2": {
            "w": take(prefix + ".layers.{i}.layer_norm2.weight"),
            "b": take(prefix + ".layers.{i}.layer_norm2.bias"),
        },
        "attn": {
            "wq": take(prefix + ".layers.{i}.self_attn.q_proj.weight", True),
            "bq": take(prefix + ".layers.{i}.self_attn.q_proj.bias"),
            "wk": take(prefix + ".layers.{i}.self_attn.k_proj.weight", True),
            "bk": take(prefix + ".layers.{i}.self_attn.k_proj.bias"),
            "wv": take(prefix + ".layers.{i}.self_attn.v_proj.weight", True),
            "bv": take(prefix + ".layers.{i}.self_attn.v_proj.bias"),
            "wo": take(prefix + ".layers.{i}.self_attn.out_proj.weight", True),
            "bo": take(prefix + ".layers.{i}.self_attn.out_proj.bias"),
        },
        "mlp": {
            "w1": take(prefix + ".layers.{i}.mlp.fc1.weight", True),
            "b1": take(prefix + ".layers.{i}.mlp.fc1.bias"),
            "w2": take(prefix + ".layers.{i}.mlp.fc2.weight", True),
            "b2": take(prefix + ".layers.{i}.mlp.fc2.bias"),
        },
    }


def convert_hf_clip(sd: dict, cfg: ClipConfig) -> dict:
    """transformers ``CLIPModel.state_dict()`` → our pytree.

    The vision patch conv (D, C, kh, kw) flattens to our (kh·kw·C, D)
    patchify layout; ``pre_layrnorm`` is HF's actual (misspelled) name."""
    v = cfg.vision
    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    patch = jnp.asarray(
        conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    )
    vision = {
        "patch_embed": patch,
        "class_embed": jnp.asarray(_np(sd["vision_model.embeddings.class_embedding"])),
        "pos_embed": jnp.asarray(
            _np(sd["vision_model.embeddings.position_embedding.weight"])
        ),
        "pre_ln": {
            "w": jnp.asarray(_np(sd["vision_model.pre_layrnorm.weight"])),
            "b": jnp.asarray(_np(sd["vision_model.pre_layrnorm.bias"])),
        },
        "post_ln": {
            "w": jnp.asarray(_np(sd["vision_model.post_layernorm.weight"])),
            "b": jnp.asarray(_np(sd["vision_model.post_layernorm.bias"])),
        },
        "layers": _stack_text_layers(sd, "vision_model.encoder", v.n_layers),
    }
    t = cfg.text
    text = {
        "token_embed": jnp.asarray(
            _np(sd["text_model.embeddings.token_embedding.weight"])
        ),
        "pos_embed": jnp.asarray(
            _np(sd["text_model.embeddings.position_embedding.weight"])
        ),
        "final_ln": {
            "w": jnp.asarray(_np(sd["text_model.final_layer_norm.weight"])),
            "b": jnp.asarray(_np(sd["text_model.final_layer_norm.bias"])),
        },
        "layers": _stack_text_layers(sd, "text_model.encoder", t.n_layers),
    }
    return {
        "vision": jax.tree.map(lambda x: x.astype(v.dtype), vision),
        "text": jax.tree.map(lambda x: x.astype(t.dtype), text),
        "visual_projection": jnp.asarray(_np(sd["visual_projection.weight"]).T),
        "text_projection": jnp.asarray(_np(sd["text_projection.weight"]).T),
    }
