"""HF checkpoint → JAX pytree conversion.

Weight mapping tables per model family (SURVEY.md §7 hard-part #1).  Input is
any mapping of HF parameter names to arrays (a torch ``state_dict``, a
safetensors file, or numpy arrays); output is the stacked-layer pytree the
scan-based decoders consume.  HF ``nn.Linear`` stores (out, in); we store
(in, out), hence the transposes.
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np

from .config import DecoderConfig, VisionConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach()
        if x.dtype is not None and str(x.dtype) == "torch.bfloat16":
            x = x.float()
        x = x.cpu().numpy()
    return np.asarray(x)


def _stack(sd: Mapping, fmt: str, n_layers: int, transpose: bool = False):
    rows = []
    for i in range(n_layers):
        w = _np(sd[fmt.format(i=i)])
        rows.append(w.T if transpose else w)
    return np.stack(rows)


def convert_llama(
    sd: Mapping, cfg: DecoderConfig, prefix: str = "model.", dtype=None
) -> dict:
    """LLaMA/Mistral-family HF state dict → decoder params.

    Works for ``LlamaForCausalLM``/``MistralForCausalLM`` and for the text
    backbone inside Idefics/Idefics2 given the right ``prefix``.
    """
    dtype = dtype or cfg.dtype
    lp = prefix + "layers.{i}."
    layers = {
        "attn": {
            "wq": _stack(sd, lp + "self_attn.q_proj.weight", cfg.n_layers, True),
            "wk": _stack(sd, lp + "self_attn.k_proj.weight", cfg.n_layers, True),
            "wv": _stack(sd, lp + "self_attn.v_proj.weight", cfg.n_layers, True),
            "wo": _stack(sd, lp + "self_attn.o_proj.weight", cfg.n_layers, True),
        },
        "mlp": {
            "w_gate": _stack(sd, lp + "mlp.gate_proj.weight", cfg.n_layers, True),
            "w_up": _stack(sd, lp + "mlp.up_proj.weight", cfg.n_layers, True),
            "w_down": _stack(sd, lp + "mlp.down_proj.weight", cfg.n_layers, True),
        },
        "ln1": _stack(sd, lp + "input_layernorm.weight", cfg.n_layers),
        "ln2": _stack(sd, lp + "post_attention_layernorm.weight", cfg.n_layers),
    }
    params = {
        "embed": _np(sd[prefix + "embed_tokens.weight"]),
        "layers": layers,
        "final_norm": _np(sd[prefix + "norm.weight"]),
    }
    if not cfg.tie_embeddings:
        head_key = "lm_head.weight"
        if head_key not in sd:  # nested, e.g. idefics2 "lm_head.weight" at root
            head_key = prefix + "lm_head.weight"
        params["lm_head"] = _np(sd[head_key]).T
    return _cast_tree(params, dtype)


def _cast_tree(tree, dtype):
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    import jax

    return jax.tree.map(cast, tree)


def _ln(sd, prefix):
    return {"w": _np(sd[prefix + "weight"]), "b": _np(sd[prefix + "bias"])}


def convert_idefics_vision(sd: Mapping, cfg: VisionConfig, prefix: str) -> dict:
    n = cfg.n_layers
    lp = prefix + "encoder.layers.{i}."
    conv = _np(sd[prefix + "embeddings.patch_embedding.weight"])  # (D, C, P, P)
    params = {
        "patch_embed": conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]),
        "class_embed": _np(sd[prefix + "embeddings.class_embedding"]),
        "pos_embed": _np(sd[prefix + "embeddings.position_embedding.weight"]),
        "pre_ln": _ln(sd, prefix + "pre_layrnorm."),  # (sic — HF key)
        "post_ln": _ln(sd, prefix + "post_layernorm."),
        "layers": {
            "ln1": {
                "w": _stack(sd, lp + "layer_norm1.weight", n),
                "b": _stack(sd, lp + "layer_norm1.bias", n),
            },
            "ln2": {
                "w": _stack(sd, lp + "layer_norm2.weight", n),
                "b": _stack(sd, lp + "layer_norm2.bias", n),
            },
            "attn": {
                "wq": _stack(sd, lp + "self_attn.q_proj.weight", n, True),
                "bq": _stack(sd, lp + "self_attn.q_proj.bias", n),
                "wk": _stack(sd, lp + "self_attn.k_proj.weight", n, True),
                "bk": _stack(sd, lp + "self_attn.k_proj.bias", n),
                "wv": _stack(sd, lp + "self_attn.v_proj.weight", n, True),
                "bv": _stack(sd, lp + "self_attn.v_proj.bias", n),
                "wo": _stack(sd, lp + "self_attn.out_proj.weight", n, True),
                "bo": _stack(sd, lp + "self_attn.out_proj.bias", n),
            },
            "mlp": {
                "w1": _stack(sd, lp + "mlp.fc1.weight", n, True),
                "b1": _stack(sd, lp + "mlp.fc1.bias", n),
                "w2": _stack(sd, lp + "mlp.fc2.weight", n, True),
                "b2": _stack(sd, lp + "mlp.fc2.bias", n),
            },
        },
    }
    return params


def convert_idefics_perceiver(sd: Mapping, n_layers: int, prefix: str) -> dict:
    bp = prefix + "blocks.{i}.0."
    mp = prefix + "blocks.{i}.1."
    n = n_layers
    blocks = {
        "ctx_ln": {
            "w": _stack(sd, bp + "context_layer_norm.weight", n),
            "b": _stack(sd, bp + "context_layer_norm.bias", n),
        },
        "lat_ln": {
            "w": _stack(sd, bp + "latents_layer_norm.weight", n),
            "b": _stack(sd, bp + "latents_layer_norm.bias", n),
        },
        "wq": _stack(sd, bp + "q_proj.weight", n, True),
        "wk": _stack(sd, bp + "k_proj.weight", n, True),
        "wv": _stack(sd, bp + "v_proj.weight", n, True),
        "wo": _stack(sd, bp + "output_proj.weight", n, True),
        "mlp_ln": {
            "w": _stack(sd, mp + "ln.weight", n),
            "b": _stack(sd, mp + "ln.bias", n),
        },
        "fc": _stack(sd, mp + "fc.weight", n, True),
        "c_proj": _stack(sd, mp + "c_proj.weight", n, True),
    }
    if prefix + "blocks.0.0.q_layer_norm.weight" in sd:
        blocks["q_ln"] = {
            "w": _stack(sd, bp + "q_layer_norm.weight", n),
            "b": _stack(sd, bp + "q_layer_norm.bias", n),
        }
        blocks["k_ln"] = {
            "w": _stack(sd, bp + "k_layer_norm.weight", n),
            "b": _stack(sd, bp + "k_layer_norm.bias", n),
        }
    return {
        "latents": _np(sd[prefix + "latents"]),
        "blocks": blocks,
        "final_ln": _ln(sd, prefix + "layer_norm."),
    }


def convert_idefics(sd: Mapping, cfg, dtype=None) -> dict:
    """Full ``IdeficsForVisionText2Text`` state dict → our param pytree.

    ``cfg`` is a ``licv_vqa_tpu.models.idefics.IdeficsConfig``.  Decoupled
    embedding/lm_head extra rows are concatenated into single tables.
    """
    t = cfg.text
    dtype = dtype or t.dtype
    n = t.n_layers
    lp = "model.layers.{i}."

    embed = _np(sd["model.embed_tokens.weight"])
    if "model.embed_tokens.additional_embedding.weight" in sd:
        embed = np.concatenate(
            [embed, _np(sd["model.embed_tokens.additional_embedding.weight"])]
        )
    head = _np(sd["lm_head.weight"])
    if "lm_head.additional_fc.weight" in sd:
        head = np.concatenate([head, _np(sd["lm_head.additional_fc.weight"])])

    layers = {
        "attn": {
            "wq": _stack(sd, lp + "self_attn.q_proj.weight", n, True),
            "wk": _stack(sd, lp + "self_attn.k_proj.weight", n, True),
            "wv": _stack(sd, lp + "self_attn.v_proj.weight", n, True),
            "wo": _stack(sd, lp + "self_attn.o_proj.weight", n, True),
        },
        "mlp": {
            "w_gate": _stack(sd, lp + "mlp.gate_proj.weight", n, True),
            "w_up": _stack(sd, lp + "mlp.up_proj.weight", n, True),
            "w_down": _stack(sd, lp + "mlp.down_proj.weight", n, True),
        },
        "ln1": _stack(sd, lp + "input_layernorm.weight", n),
        "ln2": _stack(sd, lp + "post_attention_layernorm.weight", n),
    }
    if "model.layers.0.self_attn.q_layer_norm.weight" in sd:
        layers["attn"]["q_norm"] = _stack(sd, lp + "self_attn.q_layer_norm.weight", n)
        layers["attn"]["k_norm"] = _stack(sd, lp + "self_attn.k_layer_norm.weight", n)

    n_x = n // cfg.cross_layer_interval
    xp = "model.gated_cross_attn_layers.{i}."
    xattn = {
        "ln1": _stack(sd, xp + "input_layernorm.weight", n_x),
        "ln2": _stack(sd, xp + "post_attention_layernorm.weight", n_x),
        "attn": {
            "wq": _stack(sd, xp + "cross_attn.q_proj.weight", n_x, True),
            "wk": _stack(sd, xp + "cross_attn.k_proj.weight", n_x, True),
            "wv": _stack(sd, xp + "cross_attn.v_proj.weight", n_x, True),
            "wo": _stack(sd, xp + "cross_attn.o_proj.weight", n_x, True),
        },
        "mlp": {
            "w_gate": _stack(sd, xp + "mlp.gate_proj.weight", n_x, True),
            "w_up": _stack(sd, xp + "mlp.up_proj.weight", n_x, True),
            "w_down": _stack(sd, xp + "mlp.down_proj.weight", n_x, True),
        },
        "alpha_xattn": np.stack(
            [_np(sd[xp.format(i=i) + "alpha_cross_attn"]).reshape(-1)[0 if cfg.alpha_type == "float" else slice(None)] for i in range(n_x)]
        ),
        "alpha_dense": np.stack(
            [_np(sd[xp.format(i=i) + "alpha_dense"]).reshape(-1)[0 if cfg.alpha_type == "float" else slice(None)] for i in range(n_x)]
        ),
    }
    if "model.gated_cross_attn_layers.0.cross_attn.q_layer_norm.weight" in sd:
        xattn["attn"]["q_norm"] = _stack(
            sd, xp + "cross_attn.q_layer_norm.weight", n_x
        )
        xattn["attn"]["k_norm"] = _stack(
            sd, xp + "cross_attn.k_layer_norm.weight", n_x
        )

    params = {
        "embed": embed,
        "layers": layers,
        "xattn": xattn,
        "final_norm": _np(sd["model.norm.weight"]),
        "lm_head": head.T,
        "vision": convert_idefics_vision(sd, cfg.vision, "model.vision_model."),
        "perceiver": convert_idefics_perceiver(
            sd, cfg.perceiver.n_layers, "model.perceiver_resampler."
        ),
    }
    return _cast_tree(params, dtype)


def convert_siglip_vision(sd: Mapping, cfg: VisionConfig, prefix: str) -> dict:
    """SigLIP-style tower (Idefics2): biased patch conv, no class token,
    post-layernorm on the sequence."""
    n = cfg.n_layers
    lp = prefix + "encoder.layers.{i}."
    conv = _np(sd[prefix + "embeddings.patch_embedding.weight"])
    return {
        "patch_embed": conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]),
        "patch_bias": _np(sd[prefix + "embeddings.patch_embedding.bias"]),
        "pos_embed": _np(sd[prefix + "embeddings.position_embedding.weight"]),
        "post_ln": _ln(sd, prefix + "post_layernorm."),
        "layers": {
            "ln1": {
                "w": _stack(sd, lp + "layer_norm1.weight", n),
                "b": _stack(sd, lp + "layer_norm1.bias", n),
            },
            "ln2": {
                "w": _stack(sd, lp + "layer_norm2.weight", n),
                "b": _stack(sd, lp + "layer_norm2.bias", n),
            },
            "attn": {
                "wq": _stack(sd, lp + "self_attn.q_proj.weight", n, True),
                "bq": _stack(sd, lp + "self_attn.q_proj.bias", n),
                "wk": _stack(sd, lp + "self_attn.k_proj.weight", n, True),
                "bk": _stack(sd, lp + "self_attn.k_proj.bias", n),
                "wv": _stack(sd, lp + "self_attn.v_proj.weight", n, True),
                "bv": _stack(sd, lp + "self_attn.v_proj.bias", n),
                "wo": _stack(sd, lp + "self_attn.out_proj.weight", n, True),
                "bo": _stack(sd, lp + "self_attn.out_proj.bias", n),
            },
            "mlp": {
                "w1": _stack(sd, lp + "mlp.fc1.weight", n, True),
                "b1": _stack(sd, lp + "mlp.fc1.bias", n),
                "w2": _stack(sd, lp + "mlp.fc2.weight", n, True),
                "b2": _stack(sd, lp + "mlp.fc2.bias", n),
            },
        },
    }


def convert_idefics2(sd: Mapping, cfg, dtype=None) -> dict:
    """``Idefics2ForConditionalGeneration`` state dict → our pytree.

    ``cfg`` is a ``licv_vqa_tpu.models.idefics2.Idefics2Config``."""
    t = cfg.text
    dtype = dtype or t.dtype
    params = convert_llama(sd, t, prefix="model.text_model.", dtype=dtype)

    pp = "model.connector.perceiver_resampler."
    n = cfg.perceiver.n_layers
    lp = pp + "layers.{i}."
    perceiver = {
        "latents": _np(sd[pp + "latents"]),
        "layers": {
            "lat_norm": _stack(sd, lp + "input_latents_norm.weight", n),
            "ctx_norm": _stack(sd, lp + "input_context_norm.weight", n),
            "wq": _stack(sd, lp + "self_attn.q_proj.weight", n, True),
            "wk": _stack(sd, lp + "self_attn.k_proj.weight", n, True),
            "wv": _stack(sd, lp + "self_attn.v_proj.weight", n, True),
            "wo": _stack(sd, lp + "self_attn.o_proj.weight", n, True),
            "post_norm": _stack(sd, lp + "post_attention_layernorm.weight", n),
            "mlp": {
                "w_gate": _stack(sd, lp + "mlp.gate_proj.weight", n, True),
                "w_up": _stack(sd, lp + "mlp.up_proj.weight", n, True),
                "w_down": _stack(sd, lp + "mlp.down_proj.weight", n, True),
            },
        },
        "final_norm": _np(sd[pp + "norm.weight"]),
    }
    cp = "model.connector.modality_projection."
    connector = {
        "w_gate": _np(sd[cp + "gate_proj.weight"]).T,
        "w_up": _np(sd[cp + "up_proj.weight"]).T,
        "w_down": _np(sd[cp + "down_proj.weight"]).T,
    }
    extra = {
        "vision": convert_siglip_vision(sd, cfg.vision, "model.vision_model."),
        "connector": connector,
        "perceiver": perceiver,
    }
    return {**params, **_cast_tree(extra, dtype)}


def convert_mpt(sd: Mapping, cfg: DecoderConfig, prefix: str = "transformer.", dtype=None) -> dict:
    """HF ``MptForCausalLM`` → decoder params (OpenFlamingo's language
    encoder).  The fused ``Wqkv`` (3D, D) splits into q/k/v rows; LayerNorms
    are bias-free; the LM head ties to the embedding."""
    dtype = dtype or cfg.dtype
    n = cfg.n_layers
    lp = prefix + "blocks.{i}."
    wqkv = _stack(sd, lp + "attn.Wqkv.weight", n)  # (L, 3D, D)
    d = cfg.d_model
    layers = {
        "attn": {
            "wq": wqkv[:, :d, :].transpose(0, 2, 1),
            "wk": wqkv[:, d : 2 * d, :].transpose(0, 2, 1),
            "wv": wqkv[:, 2 * d :, :].transpose(0, 2, 1),
            "wo": _stack(sd, lp + "attn.out_proj.weight", n, True),
        },
        "mlp": {
            "w_up": _stack(sd, lp + "ffn.up_proj.weight", n, True),
            "w_down": _stack(sd, lp + "ffn.down_proj.weight", n, True),
        },
        "ln1": _stack(sd, lp + "norm_1.weight", n),
        "ln2": _stack(sd, lp + "norm_2.weight", n),
    }
    params = {
        "embed": _np(sd[prefix + "wte.weight"]),
        "layers": layers,
        "final_norm": _np(sd[prefix + "norm_f.weight"]),
    }
    return _cast_tree(params, dtype)


def convert_openclip_vision(sd: Mapping, cfg: VisionConfig, prefix: str = "visual.") -> dict:
    """open_clip ``VisionTransformer`` (CLIP ViT-L/14, OpenFlamingo's frozen
    tower — reference: utils.py:51-67 loads it via open_clip) → our vision
    params.  open_clip fuses q/k/v into ``attn.in_proj_weight`` (3D, D)."""
    n = cfg.n_layers
    d = cfg.d_model
    lp = prefix + "transformer.resblocks.{i}."
    conv = _np(sd[prefix + "conv1.weight"])  # (D, 3, P, P), no bias
    in_w = _stack(sd, lp + "attn.in_proj_weight", n)  # (L, 3D, D)
    in_b = _stack(sd, lp + "attn.in_proj_bias", n)  # (L, 3D)
    return {
        "patch_embed": conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]),
        "class_embed": _np(sd[prefix + "class_embedding"]).reshape(-1),
        "pos_embed": _np(sd[prefix + "positional_embedding"]),
        "pre_ln": _ln(sd, prefix + "ln_pre."),
        "post_ln": _ln(sd, prefix + "ln_post."),
        "layers": {
            "ln1": {
                "w": _stack(sd, lp + "ln_1.weight", n),
                "b": _stack(sd, lp + "ln_1.bias", n),
            },
            "ln2": {
                "w": _stack(sd, lp + "ln_2.weight", n),
                "b": _stack(sd, lp + "ln_2.bias", n),
            },
            "attn": {
                "wq": in_w[:, :d, :].transpose(0, 2, 1),
                "bq": in_b[:, :d],
                "wk": in_w[:, d : 2 * d, :].transpose(0, 2, 1),
                "bk": in_b[:, d : 2 * d],
                "wv": in_w[:, 2 * d :, :].transpose(0, 2, 1),
                "bv": in_b[:, 2 * d :],
                "wo": _stack(sd, lp + "attn.out_proj.weight", n, True),
                "bo": _stack(sd, lp + "attn.out_proj.bias", n),
            },
            "mlp": {
                "w1": _stack(sd, lp + "mlp.c_fc.weight", n, True),
                "b1": _stack(sd, lp + "mlp.c_fc.bias", n),
                "w2": _stack(sd, lp + "mlp.c_proj.weight", n, True),
                "b2": _stack(sd, lp + "mlp.c_proj.bias", n),
            },
        },
    }


def convert_flamingo_perceiver(sd: Mapping, n_layers: int, prefix: str = "perceiver.") -> dict:
    """open_flamingo ``PerceiverResampler`` naming → our perceiver params.
    Blocks are ``layers.{i}.0`` (PerceiverAttention: norm_media/norm_latents,
    fused to_kv) and ``layers.{i}.1`` (FeedForward: LN, Linear, GELU, Linear,
    all bias-free linears)."""
    n = n_layers
    ap = prefix + "layers.{i}.0."
    fp = prefix + "layers.{i}.1."
    to_kv = _stack(sd, ap + "to_kv.weight", n, True)  # (L, De, 2·inner)
    inner = to_kv.shape[-1] // 2
    return {
        "latents": _np(sd[prefix + "latents"]),
        "blocks": {
            "ctx_ln": {
                "w": _stack(sd, ap + "norm_media.weight", n),
                "b": _stack(sd, ap + "norm_media.bias", n),
            },
            "lat_ln": {
                "w": _stack(sd, ap + "norm_latents.weight", n),
                "b": _stack(sd, ap + "norm_latents.bias", n),
            },
            "wq": _stack(sd, ap + "to_q.weight", n, True),
            "wk": to_kv[:, :, :inner],  # chunk(2, dim=-1) order: k first
            "wv": to_kv[:, :, inner:],
            "wo": _stack(sd, ap + "to_out.weight", n, True),
            "mlp_ln": {
                "w": _stack(sd, fp + "0.weight", n),
                "b": _stack(sd, fp + "0.bias", n),
            },
            "fc": _stack(sd, fp + "1.weight", n, True),
            "c_proj": _stack(sd, fp + "3.weight", n, True),
        },
        "final_ln": _ln(sd, prefix + "norm."),
    }


def convert_flamingo_xattn(sd: Mapping, n_xattn: int, prefix: str = "lang_encoder.gated_cross_attn_layers.") -> dict:
    """open_flamingo ``GatedCrossAttentionBlock`` naming → our xattn stack
    (see init_flamingo_xattn_params in openflamingo.py)."""
    n = n_xattn
    xp = prefix + "{i}."
    return {
        "ln_attn": {
            "w": _stack(sd, xp + "attn.norm.weight", n),
            "b": _stack(sd, xp + "attn.norm.bias", n),
        },
        "wq": _stack(sd, xp + "attn.to_q.weight", n, True),
        # fused to_kv stays fused: our block reshapes (…, 2, nh, dh) with k
        # first, matching torch's chunk(2, dim=-1)
        "wkv": _stack(sd, xp + "attn.to_kv.weight", n, True),
        "wo": _stack(sd, xp + "attn.to_out.weight", n, True),
        "attn_gate": np.stack(
            [_np(sd[xp.format(i=i) + "attn_gate"]).reshape(-1)[0] for i in range(n)]
        ),
        "ln_ff": {
            "w": _stack(sd, xp + "ff.0.weight", n),
            "b": _stack(sd, xp + "ff.0.bias", n),
        },
        "ff_up": _stack(sd, xp + "ff.1.weight", n, True),
        "ff_down": _stack(sd, xp + "ff.3.weight", n, True),
        "ff_gate": np.stack(
            [_np(sd[xp.format(i=i) + "ff_gate"]).reshape(-1)[0] for i in range(n)]
        ),
    }


def convert_openflamingo_checkpoint(sd: Mapping, cfg, params: dict, dtype=None) -> dict:
    """Merge an open_flamingo ``checkpoint.pt`` state dict into ``params``.

    The released OpenFlamingo checkpoints (reference: utils.py:51-67,
    ``flamingo_checkpoint_dir``) carry ONLY the trained deltas — the
    perceiver, the gated cross-attn layers, and the resized input embedding
    (``lang_encoder.transformer.wte.weight``).  The MPT base and the CLIP
    ViT-L tower load separately.  Keys may be ``module.``-prefixed (DDP).
    ``cfg`` is an ``OpenFlamingoConfig``; ``params`` an existing pytree
    (random or MPT-initialized).  Returns ``(new_params, updated_keys)``.
    """
    t = cfg.text
    dtype = dtype or t.dtype
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    out = dict(params)
    updated = []
    if "perceiver.latents" in sd:
        out["perceiver"] = _cast_tree(
            convert_flamingo_perceiver(sd, cfg.perceiver.n_layers), dtype
        )
        updated.append("perceiver")
    n_xattn = t.n_layers // cfg.cross_attn_every_n_layers
    if "lang_encoder.gated_cross_attn_layers.0.attn_gate" in sd:
        out["xattn"] = _cast_tree(convert_flamingo_xattn(sd, n_xattn), dtype)
        updated.append("xattn")
    if "lang_encoder.transformer.wte.weight" in sd:
        # embeddings resized for <image>/<|endofchunk|>; MPT ties the head
        out["embed"] = _cast_tree(_np(sd["lang_encoder.transformer.wte.weight"]), dtype)
        updated.append("embed")
    if "lang_encoder.transformer.blocks.0.attn.Wqkv.weight" in sd:
        # full-model dump: the MPT base rides along
        mpt = convert_mpt(sd, t, prefix="lang_encoder.transformer.", dtype=dtype)
        out["layers"], out["final_norm"] = mpt["layers"], mpt["final_norm"]
        if "embed" not in updated:
            out["embed"] = mpt["embed"]
        updated.append("layers")
    if "vision_encoder.visual.conv1.weight" in sd:
        out["vision"] = _cast_tree(
            convert_openclip_vision(sd, cfg.vision, "vision_encoder.visual."), dtype
        )
        updated.append("vision")
    return out, updated


def hf_state_dict(model) -> dict:
    """Grab a torch module's state dict as plain numpy arrays."""
    return {k: _np(v) for k, v in model.state_dict().items()}
