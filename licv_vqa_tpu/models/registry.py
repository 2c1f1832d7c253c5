"""Model registry: config group ``lmm`` → a runnable model bundle.

Replaces the reference's ``init_interface`` factory over the external
``lmm_icl_interface`` package (reference: utils.py:31-80).  A bundle carries
the JAX model (config + params), tokenizer, processor, and the two forward
closures the trainer/decoder need.

Weight resolution for real checkpoints: ``{model_cpk_dir}/{model_name}`` with
HF ``*.safetensors`` shards (or ``pytorch_model*.bin``).  When absent —
e.g. in an offline environment — parameters are randomly initialized with a
loud warning; the tiny configs (``tiny-idefics``) exist for exactly the
smoke-run idiom the reference used (reference: config/train.yaml:15).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..data.processor import (
    CLIP_MEAN,
    CLIP_STD,
    SIGLIP_MEAN,
    SIGLIP_STD,
    ImageTransform,
    PromptProcessor,
)
from ..data.tokenizer import WhitespaceTokenizer, load_hf_tokenizer
from ..utils.log import get_logger
from .config import injection_site_from_layer_format
from .convert import convert_idefics
from .idefics import IdeficsConfig, init_idefics_params, make_idefics_forward_fns
from .decoder import logits_from_hidden as _logits_from_hidden

logger = get_logger("models")


@dataclasses.dataclass
class ModelBundle:
    name: str
    model_cfg: Any
    params: Any
    tokenizer: Any
    processor: PromptProcessor
    train_forward: Callable  # (model_params, inputs, icv_scaled) -> logits
    bind_decode: Callable  # (pixels, valid, prompt_ids, icv, max_len) -> fwd_fn
    hidden_size: int
    n_layers: int
    # subset-layer intervention (lmm.intervention_layer int/list): the K
    # decoder layers the K ICV rows map to; None when the ICV covers every
    # layer (reference icv_intervention.py:39-42 semantics)
    intervention_layers: Optional[list] = None
    # (model_params, hidden (B,S,D)) -> logits (B,S,V) f32 — the family's LM
    # head alone, for callers that gather a hidden window BEFORE the (D,V)
    # projection (the teacher-KL path: 8x less logit memory at s_tea=2048
    # vs s_stu=256).  Composes with train_forward(return_hidden=True).
    head_fn: Optional[Callable] = None

    @property
    def pad_token_id(self) -> int:
        return self.tokenizer.pad_token_id

    @property
    def eos_token_id(self) -> int:
        return self.tokenizer.eos_token_id


def _wrap_pixel_normalize(train_forward, bind_decode, mean, std):
    """Normalize RAW uint8 pixels on device (processor emits uint8)."""
    mean = jnp.asarray(mean, jnp.float32)
    inv_std = 1.0 / jnp.asarray(std, jnp.float32)

    def norm(pixels):
        if pixels.dtype == jnp.uint8:
            return (pixels.astype(jnp.float32) * (1.0 / 255.0) - mean) * inv_std
        return pixels  # already normalized floats (direct-API callers)

    def tf(model_params, inputs, icv_scaled, **kw):
        inputs = dict(inputs, pixel_values=norm(inputs["pixel_values"]))
        return train_forward(model_params, inputs, icv_scaled, **kw)

    def bd(model_params, pixels, valid, ids, icv_scaled, max_len, **kw):
        return bind_decode(
            model_params, norm(pixels), valid, ids, icv_scaled, max_len, **kw
        )

    return tf, bd


def _max_length(cfg, default: int) -> int:
    """Processor truncation bound: ``lmm.max_length`` override or the model
    family's context length.  Too-small values silently cut the teacher ICL
    view (the processor warns; the collator rejects a cut answer region)."""
    if cfg is not None:
        try:
            v = cfg.lmm.get("max_length")
            if v is not None:
                return int(v)
        except Exception:
            pass
    return default


def _wrap_intervention(cfg, n_layers: int, train_forward, bind_decode):
    """Apply the reference's ``intervention_layer`` semantics (int/list/-1,
    icv_intervention.py:39-42): the encoder owns K = len(layers) rows; the
    model receives an (L, D) row tensor plus per-layer enable flags."""
    from ..icv.encoder import expand_icv_to_layers, prepare_intervention_layers

    intervention = -1
    if cfg is not None:
        try:
            raw = cfg.lmm.get("intervention_layer", -1)
            intervention = raw if isinstance(raw, (int, list)) else list(raw)
        except Exception:
            intervention = -1
    layers = prepare_intervention_layers(intervention, n_layers)
    if layers == list(range(n_layers)):
        return train_forward, bind_decode, n_layers, None

    def expand(icv):
        return expand_icv_to_layers(icv, layers, n_layers)

    def tf(model_params, inputs, icv_scaled, **kw):
        return train_forward(model_params, inputs, expand(icv_scaled), **kw)

    def bd(model_params, pixels, valid, ids, icv_scaled, max_len, **kw):
        return bind_decode(
            model_params, pixels, valid, ids, expand(icv_scaled), max_len, **kw
        )

    return tf, bd, len(layers), layers


def _load_hf_weights(model_dir: Path) -> Optional[dict]:
    shards = sorted(model_dir.glob("*.safetensors"))
    if shards:
        from safetensors import safe_open

        sd: dict = {}
        for shard in shards:
            with safe_open(str(shard), framework="pt") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    bins = sorted(model_dir.glob("pytorch_model*.bin"))
    if bins:
        import torch

        sd = {}
        for b in bins:
            sd.update(torch.load(b, map_location="cpu", weights_only=True))
        return sd
    return None


def _resolve_tokenizer(model_dir: Optional[Path]):
    if model_dir is not None and (model_dir / "tokenizer_config.json").exists():
        return load_hf_tokenizer(str(model_dir))
    logger.warning(
        "no HF tokenizer found (%s) — falling back to WhitespaceTokenizer "
        "(smoke/synthetic mode only)",
        model_dir,
    )
    return WhitespaceTokenizer()


def _idefics_bundle(cfg, model_cfg: IdeficsConfig, name: str) -> ModelBundle:
    model_dir = None
    if cfg is not None and "model_cpk_dir" in cfg:
        try:
            model_dir = Path(str(cfg.model_cpk_dir)) / str(cfg.lmm.model_name)
        except Exception:
            model_dir = None

    sd = _load_hf_weights(model_dir) if model_dir and model_dir.exists() else None
    if sd is not None:
        params = convert_idefics(sd, model_cfg)
        logger.info("loaded idefics weights from %s", model_dir)
    else:
        logger.warning(
            "idefics weights not found under %s — RANDOM INIT (bf16)", model_dir
        )
        params = init_idefics_params(jax.random.PRNGKey(0), model_cfg)

    tokenizer = _resolve_tokenizer(model_dir)
    # keep the processor's image token in sync with the model config
    if hasattr(tokenizer, "token_id"):
        tok_img = tokenizer.token_id("<image>")
        if tok_img is not None and tok_img >= 0 and sd is not None:
            model_cfg = dataclasses.replace(model_cfg, image_token_id=tok_img)

    processor = PromptProcessor(
        tokenizer,
        ImageTransform(model_cfg.vision.image_size, CLIP_MEAN, CLIP_STD),
        family="idefics",
        max_length=_max_length(cfg, default=2048),  # LLaMA-7B context
    )
    # make the whitespace-tokenizer smoke path self-consistent
    if isinstance(tokenizer, WhitespaceTokenizer):
        model_cfg = dataclasses.replace(
            model_cfg, image_token_id=processor.image_token_id
        )

    train_forward, bind_decode = make_idefics_forward_fns(
        model_cfg, tokenizer.eos_token_id
    )
    train_forward, bind_decode = _wrap_pixel_normalize(
        train_forward, bind_decode, CLIP_MEAN, CLIP_STD
    )
    train_forward, bind_decode, n_icv_layers, icv_layer_ids = _wrap_intervention(
        cfg, model_cfg.text.n_layers, train_forward, bind_decode
    )
    return ModelBundle(
        name=name,
        model_cfg=model_cfg,
        params=params,
        tokenizer=tokenizer,
        processor=processor,
        train_forward=train_forward,
        bind_decode=bind_decode,
        hidden_size=model_cfg.text.d_model,
        n_layers=n_icv_layers,
        intervention_layers=icv_layer_ids,
        head_fn=lambda p, h, _t=model_cfg.text: _logits_from_hidden(_t, p, h),
    )


def _idefics2_bundle(cfg, model_cfg, name: str) -> ModelBundle:
    from .convert import convert_idefics2
    from .idefics2 import init_idefics2_params, make_idefics2_forward_fns

    model_dir = None
    if cfg is not None and "model_cpk_dir" in cfg:
        try:
            model_dir = Path(str(cfg.model_cpk_dir)) / str(cfg.lmm.model_name)
        except Exception:
            model_dir = None
    sd = _load_hf_weights(model_dir) if model_dir and model_dir.exists() else None
    if sd is not None:
        params = convert_idefics2(sd, model_cfg)
        logger.info("loaded idefics2 weights from %s", model_dir)
    else:
        logger.warning(
            "idefics2 weights not found under %s — RANDOM INIT", model_dir
        )
        params = init_idefics2_params(jax.random.PRNGKey(0), model_cfg)

    tokenizer = _resolve_tokenizer(model_dir)
    # Flagship-scale towers use NaViT variable resolution (aspect-preserving
    # resize into [378, 980] + pixel_attention_mask — HF processor defaults,
    # reference: utils.py:68-78); tiny/test configs keep fixed squares.
    variable = model_cfg.vision.image_size >= 378
    processor = PromptProcessor(
        tokenizer,
        ImageTransform(
            model_cfg.vision.image_size,
            SIGLIP_MEAN,
            SIGLIP_STD,
            variable_resolution=variable,
        ),
        family="idefics2",
        image_seq_len=model_cfg.image_seq_len,
        # Mistral-7B backbone: long context; 64 inline tokens/image means
        # 32-shot teacher views run to thousands of tokens — a 2048 default
        # would silently truncate the teacher and corrupt the KL target
        max_length=_max_length(cfg, default=8192),
    )
    import dataclasses as _dc

    if isinstance(tokenizer, WhitespaceTokenizer):
        model_cfg = _dc.replace(model_cfg, image_token_id=processor.image_token_id)
    elif sd is not None:
        tok_img = tokenizer.token_id("<image>")
        if tok_img is not None and tok_img >= 0:
            model_cfg = _dc.replace(model_cfg, image_token_id=tok_img)

    train_forward, bind_decode = make_idefics2_forward_fns(
        model_cfg, tokenizer.eos_token_id
    )
    train_forward, bind_decode = _wrap_pixel_normalize(
        train_forward, bind_decode, SIGLIP_MEAN, SIGLIP_STD
    )
    train_forward, bind_decode, n_icv_layers, icv_layer_ids = _wrap_intervention(
        cfg, model_cfg.text.n_layers, train_forward, bind_decode
    )
    return ModelBundle(
        name=name,
        model_cfg=model_cfg,
        params=params,
        tokenizer=tokenizer,
        processor=processor,
        train_forward=train_forward,
        bind_decode=bind_decode,
        hidden_size=model_cfg.text.d_model,
        n_layers=n_icv_layers,
        intervention_layers=icv_layer_ids,
        head_fn=lambda p, h, _t=model_cfg.text: _logits_from_hidden(_t, p, h),
    )


def build_draft_decode(bundle: ModelBundle, draft_layers: int):
    """A layer-truncated draft ``bind_decode`` for speculative decoding:
    the same weights, first ``draft_layers`` decoder layers (cross-attention
    groups truncated accordingly).  Returns ``(draft_params, bind_decode)``;
    the bind is pixel-normalize-wrapped like the bundle's own (the processor
    emits raw uint8)."""
    name = bundle.name
    mc = bundle.model_cfg
    k = draft_layers
    mean, std = (
        (SIGLIP_MEAN, SIGLIP_STD) if "idefics2" in name else (CLIP_MEAN, CLIP_STD)
    )

    def finish(params, bind):
        _, bind = _wrap_pixel_normalize(lambda *a: None, bind, mean, std)
        return params, bind

    def slice_layers(params, extra_keys=()):
        sub = dict(params)
        sub["layers"] = jax.tree.map(lambda x: x[:k], params["layers"])
        for key, rows in extra_keys:
            sub[key] = jax.tree.map(lambda x: x[:rows], params[key])
        return sub

    if "idefics2" in name:
        from .idefics2 import make_idefics2_forward_fns

        new_cfg = dataclasses.replace(
            mc, text=dataclasses.replace(mc.text, n_layers=k)
        )
        params = slice_layers(bundle.params)
        _, bind = make_idefics2_forward_fns(new_cfg, bundle.eos_token_id)
        return finish(params, bind)
    if "idefics" in name:
        from .idefics import make_idefics_forward_fns

        interval = mc.cross_layer_interval
        if k % interval:
            raise ValueError(
                f"draft_layers ({k}) must be a multiple of "
                f"cross_layer_interval ({interval})"
            )
        new_cfg = dataclasses.replace(
            mc, text=dataclasses.replace(mc.text, n_layers=k)
        )
        params = slice_layers(bundle.params, extra_keys=[("xattn", k // interval)])
        _, bind = make_idefics_forward_fns(new_cfg, bundle.eos_token_id)
        return finish(params, bind)
    if "flamingo" in name.lower():
        from .openflamingo import make_openflamingo_forward_fns

        every = mc.cross_attn_every_n_layers
        if k % every:
            raise ValueError(
                f"draft_layers ({k}) must be a multiple of "
                f"cross_attn_every_n_layers ({every})"
            )
        new_cfg = dataclasses.replace(
            mc, text=dataclasses.replace(mc.text, n_layers=k)
        )
        params = slice_layers(bundle.params, extra_keys=[("xattn", k // every)])
        _, bind = make_openflamingo_forward_fns(new_cfg, bundle.eos_token_id)
        return finish(params, bind)
    raise ValueError(f"no draft builder for {name}")


def _maybe_quantize(cfg, bundle: ModelBundle) -> ModelBundle:
    """``lmm.quantize=int8|int4``: weight-only quantization on the decoder
    (+xattn) stacks — int8 halves decode HBM traffic, int4 (group-wise
    scales, G=64, nibble-packed uint8) quarters it at ~10× the weight
    error; NOT bit-identical to bf16 (opt-in)."""
    q = "none"
    if cfg is not None:
        try:
            q = str(cfg.lmm.get("quantize", "none"))
        except Exception:
            q = "none"
    if q in ("int8", "int4"):
        from ..ops.quantize import quantize_layer_stack

        bundle.params["layers"] = quantize_layer_stack(
            bundle.params["layers"], mode=q
        )
        if "xattn" in bundle.params:
            bundle.params["xattn"] = quantize_layer_stack(
                bundle.params["xattn"], mode=q
            )
        logger.info("%s weight-only quantization applied to decoder stacks", q)
        head = False
        try:
            head = bool(cfg.lmm.get("quantize_head", False))
        except Exception:
            head = False
        if head:
            # the (D, V) head is re-streamed every decode step; per-vocab-
            # column int8 (~0.4% weight RMS error) regardless of the stack
            # mode — int4's group-scale grid is too coarse for the layer
            # that directly prices every token.  Tied-embedding models keep
            # the bf16 table (it also serves the input gather).
            if bundle.model_cfg.text.tie_embeddings:
                logger.warning(
                    "quantize_head ignored: tied embeddings (the table also "
                    "serves the input gather)"
                )
            else:
                from ..ops.quantize import quantize_array

                bundle.params["lm_head"] = quantize_array(
                    bundle.params["lm_head"]
                )
                logger.info("int8 weight-only quantization applied to lm_head")
        vision = False
        try:
            vision = bool(cfg.lmm.get("quantize_vision", False))
        except Exception:
            vision = False
        if vision:
            # vision tower + perceiver/connector: always int8 (per-channel;
            # the tower directly feeds every image token — int4's group
            # error is too coarse here), regardless of the stack mode.
            # Value: ~halves the bind-phase weight bytes AND, with
            # lmm.w8a8_prefill, puts the whole bind phase (ViT encode,
            # resampler, modality projection) on the int8-MXU path.
            # Embeddings (patch/pos/class/latents) and norms stay bf16.
            p = bundle.params
            p["vision"]["layers"] = quantize_layer_stack(p["vision"]["layers"])
            if "perceiver" in p:
                per = p["perceiver"]
                for key in ("blocks", "layers"):  # flamingo-style / idefics2
                    if key in per:
                        per[key] = quantize_layer_stack(per[key])
            if "connector" in p:
                p["connector"] = quantize_layer_stack(p["connector"])
            logger.info(
                "int8 weight-only quantization applied to vision tower"
                " (+perceiver/connector)"
            )
    return bundle


def _apply_attention_impl(cfg, model_cfg):
    """Honor ``lmm.attention_impl`` (xla|flash) and ``lmm.kv_cache``
    (bf16|int8) on the text decoder config."""
    try:
        impl = cfg.lmm.get("attention_impl")
    except Exception:
        impl = None
    if impl in ("xla", "flash") and model_cfg.text.attention_impl != impl:
        model_cfg = dataclasses.replace(
            model_cfg, text=dataclasses.replace(model_cfg.text, attention_impl=impl)
        )
    try:
        kvc = cfg.lmm.get("kv_cache")
    except Exception:
        kvc = None
    if kvc in ("bf16", "int8") and model_cfg.text.kv_cache_dtype != kvc:
        model_cfg = dataclasses.replace(
            model_cfg, text=dataclasses.replace(model_cfg.text, kv_cache_dtype=kvc)
        )
    # lmm.w8a8_prefill: int8-MXU activation quantization for prefill/bind
    # matmuls (only meaningful with lmm.quantize=int8 — a8 is a no-op on
    # unquantized leaves; see ops.int8_matmul.qdot)
    try:
        a8 = bool(cfg.lmm.get("w8a8_prefill", False))
    except Exception:
        a8 = False
    if a8 and not model_cfg.text.w8a8_prefill:
        model_cfg = dataclasses.replace(
            model_cfg, text=dataclasses.replace(model_cfg.text, w8a8_prefill=True)
        )
    # lmm.remat_mode (inner|both|outer|policy): train-forward remat
    # structure; see IdeficsConfig.remat_mode.  Only idefics carries the
    # knob today (the flagship train path).
    try:
        rm = cfg.lmm.get("remat_mode")
    except Exception:
        rm = None
    if rm in ("inner", "both", "outer", "policy") and hasattr(
        model_cfg, "remat_mode"
    ):
        model_cfg = dataclasses.replace(model_cfg, remat_mode=rm)
    return model_cfg


def build_model(cfg) -> ModelBundle:
    """``cfg`` is the composed top-level config (needs ``cfg.lmm``)."""
    name = str(cfg.lmm.name)
    if name == "idefics-9b":
        bundle = _idefics_bundle(cfg, _apply_attention_impl(cfg, IdeficsConfig.idefics_9b()), name)
    elif name == "tiny-idefics":
        bundle = _idefics_bundle(cfg, _apply_attention_impl(cfg, IdeficsConfig.tiny(dtype=jnp.float32)), name)
    elif name == "idefics2-8b-base":
        from .idefics2 import Idefics2Config

        bundle = _idefics2_bundle(cfg, _apply_attention_impl(cfg, Idefics2Config.idefics2_8b()), name)
    elif name == "tiny-idefics2":
        from .idefics2 import Idefics2Config

        bundle = _idefics2_bundle(cfg, _apply_attention_impl(cfg, Idefics2Config.tiny(dtype=jnp.float32)), name)
    elif "openflamingo" in name.lower() or name == "tiny-flamingo":
        from .openflamingo import OpenFlamingoConfig

        model_cfg = (
            OpenFlamingoConfig.tiny(dtype=jnp.float32)
            if name == "tiny-flamingo"
            else OpenFlamingoConfig.openflamingo_9b()
        )
        bundle = _openflamingo_bundle(cfg, _apply_attention_impl(cfg, model_cfg), name)
    else:
        raise ValueError(f"unknown lmm name: {name}")
    return _maybe_quantize(cfg, bundle)


def _load_torch_state_dict(path: Path) -> Optional[dict]:
    """torch.load a ``.pt``/``.bin`` and unwrap common containers."""
    try:
        import torch

        obj = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception as e:
        logger.warning("could not load %s: %s", path, e)
        return None
    if isinstance(obj, dict):
        for key in ("model_state_dict", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                return obj[key]
        return obj
    return None


def _openflamingo_bundle(cfg, model_cfg, name: str) -> ModelBundle:
    from .openflamingo import init_openflamingo_params, make_openflamingo_forward_fns

    # OpenFlamingo weights come in THREE pieces (reference: utils.py:51-67):
    # the MPT base (HF shards under lang_encoder_path), the flamingo deltas
    # (checkpoint.pt under flamingo_checkpoint_dir: perceiver + gated xattn +
    # resized wte), and the frozen CLIP ViT-L tower (open_clip weights).
    model_dir = None
    flamingo_dir = None
    if cfg is not None and "model_cpk_dir" in cfg:
        try:
            base = cfg.lmm.get("lang_encoder_path", cfg.lmm.get("model_name", name))
            model_dir = Path(str(cfg.model_cpk_dir)) / str(base)
        except Exception:
            model_dir = None
        try:
            fdir = cfg.lmm.get("flamingo_checkpoint_dir")
            if fdir:
                flamingo_dir = Path(str(fdir))
            elif cfg.lmm.get("hf_root"):
                flamingo_dir = Path(str(cfg.model_cpk_dir)) / str(cfg.lmm.hf_root)
        except Exception:
            flamingo_dir = None
    params = init_openflamingo_params(jax.random.PRNGKey(0), model_cfg)
    sd = _load_hf_weights(model_dir) if model_dir and model_dir.exists() else None
    if sd is not None:
        from .convert import convert_mpt

        mpt = convert_mpt(sd, model_cfg.text)
        params.update({k: mpt[k] for k in ("embed", "layers", "final_norm")})
        logger.info("loaded MPT backbone from %s", model_dir)
    else:
        logger.warning("openflamingo weights not found under %s — RANDOM INIT", model_dir)

    if flamingo_dir is not None and flamingo_dir.exists():
        from .convert import convert_openclip_vision, convert_openflamingo_checkpoint

        candidates = [flamingo_dir / "checkpoint.pt"] + sorted(
            p for p in flamingo_dir.glob("*.pt") if p.name != "checkpoint.pt"
        ) + sorted(flamingo_dir.glob("*.bin"))
        applied = []
        for path in candidates:
            if not path.exists():
                continue
            fsd = _load_torch_state_dict(path)
            if fsd is None:
                continue
            keys = {k[len("module."):] if k.startswith("module.") else k for k in fsd}
            if any(k.startswith(("perceiver.", "lang_encoder.")) for k in keys):
                params, updated = convert_openflamingo_checkpoint(
                    fsd, model_cfg, params
                )
                applied += updated
                logger.info("applied flamingo deltas %s from %s", updated, path)
            elif "visual.conv1.weight" in keys:  # standalone open_clip tower
                from .convert import _cast_tree

                params["vision"] = _cast_tree(
                    convert_openclip_vision(fsd, model_cfg.vision, "visual."),
                    model_cfg.vision.dtype,
                )
                applied.append("vision")
                logger.info("loaded open_clip ViT tower from %s", path)
        missing = {"perceiver", "xattn", "vision"} - set(applied)
        if missing:
            logger.warning(
                "flamingo checkpoint dir %s left %s at random init",
                flamingo_dir,
                sorted(missing),
            )
    elif flamingo_dir is not None:
        logger.warning(
            "flamingo_checkpoint_dir %s not found — perceiver/xattn/vision "
            "stay at random init",
            flamingo_dir,
        )

    tokenizer = _resolve_tokenizer(model_dir)
    processor = PromptProcessor(
        tokenizer,
        ImageTransform(model_cfg.vision.image_size, CLIP_MEAN, CLIP_STD),
        family="flamingo",
        max_length=_max_length(cfg, default=2048),  # MPT-7B context
    )
    if isinstance(tokenizer, WhitespaceTokenizer):
        model_cfg = dataclasses.replace(
            model_cfg, image_token_id=processor.image_token_id
        )
    train_forward, bind_decode = make_openflamingo_forward_fns(
        model_cfg, tokenizer.eos_token_id
    )
    train_forward, bind_decode = _wrap_pixel_normalize(
        train_forward, bind_decode, CLIP_MEAN, CLIP_STD
    )
    train_forward, bind_decode, n_icv_layers, icv_layer_ids = _wrap_intervention(
        cfg, model_cfg.text.n_layers, train_forward, bind_decode
    )
    return ModelBundle(
        name=name,
        model_cfg=model_cfg,
        params=params,
        tokenizer=tokenizer,
        processor=processor,
        train_forward=train_forward,
        bind_decode=bind_decode,
        hidden_size=model_cfg.text.d_model,
        n_layers=n_icv_layers,
        intervention_layers=icv_layer_ids,
        head_fn=lambda p, h: jnp.dot(
            h, p["embed"].T, preferred_element_type=jnp.float32
        ),
    )
