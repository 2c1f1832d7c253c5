#!/usr/bin/env python
"""Full-shape weight-conversion validation (no real checkpoints available).

VERDICT r1 #5 fallback: this environment ships no model checkpoints
(``MODEL_CPK_DIR`` unset, no weight files on disk), so real-weight loading
cannot be exercised.  What CAN be proven at full scale:

1. **Key/shape fidelity** — instantiate the real HF architecture on the meta
   device (zero RAM) to get the authentic full-scale state-dict naming +
   shapes, materialize empty tensors, run our converter, and compare every
   leaf against ``jax.eval_shape`` of our init.  Catches any mapping bug that
   the tiny-random parity tests could mask via size coincidences.
2. **Forward at full scale** (``--forward``) — run one bs=1/s=8 CPU forward
   through the converted 9B pytree; catches runtime shape/dtype breaks.
3. **Numerical parity at full scale** (``--parity``) — materialize the HF
   model with random weights, convert, and compare logits on a fixed input.
   This is the per-layer parity harness of SURVEY §7 run at REAL scale, just
   with random values (~70GB RAM, several minutes on CPU).

Usage:
    python tools/fullscale_convert_check.py idefics [--forward] [--parity]
    python tools/fullscale_convert_check.py idefics2 [--forward]

Reference recipes that would consume real weights: /root/reference/README.md:126-190.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _meta_state_shapes(model_ctor, hf_cfg) -> dict:
    """Authentic full-scale state-dict names + shapes, zero RAM."""
    import torch
    from accelerate import init_empty_weights

    with init_empty_weights():
        model = model_ctor(hf_cfg)
    return {k: tuple(v.shape) for k, v in model.state_dict().items()}


def _hf_idefics_cfg():
    from transformers.models.idefics.configuration_idefics import (
        IdeficsConfig as HFIdeficsConfig,
        IdeficsPerceiverConfig,
        IdeficsVisionConfig,
    )

    return HFIdeficsConfig(
        vocab_size=32000,
        additional_vocab_size=2,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=32,
        num_attention_heads=32,
        cross_layer_interval=4,
        qk_layer_norms=True,
        use_resampler=True,
        tie_word_embeddings=False,
        perceiver_config=IdeficsPerceiverConfig(
            resampler_depth=6,
            resampler_n_heads=16,
            resampler_head_dim=96,
            resampler_n_latents=64,
            qk_layer_norms_perceiver=True,
        ),
        vision_config=IdeficsVisionConfig(
            embed_dim=1280,
            image_size=224,
            patch_size=14,
            num_hidden_layers=32,
            num_attention_heads=16,
            intermediate_size=5120,
        ),
    )


def _hf_idefics2_cfg():
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2Config as HFConfig,
        Idefics2PerceiverConfig,
        Idefics2VisionConfig,
    )
    from transformers.models.mistral.configuration_mistral import MistralConfig

    return HFConfig(
        image_token_id=32001,
        tie_word_embeddings=False,
        vision_config=Idefics2VisionConfig(
            hidden_size=1152,
            intermediate_size=4304,
            num_hidden_layers=27,
            num_attention_heads=16,
            image_size=980,
            patch_size=14,
        ),
        perceiver_config=Idefics2PerceiverConfig(
            hidden_size=4096,
            resampler_n_latents=64,
            resampler_depth=3,
            resampler_n_heads=16,
            resampler_head_dim=96,
            num_key_value_heads=4,
        ),
        text_config=MistralConfig(
            vocab_size=32003,
            hidden_size=4096,
            intermediate_size=14336,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=8,
            rms_norm_eps=1e-5,
            tie_word_embeddings=False,
            sliding_window=None,
        ),
    )


def _hf_mpt_cfg(vocab_size: int):
    """MPT-7B (OpenFlamingo-9B's language encoder), with the vocab already
    resized the way the flamingo checkpoint's ``wte`` resize leaves it."""
    from transformers.models.mpt.configuration_mpt import MptConfig

    return MptConfig(
        vocab_size=vocab_size,
        d_model=4096,
        n_heads=32,
        n_layers=32,
        expansion_ratio=4,
        layer_norm_epsilon=1e-5,
        attn_config={"attn_impl": "eager", "alibi": True},
        no_bias=True,  # real MPT-7B is fully bias-free
    )


def _openflamingo_delta_shapes(cfg) -> dict:
    """Key/shape table of the released open_flamingo ``checkpoint.pt`` deltas
    (perceiver + gated xattn + resized wte) and the open_clip ViT-L tower, in
    the checkpoint's own naming (transcribed from the published
    open_flamingo/open_clip module structure; reference: utils.py:51-67)."""
    t, p, v = cfg.text, cfg.perceiver, cfg.vision
    inner_p = p.n_heads * p.head_dim
    inner_x = cfg.xattn_heads * cfg.xattn_head_dim
    de = p.d_model
    shapes = {
        "perceiver.latents": (p.n_latents, de),
        "perceiver.norm.weight": (de,),
        "perceiver.norm.bias": (de,),
        "lang_encoder.transformer.wte.weight": (t.vocab_size, t.d_model),
    }
    for i in range(p.n_layers):
        a, f = f"perceiver.layers.{i}.0.", f"perceiver.layers.{i}.1."
        shapes.update({
            a + "norm_media.weight": (de,),
            a + "norm_media.bias": (de,),
            a + "norm_latents.weight": (de,),
            a + "norm_latents.bias": (de,),
            a + "to_q.weight": (inner_p, de),
            a + "to_kv.weight": (2 * inner_p, de),
            a + "to_out.weight": (de, inner_p),
            f + "0.weight": (de,),
            f + "0.bias": (de,),
            f + "1.weight": (p.d_ff, de),
            f + "3.weight": (de, p.d_ff),
        })
    for i in range(t.n_layers // cfg.cross_attn_every_n_layers):
        x = f"lang_encoder.gated_cross_attn_layers.{i}."
        shapes.update({
            x + "attn.norm.weight": (t.d_model,),
            x + "attn.norm.bias": (t.d_model,),
            x + "attn.to_q.weight": (inner_x, t.d_model),
            x + "attn.to_kv.weight": (2 * inner_x, de),
            x + "attn.to_out.weight": (t.d_model, inner_x),
            x + "attn_gate": (1,),
            x + "ff.0.weight": (t.d_model,),
            x + "ff.0.bias": (t.d_model,),
            x + "ff.1.weight": (cfg.xattn_ff_mult * t.d_model, t.d_model),
            x + "ff.3.weight": (t.d_model, cfg.xattn_ff_mult * t.d_model),
            x + "ff_gate": (1,),
        })
    vp = "vision_encoder.visual."
    shapes.update({
        vp + "conv1.weight": (v.d_model, 3, v.patch_size, v.patch_size),
        vp + "class_embedding": (v.d_model,),
        vp + "positional_embedding": (
            (v.image_size // v.patch_size) ** 2 + 1, v.d_model,
        ),
        vp + "ln_pre.weight": (v.d_model,),
        vp + "ln_pre.bias": (v.d_model,),
        vp + "ln_post.weight": (v.d_model,),
        vp + "ln_post.bias": (v.d_model,),
    })
    for i in range(v.n_layers):
        r = vp + f"transformer.resblocks.{i}."
        shapes.update({
            r + "ln_1.weight": (v.d_model,),
            r + "ln_1.bias": (v.d_model,),
            r + "ln_2.weight": (v.d_model,),
            r + "ln_2.bias": (v.d_model,),
            r + "attn.in_proj_weight": (3 * v.d_model, v.d_model),
            r + "attn.in_proj_bias": (3 * v.d_model,),
            r + "attn.out_proj.weight": (v.d_model, v.d_model),
            r + "attn.out_proj.bias": (v.d_model,),
            r + "mlp.c_fc.weight": (v.d_ff, v.d_model),
            r + "mlp.c_fc.bias": (v.d_ff,),
            r + "mlp.c_proj.weight": (v.d_model, v.d_ff),
            r + "mlp.c_proj.bias": (v.d_model,),
        })
    return shapes


_DTYPE = None  # set from --dtype; None = each config's default (bf16)


def _our_cfg(family: str):
    import jax.numpy as jnp

    kw = {"dtype": _DTYPE} if _DTYPE is not None else {}
    if family == "idefics":
        from licv_vqa_tpu.models.idefics import IdeficsConfig

        return IdeficsConfig.idefics_9b(**kw)
    if family == "openflamingo":
        from licv_vqa_tpu.models.openflamingo import OpenFlamingoConfig

        return OpenFlamingoConfig.openflamingo_9b(**kw)
    from licv_vqa_tpu.models.idefics2 import Idefics2Config

    return Idefics2Config.idefics2_8b(**kw)


def _convert(family: str, sd):
    if family == "idefics":
        from licv_vqa_tpu.models.convert import convert_idefics

        return convert_idefics(sd, _our_cfg(family))
    if family == "openflamingo":
        # the registry's merge flow: init pytree, then overlay the
        # checkpoint.pt deltas + MPT base + open_clip tower.  A zeros
        # materialization of eval_shape stands in for the random init —
        # 9B threefry draws on CPU take tens of minutes and every leaf the
        # merge keeps (final_norm_b only) is zero-init anyway.
        import jax
        import jax.numpy as jnp

        from licv_vqa_tpu.models.convert import convert_openflamingo_checkpoint

        cfg = _our_cfg(family)
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), _expected_shapes(family)
        )
        params, updated = convert_openflamingo_checkpoint(sd, cfg, params)
        print(f"merge updated: {sorted(updated)}", flush=True)
        expect = {"embed", "layers", "perceiver", "vision", "xattn"}
        missing = expect - set(updated)
        if missing:
            sys.exit(f"merge path skipped components: {sorted(missing)}")
        return params
    from licv_vqa_tpu.models.convert import convert_idefics2

    return convert_idefics2(sd, _our_cfg(family))


def _expected_shapes(family: str):
    import jax

    cfg = _our_cfg(family)
    if family == "idefics":
        from licv_vqa_tpu.models.idefics import init_idefics_params

        init = lambda: init_idefics_params(jax.random.PRNGKey(0), cfg)
    elif family == "openflamingo":
        from licv_vqa_tpu.models.openflamingo import init_openflamingo_params

        init = lambda: init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    else:
        from licv_vqa_tpu.models.idefics2 import init_idefics2_params

        init = lambda: init_idefics2_params(jax.random.PRNGKey(0), cfg)
    return jax.eval_shape(init)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=["idefics", "idefics2", "openflamingo"])
    ap.add_argument("--forward", action="store_true")
    ap.add_argument("--parity", action="store_true")
    ap.add_argument(
        "--dtype", choices=["bf16", "f32"], default=None,
        help="override model dtype (f32 is much faster on XLA:CPU)",
    )
    ap.add_argument(
        "--hf-dir", default=None,
        help="REAL-WEIGHT mode: load the HF model from this directory "
             "(from_pretrained) instead of materializing random weights — "
             "the released-checkpoint parity run of the real-weight "
             "runbook (tools/real_weight_runbook.sh).  For openflamingo "
             "this is the MPT lang-encoder dir (gate-zero parity; the "
             "flamingo deltas stay zero).",
    )
    args = ap.parse_args()
    if args.hf_dir:
        args.parity = True

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    global _DTYPE
    if args.dtype:
        _DTYPE = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    import torch

    t0 = time.time()
    if args.family == "openflamingo":
        # no single HF ctor: MPT-7B base (HF, meta/materialized) + the
        # checkpoint.pt deltas + open_clip tower synthesized in the released
        # naming (``--parity`` compares the full gate-zero assembly against
        # HF MptForCausalLM: at init the gated xattn is exactly identity)
        from transformers import MptForCausalLM

        hf_cfg = _hf_mpt_cfg(_our_cfg(args.family).text.vocab_size)
        if args.parity:
            if args.hf_dir:
                print(f"loading HF MPT from {args.hf_dir}...", flush=True)
                model = MptForCausalLM.from_pretrained(
                    args.hf_dir, torch_dtype=torch.float32
                ).eval()
            else:
                torch.manual_seed(0)
                print("materializing HF MPT-7B at full scale...", flush=True)
                model = MptForCausalLM(hf_cfg).eval()
            sd = {
                "lang_encoder." + k: v for k, v in model.state_dict().items()
            }
        else:
            shapes = _meta_state_shapes(MptForCausalLM, hf_cfg)
            sd = {
                "lang_encoder." + k: np.zeros(s, np.float16)
                for k, s in shapes.items()
            }
        delta = _openflamingo_delta_shapes(_our_cfg(args.family))
        for k, s in delta.items():
            # module.-prefixed like the released DDP checkpoints
            sd.setdefault("module." + k, np.zeros(s, np.float16))
        if args.parity:
            # the released checkpoint's wte IS the (resized) trained
            # embedding; mirror the HF one so parity sees real values
            sd["module.lang_encoder.transformer.wte.weight"] = sd[
                "lang_encoder.transformer.wte.weight"
            ]
        print(f"state dict: {len(sd)} keys", flush=True)
    else:
        if args.family == "idefics":
            from transformers import IdeficsForVisionText2Text as Ctor

            hf_cfg = _hf_idefics_cfg()
        else:
            from transformers import Idefics2ForConditionalGeneration as Ctor

            hf_cfg = _hf_idefics2_cfg()

        if args.parity:
            if args.hf_dir:
                print(f"loading HF model from {args.hf_dir}...", flush=True)
                model = Ctor.from_pretrained(
                    args.hf_dir, torch_dtype=torch.float32
                ).eval()
            else:
                torch.manual_seed(0)
                print("materializing HF model at full scale (slow)...", flush=True)
                model = Ctor(hf_cfg).eval()
            sd = model.state_dict()
        else:
            shapes = _meta_state_shapes(Ctor, hf_cfg)
            print(f"meta state dict: {len(shapes)} keys", flush=True)
            # zeros (calloc — lazy and fast): we validate shapes/plumbing,
            # not values, and a --forward stays finite
            sd = {k: np.zeros(s, np.float16) for k, s in shapes.items()}
    print(f"state dict ready {time.time()-t0:.0f}s", flush=True)

    params = _convert(args.family, sd)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"converted: {n_params/1e9:.2f}B params in {time.time()-t0:.0f}s", flush=True)

    want = _expected_shapes(args.family)
    got_s = jax.tree.map(lambda x: tuple(x.shape), params)
    want_s = jax.tree.map(lambda x: tuple(x.shape), want)
    if got_s != want_s:
        import json

        def flat(t):
            out = {}
            for path, leaf in jax.tree_util.tree_flatten_with_path(t)[0]:
                out[jax.tree_util.keystr(path)] = leaf
            return out

        g, w = flat(got_s), flat(want_s)
        for k in sorted(set(g) | set(w)):
            if g.get(k) != w.get(k):
                print(f"  MISMATCH {k}: converted={g.get(k)} expected={w.get(k)}")
        sys.exit("shape mismatch")
    print("all leaf shapes match init structure", flush=True)

    if args.forward or args.parity:
        import jax.numpy as jnp

        cfg = _our_cfg(args.family)
        rng = np.random.default_rng(0)
        ids = rng.integers(3, 1000, size=(1, 8)).astype(np.int32)
        mask = np.ones_like(ids)
        if args.family == "idefics":
            from licv_vqa_tpu.models.idefics import (
                encode_images,
                idefics_forward,
                image_attention_onehot,
            )

            ids[:, 1] = cfg.image_token_id
            pixels = rng.normal(size=(1, 1, 224, 224, 3)).astype(np.float32)
            latents = encode_images(cfg, params, jnp.asarray(pixels))
            onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
            logits, _ = idefics_forward(
                cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
            )
        elif args.family == "openflamingo":
            from licv_vqa_tpu.models.idefics import image_attention_onehot
            from licv_vqa_tpu.models.openflamingo import (
                encode_media,
                openflamingo_forward,
            )

            ids[:, 1] = cfg.image_token_id
            pixels = rng.normal(size=(1, 1, 224, 224, 3)).astype(np.float32)
            latents = encode_media(cfg, params, jnp.asarray(pixels))
            onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
            logits, _ = openflamingo_forward(
                cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
            )
        else:
            from licv_vqa_tpu.models.idefics2 import encode_images2, idefics2_forward

            ids[:, 2 : 2 + cfg.image_seq_len] = cfg.image_token_id
            pixels = rng.normal(size=(1, 1, 378, 378, 3)).astype(np.float32)
            pmask = np.ones((1, 1, 378, 378), np.int64)
            latents = encode_images2(
                cfg, params, jnp.asarray(pixels), pixel_attention_mask=jnp.asarray(pmask)
            )
            logits, _ = idefics2_forward(
                cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents
            )
        logits = np.asarray(logits)
        print(
            f"forward ok: logits {logits.shape}, finite={np.isfinite(logits).all()}"
            f" ({time.time()-t0:.0f}s)",
            flush=True,
        )
        if args.parity:
            with torch.no_grad():
                if args.family == "idefics":
                    kw = dict(
                        pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
                        image_attention_mask=torch.tensor(
                            np.asarray(onehot)
                        ).long(),
                    )
                elif args.family == "openflamingo":
                    # HF MptForCausalLM is text-only: gate-zero makes the
                    # flamingo assembly exactly the MPT backbone
                    kw = {}
                else:
                    kw = dict(
                        pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
                        pixel_attention_mask=torch.tensor(pmask),
                    )
                want = (
                    model(
                        input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(mask),
                        **kw,
                    )
                    .logits.float()
                    .numpy()
                )
            err = np.max(np.abs(logits - want))
            print(f"full-scale logit parity: max|Δ|={err:.4e}", flush=True)
            tol = 2e-2 if _our_cfg(args.family).text.dtype == jnp.bfloat16 else 1e-3
            if err > tol:
                sys.exit(f"parity failure (tol {tol})")
    print("OK", flush=True)


if __name__ == "__main__":
    main()
