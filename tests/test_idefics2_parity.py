"""Parity: our JAX Idefics2 vs tiny-random HF Idefics2ForConditionalGeneration.

Covers the SigLIP tower, SwiGLU connector + RMSNorm GQA perceiver, inline
image-token splicing, Mistral GQA backbone, and the MLP-sublayer ICV
injection site (layer_format '...layers.<L>.mlp', reference
config/lmm/idefics2-8B-base.yaml:8).
"""

import jax.numpy as jnp
import numpy as np
import torch

from licv_vqa_tpu.models.convert import convert_idefics2, hf_state_dict
from licv_vqa_tpu.models.idefics2 import (
    Idefics2Config,
    encode_images2,
    idefics2_forward,
)

EOS = 2
IMG_SEQ = 4


def _tiny_hf_idefics2():
    from transformers import Idefics2ForConditionalGeneration
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2Config as HFConfig,
        Idefics2PerceiverConfig,
        Idefics2VisionConfig,
    )
    from transformers.models.mistral.configuration_mistral import MistralConfig

    cfg = HFConfig(
        image_token_id=118,
        vision_config=Idefics2VisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            image_size=28,
            patch_size=14,
            hidden_act="gelu_pytorch_tanh",
        ),
        perceiver_config=Idefics2PerceiverConfig(
            hidden_size=64,
            resampler_n_latents=IMG_SEQ,
            resampler_depth=2,
            resampler_n_heads=2,
            resampler_head_dim=16,
            num_key_value_heads=1,
            hidden_act="silu",
        ),
        text_config=MistralConfig(
            vocab_size=120,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=4,
            num_attention_heads=4,
            num_key_value_heads=2,
            rms_norm_eps=1e-5,
            max_position_embeddings=256,
            tie_word_embeddings=False,
            sliding_window=None,
        ),
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return Idefics2ForConditionalGeneration(cfg).eval()


def _inputs(rng, bs=2, s=16, n_img=1):
    cfg = Idefics2Config.tiny()
    ids = rng.integers(3, 110, size=(bs, s)).astype(np.int64)
    # one image: 64→4 inline tokens at positions 2..5
    ids[:, 2 : 2 + IMG_SEQ] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(bs, n_img, 28, 28, 3)).astype(np.float32)
    return cfg, ids, mask, pixels


def test_idefics2_logits_parity():
    hf = _tiny_hf_idefics2()
    cfg = Idefics2Config.tiny()
    params = convert_idefics2(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    cfg, ids, mask, pixels = _inputs(rng)

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
        ).logits.numpy()

    latents = encode_images2(cfg, params, jnp.asarray(pixels))
    got, _ = idefics2_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=4e-4, atol=4e-4)


def test_idefics2_mlp_site_icv_matches_hook_semantics():
    hf = _tiny_hf_idefics2()
    cfg = Idefics2Config.tiny()
    params = convert_idefics2(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    cfg, ids, mask, pixels = _inputs(rng)
    icv = rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)).astype(np.float32) * 0.1

    handles = []

    def mk(l):
        shift = torch.tensor(icv[l])[None, None, :]

        def hook(_m, _i, output):
            h = output[0] if isinstance(output, tuple) else output
            s = h + shift
            out = s / s.norm(dim=-1, keepdim=True) * h.norm(dim=-1, keepdim=True)
            return ((out,) + tuple(output[1:])) if isinstance(output, tuple) else out

        return hook

    # hook the MLP SUBLAYER, exactly like the reference layer_format
    for l, layer in enumerate(hf.model.text_model.layers):
        handles.append(layer.mlp.register_forward_hook(mk(l)))
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
        ).logits.numpy()
    for h in handles:
        h.remove()

    latents = encode_images2(cfg, params, jnp.asarray(pixels))
    got, _ = idefics2_forward(
        cfg,
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        latents,
        icv_scaled=jnp.asarray(icv),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_idefics2_greedy_decode_matches_hf():
    from licv_vqa_tpu.infer import greedy_generate
    from licv_vqa_tpu.models.idefics2 import make_idefics2_forward_fns

    hf = _tiny_hf_idefics2()
    hf.generation_config.pad_token_id = 0
    hf.generation_config.eos_token_id = EOS
    cfg = Idefics2Config.tiny()
    params = convert_idefics2(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    _, ids, mask, pixels = _inputs(rng)

    with torch.no_grad():
        want = hf.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
            max_new_tokens=5,
            do_sample=False,
            num_beams=1,
        ).numpy()

    _, bind = make_idefics2_forward_fns(cfg, EOS)
    fwd = bind(
        params, jnp.asarray(pixels), jnp.ones((2, 1), bool), jnp.asarray(ids), None, 32
    )
    got = np.asarray(
        greedy_generate(
            fwd, jnp.asarray(ids), jnp.asarray(mask),
            max_new_tokens=5, eos_token_id=EOS, pad_token_id=0,
        )
    )
    s = ids.shape[1]
    n = want.shape[1] - s
    for b in range(2):
        np.testing.assert_array_equal(got[b, s : s + n][: n], want[b, s:])


def test_idefics2_multi_image_splicing_parity():
    """Two images per prompt: latents must splice in document order."""
    hf = _tiny_hf_idefics2()
    cfg = Idefics2Config.tiny()
    params = convert_idefics2(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(42)
    bs, s, n_img = 2, 20, 2
    ids = rng.integers(3, 110, size=(bs, s)).astype(np.int64)
    ids[:, 1 : 1 + IMG_SEQ] = cfg.image_token_id
    ids[:, 9 : 9 + IMG_SEQ] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(bs, n_img, 28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
        ).logits.numpy()
    latents = encode_images2(cfg, params, jnp.asarray(pixels))
    got, _ = idefics2_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_idefics2_navit_variable_resolution_parity():
    """NaViT variable resolution (VERDICT r1 #8): non-square, batch-padded
    images with a pixel_attention_mask — bucketized position ids + masked
    ViT/perceiver attention must match HF exactly (reference wraps the HF
    processor that emits these grids, utils.py:68-78)."""
    import dataclasses

    from transformers import Idefics2ForConditionalGeneration
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2Config as HFConfig,
        Idefics2PerceiverConfig,
        Idefics2VisionConfig,
    )
    from transformers.models.mistral.configuration_mistral import MistralConfig

    # position table side 4 (image_size 56) — inputs are SMALLER and
    # non-square, so the buckets are non-trivial
    hf_cfg = HFConfig(
        image_token_id=118,
        vision_config=Idefics2VisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=56, patch_size=14,
            hidden_act="gelu_pytorch_tanh",
        ),
        perceiver_config=Idefics2PerceiverConfig(
            hidden_size=64, resampler_n_latents=IMG_SEQ, resampler_depth=2,
            resampler_n_heads=2, resampler_head_dim=16, num_key_value_heads=1,
            hidden_act="silu",
        ),
        text_config=MistralConfig(
            vocab_size=120, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, max_position_embeddings=256,
            tie_word_embeddings=False, sliding_window=None,
        ),
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    hf = Idefics2ForConditionalGeneration(hf_cfg).eval()

    cfg = Idefics2Config.tiny()
    cfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision, image_size=56)
    )
    params = convert_idefics2(hf_state_dict(hf), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    bs, s = 2, 16
    ids = rng.integers(3, 110, size=(bs, s)).astype(np.int64)
    ids[:, 2 : 2 + IMG_SEQ] = cfg.image_token_id
    mask = np.ones_like(ids)
    # batch padded to 42x28 (grid 3x2); sample 0 real 42x28, sample 1 real
    # 28x14 (grid 2x1) with bottom/right zero padding — the HF processor's
    # layout
    pixels = rng.normal(size=(bs, 1, 42, 28, 3)).astype(np.float32)
    pmask = np.zeros((bs, 1, 42, 28), np.int64)
    pmask[0, 0, :, :] = 1
    pmask[1, 0, :28, :14] = 1
    pixels[1, 0][pmask[1, 0] == 0] = 0.0

    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
            pixel_attention_mask=torch.tensor(pmask),
        ).logits.numpy()

    latents = encode_images2(
        cfg, params, jnp.asarray(pixels), pixel_attention_mask=jnp.asarray(pmask)
    )
    got, _ = idefics2_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_idefics2_navit_generate_end_to_end():
    """Variable-resolution generate through the full bundle path: processor
    (NaViT resize + pad + pixel_attention_mask) → make_generate_fn →
    bind_decode(pixel_attention_mask=...) → greedy decode; masked-padding
    results must equal running each image unpadded."""
    import dataclasses

    import jax

    from licv_vqa_tpu.data.processor import ImageTransform, PromptProcessor
    from licv_vqa_tpu.data.tokenizer import WhitespaceTokenizer
    from licv_vqa_tpu.infer.runner import generate_answers, make_generate_fn
    from licv_vqa_tpu.models.idefics2 import (
        init_idefics2_params,
        make_idefics2_forward_fns,
    )
    from licv_vqa_tpu.models.registry import ModelBundle

    cfg = Idefics2Config.tiny()
    cfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision, image_size=56)
    )
    params = init_idefics2_params(jax.random.PRNGKey(0), cfg)
    tok = WhitespaceTokenizer()
    proc = PromptProcessor(
        tok,
        ImageTransform(56, variable_resolution=True, min_edge=28, max_edge=56),
        family="idefics2",
        image_seq_len=cfg.image_seq_len,
    )
    cfg = dataclasses.replace(cfg, image_token_id=proc.image_token_id)
    tf, bind = make_idefics2_forward_fns(cfg, tok.eos_token_id)
    bundle = ModelBundle(
        name="idefics2-tiny-navit", model_cfg=cfg, params=params,
        tokenizer=tok, processor=proc, train_forward=tf, bind_decode=bind,
        hidden_size=cfg.text.d_model, n_layers=cfg.text.n_layers,
    )
    gen_fn = make_generate_fn(bundle, {"max_new_tokens": 4, "num_beams": 1})
    rng = np.random.default_rng(0)
    img_tall = (rng.integers(0, 255, size=(56, 28, 3))).astype(np.uint8)
    img_wide = (rng.integers(0, 255, size=(28, 56, 3))).astype(np.uint8)
    # batched (padded to common grid) ...
    answers = generate_answers(
        bundle, gen_fn,
        [[img_tall, "what is this"], [img_wide, "and this"]], None,
    )
    assert len(answers) == 2
    # ... must match each image generated ALONE (no cross-image padding)
    solo = [
        generate_answers(bundle, gen_fn, [[img_tall, "what is this"]], None)[0],
        generate_answers(bundle, gen_fn, [[img_wide, "and this"]], None)[0],
    ]
    assert answers == solo, (answers, solo)


def test_navit_bucketize_matches_torch_exactly():
    """Our floor-based bucketization == HF's torch.bucketize(right=True) on
    eps-scaled fractional coords, INCLUDING grids that hit exact bucket
    boundaries (nb dividing the table side, e.g. the 980px long edge → nb=70
    = table side).  Pins the float32 rounding behavior both sides rely on."""
    import torch

    from licv_vqa_tpu.models.vision import navit_position_ids

    side = 70
    boundaries = torch.arange(1 / side, 1.0, 1 / side)
    for nb_h, nb_w in [(70, 70), (35, 70), (45, 27), (7, 10), (64, 69), (28, 50)]:
        idx_h = torch.arange(nb_h, dtype=torch.float32)
        idx_w = torch.arange(nb_w, dtype=torch.float32)
        bh = torch.bucketize(idx_h / nb_h * (1 - 1e-6), boundaries, right=True)
        bw = torch.bucketize(idx_w / nb_w * (1 - 1e-6), boundaries, right=True)
        want = (bh[:, None] * side + bw).flatten().numpy()

        mask = np.zeros((1, 70, 70), bool)
        mask[0, :nb_h, :nb_w] = True
        pos = np.asarray(navit_position_ids(70, 70, side, jnp.asarray(mask)))
        got = pos[0].reshape(70, 70)[:nb_h, :nb_w].flatten()
        np.testing.assert_array_equal(got, want, err_msg=f"nb=({nb_h},{nb_w})")
