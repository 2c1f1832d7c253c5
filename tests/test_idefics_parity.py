"""Numerical parity: our JAX Idefics vs tiny-random HF IdeficsForVisionText2Text.

Exercises the full multimodal stack: ViT tower, perceiver resampler, gated
cross-attention every N layers, qk layernorms, decoupled embed/lm_head, and
the most-recent-image cross-attention mask.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from licv_vqa_tpu.models.convert import convert_idefics, hf_state_dict
from licv_vqa_tpu.models.idefics import (
    IdeficsConfig,
    encode_images,
    idefics_forward,
    image_attention_onehot,
)

EOS = 2


def _tiny_hf_idefics():
    from transformers.models.idefics.configuration_idefics import (
        IdeficsConfig as HFConfig,
        IdeficsPerceiverConfig,
        IdeficsVisionConfig,
    )
    from transformers import IdeficsForVisionText2Text

    cfg = HFConfig(
        vocab_size=108,
        additional_vocab_size=2,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        cross_layer_interval=2,
        qk_layer_norms=True,
        use_resampler=True,
        alpha_type="float",
        alpha_initializer="ones",
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        freeze_text_layers=False,
        freeze_vision_layers=False,
        freeze_lm_head=False,
        vision_config=IdeficsVisionConfig(
            embed_dim=32,
            hidden_size=32,
            image_size=28,
            patch_size=14,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            hidden_act="gelu",
        ),
        perceiver_config=IdeficsPerceiverConfig(
            use_resampler=True,
            resampler_n_latents=4,
            resampler_depth=2,
            resampler_n_heads=2,
            resampler_head_dim=16,
            qk_layer_norms_perceiver=True,
        ),
        attn_implementation="eager",
        pad_token_id=0,
        eos_token_id=EOS,
    )
    torch.manual_seed(0)
    return IdeficsForVisionText2Text(cfg).eval()


def _inputs(rng, bs=2, s=12, n_img=2):
    cfg = IdeficsConfig.tiny()
    img_tok = cfg.image_token_id  # 108 = first additional token
    ids = rng.integers(3, 100, size=(bs, s)).astype(np.int64)
    # place image tokens: two images per row at fixed-ish spots
    ids[:, 1] = img_tok
    ids[:, 6] = img_tok
    mask = np.ones_like(ids)
    mask[1, :2] = 0  # left padding on row 1 (before first image: move imgs)
    ids[1, 0] = 0
    ids[1, 1] = 0
    ids[1, 2] = img_tok
    pixels = rng.normal(size=(bs, n_img, 28, 28, 3)).astype(np.float32)
    return cfg, ids, mask, pixels


def test_idefics_logits_parity():
    hf = _tiny_hf_idefics()
    cfg = IdeficsConfig.tiny()
    params = convert_idefics(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    cfg, ids, mask, pixels = _inputs(rng)
    bs, s = ids.shape
    n_img = pixels.shape[1]

    onehot = np.asarray(
        image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, EOS, n_img)
    )
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
            image_attention_mask=torch.tensor(onehot).long(),
        ).logits.numpy()

    latents = encode_images(cfg, params, jnp.asarray(pixels))
    got, _ = idefics_forward(
        cfg,
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        latents,
        jnp.asarray(onehot),
    )
    got = np.asarray(got)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=3e-4, atol=3e-4)


def test_idefics_image_mask_most_recent_semantics():
    cfg = IdeficsConfig.tiny()
    img = cfg.image_token_id
    ids = np.array([[5, img, 7, 8, img, 9, EOS, 4]])
    oh = np.asarray(image_attention_onehot(jnp.asarray(ids), img, EOS, 2))
    # token 0: before any image → no attention
    assert oh[0, 0].sum() == 0
    # tokens 1-3 → image 0; tokens 4-6 → image 1
    np.testing.assert_array_equal(oh[0, 1], [1, 0])
    np.testing.assert_array_equal(oh[0, 3], [1, 0])
    np.testing.assert_array_equal(oh[0, 4], [0, 1])
    np.testing.assert_array_equal(oh[0, 6], [0, 1])
    # token after EOS → none
    assert oh[0, 7].sum() == 0


def test_idefics_icv_injection_matches_hook_semantics():
    """In-scan ICV == reference hook math on HF decoder-layer outputs
    (layer_format 'model.model.layers.<L>', reference config/lmm/idefics-9B.yaml)."""
    hf = _tiny_hf_idefics()
    cfg = IdeficsConfig.tiny()
    params = convert_idefics(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    _, ids, mask, pixels = _inputs(rng)
    n_img = pixels.shape[1]
    icv = rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)).astype(np.float32) * 0.1

    handles = []

    def mk(l):
        shift = torch.tensor(icv[l])[None, None, :]

        def hook(_m, _i, output):
            h = output[0] if isinstance(output, tuple) else output
            sft = h + shift
            out = sft / sft.norm(dim=-1, keepdim=True) * h.norm(dim=-1, keepdim=True)
            return ((out,) + tuple(output[1:])) if isinstance(output, tuple) else out

        return hook

    for l, layer in enumerate(hf.model.layers):
        handles.append(layer.register_forward_hook(mk(l)))
    onehot = np.asarray(
        image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, EOS, n_img)
    )
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
            image_attention_mask=torch.tensor(onehot).long(),
        ).logits.numpy()
    for h in handles:
        h.remove()

    latents = encode_images(cfg, params, jnp.asarray(pixels))
    got, _ = idefics_forward(
        cfg,
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        latents,
        jnp.asarray(onehot),
        icv_scaled=jnp.asarray(icv),
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], want[valid], rtol=5e-4, atol=5e-4
    )


def test_idefics_greedy_decode_matches_hf_generate():
    from licv_vqa_tpu.infer import greedy_generate
    from licv_vqa_tpu.models.idefics import make_idefics_forward_fns

    hf = _tiny_hf_idefics()
    hf.generation_config.pad_token_id = 0
    hf.generation_config.eos_token_id = EOS
    cfg = IdeficsConfig.tiny()
    params = convert_idefics(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    # left-padded prompts (generation convention)
    _, ids, mask, pixels = _inputs(rng)
    ids[0, :2] = [0, 0]
    ids[0, 2] = cfg.image_token_id
    mask[0, :2] = 0
    onehot = np.asarray(
        image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, EOS, 2)
    )
    with torch.no_grad():
        want = hf.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 1, 4, 2, 3),
            image_attention_mask=torch.tensor(onehot).long(),
            max_new_tokens=5,
            do_sample=False,
            num_beams=1,
        ).numpy()

    _, bind_images = make_idefics_forward_fns(cfg, EOS)
    pixel_valid = jnp.ones((2, 2), bool)
    fwd = bind_images(
        params, jnp.asarray(pixels), pixel_valid, jnp.asarray(ids), None, max_len=32
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
        w = want[b, s:]
        g = got[b, s : s + n]
        np.testing.assert_array_equal(g[: len(w)], w)


# NOTE: a combined ICV+beam-3 parity test against HF is not possible here:
# transformers' own Idefics beam path crashes expanding image_attention_mask
# (RuntimeError reshape in generation/utils.py). The composition is covered
# by greedy==HF (multimodal), beam-3==HF (text machinery), ICV==hooks (logits).


def test_idefics_image_mask_matches_hf_packed_loop():
    """EOS-packed multi-episode sequences: compare against HF's own
    image_attention_mask_for_packed_input_ids_pt loop (seen_eod RESETS at a
    new <image> token, so the second episode attends its image)."""
    from transformers.models.idefics.processing_idefics import (
        image_attention_mask_for_packed_input_ids_pt,
    )

    cfg = IdeficsConfig.tiny()
    img = cfg.image_token_id

    class _Tok:
        eos_token_id = EOS

        def convert_tokens_to_ids(self, t):
            return img

    cases = [
        [5, img, 7, 8, EOS, img, 9, 4],        # reset after EOS
        [img, 7, EOS, 8, 9],                   # no reset: tail attends none
        [5, 6, EOS, img, 7, EOS, img, 8],      # two resets
        [EOS, img, 7],                         # leading EOS
        [5, img, EOS, EOS, img, 7, 8],         # consecutive EOS
    ]
    for ids_list in cases:
        ids = np.array([ids_list])
        n_img = int((ids == img).sum())
        hf_mask, _ = image_attention_mask_for_packed_input_ids_pt(
            torch.tensor(ids), _Tok()
        )
        oh = np.asarray(
            image_attention_onehot(jnp.asarray(ids), img, EOS, max(n_img, 1))
        )
        got = np.where(oh.sum(-1) > 0, oh.argmax(-1), -1)
        np.testing.assert_array_equal(got, hf_mask.numpy(), err_msg=str(ids_list))
