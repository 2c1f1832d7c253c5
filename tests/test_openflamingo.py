"""OpenFlamingo family tests: MPT backbone numerical parity vs HF
MptForCausalLM (ALiBi, fused QKV, bias-free LN) + structural/decode tests for
the flamingo assembly (open_flamingo is not installed — SURVEY.md notes the
model is config-present but absent from the reference's README recipes)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from licv_vqa_tpu.models import DecoderConfig, causal_lm_forward
from licv_vqa_tpu.models.convert import convert_mpt, hf_state_dict
from licv_vqa_tpu.models.openflamingo import (
    OpenFlamingoConfig,
    encode_media,
    init_openflamingo_params,
    make_openflamingo_forward_fns,
    openflamingo_forward,
)
from licv_vqa_tpu.models.idefics import image_attention_onehot

V, D, LAYERS, HEADS = 97, 64, 4, 4


def _tiny_hf_mpt():
    from transformers import MptForCausalLM
    from transformers.models.mpt.configuration_mpt import MptConfig

    cfg = MptConfig(
        vocab_size=V,
        d_model=D,
        n_heads=HEADS,
        n_layers=LAYERS,
        expansion_ratio=4,
        layer_norm_epsilon=1e-5,
        attn_config={"attn_impl": "eager", "alibi": True},
    )
    torch.manual_seed(0)
    return MptForCausalLM(cfg).eval()


def _mpt_cfg():
    return DecoderConfig(
        vocab_size=V,
        d_model=D,
        n_layers=LAYERS,
        n_heads=HEADS,
        n_kv_heads=HEADS,
        d_ff=4 * D,
        norm_eps=1e-5,
        positional="alibi",
        norm_type="layernorm",
        activation="gelu",
        tie_embeddings=True,
        dtype=jnp.float32,
    )


def test_mpt_logits_parity():
    hf = _tiny_hf_mpt()
    cfg = _mpt_cfg()
    params = convert_mpt(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, V, size=(2, 11)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 8:] = 0
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    got, _ = causal_lm_forward(cfg, params, jnp.asarray(ids), jnp.asarray(mask))
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], want[valid], rtol=3e-4, atol=3e-4)


def test_flamingo_forward_and_gates():
    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 120, size=(2, 10)).astype(np.int32)
    ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(2, 1, 28, 28, 3)).astype(np.float32)

    latents = encode_media(cfg, params, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
    logits, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
    )
    assert logits.shape == (2, 10, cfg.text.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))

    # gates init at 0 → cross-attention must be a no-op vs a text-only pass
    text_cfg = cfg.text
    text_params = {
        "embed": params["embed"],
        "layers": params["layers"],
        "final_norm": params["final_norm"],
        "final_norm_b": params["final_norm_b"],
    }
    text_logits, _ = causal_lm_forward(
        text_cfg, text_params, jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(text_logits), rtol=1e-4, atol=1e-4
    )

    # open the gates → output must change
    params["xattn"]["attn_gate"] = jnp.ones_like(params["xattn"]["attn_gate"])
    latents2 = encode_media(cfg, params, jnp.asarray(pixels))
    steered, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents2, onehot
    )
    assert not np.allclose(np.asarray(steered), np.asarray(logits), atol=1e-4)


def test_flamingo_decode_cache_consistency():
    from licv_vqa_tpu.infer import greedy_generate

    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    params["xattn"]["attn_gate"] = jnp.full_like(params["xattn"]["attn_gate"], 0.5)
    rng = np.random.default_rng(2)
    ids = rng.integers(3, 120, size=(2, 8)).astype(np.int32)
    ids[:, 0] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(2, 1, 28, 28, 3)).astype(np.float32)

    _, bind = make_openflamingo_forward_fns(cfg, eos_token_id=2)
    fwd = bind(params, jnp.asarray(pixels), jnp.ones((2, 1), bool), jnp.asarray(ids), None, 24)
    out = greedy_generate(
        fwd, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=4, eos_token_id=-1, pad_token_id=0,
    )
    # decode-with-cache must match argmax of the full uncached forward
    out = np.asarray(out)
    latents = encode_media(cfg, params, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(out[:, :9]), cfg.image_token_id, 2, 1)
    full, _ = openflamingo_forward(
        cfg, params, jnp.asarray(out[:, :9]), jnp.ones((2, 9), jnp.int32),
        latents, onehot,
    )
    next_tok = np.argmax(np.asarray(full[:, 8]), axis=-1)
    np.testing.assert_array_equal(next_tok, out[:, 9])


def test_icv_injection_flamingo():
    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 120, size=(1, 6)).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 1, 28, 28, 3)).astype(np.float32)
    latents = encode_media(cfg, params, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
    base, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
    )
    icv = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    steered, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot,
        icv_scaled=icv,
    )
    assert not np.allclose(np.asarray(base), np.asarray(steered), atol=1e-3)
