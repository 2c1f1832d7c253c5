"""Numerical parity of the scan decoder vs tiny-random HF models (torch CPU).

This is the reference's own debug idiom scaled into a real test: the authors
smoke-tested against tiny-random checkpoints (reference: config/train.yaml:15).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from licv_vqa_tpu.models import DecoderConfig, causal_lm_forward
from licv_vqa_tpu.models.convert import convert_llama, hf_state_dict

V, D, LAYERS, HEADS, FF = 99, 64, 4, 4, 128


def _tiny_hf_llama(n_kv_heads=4):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=V,
        hidden_size=D,
        intermediate_size=FF,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        num_key_value_heads=n_kv_heads,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval()


def _our_cfg(n_kv_heads=4):
    return DecoderConfig(
        vocab_size=V,
        d_model=D,
        n_layers=LAYERS,
        n_heads=HEADS,
        n_kv_heads=n_kv_heads,
        d_ff=FF,
        dtype=jnp.float32,
    )


@pytest.mark.parametrize("n_kv", [4, 2])
def test_llama_logits_parity(n_kv):
    hf = _tiny_hf_llama(n_kv)
    cfg = _our_cfg(n_kv)
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, V, size=(2, 10)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 7:] = 0  # right padding
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    got, _ = causal_lm_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask)
    )
    got = np.asarray(got)
    # compare only non-pad positions (HF computes garbage at pads too but
    # with a different mask convention)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)


def test_left_padding_parity():
    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, V, size=(2, 12)).astype(np.int64)
    mask = np.ones_like(ids)
    ids[0, :3] = 0
    mask[0, :3] = 0  # left padding
    pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(pos),
        ).logits.numpy()
    got, _ = causal_lm_forward(cfg, params, jnp.asarray(ids), jnp.asarray(mask))
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], want[valid], rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward():
    from licv_vqa_tpu.models import init_kv_cache
    from licv_vqa_tpu.models.decoder import _positions_from_mask

    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, V, size=(2, 8)).astype(np.int64)
    mask = np.ones_like(ids)

    # full forward over 8 tokens
    full, _ = causal_lm_forward(cfg, params, jnp.asarray(ids), jnp.asarray(mask))

    # prefill 5 then decode 3 one at a time through the cache
    cache = init_kv_cache(cfg, 2, 16)
    pos = _positions_from_mask(jnp.asarray(mask))
    lg, cache = causal_lm_forward(
        cfg,
        params,
        jnp.asarray(ids[:, :5]),
        jnp.asarray(mask[:, :5]),
        cache=cache,
        positions=pos[:, :5],
    )
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(full[:, :5]), rtol=2e-4, atol=2e-4
    )
    for t in range(5, 8):
        lg, cache = causal_lm_forward(
            cfg,
            params,
            jnp.asarray(ids[:, t : t + 1]),
            jnp.asarray(mask[:, t : t + 1]),
            cache=cache,
            positions=pos[:, t : t + 1],
        )
        np.testing.assert_allclose(
            np.asarray(lg[:, 0]), np.asarray(full[:, t]), rtol=2e-4, atol=2e-4
        )


def test_icv_injection_changes_logits_and_none_is_identity():
    cfg = _our_cfg()
    hf = _tiny_hf_llama()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, V, size=(1, 6)))
    mask = jnp.ones_like(ids)
    base, _ = causal_lm_forward(cfg, params, ids, mask)
    icv = jnp.asarray(rng.normal(size=(LAYERS, D)).astype(np.float32)) * 0.5
    steered, _ = causal_lm_forward(cfg, params, ids, mask, icv_scaled=icv)
    assert not np.allclose(np.asarray(base), np.asarray(steered), atol=1e-3)
    # zero icv → renorm((h+0)) == h exactly
    zero, _ = causal_lm_forward(
        cfg, params, ids, mask, icv_scaled=jnp.zeros((LAYERS, D))
    )
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base), rtol=1e-4, atol=1e-4)


def test_icv_injection_matches_hook_semantics():
    """Our in-scan injection == reference hook math applied to HF layer outputs.

    Uses torch forward hooks on the tiny HF model implementing the exact
    reference edit (reference: icv_intervention.py:61-86), then compares
    final logits with our native path.
    """
    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    icv = rng.normal(size=(LAYERS, D)).astype(np.float32) * 0.1
    ids = rng.integers(1, V, size=(2, 7)).astype(np.int64)
    mask = np.ones_like(ids)

    handles = []

    def make_hook(l):
        shift = torch.tensor(icv[l])[None, None, :]

        def hook(_mod, _inp, output):
            h = output[0] if isinstance(output, tuple) else output
            s = h + shift
            out = s / s.norm(dim=-1, keepdim=True) * h.norm(dim=-1, keepdim=True)
            if isinstance(output, tuple):
                return (out,) + tuple(output[1:])
            return out

        return hook

    for l, layer in enumerate(hf.model.layers):
        handles.append(layer.register_forward_hook(make_hook(l)))
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    for h in handles:
        h.remove()

    got, _ = causal_lm_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), icv_scaled=jnp.asarray(icv)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_subset_layer_intervention_matches_hooks():
    """intervention_layer as a list (reference icv_intervention.py:39-42):
    inject only at layers [1, 3], verified against torch hooks there."""
    from licv_vqa_tpu.icv.encoder import expand_icv_to_layers

    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    from licv_vqa_tpu.models.convert import convert_llama, hf_state_dict

    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    layers = [1, 3]
    icv_k = rng.normal(size=(len(layers), D)).astype(np.float32) * 0.2
    ids = rng.integers(1, V, size=(2, 7)).astype(np.int64)
    mask = np.ones_like(ids)

    handles = []
    for k, l in enumerate(layers):
        shift = torch.tensor(icv_k[k])[None, None, :]

        def hook(_m, _i, output, shift=shift):
            h = output[0] if isinstance(output, tuple) else output
            s = h + shift
            out = s / s.norm(dim=-1, keepdim=True) * h.norm(dim=-1, keepdim=True)
            return ((out,) + tuple(output[1:])) if isinstance(output, tuple) else out

        handles.append(hf.model.layers[l].register_forward_hook(hook))
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    for h in handles:
        h.remove()

    expanded = expand_icv_to_layers(jnp.asarray(icv_k), layers, LAYERS)
    got, _ = causal_lm_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), icv_scaled=expanded
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
