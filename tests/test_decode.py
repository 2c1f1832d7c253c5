"""Decode parity vs HF ``generate`` on a tiny-random Llama (torch CPU).

Covers the reference's exact eval decode settings: greedy and
``num_beams=3, length_penalty=0.0, max_new_tokens=5``
(reference: config/inference.yaml:26-30, bs=1 and batched)."""

from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from licv_vqa_tpu.infer import beam_generate, greedy_generate
from licv_vqa_tpu.models import DecoderConfig, causal_lm_forward, init_kv_cache
from tests.test_decoder_parity import V, D, LAYERS, HEADS, FF, _our_cfg, _tiny_hf_llama

PAD, EOS = 0, 2
MAXLEN = 40


def _forward_fn(cfg, params, icv=None):
    def fn(input_ids, attention_mask, positions, cache):
        if cache is None:
            cache = init_kv_cache(cfg, input_ids.shape[0], MAXLEN)
        return causal_lm_forward(
            cfg,
            params,
            input_ids,
            attention_mask,
            icv_scaled=icv,
            cache=cache,
            positions=positions,
        )

    return fn


def _setup():
    from licv_vqa_tpu.models.convert import convert_llama, hf_state_dict

    hf = _tiny_hf_llama()
    hf.generation_config.pad_token_id = PAD
    hf.generation_config.eos_token_id = EOS
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    return hf, cfg, params


def _prompts(rng, bs, s):
    ids = rng.integers(3, V, size=(bs, s)).astype(np.int64)
    mask = np.ones_like(ids)
    # left-pad some rows
    for i in range(1, bs):
        n = rng.integers(0, s // 2)
        ids[i, :n] = PAD
        mask[i, :n] = 0
    return ids, mask


@pytest.mark.parametrize("bs", [1, 3])
def test_greedy_matches_hf(bs):
    hf, cfg, params = _setup()
    rng = np.random.default_rng(10)
    ids, mask = _prompts(rng, bs, 9)
    want = hf.generate(
        input_ids=torch.tensor(ids),
        attention_mask=torch.tensor(mask),
        max_new_tokens=6,
        do_sample=False,
        num_beams=1,
    ).numpy()

    got = np.asarray(
        greedy_generate(
            _forward_fn(cfg, params),
            jnp.asarray(ids),
            jnp.asarray(mask),
            max_new_tokens=6,
            eos_token_id=EOS,
            pad_token_id=PAD,
        )
    )
    s = ids.shape[1]
    # HF may stop early when all rows hit EOS; compare the overlap, padding after
    n = want.shape[1] - s
    for b in range(bs):
        w = want[b, s : s + n]
        g = got[b, s : s + n]
        np.testing.assert_array_equal(g[: len(w)], w)
        assert np.all(g[len(w) :] == PAD)


@pytest.mark.parametrize("bs,seed", [(1, 11), (3, 12), (1, 13)])
def test_beam3_matches_hf(bs, seed):
    hf, cfg, params = _setup()
    rng = np.random.default_rng(seed)
    ids, mask = _prompts(rng, bs, 8)
    want = hf.generate(
        input_ids=torch.tensor(ids),
        attention_mask=torch.tensor(mask),
        max_new_tokens=5,
        min_new_tokens=0,
        do_sample=False,
        num_beams=3,
        length_penalty=0.0,
    ).numpy()

    got = np.asarray(
        beam_generate(
            _forward_fn(cfg, params),
            jnp.asarray(ids),
            jnp.asarray(mask),
            max_new_tokens=5,
            eos_token_id=EOS,
            pad_token_id=PAD,
            num_beams=3,
            length_penalty=0.0,
        )
    )
    s = ids.shape[1]
    n = want.shape[1] - s
    for b in range(bs):
        w = want[b, s:]
        g = got[b, s:]
        # strip trailing pads from both (HF pads finished hyps too)
        w = w[: (np.nonzero(w != PAD)[0].max() + 1)] if np.any(w != PAD) else w[:0]
        g = g[: (np.nonzero(g != PAD)[0].max() + 1)] if np.any(g != PAD) else g[:0]
        np.testing.assert_array_equal(g, w)


def test_max_new_tokens_zero_returns_prompt_unchanged():
    """Degenerate max_new_tokens=0 (accepted by make_generate_fn) must
    return the prompt as-is: the final-emit refactor (token t from step
    t-1's logits) would otherwise emit one spurious token from the prefill
    logits."""
    from licv_vqa_tpu.infer.speculative import speculative_greedy_generate

    hf, cfg, params = _setup()
    rng = np.random.default_rng(21)
    ids, mask = _prompts(rng, 2, 6)
    fwd = _forward_fn(cfg, params)
    kw = dict(max_new_tokens=0, eos_token_id=EOS, pad_token_id=PAD)
    g = np.asarray(greedy_generate(fwd, jnp.asarray(ids), jnp.asarray(mask), **kw))
    b = np.asarray(
        beam_generate(fwd, jnp.asarray(ids), jnp.asarray(mask), num_beams=3, **kw)
    )
    s = np.asarray(
        speculative_greedy_generate(
            fwd, fwd, jnp.asarray(ids), jnp.asarray(mask), **kw
        )
    )
    for out in (g, b, s):
        np.testing.assert_array_equal(out, ids)


def test_beam_with_icv_runs_and_differs():
    hf, cfg, params = _setup()
    rng = np.random.default_rng(14)
    ids, mask = _prompts(rng, 2, 8)
    icv = jnp.asarray(rng.normal(size=(LAYERS, D)).astype(np.float32))
    base = np.asarray(
        beam_generate(
            _forward_fn(cfg, params),
            jnp.asarray(ids),
            jnp.asarray(mask),
            max_new_tokens=5,
            eos_token_id=EOS,
            pad_token_id=PAD,
        )
    )
    steered = np.asarray(
        beam_generate(
            _forward_fn(cfg, params, icv=icv),
            jnp.asarray(ids),
            jnp.asarray(mask),
            max_new_tokens=5,
            eos_token_id=EOS,
            pad_token_id=PAD,
        )
    )
    assert base.shape == steered.shape
    assert not np.array_equal(base, steered)


@pytest.mark.parametrize("lp", [1.0, -0.5])
def test_beam_nonzero_length_penalty_matches_hf(lp):
    """Beam search with a nonzero length penalty (HF divides by the FULL
    padded sequence length for decoder-only models)."""
    hf, cfg, params = _setup()
    rng = np.random.default_rng(21)
    ids, mask = _prompts(rng, 2, 8)
    want = hf.generate(
        input_ids=torch.tensor(ids),
        attention_mask=torch.tensor(mask),
        max_new_tokens=5,
        do_sample=False,
        num_beams=3,
        length_penalty=lp,
    ).numpy()
    got = np.asarray(
        beam_generate(
            _forward_fn(cfg, params),
            jnp.asarray(ids), jnp.asarray(mask),
            max_new_tokens=5, eos_token_id=EOS, pad_token_id=PAD,
            num_beams=3, length_penalty=lp,
        )
    )
    s = ids.shape[1]
    for b in range(2):
        w, g = want[b, s:], got[b, s:]
        w = w[: (np.nonzero(w != PAD)[0].max() + 1)] if np.any(w != PAD) else w[:0]
        g = g[: (np.nonzero(g != PAD)[0].max() + 1)] if np.any(g != PAD) else g[:0]
        np.testing.assert_array_equal(g, w)


def test_beam_tail_gather_matches_full_gather():
    # _beam_gather_cache only reorders rows >= prompt_len; when the prefix
    # rows are identical across the K beams of a batch item (the invariant
    # beam_generate establishes by replicating one prefill), the result is
    # identical to the full-cache jnp.take it replaced.
    from licv_vqa_tpu.infer.decode import _beam_gather_cache, _cache_map_batch

    rng = np.random.default_rng(0)
    L, B, K, S, KV, DH, P = 2, 2, 3, 10, 2, 4, 6
    def kv(seed):
        base = rng.normal(size=(L, B, 1, S, KV, DH))  # per-batch prefix
        full = np.broadcast_to(base, (L, B, K, S, KV, DH)).copy()
        full[:, :, :, P:] = rng.normal(size=(L, B, K, S - P, KV, DH))
        return jnp.asarray(full.reshape(L, B * K, S, KV, DH), jnp.float32)

    pos = np.broadcast_to(
        np.arange(S, dtype=np.int32)[None, None], (B, 1, S)
    ).copy()
    pos = np.broadcast_to(pos, (B, K, S)).copy()
    pos[:, :, P:] = rng.integers(0, 99, size=(B, K, S - P))
    cache = {
        "k": kv(1),
        "v": kv(2),
        "pos": jnp.asarray(pos.reshape(B * K, S)),
        "valid": jnp.asarray(pos.reshape(B * K, S) % 2 == 0),
        "index": jnp.asarray(P, jnp.int32),
    }
    # parent selection stays within each batch item's beam group
    sel = rng.integers(0, K, size=(B, K)).astype(np.int32)
    flat_sel = jnp.asarray(
        (np.arange(B)[:, None] * K + sel).reshape(-1), jnp.int32
    )
    got = _beam_gather_cache(cache, flat_sel, P)
    want = _cache_map_batch(
        cache, lambda x, ax: jnp.take(x, flat_sel, axis=ax)
    )
    for key in ("k", "v", "pos", "valid", "index"):
        np.testing.assert_array_equal(np.asarray(got[key]), np.asarray(want[key]))


def test_beam_tail_gather_int8_cache_dict():
    from licv_vqa_tpu.infer.decode import _beam_gather_cache, _cache_map_batch

    rng = np.random.default_rng(5)
    L, B, K, S, KV, DH, P = 1, 1, 2, 8, 2, 4, 5
    def plane(shape, dtype):
        base = rng.normal(size=(L, B, 1) + shape)
        full = np.broadcast_to(base, (L, B, K) + shape).copy()
        full[:, :, :, P:] = rng.normal(size=(L, B, K, S - P) + shape[1:])
        arr = full.reshape((L, B * K) + shape)
        if dtype == np.int8:
            arr = (arr * 20).astype(np.int8)
        return jnp.asarray(arr, dtype)

    cache = {
        "k": {"q": plane((S, KV, DH), np.int8), "s": plane((S, KV, 1), np.float32)},
        "v": {"q": plane((S, KV, DH), np.int8), "s": plane((S, KV, 1), np.float32)},
        "pos": jnp.zeros((B * K, S), jnp.int32),
        "valid": jnp.zeros((B * K, S), bool),
        "index": jnp.asarray(P, jnp.int32),
    }
    sel = rng.integers(0, K, size=(B, K)).astype(np.int32)
    flat_sel = jnp.asarray(
        (np.arange(B)[:, None] * K + sel).reshape(-1), jnp.int32
    )
    got = _beam_gather_cache(cache, flat_sel, P)
    want = _cache_map_batch(cache, lambda x, ax: jnp.take(x, flat_sel, axis=ax))
    for key in ("k", "v"):
        for leaf in ("q", "s"):
            np.testing.assert_array_equal(
                np.asarray(got[key][leaf]), np.asarray(want[key][leaf])
            )
