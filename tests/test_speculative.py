"""Speculative greedy decoding must equal plain greedy token-for-token
(by construction: target verification), for weak and perfect drafts,
ragged batches, and mid-block EOS."""

import jax.numpy as jnp
import numpy as np
import pytest

from licv_vqa_tpu.infer import greedy_generate
from licv_vqa_tpu.infer.speculative import speculative_greedy_generate
from licv_vqa_tpu.models import DecoderConfig, causal_lm_forward, init_kv_cache
from licv_vqa_tpu.models.convert import convert_llama, hf_state_dict
from tests.test_decoder_parity import _our_cfg, _tiny_hf_llama, V, D, LAYERS

PAD, EOS = 0, 2
MAXLEN = 64


def _fwd(cfg, params):
    def fn(input_ids, attention_mask, positions, cache):
        if cache is None:
            cache = init_kv_cache(cfg, input_ids.shape[0], MAXLEN)
        return causal_lm_forward(
            cfg, params, input_ids, attention_mask, cache=cache, positions=positions
        )

    return fn


def _truncate(cfg, params, k):
    import jax

    sub = dict(params)
    sub["layers"] = jax.tree.map(lambda x: x[:k], params["layers"])
    import dataclasses

    return dataclasses.replace(cfg, n_layers=k), sub


def _prompts(rng, bs, s=10):
    ids = rng.integers(3, V, size=(bs, s)).astype(np.int32)
    mask = np.ones_like(ids)
    for i in range(1, bs):
        n = rng.integers(0, s // 2)
        ids[i, :n] = PAD
        mask[i, :n] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.parametrize("lockstep", [False, True], ids=["per_row", "lockstep"])
@pytest.mark.parametrize("bs,gamma,draft_k", [(1, 4, 2), (3, 4, 2), (1, 2, 4), (2, 3, 1)])
def test_speculative_equals_greedy(bs, gamma, draft_k, lockstep):
    """Both acceptance modes must equal plain greedy exactly: per-row (each
    row's cache index advances by its own accepted prefix) and lockstep
    (shared scalar index, batch-minimum advance)."""
    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(bs * 10 + gamma)
    ids, mask = _prompts(rng, bs)

    want = np.asarray(
        greedy_generate(
            _fwd(cfg, params), ids, mask,
            max_new_tokens=12, eos_token_id=EOS, pad_token_id=PAD,
        )
    )
    dcfg, dparams = _truncate(cfg, params, draft_k)
    got = np.asarray(
        speculative_greedy_generate(
            _fwd(cfg, params),
            _fwd(dcfg, dparams),
            ids, mask,
            max_new_tokens=12, eos_token_id=EOS, pad_token_id=PAD, gamma=gamma,
            lockstep=lockstep,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("lockstep", [False, True], ids=["per_row", "lockstep"])
def test_speculative_tight_cache_exact(lockstep):
    """With the cache sized exactly prompt+max_new+gamma+1 (the runner's
    sizing), speculative must still equal greedy.  Verification writes gamma
    rows past the index; an undersized cache triggers XLA's out-of-bounds
    write semantics (clamp-shift for dynamic_update_slice, drop for scatter)
    — the margin keeps every write in-bounds by construction (regression:
    the runner sized prompt+max_new+1)."""
    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    ids, mask = _prompts(rng, 2)
    gamma, max_new = 4, 12
    tight = ids.shape[1] + max_new + gamma + 1

    def fwd(c):
        def fn(input_ids, attention_mask, positions, cache):
            if cache is None:
                cache = init_kv_cache(c, input_ids.shape[0], tight)
            return causal_lm_forward(
                c, params, input_ids, attention_mask, cache=cache,
                positions=positions,
            )

        return fn

    want = np.asarray(
        greedy_generate(fwd(cfg), ids, mask, max_new_tokens=max_new,
                        eos_token_id=EOS, pad_token_id=PAD)
    )
    dcfg, dparams = _truncate(cfg, params, 2)

    def dfwd(input_ids, attention_mask, positions, cache):
        if cache is None:
            cache = init_kv_cache(dcfg, input_ids.shape[0], tight)
        return causal_lm_forward(
            dcfg, dparams, input_ids, attention_mask, cache=cache,
            positions=positions,
        )

    got = np.asarray(
        speculative_greedy_generate(
            fwd(cfg), dfwd, ids, mask, max_new_tokens=max_new,
            eos_token_id=EOS, pad_token_id=PAD, gamma=gamma, lockstep=lockstep,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_speculative_perfect_draft():
    """Draft == target: every block fully accepted, still exact."""
    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(99)
    ids, mask = _prompts(rng, 2)
    want = np.asarray(
        greedy_generate(
            _fwd(cfg, params), ids, mask,
            max_new_tokens=9, eos_token_id=EOS, pad_token_id=PAD,
        )
    )
    got = np.asarray(
        speculative_greedy_generate(
            _fwd(cfg, params), _fwd(cfg, params), ids, mask,
            max_new_tokens=9, eos_token_id=EOS, pad_token_id=PAD, gamma=3,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_speculative_eos_handling():
    """Force EOS early via a biased lm_head row and check pad tail parity."""
    import jax

    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    # bias the head so EOS becomes likely quickly
    params["lm_head"] = params["lm_head"].at[:, EOS].add(2.0)
    rng = np.random.default_rng(7)
    ids, mask = _prompts(rng, 2)
    want = np.asarray(
        greedy_generate(
            _fwd(cfg, params), ids, mask,
            max_new_tokens=10, eos_token_id=EOS, pad_token_id=PAD,
        )
    )
    dcfg, dparams = _truncate(cfg, params, 2)
    dparams["lm_head"] = dparams["lm_head"].at[:, EOS].add(2.0)
    got = np.asarray(
        speculative_greedy_generate(
            _fwd(cfg, params), _fwd(dcfg, dparams), ids, mask,
            max_new_tokens=10, eos_token_id=EOS, pad_token_id=PAD, gamma=4,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_speculative_min_new_tokens_falls_back_to_greedy():
    """min_new_tokens>0 with speculative_draft_layers must route to plain
    greedy (which implements EOS suppression) instead of silently dropping
    the constraint — the draft is never built in that case."""
    from licv_vqa_tpu.infer.runner import make_generate_fn

    class _Bundle:
        eos_token_id, pad_token_id = 2, 0
        bind_decode = None
        intervention_layers = None

    # fallback: build_draft_decode is never reached, so the stub survives
    make_generate_fn(_Bundle(), {"speculative_draft_layers": 2,
                                 "min_new_tokens": 1})
    # sanity: with min_new_tokens=0 the draft path IS taken and the stub
    # bundle is rejected by build_draft_decode
    with pytest.raises(Exception):
        make_generate_fn(_Bundle(), {"speculative_draft_layers": 2})
