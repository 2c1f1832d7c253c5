"""Overlapped eval chain == per-question beam_generate, token for token.

The chain (infer/eval_chain.py) folds question i+1's prefill into question
i's FIRST beam step via the merged-lane program; per-question beam
semantics must be EXACT (shared beam_transition/beam_finalize; packed
matmuls are row-identical in exact arithmetic → f32 CPU equality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from licv_vqa_tpu.infer.decode import beam_generate
from licv_vqa_tpu.infer.eval_chain import (
    make_idefics2_pooled_eval_chain,
    make_idefics_eval_chain,
    make_idefics_pooled_eval_chain,
    make_openflamingo_pooled_eval_chain,
)
from licv_vqa_tpu.models.idefics import (
    IdeficsConfig,
    init_idefics_params,
    make_idefics_forward_fns,
)

EOS, PAD = 2, 0


def test_eval_chain_matches_beam_generate():
    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    _, bind = make_idefics_forward_fns(cfg, eos_token_id=EOS)

    rng = np.random.default_rng(53)
    n, s, max_new, k = 5, 12, 4, 3
    isz = cfg.vision.image_size
    ids = rng.integers(3, cfg.text.vocab_size, size=(n, 1, s)).astype(np.int32)
    ids[:, :, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    # a left-padded question exercises position handling through the chain
    mask[2, :, :3] = 0
    ids[2, :, :3] = PAD
    pixels = rng.normal(size=(n, 1, 1, isz, isz, 3)).astype(np.float32)
    valid = np.ones((n, 1, 1), bool)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1,
        jnp.float32,
    )

    chain = jax.jit(
        make_idefics_eval_chain(
            cfg, EOS, num_beams=k, max_new_tokens=max_new
        )
    )
    got = np.asarray(chain(params, ids, mask, pixels, valid, icv))

    for i in range(n):
        fwd = bind(
            params, jnp.asarray(pixels[i]), jnp.asarray(valid[i]),
            jnp.asarray(ids[i]), icv, s + max_new + 1,
        )
        want = np.asarray(
            beam_generate(
                fwd, jnp.asarray(ids[i]), jnp.asarray(mask[i]),
                max_new_tokens=max_new, eos_token_id=EOS, pad_token_id=PAD,
                num_beams=k,
            )
        )[:, s:]
        np.testing.assert_array_equal(got[i], want, err_msg=f"question {i}")


def test_pooled_eval_chain_matches_beam_generate():
    """The POOLED chain (P = max_new-1 staggered groups, one merged forward
    per iteration) is token-exact vs per-question beam_generate — including
    warm-up (first P iterations hold garbage groups) and drain (wrapped
    re-admissions past N).  Exercises EOS retirement into the finished pool
    (real eos as the transition stop token) and a left-padded question."""
    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(1), cfg)
    _, bind = make_idefics_forward_fns(cfg, eos_token_id=EOS)

    rng = np.random.default_rng(7)
    n, s, max_new, k = 7, 12, 4, 3  # P = 3 groups, N > P (+ drain wrap)
    isz = cfg.vision.image_size
    ids = rng.integers(3, cfg.text.vocab_size, size=(n, 1, s)).astype(np.int32)
    ids[:, :, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    mask[3, :, :2] = 0
    ids[3, :, :2] = PAD
    pixels = rng.normal(size=(n, 1, 1, isz, isz, 3)).astype(np.float32)
    valid = np.ones((n, 1, 1), bool)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1,
        jnp.float32,
    )

    chain = jax.jit(
        make_idefics_pooled_eval_chain(
            cfg, EOS, num_beams=k, max_new_tokens=max_new
        )
    )
    got = np.asarray(chain(params, ids, mask, pixels, valid, icv))

    for i in range(n):
        fwd = bind(
            params, jnp.asarray(pixels[i]), jnp.asarray(valid[i]),
            jnp.asarray(ids[i]), icv, s + max_new + 1,
        )
        want = np.asarray(
            beam_generate(
                fwd, jnp.asarray(ids[i]), jnp.asarray(mask[i]),
                max_new_tokens=max_new, eos_token_id=EOS, pad_token_id=PAD,
                num_beams=k,
            )
        )[:, s:]
        np.testing.assert_array_equal(got[i], want, err_msg=f"question {i}")


@pytest.mark.parametrize("family", ["idefics2", "openflamingo"])
def test_pooled_eval_chain_other_families(family):
    """The pooled chain covers the WHOLE model zoo (reference evals all
    three families — reference: utils.py:40-80): idefics2 (GQA, latents
    merged into embeds — no pool media) and OpenFlamingo (ALiBi biases
    through the merged lanes + per-lane gated xattn)."""
    if family == "idefics2":
        from licv_vqa_tpu.models.idefics2 import (
            Idefics2Config as Cfg,
            init_idefics2_params as init,
            make_idefics2_forward_fns as fwd_fns,
        )

        factory = make_idefics2_pooled_eval_chain
    else:
        from licv_vqa_tpu.models.openflamingo import (
            OpenFlamingoConfig as Cfg,
            init_openflamingo_params as init,
            make_openflamingo_forward_fns as fwd_fns,
        )

        factory = make_openflamingo_pooled_eval_chain

    cfg = Cfg.tiny()
    params = init(jax.random.PRNGKey(2), cfg)
    _, bind = fwd_fns(cfg, eos_token_id=EOS)

    rng = np.random.default_rng(29)
    n, s, max_new, k = 5, 10, 4, 3
    isz = cfg.vision.image_size
    ids = rng.integers(3, cfg.text.vocab_size, size=(n, 1, s)).astype(np.int32)
    ids[:, :, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    mask[2, :, :2] = 0
    ids[2, :, :2] = PAD
    pixels = rng.normal(size=(n, 1, 1, isz, isz, 3)).astype(np.float32)
    valid = np.ones((n, 1, 1), bool)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1,
        jnp.float32,
    )

    chain = jax.jit(
        factory(cfg, EOS, num_beams=k, max_new_tokens=max_new)
    )
    got = np.asarray(chain(params, ids, mask, pixels, valid, icv))

    for i in range(n):
        fwd = bind(
            params, jnp.asarray(pixels[i]), jnp.asarray(valid[i]),
            jnp.asarray(ids[i]), icv, s + max_new + 1,
        )
        want = np.asarray(
            beam_generate(
                fwd, jnp.asarray(ids[i]), jnp.asarray(mask[i]),
                max_new_tokens=max_new, eos_token_id=EOS, pad_token_id=PAD,
                num_beams=k,
            )
        )[:, s:]
        np.testing.assert_array_equal(got[i], want, err_msg=f"question {i}")
