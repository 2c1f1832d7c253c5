"""Shared setup/reference helpers for the serving-engine test modules
(split across modules so pytest-xdist loadscope gives each its own
worker process — a single XLA:CPU process accumulates compiled
executables and eventually crashes; see pyproject.toml addopts)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from licv_vqa_tpu.infer.decode import beam_generate, greedy_generate
from licv_vqa_tpu.infer.serving import (
    BeamServingEngine,
    Request,
    ServingEngine,
)

EOS, PAD = 2, 0


def _idefics_setup():
    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
        make_idefics_serving_fns,
    )

    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    _, bind = make_idefics_forward_fns(cfg, eos_token_id=EOS)
    serving = make_idefics_serving_fns(cfg, eos_token_id=EOS)
    return cfg, params, bind, serving


def _idefics2_setup():
    from licv_vqa_tpu.models.idefics2 import (
        Idefics2Config,
        init_idefics2_params,
        make_idefics2_forward_fns,
        make_idefics2_serving_fns,
    )

    cfg = Idefics2Config.tiny()
    params = init_idefics2_params(jax.random.PRNGKey(0), cfg)
    _, bind = make_idefics2_forward_fns(cfg, eos_token_id=EOS)
    serving = make_idefics2_serving_fns(cfg, eos_token_id=EOS)
    return cfg, params, bind, serving


def _openflamingo_setup():
    from licv_vqa_tpu.models.openflamingo import (
        OpenFlamingoConfig,
        init_openflamingo_params,
        make_openflamingo_forward_fns,
        make_openflamingo_serving_fns,
    )

    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    _, bind = make_openflamingo_forward_fns(cfg, eos_token_id=EOS)
    serving = make_openflamingo_serving_fns(cfg, eos_token_id=EOS)
    return cfg, params, bind, serving


SETUPS = {
    "idefics": _idefics_setup,
    "idefics2": _idefics2_setup,
    "openflamingo": _openflamingo_setup,
}


def _make_requests(cfg, rng, n, min_new=0):
    """Mixed prompt lengths (crossing two buckets) and mixed max_new."""
    isz = cfg.vision.image_size
    vocab = cfg.text.vocab_size
    reqs = []
    for i in range(n):
        s = int(rng.integers(5, 13))
        ids = rng.integers(3, vocab, size=(s,)).astype(np.int32)
        ids[1] = cfg.image_token_id
        # idefics2 expands each <image> into image_seq_len latents at a
        # placeholder RUN — a single token run of 1 works with n_latents=1
        # tiny configs; keep one image token per prompt for all families
        pixels = rng.normal(size=(1, isz, isz, 3)).astype(np.float32)
        reqs.append(
            Request(
                uid=f"r{i}",
                input_ids=ids,
                pixel_values=pixels,
                max_new=int(rng.integers(2, 7)),
                min_new=min_new,
            )
        )
    return reqs


def _reference_tokens(cfg, bind, params, req, icv):
    """Per-request greedy_generate through the family's bind closure."""
    ids = jnp.asarray(req.input_ids[None])
    mask = jnp.ones_like(ids)
    pixels = jnp.asarray(req.pixel_values[None])
    pv = jnp.ones((1, pixels.shape[1]), bool)
    fwd = bind(
        params, pixels, pv, ids, icv, int(ids.shape[1]) + req.max_new + 1
    )
    out = np.asarray(
        greedy_generate(
            fwd, ids, mask,
            max_new_tokens=req.max_new,
            eos_token_id=EOS,
            pad_token_id=PAD,
            min_new_tokens=req.min_new,
        )
    )[0]
    gen = out[len(req.input_ids) :]
    eos_hits = np.nonzero(gen == EOS)[0]
    return gen[: eos_hits[0] + 1] if len(eos_hits) else gen


