"""Overlapped eval chain: the NEXT question's prefill rides the CURRENT
question's first beam-decode step.

The reference eval workload (bs=1, beam-3, max_new=5 — reference:
config/inference.yaml:11,26-30) spends 5 full weight-stream passes per
question on one chip: 1 prefill + 4 beam steps, each reading the whole
int8 decoder+xattn+head stack from HBM (the 94%-of-roofline device view,
bench.py).  Those passes are BANDWIDTH-bound with the MXU nearly idle at
bs=1·K=3 rows, so a 64-token prefill (~1.1 TFLOP) fits entirely inside
one step's MXU headroom.  This module chains questions through one jitted
scan where question i's FIRST beam step is the engine's merged
admit+decode program (``models.idefics.make_idefics_merged_admit_fn``):
its packed projections compute question i+1's prefill inside the same
per-layer weight read — 4 weight passes per question instead of 5
(~20% off the roofline itself, on top of the chain's relay-sync
amortization).

Beam semantics per question are EXACTLY ``decode.beam_generate``'s
(shared ``beam_transition``/``beam_finalize``/tail-gather; pinned
token-equal on CPU f32 in tests/test_eval_chain.py).  On TPU bf16 the
packed first step carries the usual batch-shape kernel-selection drift —
the same caveat documented for the serving engine.

v1 scope: idefics family (rope), b=1 per question (the reference's eval
batching), uniform question shapes (one compile per (S, max_new, K)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.decoder import init_kv_cache
from .decode import (
    NEG_INF,
    _beam_gather_cache,
    _positions_from_mask,
    beam_finalize,
    beam_transition,
)


def make_idefics_eval_chain(
    cfg,
    eos_token_id: int,
    *,
    num_beams: int = 3,
    max_new_tokens: int = 5,
    length_penalty: float = 0.0,
    min_new_tokens: int = 0,
    transition_eos_token_id: Optional[int] = None,  # beam-stop token; None
    # = eos_token_id.  bench.py passes -1 so random-weight throughput runs
    # never retire beams early (comparable work to the static arm) while
    # the model's EOS-packed image masking keeps the real eos id.
):
    """Build the jitted chain fn:

        chain(params, ids (N,1,S), mask (N,1,S), pixels (N,1,I,H,W,3),
              valid (N,1,I), icv) -> (N, 1, max_new) best-beam tokens

    Questions run in sequence inside ONE program; question i's first beam
    step also prefills question i+1 (merged lanes).  Question 0 prefills
    plainly at the start; the last iteration's prefill lane feeds question
    0's inputs again (its outputs are discarded — one warm pass of waste,
    which keeps every iteration shape-identical for the scan)."""
    from ..models.idefics import (
        SERVING_MEDIA_AXES,
        make_idefics_merged_admit_fn,
        make_idefics_serving_fns,
    )

    if max_new_tokens < 2:
        raise ValueError("the overlapped chain needs max_new_tokens >= 2")
    k = int(num_beams)
    prefill, decode_step, media_axes = make_idefics_serving_fns(
        cfg, eos_token_id
    )
    merged = make_idefics_merged_admit_fn(cfg, eos_token_id)
    assert media_axes == SERVING_MEDIA_AXES

    def chain(params, ids, mask, pixels, valid, icv):
        n, b, s = ids.shape
        assert b == 1, "reference eval decodes bs=1 questions"
        cache_len = s + max_new_tokens + 1
        stop_id = (
            eos_token_id
            if transition_eos_token_id is None
            else transition_eos_token_id
        )
        transition = partial(
            beam_transition,
            prompt_len=s,
            eos_token_id=stop_id,
            length_penalty=length_penalty,
            min_new_tokens=min_new_tokens,
        )

        # ---- question 0: plain prefill ----
        last0, cache0, media0, pos0 = prefill(
            params, pixels[0], valid[0], ids[0], mask[0], icv, cache_len
        )

        def body(carry, xs):
            last, cache, media, next_pos = carry  # question i's prefill
            ids_n, mask_n, px_n, pv_n = xs  # question i+1's inputs

            # ---- beam-expand question i across K rows ----
            rep1 = lambda x: jnp.repeat(x, k, axis=1)  # noqa: E731
            rep0 = lambda x: jnp.repeat(x, k, axis=0)  # noqa: E731
            cache_k = dict(
                {key: jax.tree.map(rep1, cache[key]) for key in ("k", "v")},
                pos=rep0(cache["pos"]),
                valid=rep0(cache["valid"]),
                index=cache["index"],
            )
            media_k = {
                key: jax.tree.map(
                    partial(jnp.repeat, repeats=k, axis=ax), media[key]
                )
                for key, ax in media_axes.items()
            }
            pos_k = rep0(next_pos)  # (K,)

            live_scores = jnp.full((1, k), NEG_INF).at[:, 0].set(0.0)
            live_tokens = jnp.full((1, k, max_new_tokens), 0, jnp.int32)
            fin_scores = jnp.full((1, k), NEG_INF)
            fin_tokens = jnp.full((1, k, max_new_tokens), 0, jnp.int32)
            last_logp = jnp.repeat(
                jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)[
                    :, None, :
                ],
                k,
                axis=1,
            )  # (1, K, V)

            def do_transition(state, logp, t):
                ls, lt, fs, ft = state
                ls, lt, fs, ft, new_beam, new_tok = transition(
                    ls, lt, fs, ft, logp, t
                )
                return (ls, lt, fs, ft), new_beam, new_tok

            state = (live_scores, live_tokens, fin_scores, fin_tokens)

            # ---- step 0: MERGED with question i+1's prefill ----
            state, new_beam, new_tok = do_transition(state, last_logp, 0)
            flat_sel = new_beam.reshape(-1)  # b=1: flat index == beam index
            cache_k = _beam_gather_cache(cache_k, flat_sel, s)
            (
                logits, cache_k, last_n, cache_n, media_n, pos_n,
            ) = merged(
                params,
                new_tok.reshape(k, 1),
                jnp.ones((k, 1), jnp.int32),
                pos_k[:, None],
                cache_k,
                media_k,
                icv,
                px_n, pv_n, ids_n, mask_n, cache_len,
            )
            last_logp = jax.nn.log_softmax(
                logits[:, -1, :].astype(jnp.float32), axis=-1
            ).reshape(1, k, -1)
            pos_k = pos_k + 1

            # ---- steps 1..max_new-2: plain beam steps ----
            def step(carry2, t):
                state, last_logp, cache_k, pos_k = carry2
                state, new_beam, new_tok = do_transition(state, last_logp, t)
                cache_k2 = _beam_gather_cache(cache_k, new_beam.reshape(-1), s)
                logits, cache_k2 = decode_step(
                    params,
                    new_tok.reshape(k, 1),
                    jnp.ones((k, 1), jnp.int32),
                    pos_k[:, None],
                    cache_k2,
                    icv,
                    media_k,
                )
                last_logp = jax.nn.log_softmax(
                    logits[:, -1, :].astype(jnp.float32), axis=-1
                ).reshape(1, k, -1)
                return (state, last_logp, cache_k2, pos_k + 1), None

            (state, last_logp, cache_k, pos_k), _ = jax.lax.scan(
                step,
                (state, last_logp, cache_k, pos_k),
                jnp.arange(1, max_new_tokens - 1),
            )

            # ---- final transition + HF finalize ----
            state, _, _ = do_transition(state, last_logp, max_new_tokens - 1)
            best = beam_finalize(
                *state,
                prompt_len=s,
                max_new_tokens=max_new_tokens,
                length_penalty=length_penalty,
            )  # (1, max_new)
            return (last_n, cache_n, media_n, pos_n), best

        # iteration i consumes question i+1's inputs; the last iteration
        # wraps to question 0 (prefill-lane output discarded)
        roll = lambda x: jnp.concatenate([x[1:], x[:1]], axis=0)  # noqa: E731
        carry, outs = jax.lax.scan(
            body,
            (last0, cache0, media0, pos0),
            (roll(ids), roll(mask), roll(pixels), roll(valid)),
        )
        return outs  # (N, 1, max_new)

    return chain
