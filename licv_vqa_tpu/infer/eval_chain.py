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


def _make_pooled_chain(
    text_cfg,
    prefill,
    merged,
    media_axes,
    *,
    num_beams: int,
    max_new_tokens: int,
    length_penalty: float,
    min_new_tokens: int,
    transition_eos_token_id: Optional[int],
    eos_token_id: int,
):
    """Family-generic body for the POOLED eval chain (see
    ``make_idefics_pooled_eval_chain``): P = max_new_tokens - 1 question
    groups run software-pipelined through ONE jitted scan, so every
    iteration's merged forward carries P·K beam rows PLUS the next
    question's prefill in a single per-layer weight read.  One question
    completes per iteration — ~1 weight-stream pass per question at the
    reference eval shape, vs 4 for the serial overlapped chain and 5 for
    per-question dispatch.

    Pipeline schedule (group g = i mod P at iteration i):
      - FINALIZE g's current question: beam transition t = max_new-1 on its
        in-hand logits (no forward — decode.beam_generate's last step), HF
        finalize, emit.
      - RE-ADMIT g: scatter the pending prefill (produced by iteration
        i-1's merged lane) replicated across g's K rows; reset beam state
        (live = [0, -inf...], the shared-prefill expansion init).
      - TRANSITION all P groups at their own ages t_g = (i - g) mod P
        (0 for the admitting group — on the prefill logits) via one vmapped
        ``beam_transition``; permute the pool cache tails by beam parent.
      - ONE merged forward: P·K decode rows + the prefill of question i+1.

    Questions wrap past N (pipeline drain): N + P iterations total, the
    first P outputs are warm-up garbage and dropped, the last P admissions
    re-run wrapped questions whose outputs are discarded — their rows share
    the weight stream, so drain costs P extra streams for N questions.

    Per-question semantics are EXACTLY ``decode.beam_generate``'s: shared
    ``beam_transition``/``beam_finalize``, same t-indexed history writes,
    same tail-only parent gather (groups are row-isolated: attention, media
    and beam bookkeeping never cross group rows).  Pinned token-equal on
    CPU f32 in tests/test_eval_chain.py.
    """
    if max_new_tokens < 2:
        raise ValueError("the pooled chain needs max_new_tokens >= 2")
    k = int(num_beams)
    p = max_new_tokens - 1  # pipeline depth == decode forwards per question

    def chain(params, ids, mask, pixels, valid, icv):
        n, b, s = ids.shape
        assert b == 1, "reference eval decodes bs=1 questions"
        rows = p * k
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

        def trans1(ls, lt, fs, ft, logp, t):
            out = transition(ls[None], lt[None], fs[None], ft[None],
                             logp[None], t)
            return tuple(x[0] for x in out)

        vtrans = jax.vmap(trans1)  # per-group step counters t_g

        # ---- prologue: plain prefill of question 0 (the first pending) ----
        pend = prefill(
            params, pixels[0], valid[0], ids[0], mask[0], icv, cache_len
        )

        # ---- empty pool (groups hold garbage until their first admission;
        # rows are group-isolated so warm-up garbage never leaks) ----
        cache0 = init_kv_cache(text_cfg, rows, cache_len)
        cache0["index"] = jnp.zeros((rows,), jnp.int32)  # per-group ages

        def pool_zeros(x, ax):
            shape = list(x.shape)
            shape[ax] = shape[ax] * rows
            return jnp.zeros(shape, x.dtype)

        media0 = {
            key: jax.tree.map(partial(pool_zeros, ax=ax), pend[2][key])
            for key, ax in media_axes.items()
        }
        state0 = (
            jnp.full((p, k), NEG_INF),                        # live scores
            jnp.zeros((p, k, max_new_tokens), jnp.int32),      # live tokens
            jnp.full((p, k), NEG_INF),                         # fin scores
            jnp.zeros((p, k, max_new_tokens), jnp.int32),      # fin tokens
        )
        carry0 = (
            pend,                                   # pending prefill
            cache0,
            media0,
            state0,
            jnp.zeros((p, k, pend[0].shape[-1]), jnp.float32),  # last_logp
            jnp.zeros((rows,), jnp.int32),          # next position per row
        )

        def scat_rows(big, small, g, ax):
            small_k = jnp.repeat(small, k, axis=ax)
            return jax.lax.dynamic_update_slice_in_dim(
                big, small_k.astype(big.dtype), g * k, axis=ax
            )

        def body(carry, xs):
            pend, cache, media, state, last_logp, next_pos = carry
            i, ids_n, mask_n, px_n, pv_n = xs
            g = i % p
            live_s, live_t, fin_s, fin_t = state

            # ---- finalize group g (transition t = max_new-1, no forward) --
            fin_state = transition(
                live_s[g][None], live_t[g][None], fin_s[g][None],
                fin_t[g][None], last_logp[g][None],
                jnp.int32(max_new_tokens - 1),
            )[:4]
            best = beam_finalize(
                *fin_state,
                prompt_len=s,
                max_new_tokens=max_new_tokens,
                length_penalty=length_penalty,
            )  # (1, max_new)

            # ---- re-admit group g from the pending prefill ----
            last_pf, cache_pf, media_pf, pos_pf = pend
            live_s = live_s.at[g].set(
                jnp.full((k,), NEG_INF).at[0].set(0.0)
            )
            live_t = live_t.at[g].set(0)
            fin_s = fin_s.at[g].set(NEG_INF)
            fin_t = fin_t.at[g].set(0)
            last_logp = last_logp.at[g].set(
                jnp.repeat(
                    jax.nn.log_softmax(
                        last_pf.astype(jnp.float32), axis=-1
                    ),
                    k, axis=0,
                )
            )
            cache = dict(cache)
            for key in ("k", "v"):
                cache[key] = jax.tree.map(
                    lambda big, sm: scat_rows(big, sm, g, 1),
                    cache[key], cache_pf[key],
                )
            for key in ("pos", "valid"):
                cache[key] = scat_rows(cache[key], cache_pf[key], g, 0)
            cache["index"] = jax.lax.dynamic_update_slice_in_dim(
                cache["index"],
                jnp.broadcast_to(cache_pf["index"], (k,)).astype(jnp.int32),
                g * k, axis=0,
            )
            media = {
                key: jax.tree.map(
                    lambda big, sm, ax=ax: scat_rows(big, sm, g, ax),
                    media[key], media_pf[key],
                )
                for key, ax in media_axes.items()
            }
            next_pos = jax.lax.dynamic_update_slice_in_dim(
                next_pos, jnp.broadcast_to(pos_pf, (k,)).astype(jnp.int32),
                g * k, axis=0,
            )

            # ---- one transition per group at its own age ----
            t_vec = (i - jnp.arange(p, dtype=jnp.int32)) % p
            live_s, live_t, fin_s, fin_t, new_beam, new_tok = vtrans(
                live_s, live_t, fin_s, fin_t, last_logp, t_vec
            )

            # ---- pool-row parent permute (decoded tails only) ----
            flat_sel = (
                jnp.arange(p, dtype=jnp.int32)[:, None] * k + new_beam
            ).reshape(rows)
            cache = _beam_gather_cache(cache, flat_sel, s)

            # ---- ONE merged forward: P*K rows + question i+1's prefill ----
            logits, cache, last_n, cache_n, media_n, pos_n = merged(
                params,
                new_tok.reshape(rows, 1),
                jnp.ones((rows, 1), jnp.int32),
                next_pos[:, None],
                cache, media, icv,
                px_n, pv_n, ids_n, mask_n, cache_len,
            )
            last_logp = jax.nn.log_softmax(
                logits[:, -1, :].astype(jnp.float32), axis=-1
            ).reshape(p, k, -1)

            carry = (
                (last_n, cache_n, media_n, pos_n),
                cache, media,
                (live_s, live_t, fin_s, fin_t),
                last_logp,
                next_pos + 1,
            )
            return carry, best

        # iteration i admits question i (mod n) and prefills question i+1
        # (mod n); question q's answer lands at iteration q + p
        total = n + p
        take = lambda x: jnp.take(  # noqa: E731
            x, (jnp.arange(total) + 1) % n, axis=0
        )
        _, outs = jax.lax.scan(
            body,
            carry0,
            (
                jnp.arange(total, dtype=jnp.int32),
                take(ids), take(mask), take(pixels), take(valid),
            ),
        )
        return outs[p:]  # (N, 1, max_new)

    return chain


def make_idefics_pooled_eval_chain(
    cfg,
    eos_token_id: int,
    *,
    num_beams: int = 3,
    max_new_tokens: int = 5,
    length_penalty: float = 0.0,
    min_new_tokens: int = 0,
    transition_eos_token_id: Optional[int] = None,
):
    """POOLED eval chain for the idefics family: P = max_new-1 concurrent
    question groups pipelined through one jitted scan — every weight-stream
    pass serves P·K beam rows + one prefill instead of the serial chain's
    K rows, completing ONE question per pass (~4× the overlapped chain's
    per-question weight traffic at the reference eval shape; reference
    workload: config/inference.yaml:11,26-30, questions independent —
    reference inference.py:262 itself batches them).

    Signature matches ``make_idefics_eval_chain``::

        chain(params, ids (N,1,S), mask, pixels (N,1,I,H,W,3), valid,
              icv) -> (N, 1, max_new) best-beam tokens

    Token-exact vs per-question ``decode.beam_generate`` on CPU f32
    (tests/test_eval_chain.py); on TPU bf16 the pooled forward carries the
    usual batch-shape kernel-selection drift (documented for the engine).
    """
    from ..models.idefics import (
        SERVING_MEDIA_AXES,
        make_idefics_merged_admit_fn,
        make_idefics_serving_fns,
    )

    prefill, _, media_axes = make_idefics_serving_fns(cfg, eos_token_id)
    merged = make_idefics_merged_admit_fn(cfg, eos_token_id)
    assert media_axes == SERVING_MEDIA_AXES
    return _make_pooled_chain(
        cfg.text, prefill, merged, media_axes,
        num_beams=num_beams,
        max_new_tokens=max_new_tokens,
        length_penalty=length_penalty,
        min_new_tokens=min_new_tokens,
        transition_eos_token_id=transition_eos_token_id,
        eos_token_id=eos_token_id,
    )


def make_idefics2_pooled_eval_chain(
    cfg,
    eos_token_id: int,
    *,
    num_beams: int = 3,
    max_new_tokens: int = 5,
    length_penalty: float = 0.0,
    min_new_tokens: int = 0,
    transition_eos_token_id: Optional[int] = None,
):
    """Pooled eval chain for idefics2 (Mistral GQA + SigLIP; image latents
    merge into the prefill embeds, so the pool carries no media state).
    Same contract/semantics as ``make_idefics_pooled_eval_chain``; uniform
    image resolution (the NaViT ``pixel_attention_mask`` path keeps the
    engine/runner route)."""
    from ..models.idefics2 import (
        make_idefics2_merged_admit_fn,
        make_idefics2_serving_fns,
    )

    prefill, _, media_axes = make_idefics2_serving_fns(cfg, eos_token_id)
    merged = make_idefics2_merged_admit_fn(cfg, eos_token_id)
    return _make_pooled_chain(
        cfg.text, prefill, merged, media_axes,
        num_beams=num_beams,
        max_new_tokens=max_new_tokens,
        length_penalty=length_penalty,
        min_new_tokens=min_new_tokens,
        transition_eos_token_id=transition_eos_token_id,
        eos_token_id=eos_token_id,
    )


def make_openflamingo_pooled_eval_chain(
    cfg,
    eos_token_id: int,
    *,
    num_beams: int = 3,
    max_new_tokens: int = 5,
    length_penalty: float = 0.0,
    min_new_tokens: int = 0,
    transition_eos_token_id: Optional[int] = None,
):
    """Pooled eval chain for OpenFlamingo (MPT/ALiBi + every-4 gated
    xattn).  Same contract/semantics as ``make_idefics_pooled_eval_chain``;
    the merged program threads per-lane ALiBi biases through
    ``decoder.merged_decoder_layer``."""
    from ..models.openflamingo import (
        make_openflamingo_merged_admit_fn,
        make_openflamingo_serving_fns,
    )

    prefill, _, media_axes = make_openflamingo_serving_fns(cfg, eos_token_id)
    merged = make_openflamingo_merged_admit_fn(cfg, eos_token_id)
    return _make_pooled_chain(
        cfg.text, prefill, merged, media_axes,
        num_beams=num_beams,
        max_new_tokens=max_new_tokens,
        length_penalty=length_penalty,
        min_new_tokens=min_new_tokens,
        transition_eos_token_id=transition_eos_token_id,
        eos_token_id=eos_token_id,
    )
