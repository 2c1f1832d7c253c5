"""Fixed-shape jitted generation: greedy and beam search with a KV cache.

Replaces the reference's HF ``generate`` + per-step baukit hooks (reference:
inference.py:300-321 with TraceDict firing per layer per token, SURVEY.md
§3.4).  Here the ICV term is compiled into the forward, the whole decode is
one ``lax.scan`` — no host round-trips per token — and everything is static
shape so a (batch, bucket) pair compiles exactly once.

Beam search reproduces HF semantics at the reference's settings
(``num_beams=3, length_penalty=0.0, min_new_tokens=0``, reference:
config/inference.yaml:26-30): top-2K candidate expansion, EOS candidates
retired to a finished pool, live beams merged into the pool at the end,
best-by-score wins.  Running all ``max_new_tokens`` steps (no dynamic early
exit) is score-equivalent because per-step logprobs are ≤ 0, so late
finishers can never beat the pool once HF's stop condition holds.  That
argument assumes ``length_penalty <= 0`` (the reference's 0.0): for lp > 0
a later EOS divides by a larger length and can score HIGHER than a
hypothesis HF's inexact ``is_done`` bound would have frozen the pool
against — this implementation then behaves like HF ``early_stopping=
"never"`` (pinned vs HF at lp=1.0/-0.5 on the tested seeds, but the
parameter space beyond the reference settings is not exhaustively matched).

``forward_fn(input_ids, attention_mask, positions, cache) -> (logits, cache)``
is the only model contract; multimodal extras (image latents, ICV) are bound
by the caller via closure.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7  # plain float: a module-level jnp constant would
# initialize the default backend at import time (before device selection)


# single source of truth for the HF position-id convention (re-exported
# here for the generate loops and speculative.py)
from ..models.decoder import _positions_from_mask  # noqa: E402


# ---------------------------------------------------------------------------
# Greedy
# ---------------------------------------------------------------------------


def greedy_generate(
    forward_fn: Callable,
    input_ids: jax.Array,  # (B, S) LEFT-padded prompts
    attention_mask: jax.Array,  # (B, S)
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    min_new_tokens: int = 0,
) -> jax.Array:
    """Returns (B, S + max_new_tokens) sequences (prompt + generated)."""
    if max_new_tokens <= 0:  # degenerate but accepted: prompt unchanged
        return input_ids
    b, s = input_ids.shape
    positions = _positions_from_mask(attention_mask)
    logits, cache = forward_fn(input_ids, attention_mask, positions, None)
    last_logits = logits[:, -1, :].astype(jnp.float32)
    next_pos = positions[:, -1] + 1

    def emit(last_logits, finished, t):
        lg = jnp.where(
            (t < min_new_tokens),
            last_logits.at[:, eos_token_id].set(NEG_INF),
            last_logits,
        )
        token = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        token = jnp.where(finished, pad_token_id, token)
        return token, finished | (token == eos_token_id)

    def step(carry, t):
        last_logits, cache, next_pos, finished = carry
        token, new_finished = emit(last_logits, finished, t)
        step_mask = jnp.ones((b, 1), jnp.int32)
        logits, cache = forward_fn(
            token[:, None], step_mask, next_pos[:, None], cache
        )
        return (
            logits[:, -1, :].astype(jnp.float32),
            cache,
            next_pos + 1,
            new_finished,
        ), token

    finished0 = jnp.zeros((b,), bool)
    # token t comes from step t-1's logits, so the LAST token needs no
    # forward — scan max_new-1 steps and emit the final token outside (at
    # the reference eval shape max_new=5 this is 1/5 of decode compute)
    (last_logits, _, _, finished), tokens = jax.lax.scan(
        step,
        (last_logits, cache, next_pos, finished0),
        jnp.arange(max_new_tokens - 1),
    )
    final_tok, _ = emit(last_logits, finished, max_new_tokens - 1)
    tokens = jnp.concatenate([tokens.T, final_tok[:, None]], axis=1)
    return jnp.concatenate([input_ids, tokens], axis=1)


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


def _flatten_beam(x: jax.Array) -> jax.Array:
    return x.reshape((-1,) + x.shape[2:])


def _unflatten_beam(x: jax.Array, b: int, k: int) -> jax.Array:
    return x.reshape((b, k) + x.shape[1:])


def _cache_map_batch(cache: Any, fn: Callable[[jax.Array, int], jax.Array]) -> Any:
    """Apply fn(leaf, batch_axis) to every cache leaf; knows the KV layout."""
    if cache is None:
        return None
    out = dict(cache)
    for key in cache:
        if key in ("k", "v", "xk", "xv"):
            # may be an array or an int8-cache {"q","s"} dict — map leaves
            out[key] = jax.tree.map(lambda x: fn(x, 1), cache[key])  # (L, B, …)
        elif key == "index":
            out[key] = cache[key]
        else:
            out[key] = fn(cache[key], 0)  # (B, ...)
    return out


def _beam_gather_cache(cache: Any, flat_sel: jax.Array, prompt_len: int) -> Any:
    """Reorder the KV cache by beam parent, touching only rows that can
    differ across beams.

    Beams start as identical copies of one prefill (``jnp.repeat`` after the
    shared forward), and decode only writes rows at index >= prompt_len — so
    rows [0, prompt_len) are bitwise identical across the K beams of a batch
    item and the parent gather is the identity there.  Gathering just the
    decoded tail turns the per-step reorder from a full-cache copy
    (read+write of the whole (L, B·K, S, KV, Dh) stack — at the reference
    eval shape ~100× the bytes that can actually differ) into a ~max_new-row
    one, and the ``dynamic_update_slice`` aliases the scan-carried cache
    in place.  Static cross-attention K/V ("xk"/"xv": written once at
    prefill, never during decode) are beam-identical and skip the gather
    entirely."""
    if cache is None:
        return None

    def tail(x, batch_ax):
        row_ax = batch_ax + 1
        t = jax.lax.slice_in_dim(x, prompt_len, x.shape[row_ax], axis=row_ax)
        t = jnp.take(t, flat_sel, axis=batch_ax)
        return jax.lax.dynamic_update_slice_in_dim(x, t, prompt_len, axis=row_ax)

    out = dict(cache)
    for key in cache:
        if key in ("k", "v"):
            # may be an array or an int8-cache {"q","s"} dict — map leaves
            out[key] = jax.tree.map(lambda x: tail(x, 1), cache[key])
        elif key in ("xk", "xv", "index"):
            out[key] = cache[key]
        else:
            out[key] = tail(cache[key], 0)  # (B·K, S, ...) rows (pos/valid)
    return out


def _topk_2k_two_stage(cand: jax.Array, b: int, k: int, vocab: int):
    """Global top-2K candidate selection as per-beam top-2K + a (B, K·2K)
    combine — EXACT vs one flat ``top_k`` over (B, K·V): every global
    top-2K candidate lies within its own beam's top-2K (a beam already has
    2K better-or-equal entries otherwise), and tie order is preserved
    (both stages prefer lower (beam, vocab) index, which is exactly the
    flat index order).  Measurably cheaper on TPU — the flat K·V top_k
    costs 0.572 ms vs 0.437 ms two-stage at the eval shape (K=3, V=32000;
    tools/bench_beam_overhead_tpu.py).

    Returns ``(scores, src_beam, token)`` each (B, 2K)."""
    s1, i1 = jax.lax.top_k(cand.reshape(b * k, vocab), 2 * k)  # per-beam
    s1 = s1.reshape(b, k * 2 * k)
    i1 = i1.reshape(b, k * 2 * k)
    top_scores, sel = jax.lax.top_k(s1, 2 * k)  # (B, 2K) over K*2K entries
    src_beam = sel // (2 * k)
    token = jnp.take_along_axis(i1, sel, axis=1).astype(jnp.int32)
    return top_scores, src_beam, token


def beam_transition(
    live_scores, live_tokens, fin_scores, fin_tokens, last_logp, t,
    *, prompt_len: int, eos_token_id: int, length_penalty: float,
    min_new_tokens: int,
):
    """One beam-search transition from the current step's logprobs: update
    the finished pool + select the K live continuations.  Pure bookkeeping
    — no model forward.  Module-level so the overlapped eval chain
    (infer/eval_chain.py) runs the EXACT transition ``beam_generate``
    does."""
    b, k = live_scores.shape
    vocab = last_logp.shape[-1]
    logp = jnp.where(
        t < min_new_tokens,
        last_logp.at[..., eos_token_id].set(NEG_INF),
        last_logp,
    )
    cand = live_scores[:, :, None] + logp  # (B, K, V)
    top_scores, src_beam, token = _topk_2k_two_stage(cand, b, k, vocab)
    is_eos = token == eos_token_id

    # candidate token histories: parent's history + new token at slot t
    parent_hist = jnp.take_along_axis(
        live_tokens, src_beam[:, :, None], axis=1
    )  # (B, 2K, T)
    cand_hist = jax.vmap(
        lambda h, tok: h.at[:, t].set(tok), in_axes=(0, 0)
    )(parent_hist, token)

    # ---- finished pool update: EOS candidates compete for K slots ----
    # HF skips EOS candidates ranked >= K among the 2K, and its length
    # penalty divides by the FULL (padded prompt + generated) length.
    lp_len = jnp.float32(prompt_len + t + 1)
    rank_ok = jnp.arange(2 * k, dtype=jnp.int32)[None, :] < k
    eos_scores = jnp.where(
        is_eos & rank_ok, top_scores / (lp_len**length_penalty), NEG_INF
    )
    pool_scores = jnp.concatenate([fin_scores, eos_scores], axis=1)  # (B, 3K)
    pool_tokens = jnp.concatenate([fin_tokens, cand_hist], axis=1)
    best_scores, best_idx = jax.lax.top_k(pool_scores, k)
    fin_scores = best_scores
    fin_tokens = jnp.take_along_axis(pool_tokens, best_idx[:, :, None], axis=1)

    # ---- select top-K non-EOS candidates as the new live beams ----
    live_cand = jnp.where(is_eos, NEG_INF, top_scores)
    new_scores, sel = jax.lax.top_k(live_cand, k)  # (B, K)
    new_beam = jnp.take_along_axis(src_beam, sel, axis=1)
    new_token = jnp.take_along_axis(token, sel, axis=1)
    live_tokens = jnp.take_along_axis(cand_hist, sel[:, :, None], axis=1)
    return (new_scores, live_tokens, fin_scores, fin_tokens, new_beam,
            new_token)


def beam_finalize(
    live_scores, live_tokens, fin_scores, fin_tokens,
    *, prompt_len: int, max_new_tokens: int, length_penalty: float,
):
    """HF finalize: merge live beams into the pool, pick the best
    hypothesis per batch item — (B, max_new) tokens."""
    lp_len = jnp.float32(prompt_len + max_new_tokens)
    live_final = live_scores / (lp_len**length_penalty)
    all_scores = jnp.concatenate([fin_scores, live_final], axis=1)
    all_tokens = jnp.concatenate([fin_tokens, live_tokens], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    return jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0]


def beam_generate(
    forward_fn: Callable,
    input_ids: jax.Array,  # (B, S) LEFT-padded prompts
    attention_mask: jax.Array,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    num_beams: int = 3,
    length_penalty: float = 0.0,
    min_new_tokens: int = 0,
) -> jax.Array:
    """Returns the best beam per batch item: (B, S + max_new_tokens)."""
    if max_new_tokens <= 0:  # degenerate but accepted: prompt unchanged
        return input_ids
    b, s = input_ids.shape
    k = num_beams
    positions = _positions_from_mask(attention_mask)

    # ---- prefill once per batch item, then replicate state across beams ----
    logits, cache = forward_fn(input_ids, attention_mask, positions, None)
    last_logp = jax.nn.log_softmax(logits[:, -1, :].astype(jnp.float32), axis=-1)
    vocab = last_logp.shape[-1]

    rep = lambda x, axis: jnp.repeat(x, k, axis=axis)
    cache = _cache_map_batch(cache, rep)
    next_pos = rep(positions[:, -1:] + 1, 0).reshape(b * k)  # (B*K,)

    # beam state
    live_scores = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)  # force beam0 first
    live_tokens = jnp.full((b, k, max_new_tokens), pad_token_id, jnp.int32)
    fin_scores = jnp.full((b, k), NEG_INF)
    fin_tokens = jnp.full((b, k, max_new_tokens), pad_token_id, jnp.int32)
    last_logp = rep(last_logp[:, None, :], 1)  # (B, K, V)

    transition = partial(
        beam_transition,
        prompt_len=s,
        eos_token_id=eos_token_id,
        length_penalty=length_penalty,
        min_new_tokens=min_new_tokens,
    )

    def step(carry, t):
        live_scores, live_tokens, fin_scores, fin_tokens, last_logp, cache, next_pos = (
            carry
        )
        live_scores, live_tokens, fin_scores, fin_tokens, new_beam, new_token = (
            transition(live_scores, live_tokens, fin_scores, fin_tokens,
                       last_logp, t)
        )

        # gather beam-major state: flat index = b * K + beam.  Only the
        # decoded tail rows can differ across beams — see _beam_gather_cache
        flat_sel = (
            jnp.arange(b, dtype=jnp.int32)[:, None] * k + new_beam
        ).reshape(-1)
        cache = _beam_gather_cache(cache, flat_sel, s)

        # run one decode step for the selected beams
        step_tok = new_token.reshape(b * k, 1)
        step_mask = jnp.ones((b * k, 1), jnp.int32)
        logits, cache = forward_fn(step_tok, step_mask, next_pos[:, None], cache)
        last_logp = jax.nn.log_softmax(
            logits[:, -1, :].astype(jnp.float32), axis=-1
        ).reshape(b, k, vocab)
        return (
            live_scores,
            live_tokens,
            fin_scores,
            fin_tokens,
            last_logp,
            cache,
            next_pos + 1,
        ), None

    carry = (live_scores, live_tokens, fin_scores, fin_tokens, last_logp, cache, next_pos)
    # the LAST transition needs no cache gather or forward (its logits are
    # already in hand) — scan max_new-1 full steps, transition once outside
    carry, _ = jax.lax.scan(step, carry, jnp.arange(max_new_tokens - 1))
    live_scores, live_tokens, fin_scores, fin_tokens, last_logp = carry[:5]
    live_scores, live_tokens, fin_scores, fin_tokens, _, _ = transition(
        live_scores, live_tokens, fin_scores, fin_tokens, last_logp,
        max_new_tokens - 1,
    )

    best_tokens = beam_finalize(
        live_scores, live_tokens, fin_scores, fin_tokens,
        prompt_len=s, max_new_tokens=max_new_tokens,
        length_penalty=length_penalty,
    )
    return jnp.concatenate([input_ids, best_tokens], axis=1)
