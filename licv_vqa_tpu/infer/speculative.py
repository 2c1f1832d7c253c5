"""Self-speculative greedy decoding: layer-skip draft + exact verification.

Serving accelerator in the spirit of self-speculative VLM decoding (see
PAPERS.md): a cheap DRAFT model — e.g. the same network truncated to its
first K layers — proposes ``gamma`` tokens autoregressively; the full TARGET
model scores the whole block in ONE forward and the longest agreeing prefix
is accepted plus the target's own correction token.  Outputs are
token-identical to plain greedy decoding in exact arithmetic (the target
verifies every position); in finite precision the verify forward attends
the same keys with a different cache/local split than greedy's s=1 steps,
so reduction order differs and a near-tie argmax could in principle flip —
the equality tests pin it empirically at f32, and any flip is between
candidates the target scores as equal to within rounding.  Draft quality
only determines how much target work is amortized per emitted token.

Acceptance is PER-ROW by default: each batch row advances by its own
accepted count, tracked by a per-row ``(B,)`` cache index
(``models.decoder.decode_cache_view`` handles both scalar and vector
indices).  ``lockstep=True`` restores the round-1 behavior (the shared
scalar index advances by the batch minimum — same outputs, more verify
rounds on ragged batches).

Cache invariant at the top of every loop iteration: both caches hold KV for
``prompt + out[0 .. n_out-2]`` — i.e. ``index = S + n_out - 1`` (per row) —
so verification writes ``gamma`` rows and each row's index rolls back to
``index - gamma + n_emit``; rejected rows are overwritten later.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .decode import _positions_from_mask


def speculative_greedy_generate(
    target_fwd: Callable,
    draft_fwd: Callable,
    input_ids: jax.Array,  # (B, S) LEFT-padded prompts
    attention_mask: jax.Array,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    gamma: int = 4,
    lockstep: bool = False,
) -> jax.Array:
    """Returns (B, S + max_new_tokens); equals greedy_generate token-for-token."""
    if max_new_tokens <= 0:  # degenerate but accepted: prompt unchanged
        return input_ids
    b, s = input_ids.shape
    positions = _positions_from_mask(attention_mask)

    t_logits, t_cache = target_fwd(input_ids, attention_mask, positions, None)
    _, d_cache = draft_fwd(input_ids, attention_mask, positions, None)
    if not lockstep:
        # per-row indices from here on: rows accept independently
        t_cache = dict(t_cache, index=jnp.full((b,), t_cache["index"], jnp.int32))
        d_cache = dict(d_cache, index=jnp.full((b,), d_cache["index"], jnp.int32))
    first = jnp.argmax(t_logits[:, -1, :].astype(jnp.float32), -1).astype(jnp.int32)
    base_pos = positions[:, -1] + 1  # position of out[0], per row

    out = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
    out = out.at[:, 0].set(first)
    finished0 = first == eos_token_id
    n_out0 = jnp.full((b,) if not lockstep else (), 1, jnp.int32)

    rows = jnp.arange(b, dtype=jnp.int32)

    def cond(carry):
        _, n_out, _, _, _, finished = carry
        return jnp.any((n_out < max_new_tokens) & ~finished)

    def body(carry):
        out, n_out, t_cache, d_cache, last_tok, finished = carry
        ones1 = jnp.ones((b, 1), jnp.int32)

        # ---- draft gamma tokens autoregressively --------------------------
        def d_step(dc, i):
            d_cache, tok = dc
            pos = (base_pos + n_out - 1 + i)[:, None]
            lg, d_cache = draft_fwd(tok[:, None], ones1, pos, d_cache)
            nxt = jnp.argmax(lg[:, -1, :].astype(jnp.float32), -1).astype(jnp.int32)
            return (d_cache, nxt), nxt

        (d_cache, _), drafts = jax.lax.scan(
            d_step, (d_cache, last_tok), jnp.arange(gamma)
        )
        drafts = drafts.T  # (B, gamma); drafts[:, i] follows block[:, i]

        # ---- target verifies the block in one forward ----------------------
        block = jnp.concatenate([last_tok[:, None], drafts[:, :-1]], axis=1)
        pos = (base_pos + n_out - 1)[:, None] + jnp.arange(gamma)[None, :]
        t_logits, t_cache = target_fwd(
            block, jnp.ones((b, gamma), jnp.int32), pos, t_cache
        )
        t_pred = jnp.argmax(t_logits.astype(jnp.float32), -1).astype(jnp.int32)

        # per-row agreeing prefix
        prefix = jnp.cumprod((t_pred == drafts).astype(jnp.int32), axis=1)
        n_acc = jnp.where(finished, gamma, prefix.sum(axis=1))
        if lockstep:
            a = jnp.min(n_acc)  # scalar: the batch advances together
        else:
            a = n_acc  # (B,): each row advances by its own prefix

        # emit a accepted drafts + (if a < gamma) the target's correction
        n_emit = jnp.minimum(
            jnp.where(a < gamma, a + 1, gamma), max_new_tokens - n_out
        )
        safe_a = jnp.minimum(a, gamma - 1)  # scalar or (B,) — both gather fine
        correction = t_pred[rows, safe_a]  # greedy token after the prefix

        def emit_one(carry, i):
            out, finished, last_tok = carry
            tok = jnp.where(i < a, drafts[:, i], correction)
            tok = jnp.where(finished, pad_token_id, tok)
            write = (i < n_emit) & (n_out + i < max_new_tokens)
            col = jnp.clip(n_out + i, 0, max_new_tokens - 1)
            if col.ndim == 0:
                col = jnp.full((b,), col, jnp.int32)
            cur = out[rows, col]
            out = out.at[rows, col].set(jnp.where(write, tok, cur))
            last_tok = jnp.where(write & ~finished, tok, last_tok)
            finished = finished | (write & (tok == eos_token_id))
            return (out, finished, last_tok), None

        (out, finished, last_tok), _ = jax.lax.scan(
            emit_one, (out, finished, last_tok), jnp.arange(gamma)
        )

        # restore the cache invariant: index = S + (n_out + n_emit) - 1
        commit = t_cache["index"] - gamma + n_emit
        t_cache = dict(t_cache, index=commit)
        d_cache = dict(d_cache, index=commit)
        return (out, n_out + n_emit, t_cache, d_cache, last_tok, finished)

    carry = (out, n_out0, t_cache, d_cache, first, finished0)
    out_final = jax.lax.while_loop(cond, body, carry)[0]
    return jnp.concatenate([input_ids, out_final], axis=1)
