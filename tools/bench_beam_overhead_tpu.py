#!/usr/bin/env python
"""Localize the eval-shape beam-search bookkeeping cost on real TPU.

VERDICT r3 accounting at the reference eval shape (bs=1, beams=3,
max_new=5, 32L int8): 71.5 ms/question = ~20 ms bind+prefill + ~33 ms
decode forwards + **~18 ms unexplained beam bookkeeping**.  This tool
brackets the bookkeeping by timing, at identical shapes:

- ``bookkeeping``: ``beam_generate`` with a STUB forward (logits derive
  from one cheap data-dependent op; KV cache is a real-shaped pytree so
  the per-step tail gather costs what it costs in production) — pure
  scan + transition + cache-gather overhead, no model compute.
- ``greedy_book``: same stub under ``greedy_generate`` — the scan/emit
  floor without beam bookkeeping, so (bookkeeping - greedy_book) is the
  beam-specific part.
- ``topk_*``: the transition's dominant ops in isolation, timed as a
  fori_loop over REPS iterations with a serial data dependence:
  ``topk_flat``   — lax.top_k over (B, K*V) for 2K (the shipped form)
  ``topk_2stage`` — per-beam lax.top_k over V for 2K, then a (B, K*2K)
                    combine top_k (exact: every global top-2K candidate
                    is within its own beam's top-2K)
  ``logsoftmax``  — jax.nn.log_softmax over (B, K, V)
  ``gather``      — the per-step cache tail gather at the eval shape

Run on the chip: python tools/bench_beam_overhead_tpu.py [modes...]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = int(os.environ.get("BO_B", 1))
K = int(os.environ.get("BO_K", 3))
V = int(os.environ.get("BO_V", 32000))
MAX_NEW = int(os.environ.get("BO_MAX_NEW", 5))
PROMPT = int(os.environ.get("BO_PROMPT", 64))
L = int(os.environ.get("BO_L", 32))
REPS = int(os.environ.get("BO_REPS", 64))


def timeit(fn, args, reps=3):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main(modes):
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.decode import beam_generate, greedy_generate
    from licv_vqa_tpu.models.config import DecoderConfig
    from licv_vqa_tpu.models.decoder import init_kv_cache
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    print(f"backend={jax.default_backend()} B={B} K={K} V={V} "
          f"max_new={MAX_NEW} prompt={PROMPT} L={L}", flush=True)
    enable_compilation_cache()

    cfg = DecoderConfig(
        vocab_size=V, d_model=4096, n_layers=L, n_heads=32, n_kv_heads=32,
        d_ff=11008, norm_type="rmsnorm", activation="silu_glu",
        positional="rope", dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    base_logits = jnp.asarray(rng.normal(size=(V,)).astype(np.float32))
    ids = jnp.asarray(rng.integers(3, V, size=(B, PROMPT)).astype(np.int32))
    mask = jnp.ones((B, PROMPT), jnp.int32)

    def make_stub():
        def fwd(tok, m, pos, cache):
            # data-dependent, trivially cheap: logits shift by the last
            # token id so nothing constant-folds; cache passes through
            # REAL-SHAPED so the beam tail gather pays production bytes
            rows = tok.shape[0]
            shift = (tok[:, -1].astype(jnp.float32) * 1e-6)[:, None]
            lg = jnp.broadcast_to(base_logits, (rows, V)) + shift
            if cache is None:  # prefill: fresh cache at the caller's batch
                cache = init_kv_cache(cfg, rows, PROMPT + MAX_NEW + 1)
                return (
                    jnp.broadcast_to(lg[:, None, :], (rows, m.shape[1], V)),
                    cache,
                )
            return lg[:, None, :], cache

        return fwd

    results = {}
    if "bookkeeping" in modes:
        stub = make_stub()

        @jax.jit
        def book(ids, mask):
            return beam_generate(
                stub, ids, mask, max_new_tokens=MAX_NEW, eos_token_id=2,
                pad_token_id=0, num_beams=K,
            )

        dt = timeit(book, (ids, mask))
        results["bookkeeping"] = dt
        print(f"beam bookkeeping (stub fwd): {dt*1e3:7.2f} ms/question", flush=True)

    if "greedy_book" in modes:
        stub = make_stub()

        @jax.jit
        def gbook(ids, mask):
            return greedy_generate(
                stub, ids, mask, max_new_tokens=MAX_NEW, eos_token_id=2,
                pad_token_id=0,
            )

        dt = timeit(gbook, (ids, mask))
        results["greedy_book"] = dt
        print(f"greedy bookkeeping (stub fwd): {dt*1e3:7.2f} ms/question", flush=True)

    scores0 = jnp.asarray(rng.normal(size=(B, K, V)).astype(np.float32))

    def loop(body):
        # serial dependence via a score perturbation so XLA can't CSE/elide
        def f(x):
            def it(i, carry):
                x, acc = carry
                out = body(x)
                acc = acc + out
                return (x * 0.999 + acc * 1e-9, acc)

            _, acc = jax.lax.fori_loop(0, REPS, it, (x, jnp.float32(0)))
            return acc

        return jax.jit(f)

    if "logsoftmax" in modes:
        dt = timeit(
            loop(lambda x: jnp.sum(jax.nn.log_softmax(x, axis=-1)[:, :, 0])),
            (scores0,),
        )
        results["logsoftmax"] = dt / REPS
        print(f"log_softmax (B,K,V): {dt/REPS*1e3:7.3f} ms/call", flush=True)

    if "topk_flat" in modes:
        def body(x):
            s, i = jax.lax.top_k(x.reshape(B, K * V), 2 * K)
            return jnp.sum(s) + jnp.sum(i).astype(jnp.float32) * 1e-9

        dt = timeit(loop(body), (scores0,))
        results["topk_flat"] = dt / REPS
        print(f"top_k flat (B, K*V) -> 2K: {dt/REPS*1e3:7.3f} ms/call", flush=True)

    if "topk_2stage" in modes:
        def body(x):
            s1, i1 = jax.lax.top_k(x.reshape(B * K, V), 2 * K)  # per-beam
            s2, i2 = jax.lax.top_k(s1.reshape(B, K * 2 * K), 2 * K)
            return jnp.sum(s2) + (jnp.sum(i1) + jnp.sum(i2)).astype(jnp.float32) * 1e-9

        dt = timeit(loop(body), (scores0,))
        results["topk_2stage"] = dt / REPS
        print(f"top_k 2-stage (per-beam V then K*2K): {dt/REPS*1e3:7.3f} ms/call",
              flush=True)

    if "gather" in modes:
        from licv_vqa_tpu.infer.decode import _beam_gather_cache

        cache = init_kv_cache(cfg, B * K, PROMPT + MAX_NEW + 1)
        cache = dict(cache, index=jnp.asarray(PROMPT, jnp.int32))
        sel = jnp.zeros((B * K,), jnp.int32)

        @jax.jit
        def g(cache, sel):
            def it(i, c):
                c = _beam_gather_cache(c, sel + (i % K), PROMPT)
                return c

            return jax.lax.fori_loop(0, REPS, it, cache)

        dt = timeit(g, (cache, sel))
        results["gather"] = dt / REPS
        print(f"cache tail gather: {dt/REPS*1e3:7.3f} ms/call", flush=True)

    return results


if __name__ == "__main__":
    main(sys.argv[1:] or [
        "bookkeeping", "greedy_book", "logsoftmax", "topk_flat",
        "topk_2stage", "gather",
    ])
