#!/usr/bin/env python
"""Isolated decode-attention cost by cache layout (bs=64 serving gap).

bench_decode_breakdown shows attention+cache adds ~16 ms/step at bs=64 —
3-6× its HBM read bound — while the matmuls run at speed-of-light.  This
micro-bench times JUST the per-step cached attention (q len 1 against an
(L, …, S, …) cache threaded through a layer scan, like production) under
different cache layouts, to find whether XLA materializes transposes:

- ``bshd``: production layout (L,B,S,H,D), einsum bqhd,bkhd→bhqk.
- ``bhsd``: head-major (L,B,H,S,D), einsum contracting in-layout.

Run: python tools/bench_attn_decode_micro.py [BS] [S]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
S = int(sys.argv[2]) if len(sys.argv) > 2 else 97
L = 32
H = 32
D = 128
STEPS = 32


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BS, 1, H, D)).astype(np.float32), jnp.bfloat16)
    mask = jnp.asarray(rng.random((BS, 1, 1, S)) < 0.9)

    read_gb = L * BS * S * H * D * 2 * 2 / 1e9
    print(f"BS={BS} S={S}: K+V read/step = {read_gb:.2f} GB "
          f"(~{read_gb/0.615:.1f} ms at 615 GB/s)", flush=True)

    def timeit(fn, *args):
        out = fn(*args)
        np.asarray(out).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(fn(*args)).ravel()[:1]
        return (time.perf_counter() - t0) / 3

    scale = 1.0 / np.sqrt(D)

    # ---- production layout (L,B,S,H,D) --------------------------------
    kc = jnp.asarray(rng.normal(size=(L, BS, S, H, D)).astype(np.float32), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(L, BS, S, H, D)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def run_bshd(q, kc, vc, mask):
        def body(h, kv):
            k, v = kv
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            return h + o.astype(h.dtype).reshape(h.shape), None

        def step(h, _):
            h, _ = jax.lax.scan(body, h, (kc, vc))
            return h, None

        h0 = jnp.zeros((BS, H * D), jnp.bfloat16)
        h, _ = jax.lax.scan(step, h0, None, length=STEPS)
        return h

    dt = timeit(run_bshd, q, kc, vc, mask)
    print(f"bshd : {dt*1e3/STEPS:7.2f} ms/step "
          f"({STEPS*read_gb/dt:.0f} GB/s effective)", flush=True)

    # ---- head-major (L,B,H,S,D) --------------------------------------
    kh = jnp.transpose(kc, (0, 1, 3, 2, 4))
    vh = jnp.transpose(vc, (0, 1, 3, 2, 4))
    kh = jax.block_until_ready(kh + 0)
    vh = jax.block_until_ready(vh + 0)
    qh = jnp.transpose(q, (0, 2, 1, 3))  # (B,H,1,D)
    mh = mask  # (B,1,1,S) broadcasts over heads either way

    @jax.jit
    def run_bhsd(qh, kh, vh, mask):
        def body(h, kv):
            k, v = kv  # (B,H,S,D)
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, k,
                           preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            return h + o.astype(h.dtype).reshape(h.shape), None

        def step(h, _):
            h, _ = jax.lax.scan(body, h, (kh, vh))
            return h, None

        h0 = jnp.zeros((BS, H * D), jnp.bfloat16)
        h, _ = jax.lax.scan(step, h0, None, length=STEPS)
        return h

    dt = timeit(run_bhsd, qh, kh, vh, mh)
    print(f"bhsd : {dt*1e3/STEPS:7.2f} ms/step "
          f"({STEPS*read_gb/dt:.0f} GB/s effective)", flush=True)

    # ---- round-2 production pattern: inner scan ys = FULL updated cache
    # (write the row then attend the update; the ys stacking materializes a
    # brand-new (L,B,S,H,D) K and V every decode step even though only one
    # row changed — replaced in decoder.py by the row-update pattern below)
    kn = jnp.asarray(rng.normal(size=(BS, 1, H, D)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def run_xsys_full(q, kc, vc, mask, kn):
        def body(h, kv):
            k, v = kv  # (B,S,H,D) old
            k = jax.lax.dynamic_update_slice(k, kn, (0, S - 1, 0, 0))
            v = jax.lax.dynamic_update_slice(v, kn, (0, S - 1, 0, 0))
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            return h + o.astype(h.dtype).reshape(h.shape), (k, v)

        def step(carry, _):
            h, kc, vc = carry
            h, kv = jax.lax.scan(body, h, (kc, vc))
            return (h, kv[0], kv[1]), None

        h0 = jnp.zeros((BS, H * D), jnp.bfloat16)
        (h, kc, vc), _ = jax.lax.scan(step, (h0, kc, vc), None, length=STEPS)
        return h

    dt = timeit(run_xsys_full, q, kc, vc, mask, kn)
    print(f"xsys_full: {dt*1e3/STEPS:7.2f} ms/step "
          f"({STEPS*read_gb/dt:.0f} GB/s effective)", flush=True)

    # ---- candidate: ys = new row only; ONE bulk cache update per step --
    # each layer attends (old cache rows, masked) + the current token's
    # k/v appended virtually; the stacked (L,B,1,H,D) new rows update the
    # carried cache with a single dynamic_update_slice per step
    @jax.jit
    def run_xsys_row(q, kc, vc, mask, kn):
        def body(h, kv):
            k, v = kv  # OLD cache (B,S,H,D); current col masked invalid
            s_c = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                             preferred_element_type=jnp.float32) * scale
            s_c = jnp.where(mask, s_c, jnp.finfo(jnp.float32).min)
            s_n = jnp.einsum("bqhd,bqhd->bhq", q, kn,
                             preferred_element_type=jnp.float32)[..., None] * scale
            s_all = jnp.concatenate([s_c, s_n], axis=-1)
            p = jax.nn.softmax(s_all, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p[..., :S].astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            o = o + p[..., S:].transpose(0, 3, 1, 2) * kn.astype(jnp.float32)
            return h + o.astype(h.dtype).reshape(h.shape), (kn, kn)

        def step(carry, _):
            h, kc, vc = carry
            h, rows = jax.lax.scan(body, h, (kc, vc))
            kc = jax.lax.dynamic_update_slice(
                kc, rows[0], (0, 0, S - 1, 0, 0)
            )
            vc = jax.lax.dynamic_update_slice(
                vc, rows[1], (0, 0, S - 1, 0, 0)
            )
            return (h, kc, vc), None

        h0 = jnp.zeros((BS, H * D), jnp.bfloat16)
        (h, kc, vc), _ = jax.lax.scan(step, (h0, kc, vc), None, length=STEPS)
        return h

    dt = timeit(run_xsys_row, q, kc, vc, mask, kn)
    print(f"xsys_row : {dt*1e3/STEPS:7.2f} ms/step "
          f"({STEPS*read_gb/dt:.0f} GB/s effective)", flush=True)


if __name__ == "__main__":
    main()
