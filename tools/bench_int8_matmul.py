#!/usr/bin/env python
"""Micro-bench: int8 weight-only matmul strategies at decode shapes (v5e).

Decode is weight-bandwidth bound; the question is whether XLA's fusion of
``(q.int8 -> f32 * s -> bf16) @ x`` streams int8 bytes from HBM (good) or
materializes a dequantized bf16 copy (3x traffic).  Candidates:

  a) dequant-then-dot   — current ``dequantize_tree`` path
  b) scale-on-output    — ``(x @ q.astype(bf16)) * s`` (scale commutes with
                           the contraction for per-OUTPUT-channel scales)
  c) pallas kernel      — tile-wise dequant in VMEM (ops/int8_matmul.py)
  d) bf16 reference     — plain bf16 dot (2x the int8 bytes)

Reports achieved HBM GB/s per variant (weight bytes / time).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.ops.quantize import quantize_array
    from licv_vqa_tpu.ops.int8_matmul import int8_matmul_pallas

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    m, k, n = 8, 4096, 11008
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
    qd = jax.jit(quantize_array)(w)
    q, s = qd["q"], qd["s"]
    w_bf16 = w.astype(jnp.bfloat16)

    def v_dequant(x, q, s):
        wd = (q.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return jnp.dot(x, wd)

    def v_scale_out(x, q, s):
        y = jnp.dot(x, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return (y * s).astype(jnp.bfloat16)

    def v_pallas(x, q, s):
        return int8_matmul_pallas(x, q, s)

    def v_bf16(x, w):
        return jnp.dot(x, w)

    variants = {
        "a_dequant_dot": (jax.jit(v_dequant), (x, q, s), k * n),
        "b_scale_output": (jax.jit(v_scale_out), (x, q, s), k * n),
        "c_pallas": (jax.jit(v_pallas), (x, q, s), k * n),
        "d_bf16_ref": (jax.jit(v_bf16), (x, w_bf16), 2 * k * n),
    }

    # correctness first
    ref = np.asarray(v_dequant(x, q, s), np.float32)
    for name in ("b_scale_output", "c_pallas"):
        f, args, _ = variants[name]
        got = np.asarray(f(*args), np.float32)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name}: max rel diff vs dequant-dot = {rel:.4f}")
        assert rel < 2e-2, (name, rel)

    # Time `reps` serially-dependent calls inside ONE jit (per-call host sync
    # through the axon tunnel costs ~30 ms and would swamp a ~100 us matmul).
    reps = 100
    import functools

    def timed(fn, *args):
        def body(_, carry):
            xc = carry
            y = fn(xc, *args[1:])
            # serial dependency: perturb x by a scalar of y so iterations
            # cannot be CSE'd; the weight stream repeats every iteration
            return xc + (y[0, 0] * 1e-12).astype(xc.dtype)

        return jax.lax.fori_loop(0, reps, body, args[0])

    for name, (f, args, bytes_) in variants.items():
        fn = jax.jit(functools.partial(timed, f.__wrapped__))
        np.asarray(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0, 0])  # hard sync via host readback
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e6:.0f} us, {bytes_/dt/1e9:.0f} GB/s weight stream")


if __name__ == "__main__":
    main()
