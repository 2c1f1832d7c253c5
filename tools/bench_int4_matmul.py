#!/usr/bin/env python
"""Micro-bench: int4 weight-only matmul strategies at decode shapes (v5e).

Same question as tools/bench_int8_matmul.py one bit level down: int4 streams
HALF of int8's weight bytes, but group-wise scales vary ALONG the
contraction, so the int8 scale-on-output trick is unavailable and XLA's
fallback materializes a dequantized bf16 weight (3x+ traffic).  Candidates:

  a) dequant-then-dot   — XLA fallback (unpack + widen + group scale + dot)
  b) pallas kernel      — ops/int4_matmul.py (VMEM unpack, MXU consumes)
  c) int8 pallas ref    — the production int8 path (2x the int4 bytes)
  d) bf16 reference     — plain bf16 dot (4x the int4 bytes)

Reports achieved HBM GB/s per variant (weight bytes / time) at the flagship
MLP shape and the attention shape, M=8 and M=64.
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.ops.int4_matmul import int4_matmul_pallas
    from licv_vqa_tpu.ops.int8_matmul import int8_matmul_pallas
    from licv_vqa_tpu.ops.quantize import (
        dequantize_int4,
        quantize_array,
        quantize_array_int4,
    )

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    reps = 100

    def timed(fn, *args):
        def body(_, carry):
            xc = carry
            y = fn(xc, *args[1:])
            return xc + (y[0, 0] * 1e-12).astype(xc.dtype)

        return jax.lax.fori_loop(0, reps, body, args[0])

    for m, k, n in [(8, 4096, 11008), (8, 4096, 4096), (64, 4096, 11008)]:
        print(f"--- M={m} K={k} N={n} ---")
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        leaf4 = jax.jit(quantize_array_int4)(w)
        kg = leaf4["s"].shape[-3]
        g = k // kg
        s2 = leaf4["s"].reshape(kg, n)
        qd8 = jax.jit(quantize_array)(w)
        w_bf16 = w.astype(jnp.bfloat16)

        def v_dequant(x, packed, s):
            return jnp.dot(
                x, dequantize_int4({"q4": packed, "s": s}, jnp.bfloat16)
            )

        def v_pallas4(x, packed, s):
            return int4_matmul_pallas(x, packed, s, g)

        def v_pallas8(x, q, s):
            return int8_matmul_pallas(x, q, s)

        def v_bf16(x, w):
            return jnp.dot(x, w)

        variants = {
            "a_dequant_dot": (v_dequant, (x, leaf4["q4"], leaf4["s"]), k * n // 2),
            "b_pallas_int4": (v_pallas4, (x, leaf4["q4"], s2), k * n // 2),
            "c_pallas_int8": (v_pallas8, (x, qd8["q"], qd8["s"]), k * n),
            "d_bf16_ref": (v_bf16, (x, w_bf16), 2 * k * n),
        }

        ref = np.asarray(v_dequant(x, leaf4["q4"], leaf4["s"]), np.float32)
        got = np.asarray(v_pallas4(x, leaf4["q4"], s2), np.float32)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"b_pallas_int4: max rel diff vs dequant-dot = {rel:.4f}")
        assert rel < 2e-2, rel

        for name, (f, args, bytes_) in variants.items():
            fn = jax.jit(functools.partial(timed, f))
            np.asarray(fn(*args))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(fn(*args)[0, 0])
            dt = (time.perf_counter() - t0) / reps
            print(
                f"{name}: {dt*1e6:.0f} us, "
                f"{bytes_/dt/1e9:.0f} GB/s weight stream"
            )


if __name__ == "__main__":
    main()
