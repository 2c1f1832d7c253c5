#!/usr/bin/env python
"""Chip experiment: where does w8a8 prefill lose to the 394-TOPS int8 peak?

bench_prefill_tpu measured the XLA w8a8 path at 53-66% of the v5e int8 peak
at flagship prefill shapes (the bs=64 serving headline's biggest MFU sink
after the ViT tower).  Decompose the loss and A/B a Pallas s8s8 kernel:

  a_bf16        — dense bf16 dot (the 197-TFLOP baseline w8a8 must beat)
  b_w8a8_xla    — shipped path (ops/int8_matmul._w8a8_dot): per-row act
                  quantize + XLA s8s8s32 dot_general + scales on the acc
  c_s8s8_xla    — same dot with PRE-quantized activations: isolates the
                  activation-quantize prologue from the matmul itself
  d_pallas      — Pallas s8s8 kernel, pre-quantized acts (tile sweep)
  e_pallas_fused— Pallas kernel quantizing activation rows IN-kernel from
                  the bf16 tile (absmax over the full K block)

Shapes: flagship decoder prefill matmuls (d=4096, d_ff=11008) at serving
token counts M = bs*prompt (bs=64 x 64 = 4096) and the teacher length
(bs=8 x 2048 = 16384).  Timing: reps serially-dependent calls inside one
jit (the axon relay's ~30 ms/call sync would swamp per-call timing).
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

INT8_PEAK_TOPS = 394e12
BF16_PEAK_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from licv_vqa_tpu.ops.int8_matmul import quantize_act_rows
    from licv_vqa_tpu.ops.quantize import quantize_array

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    reps = 30

    def timed(fn, x0, *rest):
        def body(_, carry):
            y = fn(carry, *rest)
            # depend on EVERY output element: a [0,0] probe lets XLA slice
            # the dot to one row (dead-code-eliminating 99.97% of the FLOPs
            # — observed as "186% of peak")
            return carry + (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(
                carry.dtype
            )

        return jax.lax.fori_loop(0, reps, body, x0)

    def w8a8_kernel(x_ref, xs_ref, q_ref, s_ref, o_ref):
        acc = jnp.dot(x_ref[:], q_ref[:], preferred_element_type=jnp.int32)
        o_ref[:] = (
            acc.astype(jnp.float32) * xs_ref[:] * s_ref[:]
        ).astype(o_ref.dtype)

    def w8a8_fused_kernel(x_ref, q_ref, s_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        xs = jnp.maximum(absmax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        acc = jnp.dot(xq, q_ref[:], preferred_element_type=jnp.int32)
        o_ref[:] = (acc.astype(jnp.float32) * xs * s_ref[:]).astype(o_ref.dtype)

    def pallas_w8a8(xq, xs, q, s, mt, nt):
        m, k = xq.shape
        _, n = q.shape
        return pl.pallas_call(
            w8a8_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            grid=(m // mt, n // nt),
            in_specs=[
                pl.BlockSpec((mt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (mt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        )(xq, xs.astype(jnp.float32), q, s.astype(jnp.float32))

    def pallas_w8a8_fused(x, q, s, mt, nt):
        m, k = x.shape
        _, n = q.shape
        return pl.pallas_call(
            w8a8_fused_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            grid=(m // mt, n // nt),
            in_specs=[
                pl.BlockSpec((mt, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (mt, nt), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        )(x, q, s.astype(jnp.float32))

    shapes = [
        (4096, 4096, 11008),   # bs=64 serving prefill, MLP-in
        (4096, 11008, 4096),   # MLP-out
    ]
    if "--wide" in sys.argv:
        shapes += [(4096, 4096, 4096), (16384, 4096, 11008)]
    for m, k, n in shapes:
        x = jnp.asarray(
            rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16
        )
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        qd = jax.jit(quantize_array)(w)
        q, s = qd["q"], qd["s"]
        wb = w.astype(jnp.bfloat16)
        xq, xs = jax.jit(quantize_act_rows)(x)
        jax.block_until_ready((x, q, s, wb, xq, xs))
        flops = 2.0 * m * k * n

        def b_w8a8(xv, q, s):
            from licv_vqa_tpu.ops.int8_matmul import _w8a8_dot

            return _w8a8_dot(xv, q, s, jnp.bfloat16)

        def c_s8s8(xqv, xs, q, s):
            acc = jax.lax.dot_general(
                xqv, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (acc.astype(jnp.float32) * xs * s).astype(jnp.bfloat16)

        # c takes the int8 plane as the CARRY (serial dep on an int8 array
        # is awkward) — instead carry x bf16 and close over xq: perturb via
        # a fresh dot input each rep is unnecessary; weights re-stream per
        # rep either way.  Use a trivial int8 carry perturbation instead.
        variants = {
            "a_bf16": (lambda xv: jnp.dot(xv, wb), (x,), BF16_PEAK_FLOPS),
            "b_w8a8_xla": (lambda xv: b_w8a8(xv, q, s), (x,), INT8_PEAK_TOPS),
            "c_s8s8_xla": (
                lambda xv: c_s8s8(xq, xs, q, s) + 0 * xv[0, 0].astype(jnp.bfloat16),
                (x,),
                INT8_PEAK_TOPS,
            ),
        }
        tiles = (
            ((256, 256), (512, 256), (256, 512), (512, 512), (1024, 256))
            if "--wide" in sys.argv
            else ((256, 256), (512, 512))
        )
        for mt, nt in tiles:
            if m % mt or n % nt:
                continue
            vmem = mt * k + k * nt + 2 * (mt * k + k * nt) // 2  # rough db
            if (mt * k + k * nt) * 2 + mt * nt * 4 > 14 * 1024 * 1024:
                continue
            variants[f"d_pallas_{mt}x{nt}"] = (
                functools.partial(
                    lambda xv, mt=mt, nt=nt: pallas_w8a8(xq, xs, q, s, mt, nt)
                    + 0 * xv[0, 0].astype(jnp.bfloat16)
                ),
                (x,),
                INT8_PEAK_TOPS,
            )
            variants[f"e_pallas_fused_{mt}x{nt}"] = (
                functools.partial(
                    lambda xv, mt=mt, nt=nt: pallas_w8a8_fused(xv, q, s, mt, nt)
                ),
                (x,),
                INT8_PEAK_TOPS,
            )

        # correctness vs the shipped w8a8 path
        ref = np.asarray(
            jax.jit(lambda: b_w8a8(x, q, s))(), np.float32
        )
        only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
        print(f"== M={m} K={k} N={n} ==", flush=True)
        for name, (f, args, peak) in variants.items():
            if only and not any(name.startswith(p) for p in only[0].split(",")):
                continue
            try:
                fj = jax.jit(f)
                got = np.asarray(fj(*args), np.float32)
                if name != "a_bf16":
                    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
                    assert rel < 2e-2, (name, rel)
                tfn = jax.jit(functools.partial(timed, f))
                np.asarray(tfn(*args)[0, 0])  # compile + warm
                t0 = time.perf_counter()
                np.asarray(tfn(*args)[0, 0])
                dt = (time.perf_counter() - t0) / reps
                print(
                    f"  {name:24s} {dt*1e6:8.0f} us  "
                    f"{flops/dt/peak*100:5.1f}% of peak",
                    flush=True,
                )
            except Exception as e:
                print(f"  {name:24s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
