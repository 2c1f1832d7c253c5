#!/usr/bin/env python
"""Scratch experiment: in-kernel int4 unpack schedules on the real chip.

All variants compute y = x @ (unpack(packed) * s) at the flagship MLP decode
shape with the PRODUCTION grid structure (N x K-step grid, revisited f32
accumulator, half-plane K packing) so wall times are comparable to
ops/int4_matmul.py.  Variants differ only in the nibble->bf16 schedule:

  a) int32 mask/shift, f32 scale+dot        (current production kernel)
  d) uint8 mask/shift -> i8 -> bf16, bias folded into per-group
     correction dots (removes the per-weight subtract; 8-bit lane masks)
  e) SIGNED nibbles, i8 arithmetic shifts sign-extend ((u<<4)>>4, u>>4),
     -> bf16, scale in bf16 (no bias anywhere)

Findings feed ops/int4_matmul.py; this file is a lab notebook, not API.
"""
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N, G = 8, 4096, 11008, 64
TK, NT = 512, 256


def body_a(g, x_lo, x_hi, pk, s_lo, s_hi, acc):
    w8 = pk[:].astype(jnp.int32)
    lo = ((w8 & 15) - 8).astype(jnp.float32)
    hi = ((w8 >> 4) - 8).astype(jnp.float32)
    tk, nt = lo.shape
    gk = tk // g
    wlo = (lo.reshape(gk, g, nt) * s_lo[0].reshape(gk, 1, nt)).reshape(tk, nt)
    whi = (hi.reshape(gk, g, nt) * s_hi[0].reshape(gk, 1, nt)).reshape(tk, nt)
    acc[:] += jnp.dot(
        x_lo[:].astype(jnp.float32), wlo, preferred_element_type=jnp.float32
    ) + jnp.dot(x_hi[:].astype(jnp.float32), whi, preferred_element_type=jnp.float32)


def body_d(g, x_lo, x_hi, pk, s_lo, s_hi, acc):
    u = pk[:]
    lo = (u & 15).astype(jnp.int8).astype(jnp.bfloat16)  # biased +8
    hi = (u >> 4).astype(jnp.int8).astype(jnp.bfloat16)
    tk, nt = lo.shape
    gk = tk // g
    sl = s_lo[0].astype(jnp.bfloat16)  # (gk, nt)
    sh = s_hi[0].astype(jnp.bfloat16)
    wlo = (lo.reshape(gk, g, nt) * sl.reshape(gk, 1, nt)).reshape(tk, nt)
    whi = (hi.reshape(gk, g, nt) * sh.reshape(gk, 1, nt)).reshape(tk, nt)
    xl = x_lo[:].astype(jnp.bfloat16)
    xh = x_hi[:].astype(jnp.bfloat16)
    # bias correction: subtract 8 * sum_g(x) @ s  (two (M,gk)@(gk,nt) dots)
    xgl = jnp.sum(xl.reshape(-1, gk, g), axis=-1)
    xgh = jnp.sum(xh.reshape(-1, gk, g), axis=-1)
    acc[:] += (
        jnp.dot(xl, wlo, preferred_element_type=jnp.float32)
        + jnp.dot(xh, whi, preferred_element_type=jnp.float32)
        - 8.0 * jnp.dot(xgl, sl, preferred_element_type=jnp.float32)
        - 8.0 * jnp.dot(xgh, sh, preferred_element_type=jnp.float32)
    )


def body_e(g, x_lo, x_hi, pk, s_lo, s_hi, acc):
    w8 = pk[:].astype(jnp.int8)  # bitcast width-preserving
    lo = ((w8 << 4) >> 4).astype(jnp.bfloat16)  # sign-extend low nibble
    hi = (w8 >> 4).astype(jnp.bfloat16)  # arithmetic shift
    tk, nt = lo.shape
    gk = tk // g
    sl = s_lo[0].astype(jnp.bfloat16)
    sh = s_hi[0].astype(jnp.bfloat16)
    wlo = (lo.reshape(gk, g, nt) * sl.reshape(gk, 1, nt)).reshape(tk, nt)
    whi = (hi.reshape(gk, g, nt) * sh.reshape(gk, 1, nt)).reshape(tk, nt)
    acc[:] += jnp.dot(
        x_lo[:].astype(jnp.bfloat16), wlo, preferred_element_type=jnp.float32
    ) + jnp.dot(x_hi[:].astype(jnp.bfloat16), whi, preferred_element_type=jnp.float32)


def body_f(g, x_lo, x_hi, pk, s_lo, s_hi, acc):
    # MIXED-PLANE packing: low nibble = q_lo + 8 (biased), high nibble =
    # q_hi two's complement.  No shifts (Mosaic rejects 8-bit shifts):
    #   lo:  (u & 15)  as i8 -> bf16        = q_lo + 8   (bias corrected)
    #   hi:  (u & 0xF0) as i8 -> bf16       = 16 * q_hi  (exact signed)
    # s_hi arrives PRE-DIVIDED by 16 so the 16x folds into the scale.
    u = pk[:]
    lo = (u & 15).astype(jnp.int8).astype(jnp.bfloat16)
    hi = (u & 0xF0).astype(jnp.int8).astype(jnp.bfloat16)
    tk, nt = lo.shape
    gk = tk // g
    sl = s_lo[0].astype(jnp.bfloat16)
    sh = s_hi[0].astype(jnp.bfloat16)  # = s/16
    wlo = (lo.reshape(gk, g, nt) * sl.reshape(gk, 1, nt)).reshape(tk, nt)
    whi = (hi.reshape(gk, g, nt) * sh.reshape(gk, 1, nt)).reshape(tk, nt)
    # +8 bias of the low plane is corrected OUTSIDE the kernel (a tiny
    # (M, K/2G) @ (K/2G, N) XLA matmul) — an in-kernel (8, gk) dot
    # crashes Mosaic.
    acc[:] += jnp.dot(
        x_lo[:].astype(jnp.bfloat16), wlo, preferred_element_type=jnp.float32
    ) + jnp.dot(
        x_hi[:].astype(jnp.bfloat16), whi, preferred_element_type=jnp.float32
    )


def make_fn(body, g=G):
    def kern(x_lo, x_hi, pk, s_lo, s_hi, o_ref, acc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _zero():
            acc[:] = jnp.zeros_like(acc)

        body(g, x_lo, x_hi, pk, s_lo, s_hi, acc)

        @pl.when(t == pl.num_programs(1) - 1)
        def _flush():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    k2 = K // 2
    kt = k2 // TK
    gk = TK // G

    @jax.jit
    def fn(x, pk, s3):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            grid=(N // NT, kt),
            in_specs=[
                pl.BlockSpec((M, TK), lambda j, t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, TK), lambda j, t: (0, kt + t), memory_space=pltpu.VMEM),
                pl.BlockSpec((TK, NT), lambda j, t: (t, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gk, NT), lambda j, t: (t, 0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gk, NT), lambda j, t: (kt + t, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, NT), lambda j, t: (0, j), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, NT), jnp.float32)],
        )(x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), pk, s3, s3)

    return fn


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    q = rng.integers(-7, 8, size=(K, N)).astype(np.int8)
    s = rng.random((K // G, N)).astype(np.float32) * 0.01 + 0.001
    wref = (
        q.astype(np.float32).reshape(K // G, G, N) * s.reshape(K // G, 1, N)
    ).reshape(K, N)
    ref = np.asarray(jnp.dot(x, jnp.asarray(wref)))

    k2 = K // 2
    kt = k2 // TK
    gk = TK // G
    qb = (q + 8).astype(np.uint8)  # biased, for a/d
    pk_biased = jnp.asarray(qb[:k2] | (qb[k2:] << 4))
    qs = q.astype(np.uint8) & 0xF  # two's-complement nibbles, for e
    pk_signed = jnp.asarray(qs[:k2] | (qs[k2:] << 4))
    s3 = jnp.asarray(s).reshape(2 * kt, gk, N)

    # mixed-plane pack for f: lo biased, hi two's complement
    pk_mixed = jnp.asarray((qb[:k2] & 15) | ((q[k2:].astype(np.uint8) & 0xF) << 4))
    s3_f = np.asarray(s3).copy()
    s3_f[kt:] /= 16.0
    s3_f = jnp.asarray(s3_f)

    s_lo_full = jnp.asarray(s[: k2 // G]).astype(jnp.bfloat16)  # (k2/G, N)
    f_raw = make_fn(body_f)

    @jax.jit
    def f_full(x, pk, sv):
        y = f_raw(x, pk, sv)
        xg = jnp.sum(
            x[:, :k2].astype(jnp.bfloat16).reshape(M, k2 // G, G), axis=-1
        )
        return y - 8.0 * jnp.dot(
            xg, s_lo_full, preferred_element_type=jnp.float32
        )

    variants = {
        "a_int32_f32": (make_fn(body_a), pk_biased, s3),
        "d_u8_i8_bf16_biascorr": (make_fn(body_d), pk_biased, s3),
        "e_i8_arith_shift": (make_fn(body_e), pk_signed, s3),
        "f_mixed_plane_noshift": (f_full, pk_mixed, s3_f),
    }
    fns = {}
    for name, (f, pk, sv) in variants.items():
        try:
            y = np.asarray(f(x, pk, sv))
        except Exception as ex:
            print(f"{name}: FAILED: {str(ex)[:240]}")
            continue
        rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name}: max rel err {rel:.2e}")
        fns[name] = (f, pk, sv)

    reps = 200
    for name, (f, pk, sv) in fns.items():
        def timed(x0, pk, sv):
            def body(_, c):
                y = f(c, pk, sv)
                return c + (y[0, :1] * 1e-12).astype(c.dtype)
            return jax.lax.fori_loop(0, reps, body, x0)

        tf = jax.jit(timed)
        np.asarray(tf(x, pk, sv)[0, 0])
        t0 = time.perf_counter()
        np.asarray(tf(x, pk, sv)[0, 0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e6:.0f} us  ({K*N/2/dt/1e9:.0f} GB/s weight stream)")


if __name__ == "__main__":
    main()
