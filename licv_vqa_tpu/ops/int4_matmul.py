"""Pallas TPU kernel: bf16-activation x nibble-packed-int4-weight matmul.

Decode is weight-bandwidth bound; int4 streams HALF of int8's bytes per
weight.  Unlike int8 — where XLA fuses the ``int8→bf16`` widen into the dot
read, so plain ``jnp.dot(x, q.astype(bf16)) * s`` is already
bandwidth-optimal — the int4 dequant chain (mask/shift + bias + GROUP-wise
scale along the contraction) defeats XLA's operand fusion and the
dequantized bf16 weight gets materialized, erasing the entire byte win
(measured 0.59x vs bf16 end-to-end).  This kernel makes the good schedule
explicit: packed uint8 tiles stream HBM→VMEM, nibbles are unpacked and
scaled in VMEM, and the MXU consumes them immediately.

The unpack is the kernel's real cost (it is VPU work proportional to the
weight count, while the DMA bytes halved), so the schedule is built from
the narrow-lane ops Mosaic actually legalizes on v5e — 8-bit masks and
``i8→bf16`` casts legalize; 8-bit/16-bit shifts, packed-i8 subtraction,
``uint8→bf16`` casts, and bitwidth-changing bitcasts (``uint8→int4``) all
crash the Mosaic compiler (probed on hardware, tools/exp_int4_unpack.py).
That dictates the MIXED-PLANE encoding in ``ops.quantize``:

- low nibble  = ``q_lo + 8`` (biased):    ``(u & 15) as i8 → bf16``
  yields ``q_lo + 8`` — the +8 bias is corrected OUTSIDE the kernel by one
  tiny ``(M, K/2G) @ (K/2G, N)`` matmul, ``y -= 8·(Σ_g x_lo) @ s_lo``
  (an in-kernel (8, gk) dot also crashes Mosaic).
- high nibble = ``q_hi`` two's complement: ``(u & 0xF0) as i8 → bf16``
  yields exactly ``16·q_hi``; the 1/16 folds into the high-plane scales,
  which the wrapper pre-divides.

Per weight pair that is: two 8-bit masks, two i8→bf16 casts, two bf16
scale multiplies — no shifts, no subtracts, nothing at 32-bit lane width.
Group scales are applied in bf16 (products of 4-bit ints and bf16 scales;
the ~2^-9 product rounding is negligible against int4's ~10% quant error).

Layout contract matches ``ops.quantize.quantize_array_int4``:

- ``packed (K/2, N) uint8`` — low nibble = in-feature ``i``, high nibble =
  in-feature ``i + K/2`` (HALF-PLANE packing; each plane is dotted against
  its own half of ``x`` — no interleave ever happens).
- ``s (K/G, N)`` — per-(group, out-channel) scales, groups are G
  consecutive in-features in ORIGINAL order, G | K/2.  The wrapper
  reshapes scales to ``(2*kt, gk, N)`` so each K-step's rows arrive as one
  statically-indexed block (a flat 2-D block would need a dynamic sublane
  slice of TK/G rows, which Mosaic rejects for TK/G < 8 — exactly the
  flagship w_down shape K=11008, TK=128, G=64).

Grid is ``(N/NT, K2/TK)`` with an f32 VMEM accumulator revisited across the
K-steps (output block index depends only on the N index).  ``x`` and the
scale tensor are each passed twice so the low/high halves arrive as
separate statically-mapped blocks.

Measured (v5e, flagship shapes): the kernel beats the XLA fallback 27×
at M=8 K=4096 N=11008 (388 µs vs 10.6 ms — tools/bench_int4_matmul.py),
but the per-weight unpack work caps it at ~163 GB/s effective in the 32L
decode scan: 21.1 ms/step matmul-only vs int8's 10.0 ms (647 GB/s).
Halving the bytes does NOT halve the time because v5e Mosaic has no
native s4 path and the VPU unpack is proportional to weight COUNT.  So
on this hardware int4 is a CAPACITY feature (3.44 GB vs 6.5 GB for the
flagship stack — fits ~2× the model per chip), not a decode-throughput
feature; ``lmm.quantize=int8`` remains the serving default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(g: int, x_lo, x_hi, pk, s_lo_ref, s_hi_ref, o_ref, acc):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    u = pk[:]  # (tk, nt) uint8
    lo = (u & 15).astype(jnp.int8).astype(jnp.bfloat16)  # = q_lo + 8
    hi = (u & 0xF0).astype(jnp.int8).astype(jnp.bfloat16)  # = 16 * q_hi
    tk, nt = lo.shape
    gk = tk // g
    sl = s_lo_ref[0].astype(jnp.bfloat16)  # (gk, nt)
    sh = s_hi_ref[0].astype(jnp.bfloat16)  # (gk, nt), pre-divided by 16
    wlo = (lo.reshape(gk, g, nt) * sl.reshape(gk, 1, nt)).reshape(tk, nt)
    whi = (hi.reshape(gk, g, nt) * sh.reshape(gk, 1, nt)).reshape(tk, nt)
    acc[:] += jnp.dot(
        x_lo[:].astype(jnp.bfloat16), wlo, preferred_element_type=jnp.float32
    ) + jnp.dot(
        x_hi[:].astype(jnp.bfloat16), whi, preferred_element_type=jnp.float32
    )

    @pl.when(t == pl.num_programs(1) - 1)
    def _flush():
        o_ref[:] = acc[:].astype(o_ref.dtype)


def _pick_tiles(k2: int, n: int, g: int) -> tuple:
    """(TK, NT) with TK a multiple of G dividing K2, NT dividing N."""
    tk = 0
    for cand in (512, 256, 128, 64):
        if cand % g == 0 and k2 % cand == 0:
            tk = cand
            break
    if tk == 0 and k2 % g == 0:
        tk = g  # whole groups, tiny tile
    nt = 0
    for cand in (512, 256, 128):
        if n % cand == 0:
            nt = cand
            break
    return tk, nt


def int4_matmul_usable(m: int, k: int, n: int, g: int) -> bool:
    """Decode-shaped (small M) int4 matmuls on a real TPU.  Default ON —
    the XLA fallback materializes the dequantized weight and is SLOWER
    than bf16; set ``LICV_INT4_PALLAS=0`` to force the fallback."""
    import os

    if os.environ.get("LICV_INT4_PALLAS") == "0":
        return False
    if jax.default_backend() != "tpu" or m > 64 or m % 8 != 0 or k % 2:
        return False
    k2 = k // 2
    if k2 % g != 0:
        return False  # a group would straddle the half-plane split
    tk, nt = _pick_tiles(k2, n, g)
    return tk >= 64 and nt > 0


@functools.partial(jax.jit, static_argnames=("group", "out_dtype", "interpret"))
def int4_matmul_pallas(
    x: jax.Array,  # (M, K) bf16/f32
    packed: jax.Array,  # (K/2, N) uint8, mixed-plane nibble layout
    s: jax.Array,  # (K/G, N) f32/bf16 group scales
    group: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (k, k2)
    g = group
    kg = s.shape[0]
    assert kg * g == k, (s.shape, g, k)
    tk, nt = _pick_tiles(k2, n, g)
    if tk == 0 or nt == 0:
        raise ValueError(f"untileable int4 matmul shape K={k} N={n} G={g}")
    gk = tk // g  # scale rows per K-step
    kt = k2 // tk  # K-steps
    kg2 = kg // 2

    xb = x.astype(jnp.bfloat16)
    sf = s.astype(jnp.float32)
    # high-plane scales pre-divided by 16 (the unpack yields 16*q_hi)
    s3 = jnp.concatenate([sf[:kg2], sf[kg2:] / 16.0]).reshape(2 * kt, gk, n)
    y = pl.pallas_call(
        functools.partial(_kernel, g),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=(n // nt, kt),
        in_specs=[
            # x low half: columns [t*TK, (t+1)*TK)
            pl.BlockSpec((m, tk), lambda j, t: (0, t), memory_space=pltpu.VMEM),
            # x high half: columns [K2 + t*TK, ...) = block index kt + t
            pl.BlockSpec(
                (m, tk), lambda j, t: (0, kt + t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tk, nt), lambda j, t: (t, j), memory_space=pltpu.VMEM),
            # this K-step's scale rows, statically indexed via the leading dim
            pl.BlockSpec(
                (1, gk, nt), lambda j, t: (t, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, gk, nt), lambda j, t: (kt + t, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, nt), lambda j, t: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((m, nt), jnp.float32)],
        interpret=interpret,
    )(xb, xb, packed, s3, s3)
    # low-plane +8 bias correction: y -= 8 * (group sums of x_lo) @ s_lo.
    # The kernel scaled (q_lo + 8) by s_lo in bf16, so the correction uses
    # the same bf16 scale values (product rounding then cancels to ~2^-9).
    xg = jnp.sum(xb[:, :k2].reshape(m, kg2, g), axis=-1)
    y = y - 8.0 * jnp.dot(
        xg, sf[:kg2].astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    return y.astype(out_dtype)
