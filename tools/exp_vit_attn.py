#!/usr/bin/env python
"""Chip experiment: fused short-seq ViT attention kernel vs XLA.

ViT-H attention (s=257, dh=80) measured 10.6% MFU through XLA (4.2 ms of
the 26 ms bs=8 tower pass — tools/bench_prefill_tpu.py --vision-breakdown).
A/B ``ops.vit_attention.vit_attention_tpu`` (whole-score-in-VMEM fused
kernel, G heads per grid cell) against ``layers.dot_product_attention`` at
the ViT-H and SigLIP shapes, over the batch sizes the serving engine sees.

VERDICT (v5e, 2026-08): standalone the kernel wins 1.6-1.8x at all three
shapes — but this comparison is MISLEADING: the XLA baseline here pays
jit-boundary layout passes that the in-tower XLA attention does not (its
serial in-tower cost is ~141 us/layer vs this probe's 1525 us at bs=8).
The honest same-session A/B at the full-tower level (bench_prefill_tpu
--vision-breakdown, LICV_VIT_FUSED_ATTN=0 vs 1) measured the kernel ~3%
SLOWER in-tower (26.24 vs 25.42 ms) — XLA's fusion with the surrounding
projections beats the pallas_call boundary.  Default is OFF
(ops/vit_attention.py::vit_attention_usable).
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BF16_PEAK_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.models import layers as L
    from licv_vqa_tpu.ops.vit_attention import vit_attention_tpu

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    reps = 30

    shapes = [
        (8, 257, 16, 80),    # ViT-H bs=8 (bench_prefill's breakdown shape)
        (64, 257, 16, 80),   # bs=64 serving admission
        (8, 730, 16, 72),    # SigLIP-esque mid shape (non-aligned dh)
    ]
    for b, s, h, dh in shapes:
        q, k, v = (
            jnp.asarray(
                rng.normal(size=(b, s, h, dh)).astype(np.float32),
                jnp.bfloat16,
            )
            for _ in range(3)
        )
        jax.block_until_ready((q, k, v))
        flops = 2.0 * b * h * s * s * dh * 2

        def xla(qv, kv, vv):
            return L.dot_product_attention(qv, kv, vv)

        def fused(qv, kv, vv):
            return vit_attention_tpu(qv, kv, vv)

        ref = np.asarray(jax.jit(xla)(q, k, v), np.float32)
        got = np.asarray(jax.jit(fused)(q, k, v), np.float32)
        err = np.abs(got - ref).max()
        print(f"== B={b} S={s} H={h} Dh={dh}  maxabs diff={err:.2e} ==", flush=True)
        assert err < 2e-2, err

        def timed(fn, qv, kv, vv):
            def body(_, carry):
                y = fn(carry, kv, vv)
                return carry + (y[0, 0, 0, 0] * 1e-12).astype(carry.dtype)

            return jax.lax.fori_loop(0, reps, body, qv)

        for name, f in (("xla", xla), ("fused_pallas", fused)):
            tfn = jax.jit(functools.partial(timed, f))
            np.asarray(tfn(q, k, v)[0, 0, 0, 0])  # compile + warm
            t0 = time.perf_counter()
            np.asarray(tfn(q, k, v)[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / reps
            print(
                f"  {name:14s} {dt*1e6:8.0f} us  "
                f"{flops/dt/BF16_PEAK_FLOPS*100:5.1f}% MFU",
                flush=True,
            )

        # masked variant correctness (NaViT valid mask)
        valid = jnp.asarray(rng.random((b, s)) > 0.2)
        refm = np.asarray(
            jax.jit(
                lambda qv, kv, vv: L.dot_product_attention(
                    qv, kv, vv, mask=valid[:, None, None, :]
                )
            )(q, k, v),
            np.float32,
        )
        gotm = np.asarray(
            jax.jit(lambda qv, kv, vv: vit_attention_tpu(qv, kv, vv, valid))(
                q, k, v
            ),
            np.float32,
        )
        errm = np.abs(gotm - refm).max()
        print(f"  masked maxabs diff={errm:.2e}", flush=True)
        assert errm < 2e-2, errm


if __name__ == "__main__":
    main()
