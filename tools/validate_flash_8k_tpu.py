#!/usr/bin/env python
"""Flash attention at 8K+ teacher lengths: correctness + perf vs XLA.

Closes the VERDICT r4 weak-#7 evidence gap: the causal flash kernel
(`layers.flash_attention_tpu`) had only been validated to s=4096; the sp
axis / ring-attention path exists for the 8K+ regime.  This tool runs on
the real chip:

  1. correctness at s=8192 (and s=12288 flash-only) vs XLA's masked
     dot-product attention, with ragged validity — h=8 so the XLA
     reference's (B,H,S,S) f32 score tensor (2.1 GB) still fits;
  2. fwd+bwd gradient parity at s=8192;
  3. perf A/B at (1, 8192, 8, 128) and a flash-only absolute number at
     the flagship head count (1, 8192, 32, 128) where XLA's score tensor
     (8.6 GB) cannot materialize alongside weights on a 16 GB chip.

Reference context: the reference trains with teacher sequences up to its
tokenizer max_length on A100s via torch SDPA (reference
icv_src/icv_module.py forward); 8K+ is the regime our sp/ring design
targets.
"""

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
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    assert jax.default_backend() == "tpu", jax.default_backend()
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def mk(b, s, h, dh):
        q, k, v = (
            jnp.asarray(
                rng.normal(size=(b, s, h, dh)).astype(np.float32),
                jnp.bfloat16,
            )
            for _ in range(3)
        )
        valid = np.ones((b, s), np.int32)
        valid[0, s - s // 8 :] = 0  # ragged tail
        return q, k, v, jnp.asarray(valid)

    # ---- 1+2. correctness + grads at s=8192 vs XLA (h=8 fits) ----
    b, s, h, dh = 1, 8192, 8, 128
    q, k, v, valid = mk(b, s, h, dh)
    pos = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    mask = L.causal_mask(pos, pos, valid.astype(bool))

    ref = np.asarray(
        jax.jit(lambda q, k, v: L.dot_product_attention(q, k, v, mask=mask))(
            q, k, v
        ),
        np.float32,
    )
    got = np.asarray(
        jax.jit(lambda q, k, v: L.flash_attention_tpu(q, k, v, valid))(
            q, k, v
        ),
        np.float32,
    )
    vm = np.asarray(valid, bool)
    err = np.abs(ref[vm] - got[vm]).max()
    print(f"s=8192 h=8: flash vs xla maxabs (valid rows) = {err:.5f}",
          flush=True)
    assert err < 3e-2, err

    def loss_flash(qv):
        return jnp.sum(
            L.flash_attention_tpu(qv, k, v, valid).astype(jnp.float32) ** 2
        )

    def loss_ref(qv):
        return jnp.sum(
            L.dot_product_attention(qv, k, v, mask=mask).astype(jnp.float32)
            ** 2
        )

    gf = np.asarray(jax.jit(jax.grad(loss_flash))(q), np.float32)
    gr = np.asarray(jax.jit(jax.grad(loss_ref))(q), np.float32)
    gerr = np.abs(gf[vm] - gr[vm]).max() / (np.abs(gr[vm]).max() + 1e-6)
    print(f"s=8192 h=8: grad rel err = {gerr:.5f}", flush=True)
    assert gerr < 5e-2, gerr

    # ---- 3. perf: amortized device-side loop, one readback ----
    def timed(fn, qv, kv, vv, reps):
        def body(_, carry):
            y = fn(carry, kv, vv)
            return carry + (y[0, 0, 0, 0] * 1e-12).astype(carry.dtype)

        tfn = jax.jit(
            lambda qv: jax.lax.fori_loop(0, reps, body, qv)
        )
        np.asarray(tfn(qv)[0, 0, 0, 0])  # compile + warm
        t0 = time.perf_counter()
        np.asarray(tfn(qv)[0, 0, 0, 0])
        return (time.perf_counter() - t0) / reps

    for bb, ss, hh, both in ((1, 8192, 8, True), (1, 12288, 8, True),
                             (1, 8192, 32, False)):
        q, k, v, valid = mk(bb, ss, hh, dh)
        pos = jnp.broadcast_to(jnp.arange(ss)[None, :], (bb, ss))
        mask = L.causal_mask(pos, pos, valid.astype(bool))
        # causal ragged: ~half the s^2 dot FLOPs are live
        flops = 2.0 * bb * hh * ss * ss * dh * 2 / 2
        dt_f = timed(
            lambda qv, kv, vv: L.flash_attention_tpu(qv, kv, vv, valid),
            q, k, v, reps=10,
        )
        line = (
            f"s={ss} h={hh}: flash {dt_f*1e3:7.2f} ms "
            f"({flops/dt_f/BF16_PEAK_FLOPS*100:4.1f}% MFU)"
        )
        if both:
            if ss >= 12288:
                # parity at 12288 too (score tensor 4.8 GB — fits bare)
                refl = np.asarray(
                    jax.jit(
                        lambda qv, kv, vv: L.dot_product_attention(
                            qv, kv, vv, mask=mask
                        )
                    )(q, k, v),
                    np.float32,
                )
                gotl = np.asarray(
                    jax.jit(
                        lambda qv, kv, vv: L.flash_attention_tpu(
                            qv, kv, vv, valid
                        )
                    )(q, k, v),
                    np.float32,
                )
                vmr = np.asarray(valid, bool)
                e = np.abs(refl[vmr] - gotl[vmr]).max()
                print(f"s={ss} h={hh}: maxabs (valid) = {e:.5f}", flush=True)
                assert e < 3e-2, e
            dt_x = timed(
                lambda qv, kv, vv: L.dot_product_attention(
                    qv, kv, vv, mask=mask
                ),
                q, k, v, reps=10,
            )
            line += (
                f"   xla {dt_x*1e3:7.2f} ms "
                f"({flops/dt_x/BF16_PEAK_FLOPS*100:4.1f}% MFU)  "
                f"flash={dt_x/dt_f:.2f}x"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
