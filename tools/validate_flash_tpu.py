#!/usr/bin/env python
"""TPU-side validation + micro-bench for the flash-attention training path.

Runs on the real chip (flash needs the Mosaic backend; the CPU test mesh
cannot execute it): checks numerical agreement with the XLA attention path on
right-padded causal batches at training shapes, then times a full ICV train
forward+backward with attention_impl=xla vs flash.
"""

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.models import layers as L
    from licv_vqa_tpu.models.config import DecoderConfig

    assert jax.default_backend() == "tpu", jax.default_backend()
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # the s_tea=2048 flash compiles are the
    # documented >9-min remote-compile case — persist them across retries

    # ---- numerical check: flash vs XLA masked attention -------------------
    rng = np.random.default_rng(0)
    b, s, h, dh = 4, 512, 8, 128
    q = jnp.asarray(rng.normal(size=(b, s, h, dh)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, dh)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, dh)), dtype=jnp.bfloat16)
    valid = np.ones((b, s), np.int32)
    valid[1, 400:] = 0
    valid[3, 100:] = 0
    valid = jnp.asarray(valid)

    pos = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    mask = L.causal_mask(pos, pos, valid.astype(bool))
    ref = jax.jit(
        lambda q, k, v: L.dot_product_attention(q, k, v, mask=mask)
    )(q, k, v)
    got = jax.jit(lambda q, k, v: L.flash_attention_tpu(q, k, v, valid))(q, k, v)
    ref_np = np.asarray(ref, np.float32)
    got_np = np.asarray(got, np.float32)
    vm = np.asarray(valid, bool)
    err = np.abs(ref_np[vm] - got_np[vm]).max()
    print(f"flash vs xla max abs err (valid positions): {err:.5f}")
    assert err < 3e-2, err  # bf16 tolerance

    # gradient check through the kernel
    def loss_flash(q):
        return jnp.sum(L.flash_attention_tpu(q, k, v, valid).astype(jnp.float32) ** 2)

    def loss_ref(q):
        return jnp.sum(
            L.dot_product_attention(q, k, v, mask=mask).astype(jnp.float32) ** 2
        )

    gf = np.asarray(jax.jit(jax.grad(loss_flash))(q), np.float32)
    gr = np.asarray(jax.jit(jax.grad(loss_ref))(q), np.float32)
    gerr = np.abs(gf[vm] - gr[vm]).max() / (np.abs(gr[vm]).max() + 1e-6)
    print(f"flash vs xla grad rel err: {gerr:.5f}")
    assert gerr < 5e-2, gerr

    # ---- train-step micro-bench: xla vs flash ------------------------------
    from licv_vqa_tpu.icv.encoder import GlobalICVEncoder
    from licv_vqa_tpu.icv.module import ICVModuleConfig, icv_loss_fn
    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
    )

    def bench_impl(impl: str, n_layers=8, bs=4, s_stu=256, s_tea=1024):
        cfg9 = IdeficsConfig.idefics_9b()
        cfg = dataclasses.replace(
            cfg9,
            text=dataclasses.replace(
                cfg9.text, n_layers=n_layers, attention_impl=impl
            ),
        )
        params = jax.jit(
            lambda: init_idefics_params(jax.random.PRNGKey(0), cfg)
        )()
        jax.block_until_ready(params["layers"]["attn"]["wq"])
        encoder = GlobalICVEncoder(cfg.text.d_model, cfg.text.n_layers)
        mcfg = ICVModuleConfig(hard_loss_weight=0.5)
        fwd, _ = make_idefics_forward_fns(cfg, eos_token_id=2)
        trainable = {
            "encoder": encoder.init(jax.random.PRNGKey(1)),
            "temperature": jnp.float32(1.0),
        }
        r = np.random.default_rng(0)

        def inputs(s):
            ids = r.integers(3, 32000, size=(bs, s)).astype(np.int32)
            ids[:, 1] = cfg.image_token_id
            return {
                "input_ids": jnp.asarray(ids),
                "attention_mask": jnp.ones((bs, s), jnp.int32),
                "pixel_values": jnp.asarray(
                    r.normal(size=(bs, 1, 224, 224, 3)).astype(np.float32)
                ),
                "pixel_valid": jnp.ones((bs, 1), bool),
            }

        batch = {
            "query_inputs": inputs(s_stu),
            "inputs": inputs(s_tea),
            "query_x_length": jnp.full((bs,), 64, jnp.int32),
            "in_context_length": jnp.full((bs,), 800, jnp.int32),
        }

        @jax.jit
        def step(trainable, params, batch):
            grad_fn = jax.value_and_grad(icv_loss_fn, has_aux=True)
            (loss, _), grads = grad_fn(
                trainable, params, batch, fwd, encoder, mcfg, 0
            )
            return loss, grads

        # host readback as the sync point: through the axon tunnel
        # block_until_ready is not a reliable completion barrier.  Dispatch
        # all n steps (device-stream serialized), read back only the last
        # loss — one relay round trip amortized over the span.
        float(step(trainable, params, batch)[0])  # warm + sync
        t0 = time.perf_counter()
        n = 3
        losses = [step(trainable, params, batch)[0] for _ in range(n)]
        float(losses[-1])
        dt = (time.perf_counter() - t0) / n
        print(f"train fwd+bwd [{impl}] {n_layers}L bs={bs} "
              f"s_tea={s_tea}: {dt*1000:.0f} ms/step")
        return dt

    dt_x = bench_impl("xla")
    dt_f = bench_impl("flash")
    print(f"flash speedup on train step: {dt_x/dt_f:.2f}x")

    # ---- the round-1 stall case: 32-shot teacher length (seq 2048) --------
    # blk=512 stalled the axon remote-compile >9 min in round 1; blk=256 is
    # the current setting.  Report compile time explicitly.
    for impl in ("xla", "flash"):
        t0 = time.perf_counter()
        dt = bench_impl(impl, s_tea=2048)
        print(f"[{impl}] s_tea=2048 total incl. compile: "
              f"{time.perf_counter()-t0:.0f}s, steady {dt*1000:.0f} ms/step")


if __name__ == "__main__":
    main()
