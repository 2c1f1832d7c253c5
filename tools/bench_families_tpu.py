#!/usr/bin/env python
"""TPU decode throughput for the OTHER two model families at full depth.

bench.py's headline is the Idefics-9B architecture; this banks the same
protocol (bs=8, 64-token prompt, 32 new tokens, ICV at every layer, int8
weight-only so full depth fits one v5e) for Idefics2-8B-base (Mistral GQA +
SigLIP + perceiver connector) and OpenFlamingo-9B (MPT/ALiBi + ViT-L +
gated xattn).  Results recorded in STATUS.md.

Usage: python tools/bench_families_tpu.py [idefics2|openflamingo] ...
Env: BENCH_BS (default 8), BENCH_KV8=1 (int8 KV cache).
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BS = int(os.environ.get("BENCH_BS", 8))
KV8 = os.environ.get("BENCH_KV8", "0") == "1"
PROMPT_LEN = 64
MAX_NEW = 32


def bench_family(family: str) -> dict:
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.decode import greedy_generate
    from licv_vqa_tpu.ops.quantize import quantize_layer_stack

    if family == "idefics2":
        from licv_vqa_tpu.models.idefics2 import (
            Idefics2Config,
            init_idefics2_params,
            make_idefics2_forward_fns,
        )

        cfg = Idefics2Config.idefics2_8b()
        if KV8:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, text=dataclasses.replace(cfg.text, kv_cache_dtype="int8")
            )
        init_fn, make_fns = init_idefics2_params, make_idefics2_forward_fns
        img_hw = 448  # variable-resolution tower; keep the bench prefill lean
    elif family == "openflamingo":
        from licv_vqa_tpu.models.openflamingo import (
            OpenFlamingoConfig,
            init_openflamingo_params,
            make_openflamingo_forward_fns,
        )

        cfg = OpenFlamingoConfig.openflamingo_9b()
        if KV8:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, text=dataclasses.replace(cfg.text, kv_cache_dtype="int8")
            )
        init_fn, make_fns = init_openflamingo_params, make_openflamingo_forward_fns
        img_hw = cfg.vision.image_size
    else:
        raise ValueError(family)

    # Synthesize int8 weights DIRECTLY from shapes: materializing the full
    # bf16 init and then quantizing peaks over one v5e's HBM for Mistral-7B
    # (d_ff 14336) — for a timing bench random int8 + constant scales are
    # equivalent, and the bf16 copy never exists.
    from licv_vqa_tpu.ops.quantize import _should_quantize

    shapes = jax.eval_shape(lambda k: init_fn(k, cfg), jax.random.PRNGKey(0))

    def synth():
        base = jax.random.PRNGKey(0)
        idx = iter(range(1 << 20))

        def leaf(path, sd):
            key = jax.random.fold_in(base, next(idx))
            group = getattr(path[0], "key", "")
            if group in ("layers", "xattn") and _should_quantize(path, sd):
                q = jax.random.randint(key, sd.shape, -127, 128, jnp.int8)
                s = jnp.full(sd.shape[:-2] + (1, sd.shape[-1]), 2e-4, jnp.float32)
                return {"q": q, "s": s}
            if not jnp.issubdtype(sd.dtype, jnp.floating):
                return jnp.zeros(sd.shape, sd.dtype)
            return (jax.random.normal(key, sd.shape, jnp.float32) * 0.02).astype(
                sd.dtype
            )

        return jax.tree_util.tree_map_with_path(leaf, shapes)

    del quantize_layer_stack
    params = jax.jit(synth)()
    jax.block_until_ready(jax.tree.leaves(params)[0])
    _, bind_decode = make_fns(cfg, eos_token_id=2)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.text.vocab_size - 8, size=(BS, PROMPT_LEN)).astype(
        np.int32
    )
    if family == "idefics2":
        # inline image tokens: a contiguous image_seq_len run in the prompt
        ids[:, 1 : 1 + cfg.image_seq_len // 2] = cfg.image_token_id
    else:
        ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(BS, 1, img_hw, img_hw, 3)).astype(np.float32)
    valid = np.ones((BS, 1), bool)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)).astype(np.float32)
        * 0.1
    ).astype(jnp.bfloat16)

    @jax.jit
    def gen(params, ids, mask, pixels, valid, icv):
        fwd = bind_decode(params, pixels, valid, ids, icv, PROMPT_LEN + MAX_NEW + 1)
        return greedy_generate(
            fwd, ids, mask, max_new_tokens=MAX_NEW, eos_token_id=-1, pad_token_id=0
        )

    args = (params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels),
            jnp.asarray(valid), icv)
    np.asarray(gen(*args)[:, -1])  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(gen(*args)[:, -1])
    dt = (time.perf_counter() - t0) / reps
    tok = BS * MAX_NEW / dt
    print(f"{family}: full-depth int8 ICV-steered greedy decode "
          f"{tok:.1f} tok/s/chip (bs={BS}{', kv8' if KV8 else ''})", flush=True)
    return {"family": family, "tokens_per_sec": tok}


if __name__ == "__main__":
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    for fam in sys.argv[1:] or ["idefics2", "openflamingo"]:
        bench_family(fam)
