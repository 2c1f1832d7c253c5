#!/usr/bin/env python
"""TPU-side validation + micro-bench of the fused masked-KL Pallas kernel.

Checks numerical agreement (value + both input gradients) of
``masked_kl_divergence(impl="pallas")`` against the XLA formulation at the
real training shape (B=8 students x S=256 positions x V=32000 vocab), then
times fwd+bwd for both impls.  The CPU suite only covers interpret mode;
this is the Mosaic-lowering check queued since round 1 (TODO.md).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.ops.kl import masked_kl_divergence
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    assert jax.default_backend() == "tpu", jax.default_backend()
    enable_compilation_cache()

    b, s, v = 8, 256, 32000
    rng = np.random.default_rng(0)
    stu = jnp.asarray(rng.normal(size=(b, s, v)).astype(np.float32)) * 2.0
    tea = jnp.asarray(rng.normal(size=(b, s, v)).astype(np.float32)) * 2.0
    mask = jnp.asarray(rng.random((b, s)) < 0.1)
    t = 2.5

    def loss(impl, stu, tea):
        return masked_kl_divergence(stu, tea, mask, t, impl=impl)

    import functools

    # bind impl by VALUE: jit traces at first call, after the comprehension
    # ends — a late-binding `lambda a, b: loss(impl, a, b)` would make both
    # entries compute "pallas" and the check compare the kernel to itself
    vg = {
        impl: jax.jit(
            jax.value_and_grad(functools.partial(loss, impl), (0, 1))
        )
        for impl in ("xla", "pallas")
    }
    (v_x, (gs_x, gt_x)) = jax.block_until_ready(vg["xla"](stu, tea))
    (v_p, (gs_p, gt_p)) = jax.block_until_ready(vg["pallas"](stu, tea))
    verr = abs(float(v_x) - float(v_p)) / max(abs(float(v_x)), 1e-9)
    gserr = float(jnp.max(jnp.abs(gs_x - gs_p)) / (jnp.max(jnp.abs(gs_x)) + 1e-12))
    gterr = float(jnp.max(jnp.abs(gt_x - gt_p)) / (jnp.max(jnp.abs(gt_x)) + 1e-12))
    print(f"kl value: xla={float(v_x):.6f} pallas={float(v_p):.6f} rel={verr:.2e}")
    print(f"grad rel err: d_stu={gserr:.2e} d_tea={gterr:.2e}")
    assert verr < 1e-4 and gserr < 1e-3 and gterr < 1e-3

    for impl in ("xla", "pallas"):
        f = vg[impl]
        # host readback as the sync point: through the axon tunnel
        # block_until_ready is not a reliable completion barrier (verify
        # skill notes).  Dispatch all n calls (they serialize on the device
        # stream) and read back only the LAST loss, amortizing one relay
        # round trip over the span instead of paying it per iteration.
        float(f(stu, tea)[0])  # warm + sync
        t0 = time.perf_counter()
        n = 5
        outs = [f(stu, tea)[0] for _ in range(n)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / n
        print(f"masked-KL fwd+bwd [{impl}] {b}x{s}x{v}: {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()
