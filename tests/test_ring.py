"""Ring attention (sequence parallelism over the ``sp`` mesh axis).

Op-level: ``ring_self_attention`` must match the dense masked-softmax path
(``layers.dot_product_attention``) for causal+padding, ALiBi, logit softcap,
and gradients, including tp-sharded heads.  E2E: the full ICV loss with the
teacher/student forwards ring-sharded over sp must equal the single-device
loss (the reference has no SP at all — SURVEY.md §5.7 plumbed the axis for
exactly this op).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from licv_vqa_tpu.core.mesh import MeshConfig, create_mesh
from licv_vqa_tpu.models import layers as L
from licv_vqa_tpu.parallel.ring import RingSpec, ring_self_attention


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    B, S, H, Dh = 2, 64, 4, 32
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, S, H, Dh)).astype(np.float32))
        for _ in range(3)
    )
    lens = np.array([S, S - 13])
    valid = np.arange(S)[None, :] < lens[:, None]
    pos = np.maximum(np.cumsum(valid, axis=1) - 1, 0).astype(np.int32)
    return q, k, v, jnp.asarray(pos), jnp.asarray(valid), valid


def _sharded(mesh, arrs):
    sh = NamedSharding(mesh, P("dp", "sp"))
    return [jax.device_put(a, sh) for a in arrs]


@pytest.mark.parametrize(
    "kwargs",
    [{}, {"alibi": True}, {"logit_softcap": 30.0}],
    ids=["causal_pad", "alibi", "softcap"],
)
def test_ring_matches_dense(qkv, kwargs):
    q, k, v, pos, validj, valid = qkv
    mask = L.causal_mask(pos, pos, validj)
    bias = L.alibi_bias(q.shape[2], pos, pos) if kwargs.get("alibi") else None
    ref = L.dot_product_attention(
        q, k, v, bias=bias, mask=mask,
        logit_softcap=kwargs.get("logit_softcap"),
    )
    mesh = create_mesh(MeshConfig(dp=2, tp=1, sp=4))
    spec = RingSpec.from_mesh(mesh)
    qs, ks, vs, ps, vds = _sharded(mesh, [q, k, v, pos, validj])
    out = jax.jit(lambda *a: ring_self_attention(spec, *a, **kwargs))(
        qs, ks, vs, ps, vds
    )
    err = np.abs(np.asarray(out) - np.asarray(ref))[valid]
    assert err.max() < 5e-6, err.max()


def test_ring_matches_dense_bf16(qkv):
    """bf16 operands (the training dtype): the ring's einsums keep bf16
    inputs with f32 accumulation — the dense path's exact discipline — not
    an f32 operand upcast (which would halve MXU throughput on the sp path
    that exists for the longest sequences).  Tolerance is bf16-elementwise:
    the two paths round the PV operand at different normalization points."""
    q, k, v, pos, validj, valid = qkv
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    mask = L.causal_mask(pos, pos, validj)
    ref = L.dot_product_attention(qb, kb, vb, mask=mask)
    mesh = create_mesh(MeshConfig(dp=2, tp=1, sp=4))
    spec = RingSpec.from_mesh(mesh)
    qs, ks, vs, ps, vds = _sharded(mesh, [qb, kb, vb, pos, validj])
    out = jax.jit(lambda *a: ring_self_attention(spec, *a))(qs, ks, vs, ps, vds)
    assert out.dtype == jnp.bfloat16
    err = np.abs(
        np.asarray(out).astype(np.float32) - np.asarray(ref).astype(np.float32)
    )[valid]
    assert err.max() < 2e-2, err.max()


def test_ring_matches_dense_tp_sharded_heads(qkv):
    """tp=2 shards the 4 heads; ALiBi slopes must slice per tp shard."""
    q, k, v, pos, validj, valid = qkv
    mask = L.causal_mask(pos, pos, validj)
    bias = L.alibi_bias(q.shape[2], pos, pos)
    ref = L.dot_product_attention(q, k, v, bias=bias, mask=mask)
    mesh = create_mesh(MeshConfig(dp=2, tp=2, sp=2))
    spec = RingSpec.from_mesh(mesh)
    qs, ks, vs, ps, vds = _sharded(mesh, [q, k, v, pos, validj])
    out = jax.jit(lambda *a: ring_self_attention(spec, *a, alibi=True))(
        qs, ks, vs, ps, vds
    )
    err = np.abs(np.asarray(out) - np.asarray(ref))[valid]
    assert err.max() < 5e-6, err.max()


def test_ring_gradients_match(qkv):
    q, k, v, pos, validj, valid = qkv
    mask = L.causal_mask(pos, pos, validj)
    w = jnp.asarray(valid[:, :, None, None] & np.ones(q.shape, bool))
    mesh = create_mesh(MeshConfig(dp=2, tp=1, sp=4))
    spec = RingSpec.from_mesh(mesh)

    def f_ref(q, k, v):
        return jnp.sum(
            jnp.where(w, L.dot_product_attention(q, k, v, mask=mask) ** 2, 0.0)
        )

    def f_ring(q, k, v):
        return jnp.sum(
            jnp.where(w, ring_self_attention(spec, q, k, v, pos, validj) ** 2, 0.0)
        )

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    qs, ks, vs, _, _ = _sharded(mesh, [q, k, v, pos, validj])
    g_ring = jax.jit(jax.grad(f_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    for a, b in zip(g_ref, g_ring):
        assert float(jnp.max(jnp.abs(a - jnp.asarray(b)))) < 2e-5


def _loss_pair(family):
    """(single-device loss, dp×sp ring loss) for one model family."""
    import __graft_entry__ as g
    from licv_vqa_tpu.icv.encoder import GlobalICVEncoder
    from licv_vqa_tpu.icv.module import ICVModuleConfig, icv_loss_fn

    if family == "idefics":
        from licv_vqa_tpu.models.idefics import (
            IdeficsConfig as Cfg,
            init_idefics_params as init_fn,
            make_idefics_forward_fns as make_fns,
        )
    elif family == "idefics2":  # GQA: ring receives repeat_kv'd heads
        from licv_vqa_tpu.models.idefics2 import (
            Idefics2Config as Cfg,
            init_idefics2_params as init_fn,
            make_idefics2_forward_fns as make_fns,
        )
    else:
        from licv_vqa_tpu.models.openflamingo import (
            OpenFlamingoConfig as Cfg,
            init_openflamingo_params as init_fn,
            make_openflamingo_forward_fns as make_fns,
        )

    cfg = Cfg.tiny()
    params = init_fn(jax.random.PRNGKey(0), cfg)
    encoder = GlobalICVEncoder(cfg.text.d_model, cfg.text.n_layers)
    mcfg = ICVModuleConfig(hard_loss_weight=0.5)
    train_forward, _ = make_fns(cfg, eos_token_id=2)
    trainable = {
        "encoder": encoder.init(jax.random.PRNGKey(1)),
        "temperature": jnp.float32(1.0),
    }
    batch = g._tiny_batch(cfg, bs=4, s_stu=16, s_tea=24)

    def loss_fn(fwd):
        def f(t, p, b):
            loss, _ = icv_loss_fn(t, p, b, fwd, encoder, mcfg, pad_token_id=0)
            return loss

        return f

    single = float(jax.jit(loss_fn(train_forward))(trainable, params, batch))

    mesh = create_mesh(MeshConfig(dp=2, tp=1, sp=4))
    spec = RingSpec.from_mesh(mesh)
    ring_fwd = lambda p, i, icv: train_forward(p, i, icv, ring_spec=spec)

    seq = NamedSharding(mesh, P("dp", "sp"))
    dp = NamedSharding(mesh, P("dp"))

    def put(path, x):
        key = getattr(path[-1], "key", "") if path else ""
        if key in ("input_ids", "attention_mask") and x.ndim == 2:
            return jax.device_put(x, seq)
        return jax.device_put(x, dp)

    batch_s = jax.tree_util.tree_map_with_path(put, batch)
    params_s = jax.device_put(params, NamedSharding(mesh, P()))
    trainable_s = jax.device_put(trainable, NamedSharding(mesh, P()))
    sharded = float(jax.jit(loss_fn(ring_fwd))(trainable_s, params_s, batch_s))
    return single, sharded


@pytest.mark.parametrize("family", ["idefics", "idefics2", "openflamingo"])
def test_dp_sp_loss_matches_single_device(family):
    """Full ICV distillation loss (teacher+student forwards; rope MHA, rope
    GQA, and ALiBi) under dp=2×sp=4 ring attention equals the unsharded
    loss."""
    single, sharded = _loss_pair(family)
    np.testing.assert_allclose(sharded, single, rtol=3e-5, atol=3e-6)
