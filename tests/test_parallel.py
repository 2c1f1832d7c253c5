"""Multi-device tests on the 8-virtual-CPU mesh: sharding rules + the full
driver dry-run path (dp×tp training step with GSPMD-inserted collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from licv_vqa_tpu.models.idefics import IdeficsConfig, init_idefics_params
from licv_vqa_tpu.parallel.sharding import param_specs


def test_param_specs_tp_rules():
    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    specs = param_specs(params)
    # column split: out-features axis
    assert specs["layers"]["attn"]["wq"] == P(None, None, "tp")
    assert specs["layers"]["mlp"]["w_gate"] == P(None, None, "tp")
    # row split: in-features axis
    assert specs["layers"]["attn"]["wo"] == P(None, "tp", None)
    assert specs["layers"]["mlp"]["w_down"] == P(None, "tp", None)
    # replicated
    assert specs["layers"]["ln1"] == P()
    assert specs["embed"] == P()
    assert specs["lm_head"] == P(None, "tp")
    # vision biased projections
    assert specs["vision"]["layers"]["attn"]["wq"] == P(None, None, "tp")
    assert specs["vision"]["layers"]["attn"]["bq"] == P(None, "tp")


def test_param_specs_shard_quantized_leaves():
    """int8/int4 quantized weights ({'q','s'} / {'q4','s'} dict leaves) must
    tp-shard by their PARENT name: classifying on the inner keys matches
    nothing and silently replicates the whole quantized LMM — the exact
    model (9B int8 + tp serving) the tp axis exists to fit."""
    from licv_vqa_tpu.ops.quantize import quantize_array, quantize_array_int4

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(2, 128, 64)).astype(np.float32))
    params = {
        "layers": {
            "attn": {"wq": quantize_array(w), "wo": quantize_array(w)},
            "mlp": {
                "w_up": quantize_array_int4(w),
                "w_down": quantize_array_int4(w),
            },
            "ln1": jnp.ones((2, 64)),
        }
    }
    s = param_specs(params)["layers"]
    # column split: out-features (last dim) for every component
    assert s["attn"]["wq"] == {"q": P(None, None, "tp"), "s": P(None, None, "tp")}
    assert s["mlp"]["w_up"]["q4"] == P(None, None, "tp")
    assert s["mlp"]["w_up"]["s"] == P(None, None, None, "tp")
    # row split: contraction dim for q/q4; int8 per-output scales replicate,
    # int4 group scales follow the contraction split on their -3 dim
    assert s["attn"]["wo"] == {"q": P(None, "tp", None), "s": P()}
    assert s["mlp"]["w_down"]["q4"] == P(None, "tp", None)
    assert s["mlp"]["w_down"]["s"] == P(None, "tp", None, None)
    assert s["ln1"] == P()


def test_quantized_qdot_tp_sharded_matches_replicated():
    """End to end under GSPMD: int8 qdot with param_specs-sharded weights on
    a tp mesh equals the replicated computation, and the weights REALLY
    carry tp shards (the capacity win, not just a spec)."""
    from jax.sharding import NamedSharding

    from licv_vqa_tpu.core.mesh import MeshConfig, create_mesh
    from licv_vqa_tpu.ops.int8_matmul import qdot
    from licv_vqa_tpu.ops.quantize import quantize_array

    rng = np.random.default_rng(1)
    win = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    wout = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    params = {"wq": quantize_array(win), "wo": quantize_array(wout)}

    def fwd(p, x):
        return qdot(qdot(x, p["wq"]), p["wo"])

    want = np.asarray(fwd(params, x))

    mesh = create_mesh(MeshConfig(dp=-1, tp=2, sp=1))
    shardings = jax.tree.map(
        lambda sp: NamedSharding(mesh, sp),
        param_specs(params),
        is_leaf=lambda v: isinstance(v, P),
    )
    sharded = jax.device_put(params, shardings)
    # the int8 payload is really split over tp (column case: out-features)
    assert "tp" in str(sharded["wq"]["q"].sharding.spec)
    got = np.asarray(jax.jit(fwd)(sharded, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_dp_tp_matches_single_device():
    """The sharded training forward must be numerically identical to the
    unsharded one (GSPMD only changes layout, not math)."""
    from licv_vqa_tpu.core.mesh import MeshConfig, create_mesh
    from licv_vqa_tpu.icv.encoder import GlobalICVEncoder
    from licv_vqa_tpu.icv.module import ICVModuleConfig, icv_loss_fn
    from licv_vqa_tpu.models.idefics import make_idefics_forward_fns
    from jax.sharding import NamedSharding
    import __graft_entry__ as g

    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    encoder = GlobalICVEncoder(cfg.text.d_model, cfg.text.n_layers)
    mcfg = ICVModuleConfig(hard_loss_weight=0.5)
    train_forward, _ = make_idefics_forward_fns(cfg, eos_token_id=2)
    trainable = {
        "encoder": encoder.init(jax.random.PRNGKey(1)),
        "temperature": jnp.float32(1.0),
    }
    batch = g._tiny_batch(cfg, bs=4)

    def loss_fn(t, p, b):
        loss, _ = icv_loss_fn(t, p, b, train_forward, encoder, mcfg, pad_token_id=0)
        return loss

    single = float(jax.jit(loss_fn)(trainable, params, batch))

    mesh = create_mesh(MeshConfig(dp=4, tp=2))
    specs = param_specs(params)
    params_s = jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    batch_s = jax.device_put(batch, NamedSharding(mesh, P("dp")))
    trainable_s = jax.device_put(trainable, NamedSharding(mesh, P()))
    sharded = float(jax.jit(loss_fn)(trainable_s, params_s, batch_s))
    np.testing.assert_allclose(sharded, single, rtol=2e-5)


def test_tp_sharded_beam_decode_matches_single_device():
    """Inference-side TP on the decode mode the reference evals with:
    beam_generate over Megatron-tp=2-sharded frozen weights (the layout a
    bf16 9B model needs to span two 16 GB chips — reference evals it on one
    80 GB A100, inference.py:313) emits token-identical beams to the
    unsharded run.  int8-quantized weights shard through the same specs
    (param_specs handles {"q","s"} leaves by parent name)."""
    from jax.sharding import NamedSharding
    from licv_vqa_tpu.core.mesh import MeshConfig, create_mesh
    from licv_vqa_tpu.infer.decode import beam_generate
    from licv_vqa_tpu.models.idefics import make_idefics_forward_fns

    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    _, bind = make_idefics_forward_fns(cfg, eos_token_id=2)

    rng = np.random.default_rng(11)
    b, s, max_new = 2, 10, 5
    isz = cfg.vision.image_size
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, size=(b, s)), jnp.int32)
    ids = ids.at[:, 1].set(cfg.image_token_id)
    mask = jnp.ones_like(ids)
    pixels = jnp.asarray(rng.normal(size=(b, 1, isz, isz, 3)), jnp.float32)
    pv = jnp.ones((b, 1), bool)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1, jnp.float32
    )

    def beams(p):
        fwd = bind(p, pixels, pv, ids, icv, s + max_new + 1)
        return np.asarray(
            beam_generate(
                fwd, ids, mask, max_new_tokens=max_new, eos_token_id=2,
                pad_token_id=0, num_beams=3,
            )
        )

    single = beams(params)

    mesh = create_mesh(MeshConfig(dp=1, tp=2), jax.devices()[:2])
    params_s = jax.device_put(
        params,
        jax.tree.map(
            lambda sp: NamedSharding(mesh, sp), param_specs(params),
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    # assert the layout REALLY carries a tp axis (not silent replication)
    wq_shard = params_s["layers"]["attn"]["wq"].sharding
    assert wq_shard.spec == P(None, None, "tp")
    np.testing.assert_array_equal(beams(params_s), single)
