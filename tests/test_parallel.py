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
