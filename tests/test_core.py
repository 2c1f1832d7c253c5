import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from licv_vqa_tpu.core import MeshConfig, create_mesh, local_mesh, with_sharding
from licv_vqa_tpu.core.precision import PrecisionPolicy


def test_mesh_axes_and_shape():
    mesh = create_mesh(MeshConfig(dp=2, tp=4, sp=1))
    assert mesh.axis_names == ("dp", "tp", "sp")
    assert mesh.devices.shape == (2, 4, 1)


def test_mesh_wildcard_axis():
    mesh = create_mesh(MeshConfig(dp=-1, tp=2))
    assert mesh.devices.shape == (4, 2, 1)
    with pytest.raises(ValueError):
        MeshConfig(dp=-1, tp=-1).resolve(8)
    with pytest.raises(ValueError):
        MeshConfig(dp=3, tp=1).resolve(8)


def test_local_mesh_all_dp():
    mesh = local_mesh()
    assert mesh.devices.shape == (len(jax.devices()), 1, 1)


def test_with_sharding_and_psum():
    mesh = create_mesh(MeshConfig(dp=8))
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    xs = with_sharding(mesh, x, P("dp"))
    assert xs.sharding.spec == P("dp")
    # jit over the mesh produces the same math as unsharded
    y = jax.jit(lambda a: jnp.sum(a, axis=0))(xs)
    np.testing.assert_allclose(np.asarray(y), x.sum(0))


def test_precision_policy():
    pol = PrecisionPolicy.from_string("bf16-mixed")
    assert pol.param_dtype == jnp.bfloat16
    assert pol.loss_dtype == jnp.float32
    tree = {"w": jnp.ones((2, 2), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    cast = pol.cast_params(tree)
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["i"].dtype == jnp.int32


def test_with_sharding_prefix_spec_tree():
    """A spec_tree that is a container PREFIX of the param tree applies each
    PartitionSpec leaf to the whole corresponding subtree."""
    import numpy as np
    from licv_vqa_tpu.core.mesh import MeshConfig, create_mesh, with_sharding
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(MeshConfig(dp=-1, tp=1, sp=1))
    tree = {
        "a": {"x": jnp.zeros((8, 4)), "y": jnp.zeros((8, 2))},
        "b": jnp.zeros((3,)),
    }
    out = with_sharding(mesh, tree, {"a": P("dp"), "b": P()})
    for leaf in (out["a"]["x"], out["a"]["y"]):
        assert leaf.sharding.spec == P("dp")
    assert out["b"].sharding.spec == P()

    import pytest

    with pytest.raises(ValueError, match="no spec"):
        with_sharding(mesh, tree, {"a": P("dp")})  # "b" uncovered
