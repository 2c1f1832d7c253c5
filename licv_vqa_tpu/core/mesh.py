"""Device mesh construction and sharding helpers.

The reference scales via PyTorch-Lightning DDP / DeepSpeed ZeRO-2 over NCCL
(reference: config/trainer/{ddp,zero2}.yaml, requirements.txt:101).  The
TPU-native equivalent is a named ``jax.sharding.Mesh`` over ICI with XLA
inserting all collectives — there is no user-level communication code
anywhere in this framework.

Axes:

- ``dp``   — data parallel (batch axis).  Replaces DDP; gradient ``psum`` on
  the ~131K-param ICV pytree is emitted by ``jit`` from the shardings.
- ``tp``   — tensor parallel (attention heads / MLP hidden).  The reference
  has no TP; we add it so the frozen 9B weights can shard when per-chip HBM
  requires it (SURVEY.md §2.5).
- ``sp``   — sequence axis, load-bearing: ring attention shards Q/K/V over
  ``sp`` with ``shard_map`` + ``ppermute`` (parallel/ring.py) and the Trainer
  runs it under ``strategy=dp_sp`` / ``dp_tp_sp``.  (B, S) batch leaves
  seq-shard as ``P(dp, sp)``.  The reference has no sequence parallelism at
  all (SURVEY.md §5.7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_TP = "tp"
AXIS_SP = "sp"
MESH_AXES = (AXIS_DP, AXIS_TP, AXIS_SP)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. ``-1`` on one axis absorbs remaining devices."""

    dp: int = -1
    tp: int = 1
    sp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        sizes = [self.dp, self.tp, self.sp]
        if sizes.count(-1) > 1:
            raise ValueError("at most one mesh axis may be -1")
        known = int(np.prod([s for s in sizes if s != -1]))
        if -1 in sizes:
            if n_devices % known:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {known}"
                )
            sizes[sizes.index(-1)] = n_devices // known
        if int(np.prod(sizes)) != n_devices:
            raise ValueError(f"mesh {tuple(sizes)} != {n_devices} devices")
        return tuple(sizes)  # type: ignore[return-value]


def create_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a 3-axis ``Mesh`` (dp, tp, sp) over the given devices.

    Device order is kept as given by ``jax.devices()`` so that the fastest
    varying axis (tp) lands on nearest-neighbor ICI links.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    dp, tp, sp = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(dp, tp, sp)
    return Mesh(dev_array, MESH_AXES)


def local_mesh() -> Mesh:
    """Single-process mesh over all local devices, all on the dp axis."""
    return create_mesh(MeshConfig(dp=-1, tp=1, sp=1))


def with_sharding(mesh: Mesh, tree: Any, spec_tree: Any) -> Any:
    """Apply ``NamedSharding(mesh, spec)`` leaf-wise via ``device_put``.

    ``spec_tree`` may be a single PartitionSpec (broadcast to all leaves),
    an exact-structure pytree of specs, or a container PREFIX of ``tree``
    whose PartitionSpec leaves each apply to the whole corresponding
    subtree (``jax.tree.map`` alone cannot express that — its prefix rule
    runs the other way)."""
    if isinstance(spec_tree, P):
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, spec_tree)), tree
        )

    def resolve(path, x):
        node = spec_tree
        for entry in path:
            if isinstance(node, P):
                break  # spec covers this whole subtree
            key = getattr(entry, "key", getattr(entry, "idx", None))
            try:
                node = node[key]
            except (KeyError, IndexError, TypeError) as e:
                raise ValueError(
                    f"spec_tree has no spec covering tree path {path}"
                ) from e
        if not isinstance(node, P):
            raise ValueError(
                f"spec_tree entry at {path} is {type(node).__name__}, "
                "expected PartitionSpec"
            )
        return jax.device_put(x, NamedSharding(mesh, node))

    return jax.tree_util.tree_map_with_path(resolve, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp; replicate everything else."""
    return NamedSharding(mesh, P(AXIS_DP))
