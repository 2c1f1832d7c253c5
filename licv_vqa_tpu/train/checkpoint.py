"""Checkpoint IO.

Two layers:

1. **The ``icv_cpk.pth`` artifact** — the reference's end-of-training product
   (reference: train.py:88-110), carrying exactly
   ``{"icv_encoder.icv": (1,L,D), "icv_encoder.alpha": (1,L),
   "use_sigmoid": bool, "lmm_args": dict}`` and consumed at
   inference.py:95-107.  We write a REAL torch pickle with the same keys, so
   checkpoints are interchangeable with the PyTorch reference in both
   directions.

2. **Orbax step checkpoints** for mid-training resume — the reference has
   none (``enable_checkpointing=False``, reference: train.py:63; SURVEY.md
   §5.4 flags this as a gap): TPU pods preempt, so we checkpoint the train
   state every N steps with atomic writes and auto-resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

ICV_CPK_NAME = "icv_cpk.pth"


def save_icv_checkpoint(
    save_dir: str | Path,
    icv_params: dict,  # {"icv": (L, D), "alpha": (L,)} float32
    use_sigmoid: bool,
    lmm_args: dict,
    temperature: Optional[float] = None,
) -> Path:
    import torch

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    state = {
        "icv_encoder.icv": torch.tensor(np.asarray(icv_params["icv"], np.float32))[
            None
        ],
        "icv_encoder.alpha": torch.tensor(
            np.asarray(icv_params["alpha"], np.float32)
        )[None],
        "use_sigmoid": bool(use_sigmoid),
        "lmm_args": dict(lmm_args),
    }
    if temperature is not None:
        state["temperature"] = torch.tensor(float(temperature))
    path = save_dir / ICV_CPK_NAME
    tmp = path.with_suffix(".tmp")
    torch.save(state, tmp)
    tmp.rename(path)  # atomic publish
    return path


def load_icv_checkpoint(path: str | Path) -> dict:
    """Load an ``icv_cpk.pth`` (ours or the reference's).

    Returns ``{"icv": (L,D) f32, "alpha": (L,) f32 (sigmoid applied iff
    use_sigmoid — reference: inference.py:99-100), "lmm_args": dict}``.
    """
    import torch

    path = Path(path)
    if path.is_dir():
        path = path / ICV_CPK_NAME
    state = torch.load(path, map_location="cpu", weights_only=False)
    icv = jnp.asarray(state["icv_encoder.icv"].float().numpy())[0]
    alpha = jnp.asarray(state["icv_encoder.alpha"].float().numpy())[0]
    if state.get("use_sigmoid", None):
        alpha = jax.nn.sigmoid(alpha)
    return {
        "icv": icv,
        "alpha": alpha,
        "lmm_args": dict(state.get("lmm_args", {})),
    }


# ---------------------------------------------------------------------------
# Orbax step checkpoints
# ---------------------------------------------------------------------------


class StepCheckpointer:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).absolute()
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self, step: int, state: Any, loader_state: Optional[bytes] = None
    ) -> None:
        # Idempotent per step: a preemption that lands before the first
        # post-resume train step (or during the seed fast-forward) re-saves
        # the very step just restored — the state is byte-identical, and a
        # second manager.save(step) would raise StepAlreadyExists.
        if step not in set(self.manager.all_steps()):
            self.manager.save(
                step,
                args=self._ocp.args.StandardSave(jax.tree.map(np.asarray, state)),
            )
        if loader_state is not None:
            # per-host side channel (each host owns its input-iterator state);
            # lets a preempted run resume the EXACT remaining sample order
            path = self.directory / self._loader_name(step)
            tmp = path.with_suffix(".tmp")
            tmp.write_bytes(loader_state)
            tmp.rename(path)
            self._prune_loader_states()

    def _loader_name(self, step: int) -> str:
        return f"loader_{step}_p{jax.process_index()}.bin"

    def _prune_loader_states(self) -> None:
        kept = set(self.manager.all_steps())
        for p in self.directory.glob("loader_*_p*.bin"):
            try:
                step = int(p.name.split("_")[1])
            except (IndexError, ValueError):
                continue
            if step not in kept:
                p.unlink(missing_ok=True)

    def restore_loader_state(self, step: int) -> Optional[bytes]:
        path = self.directory / self._loader_name(step)
        return path.read_bytes() if path.exists() else None

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_like: Any) -> tuple[Optional[int], Any]:
        step = self.manager.latest_step()
        if step is None:
            return None, state_like
        abstract = jax.tree.map(np.asarray, state_like)
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract)
        )
        return step, jax.tree.map(jnp.asarray, restored)

    def wait(self):
        self.manager.wait_until_finished()
