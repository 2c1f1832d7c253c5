"""The training driver: mesh + jitted step + epoch loop.

Replaces PyTorch-Lightning ``Trainer`` + DeepSpeed (reference: train.py:55-77,
config/trainer/*.yaml).  Scaling model (SURVEY.md §2.5): the batch is sharded
over the mesh's ``dp`` axis, frozen LMM params are replicated (or tp-sharded
when ``strategy=dp_tp``), and ``jit`` emits the single tiny gradient ``psum``
for the ~131K-param ICV pytree — there is no user-level collective code.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.distributed import PreemptionGuard, is_main_process
from ..core.mesh import AXIS_DP, AXIS_SP, AXIS_TP, MeshConfig, create_mesh
from ..icv.encoder import GlobalICVEncoder
from ..icv.module import (
    ICVModuleConfig,
    TrainState,
    init_train_state,
    make_lr_schedules,
    make_optimizer,
    make_train_step,
)
from ..utils.log import get_logger
from ..utils.profiling import StepTimer, trace
from .checkpoint import StepCheckpointer, save_icv_checkpoint

logger = get_logger("train")


def _pad_batch_to_multiple(batch, multiple: int):
    """Zero-pad every leaf's batch dim to a dp multiple.

    Loss-neutral because ``icv_loss_fn`` gates both losses on row validity
    (any(attention_mask) per row): padded rows are excluded from the masked-KL
    mask and their CE labels are forced to -100 — in BOTH ``mask_ce_padding``
    modes and for any ``pad_token_id``."""
    if multiple <= 1:
        return batch

    def pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)

    return jax.tree.map(pad, batch)


def _sync_should_stop(local: bool) -> bool:
    """Global OR of the per-host preemption flag.

    SIGTERM lands on hosts at different times; acting on a host-local flag
    would let hosts enter the (collective) preemption save at different
    micro steps and deadlock the Orbax barrier.  Single-host: a no-op."""
    if jax.process_count() == 1:
        return bool(local)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray(bool(local)))
    return bool(np.max(flags))


def _is_seq_leaf(path, x) -> bool:
    """(B, S) token/mask leaf — the single predicate shared by seq padding
    and sp sharding so the two can never drift apart."""
    key = getattr(path[-1], "key", "") if path else ""
    return key in ("input_ids", "attention_mask") and getattr(x, "ndim", 0) == 2


def _pad_seq_to_multiple(batch, sp: int, pad_token_id: int):
    """Right-pad (B, S) token/mask leaves to an sp multiple for even
    ring-attention shards.  ids pad with ``pad_token_id`` and masks with 0,
    which is loss-neutral: ``answer_region_mask`` excludes pad ids and
    attention excludes mask-0 keys.  (With ``mask_ce_padding=false`` the
    reference-exact CE does see the extra pad columns, same as the
    reference's own collator padding would.)"""
    if sp <= 1:
        return batch

    def pad(path, x):
        if not _is_seq_leaf(path, x):
            return x
        rem = (-x.shape[1]) % sp
        if rem == 0:
            return x
        key = getattr(path[-1], "key", "")
        fill = pad_token_id if key == "input_ids" else 0
        return np.pad(
            np.asarray(x), [(0, 0), (0, rem)], constant_values=fill
        )

    return jax.tree_util.tree_map_with_path(pad, batch)


@dataclasses.dataclass
class TrainerConfig:
    """Mirror of config/trainer/*.yaml (reference override keys kept)."""

    devices: int = -1
    strategy: str = "dp"  # "dp" | "dp_tp" | "dp_sp" | "dp_tp_sp"
    tp: int = 1
    sp: int = 1  # sequence parallelism (ring attention over the sp axis)
    precision: str = "bf16-mixed"
    max_epochs: int = 10
    gradient_clip_val: float = 1.0
    log_every_n_steps: int = 10
    accumulate_grad_batches: int = 1
    checkpoint_every_n_steps: int = 200
    limit_train_batches: int = -1
    # multi-host: how often (in micro steps) hosts allgather the preemption
    # flag.  The sync must run on the SAME steps on every host (it is a
    # collective), so it cannot be gated on the local flag; syncing every
    # step serializes hosts on the slowest one's host loop each iteration.
    # N>1 trades up to N-1 extra micro steps of preemption latency for an
    # N-fold cheaper barrier cadence.  Single-host checks are local + free.
    preempt_sync_every_n_steps: int = 8
    remat: bool = True
    default_root_dir: str = "."
    profile_steps: int = 0  # >0: jax.profiler trace of steps [2, 2+N)

    @classmethod
    def from_config(cls, cfg) -> "TrainerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: cfg[k] for k in cfg.keys() if k in known}
        kw.pop("default_root_dir", None)
        try:
            kw["default_root_dir"] = str(cfg.get("default_root_dir", "."))
        except Exception:
            kw["default_root_dir"] = "."
        return cls(**kw)


class Trainer:
    def __init__(
        self,
        trainer_cfg: TrainerConfig,
        module_cfg: ICVModuleConfig,
        encoder: GlobalICVEncoder,
        forward_fn: Callable,  # (model_params, inputs, icv_scaled) -> logits
        model_params: Any,
        pad_token_id: int,
        mesh=None,
        metrics_hook: Optional[Callable[[int, dict], None]] = None,
        head_fn: Optional[Callable] = None,  # (model_params, hidden) -> logits:
        # enables the teacher gather-before-head memory lever (icv_loss_fn)
    ):
        self.cfg = trainer_cfg
        self.module_cfg = dataclasses.replace(
            module_cfg,
            gradient_clip_val=trainer_cfg.gradient_clip_val,
            accumulate_grad_batches=trainer_cfg.accumulate_grad_batches,
        )
        self.encoder = encoder
        self.forward_fn = forward_fn
        self.head_fn = head_fn
        self.pad_token_id = pad_token_id
        self.metrics_hook = metrics_hook

        if mesh is None:
            n = trainer_cfg.devices
            devices = jax.devices()
            if n not in (-1, 0) and n < len(devices):
                devices = devices[:n]
            tp = trainer_cfg.tp if "tp" in trainer_cfg.strategy else 1
            sp = trainer_cfg.sp if "sp" in trainer_cfg.strategy else 1
            mesh = create_mesh(MeshConfig(dp=-1, tp=tp, sp=sp), devices)
        self.mesh = mesh
        self.repl = NamedSharding(mesh, P())
        self.batch_shard = NamedSharding(mesh, P(AXIS_DP))
        self.sp = mesh.shape.get(AXIS_SP, 1)
        if self.sp > 1:
            # sequence parallelism: the model's train forward runs ring
            # attention over sp (parallel/ring.py); the spec is static
            from functools import partial

            from ..parallel.ring import RingSpec

            self.forward_fn = partial(
                self.forward_fn, ring_spec=RingSpec.from_mesh(mesh)
            )
        # frozen weights: replicated under plain dp; Megatron column/row
        # tp-sharded under strategy=dp_tp (parallel/sharding.py rules) — the
        # 32-layer 9B flagship exceeds one v5e's HBM in bf16, so tp is a
        # load-bearing capability, not an option.
        if "tp" in trainer_cfg.strategy and mesh.shape.get(AXIS_TP, 1) > 1:
            from ..parallel.sharding import param_specs

            shardings = jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                param_specs(model_params),
                is_leaf=lambda x: isinstance(x, P),
            )
            self.model_params = jax.device_put(model_params, shardings)
        else:
            self.model_params = jax.device_put(model_params, self.repl)

    # ------------------------------------------------------------------
    def _shard_batch(self, batch):
        """dp-shard the batch; with sp>1, token/mask seq dims also sp-shard
        (the ring's shard_map requires the layout its in_specs name).

        Multi-host: each host loads a DISJOINT per-host batch (grain
        shard_index/count), so the local arrays are this process's SHARD of
        a global batch — assembled with make_array_from_process_local_data
        (a plain device_put would treat each host's batch as the same global
        array and silently drop the rows outside its addressable slice)."""
        seq = NamedSharding(self.mesh, P(AXIS_DP, AXIS_SP))
        multihost = jax.process_count() > 1

        def put(path, x):
            sh = (
                seq
                if self.sp > 1 and _is_seq_leaf(path, x)
                else self.batch_shard
            )
            if multihost:
                return jax.make_array_from_process_local_data(sh, np.asarray(x))
            return jax.device_put(x, sh)

        return jax.tree_util.tree_map_with_path(put, batch)

    # ------------------------------------------------------------------
    def fit(
        self,
        loader,
        run_dir: str | Path,
        lmm_args: Optional[dict] = None,
        use_sigmoid: bool = False,
    ) -> TrainState:
        cfg = self.cfg
        if jax.process_count() > 1 and (
            getattr(loader, "shard_count", 1) != jax.process_count()
        ):
            # the threaded DataLoader has no per-host sharding: every host
            # would build the SAME seed-determined order and
            # make_array_from_process_local_data would stitch P identical
            # copies into the "global" batch — P-fold reported scale with
            # single-host gradients, silently
            raise ValueError(
                "multi-host training needs per-host disjoint batches: use "
                "data_cfg.loader=grain (shard_index/shard_count are wired "
                "through train.py), not the threaded loader"
            )
        steps_per_epoch = len(loader)
        if cfg.limit_train_batches and cfg.limit_train_batches > 0:
            steps_per_epoch = min(steps_per_epoch, cfg.limit_train_batches)
        total_micro = steps_per_epoch * cfg.max_epochs
        total_steps = max(1, total_micro // cfg.accumulate_grad_batches)

        # fractional decay_per_step = fraction of total steps (reference:
        # icv_src/icv_module.py:54-68)
        mcfg = self.module_cfg
        if 0 < mcfg.decay_per_step < 1:
            mcfg = dataclasses.replace(
                mcfg, decay_per_step=max(1, int(total_steps * mcfg.decay_per_step))
            )
            self.module_cfg = mcfg

        optimizer = make_optimizer(self.module_cfg, total_steps)
        state = init_train_state(
            jax.random.PRNGKey(0), self.encoder, self.module_cfg, optimizer
        )
        state = jax.device_put(state, self.repl)

        run_dir = Path(run_dir)
        ckpt = StepCheckpointer(run_dir / "steps")
        resume_step, state = ckpt.restore(state)
        restored_loader = False
        if resume_step is not None:
            logger.info("resumed from step checkpoint %d", resume_step)
            # only restore the iterator for a MID-epoch checkpoint: a save at
            # an epoch boundary captured an exhausted iterator, and replaying
            # it would silently train the next epoch on zero batches — the
            # fresh seed+epoch rebuild below is the correct boundary resume
            mid_epoch = (
                steps_per_epoch and resume_step % steps_per_epoch != 0
            )
            loader_state = (
                ckpt.restore_loader_state(resume_step) if mid_epoch else None
            )
            if loader_state is not None and hasattr(loader, "set_state"):
                # checkpointable loader (grain): replay the exact remaining
                # mid-epoch sample order
                loader.set_state(loader_state)
                restored_loader = True
                logger.info("restored input-iterator state")

        step_fn = jax.jit(
            make_train_step(
                self.forward_fn,
                self.encoder,
                self.module_cfg,
                optimizer,
                self.pad_token_id,
                lr_schedules=make_lr_schedules(self.module_cfg, total_steps),
                head_fn=self.head_fn,
            ),
            donate_argnums=(0,),
        )

        micro_step = int(np.asarray(state.step)) * 1  # counts micro-batches
        start_micro = micro_step  # it/s counts THIS process's steps only
        done = False
        t0 = time.time()
        timer = StepTimer()
        profiler_ctx = None
        guard = PreemptionGuard()

        def loader_snapshot():
            return loader.get_state() if hasattr(loader, "get_state") else None

        # deterministic resume: continue at the exact epoch/batch the restored
        # step corresponds to.  Checkpointable loaders resume via their saved
        # iterator state; otherwise the per-epoch shuffle is seed-determined
        # and already-seen batches fast-forward.
        epoch_start = micro_step // steps_per_epoch if steps_per_epoch else 0
        skip_batches = micro_step % steps_per_epoch if steps_per_epoch else 0
        if not restored_loader and epoch_start and hasattr(loader, "epoch"):
            # per-epoch shuffles are seeded seed+epoch off the loader's own
            # counter; a fresh post-restart loader must jump to the resume
            # epoch to reproduce the same orders
            loader.epoch = epoch_start
        for epoch in range(min(epoch_start, cfg.max_epochs), cfg.max_epochs):
            if done:
                break
            offset = skip_batches if epoch == epoch_start else 0
            limit = steps_per_epoch - (offset if restored_loader else 0)
            batch_iter = iter(loader)
            bi = -1
            while True:
                # preemption is checked BEFORE pulling the next batch: the
                # loader state saved here is the pre-fetch snapshot, so a
                # set_state resume replays exactly the untrained remainder
                # (fetching first would advance the iterator past a batch
                # that never trains, silently dropping it).  Multi-host: the
                # flag is synced so every host stops at the SAME micro step
                # — the save below is a collective Orbax call and mismatched
                # steps would deadlock it; the sync cadence must therefore
                # be a pure function of micro_step (identical on all hosts),
                # never of the host-local flag.
                check_stop = (
                    jax.process_count() == 1
                    or micro_step % max(1, cfg.preempt_sync_every_n_steps) == 0
                )
                if check_stop and _sync_should_stop(guard.should_stop):
                    logger.warning(
                        "preemption requested — checkpointing at micro %d",
                        micro_step,
                    )
                    # During a seed-based fast-forward the iterator has
                    # consumed SKIPPED batches beyond micro_step's position:
                    # a snapshot here would make the next resume re-train
                    # the skipped prefix and silently drop the epoch tail.
                    # Saving no loader state falls back to the (correct)
                    # seed+epoch fast-forward on resume.
                    ffwd = (
                        not restored_loader
                        and epoch == epoch_start
                        and (bi + 1) < offset
                    )
                    ckpt.save(
                        micro_step,
                        state,
                        loader_state=None if ffwd else loader_snapshot(),
                    )
                    done = True
                    break
                if micro_step >= total_micro:
                    done = True
                    break
                try:
                    batch = next(batch_iter)
                except StopIteration:
                    break
                bi += 1
                if bi >= limit:
                    break
                if not restored_loader and epoch == epoch_start and bi < offset:
                    continue  # fast-forward through already-trained batches
                if cfg.profile_steps > 0 and micro_step == 2:
                    profiler_ctx = trace(run_dir / "profile")
                    profiler_ctx.__enter__()
                batch = _pad_batch_to_multiple(batch, self.mesh.shape[AXIS_DP])
                batch = _pad_seq_to_multiple(batch, self.sp, self.pad_token_id)
                batch = self._shard_batch(batch)
                state, metrics = step_fn(state, self.model_params, batch)
                micro_step += 1
                timer.tick()
                if profiler_ctx is not None and micro_step >= 2 + cfg.profile_steps:
                    jax.block_until_ready(metrics["loss"])
                    profiler_ctx.__exit__(None, None, None)
                    profiler_ctx = None
                    logger.info("profiler trace written to %s", run_dir / "profile")
                if micro_step % max(1, cfg.log_every_n_steps) == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    if not np.isfinite(m.get("loss", 0.0)):
                        logger.error(
                            "non-finite loss at micro %d: %s — check data/lr",
                            micro_step,
                            {k: v for k, v in m.items() if "loss" in k},
                        )
                    m.update(timer.stats)
                    dt = time.time() - t0
                    logger.info(
                        "epoch %d micro %d/%d loss=%.4f kl=%.4f (%.2f it/s)",
                        epoch,
                        micro_step,
                        total_micro,
                        m.get("loss", float("nan")),
                        m.get("kl_loss", float("nan")),
                        (micro_step - start_micro) / max(dt, 1e-6),
                    )
                    if self.metrics_hook:
                        self.metrics_hook(micro_step, m)
                if (
                    cfg.checkpoint_every_n_steps > 0
                    and micro_step % cfg.checkpoint_every_n_steps == 0
                ):
                    # Orbax saves are COLLECTIVE: every host must call save
                    # (the manager coordinates who writes), matching restore
                    # above and the preemption save — a rank gate here would
                    # desynchronize hosts after resume on non-shared storage.
                    ckpt.save(micro_step, state, loader_state=loader_snapshot())
        if profiler_ctx is not None:
            profiler_ctx.__exit__(None, None, None)
        ckpt.wait()

        # final artifact with the reference's exact key contract (rank 0 only,
        # like the reference's @rank_zero_only postprocess, train.py:88)
        if not is_main_process():
            return state
        icv_np = jax.tree.map(np.asarray, state.params["encoder"])
        save_icv_checkpoint(
            run_dir,
            icv_np,
            use_sigmoid=use_sigmoid,
            lmm_args=lmm_args or {},
            temperature=float(np.asarray(state.params["temperature"])),
        )
        logger.info("saved %s", run_dir / "icv_cpk.pth")
        return state
