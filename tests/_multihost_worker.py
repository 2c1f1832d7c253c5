"""Worker for the SIMULATED multi-host training test (VERDICT r2 missing #3).

Launched once per fake host by tests/test_multihost.py with::

    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
    python tests/_multihost_worker.py --process-id I --num-processes 2 \
        --coordinator localhost:PORT --run-dir D --out OUT.npz

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device dp mesh (gloo CPU collectives).  The worker
exercises the full multi-host training story the reference gets from
PL ``devices=4`` (reference: README.md:133, config/trainer/ddp.yaml:5):

- grain loader with per-host DISJOINT shards (shard_index/shard_count);
- global-batch assembly via ``make_array_from_process_local_data``
  (train/trainer.py::_shard_batch);
- COLLECTIVE Orbax step save (every host calls save) + resume: fit #1 runs
  1 epoch and checkpoints; fit #2 resumes from the step checkpoint and
  finishes epoch 2;
- rank-0-only final ``icv_cpk.pth`` artifact.

Writes the final ICV + the set of dataset indices this host actually read
to ``--out`` so the parent can assert shard disjointness and compare the
final ICV against a single-process golden run.

NOTE the multi-host shape contract this test also demonstrates: every host's
collated batch must agree on the non-batch dims (the processor's
``pad_to_multiple`` seq buckets guarantee it here) — assembly of ragged
per-host shapes is undefined.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys


def build_components(n: int = 8):
    """Dataset + prewarmed processor + collator, identical on every host."""
    import numpy as np

    from licv_vqa_tpu.data.collator import collate_icv_batch
    from licv_vqa_tpu.data.processor import ImageTransform, PromptProcessor
    from licv_vqa_tpu.data.tokenizer import WhitespaceTokenizer

    class SyntheticICVDataset:
        def __init__(self, n):
            self.n = n
            self.rng = np.random.default_rng(0)
            self.seen = set()  # indices this process actually read

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.seen.add(int(i))
            img = self.rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
            return {
                "ice_prompt": [img, f"Question:shot {i}? Short answer:a{i}.\n\n"],
                "query_prompt": [img, f"Question:q {i}? Short answer:b{i}"],
                "query_x": [img, f"Question:q {i}? Short answer:"],
            }

    ds = SyntheticICVDataset(n)
    proc = PromptProcessor(
        WhitespaceTokenizer(), ImageTransform(28), family="idefics",
        pad_to_multiple=8,
    )
    # first-seen vocab: prewarm in INDEX order so ids match across hosts
    # regardless of each host's shard/shuffle order
    for i in range(n):
        item = ds[i]
        for k in ("ice_prompt", "query_prompt", "query_x"):
            for piece in item[k]:
                if isinstance(piece, str):
                    proc.tokenizer.encode(piece)
    ds.seen.clear()
    collate = functools.partial(collate_icv_batch, processor=proc)
    return ds, collate


def run_training(
    run_dir,
    shard_index: int = 0,
    shard_count: int = 1,
    per_host_bs: int = 2,
    strategy: str = "dp",
    tp: int = 1,
):
    """Two fits: 1-epoch (collective checkpoint) then 2-epoch resume.
    Returns (final_icv ndarray, sorted seen indices)."""
    import jax
    import numpy as np

    from licv_vqa_tpu.icv.encoder import GlobalICVEncoder
    from licv_vqa_tpu.icv.module import ICVModuleConfig
    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
    )
    from licv_vqa_tpu.train.grain_loader import GrainDataLoader
    from licv_vqa_tpu.train.trainer import Trainer, TrainerConfig

    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    train_forward, _ = make_idefics_forward_fns(cfg, eos_token_id=2)

    ds, collate = build_components()
    loader = GrainDataLoader(
        ds, batch_size=per_host_bs, collate_fn=collate, num_workers=0,
        seed=0, shard_index=shard_index, shard_count=shard_count,
    )

    def make_trainer(max_epochs):
        return Trainer(
            TrainerConfig(
                max_epochs=max_epochs,
                checkpoint_every_n_steps=1,
                log_every_n_steps=1,
                limit_train_batches=-1,
                strategy=strategy,
                tp=tp,
            ),
            ICVModuleConfig(icv_lr=1e-2, warm_steps=0),
            GlobalICVEncoder(cfg.text.d_model, cfg.text.n_layers),
            train_forward,
            params,
            pad_token_id=0,
        )

    trainer1 = make_trainer(max_epochs=1)
    if tp > 1:
        # the frozen params must REALLY be tp-sharded on the global mesh —
        # a silent fallback to replication would still pass the numerics
        from licv_vqa_tpu.core.mesh import AXIS_TP

        def _has_tp(spec):
            for axes in spec:
                axes = axes if isinstance(axes, tuple) else (axes,)
                if AXIS_TP in axes:
                    return True
            return False

        specs = {
            leaf.sharding.spec
            for leaf in jax.tree.leaves(trainer1.model_params)
        }
        assert any(_has_tp(s) for s in specs), specs
    state1 = trainer1.fit(loader, run_dir, lmm_args={})
    assert int(np.asarray(state1.step)) == len(loader)
    # per-EPOCH shard disjointness is the invariant (each epoch reshuffles,
    # so a host's union across epochs overlaps the other host's by design)
    seen_epoch0 = sorted(ds.seen)
    ds.seen.clear()
    # fresh loader for the resumed fit (a restarted job would rebuild it too)
    loader2 = GrainDataLoader(
        ds, batch_size=per_host_bs, collate_fn=collate, num_workers=0,
        seed=0, shard_index=shard_index, shard_count=shard_count,
    )
    state2 = make_trainer(max_epochs=2).fit(loader2, run_dir, lmm_args={})
    assert int(np.asarray(state2.step)) == 2 * len(loader)
    # state is fully replicated: every process holds addressable replicas,
    # so a plain host readback works in single- and multi-process runs alike
    icv = np.asarray(state2.params["encoder"]["icv"])
    return icv, (seen_epoch0, sorted(ds.seen))


class _FlipAfterPolls:
    """Fake PreemptionGuard: should_stop turns True from the (n+1)-th poll."""

    def __init__(self, n):
        self.n = n
        self.polls = 0

    @property
    def should_stop(self):
        self.polls += 1
        return self.polls > self.n


def run_preemption(run_dir, shard_index: int, shard_count: int):
    """One host (rank 0) is 'preempted' after 2 polls; the other never is.

    Exercises ``_sync_should_stop``: without the cross-host flag sync, rank 1
    would train on while rank 0 enters the COLLECTIVE Orbax save — mismatched
    steps, distributed deadlock (this test would time out).  With it, both
    hosts stop at the same micro step and the save completes.  Then both
    resume with a REAL guard and finish; returns (final_icv, stop_step)."""
    import jax
    import numpy as np

    import licv_vqa_tpu.train.trainer as trainer_mod
    from licv_vqa_tpu.icv.encoder import GlobalICVEncoder
    from licv_vqa_tpu.icv.module import ICVModuleConfig
    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
    )
    from licv_vqa_tpu.train.grain_loader import GrainDataLoader
    from licv_vqa_tpu.train.trainer import Trainer, TrainerConfig

    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    train_forward, _ = make_idefics_forward_fns(cfg, eos_token_id=2)
    ds, collate = build_components()

    def make_loader():
        return GrainDataLoader(
            ds, batch_size=2, collate_fn=collate, num_workers=0,
            seed=0, shard_index=shard_index, shard_count=shard_count,
        )

    def make_trainer():
        return Trainer(
            # sync cadence 1: the test pins the exact stop step (micro 1);
            # the default cadence (8) would defer the collective flag check
            # past this tiny run's 4 total micros
            TrainerConfig(max_epochs=2, checkpoint_every_n_steps=0,
                          log_every_n_steps=1, limit_train_batches=-1,
                          preempt_sync_every_n_steps=1),
            ICVModuleConfig(icv_lr=1e-2, warm_steps=0),
            GlobalICVEncoder(cfg.text.d_model, cfg.text.n_layers),
            train_forward,
            params,
            pad_token_id=0,
        )

    real_guard = trainer_mod.PreemptionGuard
    if shard_index == 0:
        # stop mid-epoch (micro 1 of 4) so the resume leg also exercises the
        # grain mid-epoch iterator replay under multi-host
        trainer_mod.PreemptionGuard = lambda: _FlipAfterPolls(1)
    try:
        state = make_trainer().fit(make_loader(), run_dir, lmm_args={})
    finally:
        trainer_mod.PreemptionGuard = real_guard
    stop_step = int(np.asarray(state.step))
    total = 2 * 2  # 2 epochs × (8/2 hosts / bs 2) batches
    assert stop_step < total, (stop_step, total)  # actually preempted

    state2 = make_trainer().fit(make_loader(), run_dir, lmm_args={})
    assert int(np.asarray(state2.step)) == total
    return np.asarray(state2.params["encoder"]["icv"]), stop_step


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--mode", default="train", choices=["train", "preempt", "tp"]
    )
    args = ap.parse_args()

    # platform pins must precede the first jax import
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == 4 * args.num_processes, jax.devices()

    import numpy as np

    if args.mode == "preempt":
        icv, stop_step = run_preemption(
            args.run_dir,
            shard_index=args.process_id,
            shard_count=args.num_processes,
        )
        np.savez(args.out, icv=icv, stop_step=np.int64(stop_step))
        print(f"worker {args.process_id}: preempt ok stop={stop_step}", flush=True)
        return

    # mode "tp": dp shards across hosts (grain per-host batches), tp shards
    # the frozen model params WITHIN each host (tp=2 — the tiny model's
    # first-seen vocab isn't 4-divisible; the realistic layout is the same:
    # tp rides the fast intra-host links, dp crosses hosts); GSPMD emits the
    # tp collectives, multi-host assembly is unchanged.
    strategy, tp = ("dp_tp", 2) if args.mode == "tp" else ("dp", 1)
    icv, (seen0, seen1) = run_training(
        args.run_dir,
        shard_index=args.process_id,
        shard_count=args.num_processes,
        strategy=strategy,
        tp=tp,
    )
    np.savez(
        args.out,
        icv=icv,
        seen_epoch0=np.asarray(seen0, np.int64),
        seen_epoch1=np.asarray(seen1, np.int64),
    )
    print(f"worker {args.process_id}: ok e0={seen0} e1={seen1}", flush=True)


if __name__ == "__main__":
    main()
