"""Trainer integration: Orbax step-checkpoint auto-resume (SURVEY.md §5.3-5.4
— the reference cannot resume mid-training; TPU pods preempt, so we must)."""

import functools

import numpy as np
import pytest

from licv_vqa_tpu.data.collator import collate_icv_batch
from licv_vqa_tpu.data.processor import ImageTransform, PromptProcessor
from licv_vqa_tpu.data.tokenizer import WhitespaceTokenizer
from licv_vqa_tpu.icv.encoder import GlobalICVEncoder
from licv_vqa_tpu.icv.module import ICVModuleConfig
from licv_vqa_tpu.train.loader import DataLoader
from licv_vqa_tpu.train.trainer import Trainer, TrainerConfig


class SyntheticICVDataset:
    """Emits prompt-structure dicts the collator understands, no images
    needed beyond tiny arrays."""

    def __init__(self, n=8):
        self.n = n
        self.rng = np.random.default_rng(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = self.rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
        return {
            "ice_prompt": [img, f"Question:shot {i}? Short answer:a{i}.\n\n"],
            "query_prompt": [img, f"Question:q {i}? Short answer:b{i}"],
            "query_x": [img, f"Question:q {i}? Short answer:"],
        }


def _trainer(tmp_path, max_epochs=2, ckpt_every=2, strategy="dp", tp=1, sp=1):
    import jax
    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
    )

    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    train_forward, _ = make_idefics_forward_fns(cfg, eos_token_id=2)
    encoder = GlobalICVEncoder(cfg.text.d_model, cfg.text.n_layers)
    tcfg = TrainerConfig(
        max_epochs=max_epochs,
        checkpoint_every_n_steps=ckpt_every,
        log_every_n_steps=1,
        accumulate_grad_batches=1,
        limit_train_batches=2,
        strategy=strategy,
        tp=tp,
        sp=sp,
    )
    trainer = Trainer(
        tcfg,
        ICVModuleConfig(icv_lr=1e-2, warm_steps=0),
        encoder,
        train_forward,
        params,
        pad_token_id=0,
    )
    proc = PromptProcessor(
        WhitespaceTokenizer(), ImageTransform(28), family="idefics", pad_to_multiple=8
    )
    loader = DataLoader(
        SyntheticICVDataset(),
        batch_size=2,
        collate_fn=functools.partial(collate_icv_batch, processor=proc),
        num_workers=1,
    )
    return trainer, loader


def test_resume_from_step_checkpoint(tmp_path):
    run_dir = tmp_path / "run"
    trainer, loader = _trainer(tmp_path, max_epochs=1)
    state1 = trainer.fit(loader, run_dir, lmm_args={"total_layers": 4})
    steps_after_first = int(np.asarray(state1.step))
    assert steps_after_first == 2  # 1 epoch × 2 limited batches
    assert (run_dir / "icv_cpk.pth").exists()

    # a fresh trainer with more epochs resumes from the saved step
    trainer2, loader2 = _trainer(tmp_path, max_epochs=2)
    state2 = trainer2.fit(loader2, run_dir, lmm_args={"total_layers": 4})
    steps_after_second = int(np.asarray(state2.step))
    assert steps_after_second == 4  # resumed at 2, ran 2 more
    # resumed params differ from a cold init (training actually continued)
    assert not np.allclose(
        np.asarray(state2.params["encoder"]["icv"]),
        np.asarray(state1.params["encoder"]["icv"]),
    )


def test_dp_tp_fit_shards_frozen_weights(tmp_path):
    """strategy=dp_tp applies the Megatron param_specs to the frozen LMM
    (VERDICT r1: the Trainer used to replicate regardless) and matches the
    plain-dp run numerically."""
    from licv_vqa_tpu.core.mesh import AXIS_TP

    run_dir = tmp_path / "run_tp"
    trainer, loader = _trainer(tmp_path, max_epochs=1, strategy="dp_tp", tp=2)
    assert trainer.mesh.shape[AXIS_TP] == 2
    # frozen weights actually tp-sharded: a column-split kernel has a
    # non-replicated sharding spec
    wq = trainer.model_params["layers"]["attn"]["wq"]
    spec = wq.sharding.spec
    assert AXIS_TP in [ax for ax in spec if ax is not None], spec
    state_tp = trainer.fit(loader, run_dir, lmm_args={"total_layers": 4})

    trainer_dp, loader_dp = _trainer(tmp_path, max_epochs=1)
    state_dp = trainer_dp.fit(loader_dp, tmp_path / "run_dp", lmm_args={})
    # tp=2 changes the reduction ORDER of every sharded matmul, and XLA:CPU's
    # thread partitioning (hence its own reduction order) varies with host
    # load — observed up to ~1e-3 rel drift under a saturated CPU.  A broken
    # sharding produces garbage, not 1e-3-close values, so the loose rtol
    # still pins the equivalence.
    np.testing.assert_allclose(
        np.asarray(state_tp.params["encoder"]["icv"]),
        np.asarray(state_dp.params["encoder"]["icv"]),
        rtol=2e-3,
        atol=2e-6,
    )


class RecordingLoader:
    """Wraps a loader, recording the input_ids bytes of every yielded batch
    (order-sensitive fingerprint for deterministic-resume assertions)."""

    def __init__(self, inner):
        self.inner = inner
        self.fingerprints = []
        if hasattr(inner, "get_state"):
            self.get_state = inner.get_state
            self.set_state = inner.set_state

    def __len__(self):
        return len(self.inner)

    @property
    def epoch(self):
        return self.inner.epoch

    @epoch.setter
    def epoch(self, v):
        self.inner.epoch = v

    def __iter__(self):
        for b in self.inner:
            self.fingerprints.append(
                np.asarray(b["query_inputs"]["input_ids"]).tobytes()
            )
            yield b


def _recording_trainer(tmp_path, loader_kind="threads", **kw):
    trainer, _ = _trainer(tmp_path, **kw)
    # a 4-sample dataset makes the natural epoch (2 batches at bs=2) equal
    # limit_train_batches, so the trainer never pulls an extra batch past the
    # per-epoch limit and the recorded order is exactly the trained order
    ds = SyntheticICVDataset(n=4)
    proc = PromptProcessor(
        WhitespaceTokenizer(), ImageTransform(28), family="idefics",
        pad_to_multiple=8,
    )
    # the toy tokenizer builds vocab first-seen: prewarm it in INDEX order so
    # token ids are identical regardless of the shuffle order each run sees
    for i in range(len(ds)):
        for piece in (p for k in ("ice_prompt", "query_prompt", "query_x")
                      for p in ds[i][k]):
            if isinstance(piece, str):
                proc.tokenizer.encode(piece)
    collate = functools.partial(collate_icv_batch, processor=proc)
    if loader_kind == "grain":
        pytest.importorskip("grain.python")
        from licv_vqa_tpu.train.grain_loader import GrainDataLoader

        loader = GrainDataLoader(
            ds, batch_size=2, collate_fn=collate, num_workers=0, seed=0
        )
    else:
        from licv_vqa_tpu.train.loader import DataLoader as ThreadedLoader

        loader = ThreadedLoader(ds, batch_size=2, collate_fn=collate,
                                num_workers=1)
    rec = RecordingLoader(loader)
    return trainer, rec


@pytest.mark.parametrize("loader_kind", ["threads", "grain"])
def test_resume_replays_exact_data_order(tmp_path, loader_kind):
    """Deterministic mid-epoch resume: a run preempted at micro-step K and
    resumed must see exactly the batches the uninterrupted run saw from K on
    (the reference restarts data from scratch; SURVEY §5.4), reproducing the
    SAME final ICV.  Threads path: seed+epoch fast-forward; grain path:
    restored iterator state."""
    import shutil

    # full 2-epoch run with a checkpoint at every step: 4 micro steps over
    # epochs of 2 limited batches each
    t1, rec1 = _recording_trainer(
        tmp_path, loader_kind, max_epochs=2, ckpt_every=1
    )
    run_dir = tmp_path / ("run_" + loader_kind)
    state_full = t1.fit(rec1, run_dir, lmm_args={})
    assert len(rec1.fingerprints) == 4
    icv_full = np.asarray(state_full.params["encoder"]["icv"])

    # simulate preemption right after micro-step 3 (MID epoch 1): drop the
    # later checkpoint so step 3 is the latest (orbax keeps 2, 3, 4)
    shutil.rmtree(run_dir / "steps" / "4")
    shutil.rmtree(run_dir / "steps" / "2")

    t2, rec2 = _recording_trainer(
        tmp_path, loader_kind, max_epochs=2, ckpt_every=100
    )
    state_res = t2.fit(rec2, run_dir, lmm_args={})
    assert int(np.asarray(state_res.step)) == 4

    if loader_kind == "grain":
        # restored iterator yields ONLY the remaining batch of epoch 1
        assert rec2.fingerprints == rec1.fingerprints[3:]
    else:
        # fast-forward consumes-but-skips e1b0, then trains e1b1: the loader
        # must have reproduced epoch 1's exact shuffle
        assert rec2.fingerprints == rec1.fingerprints[2:]

    # same remaining data + restored optimizer state == same final ICV
    np.testing.assert_allclose(
        np.asarray(state_res.params["encoder"]["icv"]), icv_full,
        rtol=1e-6, atol=1e-8,
    )


@pytest.mark.parametrize("loader_kind", ["threads", "grain"])
def test_resume_at_epoch_boundary(tmp_path, loader_kind):
    """A checkpoint saved exactly at an epoch boundary captured an EXHAUSTED
    grain iterator; resume must NOT replay it (that trained the next epoch
    on zero batches) — the fresh seed+epoch rebuild takes over and the
    resumed run still reproduces the uninterrupted final ICV."""
    import shutil

    t1, rec1 = _recording_trainer(
        tmp_path, loader_kind, max_epochs=2, ckpt_every=1
    )
    run_dir = tmp_path / ("runb_" + loader_kind)
    state_full = t1.fit(rec1, run_dir, lmm_args={})
    icv_full = np.asarray(state_full.params["encoder"]["icv"])

    # keep only the step-2 checkpoint: exactly the end of epoch 0
    shutil.rmtree(run_dir / "steps" / "4")
    shutil.rmtree(run_dir / "steps" / "3")

    t2, rec2 = _recording_trainer(
        tmp_path, loader_kind, max_epochs=2, ckpt_every=100
    )
    state_res = t2.fit(rec2, run_dir, lmm_args={})
    assert int(np.asarray(state_res.step)) == 4
    # the resumed run trains exactly epoch 1's two batches, same order
    assert rec2.fingerprints == rec1.fingerprints[2:]
    np.testing.assert_allclose(
        np.asarray(state_res.params["encoder"]["icv"]), icv_full,
        rtol=1e-6, atol=1e-8,
    )


def test_dp_sp_fit_matches_dp(tmp_path):
    """strategy=dp_sp runs ring attention over sp=4 (seq dims padded to an
    sp multiple, token/mask leaves sp-sharded) and matches plain dp."""
    from licv_vqa_tpu.core.mesh import AXIS_SP

    trainer, loader = _trainer(tmp_path, max_epochs=1, strategy="dp_sp", sp=4)
    assert trainer.mesh.shape[AXIS_SP] == 4
    state_sp = trainer.fit(loader, tmp_path / "run_sp", lmm_args={})

    trainer_dp, loader_dp = _trainer(tmp_path, max_epochs=1)
    state_dp = trainer_dp.fit(loader_dp, tmp_path / "run_dp2", lmm_args={})
    np.testing.assert_allclose(
        np.asarray(state_sp.params["encoder"]["icv"]),
        np.asarray(state_dp.params["encoder"]["icv"]),
        rtol=2e-4,
        atol=2e-6,
    )


def test_dp_tp_sp_fit_matches_dp(tmp_path):
    """All three mesh axes at once (dp=2 × tp=2 × sp=2): Megatron-sharded
    frozen weights + ring attention + batch sharding compose and match dp."""
    from licv_vqa_tpu.core.mesh import AXIS_SP, AXIS_TP

    trainer, loader = _trainer(
        tmp_path, max_epochs=1, strategy="dp_tp_sp", tp=2, sp=2
    )
    assert trainer.mesh.shape[AXIS_TP] == 2 and trainer.mesh.shape[AXIS_SP] == 2
    wq = trainer.model_params["layers"]["attn"]["wq"]
    assert AXIS_TP in [ax for ax in wq.sharding.spec if ax is not None]
    state_3d = trainer.fit(loader, tmp_path / "run_3d", lmm_args={})

    trainer_dp, loader_dp = _trainer(tmp_path, max_epochs=1)
    state_dp = trainer_dp.fit(loader_dp, tmp_path / "run_dp3", lmm_args={})
    np.testing.assert_allclose(
        np.asarray(state_3d.params["encoder"]["icv"]),
        np.asarray(state_dp.params["encoder"]["icv"]),
        rtol=2e-4,
        atol=2e-6,
    )


class _FlipAfterPolls:
    """Fake PreemptionGuard: should_stop turns True from the (n+1)-th poll.
    The trainer polls exactly once per loop iteration, BEFORE fetching the
    next batch."""

    def __init__(self, n):
        self.n = n
        self.polls = 0

    @property
    def should_stop(self):
        self.polls += 1
        return self.polls > self.n


def test_preemption_snapshot_precedes_batch_fetch(tmp_path, monkeypatch):
    """A preemption save must capture the loader state BEFORE the next batch
    is fetched (ADVICE r2): with the grain loader, saving the post-fetch
    state silently drops one micro-batch on resume.  Preempt after micro 3
    (mid epoch 1 of 2×2); the resumed run must train exactly the one
    remaining batch, in order, and reproduce the uninterrupted final ICV."""
    import shutil

    import licv_vqa_tpu.train.trainer as trainer_mod

    pytest.importorskip("grain.python")
    real_guard = trainer_mod.PreemptionGuard  # capture BEFORE patching

    # uninterrupted 2-epoch run for the golden ICV + batch order
    t1, rec1 = _recording_trainer(tmp_path, "grain", max_epochs=2,
                                  ckpt_every=100)
    state_full = t1.fit(rec1, tmp_path / "run_gold", lmm_args={})
    icv_full = np.asarray(state_full.params["encoder"]["icv"])
    assert len(rec1.fingerprints) == 4

    # preempted run: polls go (e0: b0, b1, StopIteration) = 3 polls,
    # (e1: b2) = poll 4, then poll 5 fires the preemption before b3 is
    # fetched → save at micro 3 with the pre-fetch iterator state
    monkeypatch.setattr(
        trainer_mod, "PreemptionGuard", lambda: _FlipAfterPolls(4)
    )
    run_dir = tmp_path / "run_preempt"
    t2, rec2 = _recording_trainer(tmp_path, "grain", max_epochs=2,
                                  ckpt_every=100)
    state_pre = t2.fit(rec2, run_dir, lmm_args={})
    assert int(np.asarray(state_pre.step)) == 3
    assert rec2.fingerprints == rec1.fingerprints[:3]

    # resume with a real guard: exactly one batch remains
    monkeypatch.setattr(trainer_mod, "PreemptionGuard", real_guard)
    t3, rec3 = _recording_trainer(tmp_path, "grain", max_epochs=2,
                                  ckpt_every=100)
    state_res = t3.fit(rec3, run_dir, lmm_args={})
    assert int(np.asarray(state_res.step)) == 4
    assert rec3.fingerprints == rec1.fingerprints[3:]
    np.testing.assert_allclose(
        np.asarray(state_res.params["encoder"]["icv"]), icv_full,
        rtol=1e-6, atol=1e-8,
    )


def test_preemption_during_fast_forward_is_safe(tmp_path, monkeypatch):
    """A preemption landing DURING the seed-based fast-forward (a grain
    run whose mid-epoch loader-state side file was lost) must NOT snapshot
    the skipped-ahead iterator: that state lags micro_step, so a later
    set_state resume would re-train the skipped prefix and silently drop
    the epoch tail.  The save also re-targets the very step just restored,
    exercising StepCheckpointer's same-step idempotence (a second
    manager.save(step) would raise StepAlreadyExists)."""
    import licv_vqa_tpu.train.trainer as trainer_mod

    pytest.importorskip("grain.python")
    real_guard = trainer_mod.PreemptionGuard  # capture BEFORE patching

    # golden uninterrupted 2-epoch run
    t1, rec1 = _recording_trainer(tmp_path, "grain", max_epochs=2,
                                  ckpt_every=100)
    state_full = t1.fit(rec1, tmp_path / "run_gold_ff", lmm_args={})
    icv_full = np.asarray(state_full.params["encoder"]["icv"])
    assert len(rec1.fingerprints) == 4

    # run #1: preempt after micro 3 (mid epoch 1) → step-3 ckpt + loader file
    monkeypatch.setattr(trainer_mod, "PreemptionGuard",
                        lambda: _FlipAfterPolls(4))
    run_dir = tmp_path / "run_ffwd"
    t2, rec2 = _recording_trainer(tmp_path, "grain", max_epochs=2,
                                  ckpt_every=100)
    state_pre = t2.fit(rec2, run_dir, lmm_args={})
    assert int(np.asarray(state_pre.step)) == 3
    loader_file = run_dir / "steps" / "loader_3_p0.bin"
    assert loader_file.exists()
    # lose the side file (host died between the Orbax save and the
    # side-channel write; or the process count changed)
    loader_file.unlink()

    # run #2: resumes at step 3 WITHOUT loader state → seed fast-forward;
    # the guard fires at the FIRST poll, i.e. mid-fast-forward (offset=1,
    # nothing fetched yet counts as consumed-ahead once the skip begins)
    monkeypatch.setattr(trainer_mod, "PreemptionGuard",
                        lambda: _FlipAfterPolls(0))
    t3, rec3 = _recording_trainer(tmp_path, "grain", max_epochs=2,
                                  ckpt_every=100)
    state_mid = t3.fit(rec3, run_dir, lmm_args={})
    assert int(np.asarray(state_mid.step)) == 3  # nothing new trained
    # the misaligned snapshot must NOT have been written
    assert not loader_file.exists()

    # run #3: real guard — seed fast-forward replays epoch 1's exact
    # shuffle, skips the already-trained batch, trains the true remainder
    monkeypatch.setattr(trainer_mod, "PreemptionGuard", real_guard)
    t4, rec4 = _recording_trainer(tmp_path, "grain", max_epochs=2,
                                  ckpt_every=100)
    state_res = t4.fit(rec4, run_dir, lmm_args={})
    assert int(np.asarray(state_res.step)) == 4
    # fast-forward consumes-but-skips e1b0, then trains e1b1
    assert rec4.fingerprints == rec1.fingerprints[2:]
    np.testing.assert_allclose(
        np.asarray(state_res.params["encoder"]["icv"]), icv_full,
        rtol=1e-6, atol=1e-8,
    )
