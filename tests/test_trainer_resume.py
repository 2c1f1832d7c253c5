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
    np.testing.assert_allclose(
        np.asarray(state_tp.params["encoder"]["icv"]),
        np.asarray(state_dp.params["encoder"]["icv"]),
        rtol=2e-4,
        atol=2e-6,
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
