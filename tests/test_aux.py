"""Auxiliary subsystems: step timer, preemption guard, loader error paths,
config edge cases."""

import signal
import time

import numpy as np
import pytest

from licv_vqa_tpu.core.distributed import PreemptionGuard, is_main_process
from licv_vqa_tpu.train.loader import DataLoader
from licv_vqa_tpu.utils.profiling import StepTimer


def test_step_timer_stats():
    t = StepTimer(window=10)
    assert t.stats == {}
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    s = t.stats
    assert s["step_time_mean_s"] > 0
    assert s["steps_per_sec"] > 0
    assert s["step_time_p95_s"] >= s["step_time_p50_s"]


def test_preemption_guard_sets_flag():
    g = PreemptionGuard()
    assert not g.should_stop
    signal.raise_signal(signal.SIGTERM)
    assert g.should_stop


def test_is_main_process_single_host():
    assert is_main_process()


class _BadDataset:
    def __len__(self):
        return 4

    def __getitem__(self, i):
        if i == 2:
            raise ValueError("boom")
        return {"x": i}


def test_loader_propagates_worker_errors():
    dl = DataLoader(
        _BadDataset(), batch_size=2, collate_fn=lambda items: items,
        shuffle=False, num_workers=2,
    )
    with pytest.raises(ValueError, match="boom"):
        list(dl)


class _OkDataset:
    def __len__(self):
        return 7

    def __getitem__(self, i):
        return {"x": i}


def test_loader_drop_last_and_shuffle_determinism():
    dl = DataLoader(
        _OkDataset(), batch_size=2,
        collate_fn=lambda items: [d["x"] for d in items],
        shuffle=True, seed=3, num_workers=1,
    )
    assert len(dl) == 3  # drop_last
    a = list(dl)
    dl2 = DataLoader(
        _OkDataset(), batch_size=2,
        collate_fn=lambda items: [d["x"] for d in items],
        shuffle=True, seed=3, num_workers=1,
    )
    b = list(dl2)
    assert a == b  # same seed+epoch → same order
    c = list(dl2)  # second epoch reshuffles
    assert c != b or len(c) == 0


def test_config_additive_override():
    from licv_vqa_tpu.utils.config import compose
    import os

    os.environ.setdefault("MODEL_CPK_DIR", "/tmp/x")
    os.environ.setdefault("RESULT_DIR", "/tmp/x")
    os.environ.setdefault("VQAV2_PATH", "/tmp/x")
    os.environ.setdefault("COCO_PATH", "/tmp/x")
    cfg = compose("config", "train", ["+brand_new_key=7", "seed=1"])
    assert cfg.brand_new_key == 7
    assert cfg.seed == 1


def test_load_reference_formatted_checkpoint(tmp_path):
    """A checkpoint written the way the REFERENCE's postprocess writes it
    (torch tensors, extra lightning keys) loads cleanly, sigmoid applied."""
    import torch
    from licv_vqa_tpu.train.checkpoint import load_icv_checkpoint

    state = {
        "icv_encoder.icv": torch.randn(1, 32, 64),
        "icv_encoder.alpha": torch.randn(1, 32),
        "temperature": torch.tensor(1.0),  # reference keeps this key too
        "use_sigmoid": True,
        "lmm_args": {"total_layers": 32, "layer_format": "model.model.layers.<LAYER_NUM>"},
    }
    torch.save(state, tmp_path / "icv_cpk.pth")
    loaded = load_icv_checkpoint(tmp_path)
    assert loaded["icv"].shape == (32, 64)
    a = np.asarray(loaded["alpha"])
    assert np.all((a > 0) & (a < 1))  # sigmoid applied
    assert loaded["lmm_args"]["total_layers"] == 32


def test_config_missing_group_clear_error():
    from licv_vqa_tpu.utils.config import compose

    with pytest.raises(FileNotFoundError):
        compose("config", "train", ["lmm=does-not-exist"])
