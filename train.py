#!/usr/bin/env python
"""ICV training CLI.

Same entry-point contract as the reference (reference: train.py): Hydra-style
``key=val`` overrides against ``config/train.yaml``, ``.env`` dataset paths,
checkpoint layout ``result_dir/model_cpk/<dataset>/<model>/<run_name>``, and
the final ``icv_cpk.pth`` artifact (torch-interchangeable with the
reference).  The runtime underneath is the TPU-native stack: jitted train
step over a dp mesh, Orbax step checkpoints with auto-resume.

Example (reference README recipe, verbatim):
    python train.py run_name=vqav2_idefics9b trainer=zero2 \
        data_cfg.task.datasets.max_train_size=8000 icv_module.icv_lr=1e-3 \
        icv_module.hard_loss_weight=0.5
Smoke run (offline, synthetic-safe):
    python train.py lmm=tiny-idefics trainer=debug data_cfg.bs=2
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

from licv_vqa_tpu.api import init_prompt_manager, init_train_dataset
from licv_vqa_tpu.data.collator import collate_icv_batch
from licv_vqa_tpu.icv.encoder import GlobalICVEncoder
from licv_vqa_tpu.icv.module import ICVModuleConfig
from licv_vqa_tpu.models.registry import build_model
from licv_vqa_tpu.train.loader import DataLoader
from licv_vqa_tpu.train.trainer import Trainer, TrainerConfig
from licv_vqa_tpu.utils import (
    compose,
    enable_compilation_cache,
    get_icv_cpk_path,
    get_logger,
    load_dotenv,
)

logger = get_logger("train_cli")


def main(argv: list[str] | None = None) -> Path | None:
    cfg = compose("config", "train", list(sys.argv[1:] if argv is None else argv))
    _select_platform(cfg)
    enable_compilation_cache()  # flagship compiles are minutes; pay them once
    from licv_vqa_tpu.core.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    np.random.seed(int(cfg.seed))

    model_name = str(cfg.lmm.name).split("/")[-1]
    save_path = get_icv_cpk_path(
        result_dir=cfg.result_dir,
        model_name=model_name,
        dataset_name=cfg.data_cfg.task.datasets.name,
        run_name=cfg.run_name,
    )
    # the reference checks icv_cpk.bin but writes icv_cpk.pth (SURVEY.md §2.2)
    # — we honor both so the skip actually works.
    for marker in ("icv_cpk.pth", "icv_cpk.bin"):
        if (save_path / marker).exists():
            logger.info("%s exists — exiting", save_path / marker)
            return save_path

    bundle = build_model(cfg)
    prompt_manager = init_prompt_manager(cfg)
    train_ds = init_train_dataset(cfg, prompt_manager, seed=int(cfg.seed))

    bundle.processor.padding_side = "right"  # reference: icv_datamodule.py:22
    collate = functools.partial(collate_icv_batch, processor=bundle.processor)
    if str(cfg.data_cfg.get("loader", "threads")) == "grain":
        from licv_vqa_tpu.train.grain_loader import GrainDataLoader

        import jax

        loader = GrainDataLoader(
            train_ds,
            batch_size=int(cfg.data_cfg.bs),
            collate_fn=collate,
            shuffle=True,
            seed=int(cfg.seed),
            num_workers=int(cfg.data_cfg.num_workers),
            num_epochs=1,  # the Trainer drives epochs by re-iterating
            # multi-host: disjoint per-host slices of each epoch's shuffle
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )
    else:
        loader = DataLoader(
            train_ds,
            batch_size=int(cfg.data_cfg.bs),
            collate_fn=collate,
            shuffle=True,
            seed=int(cfg.seed),
            num_workers=int(cfg.data_cfg.num_workers),
        )

    enc_cfg = cfg.icv_module.icv_encoder
    encoder = GlobalICVEncoder(
        lmm_hidden_dim=bundle.hidden_size,
        lmm_layers=bundle.n_layers,
        alpha_learnable=bool(enc_cfg.get("alpha_learnable", True)),
        alpha_init_value=float(enc_cfg.get("alpha_init_value", 0.0)),
        use_sigmoid=bool(enc_cfg.get("use_sigmoid", False)),
    )
    module_cfg = ICVModuleConfig.from_config(cfg.icv_module, cfg.trainer)

    metrics_path = save_path / "metrics.jsonl"
    save_path.mkdir(parents=True, exist_ok=True)
    wandb_run = _maybe_wandb(cfg)

    def metrics_hook(step: int, m: dict) -> None:
        with open(metrics_path, "a") as f:
            f.write(json.dumps({"step": step, "time": time.time(), **m}) + "\n")
        if wandb_run is not None:
            wandb_run.log(m, step=step)

    trainer = Trainer(
        TrainerConfig.from_config(cfg.trainer),
        module_cfg,
        encoder,
        bundle.train_forward,
        bundle.params,
        pad_token_id=bundle.pad_token_id,
        metrics_hook=metrics_hook,
        head_fn=bundle.head_fn,
    )
    trainer.fit(
        loader,
        run_dir=save_path,
        lmm_args=cfg.lmm.to_dict(),
        use_sigmoid=bool(enc_cfg.get("use_sigmoid", False)),
    )
    logger.info("training complete: %s", save_path)
    return save_path


def _select_platform(cfg) -> None:
    """Honor ``device=cpu|tpu`` (this image's sitecustomize force-registers
    the TPU platform, overriding the JAX_PLATFORMS env var)."""
    device = str(cfg.get("device", "tpu")).lower()
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def _maybe_wandb(cfg):
    if not cfg.get("wandb", False):
        return None
    try:
        import wandb

        return wandb.init(
            dir=str(cfg.result_dir),
            name=str(cfg.run_name),
            project="VQAInContextVector",
            config=cfg.to_dict(),
        )
    except Exception as e:  # offline image: log locally only
        logger.warning("wandb unavailable (%s) — metrics.jsonl only", e)
        return None


if __name__ == "__main__":
    load_dotenv()
    main()
