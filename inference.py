#!/usr/bin/env python
"""ICV / ICL evaluation CLI.

Same entry-point contract as the reference (reference: inference.py):
``key=val`` overrides against ``config/inference.yaml``, two modes
(``test_icv`` — zero-shot + trained ICV; ``test_icl`` — true few-shot ICL
over ``few_shot_list``), ``result.json`` + ``meta_info/*.json`` output
layout, idempotency / ``re_eval``, optional RICE shot retrieval.  Decoding is
fully jitted with the ICV compiled into the forward (vs the reference's
per-layer-per-token baukit hooks, its README:14).

Examples:
    python inference.py run_name=vqav2_idefics9b test_icv=true
    python inference.py test_icl=true use_rice=true few_shot_list='[4,8]'
"""

from __future__ import annotations

import datetime
import json
import random
import sys
from pathlib import Path

from licv_vqa_tpu.api import init_dataset, init_prompt_manager
from licv_vqa_tpu.infer.runner import icl_inference, icv_inference
from licv_vqa_tpu.metrics import compute_cider, compute_vqa_accuracy
from licv_vqa_tpu.models.registry import build_model
from licv_vqa_tpu.train.checkpoint import load_icv_checkpoint
from licv_vqa_tpu.utils import (
    compose,
    enable_compilation_cache,
    get_icv_cpk_path,
    get_inference_paths,
    get_logger,
    load_dotenv,
)

logger = get_logger("inference_cli")


def evaluate_vqa(results_dict, model_name, val_ques_path, val_ann_path, post_fn):
    preds = [
        {
            "answer": post_fn(r["prediction"], model_name).replace("\n", "").strip(),
            "question_id": r["question_id"],
        }
        for r in results_dict.values()
    ]
    return compute_vqa_accuracy(preds, val_ques_path, val_ann_path)


def evaluate_caption(results_dict, model_name, val_ann_path, post_fn):
    preds = [
        {
            "image_id": r["image_id"],
            "caption": post_fn(r["prediction"], model_name),
        }
        for r in results_dict.values()
    ]
    return compute_cider(preds, val_ann_path) * 100


def main(argv: list[str] | None = None):
    cfg = compose("config", "inference", list(sys.argv[1:] if argv is None else argv))
    # reproducible ICL shot sampling (random.sample below); the reference
    # never seeds its inference-side RNG (reference: inference.py:122,203)
    random.seed(int(cfg.get("seed", 42)))
    device = str(cfg.get("device", "tpu")).lower()
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()  # beam/eval compiles are minutes; pay them once
    # Multi-chip serving mesh (beyond the reference, which always evals on
    # one GPU): infer_dp shards eval batches (-1 = all devices); infer_tp>1
    # Megatron-shards the frozen weights so a bf16 9B serves across chips.
    infer_dp = int(cfg.get("infer_dp", 1))
    infer_tp = int(cfg.get("infer_tp", 1))
    mesh = None
    if infer_dp != 1 or infer_tp != 1:
        import jax

        from licv_vqa_tpu.core.mesh import MeshConfig, create_mesh

        devs = jax.devices()
        if infer_dp == -1:
            n_dp = len(devs) // max(infer_tp, 1)
        else:
            n_dp = max(infer_dp, 1)
        n = n_dp * max(infer_tp, 1)
        mesh = create_mesh(
            MeshConfig(dp=n_dp, tp=max(infer_tp, 1), sp=1), devs[:n]
        )
    model_name = str(cfg.lmm.model_name)
    result_dir = Path(str(cfg.result_dir))

    save_dir, meta_info_dir, metric_file_path = get_inference_paths(
        result_dir=result_dir,
        model_name=model_name,
        dataset_name=cfg.data_cfg.task.datasets.name,
        run_name=cfg.run_name,
    )
    save_dir.mkdir(parents=True, exist_ok=True)
    meta_info_dir.mkdir(exist_ok=True)

    if not metric_file_path.exists():
        result_dict = {}
    elif cfg.re_eval:
        result_dict = json.load(open(metric_file_path))
        logger.info("%s exists — re-evaluating", metric_file_path)
    else:
        logger.info("%s exists — exiting", metric_file_path)
        return json.load(open(metric_file_path))

    icv_scaled = None
    if cfg.test_icv:
        cpk_dir = get_icv_cpk_path(
            result_dir,
            model_name=model_name,
            dataset_name=cfg.data_cfg.task.datasets.name,
            run_name=cfg.run_name,
        )
        loaded = load_icv_checkpoint(cpk_dir)
        icv_scaled = loaded["alpha"][:, None] * loaded["icv"]
        # The CHECKPOINT's lmm_args drive the intervention setup (reference:
        # inference.py:102-108 builds the wrapper from the loaded lmm_args):
        # a K-row ICV trained on a subset-layer list must inject into those
        # same layers regardless of the current cfg.lmm override.
        ckpt_layers = loaded.get("lmm_args", {}).get("intervention_layer")
        if ckpt_layers is not None:
            cfg.lmm["intervention_layer"] = ckpt_layers
        logger.info("ICV loaded from %s", cpk_dir)

    bundle = build_model(cfg)
    prompt_manager = init_prompt_manager(cfg)
    task_name = str(cfg.data_cfg.task.task_name)
    base_info = f"{datetime.datetime.now()}-cfg.test_num={cfg.test_num}-"

    split = None if cfg.test_icl else "validation"
    ds, post_fn = init_dataset(cfg, split)
    if cfg.test_icl:
        val_ds = ds["validation"]
        train_ds = ds["train"]
        if cfg.train_num != -1:
            train_ds = train_ds.select(
                random.sample(range(len(train_ds)), int(cfg.train_num))
            )
    else:
        val_ds = ds
    if cfg.test_num != -1:
        val_ds = val_ds.select(range(int(cfg.test_num)))

    gen_kwargs = cfg.generate_kwargs.to_dict()

    def evaluate_and_store(results_dict, tag: str):
        if task_name == "vqa":
            acc = evaluate_vqa(
                results_dict,
                str(cfg.lmm.name),
                str(cfg.data_cfg.task.datasets.val_ques_path),
                str(cfg.data_cfg.task.datasets.val_ann_path),
                post_fn,
            )
            acc.pop("perQuestion", None)
            logger.info("%s ACC: %s", cfg.run_name, acc["overall"])
            result_dict[base_info + tag] = acc
        else:
            cider = evaluate_caption(
                results_dict,
                str(cfg.lmm.name),
                str(cfg.data_cfg.task.datasets.val_coco_annotation_file),
                post_fn,
            )
            logger.info("%s CIDEr: %s", cfg.run_name, cider)
            result_dict[base_info + tag] = cider
        with open(metric_file_path, "w") as f:
            json.dump(result_dict, f, indent=4)

    # infer_engine=continuous: evals through the slot-based
    # continuous-batching engine (ragged workloads keep every slot busy) —
    # greedy pools and beam-group pools both; the default stays static
    continuous = str(cfg.get("infer_engine", "static")) == "continuous"

    def warn_continuous_lp():
        # At length_penalty != 0 the continuous beam engine scores
        # hypotheses by the TRUE (unpadded) prompt length while the static
        # path uses the padded batch length (HF semantics are
        # batching-dependent); flipping engines can then change
        # predictions.  Identical at the reference's lp=0.0.
        if (
            int(gen_kwargs.get("num_beams", 1)) > 1
            and float(gen_kwargs.get("length_penalty", 0.0)) != 0.0
        ):
            logger.warning(
                "infer_engine=continuous with num_beams>1 and "
                "length_penalty=%s: the engine uses the true prompt "
                "length as the lp divisor (matches an unpadded bs=1 HF "
                "run); the static path uses the padded batch length — "
                "predictions may differ between engines",
                gen_kwargs.get("length_penalty"),
            )

    # infer_engine=pooled: the pooled beam schedule (P=max_new-1 staggered
    # question groups share each weight-stream pass — the highest-throughput
    # eval schedule on one chip; ragged prompts bucket to 64-multiples)
    pooled = str(cfg.get("infer_engine", "static")) == "pooled"

    if cfg.test_icv:
        if pooled:
            from licv_vqa_tpu.infer.runner import icv_inference_pooled

            warn_continuous_lp()
            results = icv_inference_pooled(
                val_ds,
                bundle,
                prompt_manager,
                generate_kwargs=gen_kwargs,
                instruction=str(cfg.prompt.instruction),
                icv_scaled=icv_scaled,
                pool_questions=int(cfg.get("infer_pool", 32)),
            )
        elif continuous:
            from licv_vqa_tpu.infer.runner import icv_inference_continuous

            warn_continuous_lp()
            results = icv_inference_continuous(
                val_ds,
                bundle,
                prompt_manager,
                generate_kwargs=gen_kwargs,
                instruction=str(cfg.prompt.instruction),
                icv_scaled=icv_scaled,
                n_slots=int(cfg.bs),
                mesh=mesh,
            )
        else:
            results = icv_inference(
                val_ds,
                bundle,
                prompt_manager,
                bs=int(cfg.bs),
                generate_kwargs=gen_kwargs,
                instruction=str(cfg.prompt.instruction),
                icv_scaled=icv_scaled,
                mesh=mesh,
                pipeline_depth=int(cfg.get("infer_pipeline", 2)),
                chain=int(cfg.get("infer_chain", 1)),
            )
        evaluate_and_store(results, "icv result")
        with open(meta_info_dir / f"{base_info}icv.json", "w") as f:
            json.dump(results, f, indent=4)

    if cfg.test_icl:
        if cfg.use_rice:
            from licv_vqa_tpu.retrieval.rice import MMTopkRetriever

            cache_dir = result_dir / "cache"
            cache_dir.mkdir(parents=True, exist_ok=True)
            base_info += "-RICE"
            retriever = MMTopkRetriever(
                index_ds=train_ds,
                test_ds=val_ds,
                mode="i2i",
                index_field="image",
                batch_size=8,
                cache_file=str(
                    cache_dir
                    / f"{cfg.data_cfg.task.datasets.name}_{cfg.test_num}_rice_imgemb.pkl"
                ),
            )
        for shot_num in list(cfg.few_shot_list):
            if cfg.use_rice:
                ice_idx_list = retriever.retrieve(int(shot_num))
            elif cfg.ice_idx_list_cache is not None:
                ice_idx_list = json.load(open(str(cfg.ice_idx_list_cache)))
            else:
                pool = list(range(len(train_ds)))
                ice_idx_list = [
                    random.sample(pool, int(shot_num)) for _ in range(len(val_ds))
                ]
            if pooled:
                from licv_vqa_tpu.infer.runner import icl_inference_pooled

                warn_continuous_lp()
                results = icl_inference_pooled(
                    train_ds,
                    val_ds,
                    ice_idx_list,
                    bundle,
                    prompt_manager,
                    generate_kwargs=gen_kwargs,
                    instruction=str(cfg.prompt.instruction),
                    pool_questions=int(cfg.get("infer_pool", 32)),
                )
            elif continuous:
                from licv_vqa_tpu.infer.runner import icl_inference_continuous

                warn_continuous_lp()
                results = icl_inference_continuous(
                    train_ds,
                    val_ds,
                    ice_idx_list,
                    bundle,
                    prompt_manager,
                    generate_kwargs=gen_kwargs,
                    instruction=str(cfg.prompt.instruction),
                    n_slots=int(cfg.bs),
                    mesh=mesh,
                )
            else:
                results = icl_inference(
                    train_ds,
                    val_ds,
                    ice_idx_list,
                    bundle,
                    prompt_manager,
                    bs=int(cfg.bs),
                    generate_kwargs=gen_kwargs,
                    instruction=str(cfg.prompt.instruction),
                    mesh=mesh,
                    pipeline_depth=int(cfg.get("infer_pipeline", 2)),
                    chain=int(cfg.get("infer_chain", 1)),
                )
            # reference key wording includes the metric (inference.py:226,236)
            metric_word = "ACC" if task_name == "vqa" else "CIDEr"
            evaluate_and_store(
                results, f"ICL shot_num: {shot_num} {metric_word} result"
            )
            with open(meta_info_dir / f"icl_shot{shot_num}.json", "w") as f:
                json.dump(results, f, indent=4)

    return result_dict


if __name__ == "__main__":
    load_dotenv()
    main()
