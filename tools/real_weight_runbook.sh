#!/usr/bin/env bash
# Real-weight validation runbook (VERDICT r3 #10) — the north-star check
# this environment cannot run (no released checkpoints, no datasets, zero
# egress).  ONE command the moment MODEL_CPK_DIR + dataset roots exist:
#
#     bash tools/real_weight_runbook.sh            # idefics-9b, vqav2
#     bash tools/real_weight_runbook.sh idefics2-8b-base
#
# Steps:
#   1. released-weight logit parity vs the HF implementation
#      (tools/fullscale_convert_check.py --hf-dir: from_pretrained both
#      sides, fixed multimodal input, max|Δlogit| gate);
#   2. the reference's own VQAv2/Idefics-9B training recipe end-to-end
#      (reference: README.md:126-139 — 32-shot teacher, bs=8, accum 2,
#      icv_lr 1e-3, alpha_lr 1e-2, hard_loss_weight 0.5, 10 epochs);
#   3. beam-3 ICV inference + VQA accuracy on the val subset
#      (reference: config/inference.yaml:11,26-30), writing result.json.
#
# Smoke mode (CPU, synthetic fixtures, tiny model — CI-runnable proof the
# SCRIPT flows; tests/test_runbook_smoke.py runs it):
#     RUNBOOK_TINY=1 bash tools/real_weight_runbook.sh
set -euo pipefail
cd "$(dirname "$0")/.."

FAMILY="${1:-idefics-9b}"

if [[ "${RUNBOOK_TINY:-0}" == "1" ]]; then
    LMM="tiny-idefics"
    TRAIN_ARGS=(trainer=debug data_cfg.bs=2 data_cfg.num_workers=1
                data_cfg.task.datasets.few_shot_num=2
                data_cfg.task.datasets.max_train_size=-1 device=cpu)
    INFER_ARGS=(test_num=4 bs=2 generate_kwargs.max_new_tokens=3 device=cpu
                data_cfg.task.datasets.few_shot_num=2
                data_cfg.task.datasets.max_train_size=-1)
    echo "== runbook (TINY SMOKE): skipping real-weight parity =="
else
    : "${MODEL_CPK_DIR:?set MODEL_CPK_DIR to the released checkpoint root}"
    : "${VQAV2_PATH:?set VQAV2_PATH (see .env.example)}"
    : "${COCO_PATH:?set COCO_PATH}"
    : "${RESULT_DIR:?set RESULT_DIR}"
    LMM="$FAMILY"
    # reference README.md:126-139 recipe (VQAv2 / Idefics-9B)
    TRAIN_ARGS=(data_cfg.bs=8 trainer.accumulate_grad_batches=2
                icv_module.icv_lr=1e-3 icv_module.alpha_lr=1e-2
                icv_module.hard_loss_weight=0.5)
    INFER_ARGS=(test_num=-1 bs=1)
    case "$FAMILY" in
        idefics-9b)        HF_DIR="$MODEL_CPK_DIR/idefics-9b";  FAM=idefics ;;
        idefics2-8b-base)  HF_DIR="$MODEL_CPK_DIR/idefics2-8b-base"; FAM=idefics2 ;;
        openflamingov2-9B) HF_DIR="$MODEL_CPK_DIR/mpt-7b"; FAM=openflamingo ;;
        *) echo "unknown family $FAMILY"; exit 2 ;;
    esac
    echo "== step 1: released-weight logit parity ($FAM vs HF) =="
    python tools/fullscale_convert_check.py "$FAM" --hf-dir "$HF_DIR" --dtype f32
fi

RUN="runbook_$(date +%Y%m%d_%H%M%S)"
echo "== step 2: train the ICV (reference VQAv2 recipe) =="
python train.py "lmm=$LMM" "run_name=$RUN" "${TRAIN_ARGS[@]}"

echo "== step 3: beam-3 ICV inference + VQA accuracy =="
python inference.py "lmm=$LMM" "run_name=$RUN" test_icv=true "${INFER_ARGS[@]}"

echo "== runbook complete: results under \$RESULT_DIR/inference/.../$RUN =="
