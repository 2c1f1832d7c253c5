"""End-to-end CLI test: the reference's full workflow on synthetic data.

train.py (tiny-random idefics, debug trainer) → icv_cpk.pth →
inference.py test_icv (beam-3) and test_icl (+RICE) → result.json with VQA
accuracies.  Mirrors the reference call stacks in SURVEY.md §3.1-3.3.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _write_vqa_split(root: Path, img_root: Path, split: str, n: int, prefix="v2_"):
    img_root.mkdir(parents=True, exist_ok=True)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(hash(split) % 2**31)
    questions, annotations = [], []
    answers_pool = ["red", "blue", "two", "cat", "yes", "no"]
    for i in range(n):
        qid, img_id = 100 + i, 200 + i
        Image.fromarray(
            rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
        ).save(img_root / f"COCO_{split}_{img_id:012d}.jpg")
        ans = answers_pool[i % len(answers_pool)]
        questions.append(
            {"question_id": qid, "image_id": img_id, "question": f"What thing {i}?"}
        )
        annotations.append(
            {
                "question_id": qid,
                "image_id": img_id,
                "multiple_choice_answer": ans,
                "question_type": "what",
                "answer_type": "other",
                "answers": [{"answer": ans, "answer_id": j + 1} for j in range(10)],
            }
        )
    (root / f"{prefix}OpenEnded_mscoco_{split}_questions.json").write_text(
        json.dumps({"questions": questions})
    )
    ann_name = f"{prefix}mscoco_{split}_annotations.json"
    (root / ann_name).write_text(json.dumps({"annotations": annotations}))
    if split == "val2014":
        (root / f"{prefix}mscoco_val2014_annotations_subdata.json").write_text(
            json.dumps({"annotations": annotations})
        )


@pytest.fixture()
def env(tmp_path, monkeypatch):
    vqa_root = tmp_path / "vqav2"
    coco = tmp_path / "coco" / "mscoco2014"
    _write_vqa_split(vqa_root, coco / "train2014", "train2014", 8)
    _write_vqa_split(vqa_root, coco / "val2014", "val2014", 5)
    monkeypatch.setenv("VQAV2_PATH", str(vqa_root))
    monkeypatch.setenv("COCO_PATH", str(tmp_path / "coco"))
    monkeypatch.setenv("RESULT_DIR", str(tmp_path / "results"))
    monkeypatch.setenv("MODEL_CPK_DIR", str(tmp_path / "cpk"))
    monkeypatch.setenv("OKVQA_PATH", str(tmp_path / "okvqa"))
    monkeypatch.chdir(REPO)
    return tmp_path


COMMON = [
    "lmm=tiny-idefics",
    "run_name=e2e",
    "data_cfg.task.datasets.few_shot_num=2",
    "data_cfg.task.datasets.max_train_size=-1",
]


def test_full_train_then_inference(env):
    import train as train_cli
    import inference as infer_cli

    save_path = train_cli.main(
        COMMON
        + [
            "trainer=debug",
            "trainer.checkpoint_every_n_steps=2",
            "trainer.log_every_n_steps=1",
            "data_cfg.bs=2",
            "data_cfg.num_workers=1",
            "icv_module.icv_lr=1e-2",
        ]
    )
    assert (save_path / "icv_cpk.pth").exists()
    assert (save_path / "metrics.jsonl").exists()

    # artifact contract: loads through torch with the reference's keys
    import torch

    state = torch.load(save_path / "icv_cpk.pth", weights_only=False)
    assert state["icv_encoder.icv"].shape == (1, 4, 64)
    assert state["icv_encoder.alpha"].shape == (1, 4)
    assert "lmm_args" in state and state["lmm_args"]["total_layers"] == 4
    assert isinstance(state["use_sigmoid"], bool)

    # idempotent re-run exits early
    again = train_cli.main(COMMON + ["trainer=debug", "data_cfg.bs=2"])
    assert again == save_path

    # ---- inference: ICV mode with beam-3 ----
    result = infer_cli.main(
        COMMON
        + [
            "test_icv=true",
            "test_num=4",
            "bs=2",
            "generate_kwargs.max_new_tokens=3",
        ]
    )
    keys = [k for k in result if "icv result" in k]
    assert keys, result
    acc = result[keys[0]]
    assert "overall" in acc and 0.0 <= acc["overall"] <= 100.0

    # result files on disk, reference layout
    res_dir = Path(env / "results" / "inference" / "tiny-idefics" / "vqav2" / "e2e")
    assert (res_dir / "result.json").exists()
    assert list((res_dir / "meta_info").glob("*icv.json"))

    # idempotency: second call without re_eval exits with stored results
    again = infer_cli.main(COMMON + ["test_icv=true", "test_num=4", "bs=2"])
    assert keys[0] in again


def test_dp_sharded_inference_matches_single_device(env):
    """infer_dp=-1 shards eval batches over the 8-virtual-device dp mesh
    (multi-chip serving); predictions are identical to the unsharded run."""
    import json as _json

    import inference as infer_cli

    ice_cache = env / "ice_idx.json"
    ice_cache.write_text(_json.dumps([[0, 1]] * 5))
    args = COMMON + [
        "test_icv=false",
        "test_icl=true",
        "few_shot_list=[2]",
        f"ice_idx_list_cache={ice_cache}",
        "test_num=5",
        "train_num=4",
        "bs=2",
        "generate_kwargs.max_new_tokens=3",
        "generate_kwargs.num_beams=1",
    ]
    # e2e_dp1 runs strictly serial (infer_pipeline=1); the others use the
    # default pipelined dispatch (depth 2) — so the equality asserts below
    # also prove pipelined == serial, on top of dp8/dptp == single-device
    infer_cli.main(args + ["run_name=e2e_dp1", "infer_pipeline=1"])
    infer_cli.main(args + ["run_name=e2e_dp8", "infer_dp=-1"])
    # dp=4 × tp=2: Megatron-sharded frozen weights through the same decode
    infer_cli.main(args + ["run_name=e2e_dptp", "infer_dp=4", "infer_tp=2"])

    base = env / "results" / "inference" / "tiny-idefics" / "vqav2"

    def preds(run):
        p = _json.load(open(base / run / "meta_info" / "icl_shot2.json"))
        return [p[k]["prediction"] for k in sorted(p)]

    preds1 = preds("e2e_dp1")
    assert preds1 == preds("e2e_dp8"), preds1
    assert preds1 == preds("e2e_dptp"), preds1

    # chained dispatch (infer_chain=2: two bs-batches per scanned program,
    # one host round trip) — predictions identical to serial dispatch
    infer_cli.main(args + ["run_name=e2e_chain", "infer_chain=2"])
    assert preds1 == preds("e2e_chain"), preds1

    # per-row speculative decoding composes with the dp mesh (f32 tiny
    # model: per-row cache indices + sharded batch produce a valid run)
    infer_cli.main(
        args
        + [
            "run_name=e2e_dpspec",
            "infer_dp=-1",
            "generate_kwargs.speculative_draft_layers=2",
        ]
    )
    assert len(preds("e2e_dpspec")) == len(preds1)


def test_continuous_engine_inference_matches_static(env):
    """infer_engine=continuous routes test_icv evals through the
    continuous-batching engines — greedy through ServingEngine AND the
    reference's beam-3 default through BeamServingEngine; predictions are
    identical to the static batch path both ways."""
    import json as _json
    import shutil

    import inference as infer_cli
    import train as train_cli

    save_path = train_cli.main(
        COMMON + ["trainer=debug", "data_cfg.bs=2", "run_name=e2e_static"]
    )
    for run in (
        "e2e_cont", "e2e_static_beam", "e2e_cont_beam", "e2e_cont_beam_mesh"
    ):
        shutil.copytree(save_path, save_path.parent / run)

    args = COMMON + [
        "test_icv=true",
        "test_num=5",
        "bs=2",
        "generate_kwargs.max_new_tokens=3",
    ]
    greedy = ["generate_kwargs.num_beams=1"]
    beam = ["generate_kwargs.num_beams=3"]
    infer_cli.main(args + greedy + ["run_name=e2e_static"])
    infer_cli.main(
        args + greedy + ["run_name=e2e_cont", "infer_engine=continuous"]
    )
    infer_cli.main(args + beam + ["run_name=e2e_static_beam"])
    infer_cli.main(
        args + beam + ["run_name=e2e_cont_beam", "infer_engine=continuous"]
    )
    # multi-chip beam serving through the CLI: group pool over dp=2, frozen
    # weights Megatron-sharded over tp=2 (infer_dp/infer_tp compose with
    # infer_engine=continuous)
    infer_cli.main(
        args
        + beam
        + [
            "run_name=e2e_cont_beam_mesh",
            "infer_engine=continuous",
            "infer_dp=2",
            "infer_tp=2",
        ]
    )

    base = env / "results" / "inference" / "tiny-idefics" / "vqav2"

    def preds(run):
        p = _json.load(open(next((base / run / "meta_info").glob("*icv.json"))))
        return [p[k]["prediction"] for k in sorted(p)]

    assert preds("e2e_static") == preds("e2e_cont")
    assert preds("e2e_static_beam") == preds("e2e_cont_beam")
    assert preds("e2e_static_beam") == preds("e2e_cont_beam_mesh")


def test_pooled_engine_inference_matches_static(env):
    """infer_engine=pooled routes beam evals through the pooled schedule
    (P staggered question groups share each weight-stream pass —
    infer/eval_chain.py); predictions are identical to the static beam
    path for both test_icv and test_icl (mixed shot counts exercise the
    (bucket, image-count) grouping)."""
    import json as _json
    import shutil

    import inference as infer_cli
    import train as train_cli

    save_path = train_cli.main(
        COMMON + ["trainer=debug", "data_cfg.bs=2", "run_name=e2e_pl_static"]
    )
    shutil.copytree(save_path, save_path.parent / "e2e_pl")

    ice_cache = env / "ice_idx_pool.json"
    ice_cache.write_text(_json.dumps([[0, 1], [1], [0], [1, 0], [0]]))
    args = COMMON + [
        "test_icv=true",
        "test_icl=true",
        "few_shot_list=[2]",
        f"ice_idx_list_cache={ice_cache}",
        "test_num=5",
        "train_num=4",
        "bs=2",
        "generate_kwargs.max_new_tokens=3",
        "generate_kwargs.num_beams=3",
        # chunk smaller than the question count: exercises the fixed-size
        # chunking + last-chunk repeat-padding path
        "infer_pool=3",
    ]
    infer_cli.main(args + ["run_name=e2e_pl_static"])
    infer_cli.main(args + ["run_name=e2e_pl", "infer_engine=pooled"])

    base = env / "results" / "inference" / "tiny-idefics" / "vqav2"

    def preds(run, name):
        p = _json.load(open(next((base / run / "meta_info").glob(f"*{name}"))))
        return [p[k]["prediction"] for k in sorted(p)]

    for name in ("icv.json", "icl_shot2.json"):
        want = preds("e2e_pl_static", name)
        assert want == preds("e2e_pl", name), name


def test_continuous_engine_icl_matches_static(env):
    """infer_engine=continuous routes test_icl through the engine too — the
    reference's raggedest workload (mixed shot counts → ~30x prompt-length
    spread + mixed image counts per request, reference: inference.py:324-378).
    Two shot counts run in one CLI call; predictions match the static path
    per shot count (VERDICT r3 item 4)."""
    import json as _json

    import inference as infer_cli

    ice_cache = env / "icl_cont_idx.json"
    ice_cache.write_text(_json.dumps([[0], [1, 2, 0], [2], [0, 1, 2], [1]]))
    args = COMMON + [
        "test_icv=false",
        "test_icl=true",
        "few_shot_list=[1,3]",
        f"ice_idx_list_cache={ice_cache}",
        "test_num=5",
        "train_num=4",
        "bs=2",
        "generate_kwargs.max_new_tokens=3",
    ]
    # NOTE: few_shot_list=[1,3] with a FIXED ice_idx cache: shot lists are
    # row-length-heterogeneous (1 or 3 shots per row) within one run, so the
    # engine admits mixed image counts against max_images-wide buffers
    infer_cli.main(args + ["run_name=e2e_icl_s", "generate_kwargs.num_beams=1"])
    infer_cli.main(
        args + [
            "run_name=e2e_icl_c",
            "generate_kwargs.num_beams=1",
            "infer_engine=continuous",
        ]
    )
    infer_cli.main(
        args + ["run_name=e2e_icl_sb", "generate_kwargs.num_beams=3"]
    )
    infer_cli.main(
        args + [
            "run_name=e2e_icl_cb",
            "generate_kwargs.num_beams=3",
            "infer_engine=continuous",
        ]
    )

    base = env / "results" / "inference" / "tiny-idefics" / "vqav2"

    def preds(run, shot):
        p = _json.load(open(base / run / "meta_info" / f"icl_shot{shot}.json"))
        return [p[k]["prediction"] for k in sorted(p)]

    for shot in (1, 3):
        assert preds("e2e_icl_s", shot) == preds("e2e_icl_c", shot), shot
        assert preds("e2e_icl_sb", shot) == preds("e2e_icl_cb", shot), shot


def test_icl_inference_with_rice(env):
    import inference as infer_cli

    result = infer_cli.main(
        COMMON
        + [
            "test_icv=false",
            "test_icl=true",
            "use_rice=true",
            "few_shot_list=[1,2]",
            "test_num=3",
            "train_num=6",
            "bs=3",
            "run_name=e2e_icl",
            "generate_kwargs.max_new_tokens=3",
            "generate_kwargs.num_beams=1",
        ]
    )
    icl_keys = [k for k in result if "ICL shot_num" in k]
    assert len(icl_keys) == 2, result
    # RICE cache file written with the reference's contract
    assert list((env / "results" / "cache").glob("*rice_imgemb.pkl"))


def test_idefics2_cli_workflow(env):
    """Same workflow through the idefics2 family (MLP-site injection,
    inline image tokens, Mistral GQA backbone)."""
    import train as train_cli
    import inference as infer_cli

    common = [
        "lmm=tiny-idefics2",
        "run_name=e2e2",
        "data_cfg.task.datasets.few_shot_num=1",
        "data_cfg.task.datasets.max_train_size=-1",
    ]
    save_path = train_cli.main(
        common
        + [
            "trainer=debug",
            "trainer.log_every_n_steps=1",
            "data_cfg.bs=2",
            "data_cfg.num_workers=1",
        ]
    )
    assert (save_path / "icv_cpk.pth").exists()
    import torch

    state = torch.load(save_path / "icv_cpk.pth", weights_only=False)
    assert "mlp" in state["lmm_args"]["layer_format"]

    result = infer_cli.main(
        common
        + [
            "test_icv=true",
            "test_num=2",
            "bs=2",
            "generate_kwargs.max_new_tokens=2",
            "generate_kwargs.num_beams=1",
        ]
    )
    assert any("icv result" in k for k in result)


def test_flamingo_cli_inference(env):
    """ICL inference through the flamingo family (ALiBi MPT backbone)."""
    import inference as infer_cli

    result = infer_cli.main(
        [
            "lmm=tiny-flamingo",
            "run_name=e2e_fl",
            "test_icv=false",
            "test_icl=true",
            "few_shot_list=[1]",
            "test_num=2",
            "train_num=4",
            "bs=2",
            "generate_kwargs.max_new_tokens=2",
            "generate_kwargs.num_beams=1",
        ]
    )
    assert any("ICL shot_num" in k for k in result)


def _write_coco2017(tmp_path):
    root = tmp_path / "coco" / "mscoco2017"
    (root / "annotations").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    for split in ("train2017", "val2017"):
        img_dir = root / split
        img_dir.mkdir(exist_ok=True)
        images, anns = [], []
        for i in range(6):
            img_id = 700 + i + (1000 if split == "val2017" else 0)
            fname = f"{img_id:012d}.jpg"
            Image.fromarray(
                rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
            ).save(img_dir / fname)
            images.append({"id": img_id, "file_name": fname})
            for c in range(2):
                anns.append(
                    {"image_id": img_id, "caption": f"a thing {i} doing {c}",
                     "id": img_id * 10 + c}
                )
        (root / "annotations" / f"captions_{split}.json").write_text(
            json.dumps({"images": images, "annotations": anns})
        )


def test_caption_task_train_and_eval(env):
    """COCO captioning task end-to-end: CaptionDataset training + CIDEr eval
    (reference: config/data_cfg/task/caption.yaml, utils.py:101-109)."""
    import train as train_cli
    import inference as infer_cli

    _write_coco2017(env)
    common = [
        "lmm=tiny-idefics",
        "data_cfg.task=caption",
        "prompt=tiny-idefics_caption",
        "run_name=e2e_cap",
        "data_cfg.task.datasets.few_shot_num=1",
        "data_cfg.task.datasets.max_train_size=-1",
    ]
    save_path = train_cli.main(
        common + ["trainer=debug", "data_cfg.bs=2", "data_cfg.num_workers=1"]
    )
    assert (save_path / "icv_cpk.pth").exists()
    assert "coco2017" in str(save_path)

    result = infer_cli.main(
        common
        + [
            "test_icv=true",
            "test_num=3",
            "bs=3",
            "generate_kwargs.max_new_tokens=3",
            "generate_kwargs.num_beams=1",
        ]
    )
    keys = [k for k in result if "icv result" in k]
    assert keys and isinstance(result[keys[0]], (int, float))  # CIDEr×100


def test_speculative_decoding_cli(env):
    """Opt-in self-speculative decoding via generate_kwargs; results must be
    identical to plain greedy (exact verification)."""
    import inference as infer_cli

    common = [
        "lmm=tiny-idefics",
        "run_name=e2e_spec",
        "test_icv=false",
        "test_icl=true",
        "few_shot_list=[1]",
        "test_num=2",
        "train_num=4",
        "bs=2",
        "generate_kwargs.max_new_tokens=4",
        "generate_kwargs.num_beams=1",
    ]
    plain = infer_cli.main(common)
    spec = infer_cli.main(
        [a.replace("e2e_spec", "e2e_spec2") for a in common]
        + [
            "generate_kwargs.speculative_draft_layers=2",
            "generate_kwargs.speculative_gamma=2",
        ]
    )
    # same predictions → same accuracy values
    p = [v for k, v in plain.items() if "ICL" in k][0]
    s = [v for k, v in spec.items() if "ICL" in k][0]
    assert p["overall"] == s["overall"]


def test_okvqa_cli_inference(env):
    """OK-VQA dataset group end-to-end: loader file scheme, answers[0] rule,
    stemmer postprocess in the eval path (reference: utils.py:93-100,129-133)."""
    import inference as infer_cli

    ok_root = env / "okvqa"
    coco = env / "coco" / "mscoco2014"
    _write_vqa_split(ok_root, coco / "train2014", "train2014", 6, prefix="")
    _write_vqa_split(ok_root, coco / "val2014", "val2014", 4, prefix="")

    result = infer_cli.main(
        [
            "lmm=tiny-idefics",
            "data_cfg.task.datasets=ok_vqa",
            "run_name=e2e_ok",
            "test_icv=false",
            "test_icl=true",
            "few_shot_list=[1]",
            "test_num=2",
            "train_num=4",
            "bs=2",
            "generate_kwargs.max_new_tokens=2",
            "generate_kwargs.num_beams=1",
        ]
    )
    keys = [k for k in result if "ICL shot_num" in k]
    assert keys and "overall" in result[keys[0]]


def test_train_cli_with_sequence_parallelism(env):
    """trainer.strategy=dp_sp threads through the train CLI: seq dims pad
    to the sp multiple, the ring attention path runs, artifact written."""
    import train as train_cli

    save_path = train_cli.main(
        [
            "lmm=tiny-idefics",
            "run_name=e2e_sp",
            "data_cfg.task.datasets.few_shot_num=1",
            "data_cfg.task.datasets.max_train_size=-1",
            "trainer=debug",
            "trainer.strategy=dp_sp",
            "trainer.sp=2",
            "data_cfg.bs=2",
            "data_cfg.num_workers=1",
        ]
    )
    assert (save_path / "icv_cpk.pth").exists()


def test_train_with_grain_loader(env):
    import train as train_cli

    save_path = train_cli.main(
        [
            "lmm=tiny-idefics",
            "run_name=e2e_grain",
            "data_cfg.loader=grain",
            "data_cfg.task.datasets.few_shot_num=1",
            "data_cfg.task.datasets.max_train_size=-1",
            "trainer=debug",
            "data_cfg.bs=2",
            "data_cfg.num_workers=0",
        ]
    )
    assert (save_path / "icv_cpk.pth").exists()


def test_combined_icv_and_icl_single_invocation(env):
    """Reference supports test_icv=true AND test_icl=true in one run
    (inference.py:132-243): both result entries land in one result.json."""
    import train as train_cli
    import inference as infer_cli

    train_cli.main(
        COMMON + ["trainer=debug", "data_cfg.bs=2", "data_cfg.num_workers=1",
                  "run_name=e2e_both"]
    )
    result = infer_cli.main(
        [
            "lmm=tiny-idefics",
            "run_name=e2e_both",
            "data_cfg.task.datasets.few_shot_num=2",
            "data_cfg.task.datasets.max_train_size=-1",
            "test_icv=true",
            "test_icl=true",
            "few_shot_list=[1]",
            "test_num=2",
            "train_num=4",
            "bs=2",
            "generate_kwargs.max_new_tokens=2",
            "generate_kwargs.num_beams=1",
        ]
    )
    assert any("icv result" in k for k in result)
    assert any("ICL shot_num" in k for k in result)


def test_subset_intervention_cli_roundtrip(env):
    """intervention_layer as a LIST through the full CLI cycle: the encoder
    owns K rows, the checkpoint stores (1,K,D), inference expands to flagged
    layers (reference icv_intervention.py:39-42 semantics)."""
    import train as train_cli
    import inference as infer_cli
    import torch

    common = [
        "lmm=tiny-idefics",
        "lmm.intervention_layer=[1,3]",
        "run_name=e2e_subset",
        "data_cfg.task.datasets.few_shot_num=1",
        "data_cfg.task.datasets.max_train_size=-1",
    ]
    save_path = train_cli.main(
        common + ["trainer=debug", "data_cfg.bs=2", "data_cfg.num_workers=1"]
    )
    state = torch.load(save_path / "icv_cpk.pth", weights_only=False)
    assert state["icv_encoder.icv"].shape == (1, 2, 64)  # K=2 rows
    assert state["lmm_args"]["intervention_layer"] == [1, 3]

    infer_args = [
        "test_icv=true",
        "test_num=2",
        "bs=2",
        "generate_kwargs.max_new_tokens=2",
        "generate_kwargs.num_beams=1",
    ]
    result = infer_cli.main(common + infer_args)
    assert any("icv result" in k for k in result)

    # speculative decoding composes with subset-layer intervention: the K ICV
    # rows are expanded to per-layer (rows, flags) for the raw draft bind and
    # truncated to the draft depth; predictions must equal plain greedy
    # exactly (target verification)
    import shutil

    shutil.copytree(save_path, save_path.parent / "e2e_subspec")
    infer_cli.main(
        [a.replace("e2e_subset", "e2e_subspec") for a in common]
        + infer_args
        + ["generate_kwargs.speculative_draft_layers=2"]
    )
    import json as _json

    base = env / "results" / "inference" / "tiny-idefics" / "vqav2"

    def preds(run):
        f = next((base / run / "meta_info").glob("*icv.json"))
        p = _json.load(open(f))
        return [p[k]["prediction"] for k in sorted(p)]

    assert preds("e2e_subspec") == preds("e2e_subset")


def test_re_eval_appends_results(env):
    """re_eval=true re-runs and appends a new timestamped entry
    (reference: inference.py:76-83)."""
    import json
    import inference as infer_cli

    args = COMMON + [
        "test_icv=false",
        "test_icl=true",
        "few_shot_list=[1]",
        "test_num=2",
        "train_num=3",
        "bs=2",
        "run_name=e2e_reeval",
        "generate_kwargs.max_new_tokens=2",
        "generate_kwargs.num_beams=1",
    ]
    r1 = infer_cli.main(args)
    assert len(r1) == 1
    r2 = infer_cli.main(args)  # exits early, same content
    assert r2 == r1
    r3 = infer_cli.main(args + ["re_eval=true"])
    assert len(r3) == 2  # appended a second timestamped entry
