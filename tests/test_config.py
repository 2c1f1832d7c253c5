import os
from pathlib import Path

import pytest

from licv_vqa_tpu.utils.config import Config, InterpolationError, compose

CONFIG_DIR = Path(__file__).resolve().parent.parent / "config"


@pytest.fixture(autouse=True)
def _env(monkeypatch, tmp_path):
    monkeypatch.setenv("MODEL_CPK_DIR", str(tmp_path / "cpk"))
    monkeypatch.setenv("RESULT_DIR", str(tmp_path / "res"))
    monkeypatch.setenv("VQAV2_PATH", str(tmp_path / "vqav2"))
    monkeypatch.setenv("OKVQA_PATH", str(tmp_path / "okvqa"))
    monkeypatch.setenv("COCO_PATH", str(tmp_path / "coco"))


def test_train_compose_defaults():
    cfg = compose(CONFIG_DIR, "train")
    assert cfg.seed == 426
    assert cfg.lmm.name == "idefics-9b"
    assert cfg.lmm.total_layers == 32
    assert cfg.lmm.hidden_size == 4096
    assert cfg.lmm.precision == "bf16"
    # prompt group chosen via ${lmm}_${data_cfg/task} interpolation
    assert cfg.prompt.prompt_template == "Question:<Q> Short answer:<A>."
    assert cfg.prompt.query_prompt_template == "Question:<Q> Short answer:<A>"
    assert cfg.prompt.sep_token == "\n\n"
    # nested group composition
    assert cfg.data_cfg.task.task_name == "vqa"
    assert cfg.data_cfg.task.datasets.name == "vqav2"
    assert cfg.data_cfg.task.datasets.few_shot_num == 32
    # icv_module knobs
    assert cfg.icv_module.kl_eps == 1e-6
    assert cfg.icv_module.icv_encoder.use_sigmoid is True


def test_group_and_value_overrides():
    cfg = compose(
        CONFIG_DIR,
        "train",
        overrides=[
            "lmm=idefics2-8B-base",
            "data_cfg.task.datasets=ok_vqa",
            "trainer=debug",
            "icv_module.icv_lr=1e-3",
            "run_name=myrun",
            "data_cfg.task.datasets.few_shot_num=1",
        ],
    )
    assert cfg.lmm.name == "idefics2-8b-base"
    assert "mlp" in cfg.lmm.layer_format
    assert cfg.data_cfg.task.datasets.name == "okvqa"
    # prompt choice follows the lmm override
    assert cfg.prompt.prompt_template == "Question:<Q> Short answer:<A>."
    assert cfg.trainer.limit_train_batches == 4
    assert cfg.icv_module.icv_lr == 1e-3
    assert cfg.run_name == "myrun"
    assert cfg.data_cfg.task.datasets.few_shot_num == 1


def test_env_interpolation_and_chains():
    cfg = compose(CONFIG_DIR, "train")
    assert cfg.result_dir == os.environ["RESULT_DIR"]
    assert cfg.data_cfg.task.datasets.root_dir == os.environ["VQAV2_PATH"]
    # chained interpolation: val_ann_path -> VQAV2_PATH + val_ann_file
    assert cfg.data_cfg.task.datasets.val_ann_path.endswith(
        "v2_mscoco_val2014_annotations_subdata.json"
    )
    # trainer.strategy flows into icv_module.strategy
    assert cfg.icv_module.strategy == cfg.trainer.strategy


def test_lazy_interpolation_does_not_explode():
    # inference.yaml composes fine even though some values would only resolve
    # against env vars; unresolved keys error only on access.
    cfg = Config({"a": "${oc.env:DOES_NOT_EXIST_XYZ}", "b": 3})
    assert cfg.b == 3
    with pytest.raises(InterpolationError):
        _ = cfg.a


def test_inference_compose():
    cfg = compose(CONFIG_DIR, "inference", overrides=["test_icl=true", "bs=4"])
    assert cfg.test_icl is True
    assert cfg.bs == 4
    assert cfg.generate_kwargs.max_new_tokens == 5
    assert cfg.generate_kwargs.num_beams == 3
    assert cfg.few_shot_list == [1, 4, 8, 16, 32]


def test_caption_task_switch():
    cfg = compose(
        CONFIG_DIR,
        "inference",
        overrides=["data_cfg.task=caption", "prompt=idefics-9B_caption"],
    )
    assert cfg.data_cfg.task.task_name == "caption"
    assert cfg.data_cfg.task.datasets.name == "coco2017"
    assert cfg.prompt.prompt_template == "Caption:<X>"


def test_to_dict_roundtrip():
    cfg = compose(CONFIG_DIR, "train")
    d = cfg.to_dict()
    assert d["lmm"]["name"] == "idefics-9b"
    assert isinstance(d["data_cfg"]["task"]["datasets"]["val_ques_path"], str)


REFERENCE_RECIPE = [
    # the reference README's VQAv2/Idefics-9B recipe, verbatim token-for-token
    # (reference: README.md:126-139)
    'run_name=vqav2_idefics_icv',
    'icv_module.icv_encoder.use_sigmoid=False',
    'icv_module.icv_encoder.alpha_init_value=0.1',
    'data_cfg.task.datasets.max_train_size=8000',
    'data_cfg.task.datasets.few_shot_num=32',
    'data_cfg.bs=8',
    'data_cfg.num_workers=10',
    'trainer.accumulate_grad_batches=2',
    'trainer.devices=4',
    'icv_module.icv_lr=1e-3',
    'icv_module.hard_loss_weight=0.5',
    'data_cfg/task/datasets=vqav2',
    'lmm=idefics-9B',
    'trainer.precision=16-mixed',
]


def test_reference_readme_recipe_composes_verbatim():
    cfg = compose(CONFIG_DIR, "train", overrides=REFERENCE_RECIPE)
    assert cfg.run_name == "vqav2_idefics_icv"
    assert cfg.icv_module.icv_encoder.use_sigmoid is False
    assert cfg.icv_module.icv_encoder.alpha_init_value == 0.1
    assert cfg.data_cfg.task.datasets.max_train_size == 8000
    assert cfg.data_cfg.task.datasets.few_shot_num == 32
    assert cfg.data_cfg.bs == 8
    assert cfg.trainer.accumulate_grad_batches == 2
    assert cfg.icv_module.icv_lr == 1e-3
    assert cfg.icv_module.hard_loss_weight == 0.5
    assert cfg.data_cfg.task.datasets.name == "vqav2"
    assert cfg.lmm.name == "idefics-9b"
    assert cfg.trainer.precision == "16-mixed"


def test_reference_idefics2_recipe_composes():
    overrides = [o for o in REFERENCE_RECIPE if not o.startswith("lmm=")] + [
        "lmm=idefics2-8B-base",
        "data_cfg.task.datasets.few_shot_num=1",
        "data_cfg/task/datasets=ok_vqa",
        "icv_module.icv_lr=5e-3",
    ]
    cfg = compose(CONFIG_DIR, "train", overrides=overrides)
    assert cfg.lmm.name == "idefics2-8b-base"
    assert cfg.data_cfg.task.datasets.name == "okvqa"
    assert cfg.data_cfg.task.datasets.few_shot_num == 1
    assert cfg.icv_module.icv_lr == 5e-3
    assert "mlp" in cfg.lmm.layer_format
    # prompt group follows the lmm choice
    assert cfg.prompt.prompt_template == "Question:<Q> Short answer:<A>."


def test_additive_group_override_composes_yaml():
    """Hydra `+group=option` composes config/<group>/<option>.yaml instead of
    setting the key to the literal option string."""
    cfg = compose(CONFIG_DIR, "train", ["+lmm=tiny-idefics"])
    assert not isinstance(cfg.lmm, str)
    assert cfg.lmm.model_name == "tiny-idefics"


def test_delete_override():
    """Hydra `~key` removes the key; deleting a missing key raises."""
    cfg = compose(CONFIG_DIR, "train", ["~seed"])
    assert "seed" not in cfg.to_dict()
    with pytest.raises(KeyError):
        compose(CONFIG_DIR, "train", ["~definitely.not.a.key"])
