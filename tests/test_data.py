"""Data pipeline tests: templating, loaders on synthetic JSON fixtures,
shot sampling, processor layouts, and the 4-view collator contract."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from licv_vqa_tpu.data import (
    CaptionDataset,
    ImageTransform,
    PromptManager,
    PromptProcessor,
    VQADataset,
    WhitespaceTokenizer,
    collate_icv_batch,
)
from licv_vqa_tpu.data.loaders import Table, load_vqav2_ds, load_okvqa_ds, load_coco_ds

VQA_PM = dict(
    prompt_template="Question:<Q> Short answer:<A>.",
    column_token_map={"question": "<Q>", "answer": "<A>"},
    label_field="answer",
    sep_token="\n\n",
    query_prompt_template="Question:<Q> Short answer:<A>",
)


def test_prompt_manager_vqa_semantics():
    pm = PromptManager(**VQA_PM)
    item = {"question": "What color?", "answer": "blue"}
    assert (
        pm.gen_ice_text_with_label(item, add_sep_token=True)
        == "Question:What color? Short answer:blue.\n\n"
    )
    assert (
        pm.gen_ice_text_with_label(item, add_sep_token=False)
        == "Question:What color? Short answer:blue"
    )
    assert pm.gen_query_text_without_label(item) == "Question:What color? Short answer:"


def test_prompt_manager_caption():
    pm = PromptManager(
        prompt_template="Caption:<X>",
        column_token_map={"single_caption": "<X>"},
        label_field="single_caption",
        sep_token="\n\n",
        query_prompt_template="Caption:<X>",
    )
    item = {"single_caption": "a dog"}
    assert pm.gen_ice_text_with_label(item, True) == "Caption:a dog\n\n"
    assert pm.gen_query_text_without_label(item) == "Caption:"


# ---------------------------------------------------------------------------
# Synthetic fixtures mirroring the VQAv2 / OK-VQA / COCO schemas
# ---------------------------------------------------------------------------


def make_vqav2_fixture(root: Path, n=6, split="train2014", okvqa=False):
    root.mkdir(parents=True, exist_ok=True)
    img_dir = root / "images" / split
    img_dir.mkdir(parents=True, exist_ok=True)
    questions, annotations = [], []
    rng = np.random.default_rng(0)
    for i in range(n):
        qid, img_id = 1000 + (n - i), 500 + i  # reversed qid order → sort matters
        img = Image.fromarray(
            rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        )
        img.save(img_dir / f"COCO_{split}_{img_id:012d}.jpg")
        questions.append(
            {"question_id": qid, "image_id": img_id, "question": f"What is item {i}?"}
        )
        annotations.append(
            {
                "question_id": qid,
                "image_id": img_id,
                "multiple_choice_answer": f"ans{i}",
                "question_type": "what is" if i % 2 else "how many",
                "answer_type": "other",
                "answers": [
                    {"answer": f"ans{i}", "answer_confidence": "yes", "answer_id": j}
                    for j in range(10)
                ],
            }
        )
    if okvqa:
        qf = root / f"OpenEnded_mscoco_{split}_questions.json"
        af = root / f"mscoco_{split}_annotations.json"
    else:
        qf = root / f"v2_OpenEnded_mscoco_{split}_questions.json"
        af = root / f"v2_mscoco_{split}_annotations.json"
    qf.write_text(json.dumps({"questions": questions}))
    af.write_text(json.dumps({"annotations": annotations}))
    return img_dir


def make_coco_fixture(root: Path, n=4):
    root.mkdir(parents=True, exist_ok=True)
    img_dir = root / "imgs"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(1)
    images, anns = [], []
    for i in range(n):
        img_id = 300 + i
        fname = f"{img_id:012d}.jpg"
        Image.fromarray(
            rng.integers(0, 255, size=(24, 24, 3), dtype=np.uint8)
        ).save(img_dir / fname)
        images.append({"id": img_id, "file_name": fname})
        for c in range(2):
            anns.append(
                {"image_id": img_id, "caption": f"caption {i}-{c}", "id": i * 10 + c}
            )
    ann_file = root / "captions.json"
    ann_file.write_text(json.dumps({"images": images, "annotations": anns}))
    return img_dir, ann_file


def test_load_vqav2(tmp_path):
    img_dir = make_vqav2_fixture(tmp_path, n=6)
    ds = load_vqav2_ds(str(tmp_path), str(img_dir), str(img_dir), split="train")
    assert len(ds) == 6
    qids = ds.column("question_id")
    assert qids == sorted(qids)  # sorted by question_id
    row = ds[0]
    assert row["idx"] == 0
    assert row["answer"].startswith("ans")
    assert row["gen_question_type"] in ("what", "how")  # first word
    assert row["image"].size == (32, 32)  # lazily decoded PIL


def test_load_okvqa(tmp_path):
    img_dir = make_vqav2_fixture(tmp_path, n=4, okvqa=True)
    ds = load_okvqa_ds(str(tmp_path), str(img_dir), str(img_dir), split="train")
    row = ds[0]
    assert row["gen_question_type"] in ("what is", "how many")  # verbatim
    assert row["answer"] == row["answers"][0]["answer"]


def test_load_coco(tmp_path):
    img_dir, ann = make_coco_fixture(tmp_path)
    ds = load_coco_ds(str(img_dir), str(img_dir), str(ann), str(ann), split="train")
    assert len(ds) == 4
    row = ds[1]
    assert row["single_caption"] == row["captions"][0]
    assert len(row["captions"]) == 2


def _processor():
    tok = WhitespaceTokenizer()
    return PromptProcessor(
        tok,
        ImageTransform(image_size=16),
        family="idefics",
        pad_to_multiple=8,
        max_length=512,
    )


def _vqa_dataset(tmp_path, few_shot=2):
    img_dir = make_vqav2_fixture(tmp_path, n=6)
    pm = PromptManager(**VQA_PM)
    return VQADataset(
        name="vqav2",
        root_dir=str(tmp_path),
        train_coco_dataset_root=str(img_dir),
        val_coco_dataset_root=str(img_dir),
        prompt_manager=pm,
        instruction="Answer the question.\n",
        few_shot_num=few_shot,
        max_train_size=-1,
        split="train",
        seed=0,
    )


def test_vqa_dataset_no_query_leak(tmp_path):
    ds = _vqa_dataset(tmp_path)
    for idx in range(len(ds)):
        item = ds[idx]
        # structure: [instruction, img, text, img, text]
        assert item["ice_prompt"][0] == "Answer the question.\n"
        assert len(item["ice_prompt"]) == 1 + 2 * 2
        q_text = item["query_prompt"][1]
        for shot_text in item["ice_prompt"][2::2]:
            assert shot_text.rstrip("\n") != q_text + "."  # query never a shot
        assert item["query_x"][1].endswith("Short answer:")


def test_collator_contract(tmp_path):
    ds = _vqa_dataset(tmp_path)
    proc = _processor()
    batch = collate_icv_batch([ds[0], ds[1], ds[2]], proc)
    qi, ti = batch["query_inputs"], batch["inputs"]
    assert qi["input_ids"].shape[0] == 3
    assert qi["input_ids"].shape[1] % 8 == 0  # bucketed
    eos = proc.tokenizer.eos_token_id
    pad = proc.tokenizer.pad_token_id
    for b in range(3):
        stu = qi["input_ids"][b]
        tea = ti["input_ids"][b]
        # EOS appended to both label-bearing views
        assert eos in stu and eos in tea
        # the answer-region mask-count property the KL relies on
        stu_len = int((stu != pad).sum())
        tea_len = int((tea != pad).sum())
        stu_ans = stu_len - int(batch["query_x_length"][b])
        tea_ans = tea_len - int(batch["in_context_length"][b])
        assert stu_ans == tea_ans > 0
        # aligned answer tokens are identical
        np.testing.assert_array_equal(
            stu[int(batch["query_x_length"][b]) : stu_len],
            tea[int(batch["in_context_length"][b]) : tea_len],
        )


def test_processor_idefics_layout():
    proc = _processor()
    img = np.zeros((16, 16, 3), np.uint8)
    out = proc.prepare_input([["hello", img, "world"]])
    ids = out["input_ids"][0]
    fake, image = proc.fake_token_id, proc.image_token_id
    nonpad = ids[ids != proc.tokenizer.pad_token_id]
    assert list(nonpad[:1]) == [proc.tokenizer.bos_token_id]
    assert list(nonpad).count(image) == 1
    i = list(nonpad).index(image)
    assert nonpad[i - 1] == fake and nonpad[i + 1] == fake
    assert out["pixel_values"].shape == (1, 1, 16, 16, 3)
    assert out["pixel_valid"][0, 0]


def test_processor_adjacent_images_share_fake_token():
    proc = _processor()
    img = np.zeros((16, 16, 3), np.uint8)
    out = proc.prepare_input([[img, img]])
    ids = list(out["input_ids"][0])
    fake, image = proc.fake_token_id, proc.image_token_id
    assert ids.count(image) == 2
    assert ids.count(fake) == 3  # merged middle token


def test_processor_left_padding():
    proc = _processor()
    out = proc.prepare_input([["a b c"], ["a b c d e f"]], padding_side="left")
    ids = out["input_ids"]
    assert ids[0, 0] == proc.tokenizer.pad_token_id
    assert ids[0, -1] != proc.tokenizer.pad_token_id
    np.testing.assert_array_equal(
        out["attention_mask"].sum(1), [4, 7]
    )  # bos + tokens


def test_caption_dataset(tmp_path):
    img_dir, ann = make_coco_fixture(tmp_path)
    pm = PromptManager(
        prompt_template="Caption:<X>",
        column_token_map={"single_caption": "<X>"},
        label_field="single_caption",
        sep_token="\n\n",
    )
    ds = CaptionDataset(
        name="coco2017",
        train_coco_dataset_root=str(img_dir),
        val_coco_dataset_root=str(img_dir),
        train_coco_annotation_file=str(ann),
        val_coco_annotation_file=str(ann),
        prompt_manager=pm,
        few_shot_num=2,
        max_train_size=-1,
        seed=0,
    )
    item = ds[0]
    assert item["query_x"][1] == "Caption:"


def test_bucket_length_schedule():
    from licv_vqa_tpu.data.processor import bucket_length

    assert bucket_length(1) == 64
    assert bucket_length(64) == 64
    assert bucket_length(65) == 128
    assert bucket_length(512) == 512
    assert bucket_length(513) == 768
    assert bucket_length(2049) == 2560


def test_image_cache_thread_safety(tmp_path):
    """Hammer the decode LRU from many threads with a tiny capacity (forces
    constant eviction + re-decode interleavings)."""
    from concurrent.futures import ThreadPoolExecutor

    from licv_vqa_tpu.data.processor import ImageRef

    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        p = tmp_path / f"t{i}.png"
        Image.fromarray(rng.integers(0, 255, size=(20, 20, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    tr = ImageTransform(image_size=16, cache_entries=3)

    def work(k):
        out = None
        for i in range(100):
            out = tr(ImageRef(paths[(k * 7 + i) % len(paths)]))
        return out.shape

    with ThreadPoolExecutor(8) as pool:
        shapes = list(pool.map(work, range(8)))
    assert all(s == (16, 16, 3) for s in shapes)
    assert len(tr._cache) <= 3


def test_loader_bounded_window_and_early_exit_cancel():
    """The prefetch DataLoader must (a) never have more than
    num_workers+prefetch collated batches in flight (host-OOM guard with
    ~40MB teacher-view batches) and (b) cancel undone work on early exit
    instead of decoding out the epoch (ADVICE r1)."""
    import threading
    import time

    from licv_vqa_tpu.train.loader import DataLoader

    calls = []
    lock = threading.Lock()

    class CountingDataset:
        def __len__(self):
            return 200

        def __getitem__(self, i):
            with lock:
                calls.append(i)
            return i

    loader = DataLoader(
        CountingDataset(),
        batch_size=4,
        collate_fn=lambda items: list(items),
        shuffle=False,
        num_workers=2,
        prefetch=2,
    )
    it = iter(loader)
    got = [next(it) for _ in range(3)]
    assert got == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]
    it.close()  # early exit after 3 of 50 batches
    time.sleep(0.5)  # let the producer thread run its cancel path
    n_after_close = len(calls)
    # window = num_workers + prefetch = 4 outstanding + 3 consumed + queue
    # slack; the 200-item epoch must NOT have been decoded out
    assert n_after_close <= 60, n_after_close
    time.sleep(0.5)
    assert len(calls) == n_after_close  # production actually stopped


def test_navit_resize_rule_matches_hf():
    """ImageTransform.target_size reproduces HF idefics2's
    get_resize_output_image_size for representative shapes."""
    from transformers.models.idefics2.image_processing_idefics2 import (
        get_resize_output_image_size,
    )

    from licv_vqa_tpu.data.processor import ImageTransform

    t = ImageTransform(980, variable_resolution=True, min_edge=378, max_edge=980)
    for w, h in [(640, 480), (480, 640), (2000, 500), (500, 2000), (100, 80),
                 (980, 980), (1500, 1500), (379, 4000)]:
        img = np.zeros((h, w, 3), np.uint8)
        want_h, want_w = get_resize_output_image_size(
            img, {"shortest_edge": 378, "longest_edge": 980}, "channels_last"
        )
        got_w, got_h = t.target_size(w, h)
        assert (got_h, got_w) == (want_h, want_w), (w, h, got_h, got_w, want_h, want_w)


def test_prepare_input_variable_resolution_padding_and_mask():
    """NaViT host path: variable-size images batch-pad to a coarse bucket
    with a pixel_attention_mask; padding images keep an all-ones mask (NaN
    guard — their latents are gated by pixel_valid)."""
    from licv_vqa_tpu.data.processor import ImageTransform, PromptProcessor
    from licv_vqa_tpu.data.tokenizer import WhitespaceTokenizer

    t = ImageTransform(56, variable_resolution=True, min_edge=28, max_edge=56)
    proc = PromptProcessor(WhitespaceTokenizer(), t, family="idefics2",
                           image_seq_len=4)
    img_a = np.zeros((56, 28, 3), np.uint8) + 7   # already within bounds
    img_b = np.zeros((28, 42, 3), np.uint8) + 9
    enc = proc.prepare_input([[img_a, "question one"],
                              [img_b, "q two", img_b]])
    pv, pm = enc["pixel_values"], enc["pixel_attention_mask"]
    assert pv.shape[2] % 112 == 0 and pv.shape[3] % 112 == 0
    assert pm.shape == pv.shape[:4]
    # real regions marked, padding unmarked
    assert pm[0, 0, :56, :28].all() and not pm[0, 0, 56:, :].any()
    assert pm[1, 0, :28, :42].all() and not pm[1, 0, :, 42:].any()
    # sample 0 has one image: its second image slot is a padding image with
    # an all-ones mask and pixel_valid False
    assert not enc["pixel_valid"][0, 1] and pm[0, 1].all()
    assert enc["pixel_valid"][1, 1]
    np.testing.assert_array_equal(pv[0, 0, :56, :28], img_a)


def test_processor_pickles_for_grain_mp_workers(tmp_path):
    """Grain's mp_prefetch pickles the pipeline (incl. the processor and its
    ImageTransform) into worker processes; the transform's lock/cache are
    dropped on pickle and recreated on unpickle."""
    import pickle

    proc = _processor()
    img = tmp_path / "x.jpg"
    Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(img)
    proc.image_transform(str(img))  # populate the cache
    clone = pickle.loads(pickle.dumps(proc))
    assert len(clone.image_transform._cache) == 0  # fresh per process
    out = clone.prepare_input([[clone.image_transform(str(img)), "Q: hi A:"]])
    assert out["input_ids"].shape[0] == 1


def test_truncated_teacher_view_raises(tmp_path):
    """A teacher ICL view that hits max_length loses its answer region; the
    collator must reject it (silent truncation corrupts the KL target)."""
    ds = _vqa_dataset(tmp_path, few_shot=2)
    tok = WhitespaceTokenizer()
    proc = PromptProcessor(
        tok,
        ImageTransform(image_size=16),
        family="idefics",
        pad_to_multiple=8,
        max_length=24,  # far below the 2-shot ICL view length
    )
    with pytest.raises(ValueError, match="truncated"):
        collate_icv_batch([ds[0], ds[1]], proc)


def test_truncation_drops_cut_images():
    """prepare_input keeps pixel count consistent with surviving image
    tokens when a prompt is clipped at max_length."""
    tok = WhitespaceTokenizer()
    proc = PromptProcessor(
        tok,
        ImageTransform(image_size=16),
        family="idefics",
        pad_to_multiple=8,
        max_length=8,
    )
    img = np.zeros((16, 16, 3), np.uint8)
    # bos + (fake,image,fake) + ~5 words + second image markup would exceed 8
    out = proc.prepare_input([[img, "one two three four five", img, "tail"]])
    kept_img_tokens = int((out["input_ids"][0] == proc.image_token_id).sum())
    assert int(out["pixel_valid"][0].sum()) == kept_img_tokens == 1


def test_shot_sampling_is_order_independent_and_epoch_varying(tmp_path):
    """Draws are a pure function of (seed, epoch, index): identical whatever
    order worker threads touch the items, and fresh across epochs."""
    ds = _vqa_dataset(tmp_path)
    a = [ds[i]["ice_prompt"][1:] for i in range(len(ds))]
    b = [ds[i]["ice_prompt"][1:] for i in reversed(range(len(ds)))][::-1]
    for x, y in zip(a, b):
        assert [t for t in x if isinstance(t, str)] == [
            t for t in y if isinstance(t, str)
        ]
    ds.set_epoch(1)
    c = [ds[i]["ice_prompt"][1:] for i in range(len(ds))]
    assert any(
        [t for t in x if isinstance(t, str)] != [t for t in z if isinstance(t, str)]
        for x, z in zip(a, c)
    )


def test_threaded_loader_deterministic_across_worker_counts(tmp_path):
    """The same (seed, epoch) yields identical batches with 1 or 4 worker
    threads — shot draws must not depend on thread interleaving."""
    from licv_vqa_tpu.train.loader import DataLoader

    ds = _vqa_dataset(tmp_path)
    proc = _processor()

    def run(workers):
        loader = DataLoader(
            ds,
            batch_size=2,
            collate_fn=lambda items: collate_icv_batch(items, proc),
            shuffle=True,
            seed=3,
            num_workers=workers,
        )
        ds.set_epoch(0)
        loader.epoch = 0
        return [b["inputs"]["input_ids"].copy() for b in loader]

    one, four = run(1), run(4)
    assert len(one) == len(four) > 0
    for x, y in zip(one, four):
        np.testing.assert_array_equal(x, y)


def test_shot_draws_are_with_replacement(tmp_path):
    """Reference quirk (SURVEY §2.2, vqa_dataset.py:90-92): shot indices are
    drawn WITH replacement — duplicates must be possible.  Draw more shots
    than the pool holds: a without-replacement sampler would raise or
    dedupe; the reference semantics fill all slots."""
    ds = _vqa_dataset(tmp_path, few_shot=12)  # pool is only 6 queries
    item = ds[0]
    shot_texts = [t for t in item["ice_prompt"][1:] if isinstance(t, str)]
    assert len(shot_texts) == 12
    assert len(set(shot_texts)) < 12  # pigeonhole: duplicates occurred
