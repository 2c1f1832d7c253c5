"""Exercise the HF-tokenizer adapter (the path real checkpoints take) using an
in-memory `tokenizers` WordLevel model — no downloads."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def hf_tok():
    try:
        from tokenizers import Tokenizer
        from tokenizers.models import WordLevel
        from tokenizers.pre_tokenizers import Whitespace
        from transformers import PreTrainedTokenizerFast
    except ImportError:
        pytest.skip("tokenizers not available")

    words = (
        "Question: Short answer: What color ? blue red the a is dog cat".split()
    )
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>",
        bos_token="<s>",
        eos_token="</s>",
        unk_token="<unk>",
    )
    fast.add_special_tokens(
        {"additional_special_tokens": ["<image>", "<fake_token_around_image>"]}
    )
    return fast


def test_hf_adapter_protocol(hf_tok):
    from licv_vqa_tpu.data.tokenizer import HFTokenizer

    adapter = HFTokenizer(hf_tok)
    assert adapter.pad_token_id == 0
    assert adapter.bos_token_id == 1
    assert adapter.eos_token_id == 2
    ids = adapter.encode("What color is the dog", add_bos=True)
    assert ids[0] == 1 and len(ids) == 6
    assert adapter.token_id("<image>") >= 0
    text = adapter.decode(ids, skip_special_tokens=True)
    assert "dog" in text and "<s>" not in text


def test_processor_with_hf_tokenizer(hf_tok):
    from licv_vqa_tpu.data.processor import ImageTransform, PromptProcessor

    from licv_vqa_tpu.data.tokenizer import HFTokenizer

    proc = PromptProcessor(
        HFTokenizer(hf_tok),
        ImageTransform(16),
        family="idefics",
        pad_to_multiple=8,
    )
    img = np.zeros((16, 16, 3), np.uint8)
    out = proc.prepare_input([["What color ?", img, "blue"]], add_eos_token=True)
    ids = list(out["input_ids"][0])
    assert proc.image_token_id in ids
    assert proc.fake_token_id in ids
    assert proc.tokenizer.eos_token_id in ids
    # batch decode round trip drops specials
    text = proc.tokenizer.batch_decode([ids], skip_special_tokens=True)[0]
    assert "blue" in text


def test_collator_with_hf_tokenizer(hf_tok):
    from licv_vqa_tpu.data.collator import collate_icv_batch
    from licv_vqa_tpu.data.processor import ImageTransform, PromptProcessor
    from licv_vqa_tpu.data.tokenizer import HFTokenizer

    proc = PromptProcessor(
        HFTokenizer(hf_tok), ImageTransform(16), family="idefics", pad_to_multiple=8
    )
    img = np.zeros((16, 16, 3), np.uint8)
    items = [
        {
            "ice_prompt": [img, "Question: What color ? Short answer: red"],
            "query_prompt": [img, "Question: What color ? Short answer: blue"],
            "query_x": [img, "Question: What color ? Short answer:"],
        }
    ]
    batch = collate_icv_batch(items, proc)
    pad = proc.tokenizer.pad_token_id
    stu = batch["query_inputs"]["input_ids"][0]
    tea = batch["inputs"]["input_ids"][0]
    stu_len = int((stu != pad).sum())
    tea_len = int((tea != pad).sum())
    assert stu_len - int(batch["query_x_length"][0]) == tea_len - int(
        batch["in_context_length"][0]
    )


def test_hf_path_single_string_tokenization(hf_tok):
    """With an HF tokenizer the prompt is joined and tokenized ONCE with
    literal image markup (HF IdeficsProcessor semantics)."""
    from licv_vqa_tpu.data.processor import (
        FAKE_IMAGE_TOKEN,
        IMAGE_TOKEN,
        ImageTransform,
        PromptProcessor,
    )
    from licv_vqa_tpu.data.tokenizer import HFTokenizer

    adapter = HFTokenizer(hf_tok)
    proc = PromptProcessor(adapter, ImageTransform(16), family="idefics",
                           pad_to_multiple=8)
    img = np.zeros((16, 16, 3), np.uint8)
    out = proc.prepare_input([["What", img, img, "blue"]])
    ids = [int(i) for i in out["input_ids"][0] if i != adapter.pad_token_id]
    # expected: bos + tokenize("What<fake><image><fake><image><fake>blue")
    want = [adapter.bos_token_id] + adapter.encode(
        "What" + FAKE_IMAGE_TOKEN + IMAGE_TOKEN + FAKE_IMAGE_TOKEN
        + IMAGE_TOKEN + FAKE_IMAGE_TOKEN + "blue"
    )
    assert ids == want
    assert ids.count(proc.image_token_id) == 2
    assert ids.count(proc.fake_token_id) == 3  # adjacent images merged
