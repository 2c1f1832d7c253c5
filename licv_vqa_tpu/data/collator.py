"""The 4-view ICV training collator.

Reference contract (icv_src/icv_datamodule.py:73-130): per batch tokenize
``query_prompt`` (query WITH label, +EOS), ``query_x`` (query WITHOUT label),
``ice_prompt`` (shots only) and the concatenation ``ice+query`` (+EOS); emit

- ``query_inputs``      — student inputs,
- ``inputs``            — teacher (full ICL) inputs,
- ``in_context_length`` — nonpad(ice) + nonpad-nonbos(query_x),
- ``query_x_length``    — nonpad(query_x).

All views are right-padded to bucket multiples (static shapes for XLA).
"""

from __future__ import annotations

import numpy as np


def _nonpad(view: dict, pad_id: int) -> np.ndarray:
    return (view["input_ids"] != pad_id).sum(axis=1)


def collate_icv_batch(data_list: list[dict], processor) -> dict:
    query_prompt = [d["query_prompt"] for d in data_list]
    ice_prompt = [d["ice_prompt"] for d in data_list]
    query_x = [d["query_x"] for d in data_list]

    pad_id = processor.tokenizer.pad_token_id
    bos_id = processor.tokenizer.bos_token_id

    query_inputs = processor.prepare_input(
        query_prompt, padding=True, add_eos_token=True, padding_side="right"
    )
    # these two views are consumed only for their token LENGTHS — never
    # materialize their pixels (ice alone is 32 images/sample)
    query_x_enc = processor.prepare_input(
        query_x, padding=True, padding_side="right", with_pixels=False
    )
    ice_enc = processor.prepare_input(
        ice_prompt, padding=True, padding_side="right", with_pixels=False
    )
    inputs = processor.prepare_input(
        [list(i) + list(q) for i, q in zip(ice_prompt, query_prompt)],
        padding=True,
        add_eos_token=True,
        padding_side="right",
    )

    qx_ids = query_x_enc["input_ids"]
    query_x_nonbos = ((qx_ids != pad_id) & (qx_ids != bos_id)).sum(axis=1)
    return {
        "query_inputs": query_inputs,
        "inputs": inputs,
        "in_context_length": (_nonpad(ice_enc, pad_id) + query_x_nonbos).astype(
            np.int32
        ),
        "query_x_length": _nonpad(query_x_enc, pad_id).astype(np.int32),
    }
