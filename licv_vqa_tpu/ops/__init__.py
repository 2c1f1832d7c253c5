from .flash_alibi import flash_alibi_attention
from .icv_inject import icv_inject, icv_inject_reference
from .kl import (
    aligned_teacher_gather,
    answer_region_mask,
    masked_kl_divergence,
    shifted_cross_entropy,
)
from .quantize import dequantize_tree, quantize_kv_rows, quantize_layer_stack

__all__ = [
    "aligned_teacher_gather",
    "answer_region_mask",
    "dequantize_tree",
    "flash_alibi_attention",
    "icv_inject",
    "icv_inject_reference",
    "masked_kl_divergence",
    "quantize_kv_rows",
    "quantize_layer_stack",
    "shifted_cross_entropy",
]
