"""Model configurations for the LMM zoo.

Replaces the external ``lmm_icl_interface`` package's model wrappers
(reference: utils.py:31-80, SURVEY.md §2.3) with in-repo JAX models.  The
``injection_site`` field encodes the semantics of the reference's
string-templated ``layer_format`` addressing (reference: config/lmm/*.yaml):
decoder-block output for Idefics-9B / OpenFlamingo, the MLP sublayer output
for Idefics2 (reference: config/lmm/idefics2-8B-base.yaml:8).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

BLOCK_OUTPUT = "block_output"
MLP_OUTPUT = "mlp_output"


def injection_site_from_layer_format(layer_format: str) -> str:
    """Map a reference ``layer_format`` string to a semantic injection site."""
    return MLP_OUTPUT if layer_format.rstrip().endswith(".mlp") else BLOCK_OUTPUT


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """LLaMA/Mistral/MPT-family causal decoder."""

    vocab_size: int = 32000
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32  # < n_heads → GQA (Mistral); == n_heads → MHA
    d_ff: int = 11008
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6
    max_seq_len: int = 4096
    tie_embeddings: bool = False
    injection_site: str = BLOCK_OUTPUT
    dtype: jnp.dtype = jnp.bfloat16
    # MPT-style (OpenFlamingo's language encoder): no RoPE, ALiBi biases,
    # no biasless-RMSNorm (uses LayerNorm), single fused MLP with GELU.
    positional: str = "rope"  # "rope" | "alibi"
    norm_type: str = "rmsnorm"  # "rmsnorm" | "layernorm"
    activation: str = "silu_glu"  # "silu_glu" | "gelu"
    qk_layernorm: bool = False
    attn_logit_softcap: Optional[float] = None
    # "flash" (default) or "xla".  Flash = Pallas TPU flash attention for
    # full-sequence (training/prefill) self-attention; it only activates on a
    # real TPU backend at tile-friendly shapes (q_len>=256, q_len%128==0,
    # head_dim%128==0 — see layers.flash_attention_usable), so CPU tests and
    # decode steps always take the XLA path.  Validated on v5e: numerics
    # within bf16 tolerance, 1.18x on the 32-shot teacher step at seq 2048
    # (tools/validate_flash_tpu.py).  Override with ``lmm.attention_impl=xla``.
    attention_impl: str = "flash"
    # "bf16" (default) or "int8": decode KV cache storage.  int8 halves the
    # per-step cache HBM traffic (per-(token,head) symmetric scales over the
    # head dim; dequant fuses into the attention matmul) at ~1% relative
    # K/V error — opt in with ``lmm.kv_cache=int8``.
    kv_cache_dtype: str = "bf16"
    # With int8 weight-only quantization: ALSO dynamically quantize the
    # activations per row for prefill/bind-shaped matmuls (static token
    # count >= decoder.W8A8_MIN_TOKENS) and contract int8xint8->int32 on
    # the MXU's double-rate path (v5e: 394 TOPS vs 197 bf16 TFLOPS).
    # Decode steps (s=1) and speculative drafts stay weight-only — they are
    # bandwidth-bound, and the greedy==speculative token guarantee depends
    # on decode-path numerics being impl-invariant.  Opt in with
    # ``lmm.w8a8_prefill=true`` (not bit-parity with weight-only prefill).
    w8a8_prefill: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP/SigLIP-family ViT encoder."""

    image_size: int = 224
    patch_size: int = 14
    d_model: int = 1280
    n_layers: int = 32
    n_heads: int = 16
    d_ff: int = 5120
    norm_eps: float = 1e-5
    use_class_token: bool = True  # CLIP yes, SigLIP no
    use_pre_norm: bool = True  # CLIP pre-layernorm on embeddings
    use_post_norm: bool = False  # SigLIP post-layernorm on the sequence
    patch_bias: bool = False  # SigLIP conv has a bias, CLIP does not
    activation: str = "gelu"  # "gelu" | "gelu_tanh" | "quick_gelu"
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def n_patches(self) -> int:
        side = self.image_size // self.patch_size
        return side * side + (1 if self.use_class_token else 0)


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    """Perceiver resampler (Idefics-9B / OpenFlamingo / Idefics2 connector)."""

    n_latents: int = 64
    n_layers: int = 6
    n_heads: int = 16
    head_dim: int = 96
    d_model: int = 4096  # latent width (= text d_model for idefics)
    d_ff: int = 16384
    norm_eps: float = 1e-6
    concat_kv_latents: bool = True  # idefics concatenates latents to keys/values
    # HF IdeficsPerceiverResampler MLP uses ReLU; open_flamingo's
    # PerceiverResampler FeedForward uses GELU.
    activation: str = "relu"  # "relu" | "gelu"
    dtype: jnp.dtype = jnp.bfloat16


@dataclasses.dataclass(frozen=True)
class CrossAttnConfig:
    """Gated cross-attention blocks (Idefics-9B / Flamingo)."""

    every_n_layers: int = 4
    n_heads: int = 32
    d_ff: int = 11008
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
