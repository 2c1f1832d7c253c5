"""HF checkpoint → JAX pytree conversion.

Weight mapping tables per model family (SURVEY.md §7 hard-part #1).  Input is
any mapping of HF parameter names to arrays (a torch ``state_dict``, a
safetensors file, or numpy arrays); output is the stacked-layer pytree the
scan-based decoders consume.  HF ``nn.Linear`` stores (out, in); we store
(in, out), hence the transposes.
"""

from __future__ import annotations

from typing import Callable, Mapping

import numpy as np

from .config import DecoderConfig, VisionConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach()
        if x.dtype is not None and str(x.dtype) == "torch.bfloat16":
            x = x.float()
        x = x.cpu().numpy()
    return np.asarray(x)


def _stack(sd: Mapping, fmt: str, n_layers: int, transpose: bool = False):
    rows = []
    for i in range(n_layers):
        w = _np(sd[fmt.format(i=i)])
        rows.append(w.T if transpose else w)
    return np.stack(rows)


def convert_llama(
    sd: Mapping, cfg: DecoderConfig, prefix: str = "model.", dtype=None
) -> dict:
    """LLaMA/Mistral-family HF state dict → decoder params.

    Works for ``LlamaForCausalLM``/``MistralForCausalLM`` and for the text
    backbone inside Idefics/Idefics2 given the right ``prefix``.
    """
    dtype = dtype or cfg.dtype
    lp = prefix + "layers.{i}."
    layers = {
        "attn": {
            "wq": _stack(sd, lp + "self_attn.q_proj.weight", cfg.n_layers, True),
            "wk": _stack(sd, lp + "self_attn.k_proj.weight", cfg.n_layers, True),
            "wv": _stack(sd, lp + "self_attn.v_proj.weight", cfg.n_layers, True),
            "wo": _stack(sd, lp + "self_attn.o_proj.weight", cfg.n_layers, True),
        },
        "mlp": {
            "w_gate": _stack(sd, lp + "mlp.gate_proj.weight", cfg.n_layers, True),
            "w_up": _stack(sd, lp + "mlp.up_proj.weight", cfg.n_layers, True),
            "w_down": _stack(sd, lp + "mlp.down_proj.weight", cfg.n_layers, True),
        },
        "ln1": _stack(sd, lp + "input_layernorm.weight", cfg.n_layers),
        "ln2": _stack(sd, lp + "post_attention_layernorm.weight", cfg.n_layers),
    }
    params = {
        "embed": _np(sd[prefix + "embed_tokens.weight"]),
        "layers": layers,
        "final_norm": _np(sd[prefix + "norm.weight"]),
    }
    if not cfg.tie_embeddings:
        head_key = "lm_head.weight"
        if head_key not in sd:  # nested, e.g. idefics2 "lm_head.weight" at root
            head_key = prefix + "lm_head.weight"
        params["lm_head"] = _np(sd[head_key]).T
    return _cast_tree(params, dtype)


def _cast_tree(tree, dtype):
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    import jax

    return jax.tree.map(cast, tree)


def hf_state_dict(model) -> dict:
    """Grab a torch module's state dict as plain numpy arrays."""
    return {k: _np(v) for k, v in model.state_dict().items()}
