"""Precision policy: bf16 params/activations, f32 loss & optimizer math.

The reference trains "bf16-mixed"/"16-mixed" with model weights at bf16
(reference: config/trainer/*.yaml:3, config/lmm/lmm_base.yaml:2).  On TPU we
keep frozen LMM weights and activations in bfloat16 (MXU-native) and lift to
float32 only for softmax/KL/optimizer state.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax
import jax.numpy as jnp


class Precision(str, enum.Enum):
    BF16 = "bf16"
    F32 = "fp32"
    BF16_MIXED = "bf16-mixed"
    F16_MIXED = "16-mixed"  # accepted for config parity; mapped to bf16 on TPU


_DTYPES = {
    Precision.BF16: jnp.bfloat16,
    Precision.F32: jnp.float32,
    Precision.BF16_MIXED: jnp.bfloat16,
    Precision.F16_MIXED: jnp.bfloat16,
}


@dataclasses.dataclass(frozen=True)
class PrecisionPolicy:
    """dtypes for (frozen) params, activations, and loss math."""

    param_dtype: Any = jnp.bfloat16
    compute_dtype: Any = jnp.bfloat16
    loss_dtype: Any = jnp.float32

    @classmethod
    def from_string(cls, s: str) -> "PrecisionPolicy":
        dt = _DTYPES[Precision(s)]
        return cls(param_dtype=dt, compute_dtype=dt, loss_dtype=jnp.float32)

    def cast_params(self, tree: Any) -> Any:
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_compute(self, *xs: Any) -> Any:
        out = tuple(x.astype(self.compute_dtype) for x in xs)
        return out[0] if len(out) == 1 else out


DEFAULT_POLICY = PrecisionPolicy()
