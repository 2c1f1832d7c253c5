"""The learnable ICV parameter container.

Semantics of the reference encoder (reference:
icv_src/icv_encoder/global_icv_encoder.py:5-43): ``alpha ∈ R^{1×L}`` filled
with ``alpha_init_value``, ``icv ∈ R^{1×L×D}`` init N(0, 0.01), forward
returns ``(icv, get_alpha())`` with sigmoid applied iff ``use_sigmoid``.
We store the squeezed ``(L, D)`` / ``(L,)`` shapes; checkpoint IO restores the
reference's leading-1 axes for artifact parity (see train/checkpoint.py).
Trainable params stay float32 (optimizer math); they are cast to the model
compute dtype at injection time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ICVEncoderOutput:
    in_context_vector: jax.Array  # (L, D)
    alpha: jax.Array  # (L,)
    in_context_feature: Optional[jax.Array] = None


# param pytree: {"icv": (L, D) f32, "alpha": (L,) f32}
ICVParams = dict


@dataclasses.dataclass(frozen=True)
class GlobalICVEncoder:
    lmm_hidden_dim: int
    lmm_layers: int
    alpha_learnable: bool = True
    alpha_init_value: float = 0.0
    use_sigmoid: bool = False

    def init(self, key) -> ICVParams:
        return {
            "icv": jax.random.normal(
                key, (self.lmm_layers, self.lmm_hidden_dim), jnp.float32
            )
            * 0.01,
            "alpha": jnp.full((self.lmm_layers,), self.alpha_init_value, jnp.float32),
        }

    def get_alpha(self, params: ICVParams) -> jax.Array:
        a = params["alpha"]
        return jax.nn.sigmoid(a) if self.use_sigmoid else a

    def __call__(self, params: ICVParams) -> ICVEncoderOutput:
        return ICVEncoderOutput(
            in_context_vector=params["icv"], alpha=self.get_alpha(params)
        )

    def scaled_icv(self, params: ICVParams) -> jax.Array:
        """(L, D) injection tensor: ``alpha_l * v_l``
        (reference: icv_src/icv_module.py:89-92, inference.py:310-311)."""
        out = self(params)
        return out.alpha[:, None] * out.in_context_vector


def prepare_intervention_layers(
    intervention_layer, total_layers: int
) -> list[int]:
    """Reference semantics (icv_intervention.py:39-42): ``-1`` → all layers,
    int → that single layer, list → as given."""
    if intervention_layer == -1 or intervention_layer is None:
        return list(range(total_layers))
    if isinstance(intervention_layer, int):
        return [intervention_layer]
    return [int(x) for x in intervention_layer]


def expand_icv_to_layers(
    icv_scaled: Optional[jax.Array],  # (K, D) for the K intervened layers
    layers: list[int],
    total_layers: int,
):
    """(K, D) → ((L, D) rows, (L,) enable flags) for the scan body.  Layers
    not in ``layers`` carry a zero row and a False flag (the injection is
    skipped entirely, matching the reference's name-addressed hooks)."""
    if icv_scaled is None:
        return None
    import jax.numpy as jnp

    d = icv_scaled.shape[-1]
    rows = jnp.zeros((total_layers, d), icv_scaled.dtype)
    flags = jnp.zeros((total_layers,), bool)
    idx = jnp.asarray(layers, jnp.int32)
    rows = rows.at[idx].set(icv_scaled)
    flags = flags.at[idx].set(True)
    return rows, flags
