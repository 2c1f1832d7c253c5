"""LICV-VQA-TPU: a TPU-native JAX framework for Learnable In-Context Vectors.

Re-implements the full capability surface of the PyTorch reference
(ForJadeForest/LICV-VQA — L-ICV, NeurIPS 2024, arXiv 2406.13185) as an
idiomatic JAX/XLA/Pallas stack:

- frozen large multimodal models (Idefics-9B, Idefics2-8B-base,
  OpenFlamingo-9B) implemented as ``lax.scan``-ed decoders with the ICV
  residual-stream injection fused into the layer body (no forward hooks);
- KL-distillation training of the per-layer ``(icv, alpha)`` parameters on a
  ``jax.sharding.Mesh`` with ``jit``-inserted collectives;
- fixed-shape jitted greedy/beam decoding with a KV cache;
- host-side data pipeline, VQA/CIDEr metrics, and RICE retrieval.

Reference behavioral spec: /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
