"""RICE shot retrieval: CLIP dual-encoder + exact top-k.

Replaces the reference's faiss ``IndexFlatIP`` path (reference:
icv_src/utils/mm_topk_retriver.py) — at these index sizes (≤ ~10⁴) exact
inner-product search is ONE matmul + ``jax.lax.top_k`` on the accelerator
(SURVEY.md §2.4), so no ANN library is needed.  The feature-cache contract is
kept: a ``torch.save`` pickle with the encoded index/test features keyed by
mode, so caches interoperate with the reference's.

Encoders are pluggable: with a LOCAL CLIP checkpoint directory
(``$CLIP_CPK_DIR``) the default is the JAX dual encoder (models/clip.py —
both towers on the accelerator, HF-parity tested); ``RICE_ENCODER=torch``
selects the transformers host encoder; with no checkpoint, a deterministic
hash encoder (tests / offline smoke).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.log import get_logger

logger = get_logger("retrieval")


class HashEncoder:
    """Deterministic, dependency-free featurizer (offline fallback)."""

    dim = 64

    def encode_images(self, images: Sequence) -> np.ndarray:
        feats = []
        for img in images:
            arr = np.asarray(
                img.convert("L").resize((8, 8)) if hasattr(img, "convert") else img
            )
            arr = np.resize(np.asarray(arr, np.float32), (self.dim,))
            feats.append(arr)
        return np.stack(feats)

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        feats = []
        for t in texts:
            h = np.zeros(self.dim, np.float32)
            for i, ch in enumerate(t.encode()):
                h[(ch * 31 + i) % self.dim] += 1.0
            feats.append(h)
        return np.stack(feats)


class ClipEncoder:
    """transformers CLIP from a local checkpoint directory."""

    def __init__(self, model_path: str, batch_size: int = 8):
        import torch
        from transformers import CLIPModel, CLIPProcessor

        self.torch = torch
        self.model = CLIPModel.from_pretrained(model_path).eval()
        self.processor = CLIPProcessor.from_pretrained(model_path)
        self.batch_size = batch_size

    def encode_images(self, images) -> np.ndarray:
        out = []
        for i in range(0, len(images), self.batch_size):
            batch = self.processor(
                images=list(images[i : i + self.batch_size]), return_tensors="pt"
            )
            with self.torch.no_grad():
                out.append(self.model.get_image_features(**batch).numpy())
        return np.concatenate(out)

    def encode_texts(self, texts) -> np.ndarray:
        out = []
        for i in range(0, len(texts), self.batch_size):
            batch = self.processor(
                text=list(texts[i : i + self.batch_size]),
                return_tensors="pt",
                padding=True,
                truncation=True,
            )
            with self.torch.no_grad():
                out.append(self.model.get_text_features(**batch).numpy())
        return np.concatenate(out)


class JaxClipEncoder:
    """CLIP dual encoder running on the accelerator (models/clip.py).

    Tokenization/image preprocessing stay host-side via the HF processor
    (SURVEY.md §2.4 keeps those off-accelerator); both towers run as jitted
    JAX programs, completing the on-device retrieval story (encode → matmul
    → ``lax.top_k``)."""

    def __init__(self, model_path: str, batch_size: int = 8):
        import jax as _jax
        from transformers import CLIPConfig, CLIPProcessor

        from ..models.clip import (
            ClipConfig,
            ClipTextConfig,
            clip_image_features,
            clip_text_features,
            convert_hf_clip,
        )
        from ..models.config import VisionConfig

        hf = CLIPConfig.from_pretrained(model_path)
        cfg = ClipConfig(
            vision=VisionConfig(
                image_size=hf.vision_config.image_size,
                patch_size=hf.vision_config.patch_size,
                d_model=hf.vision_config.hidden_size,
                n_layers=hf.vision_config.num_hidden_layers,
                n_heads=hf.vision_config.num_attention_heads,
                d_ff=hf.vision_config.intermediate_size,
                activation="quick_gelu",
                dtype=jnp.float32,
            ),
            text=ClipTextConfig(
                vocab_size=hf.text_config.vocab_size,
                max_positions=hf.text_config.max_position_embeddings,
                d_model=hf.text_config.hidden_size,
                n_layers=hf.text_config.num_hidden_layers,
                n_heads=hf.text_config.num_attention_heads,
                d_ff=hf.text_config.intermediate_size,
                eos_token_id=hf.text_config.eos_token_id,
            ),
            projection_dim=hf.projection_dim,
        )
        from ..models.registry import _load_hf_weights

        sd = _load_hf_weights(Path(model_path))
        if sd is None:
            raise FileNotFoundError(f"no CLIP weights under {model_path}")
        self.params = convert_hf_clip(sd, cfg)
        self.processor = CLIPProcessor.from_pretrained(model_path)
        self.batch_size = batch_size
        # params as a traced ARGUMENT, not a closure constant: baked-in
        # weights bloat the HLO past the axon remote-compile body limit
        self._img = _jax.jit(lambda p, px: clip_image_features(cfg, p, px))
        self._txt = _jax.jit(lambda p, ids, m: clip_text_features(cfg, p, ids, m))

    def encode_images(self, images) -> np.ndarray:
        out = []
        for i in range(0, len(images), self.batch_size):
            batch = self.processor(
                images=list(images[i : i + self.batch_size]), return_tensors="np"
            )
            px = np.transpose(batch["pixel_values"], (0, 2, 3, 1))  # NCHW→NHWC
            out.append(np.asarray(self._img(self.params, jnp.asarray(px))))
        return np.concatenate(out)

    def encode_texts(self, texts) -> np.ndarray:
        out = []
        for i in range(0, len(texts), self.batch_size):
            batch = self.processor(
                text=list(texts[i : i + self.batch_size]),
                return_tensors="np",
                padding=True,
                truncation=True,
            )
            out.append(
                np.asarray(
                    self._txt(
                        self.params,
                        jnp.asarray(batch["input_ids"], jnp.int32),
                        jnp.asarray(batch["attention_mask"], jnp.int32),
                    )
                )
            )
        return np.concatenate(out)


def _default_encoder(batch_size: int):
    path = os.environ.get("CLIP_CPK_DIR")
    if path and Path(path).exists():
        backend = os.environ.get("RICE_ENCODER", "jax")
        if backend == "jax":
            try:
                enc = JaxClipEncoder(path, batch_size)
                logger.info("RICE using JAX CLIP encoder from %s", path)
                return enc
            except Exception as e:  # missing weights/processor files
                logger.warning("RICE: JAX CLIP unavailable (%s) — torch fallback", e)
        logger.info("RICE using torch CLIP encoder from %s", path)
        return ClipEncoder(path, batch_size)
    logger.warning("RICE: no local CLIP checkpoint — using HashEncoder fallback")
    return HashEncoder()


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


class MMTopkRetriever:
    """mode ∈ {i2i, i2t, t2i, t2t}: test-side query → index-side keys."""

    def __init__(
        self,
        index_ds,
        test_ds,
        mode: str = "i2i",
        index_field: str = "image",
        test_field: Optional[str] = None,
        batch_size: int = 8,
        num_workers: int = 0,
        cache_file: Optional[str] = None,
        encoder=None,
        device=None,
        reversed_order: bool = False,
    ):
        del num_workers, device  # host threading / device handled by JAX
        self.mode = mode
        self.reversed_order = reversed_order
        self.index_ds = index_ds
        self.test_ds = test_ds
        self.index_field = index_field
        self.test_field = test_field or index_field
        self.encoder = encoder or _default_encoder(batch_size)

        feats = self._load_cache(cache_file)
        if feats is None:
            q_kind, k_kind = mode.split("2")[0], mode.split("2")[1]
            index_feats = self._encode(index_ds, self.index_field, k_kind)
            test_feats = self._encode(test_ds, self.test_field, q_kind)
            feats = {"index": index_feats, "test": test_feats, "mode": mode}
            self._save_cache(cache_file, feats)
        self.index_feats = _l2_normalize(np.asarray(feats["index"], np.float32))
        self.test_feats = _l2_normalize(np.asarray(feats["test"], np.float32))

    def _encode(self, ds, field: str, kind: str) -> np.ndarray:
        values = [ds[i][field] for i in range(len(ds))]
        if kind == "i":
            return self.encoder.encode_images(values)
        return self.encoder.encode_texts([str(v) for v in values])

    def _load_cache(self, cache_file):
        if cache_file and Path(cache_file).exists():
            import torch

            logger.info("RICE cache hit: %s", cache_file)
            cached = torch.load(cache_file, weights_only=False)
            if cached.get("mode") == self.mode:
                return cached
        return None

    def _save_cache(self, cache_file, feats):
        if cache_file:
            import torch

            Path(cache_file).parent.mkdir(parents=True, exist_ok=True)
            torch.save(feats, cache_file)

    def retrieve(self, ice_num: int) -> list[list[int]]:
        """Exact top-``ice_num`` inner-product search on the accelerator.

        The eval loop calls this once per ``few_shot_list`` entry (reference:
        inference.py:193-216); the similarity matmul + top-k are cached at
        the largest k seen so far and smaller requests slice the cached
        ranking (identical results — top-k of a fixed scoring is prefix
        monotone).  ``reversed_order`` flips each row most-similar-last
        (reference: icv_src/utils/mm_topk_retriver.py:224-226)."""
        cached = getattr(self, "_topk_cache", None)
        if cached is None or cached.shape[1] < ice_num:
            k = max(ice_num, 32 if self.index_feats.shape[0] >= 32 else ice_num)
            k = min(k, self.index_feats.shape[0])
            sims = jnp.asarray(self.test_feats) @ jnp.asarray(self.index_feats).T
            _, idx = jax.lax.top_k(sims, k)
            self._topk_cache = np.asarray(idx)
            cached = self._topk_cache
        rows = cached[:, :ice_num].tolist()
        if self.reversed_order:
            rows = [list(reversed(r)) for r in rows]
        return rows
