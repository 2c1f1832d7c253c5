"""JAX CLIP dual encoder: numerical parity vs transformers CLIPModel
(tiny-random), and the RICE retriever running on top of it.

Reference capability: icv_src/utils/mm_topk_retriver.py encodes RICE
features with torch CLIP; our rebuild runs both towers on the accelerator
(models/clip.py), so parity against the HF model is what licenses swapping
the encoder backend.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from licv_vqa_tpu.models.clip import (
    ClipConfig,
    clip_image_features,
    clip_text_features,
    convert_hf_clip,
)


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import CLIPConfig, CLIPModel

    hf_cfg = CLIPConfig(
        text_config=dict(
            vocab_size=128,
            hidden_size=24,
            intermediate_size=48,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=16,
            eos_token_id=2,
        ),
        vision_config=dict(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=8,
        ),
        projection_dim=16,
    )
    torch.manual_seed(0)
    hf = CLIPModel(hf_cfg).eval()
    cfg = ClipConfig.tiny()
    params = convert_hf_clip(hf.state_dict(), cfg)
    return hf, cfg, params


def test_image_features_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(0)
    px = rng.normal(size=(3, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.from_numpy(px)).numpy()
    got = np.asarray(
        clip_image_features(cfg, params, jnp.asarray(px.transpose(0, 2, 3, 1)))
    )
    assert np.abs(got - ref).max() < 2e-5, np.abs(got - ref).max()


def test_text_features_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(1)
    b, s, v = 4, 12, 128
    ids = rng.integers(1, v - 1, size=(b, s)).astype(np.int32)
    lengths = np.array([12, 9, 5, 12])
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.int32)
    ids[np.arange(b), lengths - 1] = v - 1  # EOT = max id (HF pools argmax)
    ids[mask == 0] = 0
    with torch.no_grad():
        ref = hf.get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).numpy()
    got = np.asarray(
        clip_text_features(cfg, params, jnp.asarray(ids), jnp.asarray(mask))
    )
    assert np.abs(got - ref).max() < 2e-5, np.abs(got - ref).max()


def test_rice_retrieve_with_jax_features(tiny_pair):
    """Top-k through the retriever using JAX-encoded features end-to-end."""
    hf, cfg, params = tiny_pair
    from licv_vqa_tpu.retrieval.rice import MMTopkRetriever

    class Enc:
        def encode_images(self, images):
            px = np.stack([np.asarray(im, np.float32) for im in images])
            return np.asarray(clip_image_features(cfg, params, jnp.asarray(px)))

        def encode_texts(self, texts):
            rng = np.random.default_rng(7)
            s, v = 8, 128
            ids = rng.integers(1, v - 1, size=(len(texts), s)).astype(np.int32)
            ids[:, -1] = v - 1
            m = np.ones_like(ids)
            return np.asarray(
                clip_text_features(cfg, params, jnp.asarray(ids), jnp.asarray(m))
            )

    rng = np.random.default_rng(3)
    imgs = [rng.normal(size=(32, 32, 3)).astype(np.float32) for _ in range(6)]
    index_ds = [{"image": imgs[i]} for i in range(6)]
    test_ds = [{"image": imgs[2]}, {"image": imgs[5]}]
    r = MMTopkRetriever(index_ds, test_ds, mode="i2i", encoder=Enc())
    top = r.retrieve(2)
    # the identical image must be rank-0 for each query
    assert top[0][0] == 2 and top[1][0] == 5


def test_rice_retrieve_caches_topk_across_shot_counts(tiny_pair):
    """few_shot_list drives one retrieve() per shot count; the similarity
    matmul+top-k is computed once and smaller k slice the cached ranking —
    results must equal fresh per-k computation."""
    hf, cfg, params = tiny_pair
    from licv_vqa_tpu.retrieval.rice import MMTopkRetriever

    class Enc:
        def encode_images(self, images):
            px = np.stack([np.asarray(im, np.float32) for im in images])
            return np.asarray(clip_image_features(cfg, params, jnp.asarray(px)))

        def encode_texts(self, texts):
            raise AssertionError("i2i mode never encodes texts")

    rng = np.random.default_rng(4)
    imgs = [rng.normal(size=(32, 32, 3)).astype(np.float32) for _ in range(8)]
    index_ds = [{"image": imgs[i]} for i in range(8)]
    test_ds = [{"image": imgs[1]}, {"image": imgs[6]}]
    r = MMTopkRetriever(index_ds, test_ds, mode="i2i", encoder=Enc())
    fresh = MMTopkRetriever(index_ds, test_ds, mode="i2i", encoder=Enc())
    for k in (1, 4, 8):
        np.testing.assert_array_equal(r.retrieve(k), fresh.retrieve(k))
    assert r._topk_cache.shape[1] == 8  # one ranking serves every k


def test_rice_reversed_order_knob(tiny_pair):
    """``reversed_order=True`` flips each row most-similar-last (reference:
    icv_src/utils/mm_topk_retriver.py:224-226; constructor default False at
    :34) — dead-by-default in the reference CLI but part of the knob surface."""
    hf, cfg, params = tiny_pair
    from licv_vqa_tpu.retrieval.rice import MMTopkRetriever

    class Enc:
        def encode_images(self, images):
            px = np.stack([np.asarray(im, np.float32) for im in images])
            return np.asarray(clip_image_features(cfg, params, jnp.asarray(px)))

        def encode_texts(self, texts):
            raise AssertionError("i2i mode never encodes texts")

    rng = np.random.default_rng(5)
    imgs = [rng.normal(size=(32, 32, 3)).astype(np.float32) for _ in range(6)]
    index_ds = [{"image": imgs[i]} for i in range(6)]
    test_ds = [{"image": imgs[0]}, {"image": imgs[3]}]
    fwd = MMTopkRetriever(index_ds, test_ds, mode="i2i", encoder=Enc())
    rev = MMTopkRetriever(
        index_ds, test_ds, mode="i2i", encoder=Enc(), reversed_order=True
    )
    for k in (1, 3, 6):
        f, r = fwd.retrieve(k), rev.retrieve(k)
        assert r == [list(reversed(row)) for row in f]
    # most-similar (the identical image) lands LAST under reversed_order
    assert rev.retrieve(3)[0][-1] == 0 and rev.retrieve(3)[1][-1] == 3
