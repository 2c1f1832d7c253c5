"""Golden-value tests for the ICV ops against independent torch/numpy
implementations of the reference math (spec: SURVEY.md §2.1-2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from licv_vqa_tpu.ops import (
    aligned_teacher_gather,
    answer_region_mask,
    icv_inject,
    icv_inject_reference,
    masked_kl_divergence,
    shifted_cross_entropy,
)

PAD = 0


def torch_renorm(h, shift):
    s = h + shift
    return s / s.norm(dim=-1, keepdim=True) * h.norm(dim=-1, keepdim=True)


def test_icv_inject_matches_torch():
    rng = np.random.default_rng(1)
    h = rng.normal(size=(2, 5, 128)).astype(np.float32)
    v = rng.normal(size=(1, 1, 128)).astype(np.float32)
    want = torch_renorm(torch.tensor(h), torch.tensor(v)).numpy()
    got = np.asarray(icv_inject_reference(jnp.asarray(h), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    got2 = np.asarray(icv_inject(jnp.asarray(h), jnp.asarray(v)))
    np.testing.assert_allclose(got2, want, rtol=1e-5, atol=1e-5)


def test_icv_inject_norm_preserved():
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(3, 7, 256)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    out = icv_inject_reference(h, v)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(h), axis=-1),
        rtol=1e-5,
    )


def test_icv_inject_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(2, 4, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 128)).astype(np.float32))

    def loss_custom(h, v):
        return jnp.sum(jnp.sin(icv_inject(h, v)))

    def loss_ref(h, v):
        return jnp.sum(jnp.sin(icv_inject_reference(h, v)))

    gh_c, gv_c = jax.grad(loss_custom, argnums=(0, 1))(h, v)
    gh_r, gv_r = jax.grad(loss_ref, argnums=(0, 1))(h, v)
    np.testing.assert_allclose(np.asarray(gh_c), np.asarray(gh_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv_c), np.asarray(gv_r), rtol=1e-4, atol=1e-5)


def _make_batch(rng, bs=3, v=11):
    """Construct teacher/student id layouts mirroring the collator contract."""
    s_stu, s_tea = 12, 20
    stu_ids = np.full((bs, s_stu), PAD, np.int64)
    tea_ids = np.full((bs, s_tea), PAD, np.int64)
    qx_len = np.zeros(bs, np.int64)
    icl_len = np.zeros(bs, np.int64)
    for b in range(bs):
        qx = rng.integers(3, 6)  # bos + query tokens
        ans = rng.integers(1, 4)  # answer + eos region
        ice = rng.integers(5, 10)  # in-context shots region
        qx_len[b] = qx
        icl_len[b] = ice + (qx - 1)  # reference: ice + query_x-without-bos
        stu_ids[b, : qx + ans] = rng.integers(1, v, size=qx + ans)
        tea_len = ice + (qx - 1) + ans
        tea_ids[b, :tea_len] = rng.integers(1, v, size=tea_len)
    return stu_ids, tea_ids, qx_len, icl_len


def test_mask_counts_match_reference_structure():
    rng = np.random.default_rng(4)
    stu_ids, tea_ids, qx_len, icl_len = _make_batch(rng)
    m_stu = np.asarray(
        answer_region_mask(jnp.asarray(stu_ids), jnp.asarray(qx_len), PAD)
    )
    m_tea = np.asarray(
        answer_region_mask(jnp.asarray(tea_ids), jnp.asarray(icl_len), PAD)
    )
    # the equal-count property the reference's flat elementwise KL relies on
    np.testing.assert_array_equal(m_stu.sum(1), m_tea.sum(1))


@pytest.mark.parametrize("temperature", [1.0, 2.5])
def test_masked_kl_matches_reference_boolean_gather(temperature):
    rng = np.random.default_rng(5)
    bs, v = 3, 11
    stu_ids, tea_ids, qx_len, icl_len = _make_batch(rng, bs, v)
    stu_logits = rng.normal(size=(bs, stu_ids.shape[1], v)).astype(np.float32)
    tea_logits = rng.normal(size=(bs, tea_ids.shape[1], v)).astype(np.float32)
    eps = 1e-6

    # ---- reference path (torch, boolean mask + flat elementwise KL) ----
    t_stu = torch.tensor(stu_logits)
    t_tea = torch.tensor(tea_logits)
    m_stu = torch.tensor(
        np.asarray(answer_region_mask(jnp.asarray(stu_ids), jnp.asarray(qx_len), PAD))
    )
    m_tea = torch.tensor(
        np.asarray(answer_region_mask(jnp.asarray(tea_ids), jnp.asarray(icl_len), PAD))
    )
    stu_flat = t_stu[m_stu].view(-1, v) / temperature
    tea_flat = t_tea[m_tea].view(-1, v) / temperature
    want = (
        (
            tea_flat.softmax(dim=1)
            * ((tea_flat.softmax(dim=1) + eps).log() - (stu_flat.softmax(dim=1) + eps).log())
        )
        .sum(dim=1)
        .mean()
        * temperature**2
    ).item()

    # ---- our static-shape path ----
    mask = answer_region_mask(jnp.asarray(stu_ids), jnp.asarray(qx_len), PAD)
    tea_aligned = aligned_teacher_gather(
        jnp.asarray(tea_logits),
        jnp.asarray(icl_len),
        jnp.asarray(qx_len),
        stu_ids.shape[1],
    )
    got = float(
        masked_kl_divergence(
            jnp.asarray(stu_logits), tea_aligned, mask, temperature, eps
        )
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_shifted_cross_entropy_matches_torch():
    rng = np.random.default_rng(6)
    bs, s, v = 2, 9, 13
    logits = rng.normal(size=(bs, s, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(bs, s)).astype(np.int64)
    want = F.cross_entropy(
        torch.tensor(logits)[:, :-1].reshape(-1, v),
        torch.tensor(labels)[:, 1:].reshape(-1),
    ).item()
    got = float(shifted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(want, rel=1e-5)

    # with ignore_index
    labels2 = labels.copy()
    labels2[:, -3:] = -100
    want2 = F.cross_entropy(
        torch.tensor(logits)[:, :-1].reshape(-1, v),
        torch.tensor(labels2)[:, 1:].reshape(-1),
        ignore_index=-100,
    ).item()
    got2 = float(shifted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels2)))
    assert got2 == pytest.approx(want2, rel=1e-5)


def test_pallas_kernel_interpret_mode():
    from licv_vqa_tpu.ops.icv_inject import _icv_inject_pallas

    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 128)).astype(np.float32))
    want = icv_inject_reference(h, v[:, None, :])
    got = _icv_inject_pallas(h, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


class TestFusedKLKernel:
    """Pallas masked-KL kernel (interpret mode on CPU): value and BOTH input
    gradients must match the XLA formulation, including learnable-temperature
    chains through student AND teacher."""

    def _data(self, bs=2, s=8, v=384, seed=11):
        rng = np.random.default_rng(seed)
        stu = jnp.asarray(rng.normal(size=(bs, s, v)).astype(np.float32))
        tea = jnp.asarray(rng.normal(size=(bs, s, v)).astype(np.float32))
        mask = jnp.asarray(rng.integers(0, 2, size=(bs, s)).astype(bool))
        return stu, tea, mask

    def test_value_matches_xla(self):
        stu, tea, mask = self._data()
        for temp in (1.0, 2.5):
            a = float(masked_kl_divergence(stu, tea, mask, temp, impl="xla"))
            b = float(
                masked_kl_divergence(stu, tea, mask, temp, impl="pallas_interpret")
            )
            assert b == pytest.approx(a, rel=1e-5)

    def test_grads_match_xla(self):
        stu, tea, mask = self._data()

        def loss(impl, stu, tea, t):
            return masked_kl_divergence(stu, tea, mask, t, impl=impl)

        t0 = jnp.float32(1.7)
        gx = jax.grad(lambda s_, t_, tt: loss("xla", s_, t_, tt), argnums=(0, 1, 2))(
            stu, tea, t0
        )
        gp = jax.grad(
            lambda s_, t_, tt: loss("pallas_interpret", s_, t_, tt),
            argnums=(0, 1, 2),
        )(stu, tea, t0)
        for a, b, name in zip(gx, gp, ("dstu", "dtea", "dT")):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6, err_msg=name
            )

    def test_unpadded_row_counts(self):
        # N not a multiple of 8 exercises the zero-weight padding path
        stu, tea, mask = self._data(bs=1, s=5)
        a = float(masked_kl_divergence(stu, tea, mask, 1.0, impl="xla"))
        b = float(masked_kl_divergence(stu, tea, mask, 1.0, impl="pallas_interpret"))
        assert b == pytest.approx(a, rel=1e-5)


def test_flash_alibi_kernel_interpret():
    """Pallas ALiBi flash (fwd) matches the dense masked path in interpret
    mode, and the custom_vjp's dense-recompute backward matches dense grads
    (the hot user — the 32-shot MPT teacher forward — is stop_gradient-ed)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.models.layers import alibi_slopes
    from licv_vqa_tpu.ops import flash_alibi as fa

    rng = np.random.default_rng(0)
    b, s, h, dh = 2, 512, 4, 128
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h, dh)).astype(np.float32))
        for _ in range(3)
    )
    valid = np.ones((b, s), np.int32)
    valid[1, 400:] = 0
    validj = jnp.asarray(valid)
    slopes = alibi_slopes(h)
    scale = dh**-0.5

    ref = fa._dense_reference(q, k, v, validj, slopes, scale)
    got = fa._flash_alibi_fwd_impl(
        q, k, v, validj, slopes, scale=scale, interpret=True
    )
    vm = valid.astype(bool)
    assert np.abs(np.asarray(ref)[vm] - np.asarray(got)[vm]).max() < 2e-5

    w = jnp.asarray(vm[:, :, None, None] & np.ones(q.shape, bool))
    g_flash = jax.grad(
        lambda q: jnp.sum(
            jnp.where(
                w, fa.flash_alibi_attention(q, k, v, validj, slopes, scale), 0.0
            )
            ** 2
        )
    )
    g_ref = jax.grad(
        lambda q: jnp.sum(
            jnp.where(w, fa._dense_reference(q, k, v, validj, slopes, scale), 0.0)
            ** 2
        )
    )
    orig = fa._flash_alibi_fwd_impl
    fa._flash_alibi_fwd_impl = lambda *a, **kw: orig(
        *a, **dict(kw, interpret=True)
    )
    try:
        err = float(jnp.max(jnp.abs(g_flash(q) - g_ref(q))))
    finally:
        fa._flash_alibi_fwd_impl = orig
    assert err < 1e-5, err


def test_icv_inject_per_position_shift_matches_reference():
    """A per-position (B, S>1, D) shift must take the jnp path (the Pallas
    kernel broadcasts one row per batch element) — value AND grads equal the
    reference formulation."""
    from licv_vqa_tpu.ops.icv_inject import icv_inject, icv_inject_reference

    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(2, 4, 256)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(2, 4, 256)).astype(np.float32)) * 0.1
    got = icv_inject(h, shift)
    want = icv_inject_reference(h, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    g1 = jax.grad(lambda a, b: icv_inject(a, b).sum(), (0, 1))(h, shift)
    g2 = jax.grad(lambda a, b: icv_inject_reference(a, b).sum(), (0, 1))(h, shift)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_icv_inject_pallas_row_constant_shapes_interpret():
    """Kernel (interpret) == reference for every row-constant shift layout
    the dispatch gate admits: (D,), (B, D), (B, 1, D)."""
    from licv_vqa_tpu.ops.icv_inject import (
        _icv_inject_pallas,
        icv_inject_reference,
    )

    rng = np.random.default_rng(4)
    b, s, d = 2, 5, 256
    h = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    base = rng.normal(size=(b, d)).astype(np.float32) * 0.1
    # kernel layouts → the equivalent broadcastable layout for the reference
    cases = [
        (jnp.asarray(base[0]), jnp.asarray(base[0])),  # (D,)
        (jnp.asarray(base), jnp.asarray(base[:, None, :])),  # (B,D) ≡ (B,1,D)
        (jnp.asarray(base[:, None, :]), jnp.asarray(base[:, None, :])),
    ]
    for shift_kernel, shift_ref in cases:
        got = np.asarray(_icv_inject_pallas(h, shift_kernel, interpret=True))
        want = np.asarray(icv_inject_reference(h, shift_ref))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_vit_attention_kernel_interpret():
    """Fused short-seq ViT attention kernel (ops/vit_attention.py) matches
    layers.dot_product_attention elementwise (interpret mode on CPU) — both
    the unmasked CLIP path and the NaViT key-valid mask, at the real ViT-H
    geometry (s=257, dh=80 — neither sublane- nor lane-aligned)."""
    import numpy as np

    from licv_vqa_tpu.models import layers as L
    from licv_vqa_tpu.ops.vit_attention import vit_attention_tpu

    rng = np.random.default_rng(7)
    b, s, h, dh = 2, 37, 4, 10
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h, dh)), jnp.float32)
        for _ in range(3)
    )

    ref = L.dot_product_attention(q, k, v)
    got = vit_attention_tpu(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    valid = jnp.asarray(rng.random((b, s)) > 0.3)
    refm = L.dot_product_attention(q, k, v, mask=valid[:, None, None, :])
    gotm = vit_attention_tpu(q, k, v, valid=valid, interpret=True)
    # invalid QUERY rows: both paths let them attend valid keys; compare all
    np.testing.assert_allclose(np.asarray(gotm), np.asarray(refm), atol=2e-5)


def test_vit_attention_integrated_tower_interpret(monkeypatch):
    """vision_forward with the fused ViT attention kernel engaged
    (LICV_VIT_ATTN_INTERPRET routes _vit_layer's short-seq branch through
    the Pallas interpreter on CPU) matches the XLA attention path — both
    the CLIP class-token tower (mask=None) and the NaViT patch-mask path."""
    import numpy as np

    from licv_vqa_tpu.models.config import VisionConfig
    from licv_vqa_tpu.models.vision import init_vision_params, vision_forward

    rng = np.random.default_rng(11)

    # CLIP-style (class token, no mask)
    cfg = VisionConfig(
        d_model=32, n_layers=2, n_heads=2, d_ff=64, patch_size=14,
        image_size=56, dtype=jnp.float32,
    )
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.asarray(rng.normal(size=(2, 56, 56, 3)), jnp.float32)
    ref = np.asarray(vision_forward(cfg, params, pixels))
    monkeypatch.setenv("LICV_VIT_ATTN_INTERPRET", "1")
    got = np.asarray(vision_forward(cfg, params, pixels))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    monkeypatch.delenv("LICV_VIT_ATTN_INTERPRET")

    # NaViT-style (no class token, ragged patch grid -> key-valid mask)
    cfg2 = VisionConfig(
        d_model=32, n_layers=2, n_heads=2, d_ff=64, patch_size=14,
        image_size=56, use_class_token=False, use_pre_norm=False,
        use_post_norm=True, patch_bias=True, dtype=jnp.float32,
    )
    params2 = init_vision_params(jax.random.PRNGKey(1), cfg2)
    pm = np.ones((2, 4, 4), bool)
    pm[0, 2:, :] = False  # first image occupies only the top 2x4 rectangle
    pm = jnp.asarray(pm)
    ref2 = np.asarray(vision_forward(cfg2, params2, pixels, patch_mask=pm))
    monkeypatch.setenv("LICV_VIT_ATTN_INTERPRET", "1")
    got2 = np.asarray(vision_forward(cfg2, params2, pixels, patch_mask=pm))
    vm = np.asarray(pm.reshape(2, -1))
    np.testing.assert_allclose(got2[vm], ref2[vm], atol=2e-5)
