"""Split-softmax cached attention == write-then-attend, directly.

``decoder._cached_attention`` attends (old cache || this step's local
K/V block) without materializing the updated cache; the decode parity
suites cover it end-to-end, but this pins the op-level equivalence —
for every index form (scalar prefill/decode, per-row speculative) and
logit feature (ALiBi bias, softcap) — against the naive semantics:
write the rows at ``index`` first, then ``dot_product_attention`` over
the updated cache with the same post-write mask/bias.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from licv_vqa_tpu.models import layers as L
from licv_vqa_tpu.models.decoder import _cached_attention

B, H, DH, S = 3, 4, 16, 20


def _setup(s, index, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, s, H, DH)), jnp.float32)
    k_cache = jnp.asarray(rng.normal(size=(B, S, H, DH)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(B, S, H, DH)), jnp.float32)
    k_local = jnp.asarray(rng.normal(size=(B, s, H, DH)), jnp.float32)
    v_local = jnp.asarray(rng.normal(size=(B, s, H, DH)), jnp.float32)

    # post-write mask: valid cache rows strictly before the write position,
    # plus a causal pattern over the s incoming columns (mirrors
    # decode_cache_view: cache_valid rows + causal local block), with some
    # left-padding invalidity mixed in
    idx = np.broadcast_to(np.asarray(index), (B,))
    mask = np.zeros((B, 1, s, S), bool)
    for b in range(B):
        pad = rng.integers(0, 3)
        for qi in range(s):
            mask[b, 0, qi, pad : idx[b]] = True  # old cache rows
            mask[b, 0, qi, idx[b] : idx[b] + qi + 1] = True  # causal local
    return q, k_cache, v_cache, k_local, v_local, jnp.asarray(mask)


def _written(k_cache, v_cache, k_local, v_local, index):
    idx = jnp.broadcast_to(jnp.asarray(index, jnp.int32), (B,))
    s = k_local.shape[1]
    col = idx[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    return (
        k_cache.at[rows, col].set(k_local),
        v_cache.at[rows, col].set(v_local),
    )


@pytest.mark.parametrize("s", [1, 3])
@pytest.mark.parametrize("softcap", [None, 30.0])
@pytest.mark.parametrize("with_bias", [False, True])
def test_scalar_index_matches_write_then_attend(s, softcap, with_bias):
    index = jnp.asarray(7, jnp.int32)
    q, kc, vc, kl, vl, mask = _setup(s, 7)
    bias = None
    if with_bias:
        slopes = L.alibi_slopes(H)
        bias = (
            -slopes[None, :, None, None]
            * jnp.arange(S, 0, -1, dtype=jnp.float32)[None, None, None, :]
        )
        bias = jnp.broadcast_to(bias, (B, H, s, S))
    got = _cached_attention(q, kc, vc, kl, vl, mask, bias, index, softcap)
    kw, vw = _written(kc, vc, kl, vl, index)
    want = L.dot_product_attention(
        q, kw, vw, bias=bias, mask=mask, logit_softcap=softcap
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_per_row_index_matches_write_then_attend():
    index = jnp.asarray([2, 7, 13], jnp.int32)
    for s in (1, 3):
        q, kc, vc, kl, vl, mask = _setup(s, np.asarray([2, 7, 13]), seed=s)
        got = _cached_attention(q, kc, vc, kl, vl, mask, None, index, None)
        kw, vw = _written(kc, vc, kl, vl, index)
        want = L.dot_product_attention(q, kw, vw, mask=mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )


def test_per_row_index_with_bias():
    index = jnp.asarray([0, 5, 11], jnp.int32)
    s = 2
    q, kc, vc, kl, vl, mask = _setup(s, np.asarray([0, 5, 11]), seed=9)
    rng = np.random.default_rng(3)
    bias = jnp.asarray(rng.normal(size=(B, H, s, S)), jnp.float32)
    got = _cached_attention(q, kc, vc, kl, vl, mask, bias, index, None)
    kw, vw = _written(kc, vc, kl, vl, index)
    want = L.dot_product_attention(q, kw, vw, bias=bias, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_prefill_from_empty_cache():
    # index=0, s rows into an empty cache: the cache part contributes
    # nothing; result equals plain causal attention over the local block
    s = 6
    index = jnp.asarray(0, jnp.int32)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(B, s, H, DH)), jnp.float32)
    kl = jnp.asarray(rng.normal(size=(B, s, H, DH)), jnp.float32)
    vl = jnp.asarray(rng.normal(size=(B, s, H, DH)), jnp.float32)
    kc = jnp.full((B, S, H, DH), 1e6, jnp.float32)  # poison: must be masked
    vc = jnp.full((B, S, H, DH), 1e6, jnp.float32)
    causal = np.tril(np.ones((s, s), bool))
    mask = np.zeros((B, 1, s, S), bool)
    mask[:, 0, :, :s] = causal
    got = _cached_attention(
        q, kc, vc, kl, vl, jnp.asarray(mask), None, index, None
    )
    want = L.dot_product_attention(
        q, kl, vl, mask=jnp.asarray(causal)[None, None]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("softcap", [None, 30.0])
@pytest.mark.parametrize("index_form", ["scalar", "per_row"])
def test_int8_dict_cache_matches_dequantized_dense(softcap, index_form):
    # the quantized {"q","s"} cache path (int8 plane into the dot, scales
    # commuted onto scores/probabilities) == dequantize-then-dense-attend
    from licv_vqa_tpu.ops.quantize import dequantize_kv, quantize_kv_rows

    s = 2
    if index_form == "scalar":
        index = jnp.asarray(7, jnp.int32)
        q, kc, vc, kl, vl, mask = _setup(s, 7, seed=11)
    else:
        index = jnp.asarray([2, 7, 13], jnp.int32)
        q, kc, vc, kl, vl, mask = _setup(s, np.asarray([2, 7, 13]), seed=11)
    kq, ks = quantize_kv_rows(kc)
    vq, vs = quantize_kv_rows(vc)
    got = _cached_attention(
        q,
        {"q": kq, "s": ks},
        {"q": vq, "s": vs},
        kl,
        vl,
        mask,
        None,
        index,
        softcap,
    )
    want = _cached_attention(
        q,
        dequantize_kv(kq, ks, q.dtype),
        dequantize_kv(vq, vs, q.dtype),
        kl,
        vl,
        mask,
        None,
        index,
        softcap,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("quantized", [False, True])
def test_gqa_kv_heads_match_repeated_cache(quantized):
    # cache operands with KV < H heads (grouped einsums, no repeat_kv
    # materialization) == the same cache physically repeated to H heads
    from licv_vqa_tpu.ops.quantize import quantize_kv_rows

    kv, rep = 2, 2  # H = 4
    s = 2
    index = jnp.asarray(7, jnp.int32)
    q, _, _, kl, vl, mask = _setup(s, 7, seed=21)
    rng = np.random.default_rng(22)
    kc = jnp.asarray(rng.normal(size=(B, S, kv, DH)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(B, S, kv, DH)), jnp.float32)
    if quantized:
        kq, ks = quantize_kv_rows(kc)
        vq, vs = quantize_kv_rows(vc)
        grouped = (
            {"q": kq, "s": ks},
            {"q": vq, "s": vs},
        )
        repeated = (
            {"q": L.repeat_kv(kq, rep), "s": L.repeat_kv(ks, rep)},
            {"q": L.repeat_kv(vq, rep), "s": L.repeat_kv(vs, rep)},
        )
    else:
        grouped = (kc, vc)
        repeated = (L.repeat_kv(kc, rep), L.repeat_kv(vc, rep))
    got = _cached_attention(
        q, grouped[0], grouped[1], kl, vl, mask, None, index, None
    )
    want = _cached_attention(
        q, repeated[0], repeated[1], kl, vl, mask, None, index, None
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
