"""Int8 weight-only quantization: round-trip error, logits fidelity, and the
quantized decode path end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from licv_vqa_tpu.models import DecoderConfig, causal_lm_forward
from licv_vqa_tpu.models.convert import convert_llama, hf_state_dict
from licv_vqa_tpu.ops.quantize import (
    dequantize_tree,
    is_quantized_leaf,
    quantization_error,
    quantize_array,
    quantize_layer_stack,
)
from tests.test_decoder_parity import V, D, LAYERS, _our_cfg, _tiny_hf_llama


def test_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 256, 512)).astype(np.float32)) * 0.02
    assert quantization_error(w) < 0.01


def test_quantize_selects_projections_only():
    cfg = _our_cfg()
    from licv_vqa_tpu.models import init_decoder_params

    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    q = quantize_layer_stack(params["layers"])
    assert is_quantized_leaf(q["attn"]["wq"])
    assert is_quantized_leaf(q["mlp"]["w_down"])
    assert not is_quantized_leaf(q["ln1"])  # norms untouched
    assert q["attn"]["wq"]["q"].dtype == jnp.int8
    # dequantize restores shapes/dtype
    back = dequantize_tree(q, jnp.float32)
    assert back["attn"]["wq"].shape == params["layers"]["attn"]["wq"].shape


def test_quantize_skips_xattn_layernorm_dicts():
    """openflamingo's gated-xattn norms are {"w","b"} dicts — the bare "w"
    leaf key must not be mistaken for a projection (regression: ln_attn.w
    was int8-quantized, crashing the un-dequantized layer_norm read)."""
    from licv_vqa_tpu.models.openflamingo import (
        OpenFlamingoConfig,
        init_flamingo_xattn_params,
    )

    cfg = OpenFlamingoConfig.tiny()
    xp = init_flamingo_xattn_params(jax.random.PRNGKey(0), cfg, 2)
    q = quantize_layer_stack(xp)
    assert not is_quantized_leaf(q["ln_attn"]["w"])
    assert not is_quantized_leaf(q["ln_ff"]["w"])
    assert is_quantized_leaf(q["wq"])
    assert is_quantized_leaf(q["wkv"])
    assert is_quantized_leaf(q["ff_up"])


def test_quantized_logits_fidelity_and_decode():
    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, V, size=(2, 10)))
    mask = jnp.ones_like(ids)
    full, _ = causal_lm_forward(cfg, params, ids, mask)

    qparams = dict(params)
    qparams["layers"] = quantize_layer_stack(params["layers"])
    qlogits, _ = causal_lm_forward(cfg, qparams, ids, mask)

    a = np.asarray(full).reshape(-1, V)
    b = np.asarray(qlogits).reshape(-1, V)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, cos.min()

    # decode path with cache runs and produces mostly the same greedy tokens
    from licv_vqa_tpu.infer import greedy_generate
    from tests.test_decode import _forward_fn, PAD, EOS

    g_full = np.asarray(
        greedy_generate(_forward_fn(cfg, params), ids, mask, 6, EOS, PAD)
    )
    g_q = np.asarray(
        greedy_generate(_forward_fn(cfg, qparams), ids, mask, 6, EOS, PAD)
    )
    agree = (g_full[:, 10:] == g_q[:, 10:]).mean()
    assert agree >= 0.5, agree  # tiny random models amplify quantization noise


def test_cli_quantized_inference(tmp_path, monkeypatch):
    from tests.test_cli_e2e import _write_vqa_split
    import sys
    from pathlib import Path

    REPO = Path(__file__).resolve().parent.parent
    monkeypatch.chdir(REPO)
    vqa_root = tmp_path / "vqav2"
    coco = tmp_path / "coco" / "mscoco2014"
    _write_vqa_split(vqa_root, coco / "train2014", "train2014", 4)
    _write_vqa_split(vqa_root, coco / "val2014", "val2014", 3)
    monkeypatch.setenv("VQAV2_PATH", str(vqa_root))
    monkeypatch.setenv("COCO_PATH", str(tmp_path / "coco"))
    monkeypatch.setenv("RESULT_DIR", str(tmp_path / "results"))
    monkeypatch.setenv("MODEL_CPK_DIR", str(tmp_path / "cpk"))

    import inference as infer_cli

    result = infer_cli.main(
        [
            "lmm=tiny-idefics",
            "lmm.quantize=int8",
            "lmm.quantize_head=true",  # int8 lm_head rides the same path
            "lmm.kv_cache=int8",  # int8 weights + int8 KV cache compose
            "lmm.w8a8_prefill=true",  # int8-MXU prefill composes too
            "lmm.quantize_vision=true",  # int8 tower+perceiver composes too
            "run_name=e2e_q8",
            "test_icv=false",
            "test_icl=true",
            "few_shot_list=[1]",
            "test_num=2",
            "train_num=3",
            "bs=2",
            "data_cfg.task.datasets.max_train_size=-1",
            "generate_kwargs.max_new_tokens=2",
            "generate_kwargs.num_beams=1",
        ]
    )
    assert any("ICL shot_num" in k for k in result)


def test_quantized_speculative_cli(tmp_path, monkeypatch):
    """int8 weights + speculative decoding compose (draft slices quantized
    leaves; both binds normalize pixels)."""
    from tests.test_cli_e2e import _write_vqa_split
    from pathlib import Path

    REPO = Path(__file__).resolve().parent.parent
    monkeypatch.chdir(REPO)
    vqa_root = tmp_path / "vqav2"
    coco = tmp_path / "coco" / "mscoco2014"
    _write_vqa_split(vqa_root, coco / "train2014", "train2014", 4)
    _write_vqa_split(vqa_root, coco / "val2014", "val2014", 3)
    monkeypatch.setenv("VQAV2_PATH", str(vqa_root))
    monkeypatch.setenv("COCO_PATH", str(tmp_path / "coco"))
    monkeypatch.setenv("RESULT_DIR", str(tmp_path / "results"))
    monkeypatch.setenv("MODEL_CPK_DIR", str(tmp_path / "cpk"))

    import inference as infer_cli

    result = infer_cli.main(
        [
            "lmm=tiny-idefics",
            "lmm.quantize=int8",
            "run_name=e2e_q8spec",
            "test_icv=false",
            "test_icl=true",
            "few_shot_list=[1]",
            "test_num=2",
            "train_num=3",
            "bs=2",
            "data_cfg.task.datasets.max_train_size=-1",
            "generate_kwargs.max_new_tokens=2",
            "generate_kwargs.num_beams=1",
            "generate_kwargs.speculative_draft_layers=2",
            "generate_kwargs.speculative_gamma=2",
        ]
    )
    assert any("ICL shot_num" in k for k in result)


def test_int8_kv_cache_decode_fidelity():
    """Greedy decode with the int8 KV cache tracks the bf16-cache decode:
    per-(token,head) scales keep K/V round-trip error ~1%, and the full
    greedy/beam plumbing (scan xs/ys, beam gathers) threads the {"q","s"}
    cache leaves transparently."""
    import dataclasses

    from licv_vqa_tpu.infer import beam_generate, greedy_generate
    from licv_vqa_tpu.models import causal_lm_forward, init_kv_cache

    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    assert isinstance(init_kv_cache(cfg8, 2, 8)["k"], dict)

    def fwd(c):
        def fn(input_ids, attention_mask, positions, cache):
            if cache is None:
                cache = init_kv_cache(c, input_ids.shape[0], 32)
            return causal_lm_forward(
                c, params, input_ids, attention_mask, cache=cache,
                positions=positions,
            )

        return fn

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(2, 8)).astype(np.int32))
    mask = jnp.ones_like(ids)

    # single forward: logits under the int8 cache are near-identical
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    lg16, _ = fwd(cfg)(ids, mask, pos, None)
    lg8, _ = fwd(cfg8)(ids, mask, pos, None)
    a, b = np.asarray(lg16).ravel(), np.asarray(lg8).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos

    kw = dict(max_new_tokens=8, eos_token_id=-1, pad_token_id=0)
    g16 = np.asarray(greedy_generate(fwd(cfg), ids, mask, **kw))
    g8 = np.asarray(greedy_generate(fwd(cfg8), ids, mask, **kw))
    assert (g16 == g8).mean() > 0.85, (g16, g8)
    # beam search exercises the cache gather path over dict leaves
    b8 = np.asarray(beam_generate(fwd(cfg8), ids, mask, num_beams=2, **kw))
    assert b8.shape == g8.shape


def test_quantized_head_logits_and_decode():
    """int8 lm_head ({"q","s"} leaf through logits_from_hidden/qdot):
    logits match the dequantized-head forward to f32-rounding, and the
    greedy decode plumbing threads the dict leaf."""
    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    assert not cfg.tie_embeddings
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(1, V, size=(2, 10)))
    mask = jnp.ones_like(ids)

    qh = dict(params)
    qh["lm_head"] = quantize_array(params["lm_head"])
    dq = dict(params)
    dq["lm_head"] = dequantize_tree(qh["lm_head"], jnp.float32)

    got, _ = causal_lm_forward(cfg, qh, ids, mask)
    want, _ = causal_lm_forward(cfg, dq, ids, mask)
    # same int8 grid both sides; only (x@q)*s vs x@(q*s) rounding differs
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )

    from licv_vqa_tpu.infer import greedy_generate
    from tests.test_decode import _forward_fn, PAD, EOS

    g_q = np.asarray(greedy_generate(_forward_fn(cfg, qh), ids, mask, 6, EOS, PAD))
    g_d = np.asarray(greedy_generate(_forward_fn(cfg, dq), ids, mask, 6, EOS, PAD))
    np.testing.assert_array_equal(g_q, g_d)


def test_quantized_head_tp_spec_shards_vocab():
    """param_specs vocab-shards the int8 head's q AND its per-column scales
    (a replicated fallback would silently keep the 262 MB head per chip)."""
    from jax.sharding import PartitionSpec as P

    from licv_vqa_tpu.parallel.sharding import param_specs

    params = {
        "lm_head": {
            "q": jnp.zeros((16, 32), jnp.int8),
            "s": jnp.zeros((1, 32), jnp.float32),
        }
    }
    specs = param_specs(params)
    assert specs["lm_head"]["q"] == P(None, "tp")
    assert specs["lm_head"]["s"] == P(None, "tp")


def test_qdot_matches_dequant_dot():
    """qdot's scale-on-output schedule == dequant-then-dot (per-output-channel
    scales commute with the contraction); pallas kernel checked in interpret
    mode (the real Mosaic lowering is validated by tools/bench_int8_matmul.py
    on hardware)."""
    from licv_vqa_tpu.ops.int8_matmul import int8_matmul_pallas, qdot

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32)) * 0.02
    leaf = quantize_array(w)
    ref = jnp.dot(x, dequantize_tree(leaf, jnp.float32))
    got = qdot(x, leaf)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # plain arrays pass straight through
    assert np.allclose(np.asarray(qdot(x, w)), np.asarray(jnp.dot(x, w)), atol=0)
    # gradient flows through the fallback (frozen weights, live activations)
    g = jax.grad(lambda x: jnp.sum(qdot(x, leaf) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    # pallas kernel (interpret): same math, 2D decode shape
    x2 = x[:, 0, :].astype(jnp.bfloat16)  # (2, 96) -> pad m to 8 upstream?
    x8 = jnp.tile(x2, (4, 1))  # m=8
    out = int8_matmul_pallas(x8, leaf["q"], leaf["s"], interpret=True)
    ref8 = jnp.dot(x8.astype(jnp.float32), dequantize_tree(leaf, jnp.float32))
    rel = np.abs(np.asarray(out, np.float32) - np.asarray(ref8)).max() / (
        np.abs(np.asarray(ref8)).max() + 1e-9
    )
    assert rel < 2e-2, rel


# ---------------------------------------------------------------------------
# int4 (group-wise scales)
# ---------------------------------------------------------------------------


def test_int4_roundtrip_error_bounded():
    from licv_vqa_tpu.ops.quantize import quantize_array_int4, dequantize_int4

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 256, 512)).astype(np.float32)) * 0.02
    assert quantization_error(w, mode="int4") < 0.11  # 15 levels, G=64+clip
    # int8 stays an order of magnitude tighter
    assert quantization_error(w, mode="int8") < 0.01
    # shapes: scales are per (group, out-channel); q4 is nibble-packed uint8
    leaf = quantize_array_int4(w)
    assert leaf["q4"].dtype == jnp.uint8
    assert leaf["q4"].shape == (4, 256 // 2, 512)
    assert leaf["s"].shape == (4, 256 // 64, 1, 512)
    assert leaf["s"].dtype == jnp.bfloat16
    back = dequantize_int4(leaf, jnp.float32)
    assert back.shape == w.shape


def test_int4_group_fallback_non_divisible():
    from licv_vqa_tpu.ops.quantize import quantize_array_int4, _int4_group

    assert _int4_group(4096) == 64
    assert _int4_group(88) == 88  # whole-column single group
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(88, 40)).astype(np.float32))
    leaf = quantize_array_int4(w)
    assert leaf["s"].shape == (1, 1, 40)
    assert leaf["q4"].shape == (44, 40)
    assert quantization_error(w, mode="int4") < 0.13  # coarse single group
    import pytest

    with pytest.raises(ValueError):
        quantize_array_int4(jnp.zeros((87, 40)))  # odd in-features


def test_int4_qdot_matches_dequant_dot_and_grads():
    from licv_vqa_tpu.ops.int8_matmul import qdot
    from licv_vqa_tpu.ops.quantize import quantize_array_int4

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 96)).astype(np.float32)) * 0.02
    leaf = quantize_array_int4(w)
    ref = jnp.dot(x, dequantize_tree(leaf, jnp.float32))
    got = qdot(x, leaf)
    assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g = jax.grad(lambda x: jnp.sum(qdot(x, leaf) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_int4_layer_stack_and_forward_fidelity():
    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    q = quantize_layer_stack(params["layers"], mode="int4")
    from licv_vqa_tpu.ops.quantize import is_quantized4_leaf

    assert is_quantized4_leaf(q["attn"]["wq"])
    assert is_quantized4_leaf(q["mlp"]["w_down"])
    assert not is_quantized4_leaf(q["ln1"])

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, V, size=(2, 10)))
    mask = jnp.ones_like(ids)
    full, _ = causal_lm_forward(cfg, params, ids, mask)
    qparams = dict(params)
    qparams["layers"] = q
    qlogits, _ = causal_lm_forward(cfg, qparams, ids, mask)
    a = np.asarray(full).reshape(-1, V)
    b = np.asarray(qlogits).reshape(-1, V)
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() > 0.93, cos.min()  # int4 trades fidelity for bytes


def test_int4_registry_plumbing():
    """lmm.quantize=int4 through build_model quantizes the decoder stack."""
    from types import SimpleNamespace

    from licv_vqa_tpu.models.registry import _maybe_quantize
    from licv_vqa_tpu.ops.quantize import is_quantized4_leaf

    cfg = _our_cfg()
    from licv_vqa_tpu.models import init_decoder_params

    params = init_decoder_params(jax.random.PRNGKey(0), cfg)

    class _Bundle:
        pass

    b = _Bundle()
    b.params = dict(params)
    lmm = {"quantize": "int4"}
    ns = SimpleNamespace(lmm=SimpleNamespace(get=lambda k, d=None: lmm.get(k, d)))
    out = _maybe_quantize(ns, b)
    assert is_quantized4_leaf(out.params["layers"]["attn"]["wq"])


def test_int4_matmul_pallas_interpret_matches_dequant():
    """Kernel (interpret mode) == dequant+dot for multi-group shapes."""
    from licv_vqa_tpu.ops.int4_matmul import int4_matmul_pallas, _pick_tiles
    from licv_vqa_tpu.ops.quantize import quantize_array_int4, dequantize_int4

    rng = np.random.default_rng(7)
    for m, k, n, g in [(8, 256, 256, 64), (16, 512, 384, 64), (8, 128, 128, 32)]:
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)) * 0.02
        leaf = quantize_array_int4(w, group=g)
        kg = leaf["s"].shape[-3]
        assert kg * g == k
        ref = np.asarray(
            jnp.dot(x, dequantize_int4(leaf, jnp.float32)), dtype=np.float32
        )
        got = np.asarray(
            int4_matmul_pallas(
                x,
                leaf["q4"],
                leaf["s"].reshape(kg, n),
                g,
                out_dtype=jnp.float32,
                interpret=True,
            ),
            dtype=np.float32,
        )
        # kernel computes in bf16 x bf16 -> f32; compare loosely
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 2e-2, (m, k, n, g)


def test_int4_pick_tiles_flagship_shapes():
    from licv_vqa_tpu.ops.int4_matmul import _pick_tiles

    # (K2, N): wq/wo 4096x4096, w_gate/up 4096x11008, w_down 11008x4096
    assert _pick_tiles(2048, 4096, 64) == (512, 512)
    assert _pick_tiles(2048, 11008, 64) == (512, 256)
    assert _pick_tiles(5504, 4096, 64) == (128, 512)  # 5504 = 43*128


def test_qdot_kernel_paths_are_differentiable(monkeypatch):
    """jax.grad works through BOTH Pallas kernel branches of qdot.

    lmm.quantize=int4 is default-ON for decode-shaped matmuls; ICV training
    traces the student forward under grad, so the kernel branch must carry a
    VJP (activation-only — the quantized stacks are frozen).  Force the
    kernel branches on CPU via interpret mode and compare the x-gradient
    against the natively differentiable dequant fallback.
    """
    import functools

    from licv_vqa_tpu.ops import int4_matmul as i4
    from licv_vqa_tpu.ops import int8_matmul as i8
    from licv_vqa_tpu.ops.int8_matmul import qdot
    from licv_vqa_tpu.ops.quantize import (
        dequantize_int4,
        quantize_array,
        quantize_array_int4,
    )

    rng = np.random.default_rng(11)
    m, k, n, g = 8, 256, 256, 64
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)) * 0.02
    leaf4 = quantize_array_int4(w, group=g)
    leaf8 = quantize_array(w)

    # reference grads via the differentiable fallbacks (kernel gates off)
    g4_ref = jax.grad(lambda xv: jnp.dot(xv, dequantize_int4(leaf4, jnp.float32)).sum())(x)
    g8_ref = jax.grad(
        lambda xv: (jnp.dot(xv, leaf8["q"].astype(xv.dtype)) * leaf8["s"]).sum()
    )(x)

    monkeypatch.setattr(i4, "int4_matmul_usable", lambda *a: True)
    monkeypatch.setattr(
        i4, "int4_matmul_pallas", functools.partial(i4.int4_matmul_pallas, interpret=True)
    )
    monkeypatch.setattr(i8, "int8_matmul_usable", lambda *a: True)
    monkeypatch.setattr(
        i8, "int8_matmul_pallas", functools.partial(i8.int8_matmul_pallas, interpret=True)
    )

    y4, g4 = jax.value_and_grad(lambda xv: qdot(xv, leaf4).astype(jnp.float32).sum())(x)
    y8, g8 = jax.value_and_grad(lambda xv: qdot(xv, leaf8).astype(jnp.float32).sum())(x)
    assert np.isfinite(float(y4)) and np.isfinite(float(y8))
    s4 = np.abs(np.asarray(g4_ref)).max() + 1e-9
    s8 = np.abs(np.asarray(g8_ref)).max() + 1e-9
    assert np.abs(np.asarray(g4) - np.asarray(g4_ref)).max() / s4 < 2e-2
    assert np.abs(np.asarray(g8) - np.asarray(g8_ref)).max() / s8 < 2e-2


def test_flash_prefill_attends_int8_roundtrip_keys(monkeypatch):
    """int8-KV invariant on the FLASH prefill branch: attention must see the
    int8 round-trip of the local K/V (what later decode steps read back),
    not the raw full-precision keys — same contract as _cached_attention.

    Flash doesn't lower on CPU, so stub the kernel to CAPTURE its K operand
    and assert it is a fixed point of quantize∘dequantize (a raw-K capture
    is not)."""
    from licv_vqa_tpu.models import (
        DecoderConfig,
        causal_lm_forward,
        init_decoder_params,
        init_kv_cache,
    )
    from licv_vqa_tpu.models import layers as L
    from licv_vqa_tpu.ops.quantize import dequantize_kv, quantize_kv_rows

    cfg = dataclasses_replace_kv(
        DecoderConfig(
            vocab_size=64, d_model=32, n_layers=1, n_heads=2, n_kv_heads=2,
            d_ff=64, dtype=jnp.float32,
        )
    )
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    captured = []

    def fake_flash(q, k, v, valid):
        captured.append(np.asarray(k, np.float32))
        return jnp.zeros_like(q)

    monkeypatch.setattr(L, "flash_attention_usable", lambda *a: True)
    monkeypatch.setattr(L, "flash_attention_tpu", fake_flash)

    ids = np.arange(2 * 8, dtype=np.int32).reshape(2, 8) % 60
    mask = np.ones_like(ids)
    cache = init_kv_cache(cfg, 2, 16)
    assert isinstance(cache["k"], dict)  # int8 cache
    with jax.disable_jit():  # the python stub must actually run
        causal_lm_forward(
            cfg, params, jnp.asarray(ids), jnp.asarray(mask),
            cache=cache, positions=jnp.asarray(mask).cumsum(-1) - 1,
            prefill_flash=jnp.asarray(mask),
        )
    assert captured, "flash stub never called"
    k = jnp.asarray(captured[0])
    kq, ks = quantize_kv_rows(k)
    roundtrip = np.asarray(dequantize_kv(kq, ks, jnp.float32))
    np.testing.assert_allclose(np.asarray(k), roundtrip, rtol=0, atol=1e-6)


def dataclasses_replace_kv(cfg):
    import dataclasses

    return dataclasses.replace(cfg, kv_cache_dtype="int8", attention_impl="flash")


def test_w8a8_qdot_matches_integer_emulation():
    """qdot(a8=True) == exact emulation of the two symmetric roundings
    (per-row activations, per-output-column weights) with an int32
    accumulator — only f32 scale-multiply rounding differs."""
    from licv_vqa_tpu.ops.int8_matmul import qdot

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 24, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 64)) * 0.02, jnp.float32)
    leaf = quantize_array(w)

    got = np.asarray(qdot(x, leaf, preferred_element_type=jnp.float32, a8=True))

    xn = np.asarray(x, np.float64)
    sx = np.maximum(np.abs(xn).max(-1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.round(xn / sx), -127, 127).astype(np.int32)
    wq = np.asarray(leaf["q"], np.int32)
    sw = np.asarray(leaf["s"], np.float64)
    want = (xq @ wq).astype(np.float64) * sx * sw
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_w8a8_qdot_dense_weight_ignores_flag():
    from licv_vqa_tpu.ops.int8_matmul import qdot

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(qdot(x, w, a8=True)), np.asarray(qdot(x, w))
    )


def test_w8a8_grad_routes_through_dense_weight():
    """jax.grad through the a8 path: straight-through on the activation
    rounding, gx == gy @ W_dq^T (the frozen-weight contract)."""
    from licv_vqa_tpu.ops.int8_matmul import qdot

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(20, 48)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(48, 24)) * 0.05, jnp.float32)
    leaf = quantize_array(w)

    g = jax.grad(lambda xv: qdot(xv, leaf, a8=True).sum())(x)
    wdq = np.asarray(leaf["q"], np.float32) * np.asarray(leaf["s"], np.float32)
    want = np.ones((20, 24), np.float32) @ wdq.T
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-5)


def test_w8a8_forward_fidelity_and_decode_gate():
    """End-to-end: a tiny quantized model with w8a8_prefill=True produces
    prefill logits close to the weight-only path (two extra int8 roundings
    on the activations), and the s=1 decode step is BIT-IDENTICAL to the
    weight-only path (the static token gate keeps decode weight-only)."""
    import dataclasses

    from licv_vqa_tpu.models import init_kv_cache
    from licv_vqa_tpu.models.decoder import W8A8_MIN_TOKENS

    hf = _tiny_hf_llama()
    cfg = _our_cfg()
    cfg_a8 = dataclasses.replace(cfg, w8a8_prefill=True)
    params = convert_llama(hf_state_dict(hf), cfg, dtype=jnp.float32)
    params = dict(params)
    params["layers"] = quantize_layer_stack(params["layers"])

    rng = np.random.default_rng(3)
    s = W8A8_MIN_TOKENS + 4  # above the gate: prefill runs w8a8
    ids = jnp.asarray(rng.integers(1, V, size=(2, s)))
    mask = jnp.ones_like(ids)

    logits_a8, _ = causal_lm_forward(cfg_a8, params, ids, mask)
    logits_wo, _ = causal_lm_forward(cfg, params, ids, mask)
    err = np.abs(np.asarray(logits_a8) - np.asarray(logits_wo)).max()
    ref = np.abs(np.asarray(logits_wo)).max()
    assert err < 0.05 * ref, (err, ref)

    # decode step (s=1 < gate): bit-identical to weight-only
    cache = init_kv_cache(cfg, 2, s + 4)
    pos = mask.cumsum(-1) - 1
    _, c1 = causal_lm_forward(cfg, params, ids, mask, cache=cache, positions=pos)
    step_ids = ids[:, -1:]
    step_pos = pos[:, -1:] + 1
    la8, _ = causal_lm_forward(
        cfg_a8, params, step_ids, mask, cache=c1, positions=step_pos
    )
    lwo, _ = causal_lm_forward(
        cfg, params, step_ids, mask, cache=c1, positions=step_pos
    )
    np.testing.assert_array_equal(np.asarray(la8), np.asarray(lwo))


def test_vision_tower_a8_inert_under_w8a8_prefill():
    """The ViT tower stays WEIGHT-ONLY under lmm.w8a8_prefill: per-row
    activation-quantize costs more than the int8 MXU saves at tower shapes
    (v5e bs=64: 286 ms a8 vs 208 ms without — tools/bench_prefill_tpu.py
    --vision-breakdown).  encode_images must be bit-identical with the flag
    on and off when only the tower is quantized (the perceiver keeps a8, so
    it stays unquantized here to isolate the tower)."""
    import dataclasses

    from licv_vqa_tpu.models.idefics import IdeficsConfig, init_idefics_params
    from licv_vqa_tpu.models.idefics import encode_images

    cfg = IdeficsConfig.tiny()
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    params["vision"] = dict(params["vision"])
    params["vision"]["layers"] = quantize_layer_stack(params["vision"]["layers"])
    cfg_a8 = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, w8a8_prefill=True)
    )
    rng = np.random.default_rng(11)
    isz = cfg.vision.image_size
    pixels = jnp.asarray(rng.normal(size=(2, 1, isz, isz, 3)), jnp.float32)
    base = np.asarray(encode_images(cfg, params, pixels))
    a8 = np.asarray(encode_images(cfg_a8, params, pixels))
    np.testing.assert_array_equal(a8, base)


def test_perceiver_norms_never_quantized():
    """Regression: the perceiver's ctx_ln/lat_ln/mlp_ln/q_ln/k_ln dicts do
    NOT start with "ln" — their stacked 2D "w" leaves must still be
    recognized as norms, not projections."""
    from licv_vqa_tpu.models.config import PerceiverConfig
    from licv_vqa_tpu.models.perceiver import init_perceiver_params

    cfg = PerceiverConfig(
        d_model=32, n_heads=2, head_dim=16, d_ff=64, n_layers=2, n_latents=4
    )
    params = init_perceiver_params(jax.random.PRNGKey(0), cfg, qk_layer_norms=True)
    q = quantize_layer_stack(params["blocks"])
    for norm in ("ctx_ln", "lat_ln", "mlp_ln", "q_ln", "k_ln"):
        assert not is_quantized_leaf(q[norm]["w"]), norm
    for proj in ("wq", "wk", "wv", "wo", "fc", "c_proj"):
        assert is_quantized_leaf(q[proj]), proj
    # latents / final_ln (outside blocks) untouched by construction
    q_all = quantize_layer_stack(params)
    assert not is_quantized_leaf(q_all["latents"])
    assert not is_quantized_leaf(q_all["final_ln"]["w"])


def test_quantized_vision_tower_fidelity_and_a8():
    """int8 vision layers through vision_forward: close to dense; w8a8
    (a8=True, >=16 patches) engages — output changes but stays faithful."""
    from licv_vqa_tpu.models.config import VisionConfig
    from licv_vqa_tpu.models.vision import init_vision_params, vision_forward

    cfg = VisionConfig(
        d_model=32, n_layers=2, n_heads=2, d_ff=64, patch_size=14,
        image_size=56, dtype=jnp.float32,
    )
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    qparams = dict(params)
    qparams["layers"] = quantize_layer_stack(params["layers"])
    assert is_quantized_leaf(qparams["layers"]["attn"]["wq"])
    assert not is_quantized_leaf(qparams["layers"]["attn"]["bq"])
    assert not is_quantized_leaf(qparams["layers"]["ln1"]["w"])

    rng = np.random.default_rng(4)
    pixels = jnp.asarray(rng.normal(size=(2, 56, 56, 3)), jnp.float32)

    dense = np.asarray(vision_forward(cfg, params, pixels))
    q = np.asarray(vision_forward(cfg, qparams, pixels))
    a8 = np.asarray(vision_forward(cfg, qparams, pixels, a8=True))
    ref = np.abs(dense).max()
    assert np.abs(q - dense).max() < 0.05 * ref
    assert np.abs(a8 - dense).max() < 0.05 * ref
    assert np.abs(a8 - q).max() > 0  # 16+1 tokens >= gate: a8 engaged
