"""OpenFlamingo family tests: MPT backbone numerical parity vs HF
MptForCausalLM (ALiBi, fused QKV, bias-free LN) + structural/decode tests for
the flamingo assembly (open_flamingo is not installed — SURVEY.md notes the
model is config-present but absent from the reference's README recipes)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from licv_vqa_tpu.models import DecoderConfig, causal_lm_forward
from licv_vqa_tpu.models.convert import convert_mpt, hf_state_dict
from licv_vqa_tpu.models.openflamingo import (
    OpenFlamingoConfig,
    encode_media,
    init_openflamingo_params,
    make_openflamingo_forward_fns,
    openflamingo_forward,
)
from licv_vqa_tpu.models.idefics import image_attention_onehot

V, D, LAYERS, HEADS = 97, 64, 4, 4


def _tiny_hf_mpt():
    from transformers import MptForCausalLM
    from transformers.models.mpt.configuration_mpt import MptConfig

    cfg = MptConfig(
        vocab_size=V,
        d_model=D,
        n_heads=HEADS,
        n_layers=LAYERS,
        expansion_ratio=4,
        layer_norm_epsilon=1e-5,
        attn_config={"attn_impl": "eager", "alibi": True},
        no_bias=True,  # real MPT-7B is fully bias-free
    )
    torch.manual_seed(0)
    return MptForCausalLM(cfg).eval()


def _mpt_cfg():
    return DecoderConfig(
        vocab_size=V,
        d_model=D,
        n_layers=LAYERS,
        n_heads=HEADS,
        n_kv_heads=HEADS,
        d_ff=4 * D,
        norm_eps=1e-5,
        positional="alibi",
        norm_type="layernorm",
        activation="gelu",
        tie_embeddings=True,
        dtype=jnp.float32,
    )


def test_mpt_logits_parity():
    hf = _tiny_hf_mpt()
    cfg = _mpt_cfg()
    params = convert_mpt(hf_state_dict(hf), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, V, size=(2, 11)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 8:] = 0
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    got, _ = causal_lm_forward(cfg, params, jnp.asarray(ids), jnp.asarray(mask))
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], want[valid], rtol=3e-4, atol=3e-4)


def test_flamingo_forward_and_gates():
    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 120, size=(2, 10)).astype(np.int32)
    ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(2, 1, 28, 28, 3)).astype(np.float32)

    latents = encode_media(cfg, params, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
    logits, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
    )
    assert logits.shape == (2, 10, cfg.text.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))

    # gates init at 0 → cross-attention must be a no-op vs a text-only pass
    text_cfg = cfg.text
    text_params = {
        "embed": params["embed"],
        "layers": params["layers"],
        "final_norm": params["final_norm"],
        "final_norm_b": params["final_norm_b"],
    }
    text_logits, _ = causal_lm_forward(
        text_cfg, text_params, jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(text_logits), rtol=1e-4, atol=1e-4
    )

    # open the gates → output must change
    params["xattn"]["attn_gate"] = jnp.ones_like(params["xattn"]["attn_gate"])
    latents2 = encode_media(cfg, params, jnp.asarray(pixels))
    steered, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents2, onehot
    )
    assert not np.allclose(np.asarray(steered), np.asarray(logits), atol=1e-4)


def test_flamingo_decode_cache_consistency():
    from licv_vqa_tpu.infer import greedy_generate

    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    params["xattn"]["attn_gate"] = jnp.full_like(params["xattn"]["attn_gate"], 0.5)
    rng = np.random.default_rng(2)
    ids = rng.integers(3, 120, size=(2, 8)).astype(np.int32)
    ids[:, 0] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(2, 1, 28, 28, 3)).astype(np.float32)

    _, bind = make_openflamingo_forward_fns(cfg, eos_token_id=2)
    fwd = bind(params, jnp.asarray(pixels), jnp.ones((2, 1), bool), jnp.asarray(ids), None, 24)
    out = greedy_generate(
        fwd, jnp.asarray(ids), jnp.asarray(mask),
        max_new_tokens=4, eos_token_id=-1, pad_token_id=0,
    )
    # decode-with-cache must match argmax of the full uncached forward
    out = np.asarray(out)
    latents = encode_media(cfg, params, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(out[:, :9]), cfg.image_token_id, 2, 1)
    full, _ = openflamingo_forward(
        cfg, params, jnp.asarray(out[:, :9]), jnp.ones((2, 9), jnp.int32),
        latents, onehot,
    )
    next_tok = np.argmax(np.asarray(full[:, 8]), axis=-1)
    np.testing.assert_array_equal(next_tok, out[:, 9])


def test_icv_injection_flamingo():
    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 120, size=(1, 6)).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 1, 28, 28, 3)).astype(np.float32)
    latents = encode_media(cfg, params, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
    base, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
    )
    icv = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    steered, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot,
        icv_scaled=icv,
    )
    assert not np.allclose(np.asarray(base), np.asarray(steered), atol=1e-3)


# ---------------------------------------------------------------------------
# open_flamingo checkpoint converter (VERDICT r1 #6): torch mini-modules
# re-deriving the PUBLIC open_flamingo architecture (PerceiverResampler /
# GatedCrossAttentionBlock) generate state dicts in the real checkpoint
# naming; the converter must reproduce their outputs numerically.
# ---------------------------------------------------------------------------


class _TorchPerceiverAttention(torch.nn.Module):
    def __init__(self, dim, dim_head, heads):
        super().__init__()
        self.scale = dim_head ** -0.5
        self.heads = heads
        inner = dim_head * heads
        self.norm_media = torch.nn.LayerNorm(dim)
        self.norm_latents = torch.nn.LayerNorm(dim)
        self.to_q = torch.nn.Linear(dim, inner, bias=False)
        self.to_kv = torch.nn.Linear(dim, inner * 2, bias=False)
        self.to_out = torch.nn.Linear(inner, dim, bias=False)

    def forward(self, x, latents):
        x = self.norm_media(x)
        latents = self.norm_latents(latents)
        h = self.heads
        q = self.to_q(latents)
        kv = self.to_kv(torch.cat((x, latents), dim=-2))
        k, v = kv.chunk(2, dim=-1)

        def split(t):
            b, n, _ = t.shape
            return t.view(b, n, h, -1).transpose(1, 2)  # (b, h, n, d)

        q, k, v = split(q), split(k), split(v)
        sim = (q * self.scale) @ k.transpose(-1, -2)
        attn = (sim - sim.amax(dim=-1, keepdim=True)).softmax(dim=-1)
        out = attn @ v
        out = out.transpose(1, 2).reshape(q.shape[0], q.shape[2], -1)
        return self.to_out(out)


def _torch_ff(dim, mult):
    return torch.nn.Sequential(
        torch.nn.LayerNorm(dim),
        torch.nn.Linear(dim, dim * mult, bias=False),
        torch.nn.GELU(),
        torch.nn.Linear(dim * mult, dim, bias=False),
    )


class _TorchPerceiverResampler(torch.nn.Module):
    def __init__(self, dim, depth, dim_head, heads, num_latents, ff_mult):
        super().__init__()
        self.latents = torch.nn.Parameter(torch.randn(num_latents, dim))
        self.layers = torch.nn.ModuleList(
            torch.nn.ModuleList(
                [_TorchPerceiverAttention(dim, dim_head, heads), _torch_ff(dim, ff_mult)]
            )
            for _ in range(depth)
        )
        self.norm = torch.nn.LayerNorm(dim)

    def forward(self, x):  # x: (b, n, d) — single image, T=F=1
        latents = self.latents.unsqueeze(0).expand(x.shape[0], -1, -1)
        for attn, ff in self.layers:
            latents = attn(x, latents) + latents
            latents = ff(latents) + latents
        return self.norm(latents)


class _TorchGatedXattnBlock(torch.nn.Module):
    class _Attn(torch.nn.Module):
        def __init__(self, dim, dim_visual, dim_head, heads):
            super().__init__()
            self.scale = dim_head ** -0.5
            self.heads = heads
            inner = dim_head * heads
            self.norm = torch.nn.LayerNorm(dim)
            self.to_q = torch.nn.Linear(dim, inner, bias=False)
            self.to_kv = torch.nn.Linear(dim_visual, inner * 2, bias=False)
            self.to_out = torch.nn.Linear(inner, dim, bias=False)

        def forward(self, x, media):
            x = self.norm(x)
            h = self.heads
            q = self.to_q(x)
            k, v = self.to_kv(media).chunk(2, dim=-1)

            def split(t):
                b, n, _ = t.shape
                return t.view(b, n, h, -1).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            sim = (q * self.scale) @ k.transpose(-1, -2)
            attn = (sim - sim.amax(dim=-1, keepdim=True)).softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(x.shape[0], x.shape[1], -1)
            return self.to_out(out)

    def __init__(self, dim, dim_visual, dim_head, heads, ff_mult):
        super().__init__()
        self.attn = self._Attn(dim, dim_visual, dim_head, heads)
        self.attn_gate = torch.nn.Parameter(torch.randn(1))
        self.ff = _torch_ff(dim, ff_mult)
        self.ff_gate = torch.nn.Parameter(torch.randn(1))

    def forward(self, x, media):
        x = self.attn(x, media) * self.attn_gate.tanh() + x
        x = self.ff(x) * self.ff_gate.tanh() + x
        return x


def test_flamingo_perceiver_converter_parity():
    from licv_vqa_tpu.models.convert import convert_flamingo_perceiver
    from licv_vqa_tpu.models.perceiver import perceiver_forward

    cfg = OpenFlamingoConfig.tiny()
    pc = cfg.perceiver
    torch.manual_seed(0)
    res = _TorchPerceiverResampler(
        dim=pc.d_model, depth=pc.n_layers, dim_head=pc.head_dim,
        heads=pc.n_heads, num_latents=pc.n_latents,
        ff_mult=pc.d_ff // pc.d_model,
    ).eval()
    sd = {f"perceiver.{k}": v for k, v in res.state_dict().items()}
    params = convert_flamingo_perceiver(sd, pc.n_layers)
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float32), params)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, pc.d_model)).astype(np.float32)
    with torch.no_grad():
        want = res(torch.tensor(x)).numpy()
    got = np.asarray(perceiver_forward(pc, params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flamingo_gated_xattn_converter_parity():
    from licv_vqa_tpu.models.convert import convert_flamingo_xattn
    from licv_vqa_tpu.models.openflamingo import flamingo_xattn_block

    cfg = OpenFlamingoConfig.tiny()
    d, de = cfg.text.d_model, cfg.perceiver.d_model
    torch.manual_seed(1)
    blocks = [
        _TorchGatedXattnBlock(
            d, de, cfg.xattn_head_dim, cfg.xattn_heads, cfg.xattn_ff_mult
        ).eval()
        for _ in range(2)
    ]
    sd = {}
    for i, b in enumerate(blocks):
        for k, v in b.state_dict().items():
            sd[f"lang_encoder.gated_cross_attn_layers.{i}.{k}"] = v
    stacked = convert_flamingo_xattn(sd, 2)
    stacked = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float32), stacked)

    rng = np.random.default_rng(1)
    h = rng.normal(size=(2, 6, d)).astype(np.float32)
    media = rng.normal(size=(2, 4, de)).astype(np.float32)
    full_mask = jnp.ones((2, 1, 6, 4), bool)  # every token attends all media
    gate = jnp.ones((2, 6), jnp.float32)
    for g, blk in enumerate(blocks):
        p_g = jax.tree.map(lambda x: x[g], stacked)
        with torch.no_grad():
            want = blk(torch.tensor(h), torch.tensor(media)).numpy()
        got = np.asarray(
            flamingo_xattn_block(cfg, p_g, jnp.asarray(h), jnp.asarray(media),
                                 full_mask, gate)
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_openflamingo_checkpoint_merge_structural():
    """checkpoint.pt-shaped state dict (module.-prefixed deltas: perceiver,
    gated xattn, resized wte) merges into an initialized pytree and the full
    forward runs (reference: utils.py:51-67)."""
    from licv_vqa_tpu.models.convert import convert_openflamingo_checkpoint

    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    pc = cfg.perceiver
    torch.manual_seed(2)
    res = _TorchPerceiverResampler(
        dim=pc.d_model, depth=pc.n_layers, dim_head=pc.head_dim,
        heads=pc.n_heads, num_latents=pc.n_latents,
        ff_mult=pc.d_ff // pc.d_model,
    )
    sd = {f"module.perceiver.{k}": v for k, v in res.state_dict().items()}
    for i in range(2):
        blk = _TorchGatedXattnBlock(
            cfg.text.d_model, pc.d_model, cfg.xattn_head_dim, cfg.xattn_heads,
            cfg.xattn_ff_mult,
        )
        for k, v in blk.state_dict().items():
            sd[f"module.lang_encoder.gated_cross_attn_layers.{i}.{k}"] = v
    wte = torch.randn(cfg.text.vocab_size, cfg.text.d_model)
    sd["module.lang_encoder.transformer.wte.weight"] = wte

    before = np.asarray(params["xattn"]["attn_gate"]).copy()
    merged, updated = convert_openflamingo_checkpoint(sd, cfg, params)
    assert set(updated) == {"perceiver", "xattn", "embed"}
    assert not np.allclose(np.asarray(merged["xattn"]["attn_gate"]), before)
    np.testing.assert_allclose(
        np.asarray(merged["embed"]), wte.numpy(), rtol=1e-6, atol=1e-6
    )
    # the merged model runs end to end
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 120, size=(1, 6)).astype(np.int32)
    ids[:, 0] = cfg.image_token_id
    pixels = rng.normal(size=(1, 1, 28, 28, 3)).astype(np.float32)
    latents = encode_media(cfg, merged, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
    logits, _ = openflamingo_forward(
        cfg, merged, jnp.asarray(ids), jnp.ones((1, 6), jnp.int32), latents, onehot
    )
    assert np.all(np.isfinite(np.asarray(logits)))


def test_openclip_vision_converter_shapes():
    """open_clip VisionTransformer naming (fused in_proj qkv) → our tower:
    structural check on synthetic shapes (ViT-L is the real target,
    reference: utils.py:51-67 loads it via open_clip)."""
    from licv_vqa_tpu.models.convert import convert_openclip_vision
    from licv_vqa_tpu.models.vision import init_vision_params, vision_forward

    cfg = OpenFlamingoConfig.tiny().vision
    d, p, n = cfg.d_model, cfg.patch_size, cfg.n_layers
    g = np.random.default_rng(4)

    def t(*shape):
        return torch.tensor(g.normal(size=shape).astype(np.float32))

    sd = {
        "visual.conv1.weight": t(d, 3, p, p),
        "visual.class_embedding": t(d),
        "visual.positional_embedding": t(cfg.n_patches, d),
        "visual.ln_pre.weight": t(d), "visual.ln_pre.bias": t(d),
        "visual.ln_post.weight": t(d), "visual.ln_post.bias": t(d),
    }
    for i in range(n):
        lp = f"visual.transformer.resblocks.{i}."
        sd[lp + "ln_1.weight"], sd[lp + "ln_1.bias"] = t(d), t(d)
        sd[lp + "ln_2.weight"], sd[lp + "ln_2.bias"] = t(d), t(d)
        sd[lp + "attn.in_proj_weight"] = t(3 * d, d)
        sd[lp + "attn.in_proj_bias"] = t(3 * d)
        sd[lp + "attn.out_proj.weight"] = t(d, d)
        sd[lp + "attn.out_proj.bias"] = t(d)
        sd[lp + "mlp.c_fc.weight"], sd[lp + "mlp.c_fc.bias"] = t(2 * d, d), t(2 * d)
        sd[lp + "mlp.c_proj.weight"], sd[lp + "mlp.c_proj.bias"] = t(d, 2 * d), t(d)

    import dataclasses as _dc
    cfg = _dc.replace(cfg, d_ff=2 * d, use_post_norm=True)
    got = convert_openclip_vision(sd, cfg, "visual.")
    ref = init_vision_params(jax.random.PRNGKey(0), cfg)
    got_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), got)
    ref_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), ref)
    assert got_shapes == ref_shapes
    got = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float32), got)
    out = vision_forward(cfg, got, jnp.asarray(
        g.normal(size=(1, 28, 28, 3)).astype(np.float32)))
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# Independent invariants (VERDICT r2 next #8): evidence that does NOT share
# code with the implementation under test — hard-coded golden data from the
# published ALiBi formulation plus semantic invariants a transcription error
# in the flamingo assembly would break.
# ---------------------------------------------------------------------------


def test_alibi_slopes_match_published_table():
    """Golden slopes from the ALiBi paper (Press et al. 2021, §3): for n a
    power of two, slope_i = 2^(-8i/n); for other n, the slopes of the next
    power of two interleaved (every other, from the first).  Hard-coded —
    independent of ops code."""
    from licv_vqa_tpu.models.layers import alibi_slopes

    golden = {
        4: [2.0**-2, 2.0**-4, 2.0**-6, 2.0**-8],
        8: [2.0**-i for i in range(1, 9)],
        32: [2.0 ** (-i / 4.0) for i in range(1, 33)],
        6: [2.0**-2, 2.0**-4, 2.0**-6, 2.0**-8, 2.0**-1, 2.0**-3],
    }
    for n, want in golden.items():
        np.testing.assert_allclose(
            np.asarray(alibi_slopes(n)), np.asarray(want, np.float32),
            rtol=1e-6, err_msg=f"n_heads={n}",
        )


def test_flamingo_left_padding_offset_invariance():
    """ALiBi's relative bias + padding masks make the flamingo forward
    invariant to left padding: prepending pad columns must not change the
    logits at the real positions (gates OPEN so the xattn path is live)."""
    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    params["xattn"]["attn_gate"] = jnp.full_like(params["xattn"]["attn_gate"], 0.7)
    params["xattn"]["ff_gate"] = jnp.full_like(params["xattn"]["ff_gate"], 0.3)
    rng = np.random.default_rng(5)
    ids = rng.integers(3, 120, size=(2, 9)).astype(np.int32)
    ids[:, 0] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(2, 1, 28, 28, 3)).astype(np.float32)
    latents = encode_media(cfg, params, jnp.asarray(pixels))

    def fwd(ids_, mask_):
        onehot = image_attention_onehot(
            jnp.asarray(ids_), cfg.image_token_id, 2, 1
        )
        lg, _ = openflamingo_forward(
            cfg, params, jnp.asarray(ids_), jnp.asarray(mask_), latents, onehot
        )
        return np.asarray(lg)

    base = fwd(ids, mask)
    pad = 3
    ids_p = np.concatenate([np.zeros((2, pad), np.int32), ids], axis=1)
    mask_p = np.concatenate([np.zeros((2, pad), np.int32), mask], axis=1)
    shifted = fwd(ids_p, mask_p)
    np.testing.assert_allclose(
        shifted[:, pad:], base, rtol=1e-5, atol=1e-5
    )


def test_perceiver_latent_count_scaling():
    """The resampler emits exactly n_latents rows per image regardless of the
    ViT token count, and 2× latents config ⇒ 2× rows (flamingo's fixed
    64-token media interface); latents must depend on the pixels."""
    from licv_vqa_tpu.models.perceiver import (
        init_perceiver_params,
        perceiver_forward,
    )

    cfg = OpenFlamingoConfig.tiny()
    rng = np.random.default_rng(6)
    for n_tokens in (4, 9, 17):
        feats = jnp.asarray(
            rng.normal(size=(2, n_tokens, cfg.perceiver.d_model)).astype(
                np.float32
            )
        )
        p = init_perceiver_params(
            jax.random.PRNGKey(1), cfg.perceiver, qk_layer_norms=False
        )
        out = perceiver_forward(cfg.perceiver, p, feats)
        assert out.shape == (2, cfg.perceiver.n_latents, cfg.perceiver.d_model)

    import dataclasses

    big = dataclasses.replace(cfg.perceiver, n_latents=2 * cfg.perceiver.n_latents)
    p2 = init_perceiver_params(jax.random.PRNGKey(1), big, qk_layer_norms=False)
    feats = jnp.asarray(
        rng.normal(size=(1, 4, big.d_model)).astype(np.float32)
    )
    assert perceiver_forward(big, p2, feats).shape == (1, big.n_latents, big.d_model)

    # content sensitivity: different media features → different latents.
    # (NB an affine shift feats+c is invisible — the resampler LayerNorms
    # the media tokens, so per-token mean/scale are removed by design.)
    a = perceiver_forward(big, p2, feats)
    other = jnp.asarray(rng.normal(size=feats.shape).astype(np.float32))
    b = perceiver_forward(big, p2, other)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gate_zero_mpt_equality_at_every_depth():
    """Gate-zero ⇒ EXACT backbone equality must hold at every depth (a
    placement error — e.g. xattn firing after instead of before the closing
    block, or at the wrong interval — could cancel at one depth but not
    all).  The backbone path is the HF-MptForCausalLM-parity-tested
    causal_lm_forward, so this chains flamingo-at-init to HF."""
    import dataclasses

    for n_layers, every in ((2, 2), (4, 2), (6, 3)):
        cfg = OpenFlamingoConfig.tiny()
        cfg = dataclasses.replace(
            cfg,
            text=dataclasses.replace(cfg.text, n_layers=n_layers),
            cross_attn_every_n_layers=every,
        )
        params = init_openflamingo_params(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(7)
        ids = rng.integers(3, 120, size=(2, 7)).astype(np.int32)
        ids[:, 2] = cfg.image_token_id
        mask = np.ones_like(ids)
        mask[1, :2] = 0  # mixed padding stresses the mask plumbing too
        pixels = rng.normal(size=(2, 1, 28, 28, 3)).astype(np.float32)
        latents = encode_media(cfg, params, jnp.asarray(pixels))
        onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
        lg, _ = openflamingo_forward(
            cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
        )
        text_params = {
            "embed": params["embed"],
            "layers": params["layers"],
            "final_norm": params["final_norm"],
            "final_norm_b": params["final_norm_b"],
        }
        want, _ = causal_lm_forward(
            cfg.text, text_params, jnp.asarray(ids), jnp.asarray(mask)
        )
        valid = mask.astype(bool)
        np.testing.assert_allclose(
            np.asarray(lg)[valid], np.asarray(want)[valid],
            rtol=1e-5, atol=1e-5, err_msg=f"depth {n_layers} every {every}",
        )


def test_no_media_positions_get_zero_xattn():
    """open_flamingo masks text positions with no preceding image out of the
    cross-attention entirely: with NO image token in the prompt, an open
    attn_gate must not change the logits (the media-independent FF branch
    stays gated off)."""
    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(8)
    ids = rng.integers(3, 120, size=(2, 8)).astype(np.int32)  # no image token
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(2, 1, 28, 28, 3)).astype(np.float32)
    latents = encode_media(cfg, params, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)

    base, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
    )
    params["xattn"]["attn_gate"] = jnp.full_like(params["xattn"]["attn_gate"], 2.0)
    open_gate, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
    )
    np.testing.assert_allclose(
        np.asarray(open_gate), np.asarray(base), rtol=1e-5, atol=1e-5
    )
    # sanity: the same open gate DOES matter once an image is present
    ids[:, 0] = cfg.image_token_id
    onehot2 = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)
    with_img, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot2
    )
    params["xattn"]["attn_gate"] = jnp.zeros_like(params["xattn"]["attn_gate"])
    closed, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot2
    )
    assert not np.allclose(np.asarray(with_img), np.asarray(closed), atol=1e-4)


def test_flamingo_w8a8_prefill_fidelity():
    """w8a8 through the flamingo assembly (MPT self-attn qdots, gated-xattn
    q/wo/ff — the media-side wkv stays weight-only at tiny n_lat=4 < the
    token gate): prefill logits stay close to the weight-only path, and a
    below-gate (short) forward is BIT-identical (the static gate never
    fired)."""
    import dataclasses

    from licv_vqa_tpu.models.decoder import W8A8_MIN_TOKENS
    from licv_vqa_tpu.ops.quantize import quantize_layer_stack

    cfg = OpenFlamingoConfig.tiny()
    params = init_openflamingo_params(jax.random.PRNGKey(0), cfg)
    # open the gates so the xattn qdots are load-bearing
    params["xattn"]["attn_gate"] = jnp.ones_like(params["xattn"]["attn_gate"])
    params["xattn"]["ff_gate"] = jnp.ones_like(params["xattn"]["ff_gate"])
    params["layers"] = quantize_layer_stack(params["layers"])
    params["xattn"] = quantize_layer_stack(params["xattn"])
    # quantize_vision equivalent: tower + perceiver blocks (encode_media
    # then runs scale-on-output qdots; at tiny patch/latent counts the a8
    # token gate stays off, which is exactly the production gate semantics)
    params["vision"]["layers"] = quantize_layer_stack(params["vision"]["layers"])
    params["perceiver"]["blocks"] = quantize_layer_stack(
        params["perceiver"]["blocks"]
    )
    cfg_a8 = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, w8a8_prefill=True)
    )

    rng = np.random.default_rng(9)
    s = W8A8_MIN_TOKENS + 4
    ids = rng.integers(3, 120, size=(2, s)).astype(np.int32)
    ids[:, 1] = cfg.image_token_id
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(2, 1, 28, 28, 3)).astype(np.float32)
    latents = encode_media(cfg, params, jnp.asarray(pixels))
    onehot = image_attention_onehot(jnp.asarray(ids), cfg.image_token_id, 2, 1)

    base, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
    )
    a8, _ = openflamingo_forward(
        cfg_a8, params, jnp.asarray(ids), jnp.asarray(mask), latents, onehot
    )
    err = np.abs(np.asarray(a8) - np.asarray(base)).max()
    ref = np.abs(np.asarray(base)).max()
    assert 0 < err < 0.05 * ref, (err, ref)  # engaged, and faithful

    # short block below the token gate: a8 config is bit-inert
    ids_s = ids[:, : W8A8_MIN_TOKENS - 2]
    mask_s = mask[:, : W8A8_MIN_TOKENS - 2]
    onehot_s = image_attention_onehot(
        jnp.asarray(ids_s), cfg.image_token_id, 2, 1
    )
    b_s, _ = openflamingo_forward(
        cfg, params, jnp.asarray(ids_s), jnp.asarray(mask_s), latents, onehot_s
    )
    a_s, _ = openflamingo_forward(
        cfg_a8, params, jnp.asarray(ids_s), jnp.asarray(mask_s), latents,
        onehot_s,
    )
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(b_s))
