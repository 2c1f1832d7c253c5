"""Continuous-batching serving engine vs per-request greedy decode
(core engine + beam engine; merged-admission/fused/online tests live
in test_serving_merged.py — split for xdist loadscope worker memory).

Reference decode settings context: /root/reference/inference.py:300-321
(per-batch HF generate)."""

from tests.serving_common import *  # noqa: F401,F403
from tests.serving_common import (
    SETUPS, EOS, PAD, _idefics_setup, _make_requests,
    _reference_tokens,
)

@pytest.mark.parametrize("family", sorted(SETUPS))
def test_engine_matches_greedy(family):
    """6 mixed requests through 3 slots (forced slot reuse + mixed buckets +
    grouped admission) emit token-for-token what per-request greedy does."""
    cfg, params, bind, (prefill, decode, axes) = SETUPS[family]()
    rng = np.random.default_rng(7)
    reqs = _make_requests(cfg, rng, 6)

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=3, out_cap=8, prompt_buckets=(8, 16),
        sync_steps=2, admit_sizes=(2, 1),
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()

    assert set(got) == {r.uid for r in reqs}
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, None)
        np.testing.assert_array_equal(
            got[r.uid], want, err_msg=f"{family}:{r.uid}"
        )


def test_engine_with_icv_and_min_new():
    """ICV steering + min_new EOS suppression flow through the engine
    identically to greedy_generate."""
    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    rng = np.random.default_rng(3)
    reqs = _make_requests(cfg, rng, 4, min_new=2)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1,
        jnp.float32,
    )

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=2, out_cap=8, prompt_buckets=(16,),
        sync_steps=3, admit_sizes=(2, 1), icv_scaled=icv,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, icv)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=r.uid)


def test_engine_int8_cache_and_weights():
    """Quantized weights + int8 KV cache serve through the engine; parity
    against greedy on the SAME quantized setup (int8 cache quantization is
    deterministic, so token streams still match exactly)."""
    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
        make_idefics_serving_fns,
    )
    from licv_vqa_tpu.ops.quantize import quantize_layer_stack

    cfg = IdeficsConfig.tiny()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, kv_cache_dtype="int8")
    )
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    params["layers"] = quantize_layer_stack(params["layers"])
    _, bind = make_idefics_forward_fns(cfg, eos_token_id=EOS)
    prefill, decode, axes = make_idefics_serving_fns(cfg, eos_token_id=EOS)

    rng = np.random.default_rng(11)
    reqs = _make_requests(cfg, rng, 3)
    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=2, out_cap=8, prompt_buckets=(16,), sync_steps=2,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, None)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=r.uid)


def _reference_beam_tokens(cfg, bind, params, req, icv, num_beams, lp=0.0):
    """Per-request (bs=1, unpadded) beam_generate through the family's bind
    closure, trimmed at EOS inclusive — the engine's output contract."""
    ids = jnp.asarray(req.input_ids[None])
    mask = jnp.ones_like(ids)
    pixels = jnp.asarray(req.pixel_values[None])
    pv = jnp.ones((1, pixels.shape[1]), bool)
    fwd = bind(
        params, pixels, pv, ids, icv, int(ids.shape[1]) + req.max_new + 1
    )
    out = np.asarray(
        beam_generate(
            fwd, ids, mask,
            max_new_tokens=req.max_new,
            eos_token_id=EOS,
            pad_token_id=PAD,
            num_beams=num_beams,
            length_penalty=lp,
            min_new_tokens=req.min_new,
        )
    )[0]
    gen = out[len(req.input_ids) :]
    eos_hits = np.nonzero(gen == EOS)[0]
    return gen[: eos_hits[0] + 1] if len(eos_hits) else gen


@pytest.mark.parametrize("family", sorted(SETUPS))
def test_beam_engine_matches_beam_generate(family):
    """Beam-3 continuous batching (the reference's default eval decode,
    config/inference.yaml:26-30): 5 mixed requests through 2 request
    groups (forced group reuse + mixed buckets) return EXACTLY the best
    hypothesis per-request beam_generate returns."""
    cfg, params, bind, (prefill, decode, axes) = SETUPS[family]()
    rng = np.random.default_rng(17)
    reqs = _make_requests(cfg, rng, 5)

    engine = BeamServingEngine(
        prefill, decode, axes, cfg.text, params,
        num_beams=3, eos_token_id=EOS, pad_token_id=PAD,
        n_slots=2, out_cap=8, prompt_buckets=(8, 16),
        sync_steps=2, admit_sizes=(2, 1),
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()

    assert set(got) == {r.uid for r in reqs}
    for r in reqs:
        want = _reference_beam_tokens(cfg, bind, params, r, None, 3)
        np.testing.assert_array_equal(
            got[r.uid], want, err_msg=f"{family}:{r.uid}"
        )


@pytest.mark.parametrize("lp", [0.0, -0.5, 1.0])
def test_beam_engine_icv_min_new_length_penalty(lp):
    """ICV steering + min_new EOS suppression + all length-penalty
    regimes (lp<=0: early-release path live — the bound holds for any
    lp<=0 since per-step logprobs are <=0 and len**lp in (0,1] only lowers
    penalized scores; lp=1: groups run the full max_new) match per-request
    beam_generate."""
    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    rng = np.random.default_rng(23)
    reqs = _make_requests(cfg, rng, 4, min_new=2)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1,
        jnp.float32,
    )

    engine = BeamServingEngine(
        prefill, decode, axes, cfg.text, params,
        num_beams=2, length_penalty=lp,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=2, out_cap=8, prompt_buckets=(16,),
        sync_steps=3, icv_scaled=icv,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()
    for r in reqs:
        want = _reference_beam_tokens(cfg, bind, params, r, icv, 2, lp=lp)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=str(r.uid))


def test_beam_engine_int8_cache_and_weights():
    """Beam groups over quantized weights + int8 KV cache (the flagship
    serving build): tail-only parent gathers permute {"q","s"} planes."""
    import dataclasses as dc

    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
        make_idefics_serving_fns,
    )
    from licv_vqa_tpu.ops.quantize import quantize_layer_stack

    cfg = IdeficsConfig.tiny()
    cfg = dc.replace(
        cfg, text=dc.replace(cfg.text, kv_cache_dtype="int8")
    )
    params = init_idefics_params(jax.random.PRNGKey(0), cfg)
    params["layers"] = quantize_layer_stack(params["layers"])
    _, bind = make_idefics_forward_fns(cfg, eos_token_id=EOS)
    prefill, decode, axes = make_idefics_serving_fns(cfg, eos_token_id=EOS)

    rng = np.random.default_rng(29)
    reqs = _make_requests(cfg, rng, 3)
    engine = BeamServingEngine(
        prefill, decode, axes, cfg.text, params,
        num_beams=3, eos_token_id=EOS, pad_token_id=PAD,
        n_slots=1, out_cap=8, prompt_buckets=(16,), sync_steps=2,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()
    for r in reqs:
        want = _reference_beam_tokens(cfg, bind, params, r, None, 3)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=str(r.uid))


def test_beam_engine_guards():
    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    with pytest.raises(ValueError, match="num_beams"):
        BeamServingEngine(
            prefill, decode, axes, cfg.text, params,
            num_beams=1, eos_token_id=EOS, pad_token_id=PAD,
        )
    engine = BeamServingEngine(
        prefill, decode, axes, cfg.text, params,
        num_beams=2, eos_token_id=EOS, pad_token_id=PAD, n_slots=1,
        prompt_buckets=(8,), out_cap=4,
    )
    with pytest.raises(NotImplementedError, match="greedy-only"):
        engine.run_fused()


@pytest.mark.parametrize("family", ["idefics", "idefics2"])
def test_engine_fused_matches_greedy(family):
    """run_fused — the whole scheduler inside ONE lax.while_loop (admission
    via traced slot index + on-device release/refill) — emits exactly what
    per-request greedy does, including slot reuse (6 requests, 3 slots)."""
    cfg, params, bind, (prefill, decode, axes) = SETUPS[family]()
    rng = np.random.default_rng(13)
    reqs = _make_requests(cfg, rng, 6, min_new=1)

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=3, out_cap=8, prompt_buckets=(16,),
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run_fused()

    assert set(got) == {r.uid for r in reqs}
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, None)
        np.testing.assert_array_equal(
            got[r.uid], want, err_msg=f"{family}:{r.uid}"
        )


def test_engine_streaming_callback_and_followup_submission():
    """on_complete streams results as slots finish, and a callback may
    submit follow-up work mid-flight (online serving): follow-ups admit
    into freed slots and their tokens still match per-request greedy."""
    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    rng = np.random.default_rng(21)
    first = _make_requests(cfg, rng, 3)
    followups = {r.uid: f for r, f in zip(first, _make_requests(cfg, rng, 3))}
    for r in first:
        followups[r.uid].uid = f"follow-{r.uid}"

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=2, out_cap=8, prompt_buckets=(16,), sync_steps=2,
    )
    streamed = {}

    def on_complete(uid, toks):
        streamed[uid] = toks
        if uid in followups:  # online follow-up submission
            engine.submit(followups[uid])

    for r in first:
        engine.submit(r)
    got = engine.run(on_complete=on_complete)

    assert streamed.keys() == got.keys()
    all_reqs = first + list(followups.values())
    assert set(got) == {r.uid for r in all_reqs}
    for r in all_reqs:
        want = _reference_tokens(cfg, bind, params, r, None)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=str(r.uid))


def test_engine_dp_mesh_matches_single_device():
    """The slot pool shards over the mesh's dp axis (multi-chip serving):
    results are identical to the unsharded engine (f32 tiny model — batch
    sharding never changes per-row math)."""
    from jax.sharding import Mesh

    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    rng = np.random.default_rng(9)
    reqs = _make_requests(cfg, rng, 6)

    def run(mesh):
        engine = ServingEngine(
            prefill, decode, axes, cfg.text, params,
            eos_token_id=EOS, pad_token_id=PAD,
            n_slots=4, out_cap=8, prompt_buckets=(16,),
            sync_steps=2, admit_sizes=(2, 1), mesh=mesh,
        )
        for r in reqs:
            engine.submit(r)
        return engine.run()

    base = run(None)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("dp",))
    sharded = run(mesh)
    assert set(base) == set(sharded)
    for uid in base:
        np.testing.assert_array_equal(sharded[uid], base[uid], err_msg=uid)


@pytest.mark.parametrize("layout", ["dp2", "tp2", "dp2tp2"])
def test_beam_engine_mesh_matches_single_device(layout):
    """Multi-chip BEAM serving (the decode mode the reference actually
    evaluates with — config/inference.yaml:26-30): the group pool shards
    over dp (whole groups per chip) and/or the frozen weights Megatron-
    shard over tp (parallel/sharding.py param_specs — the path a bf16 9B
    model needs to fit two 16 GB chips); results are identical to the
    unsharded beam engine."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from licv_vqa_tpu.parallel.sharding import param_specs

    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    rng = np.random.default_rng(31)
    reqs = _make_requests(cfg, rng, 6)

    def run(mesh, p):
        engine = BeamServingEngine(
            prefill, decode, axes, cfg.text, p,
            num_beams=3, eos_token_id=EOS, pad_token_id=PAD,
            n_slots=2, out_cap=8, prompt_buckets=(8, 16),
            sync_steps=2, admit_sizes=(2, 1), mesh=mesh,
        )
        for r in reqs:
            engine.submit(r)
        return engine.run()

    base = run(None, params)
    dp, tp = {"dp2": (2, 1), "tp2": (1, 2), "dp2tp2": (2, 2)}[layout]
    mesh = Mesh(
        np.array(jax.devices()[: dp * tp]).reshape(dp, tp), ("dp", "tp")
    )
    if tp > 1:  # the static path's weight layout (_replicate_bundle_params)
        sharded_params = jax.device_put(
            params,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s), param_specs(params),
                is_leaf=lambda x: isinstance(x, P),
            ),
        )
    else:
        sharded_params = jax.device_put(params, NamedSharding(mesh, P()))
    sharded = run(mesh, sharded_params)
    assert set(base) == set(sharded)
    for uid in base:
        np.testing.assert_array_equal(sharded[uid], base[uid], err_msg=str(uid))


def test_engine_from_bundle():
    """Bundle-level construction: synthetic idefics bundle, uint8 pixels
    normalized on device — engine tokens match the bundle's own greedy
    runner path on the same prompts."""
    from licv_vqa_tpu.models.registry import build_model
    from licv_vqa_tpu.utils.config import compose

    cfg_top = compose("config", "inference", ["lmm=tiny-idefics"])
    bundle = build_model(cfg_top)
    cfg = bundle.model_cfg
    rng = np.random.default_rng(5)
    isz = cfg.vision.image_size
    reqs = []
    for i in range(3):
        s = int(rng.integers(5, 10))
        ids = rng.integers(3, cfg.text.vocab_size, size=(s,)).astype(np.int32)
        ids[1] = cfg.image_token_id
        pixels = rng.integers(0, 256, size=(1, isz, isz, 3)).astype(np.uint8)
        reqs.append(
            Request(uid=i, input_ids=ids, pixel_values=pixels, max_new=4)
        )

    engine = ServingEngine.from_bundle(
        bundle, n_slots=2, out_cap=4, prompt_buckets=(16,), sync_steps=2
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()

    for r in reqs:
        ids = jnp.asarray(r.input_ids[None])
        fwd = bundle.bind_decode(
            bundle.params,
            jnp.asarray(r.pixel_values[None]),
            jnp.ones((1, 1), bool),
            ids,
            None,
            int(ids.shape[1]) + r.max_new + 1,
        )
        out = np.asarray(
            greedy_generate(
                fwd, ids, jnp.ones_like(ids),
                max_new_tokens=r.max_new, eos_token_id=bundle.eos_token_id,
                pad_token_id=bundle.pad_token_id,
            )
        )[0]
        gen = out[len(r.input_ids):]
        hits = np.nonzero(gen == bundle.eos_token_id)[0]
        want = gen[: hits[0] + 1] if len(hits) else gen
        np.testing.assert_array_equal(got[r.uid], want, err_msg=str(r.uid))


def test_engine_mixed_image_counts():
    """Mixed image-count requests (the ICL few_shot_list sweep shape: k+1
    images per request) through max_images-wide media buffers: narrow
    groups zero-pad at the media scatter, and every request still emits
    token-for-token what per-request greedy does at its TRUE image count
    (padded latents/xattn-KV are never attended — pixel_valid masks them)."""
    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    rng = np.random.default_rng(11)
    isz, vocab = cfg.vision.image_size, cfg.text.vocab_size
    reqs = []
    for i in range(5):
        n_img = 1 + (i % 3)  # 1, 2, 3 images
        s = int(rng.integers(6, 13))
        ids = rng.integers(3, vocab, size=(s,)).astype(np.int32)
        for j in range(n_img):
            ids[1 + 2 * j] = cfg.image_token_id
        pixels = rng.normal(size=(n_img, isz, isz, 3)).astype(np.float32)
        reqs.append(
            Request(
                uid=f"m{i}", input_ids=ids, pixel_values=pixels,
                max_new=int(rng.integers(2, 6)),
            )
        )

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=3, out_cap=8, prompt_buckets=(16,),
        sync_steps=2, admit_sizes=(2, 1), max_images=3,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()

    assert set(got) == {r.uid for r in reqs}
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, None)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=r.uid)

    # a request wider than the buffers is rejected up front
    wide = Request(
        uid="wide",
        input_ids=np.asarray([3, cfg.image_token_id, 4], np.int32),
        pixel_values=rng.normal(size=(4, isz, isz, 3)).astype(np.float32),
        max_new=2,
    )
    with pytest.raises(ValueError, match="max_images"):
        engine.submit(wide)


def test_engine_navit_variable_resolution():
    """NaViT variable-resolution serving (idefics2): per-request
    pixel_attention_mask rides the engine (shape-homogeneous admission
    groups), token-identical to the static bind path with the same mask.
    VERDICT r3 item 5: the continuous route no longer refuses NaViT."""
    import dataclasses as dc

    from licv_vqa_tpu.data.processor import ImageTransform, PromptProcessor
    from licv_vqa_tpu.data.tokenizer import WhitespaceTokenizer
    from licv_vqa_tpu.models.idefics2 import (
        Idefics2Config,
        init_idefics2_params,
        make_idefics2_forward_fns,
    )
    from licv_vqa_tpu.models.registry import ModelBundle

    cfg = Idefics2Config.tiny()
    cfg = dc.replace(cfg, vision=dc.replace(cfg.vision, image_size=56))
    params = init_idefics2_params(jax.random.PRNGKey(0), cfg)
    tok = WhitespaceTokenizer()
    proc = PromptProcessor(
        tok,
        ImageTransform(56, variable_resolution=True, min_edge=28, max_edge=56),
        family="idefics2",
        image_seq_len=cfg.image_seq_len,
    )
    cfg = dc.replace(cfg, image_token_id=proc.image_token_id)
    tf, bind = make_idefics2_forward_fns(cfg, tok.eos_token_id)
    bundle = ModelBundle(
        name="idefics2-tiny-navit", model_cfg=cfg, params=params,
        tokenizer=tok, processor=proc, train_forward=tf, bind_decode=bind,
        hidden_size=cfg.text.d_model, n_layers=cfg.text.n_layers,
    )

    rng = np.random.default_rng(2)
    shapes = [(56, 28), (28, 56), (56, 56), (28, 28)]
    prompts = [
        [rng.integers(0, 255, size=sh + (3,)).astype(np.uint8), f"query {i}"]
        for i, sh in enumerate(shapes)
    ]
    reqs = []
    for i, p in enumerate(prompts):
        enc = proc.prepare_input([p], padding=True, padding_side="left")
        m = np.asarray(enc["attention_mask"][0], bool)
        reqs.append(
            Request(
                uid=i,
                input_ids=np.asarray(enc["input_ids"][0])[m],
                pixel_values=np.asarray(enc["pixel_values"][0]),
                pixel_valid=np.asarray(enc["pixel_valid"][0], bool),
                max_new=4,
                pixel_attention_mask=np.asarray(
                    enc["pixel_attention_mask"][0]
                ),
            )
        )

    engine = ServingEngine.from_bundle(
        bundle, n_slots=2, out_cap=4, prompt_buckets=(32,), sync_steps=2
    )
    assert engine.supports_pixel_attention_mask
    for r in reqs:
        engine.submit(r)
    got = engine.run()

    from licv_vqa_tpu.infer.runner import generate_answers, make_generate_fn

    gen_fn = make_generate_fn(bundle, {"max_new_tokens": 4, "num_beams": 1})
    for i, p in enumerate(prompts):
        want = generate_answers(bundle, gen_fn, [p], None)[0]
        text = tok.batch_decode([got[i]], skip_special_tokens=True)[0]
        assert text == want, (i, text, want)


def test_engine_rejects_pam_for_unsupporting_family():
    cfg, params, _, (prefill, decode, axes) = _idefics_setup()
    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD, n_slots=2, out_cap=4,
        prompt_buckets=(16,),
    )
    isz = cfg.vision.image_size
    r = Request(
        uid=0,
        input_ids=np.asarray([3, cfg.image_token_id, 4], np.int32),
        pixel_values=np.zeros((1, isz, isz, 3), np.float32),
        max_new=2,
        pixel_attention_mask=np.ones((1, isz, isz), np.int32),
    )
    with pytest.raises(ValueError, match="pixel_attention_mask"):
        engine.submit(r)




def test_engine_release_pool_roundtrip():
    """release_pool drops the device buffers but keeps compiled programs;
    a subsequent run re-allocates and still matches per-request greedy."""
    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    rng = np.random.default_rng(31)
    reqs = _make_requests(cfg, rng, 3)

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=2, out_cap=8, prompt_buckets=(16,),
    )
    for r in reqs[:2]:
        engine.submit(r)
    got0 = engine.run()
    engine.release_pool()
    assert engine._cache is None and engine._state is None

    for r in reqs:
        engine.submit(r)
    with pytest.raises(RuntimeError, match="queued"):
        engine.release_pool()
    got = engine.run()
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, None)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=r.uid)
    assert set(got0) == {r.uid for r in reqs[:2]}
