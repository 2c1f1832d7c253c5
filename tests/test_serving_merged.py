"""Merged-admission (chunked prefill), fused-loop and online serving
tests — split from test_serving.py for xdist loadscope worker memory
(the fused while_loop programs are the largest XLA:CPU executables in
the suite)."""

from tests.serving_common import *  # noqa: F401,F403
from tests.serving_common import (
    SETUPS, EOS, PAD, _idefics_setup, _make_requests,
    _reference_tokens,
)

def test_engine_merged_admit_matches_greedy():
    """Chunked prefill: admissions ride ONE merged program (pool decode step
    + group prefill with packed decoder projections) — token-for-token equal
    to per-request greedy_generate, with slot reuse forcing mid-flight
    merged admissions (VERDICT r3 item 3; ICV on to cover the packed
    injection path)."""
    from licv_vqa_tpu.models.idefics import make_idefics_merged_admit_fn

    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    merged = make_idefics_merged_admit_fn(cfg, eos_token_id=EOS)
    rng = np.random.default_rng(17)
    reqs = _make_requests(cfg, rng, 7, min_new=1)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1,
        jnp.float32,
    )

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=3, out_cap=8, prompt_buckets=(8, 16),
        sync_steps=2, admit_sizes=(2, 1), icv_scaled=icv,
        merged_admit_fn=merged, merged_admit_in_run=True,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()

    assert engine.merged_admits > 0, "merged program never used"
    assert set(got) == {r.uid for r in reqs}
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, icv)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=r.uid)


@pytest.mark.parametrize("family", ["idefics2", "openflamingo"])
def test_engine_merged_admit_other_families(family):
    """Merged admission (chunked prefill) now covers the WHOLE zoo: idefics2
    (GQA, no pool media) and OpenFlamingo (per-lane ALiBi biases through
    merged_decoder_layer) serve token-for-token equal to per-request greedy
    with mid-flight merged admissions."""
    if family == "idefics2":
        from licv_vqa_tpu.models.idefics2 import (
            make_idefics2_merged_admit_fn as make_merged,
        )
    else:
        from licv_vqa_tpu.models.openflamingo import (
            make_openflamingo_merged_admit_fn as make_merged,
        )

    cfg, params, bind, (prefill, decode, axes) = SETUPS[family]()
    merged = make_merged(cfg, eos_token_id=EOS)
    rng = np.random.default_rng(23)
    reqs = _make_requests(cfg, rng, 7, min_new=1)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1,
        jnp.float32,
    )

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=3, out_cap=8, prompt_buckets=(8, 16),
        sync_steps=2, admit_sizes=(2, 1), icv_scaled=icv,
        merged_admit_fn=merged, merged_admit_in_run=True,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()

    assert engine.merged_admits > 0, "merged program never used"
    assert set(got) == {r.uid for r in reqs}
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, icv)
        np.testing.assert_array_equal(
            got[r.uid], want, err_msg=f"{family}:{r.uid}"
        )


def test_engine_merged_admit_int8_weights_and_cache():
    """Merged admit with int8 weights + int8 KV cache: the packed-projection
    qdots and the int8 round-trip invariant survive the merged program."""
    import dataclasses as dc

    from licv_vqa_tpu.models.idefics import (
        IdeficsConfig,
        init_idefics_params,
        make_idefics_forward_fns,
        make_idefics_merged_admit_fn,
        make_idefics_serving_fns,
    )
    from licv_vqa_tpu.ops.quantize import quantize_layer_stack

    cfg = IdeficsConfig.tiny()
    cfg = dc.replace(cfg, text=dc.replace(cfg.text, kv_cache_dtype="int8"))
    params = init_idefics_params(jax.random.PRNGKey(1), cfg)
    params["layers"] = quantize_layer_stack(params["layers"])
    params["xattn"] = quantize_layer_stack(params["xattn"])
    _, bind = make_idefics_forward_fns(cfg, eos_token_id=EOS)
    prefill, decode, axes = make_idefics_serving_fns(cfg, eos_token_id=EOS)
    merged = make_idefics_merged_admit_fn(cfg, eos_token_id=EOS)

    rng = np.random.default_rng(29)
    reqs = _make_requests(cfg, rng, 5)
    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=2, out_cap=8, prompt_buckets=(16,),
        sync_steps=2, admit_sizes=(2, 1), merged_admit_fn=merged,
        merged_admit_in_run=True,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run()
    assert engine.merged_admits > 0
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, None)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=r.uid)


def test_engine_run_online_concurrent_submit():
    """True online serving (VERDICT r3 item 6): run_online parks when idle,
    a feeder THREAD submits requests while the loop is live, stop() drains
    and returns.  Tokens equal per-request greedy; arrival/admission/
    first-token/completion clocks are populated and ordered."""
    import threading
    import time as _time

    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    rng = np.random.default_rng(31)
    reqs = _make_requests(cfg, rng, 6)

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=2, out_cap=8, prompt_buckets=(16,),
        sync_steps=2, admit_sizes=(2, 1),
    )
    # pre-warm the compile path with the first request so the feeder's
    # timing isn't dominated by XLA:CPU compiles
    engine.submit(reqs[0])
    engine.run()
    got0 = {reqs[0].uid: None}

    # serve in a thread; feed from THIS thread while the loop is live
    # (submissions race real decode chunks, not the loop startup)
    holder = {}

    def serve():
        holder["got"] = engine.run_online()

    t = threading.Thread(target=serve)
    t.start()
    while engine._clock_t0 is None:  # wait for the online clock
        _time.sleep(0.001)
    for r in reqs[1:]:
        engine.submit(r)
        _time.sleep(0.05)
    # drain politely: stop() means "finish what's submitted, then exit"
    engine.stop()
    t.join(timeout=120)
    assert not t.is_alive(), "run_online failed to stop"
    got = holder["got"]

    assert set(got) == {r.uid for r in reqs[1:]}
    for r in reqs[1:]:
        want = _reference_tokens(cfg, bind, params, r, None)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=r.uid)
        uid = r.uid
        assert uid in engine.arrival_s and uid in engine.admission_s, uid
        assert uid in engine.completion_s, uid
        assert engine.arrival_s[uid] <= engine.admission_s[uid] + 1e-9
        assert engine.admission_s[uid] <= engine.completion_s[uid]
        if uid in engine.first_token_s:
            assert engine.first_token_s[uid] <= engine.completion_s[uid]
    del got0


def test_engine_fused_merged_matches_greedy():
    """run_fused with MERGED admission: the while_loop's admit branch also
    advances the pool one lockstep step (chunked prefill on-device, zero
    host involvement) — token-for-token equal to per-request greedy with
    slot reuse and ICV."""
    from licv_vqa_tpu.models.idefics import make_idefics_merged_admit_fn

    cfg, params, bind, (prefill, decode, axes) = _idefics_setup()
    merged = make_idefics_merged_admit_fn(cfg, eos_token_id=EOS)
    rng = np.random.default_rng(47)
    reqs = _make_requests(cfg, rng, 6, min_new=1)
    icv = jnp.asarray(
        rng.normal(size=(cfg.text.n_layers, cfg.text.d_model)) * 0.1,
        jnp.float32,
    )

    engine = ServingEngine(
        prefill, decode, axes, cfg.text, params,
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=3, out_cap=8, prompt_buckets=(16,),
        admit_sizes=(2, 1), icv_scaled=icv, merged_admit_fn=merged,
    )
    for r in reqs:
        engine.submit(r)
    got = engine.run_fused()

    assert set(got) == {r.uid for r in reqs}
    for r in reqs:
        want = _reference_tokens(cfg, bind, params, r, icv)
        np.testing.assert_array_equal(got[r.uid], want, err_msg=r.uid)
