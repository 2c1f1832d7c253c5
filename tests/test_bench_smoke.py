"""bench.py is the driver's round-scoring entry — a broken bench silently
costs the round its banked numbers.  Smoke both variant kinds end-to-end on
the CPU backend at 1 decoder layer (still the flagship 4096-d tower/embed;
~7 min total, marked slow)."""

import pytest

pytestmark = pytest.mark.slow


def test_bench_variants_smoke():
    import bench

    r = bench.run_eval_shape(n_layers=1, bs=1, quantize=True)
    assert r["unit"] == "questions/s/chip" and r["value"] > 0
    assert r["baseline_estimated"] is True
    assert r["pct_of_hbm_roofline"] > 0
    assert "bind_prefill_ms" in r  # the phase split must survive

    r2 = bench.run(1, quantize=True, bs=1, kv8=True)
    assert r2["unit"] == "tokens/s/chip" and r2["value"] > 0
    assert r2["pct_of_achievable"] > 0


def test_bench_serving_variant_smoke():
    import bench

    r = bench.run_serving(n_layers=1, n_slots=2, quantize=True, kv8=True)
    assert r["unit"] == "tokens/s/chip" and r["value"] > 0
    assert r["merged_admits"] > 0  # the chunked-prefill program really ran
    assert r["static_batch_tokens_per_sec"] > 0
    assert r["pct_of_achievable"] > 0
