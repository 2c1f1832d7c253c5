#!/usr/bin/env python
"""Continuous batching vs static batching on the flagship serving shape.

Workload: requests with ragged generation lengths (the regime real serving
lives in — the reference's eval batches stop at a fixed ``max_new_tokens``,
but mixed workloads don't).  Two arms over the SAME request set, SAME
weights (32L idefics-9B int8 + int8 KV, bench.py's flagship build):

- **static**: FIFO batches of ``n_slots`` through ``greedy_generate``; each
  batch decodes to its own max (rounded up to a 16-step bucket — generous:
  a per-batch-max static server), finished rows burn pad steps.
- **engine**: the continuous-batching ServingEngine — finished slots refill
  from the queue mid-flight.

Token parity caveat (measured, v5e): the engine is BITWISE identical to
the static path at the same batch shape (prefill logits adm=1 vs static
bs=1: maxdiff 0.0), but XLA's kernel choices make bf16 logits
batch-SHAPE-dependent (the same row differs by up to ~1.4 logits between
bs=1 and bs=8 through 32 layers), so greedy argmax can flip between arms —
exactly as it flips for static batching across batch sizes.  With random
weights the top-2 margin (~0.14 here) sits inside that noise, so streams
diverge quickly; real weights have decisive margins most steps.  The bench
therefore counts useful tokens PER ARM and reports the agreement fraction
instead of asserting equality.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EOS, PAD = 2, 0


def make_workload(rng, n_req, bucket, out_cap, uniform=None):
    from licv_vqa_tpu.infer.serving import Request

    reqs = []
    for i in range(n_req):
        # uniform arm (the bs=64 static-comparison protocol): fixed
        # 64-token prompts — also keeps bucket=64 legal, where the ragged
        # draw's range would be empty
        s = 64 if uniform else int(rng.integers(64, bucket - 8))
        ids = rng.integers(3, 32000, size=(s,)).astype(np.int32)
        ids[1] = 32001  # image token (idefics_9b image_token_id — asserted below)
        max_new = uniform or int(rng.integers(8, out_cap + 1))
        pixels = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
        reqs.append(
            Request(uid=i, input_ids=ids, pixel_values=pixels, max_new=max_new)
        )
    return reqs


def make_icl_workload(rng, n_req, shots_list, max_new):
    """The reference's raggedest workload (few_shot_list sweep, reference:
    inference.py:324-378): each request carries k shots + 1 query image and
    a ~35-token-per-shot prompt, with k cycling through ``shots_list`` —
    prompt lengths spread ~(max k)/(min k) across one stream.  Decode is the
    reference's eval setting (fixed ``max_new``)."""
    from licv_vqa_tpu.infer.serving import Request

    reqs = []
    for i in range(n_req):
        k = shots_list[i % len(shots_list)]
        s = 25 + 35 * k + int(rng.integers(0, 20))
        ids = rng.integers(3, 32000, size=(s,)).astype(np.int32)
        for j in range(k + 1):
            ids[2 + j * 35] = 32001
        pixels = rng.normal(size=(k + 1, 224, 224, 3)).astype(np.float32)
        reqs.append(
            Request(uid=i, input_ids=ids, pixel_values=pixels, max_new=max_new)
        )
    # FIFO arrival order interleaves shot counts (the engine exploits this;
    # a static server eats the padding)
    rng.shuffle(reqs)
    return reqs


def _batch_arrays(batch, bucket):
    """LEFT-padded ids/mask + per-batch-max image stacks (mixed image
    counts pad with pixel_valid=False rows — the shipped static path's
    processor does the same per batch)."""
    import jax.numpy as jnp

    n = len(batch)
    n_img = max(r.pixel_values.shape[0] for r in batch)
    hw = batch[0].pixel_values.shape[1:]
    ids = np.full((n, bucket), PAD, np.int32)
    mask = np.zeros((n, bucket), np.int32)
    px = np.zeros((n, n_img) + hw, np.float32)
    pv = np.zeros((n, n_img), bool)
    for j, r in enumerate(batch):
        s = len(r.input_ids)
        ids[j, bucket - s :] = r.input_ids
        mask[j, bucket - s :] = 1
        k = r.pixel_values.shape[0]
        px[j, :k] = r.pixel_values
        pv[j, :k] = True
    return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(px),
            jnp.asarray(pv))


def _batch_bucket(batch, bucket, per_batch_bucket):
    if not per_batch_bucket:
        return bucket
    return -(-max(len(r.input_ids) for r in batch) // 64) * 64


def run_static(cfg, params, bind, reqs, n_slots, bucket,
               per_batch_bucket=False, _jits={}):
    """FIFO batches through the SHIPPED static path: one jit over
    bind+greedy per (max_new, prompt-bucket, image-count) combination
    (make_generate_fn structure); per-batch max_new rounds up to 16
    (generous: a per-batch-max static server).  ``per_batch_bucket`` pads
    prompts to the BATCH max (64-rounded) instead of the global bucket —
    the fair static baseline for mixed-shot ICL workloads."""
    import jax

    from licv_vqa_tpu.infer.decode import greedy_generate

    def gen_for(max_new, bucket_b, n_img):
        key = (max_new, bucket_b, n_img)
        if key not in _jits:

            def gen(params, ids, mask, pixels, pv):
                fwd = bind(params, pixels, pv, ids, None, bucket_b + max_new + 1)
                return greedy_generate(
                    fwd, ids, mask,
                    max_new_tokens=max_new, eos_token_id=EOS, pad_token_id=PAD,
                )

            _jits[key] = jax.jit(gen)
        return _jits[key]

    results, latency = {}, {}
    t0 = time.perf_counter()
    row_steps = 0
    for i in range(0, len(reqs), n_slots):
        batch = reqs[i : i + n_slots]
        real = len(batch)
        batch = batch + [batch[-1]] * (n_slots - real)
        bucket_b = _batch_bucket(batch, bucket, per_batch_bucket)
        ids, mask, pixels, pv = _batch_arrays(batch, bucket_b)
        max_new = -(-max(r.max_new for r in batch) // 16) * 16
        out = np.asarray(
            gen_for(max_new, bucket_b, pixels.shape[1])(
                params, ids, mask, pixels, pv
            )
        )
        row_steps += n_slots * max_new
        batch_done = time.perf_counter() - t0
        for j, r in enumerate(batch[:real]):
            gen = out[j, bucket_b:]
            hits = np.nonzero(gen == EOS)[0]
            cut = min(
                r.max_new, (hits[0] + 1) if len(hits) else max_new
            )
            results[r.uid] = gen[:cut]
            latency[r.uid] = batch_done
    return results, time.perf_counter() - t0, row_steps, latency


def run_static_beam(cfg, params, bind, reqs, n_slots, bucket, num_beams,
                    per_batch_bucket=False, _jits={}):
    """FIFO batches through the SHIPPED static beam path (beam_generate,
    the reference's default eval decode); per-batch max_new rounds up to 8
    on ragged workloads (exact when uniform — matching icv_inference's
    config-driven max_new jit).

    Ragged-workload approximation: the best hypothesis is decoded at the
    batch max_new and then truncated to each request's r.max_new.  Beam
    output is NOT prefix-stable, so a truncated sequence is not a valid
    decode at any setting — the warmup agreement FYI and useful-token
    accounting are exact only on uniform workloads (where no cut happens);
    on ragged ones they are an upper-bound approximation of the static
    path's useful work."""
    import jax
    import jax.numpy as jnp

    from licv_vqa_tpu.infer.decode import beam_generate

    def gen_for(max_new, bucket_b, n_img):
        key = (max_new, bucket_b, n_img)
        if key not in _jits:

            def gen(params, ids, mask, pixels, pv):
                fwd = bind(params, pixels, pv, ids, None, bucket_b + max_new + 1)
                return beam_generate(
                    fwd, ids, mask,
                    max_new_tokens=max_new, eos_token_id=EOS,
                    pad_token_id=PAD, num_beams=num_beams,
                )

            _jits[key] = jax.jit(gen)
        return _jits[key]

    results, latency = {}, {}
    t0 = time.perf_counter()
    row_steps = 0
    for i in range(0, len(reqs), n_slots):
        batch = reqs[i : i + n_slots]
        real = len(batch)
        batch = batch + [batch[-1]] * (n_slots - real)
        bucket_b = _batch_bucket(batch, bucket, per_batch_bucket)
        ids, mask, pixels, pv = _batch_arrays(batch, bucket_b)
        cap = max(r.max_new for r in batch)
        max_new = cap if len({r.max_new for r in batch}) == 1 else -(-cap // 8) * 8
        out = np.asarray(
            gen_for(max_new, bucket_b, pixels.shape[1])(
                params, ids, mask, pixels, pv
            )
        )
        row_steps += n_slots * num_beams * max_new
        batch_done = time.perf_counter() - t0
        for j, r in enumerate(batch[:real]):
            gen = out[j, bucket_b:]
            hits = np.nonzero(gen == EOS)[0]
            cut = min(r.max_new, (hits[0] + 1) if len(hits) else max_new)
            results[r.uid] = gen[:cut]
            latency[r.uid] = batch_done
    return results, time.perf_counter() - t0, row_steps, latency


def make_engine(cfg, params, n_slots, buckets, out_cap, sync_steps,
                num_beams=1, merged=True, max_images=None, harvest_lag=0,
                admit_sizes=(4, 2, 1)):
    from licv_vqa_tpu.infer.serving import BeamServingEngine, ServingEngine
    from licv_vqa_tpu.models.idefics import (
        make_idefics_merged_admit_fn,
        make_idefics_serving_fns,
    )

    prefill, decode, axes = make_idefics_serving_fns(cfg, eos_token_id=EOS)
    kw = dict(
        eos_token_id=EOS, pad_token_id=PAD,
        n_slots=n_slots, out_cap=out_cap, prompt_buckets=tuple(buckets),
        sync_steps=sync_steps, admit_sizes=tuple(admit_sizes),
        max_images=max_images, harvest_lag=harvest_lag,
    )
    if num_beams > 1:
        return BeamServingEngine(
            prefill, decode, axes, cfg.text, params,
            num_beams=num_beams, **kw,
        )
    merged_fn = (
        make_idefics_merged_admit_fn(cfg, eos_token_id=EOS) if merged else None
    )
    return ServingEngine(
        prefill, decode, axes, cfg.text, params,
        merged_admit_fn=merged_fn, merged_admit_in_run=merged, **kw,
    )


def run_engine(engine, reqs, fused=False):
    """One drained workload on a WARM engine (a server reuses its jits —
    building a fresh engine per workload re-traces the whole program and
    dominates the measurement)."""
    for r in reqs:
        engine.submit(r)
    t0 = time.perf_counter()
    got = engine.run_fused() if fused else engine.run()
    return got, time.perf_counter() - t0


def run_arrivals(engine, reqs, qps, rng):
    """Online arm: a feeder thread submits the workload as a POISSON
    arrival process at ``qps`` while ``run_online`` serves; reports
    queueing delay (arrival→admission), TTFT (arrival→first-token
    observation, an upper bound late by ≤ one chunk) and completion
    latency (arrival→done) percentiles."""
    import threading

    engine.arrival_s.clear()
    engine.admission_s.clear()
    engine.first_token_s.clear()
    engine.completion_s.clear()
    gaps = rng.exponential(1.0 / qps, size=len(reqs))
    holder = {}

    def serve():
        holder["got"] = engine.run_online()

    t = threading.Thread(target=serve)
    t.start()
    while engine._clock_t0 is None:
        time.sleep(0.001)
    t0 = time.perf_counter()
    for r, gap in zip(reqs, gaps):
        time.sleep(gap)
        engine.submit(r)
    engine.stop()
    t.join()
    makespan = time.perf_counter() - t0
    got = holder["got"]

    def pct(d):
        vals = list(d.values())
        return {
            "p50_s": round(float(np.median(vals)), 3),
            "p99_s": round(float(np.percentile(vals, 99)), 3),
        }

    queueing = {
        u: engine.admission_s[u] - engine.arrival_s[u] for u in got
    }
    ttft = {
        u: engine.first_token_s[u] - engine.arrival_s[u]
        for u in got
        if u in engine.first_token_s
    }
    latency = {
        u: engine.completion_s[u] - engine.arrival_s[u] for u in got
    }
    useful = int(sum(len(v) for v in got.values()))
    return {
        "qps_offered": qps,
        "qps_served": round(len(got) / makespan, 2),
        "tok_s": round(useful / makespan, 1),
        "queueing": pct(queueing),
        "ttft_upper_bound": pct(ttft),
        "completion": pct(latency),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=128)
    ap.add_argument("--out-cap", type=int, default=64)
    ap.add_argument("--sync-steps", type=int, default=8)
    ap.add_argument("--uniform", type=int, default=0,
                    help="fixed max_new for the sanity arm (0 = ragged)")
    ap.add_argument("--beam", type=int, default=0,
                    help="num_beams > 1: BeamServingEngine vs static "
                         "beam_generate batches (same pool rows: slots "
                         "groups x beams); fused arm skipped")
    ap.add_argument("--icl", action="store_true",
                    help="mixed few_shot_list sweep workload (k shots + "
                         "query per request, k cycling --icl-shots): the "
                         "reference's raggedest eval; static arm pads per "
                         "batch (fair), engine admits shape-homogeneous "
                         "groups against max_images buffers")
    ap.add_argument("--icl-shots", type=str, default="1,4,8",
                    help="comma shot counts for --icl")
    ap.add_argument("--icl-max-new", type=int, default=8,
                    help="fixed max_new for --icl requests")
    ap.add_argument("--no-merged", action="store_true",
                    help="disable the merged admit+decode (chunked "
                         "prefill) program in the engine arm")
    ap.add_argument("--arrivals", type=float, default=0.0,
                    help="online arm: Poisson arrival rate (requests/s) fed "
                         "by a thread into run_online; reports queueing/"
                         "TTFT/completion p50/p99")
    ap.add_argument("--admit-sizes", type=str, default="4,2,1",
                    help="comma admission group sizes (merged admits want "
                         "SMALL groups: the prefill lane must fit the "
                         "decode lane's weight-stream MXU headroom)")
    ap.add_argument("--harvest-lag", type=int, default=0)
    args = ap.parse_args()

    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    from licv_vqa_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import bench  # repo-root bench: the canonical flagship int8 build

    cfg, params, bind = bench.build(args.layers, quantize=True, kv8=True)
    assert cfg.image_token_id == 32001, cfg.image_token_id

    rng = np.random.default_rng(0)
    if args.icl:
        shots = [int(x) for x in args.icl_shots.split(",")]
        reqs = make_icl_workload(rng, args.requests, shots, args.icl_max_new)
        out_cap = args.icl_max_new
        buckets = sorted(
            {-(-len(r.input_ids) // 64) * 64 for r in reqs}
        )
        max_images = max(r.pixel_values.shape[0] for r in reqs)
        bucket = max(buckets)
    else:
        reqs = make_workload(
            rng, args.requests, args.bucket, args.out_cap,
            uniform=args.uniform or None,
        )
        out_cap = args.out_cap
        buckets, bucket, max_images = [args.bucket], args.bucket, None

    nb = max(args.beam, 1)
    admit_sizes = tuple(int(x) for x in args.admit_sizes.split(","))
    eng = make_engine(
        cfg, params, args.slots, buckets, out_cap, args.sync_steps,
        num_beams=nb, merged=not args.no_merged, max_images=max_images,
        harvest_lag=args.harvest_lag, admit_sizes=admit_sizes,
    )
    # fused single-dispatch arm: only meaningful on the single-bucket
    # single-image workload (its one-shot upload pads to ONE bucket)
    fu_eng = None if (nb > 1 or args.icl) else make_engine(
        cfg, params, args.slots, buckets, out_cap, args.sync_steps,
        merged=not args.no_merged, admit_sizes=admit_sizes,
    )
    # warmup + timed GROUPED PER ARM (each arm warm when timed), with the
    # engine pools released between arms: at 64 slots a pool's cache+media
    # is multi-GB and cannot sit in HBM alongside another arm's buffers
    # (observed RESOURCE_EXHAUSTED when the static arm ran against two
    # warm 64-slot engines).  release_pool() keeps the jits warm.
    for tag in ("warmup", "timed"):
        if nb > 1:
            st_res, st_t, st_rows, st_lat = run_static_beam(
                cfg, params, bind, reqs, args.slots, bucket, nb,
                per_batch_bucket=args.icl,
            )
        else:
            st_res, st_t, st_rows, st_lat = run_static(
                cfg, params, bind, reqs, args.slots, bucket,
                per_batch_bucket=args.icl,
            )
    for tag in ("warmup", "timed"):
        en_res, en_t = run_engine(eng, reqs)
        if tag == "warmup":
            eng.steps_run = 0  # count the timed pass only
    eng.release_pool()
    for tag in ("warmup", "timed"):
        fu_res, fu_t = (
            run_engine(fu_eng, reqs, fused=True) if fu_eng else ({}, 1.0)
        )
    if fu_eng:
        fu_eng.release_pool()
    # agreement FYI (see module docstring: batch-shape bf16 numerics
    # make exact parity across arms unattainable at 9B scale)
    same = agree = total = 0
    for r in reqs:
        a, b = st_res[r.uid], en_res[r.uid]
        same += np.array_equal(a, b)
        n = min(len(a), len(b))
        agree += int((a[:n] == b[:n]).sum())
        total += n
    print(
        f"static-vs-engine: {same}/{len(reqs)} exact, "
        f"{agree}/{total} positions agree"
    )

    st_useful = int(sum(len(v) for v in st_res.values()))
    en_useful = int(sum(len(v) for v in en_res.values()))
    fu_useful = int(sum(len(v) for v in fu_res.values()))
    en_rows = args.slots * nb * eng.steps_run
    ideal_steps = -(-en_useful // args.slots)
    out = {
        "workload": (
            f"icl_shots_{args.icl_shots}" if args.icl
            else "uniform" if args.uniform else "ragged"
        ),
        "merged_admits": getattr(eng, "merged_admits", 0),
        "num_beams": nb,
        "requests": args.requests,
        "static": {
            "s": round(st_t, 2),
            "useful_tokens": st_useful,
            "tok_s": round(st_useful / st_t, 1),
            "row_steps": st_rows,
            "latency_p50_s": round(float(np.median(list(st_lat.values()))), 2),
            "latency_p95_s": round(float(np.percentile(list(st_lat.values()), 95)), 2),
        },
        "engine": {
            "s": round(en_t, 2),
            "useful_tokens": en_useful,
            "tok_s": round(en_useful / en_t, 1),
            "row_steps": en_rows,
            "decode_steps": eng.steps_run,
            "step_efficiency_vs_ideal": round(ideal_steps / eng.steps_run, 3),
            "latency_p50_s": round(float(np.median(list(eng.completion_s.values()))), 2),
            "latency_p95_s": round(float(np.percentile(list(eng.completion_s.values()), 95)), 2),
        },
        "speedup_engine": round((en_useful / en_t) / (st_useful / st_t), 2),
    }
    if fu_eng is not None:
        out["fused"] = {
            "s": round(fu_t, 2),
            "useful_tokens": fu_useful,
            "tok_s": round(fu_useful / fu_t, 1),
            **fu_eng.fused_stats,
        }
        out["speedup_fused"] = round(
            (fu_useful / fu_t) / (st_useful / st_t), 2
        )
    if args.arrivals > 0:
        # prewarm EVERY admit width the online loop can hit: the offline
        # arms admit mostly at the largest admit_size (requests all queued
        # up front), while a low-QPS arrival process admits in 1s and 2s —
        # a (k, bucket) admit/merged program compiling mid-arrivals shows
        # up as a multi-second queueing-tail artifact, not a latency number
        for k in sorted({a for a in admit_sizes if a <= args.slots}):
            for r in make_workload(rng, k, args.bucket, args.out_cap,
                                   uniform=4):
                r.uid = f"warm{k}-{r.uid}"
                eng.submit(r)
            eng.run()
        eng.completion_s.clear()
        out["arrivals"] = run_arrivals(eng, reqs, args.arrivals, rng)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
