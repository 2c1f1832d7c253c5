"""Batched evaluation runners: ICV-steered zero-shot and few-shot ICL.

Replaces the reference's Python-driven loops (reference: inference.py:246-378)
with fixed-shape jitted generation: prompts are LEFT-padded to bucket
multiples, short final batches are padded to the batch size and the extra
rows discarded (the reference allocates unused slots the same way,
inference.py:264-267), so each (batch, bucket, n_images) triple compiles
exactly once.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prompt import PromptManager
from ..utils.log import get_logger
from .decode import beam_generate, greedy_generate

logger = get_logger("infer")


def _chunked(seq, n):
    buf = []
    for x in seq:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def make_generate_fn(bundle, generate_kwargs: dict, chain: int = 1) -> Callable:
    """Build ONE jitted generate over (ids, mask, pixels, valid, icv).

    The KV cache length is derived from the (bucketed) prompt length at trace
    time, so memory tracks the actual bucket instead of the global max.

    ``chain > 1``: the returned function takes arrays with a LEADING chain
    axis ((chain, B, ...)) and runs the SAME bs=B generate as a
    ``lax.scan`` over that axis — ``chain`` generations per dispatch, ONE
    host→device round trip for all of them.  Numerics per generation are
    identical to the unchained program (the scan body IS that program);
    through a remote-dispatch relay (~30 ms/call) this turns the per-call
    sync from a per-question cost into a per-chain cost."""
    max_new = int(generate_kwargs.get("max_new_tokens", 5))
    min_new = int(generate_kwargs.get("min_new_tokens", 0))
    num_beams = int(generate_kwargs.get("num_beams", 1))
    length_penalty = float(generate_kwargs.get("length_penalty", 0.0))
    draft_layers = int(generate_kwargs.get("speculative_draft_layers", 0))
    gamma = int(generate_kwargs.get("speculative_gamma", 4))
    eos, pad = bundle.eos_token_id, bundle.pad_token_id

    draft = None
    if draft_layers > 0:
        if num_beams > 1:
            logger.warning(
                "speculative decoding requires num_beams == 1 (exact greedy "
                "verification; no beam-verification scheme is implemented) — "
                "falling back to plain beam search"
            )
        elif min_new > 0:
            logger.warning(
                "speculative decoding does not implement min_new_tokens "
                "(EOS suppression for the first %d steps) — falling back to "
                "plain greedy so the contract 'equals greedy token-for-token' "
                "holds",
                min_new,
            )
        else:
            from ..models.registry import build_draft_decode

            draft = build_draft_decode(bundle, draft_layers)

    def gen(
        params, input_ids, attention_mask, pixels, pixel_valid, icv_scaled,
        pixel_attention_mask=None,
    ):
        bind_kw = (
            {"pixel_attention_mask": pixel_attention_mask}
            if pixel_attention_mask is not None
            else {}
        )
        # speculative verification writes up to gamma rows past the current
        # index — without this margin the final rounds overflow the cache,
        # and XLA's out-of-bounds semantics (dynamic_update_slice clamps the
        # start / scatter drops updates) silently mis-place or lose keys
        margin = gamma if draft is not None else 0
        fwd = bundle.bind_decode(
            params, pixels, pixel_valid, input_ids, icv_scaled,
            input_ids.shape[1] + max_new + margin + 1, **bind_kw,
        )
        if draft is not None:
            from .speculative import speculative_greedy_generate

            draft_params, draft_bind = draft
            # draft drafts WITH the ICV on its truncated depth (best guess of
            # the steered target).  Under subset-layer intervention the K ICV
            # rows are expanded to per-layer (rows, flags) first — the draft
            # bind is the raw (unwrapped) forward — then truncated; draft ICV
            # fidelity only affects acceptance, never correctness (the target
            # verifies every token)
            if icv_scaled is None:
                draft_icv = None
            elif bundle.intervention_layers is not None:
                from ..icv.encoder import expand_icv_to_layers

                full = expand_icv_to_layers(
                    icv_scaled,
                    bundle.intervention_layers,
                    bundle.model_cfg.text.n_layers,
                )
                draft_icv = jax.tree.map(lambda x: x[:draft_layers], full)
            else:
                draft_icv = jax.tree.map(lambda x: x[:draft_layers], icv_scaled)
            dfwd = draft_bind(
                draft_params, pixels, pixel_valid, input_ids, draft_icv,
                input_ids.shape[1] + max_new + margin + 1, **bind_kw,
            )
            return speculative_greedy_generate(
                fwd, dfwd, input_ids, attention_mask,
                max_new_tokens=max_new, eos_token_id=eos, pad_token_id=pad,
                gamma=gamma,
            )
        if num_beams > 1:
            return beam_generate(
                fwd,
                input_ids,
                attention_mask,
                max_new_tokens=max_new,
                eos_token_id=eos,
                pad_token_id=pad,
                num_beams=num_beams,
                length_penalty=length_penalty,
                min_new_tokens=min_new,
            )
        return greedy_generate(
            fwd,
            input_ids,
            attention_mask,
            max_new_tokens=max_new,
            eos_token_id=eos,
            pad_token_id=pad,
            min_new_tokens=min_new,
        )

    if chain <= 1:
        return jax.jit(gen)

    def gen_chain(params, ids, mask, pixels, valid, icv_scaled, *extra):
        # scan the UNCHANGED bs=B generate over the leading chain axis —
        # one dispatch, `chain` generations, identical per-generation math
        def body(_, xs):
            return 0, gen(params, *xs[:4], icv_scaled, *xs[4:])

        _, outs = jax.lax.scan(body, 0, (ids, mask, pixels, valid) + extra)
        return outs  # (chain, B, S + max_new)

    return jax.jit(gen_chain)


def _dispatch_generate(bundle, gen_fn: Callable, prompts: list[list],
                       icv_scaled, mesh=None, chain: int = 1):
    """Tokenize + launch one generation; returns ``(device_out, rows,
    prompt_len)`` WITHOUT blocking on the result (JAX async dispatch) so the
    eval loop can overlap host prompt assembly of batch k+1 with device
    compute of batch k.

    ``chain > 1``: ``prompts`` holds ``chain`` equal batches back to back;
    they tokenize TOGETHER (one shared pad length, like one bigger static
    batch would) and dispatch as one chained program — see
    ``make_generate_fn(chain=...)``."""
    proc = bundle.processor
    enc = proc.prepare_input(prompts, padding=True, padding_side="left")
    arrays = [
        np.asarray(enc["input_ids"]),
        np.asarray(enc["attention_mask"]),
        np.asarray(enc["pixel_values"]),
        np.asarray(enc["pixel_valid"]),
    ]
    if "pixel_attention_mask" in enc:  # NaViT variable resolution
        arrays.append(np.asarray(enc["pixel_attention_mask"]))
    if chain > 1:
        if mesh is not None:
            raise ValueError("infer_chain and the dp mesh are exclusive")
        arrays = [
            a.reshape((chain, a.shape[0] // chain) + a.shape[1:])
            for a in arrays
        ]
    rows = len(prompts)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape.get("dp", 1)
        rem = (-rows) % dp
        if rem:  # repeat the last row up to a dp multiple; extras discarded
            arrays = [
                np.concatenate([a, np.repeat(a[-1:], rem, axis=0)]) for a in arrays
            ]
        shard = NamedSharding(mesh, P("dp"))
        # device_put straight from numpy: one host→shards transfer (a
        # jnp.asarray first would land the whole batch on device 0 and
        # then copy it again across the mesh — 2× traffic on the
        # pipelined eval's host-side critical path)
        arrays = [jax.device_put(a, shard) for a in arrays]
    else:
        arrays = [jnp.asarray(a) for a in arrays]
    ids, mask, px, pv, *extra = arrays
    out = gen_fn(bundle.params, ids, mask, px, pv, icv_scaled, *extra)
    return out, rows, enc["input_ids"].shape[1]


def _collect_generate(bundle, pending) -> list[str]:
    """Block on a ``_dispatch_generate`` handle and decode ONLY the
    continuation (reference: inference.py:300-321)."""
    out, rows, prompt_len = pending
    out = np.asarray(out)
    if out.ndim == 3:  # chained dispatch: (chain, B, S') → flat rows
        out = out.reshape(-1, out.shape[-1])
    out = out[:rows]
    return bundle.tokenizer.batch_decode(
        [row[prompt_len:] for row in out], skip_special_tokens=True
    )


def generate_answers(
    bundle,
    gen_fn: Callable,
    prompts: list[list],
    icv_scaled,
    mesh=None,
) -> list[str]:
    """Tokenize → generate → decode ONLY the continuation
    (reference: inference.py:300-321).

    With ``mesh``, the batch dim shards over its ``dp`` axis (rows padded to
    a dp multiple) — multi-chip batch-parallel serving with GSPMD running
    the whole decode loop; outputs are identical to single-device."""
    return _collect_generate(
        bundle, _dispatch_generate(bundle, gen_fn, prompts, icv_scaled, mesh=mesh)
    )


class _EvalPipeline:
    """FIFO of in-flight generations, at most ``depth`` deep (JAX async
    dispatch) — batch k+1's host tokenization/dispatch overlaps batch k's
    device compute.  Collecting a handle decodes ONLY the continuation and
    writes the real rows (dp-padding rows skipped) into ``results`` keyed by
    dispatch order, so outputs are identical to serial (depth=1)."""

    def __init__(self, bundle, depth: int):
        self.bundle = bundle
        self.depth = max(1, int(depth))
        self.results: dict = {}
        self._pending: list = []  # (handle, real_batch) FIFO
        self._index = 0

    def push(self, handle, batch) -> None:
        self._pending.append((handle, batch))
        if len(self._pending) >= self.depth:
            self._collect_one()

    def drain(self) -> dict:
        while self._pending:
            self._collect_one()
        return self.results

    def _collect_one(self) -> None:
        handle, b = self._pending.pop(0)
        generated = _collect_generate(self.bundle, handle)
        for i in range(len(b)):
            row = {k: v for k, v in b[i].items() if k != "image"}
            self.results[self._index] = {"prediction": generated[i], **row}
            self._index += 1


def icv_inference(
    val_ds,
    bundle,
    prompt_manager: PromptManager,
    bs: int,
    generate_kwargs: dict,
    instruction: str = "",
    icv_scaled: Optional[jax.Array] = None,
    progress: bool = True,
    mesh=None,
    pipeline_depth: int = 2,
    chain: int = 1,
) -> dict:
    """Zero-shot (+ optional ICV) eval loop (reference: inference.py:246-297).

    ``mesh``: shard each eval batch over the dp axis (multi-chip serving).
    ``pipeline_depth``: number of in-flight generations (JAX async dispatch)
    — batch k+1's host tokenization and dispatch overlap batch k's device
    compute, hiding the per-call host→device round trip at small batch
    sizes.  Depth 1 restores strictly serial dispatch→sync; outputs are
    identical either way (collection order is FIFO).
    ``chain``: generations per dispatch (``make_generate_fn(chain=...)``):
    ``chain`` consecutive bs-sized batches run as one scanned program —
    per-batch decode math unchanged, but the host↔device round trip
    amortizes over the whole chain (the wall-clock lever on high-latency
    links; exclusive with ``mesh``)."""
    chain = max(int(chain), 1)
    gen_fn = make_generate_fn(bundle, generate_kwargs, chain=chain)
    if mesh is not None:
        _replicate_bundle_params(bundle, mesh)
    pipe = _EvalPipeline(bundle, pipeline_depth)
    for batch in _chunked(_maybe_tqdm(val_ds, progress), bs * chain):
        real = len(batch)
        padded = batch + [batch[-1]] * (bs * chain - real)
        prompts = []
        for sample in padded:
            p = [instruction] if instruction else []
            p += [sample["image"], prompt_manager.gen_query_text_without_label(sample)]
            prompts.append(p)
        pipe.push(
            _dispatch_generate(
                bundle, gen_fn, prompts, icv_scaled, mesh=mesh, chain=chain
            ),
            batch,
        )
    return pipe.drain()


def _run_continuous(
    prompt_iter,
    bundle,
    generate_kwargs: dict,
    icv_scaled,
    n_slots: int,
    sync_steps: int,
    mesh=None,
) -> dict:
    """Shared continuous-batching eval loop: encode each ``(sample, prompt)``
    pair from ``prompt_iter`` into an engine ``Request``, run the pool, and
    return the ``icv_inference``-shaped results dict.  ``num_beams > 1``
    (the reference's beam-3 eval default) rides ``BeamServingEngine``.

    With ``mesh``, the slot pool (greedy: rows; beam: groups) shards over
    the dp axis and tp>1 Megatron-shards the frozen weights (``from_bundle``
    lays them out); ``n_slots`` rounds up to a dp multiple."""
    from .serving import BeamServingEngine, Request, ServingEngine

    num_beams = int(generate_kwargs.get("num_beams", 1))
    max_new = int(generate_kwargs.get("max_new_tokens", 5))
    min_new = int(generate_kwargs.get("min_new_tokens", 0))
    proc = bundle.processor

    samples, requests, lens = [], [], []
    for idx, (sample, p) in enumerate(prompt_iter):
        enc = proc.prepare_input([p], padding=True, padding_side="left")
        mask = np.asarray(enc["attention_mask"][0], bool)
        ids = np.asarray(enc["input_ids"][0])[mask]
        lens.append(len(ids))
        requests.append(
            Request(
                uid=idx,
                input_ids=ids,
                pixel_values=np.asarray(enc["pixel_values"][0]),
                pixel_valid=np.asarray(enc["pixel_valid"][0], bool),
                max_new=max_new,
                min_new=min_new,
                # idefics2 NaViT variable resolution: per-request real-pixel
                # mask; the engine groups admissions by media shape
                pixel_attention_mask=(
                    np.asarray(enc["pixel_attention_mask"][0])
                    if "pixel_attention_mask" in enc
                    else None
                ),
            )
        )
        samples.append(sample)

    # static prompt buckets: 64-multiples covering the observed lengths
    # (one admit compile per distinct bucket)
    buckets = tuple(sorted({-(-n // 64) * 64 for n in lens})) or (64,)
    if mesh is not None:
        dp = mesh.shape.get("dp", 1)
        n_slots = -(-n_slots // dp) * dp
    kw = dict(
        icv_scaled=icv_scaled,
        mesh=mesh,
        n_slots=n_slots,
        out_cap=max(max_new, 1),
        prompt_buckets=buckets,
        sync_steps=sync_steps,
        # mixed-shot ICL: media buffers carry the widest request's images
        max_images=max(r.pixel_values.shape[0] for r in requests),
    )
    if num_beams > 1:
        engine = BeamServingEngine.from_bundle(
            bundle,
            num_beams=num_beams,
            length_penalty=float(generate_kwargs.get("length_penalty", 0.0)),
            **kw,
        )
    else:
        engine = ServingEngine.from_bundle(bundle, **kw)
    for r in requests:
        engine.submit(r)
    tokens = engine.run()

    results = {}
    for idx, sample in enumerate(samples):
        text = bundle.tokenizer.batch_decode(
            [tokens[idx]], skip_special_tokens=True
        )[0]
        row = {k: v for k, v in sample.items() if k != "image"}
        results[idx] = {"prediction": text, **row}
    return results


def icv_inference_continuous(
    val_ds,
    bundle,
    prompt_manager: PromptManager,
    generate_kwargs: dict,
    instruction: str = "",
    icv_scaled: Optional[jax.Array] = None,
    progress: bool = True,
    n_slots: int = 8,
    sync_steps: int = 4,
    mesh=None,
) -> dict:
    """``icv_inference`` through the continuous-batching engine.  Same
    output contract as ``icv_inference``; per-request results are
    token-identical to the static path's per-request decode
    (tests/test_serving.py), but ragged workloads keep every slot busy
    instead of draining whole batches."""

    def prompts():
        for sample in _maybe_tqdm(val_ds, progress):
            p = [instruction] if instruction else []
            p += [
                sample["image"],
                prompt_manager.gen_query_text_without_label(sample),
            ]
            yield sample, p

    return _run_continuous(
        prompts(), bundle, generate_kwargs, icv_scaled, n_slots, sync_steps,
        mesh=mesh,
    )


def icl_inference_continuous(
    train_ds,
    val_ds,
    ice_idx_list: list[list[int]],
    bundle,
    prompt_manager: PromptManager,
    generate_kwargs: dict,
    instruction: str = "",
    progress: bool = True,
    n_slots: int = 8,
    sync_steps: int = 4,
    mesh=None,
) -> dict:
    """``icl_inference`` through the continuous-batching engine — the
    reference's raggedest workload (prompt lengths vary ~30x across
    ``few_shot_list``, reference: inference.py:324-378): per-request slots
    free the moment a request finishes instead of draining a padded batch,
    and mixed shot counts admit as shape-homogeneous groups against
    ``max_images``-wide media buffers.  Output contract and per-request
    tokens match ``icl_inference`` (engine-vs-static CLI parity in
    tests/test_cli_e2e.py)."""

    def prompts():
        for idx, sample in enumerate(_maybe_tqdm(val_ds, progress)):
            p = [instruction] if instruction else []
            for si in ice_idx_list[idx]:
                shot = train_ds[si]
                p += [
                    shot["image"],
                    prompt_manager.gen_ice_text_with_label(
                        shot, add_sep_token=True
                    ),
                ]
            p += [
                sample["image"],
                prompt_manager.gen_query_text_without_label(sample),
            ]
            yield sample, p

    return _run_continuous(
        prompts(), bundle, generate_kwargs, None, n_slots, sync_steps,
        mesh=mesh,
    )


def _run_pooled(
    prompt_iter,
    bundle,
    generate_kwargs: dict,
    icv_scaled,
    pool_questions: int,
) -> dict:
    """Shared POOLED-schedule eval loop (``infer_engine=pooled``): the
    highest-throughput beam-eval schedule on one chip — P = max_new-1
    staggered beam groups share every weight-stream pass inside one jitted
    scan (``eval_chain._make_pooled_chain``; measured 37 q/s/chip vs the
    chained path's 10.8 at the reference eval shape).

    Ragged prompts bucket to 64-multiples (one compile per bucket × image
    width); each bucket runs in fixed-size chunks of ``pool_questions``
    (the last chunk pads by repeating its final question — the chain's
    wrap-around drain makes extras free to discard).  Per-question tokens
    are ``decode.beam_generate``'s (tests/test_eval_chain.py), so results
    match the static beam path exactly on CPU f32 and up to batch-shape
    kernel drift on TPU."""
    import jax

    from ..models.idefics import IdeficsConfig
    from ..models.idefics2 import Idefics2Config
    from .eval_chain import (
        make_idefics2_pooled_eval_chain,
        make_idefics_pooled_eval_chain,
        make_openflamingo_pooled_eval_chain,
    )

    num_beams = int(generate_kwargs.get("num_beams", 1))
    max_new = int(generate_kwargs.get("max_new_tokens", 5))
    if num_beams < 2 or max_new < 2:
        raise ValueError(
            "the pooled schedule needs num_beams >= 2 and max_new_tokens >= 2"
            " (greedy/1-token workloads: use infer_engine=continuous)"
        )
    cfg = bundle.model_cfg
    if isinstance(cfg, IdeficsConfig):
        factory = make_idefics_pooled_eval_chain
    elif isinstance(cfg, Idefics2Config):
        factory = make_idefics2_pooled_eval_chain
    else:
        factory = make_openflamingo_pooled_eval_chain
    chain = jax.jit(
        factory(
            cfg,
            bundle.eos_token_id,
            num_beams=num_beams,
            max_new_tokens=max_new,
            length_penalty=float(generate_kwargs.get("length_penalty", 0.0)),
            min_new_tokens=int(generate_kwargs.get("min_new_tokens", 0)),
        )
    )

    proc = bundle.processor
    samples, encs = [], []
    for sample, p in prompt_iter:
        enc = proc.prepare_input([p], padding=True, padding_side="left")
        if "pixel_attention_mask" in enc:
            raise ValueError(
                "NaViT variable resolution is engine-only; use "
                "infer_engine=continuous"
            )
        mask = np.asarray(enc["attention_mask"][0], bool)
        encs.append(
            (
                np.asarray(enc["input_ids"][0])[mask],
                np.asarray(enc["pixel_values"][0]),
                np.asarray(enc["pixel_valid"][0], bool),
            )
        )
        samples.append(sample)

    pad_id = bundle.pad_token_id
    # bucket by 64-multiple prompt length AND image-buffer width (one
    # compile per (bucket, n_img, chunk size))
    buckets: dict = {}
    for idx, (ids, px, pv) in enumerate(encs):
        key = (max(-(-len(ids) // 64) * 64, 64), px.shape[0])
        buckets.setdefault(key, []).append(idx)

    answers: dict = {}
    for (bucket, n_img), idxs in sorted(buckets.items()):
        c = min(int(pool_questions), len(idxs))
        for lo in range(0, len(idxs), c):
            chunk = idxs[lo : lo + c]
            real = len(chunk)
            chunk = chunk + [chunk[-1]] * (c - real)
            ids = np.full((c, 1, bucket), pad_id, np.int32)
            mask = np.zeros((c, 1, bucket), np.int32)
            px0 = encs[chunk[0]][1]
            pixels = np.zeros((c, 1, n_img) + px0.shape[1:], px0.dtype)
            pvs = np.zeros((c, 1, n_img), bool)
            for r, qi in enumerate(chunk):
                q_ids, q_px, q_pv = encs[qi]
                ids[r, 0, bucket - len(q_ids):] = q_ids  # left padding
                mask[r, 0, bucket - len(q_ids):] = 1
                pixels[r, 0, : q_px.shape[0]] = q_px
                pvs[r, 0, : q_pv.shape[0]] = q_pv
            out = np.asarray(
                chain(
                    bundle.params,
                    jnp.asarray(ids),
                    jnp.asarray(mask),
                    jnp.asarray(pixels),
                    jnp.asarray(pvs),
                    icv_scaled,
                )
            )  # (c, 1, max_new)
            for r, qi in enumerate(chunk[:real]):
                answers[qi] = bundle.tokenizer.batch_decode(
                    [out[r, 0]], skip_special_tokens=True
                )[0]

    results = {}
    for idx, sample in enumerate(samples):
        row = {k: v for k, v in sample.items() if k != "image"}
        results[idx] = {"prediction": answers[idx], **row}
    return results


def icv_inference_pooled(
    val_ds,
    bundle,
    prompt_manager: PromptManager,
    generate_kwargs: dict,
    instruction: str = "",
    icv_scaled=None,
    progress: bool = True,
    pool_questions: int = 32,
) -> dict:
    """``icv_inference`` through the pooled beam schedule (one-image VQA
    questions — the reference's eval workload at its own decode settings,
    reference: config/inference.yaml:11,26-30)."""

    def prompts():
        for sample in _maybe_tqdm(val_ds, progress):
            p = [instruction] if instruction else []
            p += [
                sample["image"],
                prompt_manager.gen_query_text_without_label(sample),
            ]
            yield sample, p

    return _run_pooled(
        prompts(), bundle, generate_kwargs, icv_scaled, pool_questions
    )


def icl_inference_pooled(
    train_ds,
    val_ds,
    ice_idx_list: list[list[int]],
    bundle,
    prompt_manager: PromptManager,
    generate_kwargs: dict,
    instruction: str = "",
    progress: bool = True,
    pool_questions: int = 32,
) -> dict:
    """``icl_inference`` through the pooled beam schedule: mixed shot
    counts bucket by (prompt length, image count), so each chunk's merged
    program stays shape-static."""

    def prompts():
        for idx, sample in enumerate(_maybe_tqdm(val_ds, progress)):
            p = [instruction] if instruction else []
            for si in ice_idx_list[idx]:
                shot = train_ds[si]
                p += [
                    shot["image"],
                    prompt_manager.gen_ice_text_with_label(
                        shot, add_sep_token=True
                    ),
                ]
            p += [
                sample["image"],
                prompt_manager.gen_query_text_without_label(sample),
            ]
            yield sample, p

    return _run_pooled(
        prompts(), bundle, generate_kwargs, None, pool_questions
    )


def icl_inference(
    train_ds,
    val_ds,
    ice_idx_list: list[list[int]],
    bundle,
    prompt_manager: PromptManager,
    bs: int,
    generate_kwargs: dict,
    instruction: str = "",
    progress: bool = True,
    mesh=None,
    pipeline_depth: int = 2,
    chain: int = 1,
) -> dict:
    """True few-shot ICL eval (reference: inference.py:324-378).

    Pipelined like ``icv_inference``: up to ``pipeline_depth`` generations
    in flight, so shot assembly/tokenization overlaps device compute;
    ``chain`` batches per dispatch amortize the host↔device round trip."""
    chain = max(int(chain), 1)
    gen_fn = make_generate_fn(bundle, generate_kwargs, chain=chain)
    if mesh is not None:
        _replicate_bundle_params(bundle, mesh)
    pipe = _EvalPipeline(bundle, pipeline_depth)
    cursor = 0  # next ice_idx_list row to CONSUME (dispatch side)
    for batch in _chunked(_maybe_tqdm(val_ds, progress), bs * chain):
        real = len(batch)
        ice_ids = ice_idx_list[cursor : cursor + real]
        cursor += real
        ice_ids = ice_ids + [ice_ids[-1]] * (bs * chain - real)
        padded = batch + [batch[-1]] * (bs * chain - real)
        prompts = []
        for sample, shots in zip(padded, ice_ids):
            p = [instruction] if instruction else []
            for si in shots:
                shot = train_ds[si]
                p += [
                    shot["image"],
                    prompt_manager.gen_ice_text_with_label(shot, add_sep_token=True),
                ]
            p += [sample["image"], prompt_manager.gen_query_text_without_label(sample)]
            prompts.append(p)
        pipe.push(
            _dispatch_generate(
                bundle, gen_fn, prompts, None, mesh=mesh, chain=chain
            ),
            batch,
        )
    return pipe.drain()


def _replicate_bundle_params(bundle, mesh) -> None:
    """Lay the frozen weights out on the mesh once (idempotent): Megatron
    column/row tp shards when the mesh has a tp axis >1 — bf16 AND
    int8/int4-quantized weights (param_specs shards the {"q","s"} leaves by
    parent name) — plain replication otherwise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh.shape.get("tp", 1) > 1:
        from ..parallel.sharding import param_specs

        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            param_specs(bundle.params),
            is_leaf=lambda x: isinstance(x, P),
        )
        bundle.params = jax.device_put(bundle.params, shardings)
        return
    bundle.params = jax.device_put(bundle.params, NamedSharding(mesh, P()))


def _maybe_tqdm(it, enabled: bool):
    if not enabled:
        return it
    try:
        from tqdm import tqdm

        return tqdm(it, total=len(it))
    except ImportError:
        return it
