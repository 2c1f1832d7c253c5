"""Continuous-batching serving engine: slot-based, static-shape, on-device.

The reference serves evaluation with static request batches (HF ``generate``
over fixed batches, reference: inference.py:246-321): every batch waits for
its slowest member, and no new request starts until the whole batch drains.
This engine decouples admission from completion the way modern LLM servers
do (vLLM-style continuous batching), re-designed for XLA's static-shape
compilation model instead of PagedAttention's pointer-chasing:

- A fixed pool of ``n_slots`` sequences decodes in lockstep — ONE jitted
  step program over the whole pool, compiled once.  Slots are independent:
  the KV cache keeps a per-row write index (``cache["index"]`` as a (B,)
  vector — the same mechanism per-row speculative acceptance uses,
  models/decoder.py::decode_cache_view) and per-row positions, so each slot
  sits at its own sequence offset; masks derive from per-row ``pos/valid``,
  so slots can never read each other's history.
- Admission is one jitted prefill-and-scatter: the new request prefills
  into a fresh bucket-length cache (flash attention, w8a8 when enabled —
  the same code path the batch runners use), then its K/V rows, media state
  (image latents, xattn K/V, step onehot), and decode state scatter into
  the slot arrays.  One compile per (admit_size, prompt_bucket) pair.
- Completion is harvested every ``sync_steps`` decode steps with a single
  small device readback (flags + token buffer); finished slots free
  immediately and queued requests admit without draining the pool.

All big state stays on device across calls (buffer donation — the multi-GB
KV cache is never copied); the host loop only moves prompts in and token
ids out.  Decode semantics per slot are EXACTLY ``infer.decode.
greedy_generate`` (same argmax, EOS handling, ``min_new_tokens`` EOS
suppression), token-for-token — tested in tests/test_serving.py, and
verified BITWISE on v5e at matching batch shapes (engine adm=1 prefill
logits == static bs=1: maxdiff 0.0 on the 32L int8 flagship).  Across
DIFFERENT batch shapes XLA's kernel selection makes bf16 logits
shape-dependent (same row, bs=1 vs bs=8: up to ~1.4 logit drift through 32
layers on v5e), so greedy argmax near ties can flip engine-vs-static just
as it flips static-vs-static across batch sizes — inherent to compiled
bf16 serving, not an engine artifact (tools/bench_serving_tpu.py).

Why this beats the reference's static batching on ragged workloads: with
per-request generation lengths, a static batch burns ``(max_len - len_i)``
wasted steps per row; the engine refills those rows the moment they finish.

Single-chip v1: the pool lives on one device (shard the POOL over dp for
multi-chip serving — each chip runs its own engine; the runner-level
``mesh`` path covers lockstep multi-chip batches instead).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import init_kv_cache
from ..utils.log import get_logger
from .decode import NEG_INF

logger = get_logger("serving")


@dataclasses.dataclass
class Request:
    """One generation request (unpadded host arrays)."""

    uid: Any
    input_ids: np.ndarray  # (S,) int32, no padding
    pixel_values: np.ndarray  # (N_img, H, W, 3)
    max_new: int
    min_new: int = 0
    pixel_valid: Optional[np.ndarray] = None  # (N_img,) bool; default all-on
    # NaViT variable resolution (idefics2): real-pixel mask (N_img, H, W).
    # Only families whose prefill accepts ``pixel_attention_mask`` may set it.
    pixel_attention_mask: Optional[np.ndarray] = None


@dataclasses.dataclass
class _Slot:
    request: Request
    prompt_len: int
    # chunk count at admission: a state produced by chunk k (id k) reflects
    # this slot only if admitted_at < k — the pipelined harvest reads LAGGED
    # states, and a freed-then-reused slot still carries the previous
    # occupant's finished/out flags there
    admitted_at: int = 0


class ServingEngine:
    """Continuous-batching pool over one model family.

    ``prefill_fn``/``decode_fn``/``media_axes`` come from the family's
    ``make_*_serving_fns`` (models/idefics.py, idefics2.py,
    openflamingo.py) or via :meth:`from_bundle`.
    """

    def __init__(
        self,
        prefill_fn: Callable,
        decode_fn: Callable,
        media_axes: dict,
        text_cfg,
        params,
        *,
        eos_token_id: int,
        pad_token_id: int,
        n_slots: int = 8,
        out_cap: int = 32,
        prompt_buckets: tuple = (64, 128),
        sync_steps: int = 4,
        admit_sizes: tuple = (4, 2, 1),
        icv_scaled=None,
        mesh=None,
        max_images: Optional[int] = None,
        supports_pixel_attention_mask: bool = False,
        merged_admit_fn: Optional[Callable] = None,
        merged_admit_in_run: bool = False,
        harvest_lag: int = 1,
    ):
        self._prefill = prefill_fn
        self._decode = decode_fn
        self._media_axes = dict(media_axes)
        self._text_cfg = text_cfg
        self.params = params
        self.eos_token_id = int(eos_token_id)
        self.pad_token_id = int(pad_token_id)
        self.n_slots = int(n_slots)
        self.out_cap = int(out_cap)
        self.prompt_buckets = tuple(sorted(int(b) for b in prompt_buckets))
        self.sync_steps = int(sync_steps)
        self.admit_sizes = tuple(sorted({int(a) for a in admit_sizes} | {1}, reverse=True))
        self.cache_len = self.prompt_buckets[-1] + self.out_cap
        self._icv = icv_scaled
        # mixed-image-count serving (ICL sweeps: k+1 images per request):
        # media buffers size to ``max_images``; admissions run the vision
        # tower at each group's TRUE image count and the media scatter
        # zero-pads up to the buffer (zero latents/xattn-KV are never
        # attended — the per-image onehot/valid masks derive from
        # pixel_valid, which is False beyond a request's real images).
        self.max_images = None if max_images is None else int(max_images)
        self.supports_pixel_attention_mask = bool(supports_pixel_attention_mask)
        # chunked prefill (family-provided merged step): one program runs a
        # pool decode step AND the admission prefill with packed projections
        # — admissions stop stalling the pool and the prefill rides the
        # decode step's weight stream (models/*.make_*_merged_admit_fn).
        # Single-device v1: the dp-sharded pool keeps the plain admit (the
        # prefill lane's group batch has no dp layout).
        #
        # Regime (measured, v5e behind the ~30-50 ms/dispatch axon relay):
        # merged admission WINS inside run_fused (one on-device while_loop:
        # ragged 8-slot 1.10x static vs 0.94x plain-fused) but LOSES in the
        # host-driven run() (it trades few big admit dispatches for many
        # per-step ones: ragged 8-slot 1.15x vs plain's 1.24x; uniform
        # 64-slot 0.4-0.65x).  Default: fused uses it when available,
        # run() keeps plain admits unless ``merged_admit_in_run=True``
        # (the right setting on low-latency links where dispatch is ~free).
        self._merged_admit = merged_admit_fn if mesh is None else None
        self.merged_admit_in_run = bool(merged_admit_in_run)
        # harvest_lag=1 (default): block on chunk k's flags only AFTER
        # dispatching chunk k+1 — the readback overlaps device compute, but
        # a finished slot idles up to 2·sync_steps extra steps before its
        # refill.  harvest_lag=0 blocks on EVERY chunk's own flags: one
        # readback round trip per chunk on the critical path, but finished
        # slots refill at the next admission — the right trade at large
        # pools where strandied slot-steps dwarf the readback (measured
        # bs=64 uniform: the lag-1 idle was the whole engine-vs-static gap).
        self.harvest_lag = int(harvest_lag)
        # multi-chip: the SLOT POOL shards over the mesh's dp axis (each
        # chip holds n_slots/dp rows of the cache/state/media); admissions
        # and harvests stay host-driven, GSPMD keeps every jitted step
        # sharded.  Frozen weights should already be laid out on the mesh
        # (runner._replicate_bundle_params — from_bundle does this).
        self.mesh = mesh
        if mesh is not None and self.n_slots % mesh.shape.get("dp", 1):
            raise ValueError(
                f"n_slots={self.n_slots} must divide over dp="
                f"{mesh.shape.get('dp', 1)}"
            )

        self._cache = None
        self._media: Optional[dict] = None  # allocated at first admission
        self._media_n_img: Optional[int] = None  # buffer image-count width
        self._state = None
        self._ensure_pool()
        self._queue: deque[Request] = deque()
        self._slots: list[Optional[_Slot]] = [None] * self.n_slots
        self._admit_jits: dict = {}
        self._chunk_jit = None
        self.steps_run = 0  # decode steps dispatched (bench introspection)
        self.merged_admits = 0  # admissions that rode the merged program
        self._chunk_count = 0  # chunks dispatched (harvest-lag generation id)
        # wall-clock completion per uid, relative to the run() start (the
        # latency story: early finishers return early instead of waiting
        # for a static batch to drain)
        self.completion_s: dict = {}
        # online-serving clocks (run_online): per-uid arrival, admission and
        # first-token-observed times relative to the serve start.  TTFT is
        # observed at harvest readbacks, so it is an upper bound late by at
        # most one chunk (sync_steps decode steps).
        self.arrival_s: dict = {}
        self.admission_s: dict = {}
        self.first_token_s: dict = {}
        self._clock_t0: Optional[float] = None
        self._stop_requested = False

    # -- fresh device state ---------------------------------------------------

    def _ensure_pool(self) -> None:
        """(Re-)allocate the pool's device buffers if released."""
        if self._cache is None:
            self._cache = self._init_cache()
            self._state = self._init_state()
            if self.mesh is not None:
                self._cache = self._shard_cache(self._cache)
                self._state = {
                    k: self._shard_batch0(x) for k, x in self._state.items()
                }

    def release_pool(self) -> None:
        """Drop the pool's DEVICE buffers (KV cache, media, slot state)
        while keeping every compiled program warm.  At flagship scale a
        64-slot pool holds multi-GB of cache+media; an idle server (or a
        benchmark switching arms) should not keep that resident in HBM.
        Buffers re-allocate lazily on the next run/admission."""
        if any(s is not None for s in self._slots) or self._queue:
            raise RuntimeError(
                "release_pool with active slots or queued requests"
            )
        self._cache = None
        self._media = None
        self._media_n_img = None
        self._state = None

    def _init_cache(self) -> dict:
        cache = init_kv_cache(self._text_cfg, self.n_slots, self.cache_len)
        # per-row write index: each slot advances independently
        return dict(cache, index=jnp.zeros((self.n_slots,), jnp.int32))

    def _init_state(self) -> dict:
        b, v = self.n_slots, self._text_cfg.vocab_size
        return {
            "active": jnp.zeros((b,), bool),
            "finished": jnp.zeros((b,), bool),
            "tok_count": jnp.zeros((b,), jnp.int32),
            "next_pos": jnp.zeros((b,), jnp.int32),
            "max_new": jnp.ones((b,), jnp.int32),
            "min_new": jnp.zeros((b,), jnp.int32),
            "last_logits": jnp.zeros((b, v), jnp.float32),
            "out": jnp.zeros((b, self.out_cap), jnp.int32),
        }

    # -- mesh sharding helpers ----------------------------------------------

    def _named(self, spec):
        from jax.sharding import NamedSharding

        return NamedSharding(self.mesh, spec)

    def _shard_batch0(self, x):
        from jax.sharding import PartitionSpec as P

        return jax.device_put(x, self._named(P("dp")))

    def _shard_batch_ax(self, x, ax: int):
        from jax.sharding import PartitionSpec as P

        spec = P(*([None] * ax + ["dp"]))
        return jax.device_put(x, self._named(spec))

    def _shard_cache(self, cache: dict) -> dict:
        """K/V planes carry batch at axis 1 ((L, B, S, ...)); pos/valid/index
        at axis 0."""
        out = dict(cache)
        for key in ("k", "v"):
            out[key] = jax.tree.map(
                lambda x: self._shard_batch_ax(x, 1), cache[key]
            )
        for key in ("pos", "valid", "index"):
            out[key] = self._shard_batch0(cache[key])
        return out

    # -- construction -------------------------------------------------------

    @classmethod
    def from_bundle(cls, bundle, **kw) -> "ServingEngine":
        """Build the engine from a ``ModelBundle``: picks the family's
        serving fns, applies the bundle's pixel normalization (raw uint8
        pixels normalize on device, registry._wrap_pixel_normalize parity)
        and subset-layer intervention expansion."""
        from ..data.processor import CLIP_MEAN, CLIP_STD, SIGLIP_MEAN, SIGLIP_STD
        from ..models.idefics import IdeficsConfig, make_idefics_serving_fns
        from ..models.idefics2 import Idefics2Config, make_idefics2_serving_fns
        from ..models.openflamingo import (
            OpenFlamingoConfig,
            make_openflamingo_serving_fns,
        )

        cfg = bundle.model_cfg
        pam_ok = False
        if isinstance(cfg, IdeficsConfig):
            fns = make_idefics_serving_fns(cfg, bundle.eos_token_id)
            mean, std = CLIP_MEAN, CLIP_STD
        elif isinstance(cfg, Idefics2Config):
            fns = make_idefics2_serving_fns(cfg, bundle.eos_token_id)
            mean, std = SIGLIP_MEAN, SIGLIP_STD
            pam_ok = True  # NaViT variable resolution
        elif isinstance(cfg, OpenFlamingoConfig):
            fns = make_openflamingo_serving_fns(cfg, bundle.eos_token_id)
            mean, std = CLIP_MEAN, CLIP_STD
        else:
            raise TypeError(f"no serving fns for model cfg {type(cfg)!r}")
        prefill, decode, axes = fns

        mean_a = jnp.asarray(mean, jnp.float32)
        inv_std = 1.0 / jnp.asarray(std, jnp.float32)

        def norm_pixels(pixels):
            if pixels.dtype == jnp.uint8:
                pixels = (pixels.astype(jnp.float32) / 255.0 - mean_a) * inv_std
            return pixels

        def norm_prefill(params, pixels, pv, ids, mask, icv, cache_len, **kw):
            return prefill(
                params, norm_pixels(pixels), pv, ids, mask, icv, cache_len, **kw
            )

        # chunked prefill: greedy engines get the merged admit+decode
        # program for every family (beam groups keep the plain admit —
        # their step is the beam transition, not _make_step_parts)
        merged = None
        if not issubclass(cls, BeamServingEngine):
            if isinstance(cfg, IdeficsConfig):
                from ..models.idefics import make_idefics_merged_admit_fn

                raw_merged = make_idefics_merged_admit_fn(
                    cfg, bundle.eos_token_id
                )
            elif isinstance(cfg, Idefics2Config):
                from ..models.idefics2 import make_idefics2_merged_admit_fn

                raw_merged = make_idefics2_merged_admit_fn(
                    cfg, bundle.eos_token_id
                )
            else:
                from ..models.openflamingo import (
                    make_openflamingo_merged_admit_fn,
                )

                raw_merged = make_openflamingo_merged_admit_fn(
                    cfg, bundle.eos_token_id
                )

            def merged(
                params, dec_tok, dec_adv, dec_pos, cache, media, icv,
                pixels, pv, ids, mask, cache_len,
            ):
                return raw_merged(
                    params, dec_tok, dec_adv, dec_pos, cache, media, icv,
                    norm_pixels(pixels), pv, ids, mask, cache_len,
                )

        icv = kw.pop("icv_scaled", None)
        if icv is not None and bundle.intervention_layers is not None:
            from ..icv.encoder import expand_icv_to_layers

            icv = expand_icv_to_layers(
                icv, bundle.intervention_layers, cfg.text.n_layers
            )
        if kw.get("mesh") is not None:
            from .runner import _replicate_bundle_params

            _replicate_bundle_params(bundle, kw["mesh"])
        return cls(
            norm_prefill,
            decode,
            axes,
            cfg.text,
            bundle.params,
            eos_token_id=bundle.eos_token_id,
            pad_token_id=bundle.pad_token_id,
            icv_scaled=icv,
            supports_pixel_attention_mask=pam_ok,
            merged_admit_fn=merged,
            **kw,
        )

    # -- public API ----------------------------------------------------------

    def submit(self, request: Request) -> None:
        if request.max_new > self.out_cap:
            raise ValueError(
                f"max_new={request.max_new} exceeds out_cap={self.out_cap}"
            )
        if len(request.input_ids) > self.prompt_buckets[-1]:
            raise ValueError(
                f"prompt length {len(request.input_ids)} exceeds the largest "
                f"bucket {self.prompt_buckets[-1]}"
            )
        if request.pixel_attention_mask is not None and not (
            self.supports_pixel_attention_mask
        ):
            raise ValueError(
                "this engine's model family does not take a "
                "pixel_attention_mask (NaViT variable resolution is an "
                "idefics2 feature)"
            )
        n_img = np.asarray(request.pixel_values).shape[0]
        if self.max_images is not None and n_img > self.max_images:
            raise ValueError(
                f"request has {n_img} images > engine max_images="
                f"{self.max_images}"
            )
        if self._media_n_img is not None and n_img > self._media_n_img:
            # media buffers were already sized (from max_images or the first
            # admission); a wider request can no longer fit
            raise ValueError(
                f"request has {n_img} images but media buffers are sized "
                f"for {self._media_n_img}; construct the engine with "
                f"max_images={n_img}"
            )
        if self._clock_t0 is not None:  # online arrival clock
            import time

            self.arrival_s[request.uid] = time.perf_counter() - self._clock_t0
        self._queue.append(request)

    def run(self, on_complete: Optional[Callable] = None) -> dict:
        """Drain the queue; returns {uid: np.ndarray generated token ids}
        (up to and including EOS, exactly ``greedy_generate``'s emissions).
        ``completion_s[uid]`` records each request's wall-clock completion
        relative to this call.

        ``on_complete(uid, tokens)`` fires as each request finishes —
        streaming consumption; the callback may ``submit()`` follow-up
        requests, which admit into freed slots without draining the pool
        (the loop re-reads the queue every iteration)."""
        return self._serve(online=False, on_complete=on_complete)

    def run_online(
        self,
        on_complete: Optional[Callable] = None,
        idle_sleep_s: float = 0.002,
    ) -> dict:
        """Online serving loop: serves until :meth:`stop`, parking in a short
        sleep when idle instead of exiting.  ``submit()`` is safe to call
        from OTHER THREADS while this runs (deque appends are GIL-atomic;
        the loop re-reads the queue every iteration), so a frontend thread
        can feed an arrival process while the pool decodes.

        Clocks (seconds relative to this call's start): ``arrival_s`` at
        submit, ``admission_s`` when a request enters a slot,
        ``first_token_s`` when its first token is first OBSERVED at a
        harvest readback (an upper-bound TTFT, late by at most one chunk =
        ``sync_steps`` decode steps), ``completion_s`` at completion.

        ``stop()`` means "finish everything already submitted, then
        return": the loop drains queue+pool before exiting."""
        return self._serve(
            online=True, on_complete=on_complete, idle_sleep_s=idle_sleep_s
        )

    def stop(self) -> None:
        """Ask a live :meth:`run_online` loop to exit once idle (callable
        from any thread)."""
        self._stop_requested = True

    def _serve(self, online: bool, on_complete, idle_sleep_s: float = 0.002):
        import time

        self._ensure_pool()  # re-allocate if release_pool() dropped buffers
        results: dict = {}
        t0 = time.perf_counter()
        self._clock_t0 = t0 if online else None
        self._stop_requested = False

        def emit(done):
            now = time.perf_counter() - t0
            for uid, toks in done.items():
                self.completion_s[uid] = now
                if on_complete is not None:
                    on_complete(uid, toks)
            results.update(done)

        def now_rel():
            return time.perf_counter() - t0

        # pipelined loop: dispatch chunk k+1 (async) BEFORE blocking on
        # chunk k's flags, so the harvest readback overlaps device compute.
        # Safe because state is never donated (only the cache is): chunk
        # k's output state stays readable after k+1 consumes it.  Harvest
        # therefore lags one chunk — a finished slot's flags are monotonic
        # and its out/tok_count freeze once finished, so the stale read is
        # exact, just one chunk late.
        prev = None  # (state handle, generation id)
        while True:
            if not (self._queue or any(s is not None for s in self._slots)):
                if prev is not None:  # drain the lagged harvest before parking
                    emit(self._harvest(*prev, now=now_rel()))
                    prev = None
                if not online or self._stop_requested:
                    break
                time.sleep(idle_sleep_s)
                continue
            self._admit_pending()
            if any(s is not None for s in self._slots):
                self._cache, self._state = self._chunk()(
                    self.params, self._cache, self._media, self._state, self._icv
                )
                self.steps_run += self.sync_steps
                self._chunk_count += 1
                if self.harvest_lag == 0:
                    # block on THIS chunk's flags: finished slots refill at
                    # the very next admission (see harvest_lag docstring)
                    emit(
                        self._harvest(
                            self._state, self._chunk_count, now=now_rel()
                        )
                    )
                else:
                    if prev is not None:
                        emit(self._harvest(*prev, now=now_rel()))
                    prev = (self._state, self._chunk_count)
        # drain: the last chunk's flags were never read
        emit(self._harvest(self._state, self._chunk_count, now=now_rel()))
        self._clock_t0 = None
        return results

    # -- admission -----------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds buckets")

    def _group_key(self, r: Request):
        """Admission-compatibility key: same prompt bucket AND same media
        shapes (np.stack in _admit_group needs uniform pixel/mask shapes;
        mixed-image-count or mixed-resolution workloads split into
        shape-homogeneous groups)."""
        pam = r.pixel_attention_mask
        return (
            self._bucket_for(len(r.input_ids)),
            tuple(np.asarray(r.pixel_values).shape),
            None if pam is None else tuple(np.asarray(pam).shape),
        )

    def _admit_pending(self) -> None:
        free = [i for i, s in enumerate(self._slots) if s is None]
        while free and self._queue:
            key = self._group_key(self._queue[0])
            # collect same-shape requests in queue order (others keep their
            # positions — standard length-grouped admission)
            group: list[Request] = []
            limit = min(self.admit_sizes[0], len(free))
            for r in list(self._queue):
                if self._group_key(r) == key:
                    group.append(r)
                    if len(group) == limit:
                        break
            adm = next(a for a in self.admit_sizes if a <= max(len(group), 1))
            group = group[:adm]
            for r in group:
                self._queue.remove(r)
            slots = [free.pop() for _ in group]
            self._admit_group(group, slots, key[0])

    def _admit_group(self, group: list, slots: list, bucket: int) -> None:
        adm = len(group)
        pad = self.pad_token_id
        ids = np.full((adm, bucket), pad, np.int32)
        mask = np.zeros((adm, bucket), np.int32)
        for i, r in enumerate(group):  # LEFT padding (decode convention)
            n = len(r.input_ids)
            ids[i, bucket - n :] = np.asarray(r.input_ids, np.int32)
            mask[i, bucket - n :] = 1
        pixels = np.stack([np.asarray(r.pixel_values) for r in group])
        pv = np.stack(
            [
                np.ones(pixels.shape[1], bool)
                if r.pixel_valid is None
                else np.asarray(r.pixel_valid, bool)
                for r in group
            ]
        )
        max_new = np.asarray([r.max_new for r in group], np.int32)
        min_new = np.asarray([r.min_new for r in group], np.int32)
        slot_arr = np.asarray(slots, np.int32)
        pam = None
        if group[0].pixel_attention_mask is not None:  # uniform per group key
            pam = np.stack(
                [np.asarray(r.pixel_attention_mask) for r in group]
            )

        if self._media is None:
            self._alloc_media(pixels, pv, ids, mask, bucket, pam=pam)
        # merged admit+decode (chunked prefill) only pays off when the pool
        # has occupants to keep decoding; an empty pool takes the plain
        # prefill-only program (cheaper compile, no dead decode lane)
        merged = (
            self._merged_admit is not None
            and self.merged_admit_in_run
            and pam is None
            and any(s is not None for s in self._slots)
        )
        pam_key = None if pam is None else pam.shape[1:]
        key = (adm, bucket, pixels.shape[1:], str(pixels.dtype), pam_key, merged)
        if key not in self._admit_jits:
            self._admit_jits[key] = (
                self._build_merged_admit(bucket)
                if merged
                else self._build_admit(bucket, with_pam=pam is not None)
            )
        args = [
            self.params,
            self._cache,
            self._media,
            self._state,
            self._icv,
            jnp.asarray(slot_arr),
            jnp.asarray(pixels),
            jnp.asarray(pv),
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(max_new),
            jnp.asarray(min_new),
        ]
        if pam is not None:
            args.append(jnp.asarray(pam))
        self._cache, self._media, self._state = self._admit_jits[key](*args)
        if merged:
            # the merged program advanced the pool one lockstep step: count
            # it as a chunk (ids stay monotonic; this state fully reflects
            # the slots it admits, so admitted_at = its id - 1 makes them
            # harvestable from it onward and not from any earlier state)
            self.steps_run += 1
            self._chunk_count += 1
            self.merged_admits += 1
        admitted_at = self._chunk_count - 1 if merged else self._chunk_count
        if self._clock_t0 is not None:  # online admission clock
            import time

            adm_now = time.perf_counter() - self._clock_t0
            for r in group:
                self.admission_s[r.uid] = adm_now
        for r, s in zip(group, slots):
            self._slots[s] = _Slot(r, len(r.input_ids), admitted_at)

    def _alloc_media(self, pixels, pv, ids, mask, bucket, pam=None) -> None:
        """Size the per-slot media buffers from the prefill's output avals
        (no compute): batch axis → n_slots, other dims/dtypes as traced.
        With ``max_images`` set, buffers size to that image count (the
        admission's scatter zero-pads narrower groups up to it)."""
        n_img = pixels.shape[1] if self.max_images is None else self.max_images
        px_shape = (pixels.shape[0], n_img) + pixels.shape[2:]
        avals = [
            self.params,
            jax.ShapeDtypeStruct(px_shape, pixels.dtype),
            jax.ShapeDtypeStruct((pv.shape[0], n_img), pv.dtype),
            jax.ShapeDtypeStruct(ids.shape, jnp.int32),
            jax.ShapeDtypeStruct(mask.shape, jnp.int32),
            self._icv,
        ]
        if pam is None:
            fn = partial(self._prefill, cache_len=bucket)
        else:
            # pam must be a POSITIONAL eval_shape arg (a partial-bound
            # ShapeDtypeStruct kwarg would reach the fn un-abstracted)
            fn = lambda p, px, v, i, m, icv, pm: self._prefill(  # noqa: E731
                p, px, v, i, m, icv, bucket, pixel_attention_mask=pm
            )
            avals.append(
                jax.ShapeDtypeStruct(
                    (pam.shape[0], n_img) + pam.shape[2:], pam.dtype
                )
            )
        _, _, media_aval, _ = jax.eval_shape(fn, *avals)
        self._media_n_img = n_img

        def alloc(ax):
            def f(aval):
                shape = list(aval.shape)
                shape[ax] = self.n_slots
                z = jnp.zeros(shape, aval.dtype)
                return self._shard_batch_ax(z, ax) if self.mesh is not None else z

            return f

        self._media = {
            k: jax.tree.map(alloc(ax), media_aval[k])
            for k, ax in self._media_axes.items()
        }

    def _scatter_admit(
        self, cache, media, state, slots, bucket,
        last, small, new_media, next_pos, max_new, min_new,
    ):
        """Scatter one prefilled admission group into the slot arrays —
        shared by the host-driven admit jit and the fused on-device loop
        (``slots`` may be a traced array)."""

        def rows(big, sm):  # K/V planes: (L, B, S, ...) — cols [0:bucket]
            return big.at[:, slots, :bucket].set(sm)

        out_cache = dict(cache)
        for key in ("k", "v"):
            if isinstance(cache[key], dict):
                out_cache[key] = {
                    "q": rows(cache[key]["q"], small[key]["q"]),
                    "s": rows(cache[key]["s"], small[key]["s"]),
                }
            else:
                out_cache[key] = rows(cache[key], small[key])
        out_cache["pos"] = cache["pos"].at[slots, :bucket].set(small["pos"])
        out_cache["valid"] = (
            cache["valid"].at[slots, :bucket].set(small["valid"])
        )
        out_cache["index"] = cache["index"].at[slots].set(small["index"])

        out_media = dict(media)
        for key, ax in self._media_axes.items():

            def scat(big, sm, ax=ax):
                # zero-pad up to the buffer's non-batch dims (mixed image
                # counts: a k-image group scatters into max_images-wide
                # buffers; zero latents/xattn-KV/onehot columns are never
                # attended because the per-image masks derive from
                # pixel_valid, False beyond the group's real images)
                pads = [
                    (0, 0) if d == ax else (0, big.shape[d] - sm.shape[d])
                    for d in range(sm.ndim)
                ]
                if any(p != (0, 0) for p in pads):
                    sm = jnp.pad(sm, pads)
                return (
                    big.at[slots].set(sm) if ax == 0 else big.at[:, slots].set(sm)
                )

            out_media[key] = jax.tree.map(scat, media[key], new_media[key])

        st = dict(
            state,
            active=state["active"].at[slots].set(True),
            finished=state["finished"].at[slots].set(False),
            tok_count=state["tok_count"].at[slots].set(0),
            next_pos=state["next_pos"].at[slots].set(next_pos),
            max_new=state["max_new"].at[slots].set(max_new),
            min_new=state["min_new"].at[slots].set(min_new),
            last_logits=state["last_logits"].at[slots].set(last),
            out=state["out"].at[slots].set(0),
        )
        return out_cache, out_media, st

    def _build_admit(self, bucket: int, with_pam: bool = False):
        prefill = self._prefill

        def admit(
            params, cache, media, state, icv, slots, pixels, pv, ids, mask,
            max_new, min_new, *pam,
        ):
            kw = {"pixel_attention_mask": pam[0]} if with_pam else {}
            last, small, new_media, next_pos = prefill(
                params, pixels, pv, ids, mask, icv, bucket, **kw
            )
            return self._scatter_admit(
                cache, media, state, slots, bucket,
                last, small, new_media, next_pos, max_new, min_new,
            )

        # state is deliberately NOT donated: the pipelined run() loop reads
        # the PREVIOUS chunk's state for harvest after later calls consumed
        # it — donation would invalidate those buffers.  State is ~1 MB
        # (flags + last_logits + out); the multi-GB cache/media are donated.
        return jax.jit(admit, donate_argnums=(1, 2))

    def _build_merged_admit(self, bucket: int):
        """Admission as ONE merged program: a pool decode step (exact
        ``_make_step`` emit/update math) + the group's prefill, with the
        decoder projections packed over both token streams so the per-layer
        weights stream from HBM once for both (chunked prefill; see
        ``models.idefics.make_idefics_merged_admit_fn``).  Token semantics
        per slot are unchanged — the pool just no longer stalls while a
        prefill runs."""
        merged_fn = self._merged_admit
        emit_phase, post_phase = self._make_step_parts()

        def admit(
            params, cache, media, state, icv, slots, pixels, pv, ids, mask,
            max_new, min_new,
        ):
            emit, tok, adv, out, finished = emit_phase(state)
            old_index = cache["index"]
            (
                dec_logits, cache, last_p, small, new_media, next_pos_p,
            ) = merged_fn(
                params, tok[:, None], adv[:, None],
                state["next_pos"][:, None], cache, media, icv,
                pixels, pv, ids, mask, bucket,
            )
            cache = dict(cache, index=old_index + adv)  # non-emitting rows hold
            state = post_phase(state, dec_logits, emit, adv, out, finished)
            return self._scatter_admit(
                cache, media, state, slots, bucket,
                last_p, small, new_media, next_pos_p, max_new, min_new,
            )

        return jax.jit(admit, donate_argnums=(1, 2))

    # -- decode --------------------------------------------------------------

    def _chunk(self):
        if self._chunk_jit is None:
            self._chunk_jit = self._build_chunk()
        return self._chunk_jit

    def _make_step_parts(self):
        """The greedy step's bookkeeping, split around the forward so the
        merged admit+decode program (``_build_merged_admit``) can reuse the
        EXACT emit/update math with a different forward in the middle."""
        eos, pad = self.eos_token_id, self.pad_token_id
        cols = np.arange(self.out_cap, dtype=np.int32)

        def emit_phase(state):
            """Pending-token emission for every active-unfinished slot:
            greedy_generate-exact argmax + min_new EOS suppression."""
            emit = state["active"] & ~state["finished"]
            lg = state["last_logits"]
            lg = jnp.where(
                (state["tok_count"] < state["min_new"])[:, None],
                lg.at[:, eos].set(NEG_INF),
                lg,
            )
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            tok = jnp.where(emit, tok, pad)
            write = emit[:, None] & (
                jnp.asarray(cols)[None, :] == state["tok_count"][:, None]
            )
            out = jnp.where(write, tok[:, None], state["out"])
            finished = state["finished"] | (
                emit
                & ((tok == eos) | (state["tok_count"] + 1 >= state["max_new"]))
            )
            return emit, tok, emit.astype(jnp.int32), out, finished

        def post_phase(state, logits, emit, adv, out, finished):
            return dict(
                state,
                last_logits=jnp.where(
                    emit[:, None],
                    logits[:, -1, :].astype(jnp.float32),
                    state["last_logits"],
                ),
                tok_count=state["tok_count"] + adv,
                next_pos=state["next_pos"] + adv,
                finished=finished,
                out=out,
            )

        return emit_phase, post_phase

    def _make_step(self):
        """One lockstep decode step over the whole pool — the shared body of
        the host-driven chunk and the fused on-device loop.  Emits each
        active-unfinished slot's pending token (greedy_generate-exact argmax
        + min_new EOS suppression), forwards it, advances per-row indices."""
        decode_fn = self._decode
        emit_phase, post_phase = self._make_step_parts()

        def step(params, state, cache, media, icv):
            emit, tok, adv, out, finished = emit_phase(state)
            old_index = cache["index"]
            logits, cache = decode_fn(
                params,
                tok[:, None],
                adv[:, None],
                state["next_pos"][:, None],
                cache,
                icv,
                media,
            )
            # rows that did not emit must not advance their write index
            # (forward_hidden bumps every row; correct it per-row here —
            # the masked row's K/V write landed with valid=False, so the
            # column is re-written when the slot really advances)
            cache = dict(cache, index=old_index + adv)
            state = post_phase(state, logits, emit, adv, out, finished)
            return state, cache

        return step

    def _build_chunk(self):
        step_once = self._make_step()
        sync_steps = self.sync_steps

        def chunk(params, cache, media, state, icv):
            def body(carry, _):
                state, cache = carry
                state, cache = step_once(params, state, cache, media, icv)
                return (state, cache), None

            (state, cache), _ = jax.lax.scan(
                body, (state, cache), None, length=sync_steps
            )
            return cache, state

        # cache-only donation (see _build_admit: harvest reads lagged state)
        return jax.jit(chunk, donate_argnums=(1,))

    # -- fused on-device serving (offline/batch mode) -------------------------

    def run_fused(self) -> dict:
        """Drain the whole queue as ONE jitted on-device program.

        The host-driven :meth:`run` pays a dispatch/sync round trip per
        chunk and per admission — ~100 ms each through a remote-dispatch
        relay, which dwarfs a ~15 ms decode step.  This mode moves the
        ENTIRE scheduler onto the device: requests (padded to one prompt
        bucket) upload once, then a ``lax.while_loop`` either admits
        pending requests into free slots (prefill + scatter — all static
        shapes, traced slot indices; ONE lane-masked K-lane branch with
        K = ``admit_sizes[0]`` handles fill, drip and drain — lanes past
        the pending tail admit to slots that immediately deactivate) or
        decodes one lockstep step for the pool; finished slots release and refill with
        ZERO host involvement, and results read back once at the end.
        Trade-off vs run(): no mid-flight streaming/submission — built for
        offline workloads (batch eval, dataset sweeps).

        Token semantics are identical to :meth:`run` (same step body).
        """
        import time

        reqs = list(self._queue)
        self._queue.clear()
        if not reqs:
            return {}
        r_n = len(reqs)
        bucket = self._bucket_for(max(len(r.input_ids) for r in reqs))
        pad = self.pad_token_id
        ids = np.full((r_n, bucket), pad, np.int32)
        mask = np.zeros((r_n, bucket), np.int32)
        for i, r in enumerate(reqs):
            n = len(r.input_ids)
            ids[i, bucket - n :] = np.asarray(r.input_ids, np.int32)
            mask[i, bucket - n :] = 1
        pixels = np.stack([np.asarray(r.pixel_values) for r in reqs])
        pv = np.stack(
            [
                np.ones(pixels.shape[1], bool)
                if r.pixel_valid is None
                else np.asarray(r.pixel_valid, bool)
                for r in reqs
            ]
        )
        max_new = np.asarray([r.max_new for r in reqs], np.int32)
        min_new = np.asarray([r.min_new for r in reqs], np.int32)

        if self._media is None:
            self._alloc_media(pixels[:1], pv[:1], ids[:1], mask[:1], bucket)
        key = ("fused", r_n, bucket, pixels.shape[1:], str(pixels.dtype))
        if key not in self._admit_jits:
            self._admit_jits[key] = self._build_fused(r_n, bucket)
        t0 = time.perf_counter()
        out, lens, stats = self._admit_jits[key](
            self.params,
            jnp.asarray(ids),
            jnp.asarray(mask),
            jnp.asarray(pixels),
            jnp.asarray(pv),
            jnp.asarray(max_new),
            jnp.asarray(min_new),
            self._icv,
        )
        out, lens, stats = jax.device_get((out, lens, stats))
        self.fused_stats = {"admit_iters": int(stats[0]), "decode_iters": int(stats[1])}
        done = time.perf_counter() - t0
        results = {}
        for i, r in enumerate(reqs):
            results[r.uid] = out[i, : lens[i]].copy()
            self.completion_s[r.uid] = done
        return results

    def _build_fused(self, r_n: int, bucket: int):
        prefill = self._prefill
        step_once = self._make_step()
        n_slots = self.n_slots
        # group admission width from the engine's admit_sizes knob: when
        # >=K slots are free AND >=1 request is pending, one loop iteration
        # prefills up to K requests (initial pool fill costs n_slots/K
        # iterations instead of n_slots); the pending tail rides the SAME
        # K-lane program with masked lanes, so only two branch programs
        # (admit, decode) are ever traced into the while body.
        # admit_sizes=(1,) forces adm=1 prefill numerics in fused mode too
        # (prefill logits are batch-shape-dependent in bf16 — module
        # docstring), and bounds the K-lane prefill's activation memory
        # alongside the pool cache.
        adm_k = min(self.admit_sizes[0], n_slots, r_n)

        def fused(params, ids, mask, pixels, pv, max_new, min_new, icv):
            cache = self._init_cache()
            state = self._init_state()
            # zeros from SHAPES, not zeros_like(concrete buffers): the
            # latter would constant-fold multi-MB zero arrays into the
            # program (remote-compile payload bloat)
            media = jax.tree.map(
                lambda x: jnp.zeros(x.shape, x.dtype), self._media
            )
            carry = (
                state,
                cache,
                media,
                jnp.zeros((n_slots,), jnp.int32),  # slot -> request id
                # +1 dump row: released slots' stale pointers scatter there
                jnp.zeros((r_n + 1, self.out_cap), jnp.int32),
                jnp.zeros((r_n + 1,), jnp.int32),
                jnp.int32(0),  # next request to admit
                jnp.zeros((2,), jnp.int32),  # (admit, decode) iteration stats
            )

            def cond(c):
                state, *_, next_req, _stats = c
                return (next_req < r_n) | jnp.any(state["active"])

            def release(state_pre, state_post, slot_req, res_out, res_len):
                """Release slots that finished in this step: their out rows
                scatter to results[request id]; everything else targets the
                dump row (index r_n), so stale pointers never collide."""
                newly = state_post["finished"] & ~state_pre["finished"]
                tgt = jnp.where(newly, slot_req, r_n)
                res_out = res_out.at[tgt].set(state_post["out"])
                res_len = res_len.at[tgt].set(state_post["tok_count"])
                state_post = dict(
                    state_post, active=state_post["active"] & ~newly
                )
                return state_post, res_out, res_len

            def make_admit(k):
                # k-lane admission with LANE MASKING: guarded by >=k free
                # slots and >=1 pending request.  Lanes past the pending
                # tail re-prefill the last request (clamped index); their
                # slots scatter normally, then flip back to inactive with a
                # dump-row request pointer, so they free up next iteration
                # and never harvest.  A stable argsort puts the k free
                # (False) slots first and stays a permutation (distinct
                # targets).  ONE admission branch handles fill, drip and
                # drain — the old separate single-lane drip doubled the
                # while-body's traced branch programs (and their buffer
                # peaks), the 64-slot OOM's biggest lever.  With a merged
                # admit fn the lane ALSO advances the pool one lockstep
                # step (chunked prefill: the prefill packs into the pool
                # step's weight stream) — an admission iteration then costs
                # ~a decode step instead of stalling the pool.
                merged_fn = self._merged_admit
                emit_phase, post_phase = self._make_step_parts()

                def admit(c):
                    state, cache, media, slot_req, res_out, res_len, next_req, stats = c
                    js_raw = next_req + jnp.arange(k, dtype=jnp.int32)
                    lane_ok = js_raw < r_n
                    js = jnp.minimum(js_raw, r_n - 1)
                    slots = jnp.argsort(state["active"])[:k].astype(jnp.int32)
                    if merged_fn is None:
                        last, small, new_media, next_pos = prefill(
                            params, pixels[js], pv[js], ids[js], mask[js],
                            icv, bucket,
                        )
                    else:
                        emit, tok, adv, out, finished = emit_phase(state)
                        old_index = cache["index"]
                        (
                            dec_logits, cache, last, small, new_media,
                            next_pos,
                        ) = merged_fn(
                            params, tok[:, None], adv[:, None],
                            state["next_pos"][:, None], cache, media, icv,
                            pixels[js], pv[js], ids[js], mask[js], bucket,
                        )
                        cache = dict(cache, index=old_index + adv)
                        new_state = post_phase(
                            state, dec_logits, emit, adv, out, finished
                        )
                        state, res_out, res_len = release(
                            state, new_state, slot_req, res_out, res_len
                        )
                        stats = stats.at[1].add(1)
                    cache, media, state = self._scatter_admit(
                        cache, media, state, slots, bucket,
                        last, small, new_media, next_pos,
                        max_new[js], min_new[js],
                    )
                    state = dict(
                        state, active=state["active"].at[slots].set(lane_ok)
                    )
                    return (
                        state, cache, media,
                        slot_req.at[slots].set(jnp.where(lane_ok, js, r_n)),
                        res_out, res_len,
                        next_req + jnp.sum(lane_ok.astype(jnp.int32)),
                        stats.at[0].add(1),
                    )

                return admit

            admit_k = make_admit(adm_k)

            def decode(c):
                state, cache, media, slot_req, res_out, res_len, next_req, stats = c
                new_state, cache = step_once(params, state, cache, media, icv)
                new_state, res_out, res_len = release(
                    state, new_state, slot_req, res_out, res_len
                )
                return (
                    new_state, cache, media, slot_req,
                    res_out, res_len, next_req,
                    stats.at[1].add(1),
                )

            def body(c):
                state, *_, next_req, _stats = c
                free = jnp.sum(~state["active"])
                pending = r_n - next_req
                # lane masking makes the K-lane program complete for ANY
                # pending >= 1 — the while-body traces exactly TWO branch
                # programs (admit, decode) regardless of adm_k
                can = (free >= adm_k) & (pending >= 1)
                return jax.lax.cond(can, admit_k, decode, c)

            out = jax.lax.while_loop(cond, body, carry)
            return out[4][:r_n], out[5][:r_n], out[7]

        return jax.jit(fused)

    # -- harvest -------------------------------------------------------------

    def _harvest_rows(self):
        """Pool row that carries each tracked slot's result (identity for the
        greedy engine; group row 0 for the beam engine)."""
        return lambda i: i

    def _harvest(self, state, state_gen: int, now: Optional[float] = None) -> dict:
        """Free finished slots visible in ``state`` (produced by chunk
        ``state_gen``); slots admitted at or after that chunk still show the
        previous occupant there and are skipped.  With ``now`` (online
        clock), records each live slot's first-token observation time —
        an upper-bound TTFT late by at most one harvest interval."""
        live = [
            i
            for i, s in enumerate(self._slots)
            if s is not None and s.admitted_at < state_gen
        ]
        if not live:
            return {}
        finished, counts, out = jax.device_get(
            (state["finished"], state["tok_count"], state["out"])
        )
        row = self._harvest_rows()
        results = {}
        for i in live:
            r = row(i)
            uid = self._slots[i].request.uid
            if now is not None and counts[r] > 0 and uid not in self.first_token_s:
                self.first_token_s[uid] = now
            if finished[r]:
                results[uid] = out[r, : counts[r]].copy()
                self._slots[i] = None
        return results


class BeamServingEngine(ServingEngine):
    """Continuous batching for BEAM SEARCH — the reference's default eval
    decode (``num_beams=3``, reference: config/inference.yaml:26-30), which
    the greedy engine could not serve (TODO follow-up: "beam-search slots").

    Each request occupies a contiguous GROUP of ``num_beams`` pool rows
    (``n_slots`` counts REQUESTS; the pool allocates ``n_slots*num_beams``
    rows).  Admission prefills once per request and replicates the prefill
    K/V / media / logits across the group's rows (exactly ``beam_generate``'s
    ``jnp.repeat`` after the shared prefill).  Each lockstep decode step runs
    one HF-semantics beam transition per live group — top-2K candidate
    expansion, EOS candidates retired to a K-slot finished pool, live beams
    re-selected — then permutes only the DECODED TAIL of the group's cache
    rows by beam parent (rows below the smallest prompt bucket are
    prefill-written and bitwise identical across a group's beams, the same
    argument as decode._beam_gather_cache) and forwards the K selected
    tokens.  Per-request results are the HF-finalized best hypothesis,
    token-identical to ``beam_generate`` (tests/test_serving.py).

    Raggedness the static beam path cannot exploit:
    - mixed prompt buckets and per-request ``max_new`` (groups free and
      refill independently);
    - **early release** at ``length_penalty <= 0.0`` (the reference uses
      0.0): once a group's finished pool holds K hypotheses and its
      worst pooled score >= its best live score, no continuation can enter
      the pool or win the final merge (per-step logprobs are <= 0, and for
      lp < 0 the divisor ``len**lp`` is in (0, 1], so a future finisher's
      penalized score is <= its raw live score — strictly below the pool's
      worst), so the final answer is already decided — the group frees
      immediately instead of burning the remaining ``max_new - t`` lockstep
      steps.  This is HF's ``BeamHypotheses.is_done`` condition; exactness
      is argued in decode.beam_generate's docstring (ties resolve toward
      the pool in both places).  For ``length_penalty > 0`` groups always
      run the full ``max_new`` steps (a later EOS divides by a larger
      length and can score HIGHER, so the early bound no longer holds).

    Length-penalty caveat: hypothesis scores divide by ``true prompt length
    + generated length``; the static batch path divides by the PADDED batch
    length (HF semantics — batching-dependent).  Identical at the
    reference's ``length_penalty=0.0``; for lp != 0 the engine matches a
    bs=1 (unpadded) HF run, which is the batching-independent answer.

    Multi-chip: with ``mesh``, the GROUP pool shards over the dp axis —
    ``n_slots`` (groups) must divide dp so each chip holds whole groups of
    ``num_beams`` rows (the per-group transition reshapes ``(G·K,) →
    (G, K)``, which stays shard-local only on group boundaries); a tp>1
    axis Megatron-shards the frozen weights exactly as the static path
    (``runner._replicate_bundle_params``) — the beam transition itself is
    tiny per-group math that GSPMD replicates.  ``run_fused`` stays
    greedy-only.
    """

    def __init__(
        self,
        prefill_fn,
        decode_fn,
        media_axes,
        text_cfg,
        params,
        *,
        num_beams: int = 3,
        length_penalty: float = 0.0,
        n_slots: int = 4,
        mesh=None,
        **kw,
    ):
        if num_beams < 2:
            raise ValueError("BeamServingEngine needs num_beams >= 2; use "
                             "ServingEngine for greedy")
        if mesh is not None and int(n_slots) % mesh.shape.get("dp", 1):
            raise ValueError(
                f"n_slots={n_slots} beam GROUPS must divide over dp="
                f"{mesh.shape.get('dp', 1)} (each chip holds whole groups "
                f"of num_beams rows)"
            )
        if kw.pop("merged_admit_fn", None) is not None:
            raise NotImplementedError(
                "merged admit+decode (chunked prefill) is greedy-only: the "
                "beam pool's step is the beam transition, not the greedy "
                "emit the merged program embeds"
            )
        self.num_beams = int(num_beams)
        self.length_penalty = float(length_penalty)
        self.n_groups = int(n_slots)
        super().__init__(
            prefill_fn, decode_fn, media_axes, text_cfg, params,
            n_slots=self.n_groups * self.num_beams, mesh=mesh, **kw,
        )
        # slot tracking is per GROUP (one request per group)
        self._slots = [None] * self.n_groups

    # -- state ----------------------------------------------------------------

    def _init_state(self) -> dict:
        st = super()._init_state()
        g, k, cap = self.n_slots // self.num_beams, self.num_beams, self.out_cap
        st.update(
            # true (unpadded) prompt length per row — the lp divisor
            plen=jnp.zeros((self.n_slots,), jnp.int32),
            beam_live=jnp.full((g, k), NEG_INF, jnp.float32),
            beam_fin=jnp.full((g, k), NEG_INF, jnp.float32),
            beam_fin_tok=jnp.full((g, k, cap), self.pad_token_id, jnp.int32),
        )
        return st

    # -- admission ------------------------------------------------------------

    def _build_admit(self, bucket: int, with_pam: bool = False):
        prefill = self._prefill
        nb = self.num_beams
        cap, pad = self.out_cap, self.pad_token_id

        def admit(
            params, cache, media, state, icv, groups, pixels, pv, ids, mask,
            max_new, min_new, *pam,
        ):
            adm = ids.shape[0]
            kw = {"pixel_attention_mask": pam[0]} if with_pam else {}
            last, small, new_media, next_pos = prefill(
                params, pixels, pv, ids, mask, icv, bucket, **kw
            )
            # replicate the shared prefill across each group's beam rows
            # (beam_generate's rep step); rows of group g are [g*nb, (g+1)*nb)
            rows = (groups[:, None] * nb + jnp.arange(nb)[None, :]).reshape(-1)
            rep0 = lambda x: jnp.repeat(x, nb, axis=0)
            small = dict(
                {k: jax.tree.map(lambda x: jnp.repeat(x, nb, axis=1), small[k])
                 for k in ("k", "v")},
                pos=rep0(small["pos"]),
                valid=rep0(small["valid"]),
                # prefill caches carry a SCALAR write index (init_kv_cache);
                # broadcast per request before replicating across beam rows
                index=rep0(jnp.broadcast_to(small["index"], (adm,))),
            )
            new_media = {
                k: jax.tree.map(
                    partial(jnp.repeat, repeats=nb, axis=ax), new_media[k]
                )
                for k, ax in self._media_axes.items()
            }
            cache, media, st = self._scatter_admit(
                cache, media, state, rows, bucket,
                rep0(last), small, new_media, rep0(next_pos),
                rep0(max_new), rep0(min_new),
            )
            # beam bookkeeping: beam 0 starts at score 0, the rest at -inf
            # (forces the first transition to expand only the shared prefill
            # distribution once — decode.beam_generate's live_scores init)
            live0 = jnp.full((adm, nb), NEG_INF).at[:, 0].set(0.0)
            st = dict(
                st,
                plen=st["plen"].at[rows].set(
                    rep0(jnp.sum(mask, axis=1).astype(jnp.int32))
                ),
                beam_live=st["beam_live"].at[groups].set(live0),
                beam_fin=st["beam_fin"].at[groups].set(
                    jnp.full((adm, nb), NEG_INF)
                ),
                beam_fin_tok=st["beam_fin_tok"].at[groups].set(
                    jnp.full((adm, nb, cap), pad, jnp.int32)
                ),
            )
            return cache, media, st

        return jax.jit(admit, donate_argnums=(1, 2))

    # -- decode ---------------------------------------------------------------

    def _tail_permute(self, cache, sel_rows):
        """Permute only the decoded tail of the K/V planes by ``sel_rows``
        (pool-row parent index).  Rows below the smallest prompt bucket are
        prefill-written and identical across a group's beams; ``pos``/
        ``valid``/``index`` advance in lockstep within a group, so only the
        K/V tails can differ (decode._beam_gather_cache, per-row form)."""
        start = self.prompt_buckets[0]

        def tail(x):
            t = jax.lax.slice_in_dim(x, start, x.shape[2], axis=2)
            t = jnp.take(t, sel_rows, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(x, t, start, axis=2)

        out = dict(cache)
        for key in ("k", "v"):
            out[key] = jax.tree.map(tail, cache[key])
        return out

    def _make_step(self):
        decode_fn = self._decode
        eos, pad = self.eos_token_id, self.pad_token_id
        k, cap, lp = self.num_beams, self.out_cap, self.length_penalty
        g, rows = self.n_slots // self.num_beams, self.n_slots
        early_ok = lp <= 0.0  # see class docstring
        cols = np.arange(cap, dtype=np.int32)

        def step(params, state, cache, media, icv):
            act = state["active"][::k]
            emit = act & ~state["finished"][::k]  # (G,) live groups
            t = state["tok_count"][::k]
            max_new_g = state["max_new"][::k]
            min_new_g = state["min_new"][::k]
            plen_g = state["plen"][::k]

            # ---- beam transition (decode.beam_generate::transition) ----
            logp = jax.nn.log_softmax(
                state["last_logits"].reshape(g, k, -1), axis=-1
            )
            vocab = logp.shape[-1]
            logp = jnp.where(
                (t < min_new_g)[:, None, None],
                logp.at[:, :, eos].set(NEG_INF),
                logp,
            )
            cand = state["beam_live"][:, :, None] + logp
            from .decode import _topk_2k_two_stage

            top_scores, src_beam, token = _topk_2k_two_stage(cand, g, k, vocab)
            is_eos = token == eos

            out_g = state["out"].reshape(g, k, cap)
            parent_hist = jnp.take_along_axis(out_g, src_beam[:, :, None], axis=1)
            cand_hist = jnp.where(
                jnp.asarray(cols)[None, None, :] == t[:, None, None],
                token[:, :, None],
                parent_hist,
            )

            # finished pool: EOS candidates ranked < K compete for K slots;
            # HF's length penalty divides by (prompt + generated) length
            lp_len = (plen_g + t + 1).astype(jnp.float32)
            rank_ok = jnp.arange(2 * k, dtype=jnp.int32)[None, :] < k
            eos_scores = jnp.where(
                is_eos & rank_ok, top_scores / (lp_len[:, None] ** lp), NEG_INF
            )
            pool_s = jnp.concatenate([state["beam_fin"], eos_scores], axis=1)
            pool_t = jnp.concatenate([state["beam_fin_tok"], cand_hist], axis=1)
            new_fin, best_i = jax.lax.top_k(pool_s, k)
            new_fin_tok = jnp.take_along_axis(pool_t, best_i[:, :, None], axis=1)

            live_cand = jnp.where(is_eos, NEG_INF, top_scores)
            new_live, sel = jax.lax.top_k(live_cand, k)
            new_beam = jnp.take_along_axis(src_beam, sel, axis=1)
            new_tok = jnp.take_along_axis(token, sel, axis=1)
            new_out = jnp.take_along_axis(cand_hist, sel[:, :, None], axis=1)

            # ---- group finish: last transition, or safe early release ----
            last_t = t + 1 >= max_new_g
            early = (
                jnp.all(new_fin > NEG_INF / 2, axis=1)
                & (jnp.min(new_fin, axis=1) >= jnp.max(new_live, axis=1))
                if early_ok
                else jnp.zeros((g,), bool)
            )
            fin_now = emit & (last_t | early)
            cont = emit & ~fin_now

            # finalize finishing groups: merge live beams into the pool
            # (beam_generate's HF finalize) and pick the best hypothesis
            live_final = new_live / (lp_len[:, None] ** lp)
            all_s = jnp.concatenate([new_fin, live_final], axis=1)
            all_t = jnp.concatenate([new_fin_tok, new_out], axis=1)
            best = jnp.argmax(all_s, axis=1)
            best_tok = jnp.take_along_axis(all_t, best[:, None, None], axis=1)[:, 0]
            hit = best_tok == eos
            best_len = jnp.where(
                jnp.any(hit, axis=1),
                jnp.argmax(hit, axis=1).astype(jnp.int32) + 1,
                t + 1,
            )

            # ---- write back per-row state ----
            cont_r = jnp.repeat(cont, k)
            out = jnp.where(
                cont_r[:, None], new_out.reshape(rows, cap), state["out"]
            )
            out = out.at[::k].set(
                jnp.where(fin_now[:, None], best_tok, out[::k])
            )
            adv = cont_r.astype(jnp.int32)
            tok_count = state["tok_count"] + adv
            tok_count = tok_count.at[::k].set(
                jnp.where(fin_now, best_len, tok_count[::k])
            )
            state = dict(
                state,
                beam_live=jnp.where(emit[:, None], new_live, state["beam_live"]),
                beam_fin=jnp.where(emit[:, None], new_fin, state["beam_fin"]),
                beam_fin_tok=jnp.where(
                    emit[:, None, None], new_fin_tok, state["beam_fin_tok"]
                ),
                finished=state["finished"] | jnp.repeat(fin_now, k),
                out=out,
                tok_count=tok_count,
                next_pos=state["next_pos"] + adv,
            )

            # ---- cache tail reorder by beam parent, then one forward ----
            par_rows = (
                jnp.arange(g, dtype=jnp.int32)[:, None] * k + new_beam
            ).reshape(rows)
            sel_rows = jnp.where(cont_r, par_rows, jnp.arange(rows))
            cache = self._tail_permute(cache, sel_rows)

            tok = jnp.where(cont_r, new_tok.reshape(rows), pad)
            old_index = cache["index"]
            logits, cache = decode_fn(
                params, tok[:, None], adv[:, None],
                (state["next_pos"] - adv)[:, None], cache, icv, media,
            )
            cache = dict(cache, index=old_index + adv)
            state = dict(
                state,
                last_logits=jnp.where(
                    cont_r[:, None],
                    logits[:, -1, :].astype(jnp.float32),
                    state["last_logits"],
                ),
            )
            return state, cache

        return step

    # -- fused / harvest -------------------------------------------------------

    def run_fused(self) -> dict:
        raise NotImplementedError(
            "run_fused is greedy-only; beam groups use the host-driven run()"
        )

    def _harvest_rows(self):
        k = self.num_beams
        return lambda i: i * k
