"""Scan-stacked causal decoder with native ICV injection and a KV cache.

Replaces the reference's HF-module + baukit-hook stack: the per-layer ICV
residual edit (reference: icv_src/icv_model/icv_intervention.py:61-86) is a
term inside the ``lax.scan`` body, selected statically — ``icv_scaled=None``
compiles the term away (replacing ``toggle_intervention``, reference
:49-59).  Layer params are stacked on a leading L axis so XLA sees ONE layer
program; weights stream HBM→VMEM per scan step.

The decode path uses a fixed-size KV cache updated with
``dynamic_update_slice`` — fixed shapes end-to-end so the whole
prefill/decode loop jits once per (batch, bucket) shape.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.icv_inject import icv_inject_reference
from .config import BLOCK_OUTPUT, MLP_OUTPUT, DecoderConfig
from . import layers as L

# w8a8 (``cfg.w8a8_prefill``) applies only to blocks with at least this many
# tokens (a STATIC shape, so the gate is resolved at trace time): prefill and
# bind matmuls are MXU-compute-bound and take the int8xint8 double-rate path;
# decode steps (s=1) and speculative drafts (s=gamma+1, small) stay on the
# weight-only schedule — they are bandwidth-bound, and speculative's
# greedy-equality guarantee requires draft/verify numerics to match plain
# decode.
W8A8_MIN_TOKENS = 16


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_layer_params(key, cfg: DecoderConfig, n_layers: int) -> dict:
    """Stacked decoder-layer params with leading dim ``n_layers``."""
    d, dh = cfg.d_model, cfg.head_dim
    h, kv, f = cfg.n_heads, cfg.n_kv_heads, cfg.d_ff
    ks = jax.random.split(key, 8)

    def w(k, shape):
        return L.dense_init(k, (n_layers, *shape), cfg.dtype)

    p = {
        "attn": {
            "wq": w(ks[0], (d, h * dh)),
            "wk": w(ks[1], (d, kv * dh)),
            "wv": w(ks[2], (d, kv * dh)),
            "wo": w(ks[3], (h * dh, d)),
        },
        "ln1": jnp.ones((n_layers, d), cfg.dtype),
        "ln2": jnp.ones((n_layers, d), cfg.dtype),
    }
    if cfg.activation == "silu_glu":
        p["mlp"] = {
            "w_gate": w(ks[4], (d, f)),
            "w_up": w(ks[5], (d, f)),
            "w_down": w(ks[6], (f, d)),
        }
    else:
        p["mlp"] = {"w_up": w(ks[4], (d, f)), "w_down": w(ks[5], (f, d))}
    # NOTE no ln1_b/ln2_b even for norm_type="layernorm": the only layernorm
    # decoder is MPT, whose real checkpoints are fully bias-free
    # (mosaicml/mpt-7b no_bias=true) — convert_mpt emits none, and init must
    # structurally match converted params (caught at full scale by
    # tools/fullscale_convert_check.py).  The forward still honors biases via
    # p.get("ln1_b") if a converted model carries them.
    return p


def init_decoder_params(key, cfg: DecoderConfig) -> dict:
    k_emb, k_layers, k_head = jax.random.split(key, 3)
    params = {
        "embed": L.dense_init(k_emb, (cfg.vocab_size, cfg.d_model), cfg.dtype),
        "layers": init_layer_params(k_layers, cfg, cfg.n_layers),
        "final_norm": jnp.ones((cfg.d_model,), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = L.dense_init(
            k_head, (cfg.d_model, cfg.vocab_size), cfg.dtype
        )
    return params


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: DecoderConfig, batch: int, max_len: int) -> dict:
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    if getattr(cfg, "kv_cache_dtype", "bf16") == "int8":
        # {"q","s"} dict leaves thread transparently through the layer scans
        # and beam gathers; dequant fuses into the attention matmul read
        sshape = shape[:-1] + (1,)
        kv = lambda: {
            "q": jnp.zeros(shape, jnp.int8),
            "s": jnp.zeros(sshape, jnp.float32),
        }
        return {
            "k": kv(),
            "v": kv(),
            "pos": jnp.zeros((batch, max_len), jnp.int32),
            "valid": jnp.zeros((batch, max_len), bool),
            "index": jnp.zeros((), jnp.int32),
        }
    return {
        "k": jnp.zeros(shape, cfg.dtype),
        "v": jnp.zeros(shape, cfg.dtype),
        "pos": jnp.zeros((batch, max_len), jnp.int32),
        "valid": jnp.zeros((batch, max_len), bool),
        "index": jnp.zeros((), jnp.int32),
    }


# ---------------------------------------------------------------------------
# Single decoder layer (reusable by multimodal wrappers)
# ---------------------------------------------------------------------------


def _norm(cfg: DecoderConfig, w, b, x):
    if cfg.norm_type == "rmsnorm":
        return L.rms_norm(w, x, cfg.norm_eps)
    return L.layer_norm(w, b, x, cfg.norm_eps)


def decode_cache_view(cache: dict, positions: jax.Array, attention_mask, s: int):
    """Bookkeeping for decoding ``s`` new tokens against a cache.

    ``cache["index"]`` is a SCALAR for lockstep decode (greedy/beam: all rows
    advance together) or a ``(B,)`` vector when rows advance independently
    (per-row speculative acceptance — each row's accepted prefix length
    differs).  Returns ``(mask, cache_pos, cache_valid)`` with the new-token
    columns written at each row's index.
    """
    index = cache["index"]
    k = cache["k"]["q"] if isinstance(cache["k"], dict) else cache["k"]
    max_len = k.shape[2]
    ar = jnp.arange(max_len, dtype=jnp.int32)
    valid_new = attention_mask.astype(bool)
    if index.ndim == 0:
        cache_pos = jax.lax.dynamic_update_slice(
            cache["pos"], positions.astype(jnp.int32), (0, index)
        )
        cache_valid = jax.lax.dynamic_update_slice(
            cache["valid"], valid_new, (0, index)
        )
        written = (ar[None, :] < (index + s))
    else:
        b = positions.shape[0]
        col = index[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        rows = jnp.arange(b, dtype=jnp.int32)[:, None]
        cache_pos = cache["pos"].at[rows, col].set(positions.astype(jnp.int32))
        cache_valid = cache["valid"].at[rows, col].set(valid_new)
        written = ar[None, :] < (index[:, None] + s)
    mask = (
        (cache_pos[:, None, :] <= positions[:, :, None])
        & cache_valid[:, None, :]
        & written[:, None, :]
    )[:, None, :, :]
    return mask, cache_pos, cache_valid


def apply_kv_rows(cache: dict, k_rows, v_rows) -> dict:
    """Bulk-write every layer's new K/V rows into the cache.

    ``k_rows``/``v_rows`` are the layer scan's stacked ys —
    ``(L, B, s, KV, Dh)`` arrays (or ``{"q","s"}`` dicts of them for the
    int8 cache) returned by ``decoder_layer``.  ONE dynamic update per step
    instead of re-materializing the full cache through the scan (see the
    row-update note in ``decoder_layer``)."""
    index = cache["index"]

    def upd(c, r):
        if index.ndim == 0:
            start = (0, 0, index) + (0,) * (c.ndim - 3)
            return jax.lax.dynamic_update_slice(c, r, start)
        b, s = r.shape[1], r.shape[2]
        col = index[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        rows = jnp.arange(b, dtype=jnp.int32)[:, None]
        return c.at[:, rows, col].set(r)

    out = dict(cache)
    for key, rows in (("k", k_rows), ("v", v_rows)):
        if isinstance(cache[key], dict):
            out[key] = {
                "q": upd(cache[key]["q"], rows["q"]),
                "s": upd(cache[key]["s"], rows["s"]),
            }
        else:
            out[key] = upd(cache[key], rows)
    return out


def _kv_operand(c, compute_dtype):
    """(plane, per-column scale) view of one cache-attention operand.

    Dense caches return ``(c, None)``.  Quantized ``{"q","s"}`` caches
    return the int8 plane itself as the dot operand — only a fused
    ``convert`` touches the (B, S, H, Dh) bytes, the same scale-commute
    schedule that makes ``ops.int8_matmul.qdot`` stream pure int8 — plus
    the per-(token, head) scale reshaped to (B, H, 1, S) so it applies to
    the scores/probabilities (S-sized per head) instead of the cache
    (S·Dh-sized).  A ``dequantize_kv`` on the full cache here would make
    XLA materialize a bf16 copy (write + re-read ≈ 5 bytes/elem instead
    of 1), which dominates decode at serving batch sizes.

    Cache operands may carry KV heads (< query heads): GQA grouping happens
    inside the attention einsums, so the cache is never ``repeat_kv``-
    materialized (a reshape-of-broadcast feeding a dot forces a physical
    n_rep× copy — 4× the cache traffic on a 32/8-head backbone)."""
    if not isinstance(c, dict):
        return c.astype(compute_dtype), None
    scale = jnp.swapaxes(c["s"][..., 0], 1, 2)[:, :, None, :]  # (B,KV,1,S)
    return c["q"], scale.astype(jnp.float32)


def _cached_attention(
    q,  # (B, s, H, Dh) — already rope'd/normed, heads repeated
    k_cache,  # (B, S, KV, Dh) — OLD cache (incoming cols hold stale data);
    # or a {"q": int8 (B,S,KV,Dh), "s": f32 (B,S,KV,1)} quantized cache.
    # KV may be H (MHA / pre-repeated) or the true KV-head count (GQA —
    # grouping happens in the einsums; the cache is never repeated)
    v_cache,
    k_local,  # (B, s, H, Dh) — this step's keys/values, heads repeated
    v_local,
    mask,  # (B, 1, s, S) from decode_cache_view (post-write view)
    bias,  # optional (B, H, s, S) over cache columns (ALiBi)
    index,  # scalar or (B,) write position
    logit_softcap=None,
):
    """Split-softmax attention over (old cache ∥ local block).

    Mathematically identical to writing the rows first and attending the
    updated cache: the incoming columns are masked out of the cache part
    and reappear as the local block (whose mask/bias are sliced from the
    same post-write ``mask``/``bias`` at those columns)."""
    b, s = q.shape[:2]
    nh = q.shape[2]
    k_plane, k_scale = _kv_operand(k_cache, q.dtype)
    v_plane, v_scale = _kv_operand(v_cache, q.dtype)
    group = nh // k_plane.shape[2]  # GQA queries per cache KV head
    if group > 1:  # per-column scales are S-sized: repeating them is cheap
        k_scale = None if k_scale is None else jnp.repeat(k_scale, group, 1)
        v_scale = None if v_scale is None else jnp.repeat(v_scale, group, 1)
    S = k_plane.shape[1]
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(dh).astype(jnp.float32)
    ar = jnp.arange(S, dtype=jnp.int32)
    if index.ndim == 0:
        new_col = (ar >= index) & (ar < index + s)  # (S,)
        mask_cache = mask & ~new_col[None, None, None, :]
        local_mask = jax.lax.dynamic_slice(
            mask, (0, 0, 0, index), (mask.shape[0], 1, s, s)
        )
        bias_local = (
            jax.lax.dynamic_slice(
                bias, (0, 0, 0, index), bias.shape[:3] + (s,)
            )
            if bias is not None
            else None
        )
    else:
        new_col = (ar[None, :] >= index[:, None]) & (
            ar[None, :] < index[:, None] + s
        )  # (B, S)
        mask_cache = mask & ~new_col[:, None, None, :]
        col = index[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
        local_mask = jnp.take_along_axis(mask, col[:, None, None, :], axis=3)
        bias_local = (
            jnp.take_along_axis(bias, col[:, None, None, :], axis=3)
            if bias is not None
            else None
        )

    def scores(k, k_sc, part_bias, part_mask):
        # the convert on ``k`` (int8 → compute dtype for a quantized cache)
        # is the only producer on the dot's big operand, so XLA fuses it
        # into the HBM read; the per-column scale lands on the f32 scores
        g = nh // k.shape[2]
        if g == 1:
            sc = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ) * scale
        else:  # grouped: per (b, kv-head) GEMM, cache read once
            q5 = q.reshape(b, s, k.shape[2], g, dh)
            sc = jnp.einsum(
                "bqkgd,bskd->bkgqs", q5, k.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ).reshape(b, nh, s, k.shape[1]) * scale
        if k_sc is not None:
            sc = sc * k_sc
        if logit_softcap:
            sc = jnp.tanh(sc / logit_softcap) * logit_softcap
        if part_bias is not None:
            sc = sc + part_bias.astype(jnp.float32)
        return jnp.where(part_mask, sc, jnp.finfo(jnp.float32).min)

    s_all = jnp.concatenate(
        [
            scores(k_plane, k_scale, bias, mask_cache),
            scores(k_local, None, bias_local, local_mask),
        ],
        axis=-1,
    )
    p = jax.nn.softmax(s_all, axis=-1)

    def weighted(p_part, v, v_sc):
        # V's per-column scale folds into the probabilities (v_sc · p is
        # S-sized per head) so the dot reads the raw plane — fused convert
        if v_sc is not None:
            p_part = p_part * v_sc
        dt = q.dtype if v.dtype == jnp.int8 else v.dtype
        g = nh // v.shape[2]
        if g == 1:
            return jnp.einsum(
                "bhqk,bkhd->bqhd", p_part.astype(dt), v.astype(dt),
                preferred_element_type=jnp.float32,
            )
        p5 = p_part.reshape(b, v.shape[2], g, s, v.shape[1])
        return jnp.einsum(
            "bkgqs,bskd->bqkgd", p5.astype(dt), v.astype(dt),
            preferred_element_type=jnp.float32,
        ).reshape(b, s, nh, dh)

    out = weighted(p[..., :S], v_plane, v_scale) + weighted(
        p[..., S:], v_local, None
    )
    return out.astype(q.dtype)


def decoder_layer(
    cfg: DecoderConfig,
    p: dict,  # single layer's params (no leading L)
    h: jax.Array,  # (B, S, D)
    cos: Optional[jax.Array],
    sin: Optional[jax.Array],
    mask: jax.Array,  # (B, 1, S, Sk) bool
    bias: Optional[jax.Array],  # ALiBi etc.
    icv_row: Optional[jax.Array],  # (D,) scaled icv for this layer, or None
    kv_write: Optional[tuple] = None,  # (k_cache_l, v_cache_l, index) for decode
    flash_valid: Optional[jax.Array] = None,  # (B, S): enables the flash path
    ring: Optional[tuple] = None,  # (RingSpec, q_pos, k_valid): sp-sharded attn
):
    from ..ops.int8_matmul import qdot

    b, s, d = h.shape
    nh, nkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    # static gate: prefill/bind blocks run w8a8 on the int8-MXU path, decode
    # steps (s=1) and short speculative drafts keep the weight-only schedule
    a8 = cfg.w8a8_prefill and s >= W8A8_MIN_TOKENS

    x = _norm(cfg, p["ln1"], p.get("ln1_b"), h)
    q = qdot(x, p["attn"]["wq"], a8=a8).reshape(b, s, nh, dh)
    k = qdot(x, p["attn"]["wk"], a8=a8).reshape(b, s, nkv, dh)
    v = qdot(x, p["attn"]["wv"], a8=a8).reshape(b, s, nkv, dh)
    if cfg.positional == "rope":
        q = L.apply_rope(q, cos, sin)
        k = L.apply_rope(k, cos, sin)
    if "q_norm" in p["attn"]:  # idefics qk_layer_norms: per-head-dim RMSNorm
        q = L.rms_norm(p["attn"]["q_norm"], q, cfg.norm_eps)
        k = L.rms_norm(p["attn"]["k_norm"], k, cfg.norm_eps)

    # Decode with a cache: the layer does NOT write the cache.  It attends
    # (old cache rows, with the incoming columns masked out of ``mask``) +
    # (the s local tokens, via a causal block sliced from the same mask),
    # and returns ONLY the new rows; the caller bulk-writes all layers'
    # rows with one dynamic_update_slice per step (``apply_kv_rows``).
    # Rationale: threading the full per-layer cache through the layer
    # scan's ys re-materialized the whole (L,B,S,KV,Dh) cache every decode
    # step — 14.6 ms/step at bs=64 vs 6.4 for the row-update pattern
    # (tools/bench_attn_decode_micro.py) — while this split softmax is
    # mathematically identical (the masked-out incoming columns hold
    # exactly the appended local keys).
    k_local, v_local = k, v
    k_att = v_att = None  # cache-side operands for _cached_attention
    if kv_write is not None:
        k_cache, v_cache, index = kv_write
        if isinstance(k_cache, dict):  # int8 KV cache ({"q","s"} leaves)
            from ..ops.quantize import dequantize_kv, quantize_kv_rows

            kq, ks = quantize_kv_rows(k)
            vq, vs = quantize_kv_rows(v)
            new_kv = ({"q": kq, "s": ks}, {"q": vq, "s": vs})
            # the quantized cache is passed through AS int8 with KV heads:
            # the dequant scales commute out of both attention contractions
            # (_cached_attention applies them to scores/probabilities) and
            # GQA grouping happens in its einsums — so the cache stream is
            # exactly one int8 byte per element.  (dequantize_kv +
            # repeat_kv here made XLA materialize a repeated bf16 copy.)
            k_att, v_att = k_cache, v_cache
            # the local tokens round-trip through int8 so this step's
            # attention sees exactly what later steps will read back
            k_local = dequantize_kv(kq, ks, h.dtype)
            v_local = dequantize_kv(vq, vs, h.dtype)
        else:
            new_kv = (k, v)
            k_att, v_att = k_cache, v_cache  # KV heads; grouped in-attn
        k_full, v_full = k, v  # only read by the no-cache branches below
    else:
        k_full, v_full = k, v
        new_kv = None

    k_full = L.repeat_kv(k_full, nh // nkv)
    v_full = L.repeat_kv(v_full, nh // nkv)
    # flash_valid is only passed by callers when attention is self-contained
    # in this block (training forward, or a prefill into an empty cache), so
    # the Pallas kernel can ignore the cache mask entirely.
    use_flash = (
        flash_valid is not None
        and cfg.positional == "rope"
        and cfg.attn_logit_softcap is None
        and L.flash_attention_usable(cfg, s, nh, dh)
    )
    # flash_valid is only passed for self-contained blocks (training forward
    # or a prefill into an EMPTY cache) — same contract as the rope path, so
    # local (pre-cache) k/v are the full keys and the cache may still be
    # written alongside.  ALiBi is index-offset-invariant, so LEFT-padded
    # prefill rows are fine: rel = q_idx - k_idx equals q_pos - k_pos.
    use_flash_alibi = False
    if (
        flash_valid is not None
        and ring is None
        and cfg.positional == "alibi"
        and cfg.attn_logit_softcap is None
    ):
        from ..ops.flash_alibi import flash_alibi_usable

        use_flash_alibi = flash_alibi_usable(cfg, s, dh)

    if ring is not None and kv_write is None:
        # sequence dim sharded over sp: ring attention (parallel/ring.py)
        from ..parallel.ring import ring_self_attention

        spec, q_pos, k_valid = ring
        attn = ring_self_attention(
            spec,
            q,
            k_full,
            v_full,
            q_pos,
            k_valid,
            n_heads_total=nh,
            alibi=cfg.positional == "alibi",
            logit_softcap=cfg.attn_logit_softcap,
        )
    elif use_flash:
        # local (pre-cache) k/v == the full keys for self-contained blocks.
        # k_local/v_local (NOT raw k/v): with an int8 KV cache they are the
        # int8 round-trip, so prefill attention sees exactly the keys later
        # decode steps will read back — same invariant as _cached_attention
        attn = L.flash_attention_tpu(
            q,
            L.repeat_kv(k_local, nh // nkv),
            L.repeat_kv(v_local, nh // nkv),
            flash_valid,
        )
    elif use_flash_alibi:
        # MPT/ALiBi flash: bias computed in-kernel from the per-head slope
        # (the dense bias arg is unused in this branch and DCE'd by XLA)
        from ..ops.flash_alibi import flash_alibi_attention

        attn = flash_alibi_attention(
            q,
            L.repeat_kv(k_local, nh // nkv),  # int8-KV round-trip invariant
            L.repeat_kv(v_local, nh // nkv),
            flash_valid,
            L.alibi_slopes(nh),
            float(dh) ** -0.5,
        )
    elif kv_write is not None:
        attn = _cached_attention(
            q,
            k_att,  # OLD cache, heads repeated (int8 dict stays int8)
            v_att,
            L.repeat_kv(k_local, nh // nkv),
            L.repeat_kv(v_local, nh // nkv),
            mask,
            bias,
            kv_write[2],
            logit_softcap=cfg.attn_logit_softcap,
        )
    else:
        attn = L.dot_product_attention(
            q, k_full, v_full, bias=bias, mask=mask,
            logit_softcap=cfg.attn_logit_softcap,
        )
    attn = qdot(attn.reshape(b, s, nh * dh), p["attn"]["wo"], a8=a8).astype(h.dtype)
    h = h + attn

    x2 = _norm(cfg, p["ln2"], p.get("ln2_b"), h)
    mlp = L.swiglu_mlp(p["mlp"], x2, a8=a8) if cfg.activation == "silu_glu" else (
        L.gelu_mlp(p["mlp"], x2, a8=a8)
    )
    if icv_row is not None and cfg.injection_site == MLP_OUTPUT:
        # idefics2 semantics: the hook edits the .mlp sublayer OUTPUT before
        # the residual add (reference: config/lmm/idefics2-8B-base.yaml:8)
        mlp = _apply_icv(mlp, icv_row)
    h = h + mlp

    if icv_row is not None and cfg.injection_site == BLOCK_OUTPUT:
        h = _apply_icv(h, icv_row)
    return h, new_kv


def _pack_tokens(x_d: jax.Array, x_p: jax.Array) -> jax.Array:
    """Flatten two (B, S, D) token streams into ONE (1, T, D) matmul operand.

    The whole point of the merged decode+prefill step (chunked prefill, the
    XLA-static-shape answer to Sarathi/vLLM token batching): every layer
    weight is streamed from HBM exactly ONCE per step for BOTH the
    bandwidth-bound decode tokens and the compute-bound prefill tokens —
    the prefill rides in the decode step's weight stream for ~free MXU
    headroom instead of stalling the pool as a separate program."""
    d = x_d.shape[-1]
    return jnp.concatenate(
        [x_d.reshape(1, -1, d), x_p.reshape(1, -1, d)], axis=1
    )


def _unpack_tokens(y: jax.Array, shape_d: tuple, shape_p: tuple):
    t1 = shape_d[0] * shape_d[1]
    return (
        y[0, :t1].reshape(shape_d + y.shape[2:]),
        y[0, t1:].reshape(shape_p + y.shape[2:]),
    )


def merged_decoder_layer(
    cfg: DecoderConfig,
    p: dict,  # single layer's params (no leading L)
    h_d: jax.Array,  # (B1, 1, D) decode-lane hidden (the slot pool)
    h_p: jax.Array,  # (B2, S2, D) prefill-lane hidden (the admission group)
    rope_d: Optional[tuple],  # (cos, sin) per lane (None for ALiBi)
    rope_p: Optional[tuple],
    mask_d: jax.Array,  # decode_cache_view mask over the pool cache
    kv_write_d: tuple,  # (k_cache_l, v_cache_l, index) — pool cache, per-row
    mask_p: jax.Array,  # decode_cache_view mask over the FRESH prefill cache
    kv_write_p: tuple,  # (k_cache_l, v_cache_l, index=0) — fresh cache
    flash_valid_p: Optional[jax.Array],  # (B2, S2): prefill flash eligibility
    icv_row_d,  # per-lane ICV rows ((D,) / (row, flag) / None)
    icv_row_p,
    bias_d: Optional[jax.Array] = None,  # per-lane ALiBi biases (MPT lanes;
    bias_p: Optional[jax.Array] = None,  # None for rope families)
):
    """One decoder layer over BOTH lanes with all projections packed.

    Numerics: matmuls run WEIGHT-ONLY (no w8a8) in the merged step — per-row
    activation quantization would change the decode lane's numerics vs the
    plain lockstep step, and the prefill lane's MXU time is hidden under the
    decode lane's weight stream anyway.  Row-wise results equal the unpacked
    per-lane matmuls in exact arithmetic (each output row is an independent
    dot); on TPU bf16 the usual batch-shape kernel-selection drift applies —
    the same caveat already documented for engine-vs-static batching.

    Attention stays per-lane: decode attends the pool cache
    (``_cached_attention``), prefill attends itself (flash when eligible,
    else the split-softmax path against its fresh cache).  Returns
    ``(h_d, h_p, new_kv_d, new_kv_p)`` with each lane's new K/V rows for the
    caller's bulk cache writes."""
    from ..ops.int8_matmul import qdot

    b1, s1, d = h_d.shape
    b2, s2, _ = h_p.shape
    nh, nkv, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    x = _pack_tokens(
        _norm(cfg, p["ln1"], p.get("ln1_b"), h_d),
        _norm(cfg, p["ln1"], p.get("ln1_b"), h_p),
    )
    q = qdot(x, p["attn"]["wq"])
    k = qdot(x, p["attn"]["wk"])
    v = qdot(x, p["attn"]["wv"])
    q_d, q_p = _unpack_tokens(q.reshape(1, -1, nh, dh), (b1, s1), (b2, s2))
    k_d, k_p = _unpack_tokens(k.reshape(1, -1, nkv, dh), (b1, s1), (b2, s2))
    v_d, v_p = _unpack_tokens(v.reshape(1, -1, nkv, dh), (b1, s1), (b2, s2))
    if cfg.positional == "rope":
        q_d, k_d = L.apply_rope(q_d, *rope_d), L.apply_rope(k_d, *rope_d)
        q_p, k_p = L.apply_rope(q_p, *rope_p), L.apply_rope(k_p, *rope_p)
    if "q_norm" in p["attn"]:  # idefics qk_layer_norms
        q_d = L.rms_norm(p["attn"]["q_norm"], q_d, cfg.norm_eps)
        k_d = L.rms_norm(p["attn"]["k_norm"], k_d, cfg.norm_eps)
        q_p = L.rms_norm(p["attn"]["q_norm"], q_p, cfg.norm_eps)
        k_p = L.rms_norm(p["attn"]["k_norm"], k_p, cfg.norm_eps)

    def lane_attention(q, k, v, mask, kv_write, flash_valid, bias):
        """decoder_layer's cached-attention schedule for one lane (same
        int8-round-trip invariant: attention sees what decode reads back;
        same flash-branch selection as the unmerged path, so merged ==
        plain per lane)."""
        k_cache, v_cache, index = kv_write
        k_local, v_local = k, v
        if isinstance(k_cache, dict):  # int8 KV cache
            from ..ops.quantize import dequantize_kv, quantize_kv_rows

            kq, ks = quantize_kv_rows(k)
            vq, vs = quantize_kv_rows(v)
            new_kv = ({"q": kq, "s": ks}, {"q": vq, "s": vs})
            k_local = dequantize_kv(kq, ks, q.dtype)
            v_local = dequantize_kv(vq, vs, q.dtype)
        else:
            new_kv = (k, v)
        s = q.shape[1]
        use_flash = (
            flash_valid is not None
            and cfg.positional == "rope"
            and cfg.attn_logit_softcap is None
            and L.flash_attention_usable(cfg, s, nh, dh)
        )
        use_flash_alibi = False
        if (
            flash_valid is not None
            and cfg.positional == "alibi"
            and cfg.attn_logit_softcap is None
        ):
            from ..ops.flash_alibi import flash_alibi_usable

            use_flash_alibi = flash_alibi_usable(cfg, s, dh)
        if use_flash:  # self-contained prefill into an empty cache
            attn = L.flash_attention_tpu(
                q,
                L.repeat_kv(k_local, nh // nkv),
                L.repeat_kv(v_local, nh // nkv),
                flash_valid,
            )
        elif use_flash_alibi:  # MPT/ALiBi prefill (decoder_layer's branch)
            from ..ops.flash_alibi import flash_alibi_attention

            attn = flash_alibi_attention(
                q,
                L.repeat_kv(k_local, nh // nkv),
                L.repeat_kv(v_local, nh // nkv),
                flash_valid,
                L.alibi_slopes(nh),
                float(dh) ** -0.5,
            )
        else:
            attn = _cached_attention(
                q,
                k_cache,
                v_cache,
                L.repeat_kv(k_local, nh // nkv),
                L.repeat_kv(v_local, nh // nkv),
                mask,
                bias,
                index,
                logit_softcap=cfg.attn_logit_softcap,
            )
        return attn, new_kv

    attn_d, new_kv_d = lane_attention(
        q_d, k_d, v_d, mask_d, kv_write_d, None, bias_d
    )
    attn_p, new_kv_p = lane_attention(
        q_p, k_p, v_p, mask_p, kv_write_p, flash_valid_p, bias_p
    )

    ao = qdot(
        _pack_tokens(
            attn_d.reshape(b1, s1, nh * dh), attn_p.reshape(b2, s2, nh * dh)
        ),
        p["attn"]["wo"],
    )
    ao_d, ao_p = _unpack_tokens(ao, (b1, s1), (b2, s2))
    h_d = h_d + ao_d.astype(h_d.dtype)
    h_p = h_p + ao_p.astype(h_p.dtype)

    x2 = _pack_tokens(
        _norm(cfg, p["ln2"], p.get("ln2_b"), h_d),
        _norm(cfg, p["ln2"], p.get("ln2_b"), h_p),
    )
    mlp = (
        L.swiglu_mlp(p["mlp"], x2)
        if cfg.activation == "silu_glu"
        else L.gelu_mlp(p["mlp"], x2)
    )
    mlp_d, mlp_p = _unpack_tokens(mlp, (b1, s1), (b2, s2))
    if cfg.injection_site == MLP_OUTPUT:
        if icv_row_d is not None:
            mlp_d = _apply_icv(mlp_d, icv_row_d)
        if icv_row_p is not None:
            mlp_p = _apply_icv(mlp_p, icv_row_p)
    h_d = h_d + mlp_d
    h_p = h_p + mlp_p

    if cfg.injection_site == BLOCK_OUTPUT:
        if icv_row_d is not None:
            h_d = _apply_icv(h_d, icv_row_d)
        if icv_row_p is not None:
            h_p = _apply_icv(h_p, icv_row_p)
    return h_d, h_p, new_kv_d, new_kv_p


def _dequant(p, dtype):
    from ..ops.quantize import dequantize_tree

    return dequantize_tree(p, dtype)


def _apply_icv(x: jax.Array, icv_row) -> jax.Array:
    """``icv_row`` is either a (D,) row (inject at every layer) or a
    ``(row, flag)`` pair for subset-layer intervention (reference:
    ``intervention_layer`` int/list semantics, icv_intervention.py:39-42)."""
    if isinstance(icv_row, tuple):
        row, flag = icv_row
        return jnp.where(flag, icv_inject_reference(x, row), x)
    return icv_inject_reference(x, icv_row)


# ---------------------------------------------------------------------------
# Full forward (text-only causal LM; multimodal models wrap decoder_layer)
# ---------------------------------------------------------------------------


def _positions_from_mask(attention_mask: jax.Array) -> jax.Array:
    """HF convention: position_ids = cumsum(mask)-1, clipped at 0."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)


def forward_hidden(
    cfg: DecoderConfig,
    params: dict,
    inputs_embeds: jax.Array,  # (B, S, D)
    attention_mask: jax.Array,  # (B, S) 1=real token
    icv_scaled: Optional[jax.Array] = None,  # (L, D)
    cache: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
    remat: bool = False,
    prefill_flash: Optional[jax.Array] = None,
    ring_spec=None,  # parallel.ring.RingSpec: sp-shard the sequence dim
) -> tuple[jax.Array, Optional[dict]]:
    """Run the stacked decoder; returns (hidden (B,S,D), new cache or None).

    ``prefill_flash``: pass the attention_mask when this cached call is a
    PREFILL into an empty cache — enables the flash kernel for the block.
    ``ring_spec``: no-cache path only — attention goes through
    ``parallel.ring.ring_self_attention`` and the dense (B,1,S,S) mask /
    ALiBi bias are never materialized."""
    b, s, d = inputs_embeds.shape
    h = inputs_embeds
    ring = None

    if cache is None:
        if positions is None:
            positions = _positions_from_mask(attention_mask)
        if ring_spec is not None:
            ring = (ring_spec, positions, attention_mask.astype(bool))
            mask = None
        else:
            mask = L.causal_mask(
                positions, positions, attention_mask.astype(bool)
            )
        index = None
    else:
        # decoding s new tokens against the cache
        index = cache["index"]
        if positions is None:
            raise ValueError("positions required when decoding with a cache")
        mask, cache_pos, cache_valid = decode_cache_view(
            cache, positions, attention_mask, s
        )

    if cfg.positional == "rope":
        cos, sin = L.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        bias = None
    else:
        cos = sin = None
        if ring is not None:
            bias = None  # ALiBi applied per ring block inside the kernel
        else:
            k_pos = cache_pos if cache is not None else positions
            bias = L.alibi_bias(cfg.n_heads, positions, k_pos)

    have_icv = icv_scaled is not None
    flash_valid = attention_mask if cache is None else prefill_flash

    def body(h, xs):
        p, icv_row, kv = xs
        icv_arg = icv_row if have_icv else None
        kv_write = (kv[0], kv[1], index) if cache is not None else None
        h, new_kv = decoder_layer(
            cfg, p, h, cos, sin, mask, bias, icv_arg, kv_write,
            flash_valid=flash_valid, ring=ring,
        )
        return h, new_kv

    if remat:
        body = jax.checkpoint(body)

    icv_xs = icv_scaled if have_icv else jnp.zeros((cfg.n_layers, 1), h.dtype)
    kv_xs = (
        (cache["k"], cache["v"])
        if cache is not None
        else (
            jnp.zeros((cfg.n_layers, 0)),
            jnp.zeros((cfg.n_layers, 0)),
        )
    )
    h, kv_out = jax.lax.scan(body, h, (params["layers"], icv_xs, kv_xs))

    new_cache = None
    if cache is not None:
        # kv_out stacks each layer's NEW rows (L,B,s,KV,Dh); one bulk write
        new_cache = dict(
            apply_kv_rows(cache, kv_out[0], kv_out[1]),
            pos=cache_pos,
            valid=cache_valid,
            index=index + s,
        )
    h = _norm(cfg, params["final_norm"], params.get("final_norm_b"), h)
    return h, new_cache


def logits_from_hidden(cfg: DecoderConfig, params: dict, h: jax.Array) -> jax.Array:
    """Hidden → vocab logits (f32).

    ``params["lm_head"]`` may be a plain (D, V) matrix or an int8
    ``{"q","s"}`` quantized leaf (``lmm.quantize_head=true``): the head is
    re-read from HBM every decode step, so at the flagship shape the int8
    stream saves ~130 MB/step (~4% of the int8 decode byte budget).  ``qdot``
    applies the per-vocab-column scale on the f32 output, so the dot streams
    raw int8.  Tied-embedding models keep the bf16 table (it also serves the
    input gather)."""
    if cfg.tie_embeddings:
        return jnp.dot(
            h, params["embed"].T, preferred_element_type=jnp.float32
        )
    from ..ops.int8_matmul import qdot

    return qdot(h, params["lm_head"], preferred_element_type=jnp.float32)


def causal_lm_forward(
    cfg: DecoderConfig,
    params: dict,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    icv_scaled: Optional[jax.Array] = None,
    cache: Optional[dict] = None,
    positions: Optional[jax.Array] = None,
    remat: bool = False,
    prefill_flash: Optional[jax.Array] = None,
    ring_spec=None,
    return_hidden: bool = False,
):
    """Text-only causal LM: returns (logits f32 (B,S,V), new_cache)."""
    embeds = params["embed"][input_ids].astype(cfg.dtype)
    h, new_cache = forward_hidden(
        cfg,
        params,
        embeds,
        attention_mask,
        icv_scaled=icv_scaled,
        cache=cache,
        positions=positions,
        remat=remat,
        prefill_flash=prefill_flash,
        ring_spec=ring_spec,
    )
    if return_hidden:
        return h, new_cache
    return logits_from_hidden(cfg, params, h), new_cache
