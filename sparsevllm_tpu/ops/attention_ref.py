"""Pure-JAX (XLA) reference implementations of the paged-attention ops.

These define the numerical semantics of the engine's attention path. The
Pallas TPU kernels in ``ops/paged_decode.py`` / ``ops/prefill_attention.py``
are verified against these functions; on CPU (tests) and as a fallback the
engine runs these directly.

KV-cache layout (TPU-first; contrast with the reference's token-granular slot
pools, src/sparsevllm/engine/cache_manager/standard.py:104-112):

    k_cache, v_cache: [num_pages, page_size, num_kv_heads, head_dim]

i.e. page-granular, TOKEN-major-within-page: one stored token is a contiguous
[num_kv_heads * head_dim] row (2 KiB bf16 / 1 KiB int8 at 8x128), which keeps
XLA's in-place scatter on the fast path for the decode KV store — narrower
rows (the head-major layout's [head_dim] rows) silently fall back to a
full-cache copy. A page is still one contiguous ~128 KiB DMA for the
attention kernels. Per-sequence state is a page table
``page_table[b, i] -> page id`` plus a context length; padded page-table
entries point at page 0, which is reserved as the trash page (never mapped to
a live sequence).

All functions take a single layer's cache slice and static (padded) shapes;
masking handles the ragged reality. Scores use fp32 accumulation.

Reference semantics mirrored:
  * KV store scatter = store_kvcache (triton_kernel/store_kvcache.py:33-71)
  * prefill attention = context_flashattention_nopad.py (varlen causal w/
    cached prefix; here dense [B, S] padded instead of flat varlen — padding
    is what the TPU wants anyway)
  * decode attention ± score emission = gqa_flash_decoding*.py
  * prefill observation scores = prefill_score.py:7-247
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def store_kv(
    k_cache: jax.Array,  # [num_pages, P, Nkv, Dh]
    v_cache: jax.Array,
    k_new: jax.Array,  # [T, Nkv, Dh]
    v_new: jax.Array,
    dest_slot: jax.Array,  # [T] int32 global slot = page*P + offset; <0 = drop
) -> tuple[jax.Array, jax.Array]:
    """Scatter new K/V token rows into the paged cache by global slot index.

    Token-major layout makes the row [Nkv*Dh] contiguous: the global slot IS
    the flat row index, and the row is wide enough for XLA's in-place
    scatter (see module docstring).
    """
    num_pages, p, nkv, dh = k_cache.shape
    # multi-dim scatter (page, off) with [Nkv, Dh] update slices — exactly
    # one physical (8,128) tile per token, no reshape of the cache (merging
    # the minor dims is NOT layout-compatible with TPU tiling and would
    # force a full-cache copy per store).
    page = jnp.where(dest_slot >= 0, dest_slot // p, -1)
    off = dest_slot % p
    k_out = k_cache.at[page, off].set(
        k_new.astype(k_cache.dtype).reshape(-1, nkv, dh), mode="drop"
    )
    v_out = v_cache.at[page, off].set(
        v_new.astype(v_cache.dtype).reshape(-1, nkv, dh), mode="drop"
    )
    return k_out, v_out


def gather_pages(
    cache: jax.Array,  # [num_pages, P, Nkv, Dh]
    page_table: jax.Array,  # [B, max_pages] int32 (padded entries -> page 0)
) -> jax.Array:
    """Gather a sequence-major contiguous view: [B, Nkv, max_pages*P, Dh]."""
    gathered = cache[page_table]  # [B, max_pages, P, Nkv, Dh]
    b, mp, p, nkv, dh = gathered.shape
    return gathered.transpose(0, 3, 1, 2, 4).reshape(b, nkv, mp * p, dh)


def gather_dequant(
    cache: jax.Array,  # [num_pages, P, Nkv, Dh] int8
    scales: jax.Array,  # [num_pages, Nkv, P] f32 per-slot scales
    page_table: jax.Array,
) -> jax.Array:
    """Gather + dequantize an int8 cache: [B, Nkv, K, Dh] fp32."""
    vals = gather_pages(cache, page_table).astype(jnp.float32)
    sc = scales[page_table]  # [B, MP, Nkv, P]
    b, mp, nkv, p = sc.shape
    sc = sc.transpose(0, 2, 1, 3).reshape(b, nkv, mp * p, 1)
    return vals * sc.astype(jnp.float32)


def gather_dequant_u4(
    cache: jax.Array,  # [num_pages, P, Nkv*Dh//2] int8 flat-lane packed
    scales: jax.Array,  # [num_pages, Nkv, P] f32
    zeros: jax.Array,  # [num_pages, Nkv, P] f32
    page_table: jax.Array,
) -> jax.Array:
    """Gather + dequantize an int4 (KIVI-4) cache: [B, Nkv, K, Dh] fp32.

    Flat-lane storage (ops/quant.py int4 section: lane f = h*(Dh//2)+j,
    split-half packing: byte j of head h holds channels j and j+Dh/2)."""
    nkv = scales.shape[1]
    np_, p, fd = cache.shape
    cache = cache.reshape(np_, p, nkv, fd // nkv)
    pk = gather_pages(cache, page_table).astype(jnp.int32)  # [B,Nkv,K,Dh/2]
    lo = (pk & 15).astype(jnp.float32)
    hi = ((pk >> 4) & 15).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=-1)  # [B, Nkv, K, Dh]

    def _flat(x):  # [pages, Nkv, P] -> [B, Nkv, K, 1]
        g = x[page_table]
        b, mp, nkv, p = g.shape
        return g.transpose(0, 2, 1, 3).reshape(b, nkv, mp * p, 1)

    return q * _flat(scales).astype(jnp.float32) + _flat(zeros).astype(
        jnp.float32)


def gather_dequant_int2_k(
    cache: jax.Array,  # [num_pages, P, Nkv, Dh//4] int8 quarter-packed
    k_ch_scales: jax.Array,  # [2, num_pages, P//G, Nkv, Dh] f32 (scale, zero)
    page_table: jax.Array,
) -> jax.Array:
    """Gather + dequantize a KIVI-2 KEY cache (per-CHANNEL token-group
    scales; ops/quant.py quantize_page_k_int2): [B, Nkv, K, Dh] fp32."""
    from . import quant as quant_ops

    pk = cache[page_table]  # [B, MP, P, Nkv, Dh//4]
    ngrp = k_ch_scales.shape[2]
    group = cache.shape[1] // ngrp
    ks = k_ch_scales[0][page_table]  # [B, MP, P//G, Nkv, Dh]
    kz = k_ch_scales[1][page_table]
    d = quant_ops.dequantize_page_k_int2(pk, ks, kz, group)
    b, mp, p, nkv, dh = d.shape
    return d.transpose(0, 3, 1, 2, 4).reshape(b, nkv, mp * p, dh)


def gather_dequant_int2_v(
    cache: jax.Array,  # [num_pages, P, Nkv, Dh//4] int8 quarter-packed
    scales: jax.Array,  # [num_pages, Nkv, P] f32
    zeros: jax.Array,
    page_table: jax.Array,
) -> jax.Array:
    """Gather + dequantize a KIVI-2 VALUE cache (per-token scales):
    [B, Nkv, K, Dh] fp32."""
    from . import quant as quant_ops

    pv = cache[page_table]
    d = quant_ops.dequantize_page_v_int2(
        pv,
        jnp.swapaxes(scales[page_table], -1, -2),
        jnp.swapaxes(zeros[page_table], -1, -2),
    )
    b, mp, p, nkv, dh = d.shape
    return d.transpose(0, 3, 1, 2, 4).reshape(b, nkv, mp * p, dh)


def _gather_kv(k_cache, v_cache, page_table, kv_scales, k_ch_scales):
    """Shared gather + dequant dispatch: bf16 / int8 / int4 / int2."""
    if k_ch_scales is not None:  # KIVI-2
        keys = gather_dequant_int2_k(k_cache, k_ch_scales, page_table)
        vals = gather_dequant_int2_v(v_cache, kv_scales[0], kv_scales[1],
                                     page_table)
    elif kv_scales is not None and kv_scales.shape[0] == 4:
        keys = gather_dequant_u4(k_cache, kv_scales[0], kv_scales[2],
                                 page_table)
        vals = gather_dequant_u4(v_cache, kv_scales[1], kv_scales[3],
                                 page_table)
    elif kv_scales is not None:
        keys = gather_dequant(k_cache, kv_scales[0], page_table)
        vals = gather_dequant(v_cache, kv_scales[1], page_table)
    else:
        keys = gather_pages(k_cache, page_table)  # [B, Nkv, K, Dh]
        vals = gather_pages(v_cache, page_table)
    return keys, vals


def _expand_gqa(x: jax.Array, num_q_heads: int) -> jax.Array:
    """[B, Nkv, S, Dh] -> [B, Nq, S, Dh] by repeating each kv head G times."""
    b, nkv, s, dh = x.shape
    g = num_q_heads // nkv
    return jnp.repeat(x, g, axis=1)


def prefill_attention_ref(
    q: jax.Array,  # [B, S, Nq, Dh] (padded new tokens)
    k_cache: jax.Array,  # [num_pages, P, Nkv, Dh] (already contains this chunk)
    v_cache: jax.Array,
    page_table: jax.Array,  # [B, max_pages]
    ctx_lens: jax.Array,  # [B] total context incl. this chunk's new tokens
    new_lens: jax.Array,  # [B] valid new tokens in this chunk (<= S)
    *,
    sm_scale: float,
    obs_window: int = 0,
    score_pooling: int = 0,
    kv_scales: jax.Array | None = None,  # [2, pages, Nkv, P] int8 dequant
    k_ch_scales: jax.Array | None = None,  # [2, pages, P//G, Nkv, Dh] KIVI-2
) -> tuple[jax.Array, jax.Array | None]:
    """Chunked-prefill causal attention over the paged cache.

    Query i of sequence b has absolute position (ctx_lens[b] - new_lens[b] + i)
    and attends keys [0, pos_i]. Returns output [B, S, Nq, Dh] and, when
    ``obs_window > 0``, SnapKV observation scores: softmax probabilities of the
    last ``obs_window`` valid queries, summed over those queries and all query
    heads, optionally 1D-max-pooled with ``score_pooling`` kernel size
    (reference prefill_score.py semantics + snapkv kernel_size pooling),
    shaped [B, max_pages*P] in fp32.
    """
    b, s, nq, dh = q.shape
    keys, vals = _gather_kv(k_cache, v_cache, page_table, kv_scales,
                            k_ch_scales)
    kk = keys.shape[2]

    keys = _expand_gqa(keys, nq)
    vals = _expand_gqa(vals, nq)
    qf = q.transpose(0, 2, 1, 3).astype(jnp.float32)  # [B, Nq, S, Dh]
    scores = jnp.einsum("bhsd,bhkd->bhsk", qf, keys.astype(jnp.float32))
    scores = scores * sm_scale

    q_pos = (ctx_lens - new_lens)[:, None] + jnp.arange(s)[None, :]  # [B, S]
    k_pos = jnp.arange(kk)[None, :]  # [1, K]
    causal = k_pos[:, None, :] <= q_pos[:, :, None]  # [B, S, K]
    in_ctx = k_pos[:, None, :] < ctx_lens[:, None, None]  # [B, 1->S, K]
    mask = (causal & in_ctx)[:, None, :, :]  # [B, 1, S, K]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # fully-masked (padded) query rows produce uniform probs; zero them.
    valid_q = (jnp.arange(s)[None, :] < new_lens[:, None])[:, None, :, None]
    probs = probs * valid_q
    out = jnp.einsum("bhsk,bhkd->bhsd", probs, vals.astype(jnp.float32))
    out = out.transpose(0, 2, 1, 3).astype(q.dtype)

    obs_scores = None
    if obs_window > 0:
        # last obs_window VALID queries of each sequence.
        q_idx = jnp.arange(s)[None, :]
        is_obs = (q_idx >= (new_lens[:, None] - obs_window)) & (
            q_idx < new_lens[:, None]
        )  # [B, S]
        obs_scores = jnp.einsum(
            "bhsk,bs->bk", probs, is_obs.astype(jnp.float32)
        )  # summed over heads and obs queries
        if score_pooling > 1:
            # 1D max pool with 'same' padding over the key axis
            # (snapkv kernel_size smoothing).
            pad = score_pooling // 2
            padded = jnp.pad(
                obs_scores, ((0, 0), (pad, score_pooling - 1 - pad)),
                constant_values=0.0,
            )
            windows = jnp.stack(
                [padded[:, i : i + kk] for i in range(score_pooling)], axis=-1
            )
            obs_scores = jnp.max(windows, axis=-1)
    return out, obs_scores


def decode_attention_ref(
    q: jax.Array,  # [B, Nq, Dh]
    k_cache: jax.Array,  # [num_pages, P, Nkv, Dh]
    v_cache: jax.Array,
    page_table: jax.Array,  # [B, max_pages]
    ctx_lens: jax.Array,  # [B]
    *,
    sm_scale: float,
    emit_scores: bool = False,
    select_mask: jax.Array | None = None,  # [B, max_pages*P] bool, extra mask
    page_pos: jax.Array | None = None,  # [B, max_pages] logical page index
    kv_scales: jax.Array | None = None,  # [2, pages, Nkv, P] int8 dequant
    k_ch_scales: jax.Array | None = None,  # [2, pages, P//G, Nkv, Dh] KIVI-2
    return_stats: bool = False,
) -> tuple[jax.Array, jax.Array | None]:
    """Single-token decode attention over the paged cache.

    ``select_mask`` restricts attention to selected token slots (OmniKV/Quest
    logical sparsity): positions where it is False are masked out in addition
    to the context-length mask. When ``emit_scores`` the head-summed softmax
    probabilities [B, max_pages*P] fp32 are returned (observation-layer score
    emission, reference gqa_flash_decoding `_with_score`).

    ``page_pos`` supports COMPACTED page tables (Quest top-k page selection):
    entry i of the table holds the page whose logical position in the
    sequence is page_pos[b, i]; token positions for the context mask are
    derived from it. None = identity (table entry i is logical page i).
    """
    b, nq, dh = q.shape
    p = k_cache.shape[1]
    keys, vals = _gather_kv(k_cache, v_cache, page_table, kv_scales,
                            k_ch_scales)
    kk = keys.shape[2]
    keys = _expand_gqa(keys, nq)
    vals = _expand_gqa(vals, nq)

    qf = q.astype(jnp.float32)
    scores = jnp.einsum("bhd,bhkd->bhk", qf, keys.astype(jnp.float32)) * sm_scale
    if page_pos is None:
        pos = jnp.broadcast_to(jnp.arange(kk)[None, :], (b, kk))
    else:
        pos = (
            page_pos[:, :, None] * p + jnp.arange(p)[None, None, :]
        ).reshape(b, kk)
    mask = pos < ctx_lens[:, None]  # [B, K]
    if select_mask is not None:
        mask = mask & select_mask
    scores = jnp.where(mask[:, None, :], scores, NEG_INF)
    if return_stats:
        # unnormalized form matching the Pallas kernel's online-softmax
        # state: m = running max, l = sumexp, out = acc / l
        m = jnp.max(scores, axis=-1)  # [B, Nq]
        e = jnp.exp(scores - m[:, :, None])
        e = jnp.where(mask[:, None, :], e, 0.0)
        l = jnp.sum(e, axis=-1)  # [B, Nq]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        out = jnp.einsum("bhk,bhkd->bhd", e / l_safe[:, :, None],
                         vals.astype(jnp.float32)).astype(q.dtype)
        if emit_scores:
            # combined mode (full-layer-KIVI decode): normalized token
            # scores AND the stats for an exact outside token merge
            token_scores = jnp.sum(e / l_safe[:, :, None], axis=1)
            return out, token_scores, m, l
        return out, m, l
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhk,bhkd->bhd", probs, vals.astype(jnp.float32))
    out = out.astype(q.dtype)
    token_scores = None
    if emit_scores:
        token_scores = jnp.sum(probs, axis=1)  # [B, K] fp32
    return out, token_scores


def _pool_scores(obs_scores: jax.Array, score_pooling: int) -> jax.Array:
    """1D max pool with 'same' padding over the key axis (snapkv
    kernel_size smoothing; matches prefill_attention_ref)."""
    if score_pooling <= 1:
        return obs_scores
    kk = obs_scores.shape[1]
    pad = score_pooling // 2
    padded = jnp.pad(
        obs_scores, ((0, 0), (pad, score_pooling - 1 - pad)),
        constant_values=0.0,
    )
    windows = jnp.stack(
        [padded[:, i : i + kk] for i in range(score_pooling)], axis=-1
    )
    return jnp.max(windows, axis=-1)


def prefill_obs_scores_blockwise(
    q: jax.Array,  # [B, S, Nq, Dh] this chunk's (post-RoPE) queries
    k_cache: jax.Array,  # [num_pages, P, Nkv, Dh] one layer's cache
    page_table: jax.Array,  # [B, max_pages]
    ctx_lens: jax.Array,  # [B] total context incl. this chunk
    new_lens: jax.Array,  # [B] valid new tokens in this chunk
    *,
    sm_scale: float,
    obs_window: int,
    score_pooling: int = 0,
    kv_scales: jax.Array | None = None,  # [2|4, pages, Nkv, P]
    block_pages: int = 8,
) -> jax.Array:
    """SnapKV observation scores with bounded memory at any context length.

    Numerically identical to ``prefill_attention_ref``'s obs path (exact
    softmax over the full context), but never materializes the
    [B, Nq, S, K] score tensor: a two-pass online-softmax ``lax.scan`` over
    page blocks keeps the peak at O(B * Nq * W * block_pages * P). The
    reference's equivalent is the 3-kernel prefill_score pipeline
    (triton_kernel/prefill_score.py:7-247) which exists for the same reason.
    Returns [B, max_pages * P] fp32.
    """
    b, s, nq, dh = q.shape
    p = k_cache.shape[1]  # (int4 cache is flat 3-D [pages, P, Nkv*Dh//2])
    w = min(obs_window, s)
    # MXU dtype: bf16 operands run at full rate (f32 operands are 4-8x
    # slower); f32 inputs (CPU parity tests) keep exact f32 math
    mm_dtype = q.dtype

    # last `w` valid queries of each sequence (+ validity for short prompts)
    wi = jnp.arange(w)[None, :]  # [1, W]
    src = new_lens[:, None] - w + wi  # [B, W] chunk-row of each obs query
    valid_q = src >= 0
    src_c = jnp.clip(src, 0, s - 1)
    q_obs = jnp.take_along_axis(
        q, src_c[:, :, None, None], axis=1
    )  # [B, W, Nq, Dh]
    qpos = (ctx_lens - new_lens)[:, None] + src_c  # [B, W] absolute position

    mp = page_table.shape[1]
    nblk = -(-mp // block_pages)
    table_pad = jnp.pad(
        page_table, ((0, 0), (0, nblk * block_pages - mp))
    )  # padded entries masked by kpos >= ctx below? no — by kpos >= mp*P

    def _keys_block(j):
        tb = jax.lax.dynamic_slice(
            table_pad, (0, j * block_pages), (b, block_pages)
        )
        if kv_scales is not None and kv_scales.shape[0] == 4:
            keys = gather_dequant_u4(
                k_cache, kv_scales[0], kv_scales[2], tb
            )
        elif kv_scales is not None:
            keys = gather_dequant(k_cache, kv_scales[0], tb)
        else:
            keys = gather_pages(k_cache, tb)
        return keys.astype(mm_dtype)  # [B, Nkv, bp*P, Dh]

    kb = block_pages * p
    kpos0 = jnp.arange(kb)[None, None, :]  # [1, 1, kb]

    def _scores_block(j):
        keys = _expand_gqa(_keys_block(j), nq)  # [B, Nq, kb, Dh]
        st = jnp.einsum(
            "bwhd,bhkd->bhwk", q_obs, keys,
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [B, Nq, W, kb]
        kpos = j * kb + kpos0  # [1, 1, kb]
        mask = (
            (kpos[:, :, None, :] <= qpos[:, None, :, None])
            & (kpos[:, :, None, :] < ctx_lens[:, None, None, None])
            & (kpos[:, :, None, :] < mp * p)
            & valid_q[:, None, :, None]
        )  # [B, 1->Nq, W, kb]
        return jnp.where(mask, st, NEG_INF), mask

    # pass 1: running (m, l) per (b, head, obs query)
    def p1(carry, j):
        m, l = carry
        st, _ = _scores_block(j)
        m_cur = jnp.max(st, axis=-1)  # [B, Nq, W]
        m_new = jnp.maximum(m, m_cur)
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(st - m_new[..., None]), axis=-1
        )
        return (m_new, l), None

    m0 = jnp.full((b, nq, w), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, nq, w), jnp.float32)
    (m, l), _ = jax.lax.scan(p1, (m0, l0), jnp.arange(nblk))
    l_safe = jnp.where(l <= 0.0, 1.0, l)

    # pass 2: per-block normalized probabilities summed over heads+queries
    def p2(_, j):
        st, mask = _scores_block(j)
        prob = jnp.where(
            mask, jnp.exp(st - m[..., None]) / l_safe[..., None], 0.0
        )
        return None, jnp.sum(prob, axis=(1, 2))  # [B, kb]

    _, blocks = jax.lax.scan(p2, None, jnp.arange(nblk))  # [nblk, B, kb]
    obs = blocks.transpose(1, 0, 2).reshape(b, nblk * kb)[:, : mp * p]
    return _pool_scores(obs, score_pooling)
