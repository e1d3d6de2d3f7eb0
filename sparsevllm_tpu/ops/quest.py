"""Quest: query-aware page selection over per-page K min/max metadata.

Re-expresses reference engine/cache_manager/quest.py: page summaries
``metadata[2(min/max), L, pages, Nkv, Dh]`` are maintained at KV-store time
(:1074 on_kv_stored) and decode scores each candidate page with the
upper bound sum_d max(q_d*min_d, q_d*max_d) (:1298 _build_decode_view_static),
keeping the top budget/page_size pages.

TPU twist: instead of building masked views, selection produces a COMPACTED
page table [B, KP] + logical page positions, and the paged decode kernel
reads only those pages — the HBM read is proportional to the Quest budget,
not the context (the whole point of Quest). Sink and recent pages are
force-included; metadata granularity equals the cache page here (the
reference's sub-page ``quest_page_size`` trades selection granularity for
overhead — with 64-token pages the overhead term 2/page_size is already
~3%).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def init_page_meta(num_layers: int, num_pages: int, nkv: int, dh: int,
                   dtype=jnp.float32) -> jax.Array:
    """[2, L, pages, Nkv, Dh]: [0]=min K, [1]=max K per page."""
    meta = jnp.zeros((2, num_layers, num_pages, nkv, dh), dtype)
    meta = meta.at[0].set(jnp.inf)
    meta = meta.at[1].set(-jnp.inf)
    return meta


def update_page_meta(
    meta: jax.Array,  # [2, L, pages, Nkv, Dh]
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh] (token-major)
    layer_idx,  # scalar
    pages: jax.Array,  # [N] page ids touched by this step's KV store
) -> jax.Array:
    """Recompute min/max K for the touched pages of one layer.

    Fully recomputed (not merged): an evicted/reused page must not inherit
    stale extrema. Padded page entries may repeat ids — scatter order is
    irrelevant since all duplicates write identical values.
    """
    layer_pages = jax.lax.dynamic_index_in_dim(
        k_cache, layer_idx, 0, keepdims=False
    )[pages]  # [N, P, Nkv, Dh]
    kf = layer_pages.astype(meta.dtype)
    mn = jnp.min(kf, axis=1)  # [N, Nkv, Dh]
    mx = jnp.max(kf, axis=1)
    meta = meta.at[0, layer_idx, pages].set(mn)
    meta = meta.at[1, layer_idx, pages].set(mx)
    return meta


def select_pages(
    q: jax.Array,  # [B, Nq, Dh]
    meta: jax.Array,  # [2, L, pages, Nkv, Dh]
    layer_idx,
    page_table: jax.Array,  # [B, MP]
    ctx_lens: jax.Array,  # [B]
    *,
    keep_pages: int,  # static KP (budget/page + forced regions)
    page_size: int,
    sink_pages: int,
    recent_pages: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-KP pages by q-aware upper bound -> (compact_table, page_pos).

    Forced-in: sink pages, recent pages (incl. the partially-filled current
    page). Out-of-context entries score NEG_INF; if fewer than KP pages are
    in context the extras are out-of-range duplicates masked by the kernel's
    pos < ctx check (page_pos points past the context).
    """
    b, nq, dh = q.shape
    mp = page_table.shape[1]
    nkv = meta.shape[3]
    g = nq // nkv

    mn = jax.lax.dynamic_index_in_dim(meta[0], layer_idx, 0, False)[
        page_table
    ]  # [B, MP, Nkv, Dh]
    mx = jax.lax.dynamic_index_in_dim(meta[1], layer_idx, 0, False)[
        page_table
    ]
    qf = q.astype(meta.dtype).reshape(b, nkv, g, dh)
    # upper bound sum_d max(q_d*min_d, q_d*max_d) per (page, kv head,
    # q-in-group), then summed over heads (reference quest.py scores per kv
    # head and reduces over the group).
    prod_lo = qf[:, None, :, :, :] * mn[:, :, :, None, :]  # [B,MP,Nkv,G,Dh]
    prod_hi = qf[:, None, :, :, :] * mx[:, :, :, None, :]
    ub = jnp.sum(jnp.maximum(prod_lo, prod_hi), axis=-1)  # [B, MP, Nkv, G]
    scores = jnp.sum(ub, axis=(2, 3))  # [B, MP]

    pos = jnp.arange(mp, dtype=jnp.int32)[None, :]  # logical page index
    n_ctx_pages = -(-ctx_lens // page_size)  # [B]
    in_ctx = pos < n_ctx_pages[:, None]
    forced = (pos < sink_pages) | (
        pos >= jnp.maximum(n_ctx_pages[:, None] - recent_pages, 0)
    )
    scores = jnp.where(in_ctx, scores, NEG_INF)
    scores = jnp.where(forced & in_ctx, jnp.inf, scores)
    _, top_idx = jax.lax.top_k(scores, keep_pages)  # [B, KP] logical pages
    compact = jnp.take_along_axis(page_table, top_idx, axis=1)
    return compact, top_idx
