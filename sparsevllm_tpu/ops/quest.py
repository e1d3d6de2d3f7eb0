"""Quest: query-aware page selection over sub-page K min/max metadata.

Re-expresses reference engine/cache_manager/quest.py: summaries are
maintained at KV-store time (:1074 on_kv_stored) and decode scores each
candidate with the upper bound sum_d max(q_d*min_d, q_d*max_d)
(:1298 _build_decode_view_static), keeping the top budget/page_size pages.

TPU twist: instead of building masked views, selection produces a COMPACTED
page table [B, KP] + logical page positions, and the paged decode kernel
reads only those pages — the HBM read is proportional to the Quest budget,
not the context (the whole point of Quest).

Metadata granularity is ``quest_page_size`` SUB-pages (reference
``quest_chunk_size``, quest.py:39 — independent of the cache page size):
each cache page keeps S = page_size/quest_page_size (min, max) AABBs and a
page's score is the MAX of its sub-page upper bounds. A whole-page AABB is
the loosest possible bound (one outlier channel anywhere in 128 tokens
inflates the box; measured 0.67 recall on the induction oracle); sub-page
boxes are strictly tighter, so ranking sharpens while the kernel still
reads whole pages. Memory overhead: 2*S*Nkv*Dh floats per page
(~6% of KV at S=8 f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def init_page_meta(num_layers: int, num_pages: int, nkv: int, dh: int,
                   dtype=jnp.float32, subpages: int = 1) -> jax.Array:
    """[2, L, pages, S, Nkv, Dh]: [0]=min K, [1]=max K per sub-page."""
    meta = jnp.zeros((2, num_layers, num_pages, subpages, nkv, dh), dtype)
    meta = meta.at[0].set(jnp.inf)
    meta = meta.at[1].set(-jnp.inf)
    return meta


def update_page_meta(
    meta: jax.Array,  # [2, L, pages, S, Nkv, Dh]
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh] (token-major)
    layer_idx,  # scalar
    pages: jax.Array,  # [N] page ids touched by this step's KV store
) -> jax.Array:
    """Recompute sub-page min/max K for the touched pages of one layer.

    Fully recomputed (not merged): an evicted/reused page must not inherit
    stale extrema. Padded page entries may repeat ids — scatter order is
    irrelevant since all duplicates write identical values.
    """
    s = meta.shape[3]
    layer_pages = jax.lax.dynamic_index_in_dim(
        k_cache, layer_idx, 0, keepdims=False
    )[pages]  # [N, P, Nkv, Dh]
    n, p, nkv, dh = layer_pages.shape
    kf = layer_pages.astype(meta.dtype).reshape(n, s, p // s, nkv, dh)
    mn = jnp.min(kf, axis=2)  # [N, S, Nkv, Dh]
    mx = jnp.max(kf, axis=2)
    meta = meta.at[0, layer_idx, pages].set(mn)
    meta = meta.at[1, layer_idx, pages].set(mx)
    return meta


def select_pages(
    q: jax.Array,  # [B, Nq, Dh]
    meta: jax.Array,  # [2, L, pages, S, Nkv, Dh]
    layer_idx,
    page_table: jax.Array,  # [B, MP]
    ctx_lens: jax.Array,  # [B]
    *,
    keep_pages: int,  # static KP (budget/page + forced regions)
    page_size: int,
    sink_pages: int,
    recent_pages: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-KP pages by q-aware sub-page upper bound -> (compact_table,
    page_pos).

    Forced-in: sink pages, recent pages (incl. the partially-filled current
    page). Out-of-context entries score NEG_INF; if fewer than KP pages are
    in context the extras are out-of-range duplicates masked by the kernel's
    pos < ctx check (page_pos points past the context).
    """
    b, nq, dh = q.shape
    mp = page_table.shape[1]
    nkv = meta.shape[4]
    s = meta.shape[3]
    g = nq // nkv

    mn = jax.lax.dynamic_index_in_dim(meta[0], layer_idx, 0, False)[
        page_table
    ]  # [B, MP, S, Nkv, Dh]
    mx = jax.lax.dynamic_index_in_dim(meta[1], layer_idx, 0, False)[
        page_table
    ]
    qf = q.astype(meta.dtype).reshape(b, nkv, g, dh)
    # upper bound sum_d max(q_d*min_d, q_d*max_d) per (sub-page, kv head,
    # q-in-group); reduce over heads with MAX — the reference amax-reduces
    # over group AND kv heads (_score_pages_batched, quest.py:1256,1267):
    # one matching head must dominate, a sum drowns it in the other heads'
    # noise (measured 0.67 vs 1.00 oracle recall) — then MAX over the
    # page's sub-pages: the tightest page-level bound a page-granular
    # read can use.
    prod_lo = (qf[:, None, None] * mn[:, :, :, :, None, :])
    prod_hi = (qf[:, None, None] * mx[:, :, :, :, None, :])
    ub = jnp.sum(jnp.maximum(prod_lo, prod_hi), axis=-1)  # [B,MP,S,Nkv,G]
    sub_scores = jnp.max(ub, axis=(3, 4))  # [B, MP, S]
    # mask sub-pages past the context (the current partial page's unwritten
    # tail holds stale/zero K whose box would otherwise leak into the max)
    pos = jnp.arange(mp, dtype=jnp.int32)[None, :]
    sub_start = (
        pos[:, :, None] * page_size
        + jnp.arange(s, dtype=jnp.int32)[None, None, :] * (page_size // s)
    )
    sub_scores = jnp.where(
        sub_start < ctx_lens[:, None, None], sub_scores, NEG_INF
    )
    scores = jnp.max(sub_scores, axis=2)  # [B, MP]

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
