"""RKV: decode-time joint eviction scores (attention + redundancy).

Re-expresses reference engine/cache_manager/rkv.py: a per-layer ring buffer
of recent decode queries (:132 _rkv_layer_query_cache, record_decode_query
:313) feeds a periodic joint eviction every ``rkv_compression_interval``
generated tokens — attention scores from the cached queries (:333-497) plus
key-similarity redundancy penalties (:498-580) combine into joint retention
scores (:581) that pick which resident tokens survive (:591-723).

TPU shape: scores are computed as one jitted fixed-shape op over the paged
cache ([L, B, K] retention scores); the physical eviction reuses the SnapKV
compaction op (ordered top-k gather into fresh pages + device table rewrite,
engine/executor.py _compact_impl) — eviction IS compaction here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def init_query_cache(num_layers: int, rows: int, cache_size: int,
                     nq: int, dh: int, dtype=jnp.bfloat16) -> jax.Array:
    """[L, R, Qc, Nq, Dh] ring buffer of recent decode queries."""
    return jnp.zeros((num_layers, rows, cache_size, nq, dh), dtype)


def record_query(
    qcache: jax.Array,  # [L, R, Qc, Nq, Dh]
    layer_idx,
    q: jax.Array,  # [B, Nq, Dh]
    row_ids: jax.Array,  # [B]
    slots: jax.Array,  # [B] ring position = completion_len % Qc
) -> jax.Array:
    """Write this step's decode queries into the ring buffer.

    Padded decode lanes carry out-of-range row_ids (= max_rows); drop their
    writes instead of scribbling over a live row.
    """
    return qcache.at[layer_idx, row_ids, slots].set(
        q.astype(qcache.dtype), mode="drop"
    )


def redundancy_scores(
    keys_flat: jax.Array,  # [B, K, F] keys flattened across kv heads, fp32
    in_ctx: jax.Array,  # [B, K] bool resident mask
    ctx_lens: jax.Array,  # [B]
    *,
    similarity_threshold: float,
    recent_similar_keep: int,
) -> jax.Array:
    """Pairwise-similarity redundancy [B, K] (softmax-normalized over
    residents). Mirrors reference rkv.py:498-580
    (redundancy_scores_from_keys_batch): full K x K cosine similarity with
    the diagonal zeroed, links below ``similarity_threshold`` dropped, and
    each token's most recent ``recent_similar_keep`` similar FUTURE tokens
    forgiven (later reasoning tokens are not penalized merely because
    older tokens echo them). The quadratic cost is guarded by
    ``rkv_max_redundancy_tokens`` at score-fn build time — on TPU the
    K x K product is one MXU matmul, so the fixed-shape batched form is
    the idiomatic spelling of the reference's windowed loop.
    """
    b, kk, _ = keys_flat.shape
    kn = keys_flat / (
        jnp.linalg.norm(keys_flat, axis=-1, keepdims=True) + 1e-6
    )
    sim = jnp.einsum("bkf,bjf->bkj", kn, kn)
    eye = jnp.eye(kk, dtype=bool)[None]
    valid_pair = in_ctx[:, :, None] & in_ctx[:, None, :] & ~eye
    sim = jnp.where(valid_pair, sim, 0.0)
    if similarity_threshold > 0.0:
        sim = jnp.where(sim >= similarity_threshold, sim, 0.0)
    if recent_similar_keep > 0:
        upper = jnp.triu(jnp.ones((kk, kk), bool), k=1)[None]
        high_future = (sim > 0.0) & upper
        rank_from_right = jnp.cumsum(
            high_future[..., ::-1].astype(jnp.int32), axis=-1
        )[..., ::-1]
        forgiven = high_future & (rank_from_right <= recent_similar_keep)
        sim = jnp.where(forgiven, 0.0, sim)
    avg = sim.sum(axis=2) / jnp.maximum(
        ctx_lens[:, None].astype(jnp.float32), 1.0
    )
    red = jax.nn.softmax(jnp.where(in_ctx, avg, NEG_INF), axis=-1)
    return jnp.where(in_ctx, red, 0.0)


def retention_scores(
    qcache_layer: jax.Array,  # [B, Qc, Nq, Dh] (already row-gathered)
    n_queries: jax.Array,  # [B] valid entries in the ring
    keys: jax.Array,  # [B, Nkv, K, Dh] gathered keys (fp)
    ctx_lens: jax.Array,  # [B]
    *,
    sm_scale: float,
    redundancy_weight: float,
    similarity_threshold: float = 0.8,
    recent_similar_keep: int = 1,
) -> jax.Array:
    """Joint retention scores [B, K] fp32.

    attention term: softmax(q.K) over keys, summed over cached queries and
    heads (reference rkv.py:333-497); redundancy term: pairwise key
    similarity (reference :498-580, see redundancy_scores). Combined as
    ``attn - redundancy_weight * red`` — the reference's
    ``alpha * importance - (1 - alpha) * redundancy`` (:581-589) with the
    weight exposed directly instead of via alpha.
    """
    b, qc, nq, dh = qcache_layer.shape
    nkv = keys.shape[1]
    g = nq // nkv
    kk = keys.shape[2]

    kf = keys.astype(jnp.float32)
    qf = qcache_layer.astype(jnp.float32).reshape(b, qc, nkv, g, dh)
    # scores per (query, kv head, group, key)
    s = jnp.einsum("bqhgd,bhkd->bqhgk", qf, kf) * sm_scale
    pos = jnp.arange(kk)[None, :]
    in_ctx = pos < ctx_lens[:, None]  # [B, K]
    s = jnp.where(in_ctx[:, None, None, None, :], s, NEG_INF)
    probs = jax.nn.softmax(s, axis=-1)
    # mask invalid (unfilled) ring entries
    q_valid = (jnp.arange(qc)[None, :] < n_queries[:, None]).astype(
        jnp.float32
    )
    attn = jnp.einsum("bqhgk,bq->bk", probs, q_valid)  # [B, K]

    # keys flattened across kv heads, matching the reference's
    # reshape(token_count, -1) before normalize (:517-518)
    keys_flat = kf.transpose(0, 2, 1, 3).reshape(b, kk, nkv * dh)
    red = redundancy_scores(
        keys_flat, in_ctx, ctx_lens,
        similarity_threshold=similarity_threshold,
        recent_similar_keep=recent_similar_keep,
    )

    scores = attn - redundancy_weight * red
    return jnp.where(in_ctx, scores, NEG_INF)
