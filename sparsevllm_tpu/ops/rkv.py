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


def retention_scores(
    qcache_layer: jax.Array,  # [B, Qc, Nq, Dh] (already row-gathered)
    n_queries: jax.Array,  # [B] valid entries in the ring
    keys: jax.Array,  # [B, Nkv, K, Dh] gathered keys (fp)
    ctx_lens: jax.Array,  # [B]
    *,
    sm_scale: float,
    redundancy_weight: float,
) -> jax.Array:
    """Joint retention scores [B, K] fp32.

    attention term: softmax(q.K) over keys, summed over cached queries and
    heads (reference rkv.py:333-497); redundancy term: cosine similarity of
    each key to its predecessor (reference :498-580) — a key that repeats
    its neighbour is cheap to drop.
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

    # redundancy: cos(k_j, k_{j-1}) averaged over kv heads
    norm = jnp.linalg.norm(kf, axis=-1) + 1e-6  # [B, Nkv, K]
    kn = kf / norm[..., None]
    sim = jnp.sum(kn[:, :, 1:] * kn[:, :, :-1], axis=-1)  # [B, Nkv, K-1]
    red = jnp.concatenate(
        [jnp.zeros((b, nkv, 1), jnp.float32), sim], axis=2
    ).mean(axis=1)  # [B, K]

    scores = attn - redundancy_weight * red
    return jnp.where(in_ctx, scores, NEG_INF)
