"""Batched token sampler (functional, jit-safe).

Re-expresses reference layers/sampler.py:1-61: greedy fast path plus
temperature / top-k / top-p via the exponential(Gumbel)-race trick, all as
static-shape masked ops so the sampler can be fused into the bucketed decode
step ("capture_sampling", reference decode_cuda_graph.py:446-466).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def sample(
    logits: jax.Array,  # [B, V] float
    temperatures: jax.Array,  # [B] float; 0 => greedy
    top_k: jax.Array,  # [B] int32; 0 => disabled
    top_p: jax.Array,  # [B] float; 1.0 => disabled
    key: jax.Array,  # PRNG key
    mode: str = "full",  # static batch-level fast path, see below
) -> jax.Array:
    """Returns sampled token ids [B] int32.

    ``mode`` is a STATIC specialization the executor derives host-side from
    the batch's sampling params (part of the jit cache key):
      * "greedy"    — every seq has temperature 0: argmax only.
      * "temp_only" — no seq uses top-k/top-p: skip the two full-vocab
        sorts (they cost more than the whole attention stack at 128K vocab).
      * "full"      — per-seq top-k/top-p masking (two sorts).
    Numerics are identical across modes for the configs they admit.
    """
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if mode == "greedy":
        return greedy_ids

    safe_t = jnp.where(temperatures > 0, temperatures, 1.0)
    scaled = logits / safe_t[:, None]

    if mode == "temp_only":
        gumbel = jax.random.gumbel(key, (b, v), dtype=jnp.float32)
        sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
        return jnp.where(temperatures <= 0.0, greedy_ids, sampled)

    # top-k mask: keep logits >= k-th largest (static full sort; V is small
    # relative to the matmuls and this stays shape-stable).
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    k_idx = jnp.clip(jnp.where(top_k > 0, top_k, v) - 1, 0, v - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    masked = jnp.where(scaled >= kth, scaled, NEG_INF)

    # top-p (nucleus) on the already top-k-masked distribution.
    sort_idx = jnp.argsort(masked, axis=-1)[:, ::-1]
    sorted_logits = jnp.take_along_axis(masked, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p
    keep_sorted = (cum - probs) < top_p[:, None]
    keep_sorted = keep_sorted.at[:, 0].set(True)
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(b)[:, None], sort_idx
    ].set(keep_sorted)
    masked = jnp.where(keep, masked, NEG_INF)

    # exponential-race sampling: argmax(logit - log(-log(u))) ~ categorical.
    gumbel = jax.random.gumbel(key, (b, v), dtype=jnp.float32)
    sampled_ids = jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)

    return jnp.where(temperatures <= 0.0, greedy_ids, sampled_ids)


def greedy(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)


def token_logprobs(
    logits: jax.Array,  # [B, V] float
    token_ids: jax.Array,  # [B] int32 (the sampled tokens)
    num_top: int,  # static top-N bucket; 0 allowed (sampled-token lp only)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Log-probabilities for API logprobs output.

    Returns (lp [B] f32 — logprob of token_ids under the model distribution
    (raw-logit log-softmax, matching the reference's logprobs semantics,
    model_runner.py:912-945), top_ids [B, max(num_top,1)] int32,
    top_lps [B, max(num_top,1)] f32). num_top is a STATIC jit-key bucket the
    executor derives from the batch (max requested logprobs)."""
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp = jnp.take_along_axis(lsm, token_ids[:, None], axis=-1)[:, 0]
    n = max(num_top, 1)
    top_lps, top_ids = jax.lax.top_k(lsm, n)
    return lp, top_ids.astype(jnp.int32), top_lps
