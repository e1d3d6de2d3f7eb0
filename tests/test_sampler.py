"""Sampler unit tests: mode equivalence, masking semantics, logprobs.

The sampler is fused into the bucketed decode step (reference
decode_cuda_graph.py:446-466 capture_sampling); these tests pin its
distributional semantics on controlled logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsevllm_tpu.layers.sampler import sample, greedy, token_logprobs


def _logits(rows):
    return jnp.asarray(np.array(rows, dtype=np.float32))


def test_greedy_mode_is_argmax():
    logits = _logits([[0.1, 3.0, 0.2], [5.0, -1.0, 2.0]])
    ids = sample(
        logits,
        jnp.zeros(2),
        jnp.zeros(2, jnp.int32),
        jnp.ones(2),
        jax.random.PRNGKey(0),
        mode="greedy",
    )
    assert ids.tolist() == [1, 0]


def test_zero_temperature_rows_are_greedy_in_full_mode():
    logits = _logits([[0.0, 10.0, 0.0]] * 4)
    temps = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    ids = sample(
        logits, temps, jnp.zeros(4, jnp.int32), jnp.ones(4),
        jax.random.PRNGKey(1), mode="full",
    )
    assert ids[0] == 1 and ids[1] == 1  # greedy rows deterministic


def test_top_k_1_equals_greedy_regardless_of_temperature():
    key = jax.random.PRNGKey(2)
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(8, 64)),
                         jnp.float32)
    ids = sample(
        logits, jnp.full((8,), 5.0), jnp.ones(8, jnp.int32),
        jnp.ones(8), key, mode="full",
    )
    assert ids.tolist() == greedy(logits).tolist()


def test_top_k_masks_tail_tokens():
    # token 0 is far below the top-2; with top_k=2 it must never appear.
    logits = _logits([[-100.0, 1.0, 1.1, -100.0]])
    hits = set()
    for s in range(50):
        ids = sample(
            logits, jnp.ones(1), jnp.full((1,), 2, jnp.int32),
            jnp.ones(1), jax.random.PRNGKey(s), mode="full",
        )
        hits.add(int(ids[0]))
    assert hits <= {1, 2}
    assert len(hits) == 2  # both survivors actually sampled


def test_top_p_nucleus_excludes_tail():
    # probs ~ [0.85, 0.10, ...tiny]; top_p=0.8 keeps only token 0.
    logits = _logits([[6.0, 3.9, 0.0, 0.0]])
    for s in range(20):
        ids = sample(
            logits, jnp.ones(1), jnp.zeros(1, jnp.int32),
            jnp.full((1,), 0.8), jax.random.PRNGKey(s), mode="full",
        )
        assert int(ids[0]) == 0


def test_top_p_always_keeps_best_token():
    logits = _logits([[0.0, 0.1, 0.05]])
    ids = sample(
        logits, jnp.ones(1), jnp.zeros(1, jnp.int32),
        jnp.full((1,), 1e-9), jax.random.PRNGKey(3), mode="full",
    )
    assert int(ids[0]) == 1  # argmax survives any top_p


def test_temp_only_matches_full_when_filters_disabled():
    key = jax.random.PRNGKey(7)
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(4, 32)),
                         jnp.float32)
    temps = jnp.asarray([0.0, 0.7, 1.0, 2.0])
    a = sample(logits, temps, jnp.zeros(4, jnp.int32), jnp.ones(4), key,
               mode="temp_only")
    b = sample(logits, temps, jnp.zeros(4, jnp.int32), jnp.ones(4), key,
               mode="full")
    # identical PRNG stream + identical masking (none) -> identical draws
    assert a.tolist() == b.tolist()


def test_sampling_is_seed_deterministic():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(2, 100)),
                         jnp.float32)
    args = (jnp.ones(2), jnp.zeros(2, jnp.int32), jnp.ones(2))
    a = sample(logits, *args, jax.random.PRNGKey(11), mode="full")
    b = sample(logits, *args, jax.random.PRNGKey(11), mode="full")
    assert a.tolist() == b.tolist()


def test_temperature_sharpens_distribution():
    logits = _logits([[2.0, 1.0, 0.0, -1.0]] * 1)
    cold_hits = sum(
        int(sample(logits, jnp.full((1,), 0.05), jnp.zeros(1, jnp.int32),
                   jnp.ones(1), jax.random.PRNGKey(s), mode="full")[0]) == 0
        for s in range(30)
    )
    assert cold_hits == 30  # near-zero temperature ~ greedy


def test_token_logprobs_match_log_softmax():
    logits = jnp.asarray(np.random.default_rng(3).normal(size=(3, 50)),
                         jnp.float32)
    toks = jnp.asarray([4, 0, 49], jnp.int32)
    lp, top_ids, top_lps = token_logprobs(logits, toks, num_top=5)
    ref = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(ref)[np.arange(3), [4, 0, 49]], rtol=1e-6
    )
    assert top_ids.shape == (3, 5) and top_lps.shape == (3, 5)
    # top-1 id is the argmax and its lp is the max log-softmax entry
    assert top_ids[:, 0].tolist() == jnp.argmax(logits, -1).tolist()
    np.testing.assert_allclose(
        np.asarray(top_lps[:, 0]), np.asarray(ref).max(-1), rtol=1e-6
    )


def test_token_logprobs_num_top_zero_still_returns_rank1_bucket():
    logits = _logits([[0.0, 1.0]])
    lp, top_ids, top_lps = token_logprobs(
        logits, jnp.asarray([0], jnp.int32), num_top=0
    )
    assert top_ids.shape == (1, 1)
    assert float(lp[0]) == pytest.approx(
        float(jax.nn.log_softmax(logits)[0, 0]), rel=1e-6
    )
