"""R-KV pairwise redundancy parity vs an independent torch oracle.

The oracle re-implements the reference formula
(engine/cache_manager/rkv.py:539-580 redundancy_scores_from_keys_batch)
directly in torch; the jax op must match it on the valid region for every
(threshold, recent_similar_keep) combination, including the ragged
ctx_lens masking the batched fixed-shape op adds.
"""

import numpy as np
import torch

from sparsevllm_tpu.ops import rkv as rkv_ops


def torch_oracle(keys, threshold, keep):
    """keys [B, K, F] (valid-only rows); reference batch formula."""
    bsz, k, _ = keys.shape
    flat = torch.nn.functional.normalize(
        keys.float(), p=2, dim=-1, eps=1.0e-6
    )
    sim = torch.bmm(flat, flat.transpose(1, 2))
    diag = torch.arange(k)
    sim[:, diag, diag] = 0.0
    if threshold > 0.0:
        sim = torch.where(sim >= threshold, sim, torch.zeros_like(sim))
    if keep > 0 and k > 1:
        upper = torch.triu(torch.ones((k, k), dtype=torch.bool), diagonal=1)
        high_future = (sim > 0) & upper.unsqueeze(0)
        rank = high_future.flip(2).to(torch.int32).cumsum(2).flip(2)
        sim = sim.masked_fill(high_future & (rank <= keep), 0.0)
    avg = sim.mean(dim=2)
    return torch.softmax(avg, dim=1)


def run_case(threshold, keep, seed=0):
    rng = np.random.default_rng(seed)
    b, kk, f = 2, 24, 16
    ctx = np.asarray([24, 17], np.int32)
    keys = rng.standard_normal((b, kk, f)).astype(np.float32)
    # plant near-duplicate keys to exercise the threshold/keep paths
    keys[0, 5] = keys[0, 3] + 0.01 * rng.standard_normal(f)
    keys[0, 9] = keys[0, 3] + 0.01 * rng.standard_normal(f)
    keys[1, 2] = keys[1, 1]
    in_ctx = np.arange(kk)[None, :] < ctx[:, None]

    got = np.asarray(
        rkv_ops.redundancy_scores(
            keys, in_ctx, ctx,
            similarity_threshold=threshold,
            recent_similar_keep=keep,
        )
    )
    for i in range(b):
        n = int(ctx[i])
        want = torch_oracle(
            torch.from_numpy(keys[i : i + 1, :n]), threshold, keep
        ).numpy()[0]
        np.testing.assert_allclose(got[i, :n], want, rtol=1e-5, atol=1e-6)
        assert np.all(got[i, n:] == 0.0)


def test_redundancy_matches_reference_formula():
    run_case(threshold=0.8, keep=1)


def test_redundancy_no_threshold_no_keep():
    run_case(threshold=0.0, keep=0, seed=1)


def test_redundancy_keep_forgives_recent_links():
    run_case(threshold=0.5, keep=2, seed=2)


def test_duplicate_keys_rank_most_redundant():
    rng = np.random.default_rng(3)
    b, kk, f = 1, 16, 8
    ctx = np.asarray([16], np.int32)
    keys = rng.standard_normal((b, kk, f)).astype(np.float32)
    keys[0, 7] = keys[0, 4]
    keys[0, 11] = keys[0, 4]
    in_ctx = np.ones((b, kk), bool)
    red = np.asarray(
        rkv_ops.redundancy_scores(
            keys, in_ctx, ctx, similarity_threshold=0.8,
            recent_similar_keep=0,
        )
    )[0]
    # the triplicated key cluster must carry the highest redundancy
    top3 = set(np.argsort(red)[-3:].tolist())
    assert top3 == {4, 7, 11}, (top3, red)
