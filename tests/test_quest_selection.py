"""Quest selection-machinery evidence (decoupled from the recall oracle).

The induction oracle's keys are RANDOM unit codes — adversarial for any
min/max-box bound: a box over k random vectors has per-dim extent ~±0.5,
so sum_d max(q_d*min_d, q_d*max_d) exceeds the needle's exact q·k for
EVERY page and the ranking carries no signal (the reference's
_score_pages_batched math, quest.py:1239-1267, behaves identically).
Quest's premise is that real-model keys CLUSTER (channel outliers,
low-rank structure). These tests certify the machinery on keys that
satisfy the premise: selection must retrieve the matching page exactly,
sub-page boxes must tighten page bounds, and forced regions must always
survive.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax.numpy as jnp
import numpy as np

from sparsevllm_tpu.ops import quest as q_ops

L, PAGES, P, NKV, DH = 1, 17, 32, 2, 16


def _build(subpages, key_noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    meta = q_ops.init_page_meta(L, PAGES, NKV, DH, jnp.float32,
                                subpages=subpages)
    cents = rng.standard_normal((PAGES, NKV, DH)).astype(np.float32)
    kc = (
        cents[:, None] + key_noise * rng.standard_normal(
            (PAGES, P, NKV, DH)
        )
    ).astype(np.float32)
    kc = jnp.asarray(kc)[None]
    meta = q_ops.update_page_meta(meta, kc, 0, jnp.arange(PAGES))
    return meta, cents


def _select(meta, qv, keep_pages=4):
    table = jnp.arange(1, 17, dtype=jnp.int32)[None]  # 16 logical pages
    ctx = jnp.asarray([16 * P], jnp.int32)
    return q_ops.select_pages(
        jnp.asarray(qv), meta, 0, table, ctx,
        keep_pages=keep_pages, page_size=P, sink_pages=1, recent_pages=1,
    )


def test_clustered_keys_exact_retrieval():
    """Every non-forced page centroid, queried directly, must be kept."""
    meta, cents = _build(subpages=2)
    for target in range(2, 14):
        qv = np.zeros((1, 2 * NKV, DH), np.float32)
        head = target % NKV
        qv[0, head * 2] = cents[1 + target, head]
        _, ppos = _select(meta, qv)
        assert target in np.asarray(ppos[0]), (
            f"page {target} not retrieved: {np.asarray(ppos[0])}"
        )


def test_forced_sink_and_recent_always_selected():
    meta, cents = _build(subpages=2)
    qv = np.random.default_rng(1).standard_normal(
        (1, 2 * NKV, DH)
    ).astype(np.float32)
    _, ppos = _select(meta, qv)
    sel = set(np.asarray(ppos[0]).tolist())
    assert 0 in sel, "sink page evicted"
    assert 15 in sel, "recent/current page evicted"


def test_subpage_bounds_tighten_page_bounds():
    """max-over-subpage UB <= whole-page UB for every page (strictly
    tighter boxes on mixed pages)."""
    rng = np.random.default_rng(2)
    kc = jnp.asarray(rng.standard_normal((1, PAGES, P, NKV, DH)),
                     jnp.float32)
    qv = rng.standard_normal((1, 2 * NKV, DH)).astype(np.float32)
    table = jnp.arange(1, 17, dtype=jnp.int32)[None]
    ctx = jnp.asarray([16 * P], jnp.int32)

    def page_scores(subpages):
        meta = q_ops.init_page_meta(L, PAGES, NKV, DH, jnp.float32,
                                    subpages=subpages)
        meta = q_ops.update_page_meta(meta, kc, 0, jnp.arange(PAGES))
        mn = meta[0, 0][table]
        mx = meta[1, 0][table]
        qf = jnp.asarray(qv).reshape(1, NKV, 2, DH)
        lo = qf[:, None, None] * mn[:, :, :, :, None, :]
        hi = qf[:, None, None] * mx[:, :, :, :, None, :]
        ub = jnp.sum(jnp.maximum(lo, hi), axis=-1)
        return np.asarray(jnp.max(ub, axis=(2, 3, 4)))

    whole = page_scores(1)
    sub = page_scores(4)
    assert np.all(sub <= whole + 1e-5)
    assert np.any(sub < whole - 1e-5)  # genuinely tighter somewhere
