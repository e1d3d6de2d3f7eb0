"""Smart-router unit tests (reference tests/test_openai_smart_router.py).

choose_worker policy: best prefix match wins unless overloaded relative to
the least-loaded candidate; unhealthy workers excluded; target_worker and
model filters honored.
"""

import asyncio

import pytest

from sparsevllm_tpu.entrypoints.openai.smart_router import (
    SmartRouter, WorkerState,
)


def _router(loads, healthy=None, prefix_cache=True):
    r = SmartRouter([f"http://w{i}:8000" for i in range(len(loads))])
    for i, w in enumerate(r.workers):
        w.healthy = healthy[i] if healthy else True
        w.load = {"running": loads[i], "waiting": 0, "queued": 0}
        w.info = {"model": "m", "prefix_cache": prefix_cache}
    return r


def _choose(r, body, token_ids, probes):
    async def fake_probe(w, ids):
        return probes.get(w.url, 0)

    r._probe_prefix = fake_probe
    return asyncio.new_event_loop().run_until_complete(
        r.choose_worker(body, token_ids)
    )


def test_lowest_load_without_prefix():
    r = _router([5, 1, 3])
    w = _choose(r, {"model": "m"}, None, {})
    assert w.url == "http://w1:8000"


def test_prefix_match_wins_when_not_overloaded():
    r = _router([5, 1, 3])
    w = _choose(r, {"model": "m"}, [1, 2, 3],
                {"http://w2:8000": 128})
    assert w.url == "http://w2:8000"  # +2 load delta < threshold 8


def test_prefix_match_rejected_when_overloaded():
    r = _router([20, 1, 3])
    w = _choose(r, {"model": "m"}, [1, 2, 3],
                {"http://w0:8000": 512})
    assert w.url == "http://w1:8000"  # delta 19 > threshold


def test_unhealthy_excluded():
    r = _router([1, 0], healthy=[False, True])
    w = _choose(r, {}, None, {})
    assert w.url == "http://w1:8000"


def test_no_healthy_workers():
    r = _router([1], healthy=[False])
    w = _choose(r, {}, None, {})
    assert w is None


def test_target_worker_hint():
    r = _router([0, 9])
    w = _choose(r, {"target_worker": "http://w1:8000"}, None, {})
    assert w.url == "http://w1:8000"


def test_model_filter():
    r = _router([0, 1])
    r.workers[0].info = {"model": "other"}
    w = _choose(r, {"model": "m"}, None, {})
    assert w.url == "http://w1:8000"
