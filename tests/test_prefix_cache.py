"""Prefix cache: radix-index unit tests + engine E2E reuse parity.

Mirrors reference tests/test_prefix_cache.py (1,353 LoC of radix logic
tests) at the block level, plus the E2E property that matters: a cache hit
must produce byte-identical generations to a cold run.
"""

import numpy as np
import pytest

from sparsevllm_tpu.engine.llm_engine import LLMEngine
from sparsevllm_tpu.engine.prefix_cache import RadixPrefixIndex
from sparsevllm_tpu.sampling_params import SamplingParams

L = 2


def _pages(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 100, size=L).astype(np.int32)


def test_insert_match_chain():
    idx = RadixPrefixIndex(4, L, "fp")
    tokens = list(range(16))
    created = idx.insert_chain(tokens, lambda i: _pages(i), 16)
    assert len(created) == 4
    m = idx.match_longest_prefix(tokens)
    assert len(m) == 4
    # shorter prefix matches fewer blocks
    assert len(idx.match_longest_prefix(tokens[:9])) == 2
    # divergent suffix stops the chain
    other = tokens[:8] + [99, 98, 97, 96]
    assert len(idx.match_longest_prefix(other)) == 2
    assert idx.match_length(tokens) == 16


def test_fingerprint_isolation():
    a = RadixPrefixIndex(4, L, "fp-a")
    b = RadixPrefixIndex(4, L, "fp-b")
    tokens = list(range(8))
    a.insert_chain(tokens, lambda i: _pages(i), 8)
    assert b.match_length(tokens) == 0  # different config fingerprint


def test_insert_dedup_keeps_canonical_pages():
    idx = RadixPrefixIndex(4, L, "fp")
    tokens = list(range(8))
    first = idx.insert_chain(tokens, lambda i: _pages(i), 8)
    again = idx.insert_chain(tokens, lambda i: _pages(100 + i), 8)
    assert len(first) == 2 and len(again) == 0  # existing nodes untouched
    m = idx.match_longest_prefix(tokens)
    np.testing.assert_array_equal(m[0].pages, _pages(0))


def test_refcount_blocks_eviction():
    idx = RadixPrefixIndex(4, L, "fp")
    tokens = list(range(8))
    idx.insert_chain(tokens, lambda i: _pages(i), 8)
    blocks = idx.match_longest_prefix(tokens)
    idx.acquire(blocks)
    assert idx.evict(10) == []  # all referenced
    idx.release(blocks)
    evicted = idx.evict(10)
    assert len(evicted) == 2
    assert idx.num_blocks == 0


def test_lru_leaf_eviction_order():
    idx = RadixPrefixIndex(4, L, "fp")
    a = list(range(8))
    b = list(range(4)) + [50, 51, 52, 53]
    idx.insert_chain(a, lambda i: _pages(i), 8)
    idx.insert_chain(b, lambda i: _pages(10 + i), 8)
    assert idx.num_blocks == 3  # shared first block
    # touch chain b so a's leaf is LRU
    idx.match_longest_prefix(b)
    evicted = idx.evict(1)
    assert len(evicted) == 1
    assert idx.match_length(b) == 8  # b intact
    assert idx.match_length(a) == 4  # a's leaf gone, shared root remains


@pytest.fixture(scope="module")
def engines():
    kw = dict(
        tiny_random=True,
        dtype="float32",
        page_size=8,
        num_kv_pages=128,
        max_model_len=512,
        chunk_prefill_size=32,
        max_num_batched_tokens=512,
        max_decoding_seqs=4,
        max_num_seqs_in_batch=4,
        decode_context_bucket_base=64,
        decode_steps_per_dispatch=4,
    )
    cached = LLMEngine(enable_prefix_cache=True, **kw)
    cold = LLMEngine(enable_prefix_cache=False, **kw)
    return cached, cold


def _gen(eng, prompt, n=8):
    out = eng.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=n,
                                       ignore_eos=True),
    )
    return out[0].output_token_ids


def test_e2e_cache_hit_matches_cold(engines):
    cached, cold = engines
    rng = np.random.default_rng(7)
    prompt = [int(t) for t in rng.integers(3, 500, size=45)]

    first = _gen(cached, prompt)
    assert cached.prefix_cache.num_blocks > 0
    stats0 = cached.prefix_cache.stats()

    # same prompt again: hit (45 tokens -> 5 full blocks of 8 = 40 matched)
    second = _gen(cached, prompt)
    stats1 = cached.prefix_cache.stats()
    assert stats1["hits"] > stats0["hits"]
    assert first == second

    # extended prompt shares the prefix
    ext = prompt + [int(t) for t in rng.integers(3, 500, size=20)]
    got = _gen(cached, ext)
    want = _gen(cold, ext)
    assert got == want


def test_e2e_cache_eviction_under_pressure(engines):
    cached, _ = engines
    rng = np.random.default_rng(11)
    # churn many distinct prompts through a small pool; engine must evict
    # cached blocks rather than deadlock or leak pages.
    for i in range(6):
        prompt = [int(t) for t in rng.integers(3, 500, size=60)]
        _gen(cached, prompt, n=4)
    stats = cached.kv.free_slot_stats()
    assert stats["free_rows"] == cached.kv.max_rows
    # reset control API frees everything unreferenced
    cached.reset_prefix_cache()
    assert cached.prefix_cache.num_blocks == 0
