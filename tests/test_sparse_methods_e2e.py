"""Sparse-method E2E correctness on the tiny-random model.

Strategy (mirrors reference tiers): when a method's budgets exceed the
context, its output must be IDENTICAL to dense greedy decoding (the sparse
machinery must be a no-op); with tight budgets the engine must still run,
respect its memory invariants, and physically free what it evicts.
"""

import numpy as np
import pytest
import torch

from sparsevllm_tpu import SamplingParams
from sparsevllm_tpu.engine.llm_engine import LLM
from sparsevllm_tpu.utils.tiny_random import build_tiny_hf_model, tiny_config

SEED = 0
GREEDY = SamplingParams(temperature=0.0, max_tokens=6)


@pytest.fixture(scope="module")
def hf_model():
    cfg = tiny_config(None)
    _, model = build_tiny_hf_model(cfg, SEED)
    return cfg, model


def hf_greedy(model, prompt_ids, n, eos_ids=(2,)):
    ids = list(prompt_ids)
    out = []
    with torch.no_grad():
        for _ in range(n):
            logits = model(torch.tensor([ids], dtype=torch.long)).logits
            tok = int(logits[0, -1].argmax())
            out.append(tok)
            ids.append(tok)
            if tok in eos_ids:
                break
    return out


BASE = dict(
    tiny_random=True,
    tiny_random_seed=SEED,
    dtype="float32",
    page_size=8,
    num_kv_pages=512,
    max_model_len=512,
    chunk_prefill_size=64,
    max_num_batched_tokens=256,
    max_num_seqs_in_batch=4,
    max_decoding_seqs=8,
    decode_context_bucket_base=64,
)


def prompts_for(cfg, lengths, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(3, cfg["vocab_size"], int(n)).tolist()
            for n in lengths]


# --------------------------------------------------------------- streamingllm


def test_streamingllm_loose_budget_equals_dense(hf_model):
    cfg, model = hf_model
    engine = LLM(
        sparse_method="streamingllm",
        sink_keep_tokens=64, recent_keep_tokens=256, **BASE,
    )
    prompts = prompts_for(cfg, (50, 120))
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=GREEDY)
    for p, o in zip(prompts, outs):
        assert o.output_token_ids == hf_greedy(model, p, 6)


def test_streamingllm_tight_budget_bounds_kv(hf_model):
    cfg, _ = hf_model
    engine = LLM(
        sparse_method="streamingllm",
        sink_keep_tokens=8, recent_keep_tokens=24, **BASE,
    )
    prompts = prompts_for(cfg, (200,))
    before = engine.kv.num_free_pages()
    outs = engine.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=16),
    )
    assert len(outs[0].output_token_ids) == 16
    # window: sink(1 page) + recent(<=24 tok => <=4 pages incl partials)
    # eviction must have physically freed the middle.
    assert engine.kv.num_free_pages() == before  # all freed at finish
    engine2 = LLM(
        sparse_method="streamingllm",
        sink_keep_tokens=8, recent_keep_tokens=24, **BASE,
    )
    sid = engine2.add_request(
        prompt_token_ids=prompts[0],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=2),
    )
    while engine2.scheduler.has_work:
        engine2.step()
    # resident footprint during the run is bounded by the window (checked
    # via the manager invariant: any remaining rows are small)
    assert engine2.kv.row_lens.max() <= 8 + 24 + engine2.config.page_size * 2


# ------------------------------------------------------------ snapkv/pyramid


def test_snapkv_loose_budget_equals_dense(hf_model):
    cfg, model = hf_model
    engine = LLM(
        sparse_method="snapkv",
        prefill_keep_tokens=256, snapkv_obs_window=16,
        sink_keep_tokens=8, recent_keep_tokens=16, **BASE,
    )
    prompts = prompts_for(cfg, (60, 130))
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=GREEDY)
    for p, o in zip(prompts, outs):
        assert o.output_token_ids == hf_greedy(model, p, 6)


def test_snapkv_tight_budget_compacts(hf_model):
    cfg, model = hf_model
    keep = 48
    engine = LLM(
        sparse_method="snapkv",
        prefill_keep_tokens=keep, snapkv_obs_window=16,
        sink_keep_tokens=8, recent_keep_tokens=16, **BASE,
    )
    prompt = prompts_for(cfg, (200,))[0]
    sid = engine.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4),
    )
    # run prefill to completion (chunks 64, 64, 56, 16 — final chunk holds
    # the observation window) -> compaction happens on the last one
    seq = engine._seqs[sid]
    while not seq.prefill_done:
        engine.step()
    row = engine.kv.seq_rows[sid]
    assert np.all(engine.kv.row_lens[:, row] == keep), (
        engine.kv.row_lens[:, row]
    )
    free_after_compact = engine.kv.num_free_pages()
    # finish decoding; output must be plausible (4 tokens) and all pages free
    while engine.scheduler.has_work:
        engine.step()
    assert len(seq.completion_token_ids) == 4
    assert engine.kv.num_free_pages() > free_after_compact


def test_pyramidkv_per_layer_budgets(hf_model):
    cfg, model = hf_model
    engine = LLM(
        sparse_method="pyramidkv",
        prefill_keep_tokens=48, snapkv_obs_window=16, pyramidkv_beta=4,
        sink_keep_tokens=8, recent_keep_tokens=16, **BASE,
    )
    prompt = prompts_for(cfg, (200,))[0]
    outs = engine.generate(
        prompt_token_ids=[prompt],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4),
    )
    assert len(outs[0].output_token_ids) == 4
    # layer budgets decay: layer 0 keeps more than last layer
    b = engine.kv.layer_budgets
    assert b[0] > b[-1]


# -------------------------------------------------------------------- omnikv


def test_omnikv_loose_budget_equals_dense(hf_model):
    cfg, model = hf_model
    engine = LLM(
        sparse_method="omnikv",
        full_attention_layers=(0,),
        decode_keep_tokens=512,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompts = prompts_for(cfg, (60, 130))
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=GREEDY)
    for p, o in zip(prompts, outs):
        assert o.output_token_ids == hf_greedy(model, p, 6)


def test_omnikv_exact_mask_equals_dense(hf_model):
    """The reference-verbatim full-width mask path (omnikv_exact_mask) must
    match dense at loose budgets, like the default compacted path."""
    cfg, model = hf_model
    engine = LLM(
        sparse_method="omnikv",
        full_attention_layers=(0,),
        decode_keep_tokens=512,
        sink_keep_tokens=8, recent_keep_tokens=16,
        omnikv_exact_mask=True,
        **BASE,
    )
    prompts = prompts_for(cfg, (60, 130))
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=GREEDY)
    for p, o in zip(prompts, outs):
        assert o.output_token_ids == hf_greedy(model, p, 6)


def test_omnikv_tight_budget_runs(hf_model):
    cfg, _ = hf_model
    engine = LLM(
        sparse_method="omnikv",
        full_attention_layers=(0,),
        decode_keep_tokens=16,
        sink_keep_tokens=8, recent_keep_tokens=8,
        **BASE,
    )
    prompts = prompts_for(cfg, (150,))
    outs = engine.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8),
    )
    assert len(outs[0].output_token_ids) == 8


# --------------------------------------------------------------------- quest


def test_quest_loose_budget_equals_dense(hf_model):
    cfg, model = hf_model
    engine = LLM(
        sparse_method="quest",
        decode_keep_tokens=512, quest_page_size=8, quest_skip_layers=1,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompts = prompts_for(cfg, (60, 130))
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=GREEDY)
    for p, o in zip(prompts, outs):
        assert o.output_token_ids == hf_greedy(model, p, 6)


def test_quest_tight_budget_runs(hf_model):
    cfg, _ = hf_model
    engine = LLM(
        sparse_method="quest",
        decode_keep_tokens=24, quest_page_size=8, quest_skip_layers=1,
        sink_keep_tokens=8, recent_keep_tokens=8,
        **BASE,
    )
    prompts = prompts_for(cfg, (150,))
    outs = engine.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8),
    )
    assert len(outs[0].output_token_ids) == 8


def test_quest_page_selection_math():
    """select_pages picks the q-aligned page; sink/recent forced in."""
    import jax.numpy as jnp

    from sparsevllm_tpu.ops.quest import init_page_meta, select_pages

    L, pages, nkv, dh, P = 1, 10, 2, 4, 8
    meta = init_page_meta(L, pages, nkv, dh)
    # page 3 has strongly positive K extrema; others near zero
    meta = meta.at[0, 0].set(0.0).at[1, 0].set(0.0)
    # physical page 4 == logical page 3 under the table below
    meta = meta.at[1, 0, 4].set(10.0)
    q = jnp.ones((1, 4, dh))  # positive query -> logical page 3 wins
    table = jnp.arange(1, 9, dtype=jnp.int32)[None, :]  # 8 logical pages
    ctx = jnp.asarray([64], jnp.int32)  # all 8 pages in context
    compact, ppos = select_pages(
        q, meta, 0, table, ctx, keep_pages=4, page_size=P,
        sink_pages=1, recent_pages=1,
    )
    sel = set(int(x) for x in ppos[0])
    assert 0 in sel      # sink forced
    assert 7 in sel      # recent forced
    assert 3 in sel      # q-aligned winner


# ---------------------------------------------------------------------- rkv


def test_rkv_loose_budget_equals_dense(hf_model):
    """No eviction fires when budgets exceed ctx: identical to dense."""
    cfg, model = hf_model
    engine = LLM(
        sparse_method="rkv",
        prefill_keep_tokens=256, snapkv_obs_window=16,
        decode_keep_tokens=256, rkv_compression_interval=8,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **BASE,
    )
    prompts = prompts_for(cfg, (60, 130))
    outs = engine.generate(prompt_token_ids=prompts, sampling_params=GREEDY)
    for p, o in zip(prompts, outs):
        assert o.output_token_ids == hf_greedy(model, p, 6)


def test_rkv_decode_eviction_fires_and_compacts(hf_model):
    cfg, _ = hf_model
    engine = LLM(
        sparse_method="rkv",
        prefill_keep_tokens=96, snapkv_obs_window=8,
        decode_keep_tokens=24, rkv_compression_interval=8,
        rkv_query_cache_size=8,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **{**BASE, "decode_steps_per_dispatch": 4},
    )
    prompt = prompts_for(cfg, (150,))[0]
    sid = engine.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=32,
                                       ignore_eos=True),
    )
    seq = engine._seqs[sid]
    while engine.scheduler.has_work:
        engine.step()
    assert len(seq.completion_token_ids) == 32
    assert getattr(engine.kv, "num_decode_evictions", 0) > 0, (
        "no joint eviction fired"
    )


def test_rkv_eviction_bounds_resident_kv(hf_model):
    cfg, _ = hf_model
    engine = LLM(
        sparse_method="rkv",
        prefill_keep_tokens=96, snapkv_obs_window=8,
        decode_keep_tokens=24, rkv_compression_interval=8,
        rkv_query_cache_size=8,
        sink_keep_tokens=8, recent_keep_tokens=16,
        **{**BASE, "decode_steps_per_dispatch": 4},
    )
    prompt = prompts_for(cfg, (120,))[0]
    sid = engine.add_request(
        prompt_token_ids=prompt,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=40,
                                       ignore_eos=True),
    )
    seq = engine._seqs[sid]
    max_len = 0
    while engine.scheduler.has_work:
        engine.step()
        if seq.row >= 0:
            max_len = max(max_len, int(engine.kv.row_lens[0, seq.row]))
    # rows must never exceed budget + interval + one megastep of slack
    budget = 24 + 8 + 16
    assert max_len <= 96 + 8 + 4 + 1, max_len  # prefill keep + interval + k


# -------------------------------------------------------------------- skipkv


def test_skipkv_sentence_segmentation():
    from sparsevllm_tpu.engine.kv_manager.skipkv import SkipKVManager
    from sparsevllm_tpu.config import Config
    from sparsevllm_tpu.engine.sequence import Sequence

    cfg = Config(
        tiny_random=True, method="skipkv",
        page_size=8, num_kv_pages=32, max_model_len=256,
        chunk_prefill_size=32, max_num_batched_tokens=64,
        num_sink_tokens=8, num_recent_tokens=16,
        skipkv_delimiter_tokens=(9, 10),
    )
    mgr = SkipKVManager(cfg, 2, 32, 4)
    seq = Sequence([1] * 10, SamplingParams())
    seq.completion_token_ids = [4, 5, 9, 6, 7, 10, 8]
    spans = mgr.sentence_spans(seq)
    assert spans == [(10, 13), (13, 16)]  # trailing [8] never evicted


def test_skipkv_e2e_runs(hf_model):
    cfg, model = hf_model
    engine = LLM(
        sparse_method="skipkv",
        prefill_keep_tokens=96, snapkv_obs_window=8,
        decode_keep_tokens=24, rkv_compression_interval=8,
        rkv_query_cache_size=8,
        skipkv_delimiter_tokens=(7, 13),
        sink_keep_tokens=8, recent_keep_tokens=16,
        **{**BASE, "decode_steps_per_dispatch": 4},
    )
    prompts = prompts_for(cfg, (120,))
    outs = engine.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=24,
                                       ignore_eos=True),
    )
    assert len(outs[0].output_token_ids) == 24
