"""Backend-switched generate API (reference get_chat_api.get_generate_api).

``get_generate_api(model, method, backend)`` returns ``generate(prompt_ids,
max_tokens) -> list[int]``:

  * backend="engine": the TPU engine (LLMEngine) with ``sparse_method``.
  * backend="hf": a pure-torch bs=1 manual chunked-prefill loop
    (reference get_chat_api.manual_generate:86-193) with the sparse method
    applied HF-side — SnapKV prefill-end compression and OmniKV per-step
    selection re-implemented over eager attention weights
    (modeling/cache_pipeline.py SnapKVCache:51 / OmniKVRawCache:757). The
    HF side is the accuracy ORACLE the engine is validated against.

Only greedy decoding; enough for parity and accuracy measurement.
"""

from __future__ import annotations

from . import token_select


def _hf_forward_probs(model, ids, past=None):
    """One eager forward returning (logits, attentions, past).

    sdpa/flash do not materialize attention weights; force eager."""
    import torch

    try:
        model.set_attn_implementation("eager")
    except AttributeError:  # older transformers
        model.config._attn_implementation = "eager"
    with torch.no_grad():
        out = model(
            ids, past_key_values=past, use_cache=True,
            output_attentions=True,
        )
    return out.logits, out.attentions, out.past_key_values


def _gather_cache(past, kept):
    """Index every layer's K/V with kept indices [B, N] (legacy tuples or
    DynamicCache)."""
    import torch
    from transformers import DynamicCache

    if not isinstance(past, DynamicCache):
        past = DynamicCache.from_legacy_cache(past)
    idx = kept[:, None, :, None]
    for li in range(len(past)):
        k = past.layers[li].keys if hasattr(past, "layers") else \
            past.key_cache[li]
        v = past.layers[li].values if hasattr(past, "layers") else \
            past.value_cache[li]
        ix = idx.expand(-1, k.shape[1], -1, k.shape[3])
        nk = torch.gather(k, 2, ix)
        nv = torch.gather(v, 2, ix)
        if hasattr(past, "layers"):
            past.layers[li].keys = nk
            past.layers[li].values = nv
        else:
            past.key_cache[li] = nk
            past.value_cache[li] = nv
    return past


def _hf_generate_snapkv(model, prompt_ids, max_tokens, cfg):
    """Prefill (full attention) -> SnapKV compression -> greedy decode over
    the compressed cache. NOTE: positions of kept tokens keep their
    original RoPE (cache stores post-RoPE K), matching the engine."""
    import torch

    ids = torch.tensor([prompt_ids], dtype=torch.long)
    logits, attns, past = _hf_forward_probs(model, ids)
    keep = cfg.get("prefill_keep_tokens", 1024)
    w = cfg.get("snapkv_obs_window", 32)
    ks = cfg.get("snapkv_kernel_size", 0)
    s = ids.shape[1]
    if keep < s:
        # per-layer selection (engine compacts per layer too)
        from transformers import DynamicCache

        if not isinstance(past, DynamicCache):
            past = DynamicCache.from_legacy_cache(past)
        for li, attn in enumerate(attns):
            kept = token_select.snapkv_token_selection(
                attn.float(), w, keep, ks
            )
            idx = kept[:, None, :, None]
            k = past.layers[li].keys if hasattr(past, "layers") else \
                past.key_cache[li]
            v = past.layers[li].values if hasattr(past, "layers") else \
                past.value_cache[li]
            ix = idx.expand(-1, k.shape[1], -1, k.shape[3])
            if hasattr(past, "layers"):
                past.layers[li].keys = torch.gather(k, 2, ix)
                past.layers[li].values = torch.gather(v, 2, ix)
            else:
                past.key_cache[li] = torch.gather(k, 2, ix)
                past.value_cache[li] = torch.gather(v, 2, ix)
    out = [int(logits[0, -1].argmax())]
    pos = s
    for _ in range(max_tokens - 1):
        nid = torch.tensor([[out[-1]]], dtype=torch.long)
        with torch.no_grad():
            o = model(
                nid, past_key_values=past, use_cache=True,
                position_ids=torch.tensor([[pos]]),
                cache_position=torch.tensor([pos]),
            )
        past = o.past_key_values
        out.append(int(o.logits[0, -1].argmax()))
        pos += 1
    return out


def _hf_generate_dense(model, prompt_ids, max_tokens, chunk=0):
    import torch

    ids = torch.tensor([prompt_ids], dtype=torch.long)
    past = None
    if chunk:
        # manual chunked prefill (reference manual_generate:86-193)
        logits = None
        for i in range(0, ids.shape[1], chunk):
            part = ids[:, i : i + chunk]
            with torch.no_grad():
                o = model(part, past_key_values=past, use_cache=True)
            past, logits = o.past_key_values, o.logits
    else:
        with torch.no_grad():
            o = model(ids, use_cache=True)
        past, logits = o.past_key_values, o.logits
    out = [int(logits[0, -1].argmax())]
    pos = ids.shape[1]
    for _ in range(max_tokens - 1):
        nid = torch.tensor([[out[-1]]], dtype=torch.long)
        with torch.no_grad():
            o = model(nid, past_key_values=past, use_cache=True)
        past = o.past_key_values
        out.append(int(o.logits[0, -1].argmax()))
        pos += 1
    return out


def get_generate_api(model="", method: str = "", backend: str = "engine",
                     tiny_random: bool = False, hf_model=None, **cfg):
    """Returns ``generate(prompt_ids, max_tokens) -> list[int]``."""
    if backend == "engine":
        from ..engine.llm_engine import LLMEngine
        from ..sampling_params import SamplingParams

        kw = dict(cfg)
        if method:
            kw["sparse_method"] = method
        if tiny_random:
            kw.setdefault("tiny_random", True)
            kw.setdefault("dtype", "float32")
        eng = LLMEngine(model=model, **kw)

        def generate(prompt_ids, max_tokens):
            (out,) = eng.generate(
                prompt_token_ids=[list(prompt_ids)],
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=max_tokens, ignore_eos=True
                ),
            )
            return out.output_token_ids

        generate.engine = eng
        return generate

    if backend != "hf":
        raise ValueError(f"unknown backend {backend!r} (engine | hf)")
    if hf_model is None:
        if tiny_random:
            from ..utils.tiny_random import build_tiny_hf_model, tiny_config

            _, hf_model = build_tiny_hf_model(
                tiny_config(cfg.pop("tiny_random_config", None)),
                cfg.pop("tiny_random_seed", 0),
            )
        else:
            import transformers

            hf_model = transformers.AutoModelForCausalLM.from_pretrained(
                model
            ).eval()

    if method in ("", "vanilla"):
        def generate(prompt_ids, max_tokens):
            return _hf_generate_dense(
                hf_model, prompt_ids, max_tokens,
                chunk=cfg.get("chunk_prefill_size", 0),
            )
        return generate
    if method == "snapkv":
        def generate(prompt_ids, max_tokens):
            return _hf_generate_snapkv(hf_model, prompt_ids, max_tokens,
                                       cfg)
        return generate
    raise NotImplementedError(
        f"hf backend supports vanilla/snapkv (got {method!r}); omnikv "
        f"selection math lives in hf/token_select.py for cache pipelines"
    )
