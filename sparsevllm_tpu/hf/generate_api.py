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


def _hf_generate_deltakv(model, prompt_ids, max_tokens, cfg):
    """Manual bs=1 torch loop with the DeltaKV cluster cache (the oracle).

    Drives the HF llama-family weights directly (embed -> per-layer ln /
    qkv / attention / mlp -> head) because DeltaKV needs PRE-RoPE K: the
    cache stores K before rotation and the view re-applies RoPE at the
    carried absolute positions (reference hf_common wrappers +
    ClusterCachePipeline). Full layers keep a dense raw cache and emit
    decode scores; sparse layers attend [sink | selected reconstructed |
    buffer] where the selection is the latest full layer's top-k over the
    compressed segment of its view (reference sparse_controller
    semantics :1301-1330 on the HF side)."""
    import torch

    from .deltakv_cache import ClusterKVCache

    base = model.model
    layers = base.layers
    nl = len(layers)
    full = sorted(set(cfg.get("full_attn_layers", (0,))))
    sink = cfg.get("num_sink_tokens", 16)
    tail = cfg.get("num_recent_tokens", 64)
    topk = cfg.get("decode_keep_tokens", 128)
    cache = ClusterKVCache(
        nl, sink=sink, tail=tail,
        cluster_ratio=cfg.get("deltakv_cluster_ratio", 0.25),
        neighbor_count=cfg.get("deltakv_neighbor_count", 4),
        compressors=cfg.get("compressors"),
        payload_bits=cfg.get("deltakv_payload_bits", 0),
    )
    # full layers use a plain raw cache (dense observation layers)
    raw_k = [None] * nl
    raw_v = [None] * nl
    raw_pos = [None] * nl
    hcfg = model.config
    nq = hcfg.num_attention_heads
    nkv = getattr(hcfg, "num_key_value_heads", nq)
    dh = getattr(hcfg, "head_dim", hcfg.hidden_size // nq)

    def rope(x, pos):
        # x [1, S, H, D] -> rotated at absolute positions [S]
        cos, sin = base.rotary_emb(x, pos.view(1, -1))
        cos, sin = cos[:, :, None], sin[:, :, None]  # [1, S, 1, D]
        x1, x2 = x[..., : dh // 2], x[..., dh // 2:]
        rot = torch.cat([-x2, x1], dim=-1)
        return x * cos + rot * sin

    def derope(y, pos):
        # exact inverse rotation (reference reverse_rotary_emb)
        cos, sin = base.rotary_emb(y, pos.view(1, -1))
        cos, sin = cos[:, :, None], sin[:, :, None]
        y1, y2 = y[..., : dh // 2], y[..., dh // 2:]
        rot_inv = torch.cat([y2, -y1], dim=-1)
        return y * cos + rot_inv * sin

    # deltakv+KIVI oracle variant (VERDICT r4 #7; reference
    # DeltaCompressedQuantKivi* caches, cache_pipeline.py:992-1014): the
    # engine's kivi lane stores POST-RoPE K row-quantized in the int4
    # pool and compresses from the DEQUANTIZED (de-RoPE'd) values — so
    # the oracle round-trips K in rotated space then de-rotates back for
    # (pre-RoPE) storage; V round-trips directly.
    kivi_bits = int(cfg.get("deltakv_kivi_bits", 0) or 0)

    def kivi_kv(k, v, pos):
        if not kivi_bits:
            return k, v
        from .deltakv_cache import quant_roundtrip_rows as rt

        return (derope(rt(rope(k, pos), kivi_bits), pos),
                rt(v, kivi_bits))

    def attend(q, k, v, qpos, kpos):
        # q [1, Sq, Nq, D]; k/v [1, Sk, Nkv, D]; returns out + probs
        g = nq // nkv
        kf = k.repeat_interleave(g, dim=2).float()
        vf = v.repeat_interleave(g, dim=2).float()
        s = torch.einsum("bqhd,bkhd->bhqk", q.float(), kf) * dh ** -0.5
        mask = kpos.view(1, 1, 1, -1) <= qpos.view(1, 1, -1, 1)
        s = s.masked_fill(~mask, float("-inf"))
        p = torch.softmax(s, dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", p, vf)
        return out.to(q.dtype), p

    sel_idx = [None]  # latest full-layer top-k into the compressed store

    def forward(ids, pos, decode):
        h = base.embed_tokens(ids)
        for li, lyr in enumerate(layers):
            x = lyr.input_layernorm(h)
            q = lyr.self_attn.q_proj(x).view(1, -1, nq, dh)
            k = lyr.self_attn.k_proj(x).view(1, -1, nkv, dh)
            v = lyr.self_attn.v_proj(x).view(1, -1, nkv, dh)
            qn = getattr(lyr.self_attn, "q_norm", None)
            if qn is not None:
                q = qn(q)
                k = lyr.self_attn.k_norm(k)
            qr = rope(q, pos)
            if li in full:
                # current chunk attends itself EXACTLY; stored copy is
                # the kivi round-trip (engine deferred-scale semantics)
                ks, vs = kivi_kv(k, v, pos)
                if raw_k[li] is None:
                    kv_view = (k, v, pos)
                    raw_k[li], raw_v[li], raw_pos[li] = ks, vs, pos
                else:
                    kv_view = (
                        torch.cat([raw_k[li], k], dim=1),
                        torch.cat([raw_v[li], v], dim=1),
                        torch.cat([raw_pos[li], pos]),
                    )
                    raw_k[li] = torch.cat([raw_k[li], ks], dim=1)
                    raw_v[li] = torch.cat([raw_v[li], vs], dim=1)
                    raw_pos[li] = torch.cat([raw_pos[li], pos])
            else:
                idx = sel_idx[0] if decode else None
                ks, vs = kivi_kv(k, v, pos)
                cache.update(li, ks, vs, pos)
                kv_view = cache.view(li, idx)
            kk, vv, kpos = kv_view
            out, probs = attend(qr, rope(kk, kpos), vv, pos, kpos)
            if decode and li in full:
                # top-k over the COMPRESSED segment at any sparse layer's
                # current store length (same count on every sparse layer)
                sl = next((i for i in range(nl) if i not in full), None)
                c = cache.compressed_len(sl) if sl is not None else 0
                if c:
                    comp_pos = cache.comp_pos[sl][0]
                    # full layer is dense: its view positions are absolute;
                    # score each compressed token at its absolute position
                    scores = probs.sum(dim=(1, 2))[0]  # [K]
                    full_pos = kpos
                    pos_to_score = {
                        int(p_): float(s_)
                        for p_, s_ in zip(full_pos.tolist(),
                                          scores.tolist())
                    }
                    cs = torch.tensor(
                        [pos_to_score.get(int(p_), 0.0)
                         for p_ in comp_pos.tolist()]
                    )
                    k_ = min(topk, c)
                    sel_idx[0] = torch.topk(cs, k_).indices.sort().values
            h = h + lyr.self_attn.o_proj(
                out.reshape(1, -1, nq * dh))
            x2 = lyr.post_attention_layernorm(h)
            mlp = lyr.mlp
            h = h + mlp.down_proj(
                torch.nn.functional.silu(mlp.gate_proj(x2)) * mlp.up_proj(x2)
            )
        h = base.norm(h)
        return model.lm_head(h)

    ids = torch.tensor([prompt_ids], dtype=torch.long)
    s = ids.shape[1]
    chunk = cfg.get("chunk_prefill_size", 0) or s
    logits = None
    with torch.no_grad():
        for i in range(0, s, chunk):
            part = ids[:, i : i + chunk]
            pos = torch.arange(i, i + part.shape[1])
            logits = forward(part, pos, decode=False)
        out = [int(logits[0, -1].argmax())]
        for t in range(max_tokens - 1):
            nid = torch.tensor([[out[-1]]], dtype=torch.long)
            logits = forward(nid, torch.tensor([s + t]), decode=True)
            out.append(int(logits[0, -1].argmax()))
    return out


def _hf_generate_quantized(model, prompt_ids, max_tokens, cfg):
    """Manual bs=1 torch loop with the ENGINE-recipe quantized KV cache
    (hf/deltakv_cache.QuantizedRawKVCache): every layer dense, K stored
    POST-RoPE and row-quantized like the engine's int4/int8 pools, the
    current step's tokens attended EXACTLY (the engine's deferred-scale
    merge). The precision-matched second implementation of the
    kv_cache_dtype=int4/int8 lanes (VERDICT r4 #7; reference
    KiviQuantizedRawCache, cache_pipeline.py:891-989)."""
    import torch

    from .deltakv_cache import QuantizedRawKVCache

    base = model.model
    layers = base.layers
    nl = len(layers)
    bits = int(cfg.get("kv_quant_bits", 4))
    cache = QuantizedRawKVCache(nl, bits=bits)
    hcfg = model.config
    nq = hcfg.num_attention_heads
    nkv = getattr(hcfg, "num_key_value_heads", nq)
    dh = getattr(hcfg, "head_dim", hcfg.hidden_size // nq)

    def rope(x, pos):
        cos, sin = base.rotary_emb(x, pos.view(1, -1))
        cos, sin = cos[:, :, None], sin[:, :, None]
        x1, x2 = x[..., : dh // 2], x[..., dh // 2:]
        rot = torch.cat([-x2, x1], dim=-1)
        return x * cos + rot * sin

    def attend(q, k, v, qpos, kpos):
        g = nq // nkv
        kf = k.repeat_interleave(g, dim=2).float()
        vf = v.repeat_interleave(g, dim=2).float()
        s = torch.einsum("bqhd,bkhd->bhqk", q.float(), kf) * dh ** -0.5
        mask = kpos.view(1, 1, 1, -1) <= qpos.view(1, 1, -1, 1)
        s = s.masked_fill(~mask, float("-inf"))
        p = torch.softmax(s, dim=-1)
        return torch.einsum("bhqk,bkhd->bqhd", p, vf).to(q.dtype)

    def forward(ids, pos):
        h = base.embed_tokens(ids)
        for li, lyr in enumerate(layers):
            x = lyr.input_layernorm(h)
            q = lyr.self_attn.q_proj(x).view(1, -1, nq, dh)
            k = lyr.self_attn.k_proj(x).view(1, -1, nkv, dh)
            v = lyr.self_attn.v_proj(x).view(1, -1, nkv, dh)
            qn = getattr(lyr.self_attn, "q_norm", None)
            if qn is not None:
                q = qn(q)
                k = lyr.self_attn.k_norm(k)
            qr = rope(q, pos)
            kr = rope(k, pos)
            kk, vv, kpos = cache.update(li, kr, v, pos)
            out = attend(qr, kk, vv, pos, kpos)
            h = h + lyr.self_attn.o_proj(out.reshape(1, -1, nq * dh))
            x2 = lyr.post_attention_layernorm(h)
            mlp = lyr.mlp
            h = h + mlp.down_proj(
                torch.nn.functional.silu(mlp.gate_proj(x2))
                * mlp.up_proj(x2)
            )
        h = base.norm(h)
        return model.lm_head(h)

    ids = torch.tensor([prompt_ids], dtype=torch.long)
    s = ids.shape[1]
    chunk = cfg.get("chunk_prefill_size", 0) or s
    # teacher-forcing: feed these instead of own argmax and return the
    # per-step logits rows (the reference regression harness's logits
    # block — p99 |Δlogit| form — needs forced paths because greedy
    # trajectories diverge on statistical ties)
    forced = cfg.get("force_tokens")
    collected = []
    logits = None
    with torch.no_grad():
        for i in range(0, s, chunk):
            part = ids[:, i : i + chunk]
            logits = forward(part, torch.arange(i, i + part.shape[1]))
        collected.append(logits[0, -1].clone())
        out = [int(logits[0, -1].argmax())]
        if forced is not None:
            out = [int(forced[0])]
        for t in range(max_tokens - 1):
            nid = torch.tensor([[out[-1]]], dtype=torch.long)
            logits = forward(nid, torch.tensor([s + t]))
            collected.append(logits[0, -1].clone())
            nxt = int(logits[0, -1].argmax())
            if forced is not None and t + 1 < len(forced):
                nxt = int(forced[t + 1])
            out.append(nxt)
    if cfg.get("collect_logits"):
        return out, collected
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
        if cfg.get("kv_quant_bits"):
            def generate(prompt_ids, max_tokens):
                return _hf_generate_quantized(
                    hf_model, prompt_ids, max_tokens, cfg)
            return generate

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
    if method == "deltakv":
        def generate(prompt_ids, max_tokens):
            return _hf_generate_deltakv(hf_model, prompt_ids, max_tokens,
                                        cfg)
        return generate
    raise NotImplementedError(
        f"hf backend supports vanilla/snapkv/deltakv (got {method!r}); "
        f"omnikv selection math lives in hf/token_select.py"
    )
