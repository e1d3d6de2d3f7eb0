"""Generic functional decoder-only transformer (scan over layers).

TPU-first design notes (vs reference models/llama.py:120-263 etc.):
  * The model is a pure function over a params pytree whose per-layer weights
    are **stacked on a leading layer axis** and consumed by ``jax.lax.scan`` —
    one layer is traced/compiled regardless of depth, keeping jit-bucket
    compile times flat.
  * The paged KV caches ride in the scan **carry** and are updated with
    scatters at per-token destination slots; XLA keeps carry updates in-place,
    which is the TPU replacement for the reference's in-place slot-pool writes
    (triton store_kvcache).
  * The reference's per-layer hook choreography (save_rope_kv_if_needed →
    Attention → sparse_controller.on_layer_end, models/llama.py:120-141) is
    re-expressed *inside* the scan body: KV store, attention, observation-score
    emission, and OmniKV-style top-k selection propagation are all
    fixed-shape ops on the carry, so the whole step stays jit-stable (the
    "graph-stable decode" contract, reference docs/design/control-map.md).

Two entry points — ``prefill_forward`` ([B, S] padded chunk) and
``decode_forward`` ([B] single token) — plus ``compute_logits``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..layers.rope import apply_rope
from ..ops import attention as attn_ops
from ..ops import quant as quant_ops
from ..ops import quest as quest_ops
from ..ops import rkv as rkv_ops
from ..ops import deltakv as dk_ops
from ..ops import attention_ref as ref_ops
from ..ops import fp8 as fp8_ops
from ..utils import compressor as comp_ops
from .spec import ModelSpec

NEG_INF = -1e30


@dataclass(frozen=True)
class StepRuntime:
    """Static per-step-variant flags (part of the jit specialization key)."""

    impl: str = "ref"  # 'ref' (pure XLA) | 'pallas'
    # SnapKV/PyramidKV observation-score emission during prefill
    # (reference sparse_controller._needs_attn_score:1398-1448).
    emit_prefill_scores: bool = False
    obs_window: int = 0
    score_pooling: int = 0
    # OmniKV-style decode selection: full layers emit head-summed token scores
    # and refresh a keep-mask that sparse layers attend through
    # (reference sparse_controller.on_layer_end:542-625).
    decode_select: bool = False
    # OmniKV decode reads: False (default) = page-compacted tables bounded
    # by the keep budget; True = exact full-width token mask (streams the
    # whole context; the reference's logical-masking semantics verbatim).
    select_exact_mask: bool = False
    select_keep: int = 0
    sink_tokens: int = 0
    recent_tokens: int = 0
    # Quest: query-aware page top-k via per-page K min/max metadata
    # (ops/quest.py; reference cache_manager/quest.py). The metadata array
    # rides the scan carry and is updated at KV-store time.
    quest: bool = False
    quest_keep_pages: int = 0
    quest_skip_layers: int = 0
    # int8 KV cache with per-(token, head) scales; dequant fuses into the
    # attention kernels (ops/quant.py, KIVI-style — reference
    # triton_kernel/quant.py + full_layer_kivi decode).
    kv_quant: bool = False
    kv_quant_bits: int = 8  # 8 (int8) | 4 (KIVI-4) | 2 (KIVI-2 per-channel)
    # KIVI-2: K channel-scale token-group size (kivi_group_size); the
    # kv_scales argument carries (v_scales, k_ch_scales, kv_tail) as a
    # pytree in this mode — see prefill_forward/decode_forward.
    kivi_group: int = 32
    # RKV/SkipKV: record decode queries into the device ring buffer
    # (ops/rkv.py; reference rkv.py record_decode_query:313).
    record_queries: bool = False
    # DeltaKV: full layers dense + score-emitting; sparse layers attend
    # [sink|recent raw ∥ reconstructed top-k latents] (ops/deltakv.py).
    deltakv: bool = False
    dk_topk: int = 0
    dk_comp_base: int = 0  # absolute position of compressed token 0
    dk_stride: int = 1
    dk_arch: str = "linear"
    dk_latent_bits: int = 4  # 4 (int4 packed latents) | 2 (int2)
    dk_nn: int = 4  # nearest-center neighbors per token reference
    dk_group: int = 0  # latent quant group (0 = per-token scale)
    dk_latent_dim: int = 0  # latent width (record layout, ops/deltakv.py)
    # incremental reconstruction cache (ops/deltakv.py): persistent
    # reconstructed-top-k scratch; per-step work = selection drift only.
    dk_recon: bool = False
    dk_recon_pad: int = 512
    # SkipKV activation steering: per-layer vector added to the decode
    # hidden state, alpha-scaled (reference activation_controller.py:55-232).
    steer_alpha: float = 0.0
    # MoE dispatch: 'sorted' (ragged grouped GEMM, single-device) or
    # 'dense' (dense-over-experts einsum whose E axis GSPMD-shards).
    moe_dispatch: str = "dense"
    # ONE page id space shared by all layers (config.global_kv_pool): the
    # cache arrays have a singleton layer dim and every cache access
    # indexes layer 0, while the per-layer page TABLES still route each
    # layer to its own pages. Deltakv-scoped (config validation).
    global_pool: bool = False


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * w.astype(x.dtype)


def _per_head_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """Qwen3 q/k norm: RMS over head_dim for [..., H, Dh]."""
    return rms_norm(x, w, eps)


def _w(lp, name, shape, dtype):
    """Weight fetch; transparently dequantizes fp8 block-scaled storage
    (ops/fp8.py — reference quantization/fp8.py:58-129)."""
    return fp8_ops.maybe_dequant(lp, name, shape, dtype)


def _qkv(x, lp, spec: ModelSpec):
    """x: [..., H] -> q [..., Nq, Dh], k/v [..., Nkv, Dh]."""
    h = spec.hidden_size
    q = x @ _w(lp, "wq", (h, spec.q_dim), x.dtype)
    k = x @ _w(lp, "wk", (h, spec.kv_dim), x.dtype)
    v = x @ _w(lp, "wv", (h, spec.kv_dim), x.dtype)
    if spec.attn_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    q = q.reshape(*x.shape[:-1], spec.num_q_heads, spec.head_dim)
    k = k.reshape(*x.shape[:-1], spec.num_kv_heads, spec.head_dim)
    v = v.reshape(*x.shape[:-1], spec.num_kv_heads, spec.head_dim)
    if spec.qk_norm:
        q = _per_head_norm(q, lp["q_norm"], spec.rms_norm_eps)
        k = _per_head_norm(k, lp["k_norm"], spec.rms_norm_eps)
    return q, k, v


def _mlp(x, lp, spec: ModelSpec):
    h, f = spec.hidden_size, spec.intermediate_size
    gate = x @ _w(lp, "w_gate", (h, f), x.dtype)
    up = x @ _w(lp, "w_up", (h, f), x.dtype)
    return (jax.nn.silu(gate) * up) @ _w(lp, "w_down", (f, h), x.dtype)


def _moe(x, lp, spec: ModelSpec):
    """Sparse MoE block (reference models/qwen3_moe.py:28-251).

    TPU-native 'ep_replicated_kv' re-expression: experts are stacked
    [E, H, I] and sharded over the mesh 'model' axis (parallel/mesh.py
    moe_* rules) — every device computes ITS experts' contributions for ALL
    tokens (top-k routing weights zero the rest) and the final sum over E is
    a GSPMD all-reduce, exactly the reference's local-expert-then-
    ep_all_reduce flow (qwen3_moe.py:198-251) without explicit collectives.
    Dense-over-experts is compute-padded (non-routed pairs are zeroed) —
    the memory-bound decode regime this engine targets hides it; a
    sort-based dispatch is the staged optimization.
    """
    *lead, h = x.shape
    xt = x.reshape(-1, h)  # [T, H]
    logits = xt @ lp["router"]  # [T, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, spec.num_experts_per_tok)
    if spec.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    e = spec.num_experts
    # [T, E] routing weights (0 for non-selected experts)
    w = jnp.zeros_like(probs).at[
        jnp.arange(xt.shape[0])[:, None], top_i
    ].set(top_w)
    # all experts on all tokens, weighted; E axis shards over 'model'
    h_, f_ = spec.hidden_size, spec.moe_intermediate_size
    gate = jnp.einsum(
        "th,ehi->tei", xt, _w(lp, "moe_w_gate", (h_, f_), xt.dtype)
    )
    up = jnp.einsum(
        "th,ehi->tei", xt, _w(lp, "moe_w_up", (h_, f_), xt.dtype)
    )
    act = jax.nn.silu(gate) * up
    out = jnp.einsum(
        "tei,eih->teh", act, _w(lp, "moe_w_down", (f_, h_), act.dtype)
    )
    out = jnp.sum(out * w[..., None].astype(out.dtype), axis=1)  # [T, H]
    return out.reshape(*lead, h)


def _moe_sorted(x, lp, spec: ModelSpec):
    """Sort-based MoE dispatch (reference triton_kernel/moe.py fused
    grouped GEMM, 790 LoC): token-expert pairs are sorted by expert and
    the three expert matmuls run as ``lax.ragged_dot`` grouped GEMMs —
    FLOPs are T*topk*H*I instead of dense-over-experts' T*E*H*I (a 16x
    cut at E=64/topk=4) with no capacity factor and no dropped tokens.

    Single-device/replicated path: ragged group sizes do not shard over
    the expert axis; the mesh path keeps the dense-over-experts einsum
    whose E axis GSPMD-shards (see _moe)."""
    *lead, h = x.shape
    xt = x.reshape(-1, h)  # [T, H]
    t = xt.shape[0]
    k = spec.num_experts_per_tok
    e = spec.num_experts
    logits = xt @ lp["router"]  # [T, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, k)
    if spec.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    e_idx = top_i.reshape(-1)  # [T*K]
    t_idx = jnp.repeat(jnp.arange(t), k)  # [T*K]
    order = jnp.argsort(e_idx)  # stable: ties keep token order
    xs = xt[t_idx[order]]  # [T*K, H] sorted by expert
    group_sizes = jnp.bincount(e_idx, length=e).astype(jnp.int32)

    h_, f_ = spec.hidden_size, spec.moe_intermediate_size
    gate = jax.lax.ragged_dot(
        xs, _w(lp, "moe_w_gate", (h_, f_), xs.dtype), group_sizes
    )
    up = jax.lax.ragged_dot(
        xs, _w(lp, "moe_w_up", (h_, f_), xs.dtype), group_sizes
    )
    act = jax.nn.silu(gate) * up
    out = jax.lax.ragged_dot(
        act, _w(lp, "moe_w_down", (f_, h_), act.dtype), group_sizes
    )  # [T*K, H]

    w = top_w.reshape(-1)[order].astype(out.dtype)  # [T*K]
    combined = jnp.zeros((t, h), out.dtype).at[t_idx[order]].add(
        out * w[:, None]
    )
    return combined.reshape(*lead, h).astype(x.dtype)


def _moe_sorted_ep(x, lp, spec: ModelSpec):
    """Expert-parallel sort-based dispatch under a mesh (reference
    models/qwen3_moe.py:75-197 local-expert-range grouped GEMM +
    triton_kernel/moe.py, re-expressed TPU-first).

    ``shard_map`` over the mesh: each device holds a CONTIGUOUS expert
    range (the [E, H, I] stacks shard over the 'model' axis, see
    parallel/mesh.py) and runs ``lax.ragged_dot`` grouped GEMMs over only
    the token-expert pairs routed to ITS range — pairs routed elsewhere
    fall into a zero-weight dummy group. Device FLOPs are T·topk·H·I and
    device weight traffic is (E/n)·H·I (vs the dense-over-experts mesh
    path's T·(E/n)·H·I FLOPs + same traffic: a topk/E_local compute cut,
    decisive in prefill). The final combine is a psum over 'model' —
    exactly the reference's local-expert-then-ep_all_reduce flow. Tokens
    additionally shard over 'data' when divisible."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA, get_current_mesh, expert_axis

    mesh = get_current_mesh()
    # experts shard over the dedicated 'expert' axis when the mesh has an
    # INDEPENDENT EP degree (reference EP=N/TP=1 replicated-KV group,
    # method_registry.py:59-79), else over 'model' (EP == TP collapse)
    EAX = expert_axis(mesh)
    *lead, h = x.shape
    xt = x.reshape(-1, h)  # [T, H]
    t = xt.shape[0]
    k = spec.num_experts_per_tok
    e = spec.num_experts
    n_model = mesh.shape[EAX]
    e_local = e // n_model

    logits = xt @ lp["router"]  # [T, E] (router replicated)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, k)
    if spec.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    h_, f_ = spec.hidden_size, spec.moe_intermediate_size
    wg = _w(lp, "moe_w_gate", (h_, f_), xt.dtype)
    wu = _w(lp, "moe_w_up", (h_, f_), xt.dtype)
    wd = _w(lp, "moe_w_down", (f_, h_), xt.dtype)

    # token rows shard over 'data' when divisible (decode megasteps at
    # bs<dp replicate — same degradation rule as the step plans)
    tok_spec = P(DATA) if t % mesh.shape[DATA] == 0 else P()

    def local(xt, top_w, top_i, wg, wu, wd):
        tl = xt.shape[0]
        ax = jax.lax.axis_index(EAX)
        lo = ax * e_local
        t_idx = jnp.repeat(jnp.arange(tl), k)  # [T*K]
        e_idx = top_i.reshape(-1) - lo
        is_local = (e_idx >= 0) & (e_idx < e_local)
        # non-local pairs land in a trailing dummy group with zero weights
        key = jnp.where(is_local, e_idx, e_local)
        order = jnp.argsort(key)
        xs = xt[t_idx[order]]  # [T*K, H] sorted by local expert
        gs = jnp.bincount(key, length=e_local + 1).astype(jnp.int32)
        zg = jnp.zeros((1,) + wg.shape[1:], wg.dtype)
        zd = jnp.zeros((1,) + wd.shape[1:], wd.dtype)
        gate = jax.lax.ragged_dot(xs, jnp.concatenate([wg, zg]), gs)
        up = jax.lax.ragged_dot(xs, jnp.concatenate([wu, zg]), gs)
        act = jax.nn.silu(gate) * up
        out = jax.lax.ragged_dot(act, jnp.concatenate([wd, zd]), gs)
        w = top_w.reshape(-1)[order]
        w = w * is_local[order]  # zero non-local contributions
        comb = jnp.zeros((tl, h), out.dtype).at[t_idx[order]].add(
            out * w[:, None].astype(out.dtype)
        )
        return jax.lax.psum(comb, EAX)

    out = shard_map(
        local, mesh=mesh,
        in_specs=(tok_spec, tok_spec, tok_spec,
                  P(EAX, None, None), P(EAX, None, None),
                  P(EAX, None, None)),
        out_specs=tok_spec,
        check_vma=False,
    )(xt, top_w, top_i, wg, wu, wd)
    return out.reshape(*lead, h).astype(x.dtype)


def _ffn(x, lp, spec: ModelSpec, moe_dispatch: str = "dense"):
    if not spec.is_moe:
        return _mlp(x, lp, spec)
    if moe_dispatch == "sorted":
        return _moe_sorted(x, lp, spec)
    if moe_dispatch == "sorted_ep":
        return _moe_sorted_ep(x, lp, spec)
    return _moe(x, lp, spec)


def _layer_xs(params, spec: ModelSpec, extra: dict | None = None):
    """Scan xs pytree: stacked layer params + layer index (+ per-layer plan)."""
    xs = dict(params["layers"])
    xs["_layer_idx"] = jnp.arange(spec.num_layers, dtype=jnp.int32)
    if extra:
        xs.update(extra)
    return xs


def compact_keep_pages(
    sel: jax.Array,  # [B, MP*P] bool keep mask (token granularity)
    ctx_lens: jax.Array,  # [B]
    keep_pages: int,  # static page budget
    page_size: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-`keep_pages` pages by kept-token count -> (page_pos [B, KP],
    compact token mask [B, KP*P]).

    TPU adaptation of OmniKV's fused keep-slot tables
    (triton_kernel/omnikv_fused.py:81-147 build_omnikv_keep_and_slots): the
    reference gathers kept tokens into slot tables; a TPU kernel wants
    whole pages, so decode reads only the pages that CONTAIN kept tokens —
    HBM traffic is bounded by the keep budget instead of the full context.
    Pages are ranked by kept-token count; the keep budget plus sink/recent
    spans at most ceil(keep/P)+ceil(sink/P)+ceil(recent/P)+2 pages when
    tokens cluster, and the page budget adds slack for scatter (tokens
    beyond the page budget are dropped — the mask-over-all-pages path
    remains available via omnikv_exact_mask)."""
    b, k = sel.shape
    mp = k // page_size
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    in_ctx = pos < ctx_lens[:, None]
    counts = (sel & in_ctx).reshape(b, mp, page_size).sum(axis=2)  # [B, MP]
    _, ppos = jax.lax.top_k(counts, keep_pages)  # [B, KP] logical pages
    cmask = jnp.take_along_axis(
        (sel & in_ctx).reshape(b, mp, page_size), ppos[:, :, None], axis=1
    ).reshape(b, keep_pages * page_size)
    return ppos.astype(jnp.int32), cmask


def build_keep_mask(
    scores: jax.Array,  # [B, K] fp32 head-summed token scores
    ctx_lens: jax.Array,  # [B]
    sink: int,
    recent: int,
    keep: int,
) -> jax.Array:
    """Top-`keep` history tokens + sink + recent window as a [B, K] bool mask.

    Mirrors the reference OmniKV index update
    (sparse_controller._update_dynamic_omnikv_indices:1239-1397): sink/recent
    regions always kept and masked out of the top-k candidate set.
    """
    b, k = scores.shape
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    in_ctx = pos < ctx_lens[:, None]
    sink_m = (pos < sink) & in_ctx
    recent_m = (pos >= jnp.maximum(ctx_lens[:, None] - recent, 0)) & in_ctx
    middle = in_ctx & ~sink_m & ~recent_m
    cand = jnp.where(middle, scores, NEG_INF)
    _, top_idx = jax.lax.top_k(cand, keep)  # [B, keep]
    picked_valid = jnp.take_along_axis(middle, top_idx, axis=1)
    sel = jnp.zeros((b, k), dtype=bool)
    sel = sel.at[jnp.arange(b)[:, None], top_idx].max(picked_valid)
    return sel | sink_m | recent_m


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------


def prefill_forward(
    params,
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh]
    v_cache: jax.Array,
    plan: dict,  # token_ids/positions/dest_slot [B,S], page_table [B,MP],
    #               ctx_lens/new_lens [B]; quest: touched_pages [B, NP]
    rope: tuple[jax.Array, jax.Array],
    *,
    spec: ModelSpec,
    rt: StepRuntime,
    quest_meta: jax.Array | None = None,
    kv_scales: jax.Array | None = None,  # [2, L, pages, Nkv, P] (kv_quant)
    tables: jax.Array | None = None,  # [L, R, MPt] PER-LAYER page tables
    mp: int = 0,  # table-page bucket (with ``tables``)
):
    """One chunked-prefill step. Returns (k_cache, v_cache, last_hidden [B,H],
    obs_scores [L,B,K] or None, quest_meta or None, kv_scales or None).

    With ``tables`` given, each layer stores/reads through ITS OWN table row
    and the store slots are derived on-device (table_l[pos//P]*P + pos%P).
    Per-layer page IDs diverge once any manager frees pages on a subset of
    layers (deltakv splice, pyramidkv per-layer budgets); the old
    layer-0-shared dest slots then scatter K/V into pages the manager never
    assigned to that layer — measured as cross-sequence KV corruption on the
    induction oracle (centers holding ANOTHER row's tokens). The fallback
    path (plan["page_table"] + host dest_slot, layer-shared) remains for
    callers whose layers stay in lockstep (hybrid executor, direct tests)."""
    cos, sin = rope
    tokens = plan["token_ids"]  # [B, S]
    positions = plan["positions"]
    h = params["embed"][tokens]  # [B, S, H]
    if "mm_embeds" in plan:
        # multimodal splice (reference llava_ov_inference.py input-embeds
        # path): image-placeholder token positions take their row from the
        # vision projector output instead of the text embedding table.
        h = jnp.where(plan["mm_mask"][..., None],
                      plan["mm_embeds"].astype(h.dtype), h)
    sm_scale = spec.head_dim ** -0.5
    page_size = k_cache.shape[2]

    def body(carry, xs):
        h, kc, vc, meta, scales = carry
        li = xs["_layer_idx"]
        # cache-layer index: a global pool stores every layer at cache
        # index 0 (per-layer TABLES still route pages; rt.global_pool)
        cli = li * 0 if rt.global_pool else li
        if tables is not None:
            table_l = jax.lax.dynamic_index_in_dim(
                tables, li, 0, keepdims=False
            )[plan["row_ids"], :mp]  # [B, MP]
            # store pages derive from RESIDENT slot positions, not logical
            # token positions: a mid-prefill eviction (streamingllm window)
            # compacts the table, after which logical page != table slot
            # (executor.run_prefill builds slot_positions; they coincide
            # with positions when nothing was evicted).
            spos = plan.get("slot_positions", positions)
            pg = jnp.take_along_axis(
                table_l, spos // page_size, axis=1
            )  # [B, S]
            dest = jnp.where(
                plan["dest_slot"] >= 0,
                pg * page_size + spos % page_size,
                -1,
            )
        else:
            table_l = plan["page_table"]
            dest = plan["dest_slot"]
        x = rms_norm(h, xs["input_norm"], spec.rms_norm_eps)
        q, k, v = _qkv(x, xs, spec)
        q = apply_rope(q, positions, cos, sin)
        k = apply_rope(k, positions, cos, sin)
        att_scales, att_kch = scales, None
        if rt.kv_quant and rt.kv_quant_bits == 2:
            # KIVI-2: page-granular per-channel K quantization. Chunks
            # start page-aligned (config enforces chunk % page == 0 and
            # evictions drop whole pages), so the chunk splits into whole
            # pages; the final partial page quantizes over masked stats
            # AND keeps its raw rows in the tail buffer (decode's
            # fp-residual window; quantized copy serves intra-prefill
            # attention only).
            vsc, kch, tail = scales
            bsz, s_len = tokens.shape
            spg = s_len // page_size
            spos = plan.get("slot_positions", positions)
            k4 = k.reshape(bsz, spg, page_size, -1, spec.head_dim)
            v4 = v.reshape(bsz, spg, page_size, -1, spec.head_dim)
            pidx = spos[:, 0:1] // page_size + jnp.arange(spg)[None, :]
            dest_page = jnp.take_along_axis(
                table_l, jnp.clip(pidx, 0, table_l.shape[1] - 1), axis=1
            )  # [B, SPg]
            valid_len = jnp.clip(
                plan["new_lens"][:, None] - jnp.arange(spg)[None, :]
                * page_size, 0, page_size,
            )
            ds0 = plan["dest_slot"].reshape(bsz, spg, page_size)[:, :, 0]
            dest_page = jnp.where((valid_len > 0) & (ds0 >= 0),
                                  dest_page, -1)
            kc, vc, vsc, kch = quant_ops.store_pages_int2(
                kc, vc, vsc, kch, li,
                k4.reshape(bsz * spg, page_size, -1, spec.head_dim),
                v4.reshape(bsz * spg, page_size, -1, spec.head_dim),
                dest_page.reshape(-1), valid_len.reshape(-1),
                rt.kivi_group,
            )
            # raw rows of the final (possibly partial) page -> tail buffer
            lp = jnp.maximum((plan["new_lens"] - 1) // page_size, 0)
            sel = lp[:, None, None, None, None]
            k_last = jnp.take_along_axis(k4, sel, axis=1)[:, 0]
            v_last = jnp.take_along_axis(v4, sel, axis=1)[:, 0]
            rows = plan["row_ids"]
            lix = jnp.broadcast_to(jnp.asarray(li, rows.dtype), rows.shape)
            tail = tail.at[0, lix, rows].set(
                k_last.astype(tail.dtype), mode="drop")
            tail = tail.at[1, lix, rows].set(
                v_last.astype(tail.dtype), mode="drop")
            scales = (vsc, kch, tail)
            att_scales, att_kch = vsc, kch
        elif rt.kv_quant:
            if rt.kv_quant_bits == 4:
                kc, vc, scales = quant_ops.store_kv_quant_layer_u4(
                    kc, vc, scales, cli, k, v, dest
                )
            else:
                kc, vc, scales = quant_ops.store_kv_quant_layer(
                    kc, vc, scales, cli, k, v, dest
                )
            att_scales = scales
        else:
            kc, vc = attn_ops.store_kv_layer(
                kc, vc, cli, k, v, dest
            )
        if rt.quest:
            # quest never frees per-layer (no compaction), so its stacks
            # stay in lockstep and the layer-0 touched pages are valid for
            # every layer.
            meta = quest_ops.update_page_meta(
                meta, kc, li, plan["touched_pages"].reshape(-1)
            )
        out, obs = attn_ops.prefill_attention(
            q, kc, vc, cli,
            table_l, plan["ctx_lens"], plan["new_lens"],
            sm_scale=sm_scale,
            obs_window=rt.obs_window if rt.emit_prefill_scores else 0,
            score_pooling=rt.score_pooling,
            kv_scales=att_scales,
            k_ch_scales=att_kch,
            impl=rt.impl,
        )
        attn_out = out.reshape(*x.shape[:-1], spec.q_dim) @ _w(
            xs, "wo", (spec.q_dim, spec.hidden_size), x.dtype
        )
        h = h + attn_out
        x2 = rms_norm(h, xs["post_attn_norm"], spec.rms_norm_eps)
        h = h + _ffn(x2, xs, spec, rt.moe_dispatch)
        ys = obs if rt.emit_prefill_scores else None
        return (h, kc, vc, meta, scales), ys

    (h, k_cache, v_cache, quest_meta, kv_scales), obs_scores = jax.lax.scan(
        body, (h, k_cache, v_cache, quest_meta, kv_scales),
        _layer_xs(params, spec),
    )
    h = rms_norm(h, params["final_norm"], spec.rms_norm_eps)
    # last valid token's hidden state per sequence.
    last_idx = jnp.maximum(plan["new_lens"] - 1, 0)  # [B]
    last_h = jnp.take_along_axis(
        h, last_idx[:, None, None], axis=1
    ).squeeze(1)  # [B, H]
    return k_cache, v_cache, last_h, obs_scores, quest_meta, kv_scales


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def decode_forward(
    params,
    k_cache: jax.Array,  # [L, pages, P, Nkv, Dh]
    v_cache: jax.Array,
    tables: jax.Array,  # [L, R, MP_full] persistent device page table
    plan: dict,  # token_ids/positions/row_ids [B], dest_slot [L,B],
    #               ctx_lens [L,B]; static: mp_bucket via plan['_mp_bucket']
    rope: tuple[jax.Array, jax.Array],
    *,
    spec: ModelSpec,
    rt: StepRuntime,
    mp_bucket: int,
    is_full_layer: jax.Array | None = None,  # [L] bool (decode_select)
    quest_meta: jax.Array | None = None,
    kv_scales: jax.Array | None = None,  # [2, L, pages, Nkv, P] (kv_quant)
    query_cache: jax.Array | None = None,  # [L, R, Qc, Nq, Dh] (rkv/skipkv)
    steer_vec: jax.Array | None = None,  # [L, H] steering vectors (skipkv)
    dk: dict | None = None,  # DeltaKV latent/center state (ops/deltakv.py)
    dk_comp: dict | None = None,  # stacked compressor params [Ls, ...]
    sparse_slot: jax.Array | None = None,  # [L] sparse-layer slot index
    mpr_sparse: int = 0,  # static raw-pages bucket for sparse rows
    dk_recon: dict | None = None,  # reconstruction cache (rt.dk_recon)
    group_ids: jax.Array | None = None,  # [L] selection-group per layer
):
    """One decode step for [B] sequences.
    Returns (k_cache, v_cache, h [B,H], quest_meta, kv_scales,
    query_cache, dk_recon)."""
    cos, sin = rope
    tokens = plan["token_ids"]  # [B]
    positions = plan["positions"]
    row_ids = plan["row_ids"]
    h = params["embed"][tokens]  # [B, H]
    sm_scale = spec.head_dim ** -0.5
    b = tokens.shape[0]
    k_tokens = mp_bucket * k_cache.shape[2]  # keys bucket in tokens

    if (rt.decode_select or rt.deltakv) and is_full_layer is None:
        raise ValueError("decode_select/deltakv require is_full_layer flags")

    extra = {
        "_dest": plan["dest_slot"],  # [L, B]
        "_ctx": plan["ctx_lens"],  # [L, B]
    }
    if rt.decode_select or rt.deltakv:
        extra["_is_full"] = is_full_layer
    if rt.deltakv:
        extra["_sparse_slot"] = sparse_slot
    if rt.dk_recon:
        if dk_recon is None or group_ids is None:
            raise ValueError("rt.dk_recon requires dk_recon state and "
                             "group_ids")
        extra["_group_id"] = group_ids

    sel0 = jnp.ones((b, k_tokens), dtype=bool)
    page_size = k_cache.shape[2]
    dk_t = max(min(rt.dk_topk, mp_bucket * page_size), 1)
    topk0 = jnp.zeros((b, dk_t), jnp.int32)
    if rt.dk_recon:
        # rc_kv is READ-ONLY inside the layer scan (closure input) and
        # batch-scattered AFTER it from per-layer ys — the kv_scales
        # pattern: an in-scan carry that is both slab-read and scattered
        # at a traced layer index makes XLA copy the whole array per
        # layer (measured 8.2 tok/s vs 18.9 baseline; PERF_NOTES rule).
        rc_kv_in = dk_recon["kv"]
        t_cache = dk_recon["slot_tok"].shape[2]
        pad_rc = min(rt.dk_recon_pad, t_cache)
        kvdim_rc = rc_kv_in.shape[-1]
        rc0 = (
            dk_recon["slot_tok"],
            jnp.full((b, pad_rc), -(2 ** 30), jnp.int32),  # admitted toks
            jnp.full((b, pad_rc), t_cache, jnp.int32),  # admitted slots
            jnp.zeros((b, t_cache), bool),  # admitted-this-step slots
            jnp.ones((b,), bool),  # lag (until the first refresh)
        )
    else:
        rc0 = None

    def body(carry, xs):
        h, kc, vc, sel, have_sel, meta, qcache, topk, rc = carry
        li = xs["_layer_idx"]
        # cache-layer index (global pool: all layers at cache index 0;
        # tables still per-layer — see StepRuntime.global_pool)
        cli = li * 0 if rt.global_pool else li
        ctx = xs["_ctx"]  # [B]
        table_l = jax.lax.dynamic_index_in_dim(
            tables, li, 0, keepdims=False
        )[row_ids, :mp_bucket]  # [B, MP_bucket]

        if rt.steer_alpha != 0.0 and steer_vec is not None:
            h = h + rt.steer_alpha * jax.lax.dynamic_index_in_dim(
                steer_vec, li, 0, keepdims=False
            ).astype(h.dtype)
        x = rms_norm(h, xs["input_norm"], spec.rms_norm_eps)
        q, k, v = _qkv(x, xs, spec)
        q = apply_rope(q[:, None], positions[:, None], cos, sin)[:, 0]
        k = apply_rope(k[:, None], positions[:, None], cos, sin)[:, 0]
        if rt.record_queries:
            qcache = rkv_ops.record_query(
                qcache, li, q, row_ids, plan["qslot"]
            )
        tail_k = tail_v = tail_all_len = None
        if rt.kv_quant and rt.kv_quant_bits == 2:
            # KIVI-2 decode: the kernel serves only COMPLETE quantized
            # pages (tokens < prev_q); the partial tail page stays raw in
            # the tail buffer (the KIVI fp-residual window) and merges
            # exactly via the kernel's (m, l) stats. The current token
            # patches into the tail locally; its buffer write and — at a
            # page boundary — the flushed page's channel scales batch-write
            # AFTER the layer scan (in-scan scale writes force a whole-
            # array copy per layer once the kernel reads them; payload
            # page writes stay in-scan like every other store).
            vsc, kch, tail = kv_scales
            rows = row_ids
            tk_l = jax.lax.dynamic_index_in_dim(
                tail[0], li, 0, keepdims=False
            )[rows]  # [B, P, Nkv, Dh]
            tv_l = jax.lax.dynamic_index_in_dim(
                tail[1], li, 0, keepdims=False
            )[rows]
            slot = (ctx - 1) % page_size  # [B]
            bidx = jnp.arange(b)
            tail_k = tk_l.at[bidx, slot].set(k.astype(tk_l.dtype))
            tail_v = tv_l.at[bidx, slot].set(v.astype(tv_l.dtype))
            prev_q = (ctx - 1) // page_size * page_size
            tail_all_len = ctx - prev_q  # in [1, P]
            # page flush: the current token completes a page -> quantize
            # the raw tail per-channel and store it (payload in-scan,
            # scales as ys). Computed every step, dropped off-boundary.
            kq_pg, ks_pg, kz_pg = quant_ops.quantize_page_k_int2(
                tail_k, rt.kivi_group)
            vq_pg, vs_pg, vz_pg = quant_ops.quantize_page_v_int2(tail_v)
            # the manager-allocated slot of the CURRENT token names the
            # flush page directly (current is the page's last slot when
            # flush fires); padded lanes carry dest -1 and drop.
            flush = ((ctx % page_size) == 0) & (xs["_dest"] >= 0)
            dest_pg = jnp.where(flush, xs["_dest"] // page_size, -1)
            lix = jnp.broadcast_to(jnp.asarray(li, dest_pg.dtype),
                                   dest_pg.shape)
            kc = kc.at[lix, dest_pg].set(kq_pg, mode="drop")
            vc = vc.at[lix, dest_pg].set(vq_pg, mode="drop")
            k_cur = v_cur = None
            step_scales = (
                k.astype(tail.dtype), v.astype(tail.dtype),
                ks_pg, kz_pg, vs_pg, vz_pg, dest_pg,
            )
        elif rt.kv_quant:
            # payload stored in-layer; SCALES are not (a per-layer scale
            # write read back by the attention kernel forces XLA to copy
            # the whole scales array per layer — see
            # quant_ops.store_kv_quant_payload). The current token is
            # excluded from the kernel (ctx-1) and merged exactly from its
            # dequantized values; this step's scales batch-write after the
            # layer scan.
            if rt.kv_quant_bits == 4:
                kq, ks, kz = quant_ops.quantize_rows_u4(k)
                vq, vs, vz = quant_ops.quantize_rows_u4(v)
                k_cur = quant_ops.dequantize_rows_u4(kq, ks, kz).astype(
                    q.dtype)
                v_cur = quant_ops.dequantize_rows_u4(vq, vs, vz).astype(
                    q.dtype)
                step_scales = (ks, vs, kz, vz)
                # flat-lane int4 cache rows (ops/quant.py int4 section)
                kq = kq.reshape(kq.shape[0], -1)
                vq = vq.reshape(vq.shape[0], -1)
            else:
                kq, ks = quant_ops.quantize_rows(k)
                vq, vs = quant_ops.quantize_rows(v)
                k_cur = quant_ops.dequantize_rows(kq, ks).astype(q.dtype)
                v_cur = quant_ops.dequantize_rows(vq, vs).astype(q.dtype)
                step_scales = (ks, vs)
            kc, vc = quant_ops.store_kv_quant_payload(
                kc, vc, cli, kq, vq, xs["_dest"]
            )
        else:
            kc, vc = attn_ops.store_kv_layer(kc, vc, cli, k, v, xs["_dest"])
            k_cur = v_cur = None
            step_scales = None
        recon_ys = None  # set by the deltakv recon-cache branch

        def attend(q, table_a, ctx_a, select_mask=None, page_pos=None):
            """Dense-family decode attention incl. the int8 current-token
            merge (kv_scales is scan-INVARIANT: no in-scan writes)."""
            if not rt.kv_quant:
                out, _ = attn_ops.decode_attention(
                    q, kc, vc, cli, table_a, ctx_a, sm_scale=sm_scale,
                    select_mask=select_mask, page_pos=page_pos,
                    kv_scales=None, impl=rt.impl,
                )
                return out
            if rt.kv_quant_bits == 2:
                # kernel over complete quantized pages; raw tail page
                # (incl. current token) merges via the (m, l) stats
                prev_q = (ctx_a - 1) // page_size * page_size
                out_h, m_h, l_h = attn_ops.decode_attention(
                    q, kc, vc, cli, table_a, prev_q, sm_scale=sm_scale,
                    select_mask=select_mask, page_pos=page_pos,
                    kv_scales=vsc, k_ch_scales=kch, impl=rt.impl,
                    return_stats=True,
                )
                return attn_ops.merge_tail_attention(
                    out_h, m_h, l_h, q, tail_k, tail_v, tail_all_len,
                    sm_scale=sm_scale,
                )
            out_h, m_h, l_h = attn_ops.decode_attention(
                q, kc, vc, cli, table_a, ctx_a - 1, sm_scale=sm_scale,
                select_mask=select_mask, page_pos=page_pos,
                kv_scales=kv_scales, impl=rt.impl, return_stats=True,
            )
            return attn_ops.merge_token_attention(
                out_h, m_h, l_h, q, k_cur, v_cur, sm_scale=sm_scale,
            )

        if rt.deltakv:
            is_full = xs["_is_full"]
            sl = xs["_sparse_slot"]
            kfull = table_l.shape[1] * page_size
            comp_counts = plan["comp_counts"]  # [B]

            def full_attn(q):
                if rt.kv_quant:
                    # KIVI full layers (reference full_layer_kivi fused
                    # decode, deltakv_kernels.py:676-1144): dense + score
                    # emission over the quantized pool IN-KERNEL. The
                    # current token is excluded (ctx-1: its scales
                    # batch-write after the layer scan) and merged exactly
                    # from its dequantized values — its score is never
                    # needed (top-k runs over the compressed region, which
                    # ends far before ctx-1).
                    out_h, scores, m_h, l_h = attn_ops.decode_attention(
                        q, kc, vc, cli, table_l, ctx - 1,
                        sm_scale=sm_scale, emit_scores=True,
                        return_stats=True, kv_scales=kv_scales,
                        impl=rt.impl,
                    )
                    out = attn_ops.merge_token_attention(
                        out_h, m_h, l_h, q, k_cur, v_cur,
                        sm_scale=sm_scale,
                    )
                    return out, scores
                out, scores = attn_ops.decode_attention(
                    q, kc, vc, cli, table_l, ctx,
                    sm_scale=sm_scale, emit_scores=True, impl=rt.impl,
                )
                return out, scores

            def _reconstruct(idx_sel):
                """gather records -> dequant -> up-proj -> +refs ->
                re-RoPE for the given compressed indices."""
                comp_layer = comp_ops.layer_slice(dk_comp, sl)
                return dk_ops.reconstruct(
                    dk, sl, comp_layer, rt.dk_arch, row_ids, idx_sel,
                    comp_counts,
                    jnp.full((b,), rt.dk_comp_base, jnp.int32),
                    cos, sin,
                    stride=rt.dk_stride, nkv=spec.num_kv_heads,
                    dh=spec.head_dim, latent_bits=rt.dk_latent_bits,
                    latent_group=rt.dk_group,
                    latent_dim=rt.dk_latent_dim, neighbors=rt.dk_nn,
                )

            def sparse_attn(q):
                # raw resident window (sink + tail) through the SAME paged
                # kernel as every other read; the previous XLA gather of
                # this tiny window made layout assignment COPY the whole
                # int4 pool inside the scan (1.78 GiB temp at 128K).
                # kv_quant: exclude the current token (its scales land
                # after the layer scan) and merge it exactly at the end.
                tbl = table_l[:, :mpr_sparse]
                ctx_r = ctx - 1 if rt.kv_quant else ctx
                out_r, m_r, l_r = attn_ops.decode_attention(
                    q, kc, vc, cli, tbl, ctx_r, sm_scale=sm_scale,
                    return_stats=True, kv_scales=kv_scales, impl=rt.impl,
                )
                if rt.dk_recon:
                    slot_all, cur_nt, cur_ns, cur_adm, cur_lag = rc
                    g = xs["_group_id"]
                    stok = jax.lax.dynamic_index_in_dim(
                        slot_all, g, 0, keepdims=False
                    )[row_ids]  # [B, Tc]
                    # reconstruct THIS layer's kv for the admitted tokens:
                    # attended via the fresh branch this step, scattered
                    # into the cache after the layer scan (ys)
                    kh, vh, fresh_valid = _reconstruct(cur_nt)
                    packed = dk_ops.recon_pack(kh, vh, rc_kv_in.dtype)

                    def cached_path(q):
                        slab = jax.lax.dynamic_index_in_dim(
                            rc_kv_in, sl, 0, keepdims=False
                        )[row_ids]  # [B, Tc, KV]
                        oc, mc, lc = dk_ops.recon_cached_attention_stats(
                            q, slab, stok, comp_counts,
                            nkv=spec.num_kv_heads, dh=spec.head_dim,
                            sm_scale=sm_scale, stale=cur_adm,
                        )
                        of_, mf, lf = (
                            dk_ops.reconstructed_attention_stats(
                                q, kh, vh, fresh_valid, sm_scale=sm_scale,
                            )
                        )
                        return attn_ops.merge_attention_stats(
                            oc, mc, lc, of_, mf, lf
                        )

                    def lag_path(q):
                        # cache lags the selection (first step after
                        # invalidation / drift burst): exact full
                        # reconstruct while the PAD-per-step admissions
                        # catch the cache up in the background
                        k2, v2, hv2 = _reconstruct(topk)
                        return dk_ops.reconstructed_attention_stats(
                            q, k2, v2, hv2, sm_scale=sm_scale,
                        )

                    out_h, m_h, l_h = jax.lax.cond(
                        jnp.any(cur_lag), lag_path, cached_path, q
                    )
                    rys = (packed, cur_ns)
                else:
                    k_hat, v_hat, hv = _reconstruct(topk)
                    out_h, m_h, l_h = dk_ops.reconstructed_attention_stats(
                        q, k_hat, v_hat, hv, sm_scale=sm_scale,
                    )
                    rys = None
                out, m_all, l_all = attn_ops.merge_attention_stats(
                    out_r, m_r, l_r, out_h, m_h, l_h
                )
                if rt.kv_quant:
                    out = attn_ops.merge_token_attention(
                        out, m_all, l_all, q, k_cur, v_cur,
                        sm_scale=sm_scale,
                    )
                return out, jnp.zeros((b, kfull), jnp.float32), rys

            def full_attn_rc(q):
                out, scores = full_attn(q)
                if rt.dk_recon:
                    # full layers write nothing: slot Tc drops in the
                    # post-scan scatter (ys shapes must match per layer)
                    rys = (
                        jnp.zeros((b, pad_rc, kvdim_rc), rc_kv_in.dtype),
                        jnp.full((b, pad_rc), t_cache, jnp.int32),
                    )
                else:
                    rys = None
                return out, scores, rys

            out, scores, recon_ys = jax.lax.cond(
                is_full, full_attn_rc, sparse_attn, q
            )

            def refresh(_):
                # top-k compressed indices from full-layer token scores
                # (reference sparse_controller deltakv top-k over compressed
                # lens, :1301-1330)
                pos = jnp.arange(kfull, dtype=jnp.int32)[None, :]
                in_comp = (pos >= rt.dk_comp_base) & (
                    pos < rt.dk_comp_base + comp_counts[:, None]
                )
                cand = jnp.where(in_comp, scores, NEG_INF)
                _, idx = jax.lax.top_k(cand, dk_t)
                idx = (idx - rt.dk_comp_base).astype(jnp.int32)
                if not rt.dk_recon:
                    return idx, rc
                # group refresh: diff the new selection against the cache
                # content ONCE here; every sparse layer of the group
                # consumes the same drift plan (ops/deltakv.py recon cache)
                slot_all, _nt, _ns, _adm, _lag = rc
                g = xs["_group_id"]
                tc = slot_all.shape[2]
                if tc > dk_t:
                    # stable junk keys pad the selection to the cache
                    # width: distinct, never valid, identical across steps
                    # (so junk slots are never churned)
                    junk = (
                        jnp.int32(-(2 ** 30) + 1)
                        + jnp.arange(tc - dk_t, dtype=jnp.int32)
                    )[None, :]
                    idx_p = jnp.concatenate(
                        [idx, jnp.broadcast_to(junk, (b, tc - dk_t))],
                        axis=-1,
                    )
                else:
                    idx_p = idx
                prev = jax.lax.dynamic_index_in_dim(
                    slot_all, g, 0, keepdims=False
                )[row_ids]
                st, nt, ns_, adm, lag = dk_ops.recon_group_refresh(
                    prev, idx_p, pad_rc
                )
                slot_all = slot_all.at[g, row_ids].set(st, mode="drop")
                return idx, (slot_all, nt, ns_, adm, lag)

            def keep(_):
                return topk, rc

            topk, rc = jax.lax.cond(is_full, refresh, keep, None)
        elif rt.quest:
            meta = quest_ops.update_page_meta(
                meta, kc, li, xs["_dest"] // page_size
            )
            kp = min(rt.quest_keep_pages, mp_bucket)

            def quest_attn(q):
                compact, ppos = quest_ops.select_pages(
                    q, meta, li, table_l, ctx,
                    keep_pages=kp, page_size=page_size,
                    sink_pages=-(-rt.sink_tokens // page_size),
                    recent_pages=-(-rt.recent_tokens // page_size) + 1,
                )
                return attend(q, compact, ctx, page_pos=ppos)

            def dense_attn(q):
                return attend(q, table_l, ctx)

            # first quest_skip_layers layers stay dense
            # (reference quest.py build_decode_view:1270-1297).
            out = jax.lax.cond(
                li < rt.quest_skip_layers, dense_attn, quest_attn, q
            )
        elif rt.decode_select:
            is_full = xs["_is_full"]
            kp_sel = min(
                -(-rt.select_keep // page_size)
                + -(-rt.sink_tokens // page_size)
                + -(-rt.recent_tokens // page_size) + 4,
                mp_bucket,
            )

            def obs_attn(q):
                """Observation (full) layer: dense + score emission in the
                SAME kernel sweep (per-page raw expsums + late
                normalization, ops/paged_decode.py). kv_quant: the kernel
                dequantizes in-kernel over ctx-1 (the current token's
                scales batch-write after the layer scan) and the token
                merges exactly outside; its score is irrelevant (the
                recent window is force-kept by selection anyway). The old
                in-scan whole-array scale patch forced a padded-layout
                scales copy per layer (see deltakv sparse_attn note)."""
                if rt.kv_quant:
                    out_h, scores, m_h, l_h = attn_ops.decode_attention(
                        q, kc, vc, cli, table_l, ctx - 1,
                        sm_scale=sm_scale, emit_scores=True,
                        return_stats=True, kv_scales=kv_scales,
                        impl=rt.impl,
                    )
                    out = attn_ops.merge_token_attention(
                        out_h, m_h, l_h, q, k_cur, v_cur,
                        sm_scale=sm_scale,
                    )
                    return out, scores
                return attn_ops.decode_attention(
                    q, kc, vc, cli, table_l, ctx,
                    sm_scale=sm_scale, emit_scores=True, impl=rt.impl,
                )

            def sparse_attn(q):
                """Selected layer: page-compacted reads bounded by the keep
                budget (PERF: a full-width masked read streams the whole
                context). Falls back to the full masked read until the
                first obs-layer refresh of this step (sel starts all-ones)
                or when configured exact."""
                def full_masked(q):
                    return attend(q, table_l, ctx, select_mask=sel)

                if rt.select_exact_mask:
                    out = full_masked(q)
                else:
                    def compacted(q):
                        ppos, cmask = compact_keep_pages(
                            sel, ctx, kp_sel, page_size)
                        compact = jnp.take_along_axis(table_l, ppos, axis=1)
                        return attend(q, compact, ctx, select_mask=cmask,
                                      page_pos=ppos)

                    out = jax.lax.cond(have_sel, compacted, full_masked, q)
                return out, jnp.zeros((b, k_tokens), jnp.float32)

            out, scores = jax.lax.cond(is_full, obs_attn, sparse_attn, q)

            def refresh(_):
                return build_keep_mask(
                    scores, ctx, rt.sink_tokens, rt.recent_tokens,
                    min(rt.select_keep, k_tokens),
                )
            sel = jax.lax.cond(is_full, refresh, lambda _: sel, None)
            have_sel = have_sel | is_full
        else:
            out = attend(q, table_l, ctx)
        attn_out = out.reshape(b, spec.q_dim) @ _w(
            xs, "wo", (spec.q_dim, spec.hidden_size), x.dtype
        )
        h = h + attn_out
        x2 = rms_norm(h, xs["post_attn_norm"], spec.rms_norm_eps)
        h = h + _ffn(x2, xs, spec, rt.moe_dispatch)
        return (h, kc, vc, sel, have_sel, meta, qcache, topk,
                rc), (step_scales, recon_ys)

    (h, k_cache, v_cache, _, _, quest_meta,
     query_cache, _, rc_out), (step_scales, recon_ys_all) = jax.lax.scan(
        body,
        (h, k_cache, v_cache, sel0, jnp.zeros((), bool), quest_meta,
         query_cache, topk0, rc0),
        _layer_xs(params, spec, extra),
    )
    if rt.dk_recon:
        # ONE batched scatter of every layer's admitted reconstructions
        # (kv_scales pattern: rc_kv is read-only inside the layer scan).
        # Full layers emitted slot Tc -> dropped; padded batch lanes carry
        # row max_rows -> dropped.
        packed_all, slots_all = recon_ys_all  # [L, B, PAD, KV], [L, B, PAD]
        lix = jnp.broadcast_to(
            sparse_slot[:, None, None], slots_all.shape
        ).astype(jnp.int32)
        ridx = jnp.broadcast_to(
            plan["row_ids"][None, :, None], slots_all.shape
        )
        rc_kv = rc_kv_in.at[lix, ridx, slots_all].set(
            packed_all, mode="drop"
        )
        dk_recon = {"kv": rc_kv, "slot_tok": rc_out[0]}
    if rt.kv_quant and rt.kv_quant_bits == 2:
        # batched post-scan writes: current token -> raw tail buffer;
        # flushed-page channel scales -> scale arrays (payload pages were
        # stored in-scan; in-scan SCALE writes would force whole-array
        # copies per layer once the kernel reads them).
        vsc, kch, tail = kv_scales
        k_tok, v_tok, ks_pg, kz_pg, vs_pg, vz_pg, dest_pg = step_scales
        l = k_tok.shape[0]
        bsz = k_tok.shape[1]
        ctx_all = plan["ctx_lens"]  # [L, B]
        slot = (ctx_all - 1) % tail.shape[3]
        lix = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[:, None],
                               (l, bsz))
        rows2 = jnp.broadcast_to(plan["row_ids"][None, :], (l, bsz))
        tail = tail.at[0, lix, rows2, slot].set(k_tok, mode="drop")
        tail = tail.at[1, lix, rows2, slot].set(v_tok, mode="drop")
        vsc, kch = quant_ops.scatter_flush_scales_int2(
            vsc, kch, ks_pg, kz_pg, vs_pg, vz_pg, dest_pg
        )
        kv_scales = (vsc, kch, tail)
    elif rt.kv_quant:
        # ONE batched scale write for the whole step (all layers). In-scan
        # writes would force a whole-array copy per layer once the
        # attention kernel reads the scales (measured; see
        # quant_ops.store_kv_quant_payload).
        kv_scales = quant_ops.scatter_scales_batch(
            kv_scales, step_scales, plan["dest_slot"]
        )
    h = rms_norm(h, params["final_norm"], spec.rms_norm_eps)
    return (k_cache, v_cache, h, quest_meta, kv_scales, query_cache,
            dk_recon)


def compute_logits(params, hidden: jax.Array, spec: ModelSpec) -> jax.Array:
    """hidden [B, H] -> logits [B, V] (fp32)."""
    if spec.tie_word_embeddings:
        logits = hidden @ params["embed"].T.astype(hidden.dtype)
    else:
        logits = hidden @ _w(
            params, "lm_head", (spec.hidden_size, spec.vocab_size),
            hidden.dtype,
        )
    return logits.astype(jnp.float32)
