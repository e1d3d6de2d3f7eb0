"""Qwen3-Next / Qwen3.5 hybrid model: full attention + gated delta net.

Reference counterpart: src/sparsevllm/models/qwen3_5.py:1-1049 (mixed
full-attention + linear-attention layers per ``layer_types``,
Qwen35LinearAttention over the vendored FLA Triton ops) +
engine/recurrent_state_manager.py. Math verified against HF
transformers.models.qwen3_next.modeling_qwen3_next (torch_chunk/
recurrent_gated_delta_rule :442-563, GatedDeltaNet :564-777).

TPU design:
  * layers are HETEROGENEOUS, so this model keeps per-layer param dicts and
    a Python-unrolled layer loop inside the jitted step (compile once per
    bucket, like the scan path; depth-proportional trace time is the price
    of the hybrid).
  * full-attention layers use the SAME paged KV pools/kernels as every other
    model — their kv slot index is the layer's position among full layers
    (reference RuntimeLayout.kv_layer_index, config.py:396-543).
  * linear (GDN) layers carry recurrent state instead of KV: a causal-conv
    tail [conv_dim, K-1] and the delta-rule matrix S [Hv, Dk, Dv] per row
    (reference RecurrentStateSpec, recurrent_state_manager.py:20-79).
    Prefill uses the chunkwise-parallel gated delta rule (reference FLA
    chunk.py); decode uses the fused recurrent step.

Notable numerics (all from the HF model, kept bit-compatible):
  * RMSNorm weights are ZERO-CENTERED: scale = (1 + w).
  * full-attention q_proj emits [q ∥ gate]; output is gated by sigmoid(gate)
    before o_proj; q/k per-head norms; PARTIAL rotary (rotary_dim =
    head_dim * partial_rotary_factor).
  * GDN: interleaved per-k-head [q, k, v, z] projection; depthwise causal
    conv1d + silu over [q∥k∥v]; l2-normalized q/k; beta = sigmoid(b);
    g = -exp(A_log) * softplus(a + dt_bias); gated RMSNorm(out) * silu(z).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import attention as attn_ops
from ..ops import attention_ref as ref_ops
from ..ops import fp8 as fp8_ops


@dataclass(frozen=True)
class HybridDeltaKVConfig:
    """Static deltakv wiring for hybrid decode (hashable: jit-key safe).

    ``full_slots``/``sparse_slot`` live in KV-SLOT space (indices into the
    hybrid model's full-attention KV layers). Reference: qwen3_5 + deltakv
    pairing (models/qwen3_5.py:399-857, config.py:326-393)."""

    full_slots: tuple[int, ...]
    sparse_slot_map: tuple[int, ...]  # kv slot -> sparse-layer index
    topk: int
    comp_base: int
    stride: int
    arch: str
    latent_bits: int
    latent_group: int
    latent_dim: int = 0
    neighbors: int = 4

    @property
    def sparse_slot(self):
        return self.sparse_slot_map

NEG_INF = -1e30


@dataclass(frozen=True)
class HybridSpec:
    model_type: str
    num_layers: int
    hidden_size: int
    layer_types: tuple[str, ...]  # 'full_attention' | 'linear_attention'
    # full attention
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    rotary_dim: int
    # gdn
    linear_num_value_heads: int
    linear_num_key_heads: int
    linear_key_head_dim: int
    linear_value_head_dim: int
    linear_conv_kernel_dim: int
    # mlp / moe
    intermediate_size: int
    num_experts: int
    num_experts_per_tok: int
    moe_intermediate_size: int
    norm_topk_prob: bool
    decoder_sparse_step: int
    mlp_only_layers: tuple[int, ...]
    shared_expert_intermediate_size: int
    vocab_size: int
    rms_norm_eps: float
    rope_theta: float
    max_position_embeddings: int
    tie_word_embeddings: bool = False

    @property
    def full_layers(self) -> tuple[int, ...]:
        return tuple(i for i, t in enumerate(self.layer_types)
                     if t == "full_attention")

    @property
    def linear_layers(self) -> tuple[int, ...]:
        return tuple(i for i, t in enumerate(self.layer_types)
                     if t == "linear_attention")

    @property
    def num_kv_layers(self) -> int:
        return len(self.full_layers)

    @property
    def kv_slot(self) -> dict[int, int]:
        return {li: s for s, li in enumerate(self.full_layers)}

    @property
    def lin_slot(self) -> dict[int, int]:
        return {li: s for s, li in enumerate(self.linear_layers)}

    @property
    def conv_dim(self) -> int:
        return (2 * self.linear_num_key_heads * self.linear_key_head_dim
                + self.linear_num_value_heads * self.linear_value_head_dim)

    def is_moe_layer(self, i: int) -> bool:
        return (
            i not in self.mlp_only_layers
            and self.num_experts > 0
            and (i + 1) % self.decoder_sparse_step == 0
        )


def hybrid_spec_from_hf(cfg) -> HybridSpec:
    get = (lambda k, d=None: getattr(cfg, k, d))
    head_dim = get("head_dim") or get("hidden_size") // get(
        "num_attention_heads"
    )
    return HybridSpec(
        model_type="qwen3_next",
        num_layers=get("num_hidden_layers"),
        hidden_size=get("hidden_size"),
        layer_types=tuple(get("layer_types")),
        num_q_heads=get("num_attention_heads"),
        num_kv_heads=get("num_key_value_heads"),
        head_dim=head_dim,
        rotary_dim=int(head_dim * get("partial_rotary_factor", 1.0)),
        linear_num_value_heads=get("linear_num_value_heads"),
        linear_num_key_heads=get("linear_num_key_heads"),
        linear_key_head_dim=get("linear_key_head_dim"),
        linear_value_head_dim=get("linear_value_head_dim"),
        linear_conv_kernel_dim=get("linear_conv_kernel_dim"),
        intermediate_size=get("intermediate_size"),
        num_experts=get("num_experts", 0) or 0,
        num_experts_per_tok=get("num_experts_per_tok", 0) or 0,
        moe_intermediate_size=get("moe_intermediate_size", 0) or 0,
        norm_topk_prob=bool(get("norm_topk_prob", True)),
        decoder_sparse_step=get("decoder_sparse_step", 1) or 1,
        mlp_only_layers=tuple(get("mlp_only_layers", ()) or ()),
        shared_expert_intermediate_size=get(
            "shared_expert_intermediate_size", 0
        ) or 0,
        vocab_size=get("vocab_size"),
        rms_norm_eps=get("rms_norm_eps", 1e-6),
        rope_theta=get("rope_theta", 10000.0),
        max_position_embeddings=get("max_position_embeddings", 131072),
        tie_word_embeddings=bool(get("tie_word_embeddings", False)),
    )


# ---------------------------------------------------------------------------
# Numerics building blocks (HF-bit-compatible)
# ---------------------------------------------------------------------------


def zc_rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """Zero-centered-weight RMSNorm: x_norm * (1 + w), computed in fp32 and
    cast AFTER the scale (HF Qwen3NextRMSNorm:215-231)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
    )
    return (normed * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def gated_rms_norm(x: jax.Array, w: jax.Array, gate: jax.Array,
                   eps: float) -> jax.Array:
    """RMSNorm then * silu(gate) (HF Qwen3NextRMSNormGated:68-85 — note the
    PLAIN weight here, not zero-centered)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps
    )
    out = w.astype(x.dtype) * normed.astype(x.dtype)
    return (
        out * jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
    )


def partial_rope(x: jax.Array, positions: jax.Array, cos: jax.Array,
                 sin: jax.Array, rotary_dim: int) -> jax.Array:
    """Rotate only the first rotary_dim dims (HF apply_rotary_pos_emb
    :243-280; cos/sin tables are built at rotary_dim)."""
    from ..layers.rope import apply_rope

    rot = apply_rope(x[..., :rotary_dim], positions, cos, sin)
    return jnp.concatenate([rot, x[..., rotary_dim:]], axis=-1)


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + eps
    )


def causal_conv1d(x: jax.Array, weight: jax.Array,
                  tail: jax.Array | None = None,
                  new_lens: jax.Array | None = None) -> jax.Array:
    """Depthwise causal conv + silu.

    x [B, S, C]; weight [C, K]; tail [B, K-1, C] previous inputs (decode /
    chunk continuation) or None (fresh prefill, zero history). ``new_lens``
    [B] marks each row's valid length so the saved tail ends at the last
    REAL token of a ragged chunk, not at the padding.
    Returns (out [B, S, C] silu'd, new_tail [B, K-1, C]).
    """
    b, s, c = x.shape
    k = weight.shape[1]
    if tail is None:
        tail = jnp.zeros((b, k - 1, c), x.dtype)
    xt = jnp.concatenate([tail, x], axis=1)  # [B, S+K-1, C]
    # depthwise: out[t, c] = sum_j xt[t+j, c] * w[c, j]
    out = jnp.zeros((b, s, c), jnp.float32)
    for j in range(k):
        out = out + xt[:, j:j + s].astype(jnp.float32) * weight[:, j].astype(
            jnp.float32
        )
    if k > 1:
        if new_lens is None:
            new_tail = xt[:, -(k - 1):]
        else:
            # last K-1 inputs ending at each row's valid length:
            # xt positions [new_len, new_len + K-1)
            idx = new_lens[:, None] + jnp.arange(k - 1)[None, :]  # [B, K-1]
            new_tail = jnp.take_along_axis(xt, idx[..., None], axis=1)
    else:
        new_tail = jnp.zeros((b, 0, c), x.dtype)
    return jax.nn.silu(out).astype(x.dtype), new_tail


def gdn_recurrence(
    q: jax.Array,  # [B, S, Hv, Dk] (post conv, pre-l2norm)
    k: jax.Array,  # [B, S, Hv, Dk]
    v: jax.Array,  # [B, S, Hv, Dv]
    g: jax.Array,  # [B, S, Hv] log-decay
    beta: jax.Array,  # [B, S, Hv]
    state: jax.Array,  # [B, Hv, Dk, Dv]
    valid: jax.Array | None = None,  # [B, S] padded-token mask
) -> tuple[jax.Array, jax.Array]:
    """Gated delta rule, sequential over S (HF
    torch_recurrent_gated_delta_rule:522-563 exactly). Returns
    (out [B, S, Hv, Dv], final state). Padded steps (valid==False) leave the
    state untouched and output zeros.
    """
    scale = q.shape[-1] ** -0.5
    qf = l2norm(q.astype(jnp.float32)) * scale
    kf = l2norm(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = beta.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones(q.shape[:2], bool)

    def step(s_prev, xs):
        q_t, k_t, v_t, g_t, b_t, m_t = xs  # [B,Hv,Dk],... m [B]
        s_dec = s_prev * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.sum(s_dec * k_t[..., None], axis=-2)  # [B,Hv,Dv]
        delta = (v_t - kv_mem) * b_t[..., None]
        s_new = s_dec + k_t[..., None] * delta[..., None, :]
        out_t = jnp.sum(s_new * q_t[..., None], axis=-2)  # [B,Hv,Dv]
        keep = m_t[:, None, None, None]
        s_new = jnp.where(keep, s_new, s_prev)
        out_t = jnp.where(m_t[:, None, None], out_t, 0.0)
        return s_new, out_t

    xs = (
        qf.transpose(1, 0, 2, 3), kf.transpose(1, 0, 2, 3),
        vf.transpose(1, 0, 2, 3), gf.transpose(1, 0, 2),
        bf.transpose(1, 0, 2), valid.T,
    )
    state, outs = jax.lax.scan(step, state.astype(jnp.float32), xs)
    return outs.transpose(1, 0, 2, 3).astype(v.dtype), state


# ---------------------------------------------------------------------------
# Layer forwards
# ---------------------------------------------------------------------------


def gdn_qkvzba(x: jax.Array, lp: dict, spec: HybridSpec):
    """Project + un-interleave (HF fix_query_key_value_ordering:631-658)."""
    hk, hv = spec.linear_num_key_heads, spec.linear_num_value_heads
    dk, dv = spec.linear_key_head_dim, spec.linear_value_head_dim
    r = hv // hk
    qkvz = x @ lp["in_proj_qkvz"]  # [..., hk*(2dk + 2r*dv)]
    ba = x @ lp["in_proj_ba"]  # [..., hk*2r]
    qkvz = qkvz.reshape(*x.shape[:-1], hk, 2 * dk + 2 * r * dv)
    ba = ba.reshape(*x.shape[:-1], hk, 2 * r)
    q = qkvz[..., :dk]
    k = qkvz[..., dk:2 * dk]
    v = qkvz[..., 2 * dk:2 * dk + r * dv].reshape(*x.shape[:-1], hv, dv)
    z = qkvz[..., 2 * dk + r * dv:].reshape(*x.shape[:-1], hv, dv)
    b = ba[..., :r].reshape(*x.shape[:-1], hv)
    a = ba[..., r:].reshape(*x.shape[:-1], hv)
    return q, k, v, z, b, a


def gdn_layer(
    x: jax.Array,  # [B, S, H] (post input norm)
    lp: dict,
    spec: HybridSpec,
    conv_tail: jax.Array,  # [B, K-1, conv_dim]
    state: jax.Array,  # [B, Hv, Dk, Dv]
    valid: jax.Array | None = None,  # [B, S]
    new_lens: jax.Array | None = None,  # [B] valid length per row
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One gated-delta-net token-mixer pass. Returns (out, conv_tail, state)."""
    hk, hv = spec.linear_num_key_heads, spec.linear_num_value_heads
    dk, dv = spec.linear_key_head_dim, spec.linear_value_head_dim
    r = hv // hk
    b_, s_, _ = x.shape
    q, k, v, z, b, a = gdn_qkvzba(x, lp, spec)
    mixed = jnp.concatenate(
        [q.reshape(b_, s_, hk * dk), k.reshape(b_, s_, hk * dk),
         v.reshape(b_, s_, hv * dv)], axis=-1,
    )
    if valid is not None:
        # padded tokens must not pollute the conv window / state
        mixed = jnp.where(valid[..., None], mixed, 0)
    mixed, conv_tail = causal_conv1d(mixed, lp["conv_w"], conv_tail,
                                     new_lens)
    q = mixed[..., :hk * dk].reshape(b_, s_, hk, dk)
    k = mixed[..., hk * dk:2 * hk * dk].reshape(b_, s_, hk, dk)
    v = mixed[..., 2 * hk * dk:].reshape(b_, s_, hv, dv)
    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32)
    )
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    out, state = gdn_recurrence(q, k, v, g, beta, state, valid)
    out = gated_rms_norm(out, lp["norm_w"], z, spec.rms_norm_eps)
    out = out.reshape(b_, s_, hv * dv) @ lp["out_proj"]
    return out, conv_tail, state


def full_attn_qkv(x: jax.Array, lp: dict, spec: HybridSpec, positions,
                  cos, sin):
    """q/gate split + per-head zero-centered norms + partial RoPE.
    Returns (q [.., Nq, Dh], k [.., Nkv, Dh], v, gate [.., Nq*Dh])."""
    qg = x @ lp["wq"]  # [..., 2*Nq*Dh]
    qg = qg.reshape(*x.shape[:-1], spec.num_q_heads, 2 * spec.head_dim)
    q = qg[..., :spec.head_dim]
    gate = qg[..., spec.head_dim:].reshape(
        *x.shape[:-1], spec.num_q_heads * spec.head_dim
    )
    k = (x @ lp["wk"]).reshape(*x.shape[:-1], spec.num_kv_heads,
                               spec.head_dim)
    v = (x @ lp["wv"]).reshape(*x.shape[:-1], spec.num_kv_heads,
                               spec.head_dim)
    q = zc_rms_norm(q, lp["q_norm"], spec.rms_norm_eps)
    k = zc_rms_norm(k, lp["k_norm"], spec.rms_norm_eps)
    q = partial_rope(q, positions, cos, sin, spec.rotary_dim)
    k = partial_rope(k, positions, cos, sin, spec.rotary_dim)
    return q, k, v, gate


def hybrid_mlp(x: jax.Array, lp: dict, spec: HybridSpec,
               is_moe: bool) -> jax.Array:
    if not is_moe:
        return (jax.nn.silu(x @ lp["w_gate"]) * (x @ lp["w_up"])) @ lp[
            "w_down"
        ]
    *lead, h = x.shape
    xt = x.reshape(-1, h)
    logits = xt @ lp["router"]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, spec.num_experts_per_tok)
    if spec.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    w = jnp.zeros_like(probs).at[
        jnp.arange(xt.shape[0])[:, None], top_i
    ].set(top_w)
    gate = jnp.einsum("th,ehi->tei", xt, lp["moe_w_gate"])
    up = jnp.einsum("th,ehi->tei", xt, lp["moe_w_up"])
    out = jnp.einsum(
        "tei,eih->teh", jax.nn.silu(gate) * up, lp["moe_w_down"]
    )
    out = jnp.sum(out * w[..., None].astype(out.dtype), axis=1)
    if "shared_w_gate" in lp:
        shared = (jax.nn.silu(xt @ lp["shared_w_gate"])
                  * (xt @ lp["shared_w_up"])) @ lp["shared_w_down"]
        shared = shared * jax.nn.sigmoid(
            (xt @ lp["shared_gate"]).astype(jnp.float32)
        ).astype(shared.dtype)
        out = out + shared
    return out.reshape(*lead, h)


# ---------------------------------------------------------------------------
# Step forwards (engine-facing)
# ---------------------------------------------------------------------------


def prefill_forward(
    params: dict,
    k_cache, v_cache,  # [Lkv, pages, P, Nkv, Dh]
    conv_states,  # [Llin, B?rows...] handled by executor: [Llin, R, K-1, C]
    rec_states,  # [Llin, R, Hv, Dk, Dv] f32
    plan: dict,  # token_ids/positions/dest_slot [B,S], page_table [B,MP],
    #               ctx_lens/new_lens [B], row_ids [B]
    rope,
    *,
    spec: HybridSpec,
    impl: str,
    fp8_shapes: tuple | None = None,
    tables=None,  # [Lkv, R, MPt] PER-KV-SLOT tables (deltakv: layers
    #   diverge after the prefill-end splice; see transformer.py docstring)
    mp: int = 0,
):
    """One chunked-prefill step; linear-layer states resume from the row
    tables so multi-chunk prompts recur correctly. ``fp8_shapes`` (one
    {name: (I, O)} per layer) enables block-scaled fp8 weight storage
    (ops/fp8.py — reference quantization/fp8.py:58-129)."""
    cos, sin = rope
    tokens = plan["token_ids"]
    positions = plan["positions"]
    rows = plan["row_ids"]
    h = params["embed"][tokens]
    sm_scale = spec.head_dim ** -0.5
    b, s = tokens.shape
    valid = (
        jnp.arange(s, dtype=jnp.int32)[None, :] < plan["new_lens"][:, None]
    )

    for li in range(spec.num_layers):
        lp = params["layers"][li]
        if fp8_shapes is not None:
            lp = fp8_ops.dequant_layer_dict(lp, fp8_shapes[li], h.dtype)
        res = h
        x = zc_rms_norm(h, lp["input_norm"], spec.rms_norm_eps)
        if spec.layer_types[li] == "full_attention":
            sl = spec.kv_slot[li]
            q, k, v, gate = full_attn_qkv(x, lp, spec, positions, cos, sin)
            if tables is not None:
                # per-KV-slot table + on-device dest (deltakv splices
                # diverge the layers after a prior sequence's prefill)
                p_sz = k_cache.shape[2]
                table_l = tables[sl][rows, :mp]
                pg = jnp.take_along_axis(table_l, positions // p_sz, axis=1)
                dest = jnp.where(
                    plan["dest_slot"] >= 0,
                    pg * p_sz + positions % p_sz, -1,
                )
            else:
                table_l = plan["page_table"]
                dest = plan["dest_slot"]
            k_cache, v_cache = attn_ops.store_kv_layer(
                k_cache, v_cache, sl, k, v, dest
            )
            out, _ = attn_ops.prefill_attention(
                q, k_cache, v_cache, sl,
                table_l, plan["ctx_lens"], plan["new_lens"],
                sm_scale=sm_scale, impl=impl,
            )
            out = out.reshape(b, s, spec.num_q_heads * spec.head_dim)
            out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(
                out.dtype
            )
            h = res + out @ lp["wo"]
        else:
            ls = spec.lin_slot[li]
            tail = conv_states[ls][rows]  # [B, K-1, C]
            st = rec_states[ls][rows]  # [B, Hv, Dk, Dv]
            out, tail, st = gdn_layer(
                x, lp, spec, tail, st, valid, plan["new_lens"]
            )
            # padded lanes carry rows == max_rows (out of range): drop
            # their state writes instead of aliasing a live row
            conv_states = conv_states.at[ls, rows].set(
                tail.astype(conv_states.dtype), mode="drop"
            )
            rec_states = rec_states.at[ls, rows].set(st, mode="drop")
            h = res + out
        res = h
        x2 = zc_rms_norm(h, lp["post_attn_norm"], spec.rms_norm_eps)
        h = res + hybrid_mlp(x2, lp, spec, spec.is_moe_layer(li))

    h = zc_rms_norm(h, params["final_norm"], spec.rms_norm_eps)
    last_idx = jnp.maximum(plan["new_lens"] - 1, 0)
    last_h = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)
    return k_cache, v_cache, conv_states, rec_states, last_h.squeeze(1)


def decode_forward(
    params: dict,
    k_cache, v_cache,
    conv_states, rec_states,
    tables,  # [Lkv, R, MP]
    plan: dict,  # token_ids/positions/row_ids [B], dest_slot [Lkv,B],
    #               ctx_lens [Lkv,B]
    rope,
    *,
    spec: HybridSpec,
    impl: str,
    mp_bucket: int,
    fp8_shapes: tuple | None = None,
    dk=None,  # DeltaKV latent/center state (ops/deltakv.init_state)
    dk_comp=None,
    dk_cfg=None,  # static HybridDeltaKVConfig (full KV slots, budgets)
    mpr_sparse: int = 0,
):
    """Hybrid decode; with ``dk_cfg`` the FULL-attention KV layers split
    into observation layers (dense + score emission) and deltakv layers
    (attention over [sink|tail raw ∥ reconstructed top-k latents]) —
    hybrid x deltakv, reference models/qwen3_5.py:399-857 pairing the
    hybrid arch with the sparse cache runtime. Linear-attention layers
    are untouched (their state is recurrent, not KV)."""
    cos, sin = rope
    tokens = plan["token_ids"]
    positions = plan["positions"]
    rows = plan["row_ids"]
    h = params["embed"][tokens]  # [B, H]
    sm_scale = spec.head_dim ** -0.5
    b = tokens.shape[0]
    topk = None
    if dk_cfg is not None:
        from ..ops import deltakv as dk_ops
        from ..utils import compressor as comp_ops

        dk_t = max(min(dk_cfg.topk, mp_bucket * k_cache.shape[2]), 1)
        topk = jnp.zeros((b, dk_t), jnp.int32)
        comp_counts = plan["comp_counts"]  # [B]
        kfull = mp_bucket * k_cache.shape[2]

    for li in range(spec.num_layers):
        lp = params["layers"][li]
        if fp8_shapes is not None:
            lp = fp8_ops.dequant_layer_dict(lp, fp8_shapes[li], h.dtype)
        res = h
        x = zc_rms_norm(h, lp["input_norm"], spec.rms_norm_eps)
        if spec.layer_types[li] == "full_attention":
            sl = spec.kv_slot[li]
            q, k, v, gate = full_attn_qkv(
                x[:, None], lp, spec, positions[:, None], cos, sin
            )
            q, k, v = q[:, 0], k[:, 0], v[:, 0]
            gate = gate[:, 0]
            k_cache, v_cache = attn_ops.store_kv_layer(
                k_cache, v_cache, sl, k, v, plan["dest_slot"][sl]
            )
            table_l = tables[sl][rows, :mp_bucket]
            ctx_l = plan["ctx_lens"][sl]
            if dk_cfg is None or sl in dk_cfg.full_slots:
                out, scores = attn_ops.decode_attention(
                    q, k_cache, v_cache, sl, table_l, ctx_l,
                    sm_scale=sm_scale, impl=impl,
                    emit_scores=dk_cfg is not None,
                )
                if dk_cfg is not None:
                    # top-k compressed indices over the compressed region
                    # (reference sparse_controller deltakv :1301-1330)
                    pos = jnp.arange(kfull, dtype=jnp.int32)[None, :]
                    in_comp = (pos >= dk_cfg.comp_base) & (
                        pos < dk_cfg.comp_base + comp_counts[:, None]
                    )
                    cand = jnp.where(in_comp, scores, -1e30)
                    _, idx = jax.lax.top_k(cand, dk_t)
                    topk = (idx - dk_cfg.comp_base).astype(jnp.int32)
            else:
                # deltakv sparse layer: raw resident rows (sink + tail)
                # + reconstructed top-k (per-layer ctx counts raw only —
                # the manager spliced the compressed pages out)
                kcl = k_cache[sl]
                vcl = v_cache[sl]
                tbl = table_l[:, :mpr_sparse]
                raw_k = ref_ops.gather_pages(kcl, tbl).transpose(0, 2, 1, 3)
                raw_v = ref_ops.gather_pages(vcl, tbl).transpose(0, 2, 1, 3)
                kr_n = raw_k.shape[1]
                raw_valid = (
                    jnp.arange(kr_n, dtype=jnp.int32)[None, :]
                    < ctx_l[:, None]
                )
                sl_sparse = dk_cfg.sparse_slot[sl]
                comp_layer = comp_ops.layer_slice(dk_comp, sl_sparse)
                k_hat, v_hat, hv = dk_ops.reconstruct(
                    dk, sl_sparse, comp_layer, dk_cfg.arch, rows, topk,
                    comp_counts,
                    jnp.full((b,), dk_cfg.comp_base, jnp.int32),
                    cos, sin,
                    stride=dk_cfg.stride, nkv=spec.num_kv_heads,
                    dh=spec.head_dim, latent_bits=dk_cfg.latent_bits,
                    latent_group=dk_cfg.latent_group,
                    rot_dim=spec.rotary_dim,
                    latent_dim=dk_cfg.latent_dim,
                    neighbors=dk_cfg.neighbors,
                )
                out = dk_ops.sparse_decode_attention(
                    q, raw_k, raw_v, raw_valid, k_hat, v_hat, hv,
                    sm_scale=sm_scale,
                )
            out = out.reshape(b, spec.num_q_heads * spec.head_dim)
            out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(
                out.dtype
            )
            h = res + out @ lp["wo"]
        else:
            ls = spec.lin_slot[li]
            tail = conv_states[ls][rows]
            st = rec_states[ls][rows]
            out, tail, st = gdn_layer(x[:, None], lp, spec, tail, st)
            conv_states = conv_states.at[ls, rows].set(
                tail.astype(conv_states.dtype), mode="drop"
            )
            rec_states = rec_states.at[ls, rows].set(st, mode="drop")
            h = res + out[:, 0]
        res = h
        x2 = zc_rms_norm(h, lp["post_attn_norm"], spec.rms_norm_eps)
        h = res + hybrid_mlp(x2, lp, spec, spec.is_moe_layer(li))

    h = zc_rms_norm(h, params["final_norm"], spec.rms_norm_eps)
    return k_cache, v_cache, conv_states, rec_states, h


def compute_logits(params: dict, hidden, spec: HybridSpec):
    if spec.tie_word_embeddings:
        return (hidden @ params["embed"].T.astype(hidden.dtype)).astype(
            jnp.float32
        )
    return (hidden @ params["lm_head"]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------


def params_from_hf_state_dict(spec: HybridSpec, state_dict, dtype: str):
    """Torch state dict -> per-layer param dicts (heterogeneous layers)."""
    jdt = {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
           "float32": jnp.float32}[dtype]

    def get(name):
        return state_dict[name].detach().to("cpu").float().numpy()

    def w(name):
        return jnp.asarray(np.ascontiguousarray(get(name).T), jdt)

    def raw(name):
        return jnp.asarray(get(name), jdt)

    layers = []
    for i in range(spec.num_layers):
        pre = f"model.layers.{i}"
        lp = {
            "input_norm": raw(f"{pre}.input_layernorm.weight"),
            "post_attn_norm": raw(f"{pre}.post_attention_layernorm.weight"),
        }
        if spec.layer_types[i] == "full_attention":
            lp.update(
                wq=w(f"{pre}.self_attn.q_proj.weight"),
                wk=w(f"{pre}.self_attn.k_proj.weight"),
                wv=w(f"{pre}.self_attn.v_proj.weight"),
                wo=w(f"{pre}.self_attn.o_proj.weight"),
                q_norm=raw(f"{pre}.self_attn.q_norm.weight"),
                k_norm=raw(f"{pre}.self_attn.k_norm.weight"),
            )
        else:
            pre_l = f"{pre}.linear_attn"
            lp.update(
                in_proj_qkvz=w(f"{pre_l}.in_proj_qkvz.weight"),
                in_proj_ba=w(f"{pre_l}.in_proj_ba.weight"),
                conv_w=raw(f"{pre_l}.conv1d.weight")[:, 0, :],  # [C, K]
                dt_bias=raw(f"{pre_l}.dt_bias"),
                A_log=raw(f"{pre_l}.A_log"),
                norm_w=raw(f"{pre_l}.norm.weight"),
                out_proj=w(f"{pre_l}.out_proj.weight"),
            )
        if spec.is_moe_layer(i):
            lp.update(
                router=w(f"{pre}.mlp.gate.weight"),
                moe_w_gate=jnp.stack([
                    w(f"{pre}.mlp.experts.{e}.gate_proj.weight")
                    for e in range(spec.num_experts)
                ]),
                moe_w_up=jnp.stack([
                    w(f"{pre}.mlp.experts.{e}.up_proj.weight")
                    for e in range(spec.num_experts)
                ]),
                moe_w_down=jnp.stack([
                    w(f"{pre}.mlp.experts.{e}.down_proj.weight")
                    for e in range(spec.num_experts)
                ]),
            )
            if spec.shared_expert_intermediate_size:
                lp.update(
                    shared_w_gate=w(
                        f"{pre}.mlp.shared_expert.gate_proj.weight"
                    ),
                    shared_w_up=w(f"{pre}.mlp.shared_expert.up_proj.weight"),
                    shared_w_down=w(
                        f"{pre}.mlp.shared_expert.down_proj.weight"
                    ),
                    shared_gate=w(f"{pre}.mlp.shared_expert_gate.weight"),
                )
        else:
            lp.update(
                w_gate=w(f"{pre}.mlp.gate_proj.weight"),
                w_up=w(f"{pre}.mlp.up_proj.weight"),
                w_down=w(f"{pre}.mlp.down_proj.weight"),
            )
        layers.append(lp)
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), jdt),
        "final_norm": raw("model.norm.weight"),
        "layers": layers,
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = w("lm_head.weight")
    return params
