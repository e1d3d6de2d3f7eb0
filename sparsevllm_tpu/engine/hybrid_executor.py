"""Executor for hybrid (full + linear attention) models — Qwen3-Next/Qwen3.5.

Mirrors ModelExecutor's public surface (run_prefill / run_decode /
apply_table_updates) for models/qwen3_next.py. Differences:

  * KV pools cover only the FULL-attention layers (the kv manager is built
    with spec.num_kv_layers rows; linear layers consume no pages) — the
    reference RuntimeLayout.kv_layer_index idea (config.py:396-543).
  * linear layers carry persistent recurrent state instead: conv tails
    [Llin, R, K-1, conv_dim] and delta-rule matrices [Llin, R, Hv, Dk, Dv]
    — the reference RecurrentStateManager's row tables
    (recurrent_state_manager.py:88-437) as donated jit-carry arrays; rows
    are zeroed in-jit on a sequence's first prefill chunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import sampler as sampler_ops
from ..layers.rope import rope_table
from ..models import qwen3_next as qn
from ..utils.log import logger
from ..utils.profiler import profiler
from .executor import ModelExecutor, _round_up_pow2


class HybridExecutor(ModelExecutor):
    def __init__(self, config, spec: qn.HybridSpec, params, num_pages: int,
                 max_rows: int, mesh=None):
        if config.method:
            raise NotImplementedError(
                f"hybrid models support sparse_method='' (vanilla) in this "
                f"round; got {config.method!r} (reference pairs qwen3_5 "
                f"with vanilla/deltakv)"
            )
        self.config = config
        self.spec = spec
        self._fp8_shapes = None
        if config.weight_quantization == "fp8":
            from ..ops import fp8 as fp8_ops

            params = dict(params)
            qlayers, shapes = [], []
            for lp in params["layers"]:
                ql, sh = fp8_ops.quantize_param_tree(
                    lp, fp8_ops.HYBRID_WEIGHT_NAMES
                )
                qlayers.append(ql)
                shapes.append(sh)
            params["layers"] = qlayers
            self._fp8_shapes = tuple(shapes)
        self.params = params
        self.mesh = mesh
        self.num_pages = num_pages
        self.max_rows = max_rows
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "float16": jnp.float16}[config.dtype]
        self.kv_dtype = dtype

        lkv, p = spec.num_kv_layers, config.page_size
        kv_shape = (lkv, num_pages, p, spec.num_kv_heads, spec.head_dim)
        self.k_cache = jnp.zeros(kv_shape, dtype)
        self.v_cache = jnp.zeros(kv_shape, dtype)
        self.tables = jnp.zeros(
            (lkv, max_rows, config.max_pages_per_seq), jnp.int32
        )
        llin = len(spec.linear_layers)
        self.conv_states = jnp.zeros(
            (llin, max_rows, spec.linear_conv_kernel_dim - 1, spec.conv_dim),
            dtype,
        )
        self.rec_states = jnp.zeros(
            (llin, max_rows, spec.linear_num_value_heads,
             spec.linear_key_head_dim, spec.linear_value_head_dim),
            jnp.float32,
        )
        # rotary tables at the PARTIAL rotary width
        self.rope = rope_table(
            spec.rotary_dim,
            max(config.max_model_len, spec.max_position_embeddings) + 1,
            spec.rope_theta, None,
        )
        self._impl = (
            config.attention_impl
            if config.attention_impl in ("ref", "pallas")
            else ("pallas" if jax.default_backend() == "tpu" else "ref")
        )
        if mesh is not None:
            from ..parallel.mesh import shard_hybrid_executor_state

            shard_hybrid_executor_state(self)
        self._base_key = jax.random.PRNGKey(config.seed)
        self._step_counter = 0
        self._fn_cache: dict = {}
        self._update_fn = jax.jit(
            self._update_tables_impl, donate_argnums=(0,)
        )
        # unused ModelExecutor state referenced by shared host helpers
        self.quest_meta = None
        self.kv_scales = None
        self.query_cache = None
        self.steer_vec = None
        self.dk_state = None
        self.dk_comp = None
        # logprobs for hybrid decode are staged for a later round; the
        # engine reads this attribute after every step
        self.last_logprobs = None

    # ------------------------------------------------------------- step fns

    def _get_prefill_fn(self, bb: int, sb: int, mp: int, mode: str):
        key = ("prefill", bb, sb, mp, mode)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        spec, rope, impl = self.spec, self.rope, self._impl

        def step(params, kc, vc, conv, rec, tables, plan):
            # zero recurrent state for rows starting a fresh prompt
            rows = plan["row_ids"]
            fresh = plan["fresh"]  # [B] bool
            conv = conv.at[:, rows].multiply(
                (~fresh)[None, :, None, None].astype(conv.dtype),
                mode="drop",
            )
            rec = rec.at[:, rows].multiply(
                (~fresh)[None, :, None, None, None].astype(rec.dtype),
                mode="drop",
            )
            inner = dict(plan)
            # hybrid KV layers never free pages per-layer (no deltakv/
            # pyramid compaction here), so their free stacks stay in
            # lockstep and the layer-0 table is valid for every KV layer.
            inner["page_table"] = tables[0][rows, :mp]
            kc, vc, conv, rec, last_h = qn.prefill_forward(
                params, kc, vc, conv, rec, inner, rope, spec=spec,
                impl=impl, fp8_shapes=self._fp8_shapes,
            )
            logits = qn.compute_logits(params, last_h, spec)
            k = jax.random.fold_in(self._base_key, plan["step"])
            tokens = sampler_ops.sample(
                logits, plan["temps"], plan["top_k"], plan["top_p"], k,
                mode=mode,
            )
            return kc, vc, conv, rec, tokens, None

        fn = jax.jit(step, donate_argnums=(1, 2, 3, 4))
        self._fn_cache[key] = fn
        logger.info("compiled hybrid prefill bucket B=%d S=%d MP=%d",
                    bb, sb, mp)
        return fn

    def _get_decode_fn(self, bb: int, mp: int, k: int, mode: str,
                       mpr: int = 0):
        key = ("decode", bb, mp, k, mode)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        spec, rope, impl = self.spec, self.rope, self._impl

        def megastep(params, kc, vc, conv, rec, tables, plan):
            base_key = jax.random.fold_in(self._base_key, plan["step"])

            def body(carry, t):
                kc, vc, conv, rec, tok = carry
                p = {
                    "token_ids": tok,
                    "positions": plan["positions0"] + t,
                    "row_ids": plan["row_ids"],
                    "dest_slot": plan["dest"][:, :, t],
                    "ctx_lens": plan["ctx_start"] + t + 1,
                }
                kc, vc, conv, rec, h = qn.decode_forward(
                    params, kc, vc, conv, rec, tables, p, rope,
                    spec=spec, impl=impl, mp_bucket=mp,
                    fp8_shapes=self._fp8_shapes,
                )
                logits = qn.compute_logits(params, h, spec)
                tok2 = sampler_ops.sample(
                    logits, plan["temps"], plan["top_k"], plan["top_p"],
                    jax.random.fold_in(base_key, t), mode=mode,
                )
                return (kc, vc, conv, rec, tok2), tok2

            (kc, vc, conv, rec, _), toks = jax.lax.scan(
                body, (kc, vc, conv, rec, plan["token_ids0"]),
                jnp.arange(k, dtype=jnp.int32),
            )
            return kc, vc, conv, rec, toks

        fn = jax.jit(megastep, donate_argnums=(1, 2, 3, 4))
        self._fn_cache[key] = fn
        logger.info("compiled hybrid decode megastep B=%d MP=%d k=%d",
                    bb, mp, k)
        return fn

    # -------------------------------------------- recurrent-state snapshots

    def snapshot_recurrent(self, row: int):
        """Host copy of one row's conv tails + delta-rule matrices —
        attached to joint prefix blocks at chunk boundaries (reference
        PrefixCacheCoordinator MixedPrefixBlockPayload)."""
        return (
            np.asarray(self.conv_states[:, row]),
            np.asarray(self.rec_states[:, row]),
        )

    def restore_recurrent(self, row: int, state) -> None:
        conv, rec = state
        self.conv_states = self.conv_states.at[:, row].set(
            jnp.asarray(conv, self.conv_states.dtype)
        )
        self.rec_states = self.rec_states.at[:, row].set(
            jnp.asarray(rec, self.rec_states.dtype)
        )

    # ----------------------------------------------------------------- runs

    def run_prefill(self, seqs, chunk_sizes, dests, row_ids,
                    ctx_lens_tokens, emit_obs: bool = True):
        # emit_obs accepted for engine-interface parity; hybrid models have
        # no observation-score pass (sparse KV methods are KV-layer only).
        del emit_obs
        b = len(seqs)
        s = max(chunk_sizes)
        max_ctx = int(ctx_lens_tokens.max())
        bb, sb, mp = self._prefill_buckets(b, s, max_ctx)

        token_ids = np.zeros((bb, sb), np.int32)
        positions = np.zeros((bb, sb), np.int32)
        dest = np.full((bb, sb), -1, np.int32)
        new_lens = np.zeros(bb, np.int32)
        ctx = np.zeros(bb, np.int32)
        fresh = np.zeros(bb, bool)
        for i, (seq, c) in enumerate(zip(seqs, chunk_sizes)):
            start = seq.num_prefilled_tokens
            token_ids[i, :c] = seq.prompt_token_ids[start:start + c]
            positions[i, :c] = np.arange(start, start + c)
            dest[i, :c] = dests[i]
            new_lens[i] = c
            ctx[i] = ctx_lens_tokens[i]
            fresh[i] = start == 0
        temps, top_k, top_p, mode, _nlp = self._sampling_arrays(seqs, bb)
        plan = self._put_plan(
            {
                "token_ids": token_ids, "positions": positions,
                "dest_slot": dest,
                # out-of-range rows for padded lanes: conv/rec state
                # scatters drop instead of scribbling over row 0
                "row_ids": self._pad(row_ids, (bb,), fill=self.max_rows),
                "ctx_lens": ctx, "new_lens": new_lens, "fresh": fresh,
                "step": np.asarray(self._step_counter, np.int32),
                "temps": temps, "top_k": top_k, "top_p": top_p,
            },
            "prefill",
        )
        self._step_counter += 1
        fn = self._get_prefill_fn(bb, sb, mp, mode)
        with profiler.record("prefill_step"):
            (self.k_cache, self.v_cache, self.conv_states, self.rec_states,
             tokens, obs) = fn(
                self.params, self.k_cache, self.v_cache, self.conv_states,
                self.rec_states, self.tables, plan,
            )
        return np.asarray(tokens)[:b], obs

    def run_decode(self, seqs, dest_slots, ctx_start, row_ids,
                   comp_counts=None):
        b = len(seqs)
        lkv = self.spec.num_kv_layers
        k = dest_slots.shape[2]
        max_ctx = int(ctx_start.max()) + k
        bb, mp = self._decode_buckets(
            b, -(-max_ctx // self.config.page_size)
        )
        token_ids = np.zeros(bb, np.int32)
        positions = np.zeros(bb, np.int32)
        for i, seq in enumerate(seqs):
            token_ids[i] = (
                seq.completion_token_ids[-1]
                if seq.completion_token_ids else seq.prompt_token_ids[-1]
            )
            positions[i] = seq.num_tokens - 1
        temps, top_k, top_p, mode, _nlp = self._sampling_arrays(seqs, bb)
        plan = self._put_plan(
            {
                "token_ids0": token_ids, "positions0": positions,
                "row_ids": self._pad(row_ids, (bb,), fill=self.max_rows),
                "dest": self._pad(dest_slots, (lkv, bb, k), fill=-1),
                "ctx_start": self._pad(ctx_start, (lkv, bb)),
                "step": np.asarray(self._step_counter, np.int32),
                "temps": temps, "top_k": top_k, "top_p": top_p,
            },
            "decode",
        )
        self._step_counter += 1
        fn = self._get_decode_fn(bb, mp, k, mode)
        with profiler.record("decode_step"):
            (self.k_cache, self.v_cache, self.conv_states, self.rec_states,
             tokens) = fn(
                self.params, self.k_cache, self.v_cache, self.conv_states,
                self.rec_states, self.tables, plan,
            )
        tokens.copy_to_host_async()
        return np.asarray(tokens).T[:b]
