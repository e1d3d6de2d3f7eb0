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
        if config.global_kv_pool:
            raise NotImplementedError(
                "global_kv_pool is not wired for hybrid executors (their "
                "KV pools already cover only the full-attention layers)"
            )
        if config.method not in ("", "deltakv"):
            raise NotImplementedError(
                f"hybrid models support sparse_method '' (vanilla) or "
                f"'deltakv'; got {config.method!r} (reference pairs "
                f"qwen3_5 with vanilla/deltakv, models/qwen3_5.py:399-857)"
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
        self._dk_cfg = None
        if config.method == "deltakv":
            self._init_hybrid_deltakv(config, spec, max_rows, dtype)
        # logprobs for hybrid decode are staged for a later round; the
        # engine reads this attribute after every step
        self.last_logprobs = None

    def _init_hybrid_deltakv(self, config, spec, max_rows, dtype) -> None:
        """hybrid x deltakv: full_attn_layers (MODEL-layer indices, must be
        full-attention layers incl. the first one) map to KV slots; the
        remaining KV slots become deltakv-compressed layers. Linear layers
        are untouched (recurrent state, no KV)."""
        from .executor import init_deltakv_state

        full_model = sorted(set(config.full_attn_layers))
        full_set = set(spec.full_layers)
        bad = [i for i in full_model if i not in full_set]
        if bad:
            raise ValueError(
                f"hybrid deltakv: full_attn_layers {bad} are not "
                f"full-attention layers of this model (full layers: "
                f"{sorted(full_set)})"
            )
        if spec.full_layers[0] not in full_model:
            raise ValueError(
                f"hybrid deltakv requires the FIRST full-attention layer "
                f"({spec.full_layers[0]}) in full_attn_layers — the first "
                f"selection must come from an observation layer"
            )
        slots = tuple(sorted(spec.kv_slot[i] for i in full_model))
        # the cache manager plans in KV-slot space (kv_manager/deltakv.py)
        config.full_attn_kv_slots = slots
        (self._dk_sparse_layers, self._sparse_slot, self.dk_comp,
         self.dk_state, arch, latent_dim) = init_deltakv_state(
            config, spec.num_kv_heads, spec.head_dim, spec.num_kv_layers,
            set(slots), max_rows, dtype,
        )
        comp_base = (
            -(-config.num_sink_tokens // config.page_size)
            * config.page_size
        )
        stride = max(int(round(1.0 / config.deltakv_cluster_ratio)), 1)
        self._dk_cfg = qn.HybridDeltaKVConfig(
            full_slots=slots,
            sparse_slot_map=tuple(int(s) for s in
                                  np.asarray(self._sparse_slot)),
            topk=config.decode_keep_tokens,
            comp_base=comp_base,
            stride=stride,
            arch=arch,
            latent_bits=config.deltakv_latent_bits,
            latent_group=config.deltakv_latent_group,
            latent_dim=latent_dim,
            neighbors=config.deltakv_neighbor_count,
        )
        # compress_prefill/_get_dk_compress_fn (inherited from
        # ModelExecutor) read these StepRuntime fields. A REAL StepRuntime
        # (not a SimpleNamespace) keeps the executor's shared helpers on a
        # uniform runtime contract: any inherited path reading other
        # fields (impl, kv_quant, global_pool, ...) sees the defaults
        # instead of AttributeError (ADVICE r4 low #3).
        from ..models.transformer import StepRuntime

        self._rt = StepRuntime(
            deltakv=True, dk_comp_base=comp_base, dk_stride=stride,
            dk_arch=arch, dk_latent_bits=config.deltakv_latent_bits,
            dk_group=config.deltakv_latent_group,
            dk_nn=config.deltakv_neighbor_count,
            dk_latent_dim=latent_dim,
            dk_topk=config.decode_keep_tokens,
        )

    # ------------------------------------------------------------- step fns

    def _get_prefill_fn(self, bb: int, sb: int, mp: int, mode: str):
        key = ("prefill", bb, sb, mp, mode)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        spec, impl = self.spec, self._impl

        def step(params, kc, vc, conv, rec, tables, plan, rope):
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
            if self._dk_cfg is not None:
                # deltakv splices diverge KV layers after prefill end:
                # per-slot tables + on-device dest (qn.prefill_forward)
                kc, vc, conv, rec, last_h = qn.prefill_forward(
                    params, kc, vc, conv, rec, inner, rope, spec=spec,
                    impl=impl, fp8_shapes=self._fp8_shapes,
                    tables=tables, mp=mp,
                )
            else:
                # vanilla hybrid never frees pages per-layer, so the free
                # stacks stay lockstep and layer-0's table serves all
                # KV layers.
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
        key = ("decode", bb, mp, k, mode, mpr)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        spec, impl = self.spec, self._impl
        dk_cfg = self._dk_cfg

        def megastep(params, kc, vc, conv, rec, dk, dk_comp, tables, plan,
                     rope):
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
                if dk_cfg is not None:
                    p["comp_counts"] = plan["comp_counts"]
                kc, vc, conv, rec, h = qn.decode_forward(
                    params, kc, vc, conv, rec, tables, p, rope,
                    spec=spec, impl=impl, mp_bucket=mp,
                    fp8_shapes=self._fp8_shapes,
                    dk=dk, dk_comp=dk_comp, dk_cfg=dk_cfg,
                    mpr_sparse=mpr,
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
                self.rec_states, self.tables, plan, self.rope,
            )
        return self._fetch(tokens)[:b], obs

    def run_decode(self, seqs, dest_slots, ctx_start, row_ids,
                   comp_counts=None):
        b = len(seqs)
        lkv = self.spec.num_kv_layers
        k = dest_slots.shape[2]
        max_ctx = int(ctx_start.max()) + k
        bb, mp = self._decode_buckets(
            b, -(-max_ctx // self.config.page_size)
        )
        mpr = 0
        if self._dk_cfg is not None:
            # raw-pages bucket for the SPLICED sparse rows (sink + tail)
            sparse_max = int(ctx_start[self._dk_sparse_layers].max()) + k
            mpr = min(
                self.config.context_bucket_pages(
                    max(-(-sparse_max // self.config.page_size), 1)
                ),
                mp,
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
        host_plan = {
            "token_ids0": token_ids, "positions0": positions,
            "row_ids": self._pad(row_ids, (bb,), fill=self.max_rows),
            "dest": self._pad(dest_slots, (lkv, bb, k), fill=-1),
            "ctx_start": self._pad(ctx_start, (lkv, bb)),
            "step": np.asarray(self._step_counter, np.int32),
            "temps": temps, "top_k": top_k, "top_p": top_p,
        }
        if self._dk_cfg is not None:
            host_plan["comp_counts"] = self._pad(
                np.asarray(comp_counts, np.int32), (bb,)
            )
        plan = self._put_plan(host_plan, "decode")
        self._step_counter += 1
        fn = self._get_decode_fn(bb, mp, k, mode, mpr)
        with profiler.record("decode_step"):
            (self.k_cache, self.v_cache, self.conv_states, self.rec_states,
             tokens) = fn(
                self.params, self.k_cache, self.v_cache, self.conv_states,
                self.rec_states, self.dk_state, self.dk_comp,
                self.tables, plan, self.rope,
            )
        tokens.copy_to_host_async()
        return self._fetch(tokens).T[:b]
