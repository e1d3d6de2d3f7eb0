"""Model executor: device state + bucketed jitted step functions.

This is the TPU re-expression of the reference's ModelRunner +
DecodeCudaGraphRunner pair (engine/model_runner.py, decode_cuda_graph.py):

  * "Graph capture" becomes the **jit compile cache**: step functions are
    specialized on (phase, batch bucket, chunk bucket, context-pages bucket)
    — the same bucketing math as reference config.py:122-221 — and reused;
    replay is just calling the compiled function.
  * All per-step metadata is padded to the bucket shapes host-side
    (the reference's graph-stable `prepare_decode_static` contract,
    decode_cuda_graph.py:266-302).
  * KV caches are donated through every step, so updates are in-place in HBM.
  * The persistent device page table ([L, R, MP]) is maintained by a scatter
    op fed from the cache manager's incremental update queue — this replaces
    per-step slot-mapping uploads.
  * Sampling runs inside the jitted step (reference capture_sampling,
    decode_cuda_graph.py:446-466) using per-seq temperature/top-k/top-p
    arrays and a counter-derived PRNG key.

Single-controller: there is no SHM RPC (reference model_runner.py:321-461);
under multi-chip SPMD the same jitted program runs on all devices via GSPMD
sharding (parallel/mesh.py).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..layers import sampler as sampler_ops
from ..layers.rope import apply_rope, rope_table
from ..models.spec import ModelSpec
from ..models import transformer as tfm
from ..ops import attention as attn_ops
from ..ops import attention_ref as ref_ops
from ..ops import quant as quant_ops
from ..utils.log import logger
from ..utils.profiler import profiler

NEG_INF = -1e30


def _round_up_pow2(x: int, lo: int = 1) -> int:
    v = lo
    while v < x:
        v *= 2
    return v


def init_deltakv_state(config, nkv: int, dh: int, num_attn_layers: int,
                       full_set: set, max_rows: int, dtype):
    """DeltaKV executor state shared by ModelExecutor and HybridExecutor.

    ``num_attn_layers``/``full_set`` live in KV-LAYER space (for hybrid
    models the KV slots of the full-attention layers; reference
    deltakv_base.py:91-95 full/deltakv layer split). Returns
    (sparse_layers np, sparse_slot device, dk_comp, dk_state, arch,
    latent_dim)."""
    from ..ops import deltakv as dk_ops
    from ..utils import compressor as comp_ops

    sparse_layers = [
        i for i in range(num_attn_layers) if i not in full_set
    ]
    slot = np.zeros(num_attn_layers, np.int32)
    for si, li in enumerate(sparse_layers):
        slot[li] = si
    io_dim = 2 * nkv * dh
    arch = config.deltakv_compressor_arch
    if arch == "origin":
        # no learned compressor: payload = exact K∥V−ref residual
        latent_dim = io_dim
        dk_comp = comp_ops.init_compressor_params(
            len(sparse_layers), io_dim, io_dim, "origin", config.seed,
        )
    elif config.deltakv_checkpoint_path:
        # checkpoint is the source of truth for latent_dim/arch
        # (reference sync_deltakv_config_from_checkpoint,
        # utils/loader.py:186-278 — synced BEFORE cache allocation)
        dk_comp, meta = comp_ops.load_checkpoint(
            config.deltakv_checkpoint_path
        )
        latent_dim = int(meta["latent_dim"])
        arch = str(meta["arch"])
    else:
        latent_dim = config.deltakv_latent_dim or max(io_dim // 4, 16)
        logger.warning(
            "deltakv without checkpoint: RANDOM compressor "
            "(latent_dim=%d) — reconstruction is untrained; pass "
            "deltakv_checkpoint_path for real serving "
            "(reference rejects this, docs fail-fast rule; kept "
            "loud-but-runnable for pipeline tests)", latent_dim,
        )
        dk_comp = comp_ops.init_compressor_params(
            len(sparse_layers), io_dim, latent_dim, arch, config.seed,
        )
    per_byte = 8 // config.deltakv_latent_bits
    if latent_dim % per_byte:
        raise ValueError(
            f"deltakv latent_dim must be a multiple of {per_byte} "
            f"for {config.deltakv_latent_bits}-bit packed latents"
        )
    if (config.deltakv_latent_group
            and latent_dim % config.deltakv_latent_group):
        raise ValueError(
            f"deltakv_latent_group ({config.deltakv_latent_group}) "
            f"must divide latent_dim ({latent_dim})"
        )
    # arch is static (rt.dk_arch); jitted fns take arrays only
    dk_comp = {"down": dk_comp["down"], "up": dk_comp["up"]}
    stride = max(int(round(1.0 / config.deltakv_cluster_ratio)), 1)
    cmax = config.deltakv_max_compressed_tokens
    dk_state = dk_ops.init_state(
        len(sparse_layers), max_rows, cmax, -(-cmax // stride), nkv, dh,
        latent_dim, dtype,
        latent_bits=config.deltakv_latent_bits,
        latent_group=config.deltakv_latent_group,
        neighbors=config.deltakv_neighbor_count,
    )
    return (np.asarray(sparse_layers, np.int64), jnp.asarray(slot),
            dk_comp, dk_state, arch, latent_dim)


class ModelExecutor:
    # class-level defaults so subclasses with their own __init__
    # (HybridExecutor) stay attribute-compatible
    kv_manager = None
    _streamed = None
    dk_recon = None

    def __init__(
        self,
        config: Config,
        spec: ModelSpec,
        params,
        num_pages: int,
        max_rows: int,
        mesh=None,
    ):
        self.config = config
        self.spec = spec
        if config.weight_quantization == "fp8":
            from ..ops import fp8 as fp8_ops

            params = dict(params)
            # pre-quantized trees (synthetic zeros lanes build fp8
            # directly — quantizing a lazy-zeros bf16 tree leaks its
            # committed HBM on this backend, fp8.quantize_param_tree_zeros
            # docstring) pass through untouched.
            if not any(k.endswith("_sinv") for k in params["layers"]):
                params["layers"], _ = fp8_ops.quantize_param_tree(
                    params["layers"]
                )
            if "lm_head" in params and "lm_head_sinv" not in params:
                w8, sinv = fp8_ops.quantize(params["lm_head"])
                params["lm_head"] = w8
                params["lm_head_sinv"] = sinv
        self.params = params
        self.mesh = mesh
        # register for trace-time consumers (shard_map MoE dispatch);
        # engines are created/used sequentially, so last-set wins is safe
        from ..parallel import mesh as mesh_lib

        mesh_lib.set_current_mesh(mesh)
        self.num_pages = num_pages
        self.max_rows = max_rows
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "float16": jnp.float16}[config.dtype]
        kv_quant = config.kv_cache_dtype in ("int8", "int4", "int2")
        kv_bits = {"int4": 4, "int2": 2}.get(config.kv_cache_dtype, 8)
        self.kv_dtype = jnp.int8 if kv_quant else dtype

        l, p = spec.num_layers, config.page_size
        # global pool (config.global_kv_pool): ONE page id space shared by
        # all layers — cache arrays get a singleton layer dim; per-layer
        # page TABLES still route each layer to its own pages
        lc = 1 if config.global_kv_pool else l
        # token-major within a page (ops/attention_ref.py docstring);
        # int4 packs two elements per byte (split-half), int2 four
        # (split-quarter along lanes) — ops/quant.py. int4 uses the
        # FLAT-LANE 4-D shape [L, pages, P, Nkv*Dh//2] (lane f =
        # h*(Dh//2)+j): the 5-D form put Dh//2=64 on the lane axis, whose
        # 2x tile padding materialized two full padded cache copies as
        # prefill-scan HLO temps and broke the 128K int4 bucket compile
        # (ops/quant.py int4 section docstring).
        cdh = spec.head_dim // (8 // kv_bits) if kv_quant else spec.head_dim
        if kv_bits == 4:
            kv_shape = (lc, num_pages, p, spec.num_kv_heads * cdh)
        else:
            kv_shape = (lc, num_pages, p, spec.num_kv_heads, cdh)
        self.k_cache = jnp.zeros(kv_shape, self.kv_dtype)
        self.v_cache = jnp.zeros(kv_shape, self.kv_dtype)
        # per-slot dequant params (int8: k/v scales; int4: + k/v zeros),
        # [planes, L, pages, Nkv, P]: one exact (8,128) f32 tile per
        # (plane, layer, page) — the token-major [.., P, Nkv] shape padded
        # 16x in tiled form and broke the 128K prefill-bucket COMPILE
        # (ops/quant.py module docstring). KIVI-2 carries a pytree:
        # (V scale/zero planes, per-channel K scales over kivi_group_size
        # token groups, and the raw bf16 TAIL page per row — the
        # fp-residual window).
        if kv_bits == 2:
            g = config.kivi_group_size
            self.kv_scales = (
                jnp.ones((2, l, num_pages, spec.num_kv_heads, p),
                         jnp.float32),
                jnp.ones((2, l, num_pages, p // g, spec.num_kv_heads,
                          spec.head_dim), jnp.float32),
                jnp.zeros((2, l, max_rows, p, spec.num_kv_heads,
                           spec.head_dim), dtype),
            )
        else:
            self.kv_scales = (
                jnp.ones((4 if kv_bits == 4 else 2, lc, num_pages,
                          spec.num_kv_heads, p), jnp.float32)
                if kv_quant else None
            )
        self.tables = jnp.zeros(
            (l, max_rows, config.max_pages_per_seq), jnp.int32
        )
        self.rope = rope_table(
            spec.head_dim,
            max(config.max_model_len, spec.max_position_embeddings) + 1,
            spec.rope_theta,
            spec.rope_scaling,
        )
        prof = config.method_profile
        quest_kp = -(-(
            config.decode_keep_tokens + config.num_sink_tokens
            + config.num_recent_tokens
        ) // config.page_size) + 1
        self._rt = tfm.StepRuntime(
            impl=self._resolve_impl(),
            emit_prefill_scores=prof.needs_prefill_scores,
            obs_window=config.snapkv_obs_window,
            score_pooling=config.snapkv_kernel_size,
            decode_select=config.method == "omnikv",
            select_exact_mask=config.omnikv_exact_mask,
            select_keep=config.decode_keep_tokens,
            sink_tokens=config.num_sink_tokens,
            recent_tokens=config.num_recent_tokens,
            quest=config.method == "quest",
            quest_keep_pages=quest_kp,
            quest_skip_layers=config.quest_skip_layers,
            kv_quant=kv_quant,
            kv_quant_bits=kv_bits,
            kivi_group=config.kivi_group_size,
            record_queries=config.method in ("rkv", "skipkv"),
            steer_alpha=(
                config.skipkv_steering_alpha
                if config.method == "skipkv" else 0.0
            ),
            deltakv=config.method == "deltakv",
            dk_topk=config.decode_keep_tokens,
            dk_comp_base=(
                -(-config.num_sink_tokens // config.page_size)
                * config.page_size
            ),
            dk_stride=max(int(round(1.0 / config.deltakv_cluster_ratio)), 1),
            dk_arch=config.deltakv_compressor_arch,
            dk_latent_bits=config.deltakv_latent_bits,
            dk_nn=config.deltakv_neighbor_count,
            dk_group=config.deltakv_latent_group,
            # mesh: expert-parallel sorted dispatch (shard_map +
            # ragged_dot over each device's contiguous expert range) when
            # experts divide the model axis; single device: sorted.
            global_pool=config.global_kv_pool,
            moe_dispatch=(
                "sorted" if mesh is None else
                "sorted_ep"
                if spec.is_moe
                and spec.num_experts % mesh.shape["model"] == 0
                else "dense"
            ),
        )
        self.query_cache = None
        self.steer_vec = None
        self.last_logprobs = None  # set by run_prefill/run_decode
        if self._rt.record_queries:
            from ..ops import rkv as rkv_ops

            self.query_cache = rkv_ops.init_query_cache(
                l, max_rows, config.rkv_query_cache_size,
                spec.num_q_heads, spec.head_dim, dtype,
            )
        if self._rt.steer_alpha != 0.0 and config.skipkv_steering_path:
            vec = np.load(config.skipkv_steering_path)
            if vec.ndim == 1:
                vec = np.broadcast_to(vec, (l, vec.shape[0]))
            if vec.shape != (l, spec.hidden_size):
                raise ValueError(
                    f"steering vector shape {vec.shape} != "
                    f"({l}, {spec.hidden_size})"
                )
            self.steer_vec = jnp.asarray(vec, dtype)
        self.quest_meta = None
        if self._rt.quest:
            from ..ops import quest as quest_ops

            # sub-page K min/max summaries at quest_page_size granularity
            # (reference quest_chunk_size, quest.py:39,99-120)
            self.quest_meta = quest_ops.init_page_meta(
                l, num_pages, spec.num_kv_heads, spec.head_dim, dtype,
                subpages=max(p // config.quest_page_size, 1),
            )
        if (self._rt.decode_select or self._rt.deltakv) \
                and 0 not in set(config.full_attn_layers):
            raise ValueError(
                f"method {config.method!r} requires layer 0 in "
                f"full_attn_layers (first selection must come from a "
                f"full layer)"
            )
        self._is_full_layer = (
            jnp.asarray(
                [i in set(config.full_attn_layers)
                 for i in range(spec.num_layers)]
            )
            if (self._rt.decode_select or self._rt.deltakv)
            else None
        )
        self.dk_state = None
        self.dk_comp = None
        self.dk_recon = None
        self._sparse_slot = None
        self._group_ids = None
        if self._rt.deltakv:
            full = set(config.full_attn_layers)
            (self._dk_sparse_layers, self._sparse_slot, self.dk_comp,
             self.dk_state, arch, latent_dim) = init_deltakv_state(
                config, spec.num_kv_heads, spec.head_dim, l, full,
                max_rows, dtype,
            )
            self._rt = self._rt.__class__(
                **{**self._rt.__dict__, "dk_arch": arch,
                   "dk_latent_dim": latent_dim}
            )
            # selection group per layer: index of the most recent full
            # (observation) layer at or before it — all sparse layers of a
            # group share one top-k selection (and one recon-cache slot
            # assignment)
            fl = sorted(full)
            gids = np.zeros(l, np.int32)
            gi = -1
            for i in range(l):
                if i in full:
                    gi += 1
                gids[i] = max(gi, 0)
            self._group_ids = gids
            ns = len(self._dk_sparse_layers)
            kvdim = 2 * spec.num_kv_heads * spec.head_dim
            rc_bytes = (ns * max_rows * config.decode_keep_tokens
                        * kvdim * 2)
            use_rc = config.deltakv_recon_cache == "on" or (
                config.deltakv_recon_cache == "auto"
                and rc_bytes <= (1536 << 20)
            )
            if use_rc and ns:
                from ..ops import deltakv as dk_ops

                self.dk_recon = dk_ops.init_recon_cache(
                    ns, len(fl), max_rows, config.decode_keep_tokens,
                    spec.num_kv_heads, spec.head_dim, dtype,
                )
                self._rt = self._rt.__class__(
                    **{**self._rt.__dict__, "dk_recon": True,
                       "dk_recon_pad": min(config.deltakv_recon_pad,
                                           config.decode_keep_tokens)}
                )
        # mixed-precision staged prefill pool (config.kv_staging_dtype):
        # long prompts prefill QUANTIZED into this pool; attention runs bf16
        # over a per-layer dequantized scratch; compaction dequantizes the
        # kept tokens into the bf16 main pool (see run_prefill_staged).
        self.k_stage = self.v_stage = self.stage_scales = None
        self.num_stage_pages = 0
        sd = config.kv_staging_dtype
        if sd != "none":
            sp_pages = config.num_staging_pages or (
                config.max_pages_per_seq + 2
            )
            self.num_stage_pages = sp_pages
            if sd == "int4":
                self.k_stage = jnp.zeros(
                    (l, sp_pages, p, spec.num_kv_heads * spec.head_dim // 2),
                    jnp.int8,
                )
                self.v_stage = jnp.zeros_like(self.k_stage)
                # f16 scale/zero planes: 0.24 GiB -> 0.12 GiB at 128K;
                # dequant math upcasts to f32, the ~5e-4 relative scale
                # error is far below int4's own quantization noise
                self.stage_scales = jnp.ones(
                    (4, l, sp_pages, spec.num_kv_heads, p), jnp.float16
                )
            elif sd == "int8":
                self.k_stage = jnp.zeros(
                    (l, sp_pages, p, spec.num_kv_heads, spec.head_dim),
                    jnp.int8,
                )
                self.v_stage = jnp.zeros_like(self.k_stage)
                self.stage_scales = jnp.ones(
                    (2, l, sp_pages, spec.num_kv_heads, p), jnp.float32
                )
            else:  # bfloat16 staging (testing / big-HBM chips)
                self.k_stage = jnp.zeros(
                    (l, sp_pages, p, spec.num_kv_heads, spec.head_dim),
                    dtype,
                )
                self.v_stage = jnp.zeros_like(self.k_stage)
                self.stage_scales = None
        if mesh is not None:
            from ..parallel.mesh import shard_executor_state
            shard_executor_state(self)
        self._base_key = jax.random.PRNGKey(config.seed)
        self._step_counter = 0
        self._fn_cache: dict = {}
        self._update_fn = jax.jit(self._update_tables_impl, donate_argnums=(0,))
        # streamed long-prefill (host KV archive); engine wires kv_manager
        self.kv_manager = None
        self._streamed = None

    def _resolve_impl(self) -> str:
        if self.config.attention_impl in ("ref", "pallas"):
            return self.config.attention_impl
        return "pallas" if jax.default_backend() == "tpu" else "ref"

    # --------------------------------------------------------- table updates

    @staticmethod
    def _update_tables_impl(tables, l_idx, r_idx, i_idx, pages):
        # padded entries carry an out-of-range row -> dropped
        return tables.at[l_idx, r_idx, i_idx].set(pages, mode="drop")

    def apply_table_updates(self, updates) -> None:
        if updates is None:
            return
        l_idx, r_idx, i_idx, pages = updates
        # pad to a pow2 length bucket: every distinct update length is a
        # fresh jit compile (traced: 688 ms host stalls inside the decode
        # loop whenever a new length appeared)
        n = len(l_idx)
        nb = _round_up_pow2(max(n, 1))
        if nb != n:
            pad = nb - n
            l_idx = np.pad(l_idx, (0, pad))
            r_idx = np.pad(r_idx, (0, pad),
                           constant_values=self.tables.shape[1])
            i_idx = np.pad(i_idx, (0, pad))
            pages = np.pad(pages, (0, pad))
        self.tables = self._update_fn(
            self.tables, self._dev(l_idx), self._dev(r_idx),
            self._dev(i_idx), self._dev(pages),
        )

    # -------------------------------------------------- streamed long prefill

    @property
    def streamed(self):
        if self._streamed is None:
            from .streamed_prefill import StreamedPrefillRunner

            self._streamed = StreamedPrefillRunner(self)
        return self._streamed

    def run_prefill_streamed(self, seq, chunk: int):
        """One chunk of a host-archived long prefill (engine routes prompts
        over long_prefill_offload_threshold here; see streamed_prefill.py)."""
        with profiler.record("streamed_prefill_chunk"):
            return self.streamed.run_chunk(seq, chunk)

    def store_rows_layer(self, layer_idx: int, k_rows, v_rows, slots) -> None:
        """Scatter [N, Nkv, Dh] fp rows into one layer's pages (streamed
        compaction adoption). Quantizes when the cache is int8/int4."""
        from ..ops import attention as attn_ops
        from ..ops import quant as quant_ops

        key = "store_rows"
        fn = self._fn_cache.get(key)
        if fn is None:
            if self._rt.kv_quant:
                bits = self._rt.kv_quant_bits
                if bits == 2:
                    raise NotImplementedError(
                        "streamed-prefill row adoption is not wired for "
                        "the KIVI-2 cache (page-group quantization cannot "
                        "adopt token rows; config rejects the combination)"
                    )

                def impl(kc, vc, scales, li, k, v, slots):
                    if bits == 4:
                        return quant_ops.store_kv_quant_layer_u4(
                            kc, vc, scales, li, k, v, slots
                        )
                    return quant_ops.store_kv_quant_layer(
                        kc, vc, scales, li, k, v, slots
                    )
            else:
                def impl(kc, vc, scales, li, k, v, slots):
                    kc, vc = attn_ops.store_kv_layer(
                        kc, vc, li, k, v, slots
                    )
                    return kc, vc, scales
            fn = jax.jit(impl, donate_argnums=(0, 1, 2))
            self._fn_cache[key] = fn
        cli = 0 if self.config.global_kv_pool else layer_idx
        self.k_cache, self.v_cache, self.kv_scales = fn(
            self.k_cache, self.v_cache, self.kv_scales,
            jnp.asarray(cli, jnp.int32), k_rows, v_rows, slots,
        )

    # ---------------------------------------------------- device placement

    def _dev(self, x):
        """Host array -> device, replicated over the mesh when present."""
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel.mesh import replicated

        return jax.device_put(np.asarray(x), replicated(self.mesh))

    def _fetch(self, arr) -> np.ndarray:
        """Device -> host for step OUTPUTS (sampled tokens, logprobs).

        Under a MULTI-PROCESS mesh (jax.distributed: one controller per
        host, SURVEY §7 stage 8) a data-sharded output has non-addressable
        shards on every host; all-gather it so each host's engine loop
        sees the full batch and takes identical scheduling decisions —
        the multi-host determinism contract (every host runs the same
        schedule; reference model_runner.py SHM RPC is replaced by
        same-program-everywhere)."""
        if jax.process_count() > 1 and self.mesh is not None:
            # ONE jitted replicating identity reused across steps: a
            # fresh jax.jit per call would recompile the cross-host
            # all-gather for every output array of every dispatch
            # (ADVICE r4 medium), re-adding the per-step compile latency
            # the megastep design exists to remove. The single jit
            # object caches per input aval, so tokens + logprob arrays
            # each compile once.
            fetch = self.__dict__.get("_fetch_replicate_jit")
            if fetch is None:
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(self.mesh, PartitionSpec())
                fetch = jax.jit(lambda a: a, out_shardings=rep)
                self._fetch_replicate_jit = fetch
            arr = fetch(arr)
        return np.asarray(arr)

    def _put_plan(self, plan: dict, phase: str) -> dict:
        """Host step plan -> device (DP batch-sharded under a mesh)."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in plan.items()}
        from ..parallel.mesh import put_plan

        return put_plan(self.mesh, plan, phase)

    # --------------------------------------------------------------- buckets

    @property
    def _dp_size(self) -> int:
        return 1 if self.mesh is None else int(self.mesh.shape.get("data", 1))

    def _prefill_buckets(self, b: int, s: int, max_ctx_tokens: int):
        # batch bucket is a multiple of the data axis so step plans
        # genuinely shard over DP (VERDICT r3 weak#4: bs-1/odd-batch plans
        # silently lost the data axis behind a replication-warning wall);
        # padded lanes carry out-of-range rows and drop their writes.
        # pow2 rounding alone only guarantees divisibility for pow2 data
        # axes — round up to an explicit dp multiple for e.g. dp=3
        # (ADVICE r4 low #2).
        dp = self._dp_size
        bb = -(-_round_up_pow2(max(b, dp)) // dp) * dp
        sb = min(
            _round_up_pow2(s, lo=min(16, self.config.chunk_prefill_size)),
            max(self.config.chunk_prefill_size, s),
        )
        # prefill context buckets are PURE powers of two, unlike decode's
        # interleaved {2^n, 1.5*2^n}: a long chunked prefill walks the
        # context upward, and every distinct bucket is a fresh XLA compile
        # (60-120 s through the TPU tunnel) — 5 buckets cover 128K vs 9
        # interleaved, for <=33% average page over-stream on a path that is
        # compile-dominated anyway.
        base = max(
            self.config.decode_context_bucket_base // self.config.page_size,
            1,
        )
        pages = max(-(-max_ctx_tokens // self.config.page_size), 1)
        mp = min(
            _round_up_pow2(pages, lo=base), self.config.max_pages_per_seq
        )
        if not self.config.decode_bucketed_jit:
            # "eager": exact shapes, one compile per distinct step shape
            # (the debug reference point for bucketed-vs-eager parity —
            # reference compare_decode_graph_eager_logits.py); batch still
            # pads to the data axis so eager plans shard identically.
            bb, mp = -(-b // self._dp_size) * self._dp_size, pages
        return bb, sb, mp

    def _decode_buckets(self, b: int, max_ctx_pages: int):
        dp = self._dp_size
        if not self.config.decode_bucketed_jit:
            return -(-b // dp) * dp, max(max_ctx_pages, 1)
        # explicit dp-multiple round-up: pow2 buckets only divide pow2
        # data axes (ADVICE r4 low #2)
        bb = -(-self.config.batch_bucket(max(b, dp)) // dp) * dp
        mp = self.config.context_bucket_pages(max(max_ctx_pages, 1))
        return bb, mp

    # ------------------------------------------------------------- step fns

    def _get_prefill_fn(self, bb: int, sb: int, mp: int, mode: str,
                        nlp: int = -1, emit_obs: bool = True):
        key = ("prefill", bb, sb, mp, mode, nlp, emit_obs)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        spec, rt = self.spec, self._rt
        if not emit_obs and rt.emit_prefill_scores:
            # observation scores only matter on a sequence's FINAL chunk
            # (SnapKV scores = last-W queries of the PROMPT); intermediate
            # chunks skip the two-pass blockwise score sweep entirely
            import dataclasses

            rt = dataclasses.replace(rt, emit_prefill_scores=False)

        def step(params, kc, vc, meta, scales, tables, plan, rope):
            # rope rides as an ARGUMENT: closed-over tables are baked into
            # the HLO as constants — 67 MB of cos/sin per jit bucket, which
            # bloats the persistent-cache entries to 100+ MB and slows the
            # (remote) compile. Same for every step fn below.
            # per-layer tables + on-device dest derivation: layer page IDs
            # diverge once deltakv splices / pyramidkv compacts free pages
            # on a subset of layers (see prefill_forward docstring).
            kc, vc, last_h, obs, meta, scales = tfm.prefill_forward(
                params, kc, vc, plan, rope, spec=spec, rt=rt,
                quest_meta=meta, kv_scales=scales, tables=tables, mp=mp,
            )
            logits = tfm.compute_logits(params, last_h, spec)
            key = jax.random.fold_in(self._base_key, plan["step"])
            tokens = sampler_ops.sample(
                logits, plan["temps"], plan["top_k"], plan["top_p"], key,
                mode=mode,
            )
            lps = (sampler_ops.token_logprobs(logits, tokens, nlp)
                   if nlp >= 0 else None)
            return kc, vc, meta, scales, tokens, obs, lps

        donate = [1, 2]
        if rt.quest:
            donate.append(3)
        if rt.kv_quant:
            donate.append(4)
        fn = jax.jit(step, donate_argnums=tuple(donate))
        self._fn_cache[key] = fn
        logger.info("compiled prefill step bucket B=%d S=%d MP=%d", bb, sb, mp)
        return fn

    def _get_decode_fn(self, bb: int, mp: int, k: int, mode: str,
                       mpr: int = 0, nlp: int = -1):
        key = ("decode", bb, mp, k, mode, mpr, nlp)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        spec, rt = self.spec, self._rt
        is_full = self._is_full_layer
        sparse_slot = self._sparse_slot

        group_ids = (jnp.asarray(self._group_ids)
                     if rt.dk_recon else None)

        def megastep(params, kc, vc, meta, scales, qcache, dk, dk_comp,
                     dkrc, tables, plan, rope):
            """k decode steps in one dispatch: sampled tokens feed back on
            device (lax.scan over steps); ONE token transfer per dispatch.
            This is the TPU answer to per-step CUDA-graph replay + the
            host round-trip it implies (reference decode_cuda_graph.py)."""
            base_key = jax.random.fold_in(self._base_key, plan["step"])

            def body(carry, t):
                kc, vc, meta, scales, qcache, dkrc, tok = carry
                p = {
                    "token_ids": tok,
                    "positions": plan["positions0"] + t,
                    "row_ids": plan["row_ids"],
                    "dest_slot": plan["dest"][:, :, t],
                    "ctx_lens": plan["ctx_start"] + t + 1,
                }
                if rt.record_queries:
                    p["qslot"] = (plan["qslot0"] + t) % qcache.shape[2]
                if rt.deltakv:
                    p["comp_counts"] = plan["comp_counts"]
                (kc, vc, h, meta, scales, qcache,
                 dkrc) = tfm.decode_forward(
                    params, kc, vc, tables, p, rope,
                    spec=spec, rt=rt, mp_bucket=mp, is_full_layer=is_full,
                    quest_meta=meta, kv_scales=scales, query_cache=qcache,
                    steer_vec=self.steer_vec, dk=dk, dk_comp=dk_comp,
                    sparse_slot=sparse_slot, mpr_sparse=mpr,
                    dk_recon=dkrc, group_ids=group_ids,
                )
                logits = tfm.compute_logits(params, h, spec)
                tok2 = sampler_ops.sample(
                    logits, plan["temps"], plan["top_k"], plan["top_p"],
                    jax.random.fold_in(base_key, t), mode=mode,
                )
                ys = tok2
                if nlp >= 0:
                    ys = (tok2,) + sampler_ops.token_logprobs(
                        logits, tok2, nlp)
                return (kc, vc, meta, scales, qcache, dkrc, tok2), ys

            (kc, vc, meta, scales, qcache, dkrc, _), toks = jax.lax.scan(
                body,
                (kc, vc, meta, scales, qcache, dkrc, plan["token_ids0"]),
                jnp.arange(k, dtype=jnp.int32),
            )
            # [k, B] (+ lp ys)
            return kc, vc, meta, scales, qcache, dkrc, toks

        donate = [1, 2]
        if rt.quest:
            donate.append(3)
        if rt.kv_quant:
            donate.append(4)
        if rt.record_queries:
            donate.append(5)
        if rt.dk_recon:
            donate.append(8)
        fn = jax.jit(megastep, donate_argnums=tuple(donate))
        self._fn_cache[key] = fn
        logger.info("compiled decode megastep bucket B=%d MP=%d k=%d",
                    bb, mp, k)
        return fn

    # ----------------------------------------------------------------- runs

    @staticmethod
    def _pad(arr: np.ndarray, shape: tuple[int, ...], fill=0) -> np.ndarray:
        out = np.full(shape, fill, arr.dtype)
        sl = tuple(slice(0, s) for s in arr.shape)
        out[sl] = arr
        return out

    def _sampling_arrays(self, seqs, bb: int):
        """Per-seq sampling arrays + the static sampler fast-path mode
        (layers/sampler.py): part of the jit cache key."""
        temps = np.zeros(bb, np.float32)
        top_k = np.zeros(bb, np.int32)
        top_p = np.ones(bb, np.float32)
        for i, s in enumerate(seqs):
            sp = s.sampling_params
            temps[i] = sp.temperature
            top_k[i] = sp.top_k
            top_p[i] = sp.top_p
        if np.all(temps == 0.0):
            mode = "greedy"
        elif np.all(top_k == 0) and np.all(top_p >= 1.0):
            mode = "temp_only"
        else:
            mode = "full"
        # static logprobs bucket (jit key): -1 = disabled; else the max
        # requested top-N across the batch, bucketed to multiples of 5 so a
        # mixed batch doesn't fragment the jit cache.
        nlp = -1
        for s in seqs:
            lp = s.sampling_params.logprobs
            if lp is not None:
                nlp = max(nlp, int(lp))
        if nlp > 0:
            nlp = -(-nlp // 5) * 5
        return temps, top_k, top_p, mode, nlp

    def run_prefill(
        self,
        seqs,
        chunk_sizes: list[int],
        dests: list[np.ndarray],  # per-seq layer-shared dest slots
        row_ids: np.ndarray,
        ctx_lens_tokens: np.ndarray,  # [B] resident tokens incl. this chunk
        emit_obs: bool = True,
    ):
        """Returns (sampled_tokens [B] np, obs_scores device or None)."""
        b = len(seqs)
        s = max(chunk_sizes)
        max_ctx = int(ctx_lens_tokens.max())
        bb, sb, mp = self._prefill_buckets(b, s, max_ctx)

        token_ids = np.zeros((bb, sb), np.int32)
        positions = np.zeros((bb, sb), np.int32)
        slot_positions = np.zeros((bb, sb), np.int32)
        dest = np.full((bb, sb), -1, np.int32)
        new_lens = np.zeros(bb, np.int32)
        ctx = np.zeros(bb, np.int32)
        for i, (seq, c) in enumerate(zip(seqs, chunk_sizes)):
            start = seq.num_prefilled_tokens
            token_ids[i, :c] = seq.prompt_token_ids[start : start + c]
            positions[i, :c] = np.arange(start, start + c)
            # RESIDENT slot positions for this chunk: after a mid-prefill
            # eviction (streamingllm window between chunks) the page table
            # is compacted, so a token's LOGICAL position no longer equals
            # its table-slot position — deriving store pages from logical
            # positions scattered chunk KV into never-assigned pages
            # (measured: recall 0.00 at depth 0.9 with a window that
            # retains the needle). RoPE keeps the logical positions.
            slot_positions[i, :c] = np.arange(
                ctx_lens_tokens[i] - c, ctx_lens_tokens[i]
            )
            dest[i, :c] = dests[i]
            new_lens[i] = c
            ctx[i] = ctx_lens_tokens[i]
        temps, top_k, top_p, mode, nlp = self._sampling_arrays(seqs, bb)
        host_plan = {
            "token_ids": token_ids,
            "positions": positions,
            "slot_positions": slot_positions,
            "dest_slot": dest,
            # padded lanes get an out-of-range row: row-keyed scatters
            # (query ring, recurrent state) drop, gathers clamp harmlessly
            "row_ids": self._pad(row_ids, (bb,), fill=self.max_rows),
            "ctx_lens": ctx,
            "new_lens": new_lens,
            "step": np.asarray(self._step_counter, np.int32),
            "temps": temps, "top_k": top_k, "top_p": top_p,
        }
        if any(getattr(s, "mm_features", None) is not None for s in seqs):
            # multimodal splice rows for THIS chunk (image placeholders may
            # straddle chunk boundaries; mm_positions is sorted, so the
            # chunk's rows are a contiguous feature slice). Plans without
            # these keys are a different pytree structure — jit keeps a
            # separate text-only trace, so text batches pay nothing.
            hidden = self.params["embed"].shape[-1]
            mm_mask = np.zeros((bb, sb), bool)
            mm_embeds = np.zeros((bb, sb, hidden), np.float32)
            for i, (seq, c) in enumerate(zip(seqs, chunk_sizes)):
                if getattr(seq, "mm_features", None) is None:
                    continue
                start = seq.num_prefilled_tokens
                pos = seq.mm_positions
                lo = int(np.searchsorted(pos, start))
                hi = int(np.searchsorted(pos, start + c))
                if hi > lo:
                    rel = pos[lo:hi] - start
                    mm_mask[i, rel] = True
                    mm_embeds[i, rel] = seq.mm_features[lo:hi]
            host_plan["mm_mask"] = mm_mask
            host_plan["mm_embeds"] = mm_embeds
        if self._rt.quest:
            # pages whose K min/max metadata this chunk dirties
            # (padded entries hit trash page 0 — harmless recompute).
            p = self.config.page_size
            tp = np.zeros((bb, sb // p + 1), np.int32)
            for i in range(b):
                pages = np.unique(dests[i] // p)
                tp[i, : len(pages)] = pages
            host_plan["touched_pages"] = tp
        plan = self._put_plan(host_plan, "prefill")
        self._step_counter += 1
        fn = self._get_prefill_fn(bb, sb, mp, mode, nlp, emit_obs)
        with profiler.record("prefill_step"):
            (self.k_cache, self.v_cache, self.quest_meta, self.kv_scales,
             tokens, obs, lps) = fn(
                self.params, self.k_cache, self.v_cache, self.quest_meta,
                self.kv_scales, self.tables, plan, self.rope,
            )
        self.last_logprobs = None
        if lps is not None:
            lp, tids, tlps = lps
            self.last_logprobs = {
                "lp": self._fetch(lp)[:b],  # [B]
                "top_ids": self._fetch(tids)[:b],  # [B, N]
                "top_lps": self._fetch(tlps)[:b],
            }
        return self._fetch(tokens)[:b], obs

    # ------------------------------------------------- staged long prefill

    def _get_staged_prefill_fn(self, sb: int, mp: int, mode: str,
                               nlp: int = -1, emit_obs: bool = True):
        """Mixed-precision staged prefill step (bs=1): quantize+store the
        chunk into the staging pool, run attention in bf16 as an
        online-softmax ``lax.scan`` over chunk-sized KV BLOCKS, each
        dequantized into a bounded scratch. This sidesteps BOTH the
        in-kernel int4 dequant VMEM cliff (PERF_NOTES #3/#4 — int4 prefill
        ran at ~13% MFU) and the whole-context dequant scratch of the
        first staged design (0.6+ GiB transient at 128K, which tipped the
        16 GiB chip into OOM next to the weights+staging+keep pools): peak
        extra memory is one KV block (~35 MB) + one score tile, at any
        context length. QK/PV einsums run in the model dtype with f32
        accumulation (bf16 operands hit the MXU native rate).

        The current chunk's block uses its EXACT bf16 K/V (chunk starts
        are block-aligned: chunk_prefill_size is validated pow2 for staged
        engines); earlier blocks read back quantized. Staging arrays are
        scan-INVARIANT: the chunk's quantized payload + scales emit as
        scan ys and ONE batched scatter writes them after the layer scan
        (an in-scan write read back by the gather would force a whole-pool
        copy per layer — the PERF_NOTES #1 aliasing hazard). SnapKV
        observation scores run AFTER that write as the exact two-pass
        blockwise op over the staging pool itself
        (ref.prefill_obs_scores_blockwise), per layer."""
        key = ("prefill_staged", sb, mp, mode, nlp, emit_obs)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        spec, rt = self.spec, self._rt
        cfg = self.config
        sd = cfg.kv_staging_dtype
        p = cfg.page_size
        nkv, dh = spec.num_kv_heads, spec.head_dim
        fdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                  "float16": jnp.float16}[cfg.dtype]
        sm_scale = dh ** -0.5
        obs_w = cfg.snapkv_obs_window if (
            emit_obs and rt.emit_prefill_scores) else 0

        g = spec.gqa_groups
        # q-tile rows: 512 measured best at 3B shapes (each tile's QK is a
        # [g*qb, dh] x [dh, sb] MXU matmul per kv head; 256 under-fills the
        # MXU M dim, 1024 doubles the f32 score transient for no gain).
        # Env override for scripts/profile_prefill_staged.py sweeps.
        qb = min(int(os.environ.get("SPARSEVLLM_STAGED_QB", "512")), sb)
        bpb = sb // p  # staging pages per KV block (chunk-sized blocks)
        nblk = (mp * p) // sb

        def step(params, ks, vs, ssc, tables, plan, rope):
            cos, sin = rope
            tokens = plan["token_ids"]  # [1, S]
            positions = plan["positions"]
            h = params["embed"][tokens]
            row = plan["row_ids"]  # [1]
            # layers are lockstep pre-compaction: layer 0's table row is
            # representative (asserted in kv_manager.alloc_prefill)
            pages_row = tables[0][row[0], :mp]  # [MP] staging page ids
            start = plan["chunk_start"]  # scalar: resident slot start
            ctx_end = plan["ctx_lens"][0]  # start + new_len

            def body(carry, xs):
                h = carry
                li = xs["_layer_idx"]
                x = tfm.rms_norm(h, xs["input_norm"], spec.rms_norm_eps)
                q, k, v = tfm._qkv(x, xs, spec)
                q = apply_rope(q, positions, cos, sin)
                k = apply_rope(k, positions, cos, sin)
                kr = k.reshape(-1, nkv, dh)
                vr = v.reshape(-1, nkv, dh)
                ks_l = jax.lax.dynamic_index_in_dim(ks, li, 0, False)
                vs_l = jax.lax.dynamic_index_in_dim(vs, li, 0, False)
                if sd == "int4":
                    kq, ksc, kzr = quant_ops.quantize_rows_u4(kr)
                    vq, vsc, vzr = quant_ops.quantize_rows_u4(vr)
                    store = (kq.reshape(sb, -1), vq.reshape(sb, -1),
                             ksc, vsc, kzr, vzr)
                    sc_l = jax.lax.dynamic_index_in_dim(ssc, li, 1, False)
                elif sd == "int8":
                    kq, ksc = quant_ops.quantize_rows(kr)
                    vq, vsc = quant_ops.quantize_rows(vr)
                    store = (kq, vq, ksc, vsc)
                    sc_l = jax.lax.dynamic_index_in_dim(ssc, li, 1, False)
                else:  # bf16 staging
                    store = (kr.astype(fdtype), vr.astype(fdtype))
                    sc_l = None

                def block_kv(bi):
                    """Dequantize KV block ``bi`` (bpb staging pages)."""
                    pages_b = jax.lax.dynamic_slice(
                        pages_row, (bi * bpb,), (bpb,))
                    if sd == "int4":
                        kb = quant_ops.gather_dequant_pages_u4(
                            ks_l, sc_l[0], sc_l[2], pages_b, nkv, fdtype)
                        vb = quant_ops.gather_dequant_pages_u4(
                            vs_l, sc_l[1], sc_l[3], pages_b, nkv, fdtype)
                    elif sd == "int8":
                        kb = quant_ops.gather_dequant_pages(
                            ks_l, sc_l[0], pages_b, fdtype)
                        vb = quant_ops.gather_dequant_pages(
                            vs_l, sc_l[1], pages_b, fdtype)
                    else:
                        kb = ks_l[pages_b].astype(fdtype)
                        vb = vs_l[pages_b].astype(fdtype)
                    return (kb.reshape(sb, nkv, dh),
                            vb.reshape(sb, nkv, dh))

                def _attn_mlp(h, x, out, xs):
                    attn_out = out.reshape(1, sb, spec.q_dim) @ tfm._w(
                        xs, "wo", (spec.q_dim, spec.hidden_size), x.dtype
                    )
                    h = h + attn_out
                    x2 = tfm.rms_norm(
                        h, xs["post_attn_norm"], spec.rms_norm_eps
                    )
                    return h + tfm._ffn(x2, xs, spec, rt.moe_dispatch)

                if rt.impl == "pallas":
                    # slab-combine flash path (ops/slab_flash.py): each
                    # past slab dequantizes ONCE and runs the bundled
                    # dense flash kernel (68% MFU measured on v5e vs
                    # 6.5-9% for the XLA block-scan below, which stays as
                    # the CPU/interpret fallback for tests and dryruns).
                    from ..ops import slab_flash

                    def dequant_slab(bi):
                        kb, vb = block_kv(bi)
                        return (kb.transpose(1, 0, 2),
                                vb.transpose(1, 0, 2))

                    out = slab_flash.staged_slab_attention(
                        q.reshape(sb, nkv * g, dh),
                        kr.astype(fdtype), vr.astype(fdtype),
                        dequant_slab, start,
                        nblk=nblk, sb=sb, nkv=nkv, groups=g,
                        sm_scale=sm_scale,
                    ).reshape(sb, nkv, g, dh)
                    if obs_w:
                        o0 = jnp.maximum(plan["new_lens"][0] - obs_w, 0)
                        q_obs = jax.lax.dynamic_slice(
                            q, (0, o0, 0, 0),
                            (1, obs_w, spec.num_q_heads, dh))
                        return _attn_mlp(h, x, out, xs), (q_obs, store)
                    return _attn_mlp(h, x, out, xs), (None, store)

                # online-softmax over KV blocks; GQA-grouped einsums avoid
                # materializing repeated KV heads
                q4 = q.reshape(sb, nkv, g, dh)
                acc0 = jnp.zeros((sb, nkv, g, dh), jnp.float32)
                m0 = jnp.full((sb, nkv, g), NEG_INF, jnp.float32)
                l0 = jnp.zeros((sb, nkv, g), jnp.float32)

                def kv_block(carry2, bi):
                    base = bi * sb

                    def live(c):
                        acc, m, l = c
                        kb, vb = jax.lax.cond(
                            base == start,
                            lambda _: (kr.astype(fdtype),
                                       vr.astype(fdtype)),
                            lambda _: block_kv(bi),
                            None,
                        )
                        kpos = base + jnp.arange(sb, dtype=jnp.int32)

                        def qtile(c3, qi):
                            acc, m, l = c3
                            qs = jax.lax.dynamic_slice(
                                q4, (qi * qb, 0, 0, 0), (qb, nkv, g, dh))
                            st = jnp.einsum(
                                "qngd,knd->qngk", qs, kb,
                                preferred_element_type=jnp.float32,
                            ) * sm_scale  # [qb, nkv, g, sb]
                            qpos = (start + qi * qb
                                    + jnp.arange(qb, dtype=jnp.int32))
                            valid = (
                                (kpos[None, :] <= qpos[:, None])
                                & (kpos[None, :] < ctx_end)
                            )[:, None, None, :]
                            st = jnp.where(valid, st, NEG_INF)
                            ms = jax.lax.dynamic_slice(
                                m, (qi * qb, 0, 0), (qb, nkv, g))
                            ls = jax.lax.dynamic_slice(
                                l, (qi * qb, 0, 0), (qb, nkv, g))
                            accs = jax.lax.dynamic_slice(
                                acc, (qi * qb, 0, 0, 0), (qb, nkv, g, dh))
                            m_new = jnp.maximum(ms, jnp.max(st, axis=-1))
                            alpha = jnp.exp(ms - m_new)
                            pj = jnp.exp(st - m_new[..., None])
                            pj = jnp.where(valid, pj, 0.0)
                            pv = jnp.einsum(
                                "qngk,knd->qngd", pj.astype(vb.dtype), vb,
                                preferred_element_type=jnp.float32,
                            )
                            accs = accs * alpha[..., None] + pv
                            ls = ls * alpha + jnp.sum(pj, axis=-1)
                            acc = jax.lax.dynamic_update_slice(
                                acc, accs, (qi * qb, 0, 0, 0))
                            m = jax.lax.dynamic_update_slice(
                                m, m_new, (qi * qb, 0, 0))
                            l = jax.lax.dynamic_update_slice(
                                l, ls, (qi * qb, 0, 0))
                            return (acc, m, l), None

                        (acc, m, l), _ = jax.lax.scan(
                            qtile, (acc, m, l),
                            jnp.arange(sb // qb, dtype=jnp.int32))
                        return acc, m, l

                    # skip blocks past the context (bucket mp rounds up)
                    out_c = jax.lax.cond(
                        base < ctx_end, live, lambda c: c, carry2)
                    return out_c, None

                (acc, m, l), _ = jax.lax.scan(
                    kv_block, (acc0, m0, l0),
                    jnp.arange(nblk, dtype=jnp.int32))
                l_safe = jnp.where(l <= 0.0, 1.0, l)
                out = (acc / l_safe[..., None]).astype(fdtype)

                h = _attn_mlp(h, x, out, xs)
                if obs_w:
                    # last obs_w valid queries (post-RoPE), for the obs
                    # sweep AFTER the staging write
                    o0 = jnp.maximum(plan["new_lens"][0] - obs_w, 0)
                    q_obs = jax.lax.dynamic_slice(
                        q, (0, o0, 0, 0), (1, obs_w, spec.num_q_heads, dh))
                    return h, (q_obs, store)
                return h, (None, store)

            h, (q_obs_all, stores) = jax.lax.scan(
                body, h, tfm._layer_xs(params, spec)
            )
            # ONE batched staging write for the whole step (all layers)
            dest = plan["dest_slot"].reshape(-1)  # [S]
            page = jnp.where(dest >= 0, dest // p, -1)
            off = dest % p
            l_num = spec.num_layers
            lix = jnp.broadcast_to(
                jnp.arange(l_num, dtype=jnp.int32)[:, None], (l_num, sb)
            )
            pgb = jnp.broadcast_to(page[None, :], (l_num, sb))
            offb = jnp.broadcast_to(off[None, :], (l_num, sb))
            ks = ks.at[lix, pgb, offb].set(stores[0], mode="drop")
            vs = vs.at[lix, pgb, offb].set(stores[1], mode="drop")
            if sd != "bfloat16":
                for i, plane in enumerate(stores[2:]):
                    ssc = ssc.at[i, lix, pgb, :, offb].set(
                        plane.astype(ssc.dtype), mode="drop")
            obs = None
            if obs_w:
                # exact two-pass blockwise SnapKV scores over the (just
                # written) staging pool, per layer. Passing S=obs_w with
                # new_lens=min(new,w) keeps query absolute positions
                # (ctx - new + i) aligned with the tail of the chunk.
                new_w = jnp.minimum(plan["new_lens"], obs_w)

                def obs_layer(_, xs2):
                    li2, q_obs_l = xs2
                    ks_l2 = jax.lax.dynamic_index_in_dim(ks, li2, 0, False)
                    lsc = (None if sd == "bfloat16" else
                           jax.lax.dynamic_index_in_dim(ssc, li2, 1, False))
                    sc_ = ref_ops.prefill_obs_scores_blockwise(
                        q_obs_l, ks_l2, pages_row[None], plan["ctx_lens"],
                        new_w, sm_scale=sm_scale, obs_window=obs_w,
                        score_pooling=rt.score_pooling, kv_scales=lsc,
                    )
                    return None, sc_

                _, obs = jax.lax.scan(
                    obs_layer, None,
                    (jnp.arange(l_num, dtype=jnp.int32), q_obs_all),
                )
            hf = tfm.rms_norm(h, params["final_norm"], spec.rms_norm_eps)
            last_idx = jnp.maximum(plan["new_lens"] - 1, 0)
            last_h = jnp.take_along_axis(
                hf, last_idx[:, None, None], axis=1
            ).squeeze(1)
            logits = tfm.compute_logits(params, last_h, spec)
            key2 = jax.random.fold_in(self._base_key, plan["step"])
            toks = sampler_ops.sample(
                logits, plan["temps"], plan["top_k"], plan["top_p"], key2,
                mode=mode,
            )
            lps = (sampler_ops.token_logprobs(logits, toks, nlp)
                   if nlp >= 0 else None)
            return ks, vs, ssc, toks, obs, lps

        fn = jax.jit(step, donate_argnums=(1, 2, 3))
        self._fn_cache[key] = fn
        logger.info("compiled STAGED prefill bucket S=%d MP=%d", sb, mp)
        return fn

    def run_prefill_staged(
        self, seqs, chunk_sizes, dests, row_ids, ctx_lens_tokens,
        emit_obs: bool = True,
    ):
        """Staged-pool chunk prefill (bs=1; scheduler isolates staged seqs).
        Same contract as run_prefill: returns (tokens [1] np, obs)."""
        assert len(seqs) == 1, "staged prefill runs bs=1"
        seq, chunk = seqs[0], chunk_sizes[0]
        ctx = int(ctx_lens_tokens[0])
        start = ctx - chunk
        _, sb, _ = self._prefill_buckets(1, chunk, 1)
        mp = min(
            _round_up_pow2(
                -(-max(ctx, start + sb) // self.config.page_size),
                lo=max(self.config.decode_context_bucket_base
                       // self.config.page_size, 1),
            ),
            self.config.max_pages_per_seq,
        )
        token_ids = np.zeros((1, sb), np.int32)
        token_ids[0, :chunk] = seq.prompt_token_ids[start : start + chunk]
        positions = np.arange(start, start + sb, dtype=np.int32)[None]
        dest = np.full((1, sb), -1, np.int32)
        dest[0, :chunk] = dests[0]
        temps, top_k, top_p, mode, nlp = self._sampling_arrays(seqs, 1)
        host_plan = {
            "token_ids": token_ids,
            "positions": positions,
            "dest_slot": dest,
            "row_ids": np.asarray(row_ids, np.int32),
            "ctx_lens": np.asarray([ctx], np.int32),
            "new_lens": np.asarray([chunk], np.int32),
            "chunk_start": np.asarray(start, np.int32),
            "step": np.asarray(self._step_counter, np.int32),
            "temps": temps, "top_k": top_k, "top_p": top_p,
        }
        plan = self._put_plan(host_plan, "prefill")
        self._step_counter += 1
        fn = self._get_staged_prefill_fn(sb, mp, mode, nlp, emit_obs)
        with profiler.record("staged_prefill_step"):
            (self.k_stage, self.v_stage, self.stage_scales,
             tokens, obs, lps) = fn(
                self.params, self.k_stage, self.v_stage, self.stage_scales,
                self.tables, plan, self.rope,
            )
        self.last_logprobs = None
        if lps is not None:
            lp, tids, tlps = lps
            self.last_logprobs = {
                "lp": self._fetch(lp)[:1],
                "top_ids": self._fetch(tids)[:1],
                "top_lps": self._fetch(tlps)[:1],
            }
        return self._fetch(tokens)[:1], obs

    def compact_rows_staged(self, plan: dict, obs_scores) -> None:
        """Prefill-end compaction OUT of the staging pool: top-k select over
        obs scores, gather+DEQUANTIZE kept tokens from staging, scatter bf16
        rows into fresh MAIN-pool pages, rewrite device table rows. The
        staging pages become free (manager returns them to the staging
        stack) and decode runs the full-speed bf16 path."""
        rows = self._dev(plan["rows"])
        ctx = self._dev(plan["ctx"])
        keep = self._dev(plan["keep"])
        new_pages = self._dev(plan["new_pages"])
        batch_idx = self._dev(plan["batch_idx"])
        w = int(plan["obs_window"])
        kt = int(plan["keep"].max())
        sd = self.config.kv_staging_dtype
        key = ("compact_staged", obs_scores.shape, new_pages.shape, kt, w)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    _staged_compact_impl, obs_window=w, keep_max=kt,
                    page_size=self.config.page_size, staging=sd,
                ),
                donate_argnums=(3, 4, 5),
            )
            self._fn_cache[key] = fn
            logger.info("compiled staged compact op %s", key)
        with profiler.record("compact_staged"):
            self.k_cache, self.v_cache, self.tables = fn(
                self.k_stage, self.v_stage, self.stage_scales,
                self.k_cache, self.v_cache, self.tables,
                obs_scores, batch_idx, rows, ctx, keep, new_pages,
            )

    def run_decode(
        self,
        seqs,
        dest_slots: np.ndarray,  # [L, B, k]
        ctx_start: np.ndarray,  # [L, B] resident length BEFORE this megastep
        row_ids: np.ndarray,  # [B]
        comp_counts: np.ndarray | None = None,  # [B] (deltakv)
    ):
        """k-step decode megastep; returns sampled tokens [B, k] (host)."""
        b = len(seqs)
        l = self.spec.num_layers
        k = dest_slots.shape[2]
        max_ctx = int(ctx_start.max()) + k
        max_pages = -(-max_ctx // self.config.page_size)
        bb, mp = self._decode_buckets(b, max_pages)

        token_ids = np.zeros(bb, np.int32)
        positions = np.zeros(bb, np.int32)
        for i, seq in enumerate(seqs):
            token_ids[i] = (
                seq.completion_token_ids[-1]
                if seq.completion_token_ids
                else seq.prompt_token_ids[-1]
            )
            positions[i] = seq.num_tokens - 1
        temps, top_k, top_p, mode, nlp = self._sampling_arrays(seqs, bb)
        host_plan = {
            "token_ids0": token_ids,
            "positions0": positions,
            "row_ids": self._pad(row_ids, (bb,), fill=self.max_rows),
            "dest": self._pad(dest_slots, (l, bb, k), fill=-1),
            "ctx_start": self._pad(ctx_start, (l, bb)),
            "step": np.asarray(self._step_counter, np.int32),
            "temps": temps, "top_k": top_k, "top_p": top_p,
        }
        if self._rt.record_queries:
            qc_size = self.query_cache.shape[2]
            qs = np.zeros(bb, np.int32)
            for i, seq in enumerate(seqs):
                qs[i] = seq.num_completion_tokens % qc_size
            host_plan["qslot0"] = qs
        if self._rt.deltakv:
            host_plan["comp_counts"] = self._pad(
                np.asarray(comp_counts, np.int32), (bb,)
            )
        plan = self._put_plan(host_plan, "decode")
        self._step_counter += 1
        mpr = 0
        if self._rt.deltakv:
            # raw-pages bucket for sparse rows (sink + recent + decode tail)
            sparse_max = int(ctx_start[self._dk_sparse_layers].max()) + k
            mpr = min(
                self.config.context_bucket_pages(
                    max(-(-sparse_max // self.config.page_size), 1)
                ),
                mp,
            )
        fn = self._get_decode_fn(bb, mp, k, mode, mpr, nlp)
        with profiler.record("decode_step"):
            (self.k_cache, self.v_cache, self.quest_meta, self.kv_scales,
             self.query_cache, self.dk_recon, ys) = fn(
                self.params, self.k_cache, self.v_cache, self.quest_meta,
                self.kv_scales, self.query_cache, self.dk_state,
                self.dk_comp, self.dk_recon, self.tables, plan, self.rope,
            )
        self.last_logprobs = None
        if nlp >= 0:
            tokens, lp, tids, tlps = ys
            tokens.copy_to_host_async()
            self.last_logprobs = {
                "lp": self._fetch(lp).T[:b],  # [B, k]
                "top_ids": self._fetch(tids).transpose(1, 0, 2)[:b],
                "top_lps": self._fetch(tlps).transpose(1, 0, 2)[:b],
            }
        else:
            tokens = ys
            tokens.copy_to_host_async()
        return self._fetch(tokens).T[:b]  # [B, k]

    # ---------------------------------------------------- deltakv compression

    def _get_dk_compress_fn(self, b: int, cb: int, mp: int):
        """Jitted prefill-end compression over all sparse layers
        (ops/deltakv.compress_layer; reference deltakv_base full-prefill plan
        :344-399 + compressor-down + latent store)."""
        key = ("dk_compress", b, cb, mp)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        from ..ops import attention_ref as ref_ops
        from ..ops import deltakv as dk_ops
        from ..utils import compressor as comp_ops

        spec, rt = self.spec, self._rt
        base = rt.dk_comp_base
        stride = rt.dk_stride
        rot_dim = getattr(spec, "rotary_dim", 0)
        if rot_dim >= spec.head_dim:
            rot_dim = 0
        sparse_layers = jnp.asarray(self._dk_sparse_layers, jnp.int32)

        def compress(kc, vc, dk, dk_comp, win_pages, rows, counts,
                     dest_offset, kv_scales, rope):
            # win_pages [B, Cb/P]: THIS BLOCK's page window (host-sliced
            # from the sparse-layer table, which is lockstep across sparse
            # layers both pre-splice and post-splice). Gathering only the
            # window keeps the transient at O(Cb), not O(context): the
            # one-shot 128K compress materialized a [C, NCmax] f32 scoring
            # matrix (4.3 GiB) plus full-context f32 KV and OOM'd the chip.
            cos, sin = rope
            # ABSOLUTE positions shift by the already-compressed count
            # + block offset (= dest_offset) for blocks and the decode
            # tail alike.
            positions = (
                base + dest_offset[:, None]
                + jnp.arange(cb, dtype=jnp.int32)[None, :]
            )  # [B, Cb]

            def body(dk, si):
                li = sparse_layers[si]
                cli = li * 0 if getattr(rt, "global_pool", False) else li
                kcl = jax.lax.dynamic_index_in_dim(kc, cli, 0, False)
                vcl = jax.lax.dynamic_index_in_dim(vc, cli, 0, False)
                if kv_scales is not None:
                    lsc = jax.lax.dynamic_index_in_dim(kv_scales, cli, 1,
                                                       False)
                    if lsc.shape[0] == 4:
                        kg = ref_ops.gather_dequant_u4(
                            kcl, lsc[0], lsc[2], win_pages)
                        vg = ref_ops.gather_dequant_u4(
                            vcl, lsc[1], lsc[3], win_pages)
                    else:
                        kg = ref_ops.gather_dequant(kcl, lsc[0], win_pages)
                        vg = ref_ops.gather_dequant(vcl, lsc[1], win_pages)
                else:
                    kg = ref_ops.gather_pages(kcl, win_pages)  # [B,Nkv,Cb,Dh]
                    vg = ref_ops.gather_pages(vcl, win_pages)
                k_raw = kg.transpose(0, 2, 1, 3)
                v_raw = vg.transpose(0, 2, 1, 3)
                # stored K is post-RoPE; De-RoPE exactly before compressing
                # (reference stores pre-RoPE K, deltakv_base.py:681);
                # hybrid models invert only the partial rotary width
                k_raw = dk_ops.derope(k_raw, positions, cos, sin, rot_dim)
                comp_layer = comp_ops.layer_slice(dk_comp, si)
                dk = dk_ops.compress_layer(
                    dk, si, comp_layer, rt.dk_arch, k_raw, v_raw, rows,
                    counts, stride=stride, latent_bits=rt.dk_latent_bits,
                    latent_group=rt.dk_group, neighbors=rt.dk_nn,
                    dest_offset=dest_offset,
                )
                return dk, None

            dk, _ = jax.lax.scan(
                body, dk, jnp.arange(len(self._dk_sparse_layers),
                                     dtype=jnp.int32)
            )
            return dk

        fn = jax.jit(compress, donate_argnums=(2,))
        self._fn_cache[key] = fn
        logger.info("compiled deltakv compress op B=%d Cb=%d MP=%d",
                    b, cb, mp)
        return fn

    # largest per-block compress transient: [CB, NCmax] f32 scores +
    # [CB, io] f32 KV — ~300 MB at CB=8192 / 128K context (vs 4.3 GiB
    # one-shot, which OOM'd the chip at the first 128K deltakv bench)
    DK_COMPRESS_BLOCK = 8192

    def compress_prefill(self, plan: dict) -> None:
        b = len(plan["seqs"])
        counts = np.asarray(plan["counts"], np.int64)
        p = self.config.page_size
        stride = int(plan["stride"])
        align = int(np.lcm(p, stride))
        cb_full = max(
            (self.DK_COMPRESS_BLOCK // align) * align, align
        )
        total = int(counts.max())
        dest0 = plan.get("dest_offset")
        if dest0 is None:
            dest0 = np.zeros(b, np.int64)
        dest0 = np.asarray(dest0, np.int64)
        base = int(plan["comp_base"])
        kvm = self.kv_manager
        sl0 = int(self._dk_sparse_layers[0])
        rows = np.asarray(plan["rows"], np.int64)
        for off in range(0, total, cb_full):
            blk = np.clip(counts - off, 0, cb_full).astype(np.int32)
            if blk.max() <= 0:
                break
            cb = cb_full if total - off >= cb_full else max(
                -(-int(blk.max()) // align) * align, align
            )
            cbp = cb // p
            # block page window from the sparse-layer host table (source
            # of truth; lockstep across sparse layers — see compress fn)
            win = np.zeros((b, cbp), np.int32)
            for i, r in enumerate(rows):
                ps = (base + off) // p
                row_pages = kvm.page_tables[sl0, r, ps:ps + cbp]
                win[i, : len(row_pages)] = row_pages
            fn = self._get_dk_compress_fn(b, cb, 0)
            with profiler.record("dk_compress"):
                self.dk_state = fn(
                    self.k_cache, self.v_cache, self.dk_state,
                    self.dk_comp, self._dev(win), self._dev(rows),
                    self._dev(blk), self._dev(dest0 + off),
                    self.kv_scales, self.rope,
                )
        if self.dk_recon is not None:
            # invalidate the reconstruction cache for the compressed rows:
            # a fresh compression (dest 0) rewrites records; appends only
            # extend the table, but one full-rebuild step is cheap and the
            # blanket reset keeps the invariant trivially airtight
            self.dk_recon = dict(
                self.dk_recon,
                slot_tok=self.dk_recon["slot_tok"]
                .at[:, jnp.asarray(rows, jnp.int32)].set(-1),
            )

    def recompress_decode(self, plan: dict) -> None:
        """Decode-tail re-compression (reference: the LessMemory runtime
        re-compresses the growing raw tail; here the plan carries each
        sequence's current compressed count as the latent dest offset)."""
        self.compress_prefill(plan)

    # ------------------------------------------------------- rkv/skipkv evict

    def _get_rkv_score_fn(self, b: int, mp: int, ns: int):
        """Jitted retention-score op [L, B, K] (ops/rkv.py). ``ns`` > 0
        enables SkipKV sentence-mean pooling over ``ns`` sentence buckets."""
        key = ("rkv_score", b, mp, ns)
        fn = self._fn_cache.get(key)
        if fn is not None:
            return fn
        from ..ops import attention_ref as ref_ops
        from ..ops import rkv as rkv_ops

        spec = self.spec
        sm_scale = spec.head_dim ** -0.5
        p = self.config.page_size
        sink = self.config.num_sink_tokens
        w = self.config.rkv_redundancy_weight
        sim_thr = self.config.rkv_similarity_threshold
        sim_keep = self.config.rkv_recent_similar_keep
        kk = mp * p
        if kk > self.config.rkv_max_redundancy_tokens:
            raise RuntimeError(
                "R-KV redundancy scoring is quadratic in candidate tokens. "
                f"candidate_tokens={kk} exceeds "
                f"rkv_max_redundancy_tokens="
                f"{self.config.rkv_max_redundancy_tokens}. Reduce "
                "decode_keep_tokens/rkv_compression_interval or raise the "
                "explicit limit."
            )

        def score(kc, kv_scales, qcache, tables, rows, ctx, n_q, sent_id):
            pos = jnp.arange(kk, dtype=jnp.int32)[None, :]

            def body(carry, li):
                table_l = jax.lax.dynamic_index_in_dim(
                    tables, li, 0, keepdims=False
                )[rows, :mp]
                kcl = jax.lax.dynamic_index_in_dim(kc, li, 0, keepdims=False)
                if kv_scales is not None:
                    lsc = jax.lax.dynamic_index_in_dim(
                        kv_scales, li, 1, keepdims=False
                    )
                    if lsc.shape[0] == 4:  # int4: planes = (ks, vs, kz, vz)
                        keys = ref_ops.gather_dequant_u4(
                            kcl, lsc[0], lsc[2], table_l
                        )
                    else:  # int8: planes = (ks, vs)
                        keys = ref_ops.gather_dequant(kcl, lsc[0], table_l)
                else:
                    keys = ref_ops.gather_pages(kcl, table_l)
                ql = jax.lax.dynamic_index_in_dim(
                    qcache, li, 0, keepdims=False
                )[rows]
                sc = rkv_ops.retention_scores(
                    ql, n_q, keys, ctx, sm_scale=sm_scale,
                    redundancy_weight=w,
                    similarity_threshold=sim_thr,
                    recent_similar_keep=sim_keep,
                )
                if ns > 0:
                    # sentence-mean pooling (SkipKV): whole generated
                    # sentences live or die together.
                    bidx = jnp.arange(b)[:, None]
                    valid = sent_id >= 0
                    sid = jnp.where(valid, sent_id, ns - 1)
                    sums = jnp.zeros((b, ns), jnp.float32).at[bidx, sid].add(
                        jnp.where(valid, sc, 0.0)
                    )
                    cnt = jnp.zeros((b, ns), jnp.float32).at[bidx, sid].add(
                        valid.astype(jnp.float32)
                    )
                    avg = sums / jnp.maximum(cnt, 1.0)
                    sc = jnp.where(valid, avg[bidx, sid], sc)
                sc = jnp.where(pos < sink, 1e30, sc)  # sink always kept
                return carry, sc

            _, scores = jax.lax.scan(
                body, None, jnp.arange(spec.num_layers, dtype=jnp.int32)
            )
            return scores  # [L, B, K]

        fn = jax.jit(score)
        self._fn_cache[key] = fn
        logger.info("compiled rkv score op B=%d MP=%d NS=%d", b, mp, ns)
        return fn

    def rkv_evict(self, plan: dict) -> None:
        """Periodic decode-time joint eviction (rkv/skipkv): retention
        scores from the query ring buffer -> SnapKV-style compaction."""
        seqs = plan["seqs"]
        b = len(seqs)
        p = self.config.page_size
        mp = self.config.context_bucket_pages(
            max(-(-int(plan["ctx"].max()) // p), 1)
        )
        qc_size = self.query_cache.shape[2]
        n_q = np.asarray(
            [min(s.num_completion_tokens, qc_size) for s in seqs], np.int32
        )
        sent = plan.get("sentence_id")
        if sent is not None:
            ns = _round_up_pow2(int(sent.max()) + 2, lo=4)
            sent_k = np.full((b, mp * p), -1, np.int32)
            sent_k[:, : sent.shape[1]] = sent[:, : mp * p]
            sent_dev = self._dev(sent_k)
        else:
            ns = 0
            sent_dev = None
        fn = self._get_rkv_score_fn(b, mp, ns)
        with profiler.record("rkv_score"):
            scores = fn(
                self.k_cache, self.kv_scales, self.query_cache, self.tables,
                self._dev(plan["rows"]), self._dev(plan["ctx"]),
                self._dev(n_q), sent_dev,
            )
        plan = dict(plan)
        plan["batch_idx"] = np.arange(b, dtype=np.int32)
        self.compact_rows(plan, scores)

    # ----------------------------------------------- snapkv/pyramid compact

    def compact_rows(self, plan: dict, obs_scores) -> None:
        """Prefill-end top-k eviction: gather kept tokens into fresh pages and
        rewrite device table rows. See kv_manager/snapkv.py for the protocol.
        `obs_scores` is the [L, B_step, K] device array from the prefill step;
        plan['batch_idx'] selects the finished sequences."""
        rows = self._dev(plan["rows"])
        ctx = self._dev(plan["ctx"])
        keep = self._dev(plan["keep"])
        new_pages = self._dev(plan["new_pages"])
        batch_idx = self._dev(plan["batch_idx"])
        w = int(plan["obs_window"])
        kt = int(plan["keep"].max())  # static top budget this call
        quant = self.kv_scales is not None
        key = ("compact", obs_scores.shape, new_pages.shape, kt, w, quant)
        fn = self._fn_cache.get(key)
        if fn is None:
            donate = (0, 1, 2, 3) if quant else (0, 1, 3)
            fn = jax.jit(
                functools.partial(
                    _compact_impl, obs_window=w, keep_max=kt,
                    page_size=self.config.page_size,
                ),
                donate_argnums=donate,
            )
            self._fn_cache[key] = fn
            logger.info("compiled compact op %s", key)
        with profiler.record("compact"):
            (self.k_cache, self.v_cache, self.kv_scales,
             self.tables) = fn(
                self.k_cache, self.v_cache, self.kv_scales, self.tables,
                obs_scores, batch_idx, rows, ctx, keep, new_pages,
            )


def _compact_impl(
    kc, vc, kv_scales, tables, scores, batch_idx, rows, ctx, keep, new_pages,
    *, obs_window: int, keep_max: int, page_size: int,
):
    """Per-layer ordered top-k compaction (SnapKV family).

    scores: [L, B_step, K] fp32; batch_idx: [B] into B_step; rows/ctx: [B];
    keep: [L, B]; new_pages: [L, B, MPK]. Token semantics mirror the reference
    _snapkv_prefill_eviction (sparse_controller.py:631-665): the observation
    window (last `obs_window` tokens) is always kept; the top (keep - W)
    prefix tokens by score are kept in original order.
    """
    l_num, pages, p = kc.shape[:3]  # trailing dims: [Nkv, Dh] or flat int4
    b = rows.shape[0]
    k_len = scores.shape[-1]
    w = obs_window
    kt = keep_max  # static upper bound on kept tokens per (layer, seq)

    scores_sel = scores[:, batch_idx]  # [L, B, K]

    def layer_body(carry, xs):
        kc, vc, scales, tables = carry
        li, sc, kp, npg = xs  # [B,K], [B], [B,MPK]
        old_table = tables[li][rows]  # [B, MP]
        src_slot, dst_slot = _keep_slot_plan(
            sc, kp, ctx, old_table, npg,
            obs_window=w, keep_max=kt, page_size=p, k_len=k_len,
        )

        # multi-dim gather/scatter with [Nkv, Dh] token slices — no cache
        # reshape (merging minor dims is not layout-compatible with TPU
        # tiling; see ops/attention.py store_kv_layer).
        lix = jnp.broadcast_to(li, src_slot.shape)
        src_pg, src_off = src_slot // p, src_slot % p
        gathered_k = kc[lix, src_pg, src_off]  # [B, N, Nkv, Dh]
        gathered_v = vc[lix, src_pg, src_off]
        dst_pg = jnp.where(dst_slot >= 0, dst_slot // p, -1)
        dst_off = dst_slot % p
        kc = kc.at[lix, dst_pg, dst_off].set(gathered_k, mode="drop")
        vc = vc.at[lix, dst_pg, dst_off].set(gathered_v, mode="drop")
        if scales is not None:
            # move ALL per-slot dequant planes with the payload:
            # int8 = (k_scale, v_scale); int4 = + (k_zero, v_zero)
            nplanes = scales.shape[0]
            lix2 = jnp.broadcast_to(li, (nplanes,) + src_slot.shape)
            kvix = jnp.arange(nplanes, dtype=jnp.int32).reshape(
                nplanes, 1, 1
            )
            kvix = jnp.broadcast_to(kvix, lix2.shape)
            gathered_s = scales[
                kvix, lix2, src_pg[None], :, src_off[None]
            ]  # [nplanes, B, N, Nkv] (advanced dims first, slice last)
            scales = scales.at[
                kvix, lix2, dst_pg[None], :, dst_off[None]
            ].set(gathered_s, mode="drop")
        mpk = npg.shape[1]
        tables = tables.at[li, rows, :mpk].set(npg)
        return (kc, vc, scales, tables), None

    xs = (
        jnp.arange(scores_sel.shape[0], dtype=jnp.int32),
        scores_sel,
        keep,
        new_pages,
    )
    (kc, vc, kv_scales, tables), _ = jax.lax.scan(
        layer_body, (kc, vc, kv_scales, tables), xs
    )
    return kc, vc, kv_scales, tables


def _keep_slot_plan(
    sc, kp, ctx, old_table, npg,
    *, obs_window: int, keep_max: int, page_size: int, k_len: int,
):
    """SnapKV keep-selection -> (src_slot, dst_slot) staging/main slot pairs
    ([B, KTp+W]; dst -1 drops). Shared by resident and staged compaction;
    token semantics mirror reference _snapkv_prefill_eviction
    (sparse_controller.py:631-665): obs window always kept, top
    (keep - W) prefix tokens kept in original order."""
    p = page_size
    w = obs_window
    prefix_len = ctx - w  # [B]
    pos = jnp.arange(k_len, dtype=jnp.int32)[None, :]
    cand = jnp.where(pos < prefix_len[:, None], sc, -jnp.inf)
    n_prefix = jnp.maximum(kp - w, 0)  # [B]
    kt_prefix = min(keep_max, k_len)
    _, top_idx = jax.lax.top_k(cand, kt_prefix)  # [B, KTp]
    rank = jnp.arange(kt_prefix, dtype=jnp.int32)[None, :]
    valid = rank < n_prefix[:, None]
    src_prefix = jnp.sort(jnp.where(valid, top_idx, k_len), axis=1)
    dst_prefix = jnp.where(valid, rank, -1)
    wj = jnp.arange(w, dtype=jnp.int32)[None, :]
    src_win = prefix_len[:, None] + wj
    win_valid = src_win >= 0
    dst_win = jnp.where(win_valid, n_prefix[:, None] + wj, -1)
    src = jnp.concatenate([src_prefix, src_win], axis=1)
    dst = jnp.concatenate([dst_prefix, dst_win], axis=1)
    src = jnp.clip(src, 0, k_len - 1)
    mp_full = old_table.shape[1]
    src_page = jnp.take_along_axis(
        old_table, jnp.clip(src // p, 0, mp_full - 1), axis=1
    )
    src_slot = src_page * p + src % p
    dst_page = jnp.take_along_axis(
        npg, jnp.clip(dst // p, 0, npg.shape[1] - 1), axis=1
    )
    dst_slot = jnp.where(dst >= 0, dst_page * p + dst % p, -1)
    return src_slot, dst_slot


def _staged_compact_impl(
    ks, vs, ssc, kc, vc, tables, scores, batch_idx, rows, ctx, keep,
    new_pages, *, obs_window: int, keep_max: int, page_size: int,
    staging: str,
):
    """Staged compaction: top-k select (same semantics as _compact_impl),
    gather kept rows from the QUANTIZED staging pool, dequantize, scatter
    bf16 into main-pool pages, rewrite table rows to the main pages."""
    p = page_size
    k_len = scores.shape[-1]
    scores_sel = scores[:, batch_idx]  # [L, B, K]
    nkv = kc.shape[3]
    dh = kc.shape[4]

    def layer_body(carry, xs):
        kc, vc, tables = carry
        li, sc, kp, npg = xs
        old_table = tables[li][rows]  # [B, MP] staging page ids
        src_slot, dst_slot = _keep_slot_plan(
            sc, kp, ctx, old_table, npg,
            obs_window=obs_window, keep_max=keep_max,
            page_size=p, k_len=k_len,
        )
        src_pg, src_off = src_slot // p, src_slot % p
        lix = jnp.broadcast_to(li, src_slot.shape)
        if staging == "int4":
            pk = ks[lix, src_pg, src_off]  # [B, N, FD] packed
            pv = vs[lix, src_pg, src_off]
            # scale planes: [4, B, N, Nkv] (advanced dims lead, slice last)
            nplanes = 4
            lix2 = jnp.broadcast_to(li, (nplanes,) + src_slot.shape)
            kvix = jnp.broadcast_to(
                jnp.arange(nplanes, dtype=jnp.int32).reshape(nplanes, 1, 1),
                lix2.shape,
            )
            g_s = ssc[kvix, lix2, src_pg[None], :, src_off[None]]
            b_, n_ = src_slot.shape

            def _deq4(pkx, s, z):
                pi = pkx.astype(jnp.int32).reshape(b_, n_, nkv, dh // 2)
                q = jnp.concatenate(
                    [(pi & 15).astype(jnp.float32),
                     ((pi >> 4) & 15).astype(jnp.float32)], axis=-1)
                return q * s[..., None] + z[..., None]

            gathered_k = _deq4(pk, g_s[0], g_s[2]).astype(kc.dtype)
            gathered_v = _deq4(pv, g_s[1], g_s[3]).astype(kc.dtype)
        elif staging == "int8":
            pk = ks[lix, src_pg, src_off].astype(jnp.float32)  # [B,N,Nkv,Dh]
            pv = vs[lix, src_pg, src_off].astype(jnp.float32)
            nplanes = 2
            lix2 = jnp.broadcast_to(li, (nplanes,) + src_slot.shape)
            kvix = jnp.broadcast_to(
                jnp.arange(nplanes, dtype=jnp.int32).reshape(nplanes, 1, 1),
                lix2.shape,
            )
            g_s = ssc[kvix, lix2, src_pg[None], :, src_off[None]]
            gathered_k = (pk * g_s[0][..., None]).astype(kc.dtype)
            gathered_v = (pv * g_s[1][..., None]).astype(kc.dtype)
        else:  # bf16 staging
            gathered_k = ks[lix, src_pg, src_off].astype(kc.dtype)
            gathered_v = vs[lix, src_pg, src_off].astype(kc.dtype)
        dst_pg = jnp.where(dst_slot >= 0, dst_slot // p, -1)
        dst_off = dst_slot % p
        kc = kc.at[lix, dst_pg, dst_off].set(gathered_k, mode="drop")
        vc = vc.at[lix, dst_pg, dst_off].set(gathered_v, mode="drop")
        # rewrite the WHOLE table row: stale entries past the keep pages
        # still hold STAGING page ids, which can exceed the main pool —
        # a decode-kernel page DMA through one is out-of-bounds HBM and
        # crashes the chip (observed: 'TPU backend error (Internal)' on
        # the first decode megastep after a staged compaction).
        mpk = npg.shape[1]
        mpt = tables.shape[2]
        row_full = jnp.zeros((rows.shape[0], mpt), tables.dtype)
        row_full = row_full.at[:, :mpk].set(npg)
        tables = tables.at[li, rows].set(row_full)
        return (kc, vc, tables), None

    xs = (
        jnp.arange(scores_sel.shape[0], dtype=jnp.int32),
        scores_sel,
        keep,
        new_pages,
    )
    (kc, vc, tables), _ = jax.lax.scan(layer_body, (kc, vc, tables), xs)
    return kc, vc, tables
