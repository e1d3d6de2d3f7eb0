"""LLMEngine: orchestration facade (reference engine/llm_engine.py:158-790).

Bring-up order mirrors the reference (model -> KV sizing -> cache manager ->
scheduler -> warmup) but with TPU-native replacements:
  * no worker processes / SHM RPC — a single controller drives one SPMD
    program (GSPMD shards it across chips);
  * KV memory sizing is analytic (weights + pools arithmetic vs HBM budget)
    instead of allocator probing (reference base.py:286-474);
  * warmup = jit compilation of the hot buckets (reference _warmup
    llm_engine.py:299-354, where it was CUDA-graph capture).
"""

from __future__ import annotations

import os
import time
import weakref
from dataclasses import dataclass, field

import numpy as np

from ..config import Config
from ..runtime_params import normalize_runtime_params
from ..sampling_params import SamplingParams
from ..utils.log import logger
from ..utils.profiler import profiler
from . import debug_checks
from .executor import ModelExecutor
from .kv_manager.base import KVCacheManager
from .kv_manager.snapkv import SnapKVManager
from .scheduler import ScheduledBatch, Scheduler
from .sequence import FinishReason, SeqStatus, Sequence


@dataclass
class RequestOutput:
    request_id: str
    prompt_token_ids: list[int]
    output_token_ids: list[int]
    finish_reason: str | None
    text: str = ""
    # per-token logprob of each output token + top-N alternatives (only when
    # SamplingParams.logprobs is set)
    logprobs: list[float] | None = None
    top_logprobs: list[dict[int, float]] | None = None


def _device_hbm_bytes() -> int:
    import jax

    dev = jax.local_devices()[0]
    try:
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:  # noqa: BLE001 - backend-dependent
        pass
    return 16 * 1024**3  # v5e default


class _ThroughputLogger:
    """Interval throughput logger (reference llm_engine.py:51-156): a
    background thread reporting prefill/decode tok/s and queue depths."""

    def __init__(self, engine, interval_s: float = 10.0):
        import threading

        self.engine = engine
        self.interval = interval_s
        self.prefill_tokens = 0
        self.decode_tokens = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="throughput-log", daemon=True
        )
        self._thread.start()

    def record(self, is_prefill: bool, n_tokens: int) -> None:
        if is_prefill:
            self.prefill_tokens += n_tokens
        else:
            self.decode_tokens += n_tokens

    def _run(self) -> None:
        import time as _time

        while not self._stop.wait(self.interval):
            p, d = self.prefill_tokens, self.decode_tokens
            self.prefill_tokens = 0
            self.decode_tokens = 0
            sched = self.engine.scheduler
            if p or d or sched.has_work:
                logger.info(
                    "throughput: prefill %.0f tok/s, decode %.0f tok/s | "
                    "running=%d waiting=%d preemptions=%d",
                    p / self.interval, d / self.interval,
                    len(sched.running), len(sched.waiting),
                    sched.num_preemptions,
                )

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)


# live-engine registry (test hygiene): the suite's autouse fixture exits any
# engine a test forgot to — one leaked engine is a daemon thread + a full set
# of device pools held for the rest of the pytest process (VERDICT r2 weak#5:
# the suite accumulated 62 threads and segfaulted the XLA CPU compiler).
_LIVE_ENGINES: "weakref.WeakSet" = weakref.WeakSet()


class LLMEngine:
    def __init__(self, model: str = "", *, spec=None, params=None, **kwargs):
        """``spec``/``params`` inject a synthetic model directly (benchmarks
        and tests; no tokenizer, eos=2) — the production path loads from a
        checkpoint via ``model``."""
        allow_unknown = bool(kwargs.pop("allow_unknown_config_keys", False))
        cfg_kwargs = normalize_runtime_params(kwargs, allow_unknown)
        cfg_kwargs.setdefault("allow_unknown_config_keys", allow_unknown)
        self.config = Config(model=model, **cfg_kwargs)
        config = self.config
        profiler.enabled = profiler.enabled or config.enable_profiler

        # persistent XLA compilation cache: the jit shape buckets are this
        # engine's "CUDA graphs" and a fresh process otherwise recompiles
        # every bucket (~150 s per 128K staged-prefill bucket through the
        # TPU tunnel). Opt out with SPARSEVLLM_COMPILE_CACHE=''.
        import jax

        cache_dir = os.environ.get(
            "SPARSEVLLM_COMPILE_CACHE", "/tmp/sparsevllm_jax_cache"
        )
        if cache_dir and not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

        # --- model + tokenizer ------------------------------------------
        if spec is not None:
            if params is None:
                raise ValueError("spec injection requires params")
            self.tokenizer = None
            eos_ids: tuple[int, ...] = (2,)
        elif config.tiny_random:
            from ..utils.tiny_random import build_tiny_params_and_spec

            params, spec = build_tiny_params_and_spec(
                config.tiny_random_config, config.tiny_random_seed,
                config.dtype,
            )
            self.tokenizer = None
            eos_ids: tuple[int, ...] = (2,)
        else:
            import transformers

            from ..models.spec import spec_from_hf_config
            from ..models.weights import load_hf_weights

            hf_config = transformers.AutoConfig.from_pretrained(
                config.model, trust_remote_code=config.trust_remote_code
            )
            spec = spec_from_hf_config(hf_config)
            qc = getattr(hf_config, "quantization_config", None) or {}
            if not isinstance(qc, dict):
                qc = getattr(qc, "to_dict", lambda: {})()
            if qc.get("quant_method") in ("fp8", "fbgemm_fp8"):
                # pre-quantized checkpoint: keep fp8 block storage on TPU
                # (loader dequantizes; executor re-quantizes — weights.py)
                config.weight_quantization = "fp8"
            params = load_hf_weights(spec, config.model, config.dtype)
            self.tokenizer = transformers.AutoTokenizer.from_pretrained(
                config.tokenizer or config.model,
                trust_remote_code=config.trust_remote_code,
            )
            eos = getattr(hf_config, "eos_token_id", None)
            if eos is None:
                eos = self.tokenizer.eos_token_id
            eos_ids = tuple(eos) if isinstance(eos, (list, tuple)) else (eos,)
        self.spec = spec

        # --- mesh (TP x EP x DP over ICI; SURVEY §2.5 TPU-native
        # equivalent; independent EP gets its own axis) ---
        mesh = None
        tp, dp = config.tensor_parallel_size, config.data_parallel_size
        ep = config.expert_parallel_size
        if tp * dp * ep > 1:  # build_mesh folds ep in {1, tp} into 2 axes
            from ..parallel.mesh import build_mesh

            mesh = build_mesh(tp=tp, dp=dp, ep=ep)

        # --- KV sizing (analytic) ----------------------------------------
        num_pages, max_rows = self._derive_kv_capacity(params)
        if spec.model_type == "qwen3_next":
            from .hybrid_executor import HybridExecutor

            self.executor = HybridExecutor(
                config, spec, params, num_pages, max_rows, mesh=mesh
            )
        else:
            self.executor = ModelExecutor(
                config, spec, params, num_pages, max_rows, mesh=mesh
            )
        # KV rows exist only for full-attention layers (hybrid models map
        # layer -> kv slot; reference RuntimeLayout.kv_layer_index)
        self.kv = KVCacheManager.create(
            config, getattr(spec, "num_kv_layers", spec.num_layers),
            num_pages, max_rows,
        )
        self.executor.kv_manager = self.kv
        self.prefix_cache = None
        self._hybrid_snapshots: dict[int, dict[int, object]] = {}
        if config.enable_prefix_cache:
            from .prefix_cache import RadixPrefixIndex, config_fingerprint

            self.kv.prefix_index = RadixPrefixIndex(
                config.page_size,
                getattr(spec, "num_kv_layers", spec.num_layers),
                config_fingerprint(config),
            )
            self.prefix_cache = self.kv.prefix_index
            if spec.model_type == "qwen3_next":
                # joint KV + recurrent-state prefix blocks (reference
                # PrefixCacheCoordinator:42-641): a hit must end on a block
                # carrying a state snapshot (taken at page-aligned chunk
                # boundaries); attach restores conv/delta state rows
                self.kv.prefix_attach_filter = self._hybrid_prefix_filter
                self.kv.on_prefix_attached = self._hybrid_prefix_attached
        self.scheduler = Scheduler(config, self.kv, eos_ids)
        # AIMD megastep-length estimate (VERDICT r1 weak#8: sequences
        # finishing mid-megastep burn up to k-1 lane-steps). Halved when
        # >25% of lane-steps in a dispatch were past a finish, doubled
        # back toward the configured k after a fully-consumed dispatch.
        self._adaptive_k = config.decode_steps_per_dispatch
        self.throughput = _ThroughputLogger(self)
        self._exited = False
        _LIVE_ENGINES.add(self)
        self._outputs: dict[int, RequestOutput] = {}
        self._seqs: dict[int, Sequence] = {}
        self._step_times: list[float] = []
        logger.info(
            "engine up: model_type=%s layers=%d kv_pages=%d (page=%d tok, "
            "%.2f GiB KV) rows=%d method=%s",
            spec.model_type, spec.num_layers, num_pages, config.page_size,
            self._kv_bytes(num_pages) / 2**30, max_rows,
            config.method or "vanilla",
        )

    def _kv_bytes(self, num_pages: int, dtype: str | None = None) -> int:
        s = self.spec
        lkv = getattr(s, "num_kv_layers", s.num_layers)
        dtype = dtype or self.config.kv_cache_dtype
        if dtype == "int8":
            per_slot = s.head_dim + 4  # int8 payload + f32 scale
        elif dtype == "int4":
            per_slot = s.head_dim // 2 + 8  # packed payload + scale + zero
        elif dtype == "int2":
            # quarter-packed payload + V scale/zero (f32, amortized over
            # k+v slots) + per-channel K scale/zero per kivi_group tokens
            g = self.config.kivi_group_size or 32
            per_slot = s.head_dim // 4 + 4 + 4 * s.head_dim // g
        else:
            per_slot = s.head_dim * (
                2 if self.config.dtype != "float32" else 4
            )
        layers = 1 if self.config.global_kv_pool else lkv
        return (
            2 * layers * num_pages * s.num_kv_heads
            * self.config.page_size * per_slot
        )

    def _kv_padded_factor(self) -> float:
        """HBM multiplier the TPU tiled layout imposes when the cache's
        trailing dims under-fill a (sublane, 128) tile. Production shapes
        (Dh=128, flat-lane int4) are exactly tile-aligned (1.0); tiny
        debug models (Dh=16, Nkv=2, f32) pad 8-32x — sizing the auto pool
        on LOGICAL bytes handed them a multi-GiB committed pool whose
        cache-sized prefill copies wedged the TPU (PERF_NOTES r1 issue 6).
        """
        s, c = self.spec, self.config

        def ceil_to(x, m):
            return -(-x // m) * m

        dtype = c.kv_cache_dtype
        if dtype == "int4":
            # flat-lane [L, pages, P, Nkv*Dh//2] int8 storage
            p, lane = c.page_size, s.num_kv_heads * s.head_dim // 2
            return (ceil_to(p, 32) * ceil_to(lane, 128)) / max(p * lane, 1)
        sub = {"float32": 8, "bfloat16": 16, "float16": 16}.get(c.dtype, 8)
        if dtype in ("int8", "int2"):
            sub = 32
        return (ceil_to(s.num_kv_heads, sub) * ceil_to(s.head_dim, 128)
                ) / max(s.num_kv_heads * s.head_dim, 1)

    def _derive_kv_capacity(self, params) -> tuple[int, int]:
        config, spec = self.config, self.spec
        max_rows = min(
            config.max_num_seqs_in_gpu,
            max(config.max_decoding_seqs, config.max_num_seqs_in_batch),
        )
        if config.num_kv_pages is not None:
            return config.num_kv_pages, max_rows
        import jax

        hbm = config.hbm_bytes_per_chip or _device_hbm_bytes()
        weights = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(params)
        )
        # workspace: activations for the largest prefill bucket + logits +
        # scores, with margin (analytic stand-in for the reference's
        # allocator probe, base.py:286-474).
        act = (
            config.chunk_prefill_size
            * max(spec.hidden_size * 8, spec.vocab_size)
            * 2
        )
        # Per-chip accounting under TP: weights and KV heads are sharded
        # over the model axis (parallel/mesh.py), so each chip holds ~1/tp.
        tp = max(config.tensor_parallel_size, 1)
        budget = int(hbm * config.hbm_utilization) - weights // tp - act
        if config.kv_staging_dtype != "none":
            # staging pool + the staged-prefill block scratch (ONE
            # chunk-sized dequantized KV block — the attention is a
            # block-scanned online softmax, executor._get_staged_prefill_fn)
            budget -= self._kv_bytes(
                config.num_staging_pages, config.kv_staging_dtype
            ) // tp
            budget -= 2 * self._kv_bytes(
                config.chunk_prefill_size // config.page_size + 1, "bfloat16"
            ) // max(getattr(self.spec, "num_kv_layers", self.spec.num_layers),
                     1) // tp
        factor = self._kv_padded_factor()
        page_bytes = max(int(self._kv_bytes(1) * factor) // tp, 1)
        num_pages = max(budget // page_bytes, 0)
        if factor > 1.5:
            # pathologically padded (tiny-debug) layouts ALSO materialize
            # cache-sized prefill copies (PERF_NOTES r1 issue 6), so the
            # pool must leave copy headroom: cap its PADDED footprint at
            # 2 GiB — orders of magnitude above any debug config's demand
            num_pages = min(num_pages, max((2 << 30) // page_bytes, 2))
        # cap at the addressable demand: every row at max_model_len plus an
        # equal allowance of prefix-cache blocks. Without this, tiny debug
        # models get a multi-GiB pool whose cache-sized copies wedge the
        # first prefill (PERF_NOTES r1 issue 6).
        addressable = max_rows * config.max_pages_per_seq * 2 + 1
        num_pages = min(num_pages, addressable)
        need_one_seq = config.max_model_len // config.page_size + 1
        if num_pages < need_one_seq:
            logger.warning(
                "KV budget (%d pages) cannot hold one max_model_len sequence "
                "(%d pages); long prompts will be rejected at admission",
                num_pages, need_one_seq,
            )
        if num_pages < 2:
            raise RuntimeError(
                f"insufficient HBM for KV cache: budget={budget} bytes, "
                f"page={page_bytes} bytes (weights={weights >> 20} MiB, "
                f"hbm={hbm >> 20} MiB)"
            )
        return int(num_pages), max_rows

    # --------------------------------------------------------------- intake

    def add_request(
        self,
        prompt: str | None = None,
        sampling_params: SamplingParams | None = None,
        prompt_token_ids: list[int] | None = None,
        request_id: str | None = None,
        mm_features=None,  # np.ndarray [n_image_tokens, hidden]
    ) -> int:
        if prompt_token_ids is None:
            if prompt is None:
                raise ValueError("need prompt or prompt_token_ids")
            if self.tokenizer is None:
                raise ValueError(
                    "no tokenizer (tiny_random); pass prompt_token_ids"
                )
            prompt_token_ids = self.tokenizer.encode(prompt)
        sp = sampling_params or SamplingParams()
        seq = Sequence(list(prompt_token_ids), sp, request_id=request_id)
        if mm_features is not None:
            img_id = self.config.image_token_id
            if img_id is None:
                raise ValueError(
                    "mm_features given but the engine has no "
                    "image_token_id configured"
                )
            feats = np.asarray(mm_features)
            pos = np.flatnonzero(
                np.asarray(prompt_token_ids, np.int64) == img_id
            )
            if feats.ndim != 2 or len(pos) != feats.shape[0]:
                raise ValueError(
                    f"mm_features rows ({feats.shape}) must match the "
                    f"{len(pos)} image-placeholder tokens (id={img_id}) "
                    f"in the prompt"
                )
            hidden = self.executor.params["embed"].shape[-1]
            if feats.shape[1] != hidden:
                raise ValueError(
                    f"mm_features hidden dim {feats.shape[1]} != model "
                    f"hidden {hidden} — run the vision projector first "
                    f"(models/vision.encode_images)"
                )
            if self.config.enable_prefix_cache:
                raise ValueError(
                    "mm_features with enable_prefix_cache: prefix blocks "
                    "are keyed by token ids, which do not identify image "
                    "content — disable the prefix cache for multimodal"
                )
            seq.mm_features = feats
            seq.mm_positions = pos
        self.scheduler.add(seq)
        self._seqs[seq.seq_id] = seq
        self._outputs[seq.seq_id] = RequestOutput(
            request_id=request_id or str(seq.seq_id),
            prompt_token_ids=list(prompt_token_ids),
            output_token_ids=[],
            finish_reason=None,
        )
        return seq.seq_id

    def abort_request(self, seq_id: int) -> None:
        seq = self.scheduler.abort(seq_id)
        if seq is not None and seq.row >= 0:
            self.kv.free_seq(seq)
        if seq is not None and getattr(seq, "streamed_prefill", False):
            if self.executor._streamed is not None:
                self.executor._streamed.abort(seq_id)

    # ----------------------------------------------------------------- step

    def step(self) -> list[tuple[Sequence, list[int]]]:
        """One engine step; returns [(seq, new_token_ids)] for streaming."""
        t0 = time.perf_counter()
        with profiler.record("schedule"):
            batch = self.scheduler.schedule()
        if batch is None:
            return []
        if batch.is_prefill:
            results = self._step_prefill(batch)
            self.throughput.record(True, sum(batch.chunk_sizes))
        else:
            results = self._step_decode(batch)
            self.throughput.record(
                False, sum(len(t) for _, t in results)
            )
        if debug_checks.SLOTS:
            live = [s.seq_id for s in self.scheduler.running] + [
                s.seq_id for s in self.scheduler.waiting
            ]
            debug_checks.check_page_accounting(self.kv, live)
            debug_checks.audit_staging(self.kv)
        self._step_times.append(time.perf_counter() - t0)
        return results

    def _step_prefill(self, batch: ScheduledBatch):
        seqs, chunks = batch.seqs, batch.chunk_sizes
        if getattr(seqs[0], "streamed_prefill", False):
            # host-archive long prefill (bs=1 by the long bucket)
            assert len(seqs) == 1
            token = self.executor.run_prefill_streamed(seqs[0], chunks[0])
            finished = self.scheduler.postprocess(
                batch, [token if token is not None else 0], None
            )
            self._finalize(finished)
            return [(s, list(s.last_step_tokens)) for s in seqs]
        dests = [
            self.kv.alloc_prefill(s, c) for s, c in zip(seqs, chunks)
        ]
        rows = self.kv.rows_of(seqs)
        ctx = self.kv.ctx_lens(seqs)[0]  # layer-shared during prefill
        if debug_checks.BOUNDS:
            debug_checks.check_prefill_plan(self.kv, seqs, dests, rows)
        self.executor.apply_table_updates(self.kv.drain_table_updates())
        emit_obs = any(
            s.num_prefilled_tokens + c >= s.num_prompt_tokens
            for s, c in zip(seqs, chunks)
        )
        staged_step = seqs[0].staged_prefill
        if staged_step:
            tokens, obs = self.executor.run_prefill_staged(
                seqs, chunks, dests, rows, ctx, emit_obs=emit_obs
            )
        else:
            tokens, obs = self.executor.run_prefill(
                seqs, chunks, dests, rows, ctx, emit_obs=emit_obs
            )

        # prefill-end compaction (snapkv/pyramidkv)
        finishing = [
            (i, s) for i, s in enumerate(seqs)
            if s.num_prefilled_tokens + chunks[i] >= s.num_prompt_tokens
        ]
        if (
            finishing
            and isinstance(self.kv, SnapKVManager)
            and obs is not None
        ):
            if staged_step:
                # staged steps run bs=1; the compacted tokens move
                # staging (quantized) -> main pool (bf16)
                s0 = finishing[0][1]
                plan = self.kv.plan_staged_compaction(s0)
                plan["batch_idx"] = np.asarray([0], np.int32)
                self.executor.compact_rows_staged(plan, obs)
                self.kv.commit_staged_compaction(s0, plan)
            else:
                fseqs = [s for _, s in finishing]
                plan = self.kv.plan_compaction(fseqs)
                if plan is not None:
                    plan["batch_idx"] = np.asarray(
                        [i for i, _ in finishing], np.int32
                    )
                    self.executor.compact_rows(plan, obs)
                    self.kv.commit_compaction(fseqs, plan)
        # deltakv: compress finished prompts' middle region into latents
        if finishing and hasattr(self.kv, "plan_compression"):
            plan = self.kv.plan_compression([s for _, s in finishing])
            if plan is not None:
                self.executor.compress_prefill(plan)
                self.kv.commit_compression(plan)
        # hybrid: snapshot recurrent state at page-aligned chunk
        # boundaries — these become the joint-block state checkpoints
        if self._hybrid_caching:
            for i, s in enumerate(seqs):
                done = s.num_prefilled_tokens + chunks[i]
                if done % self.config.page_size == 0:
                    row = self.kv.seq_rows[s.seq_id]
                    self._hybrid_snapshots.setdefault(s.seq_id, {})[done] = \
                        self.executor.snapshot_recurrent(row)
        # publish finished prompts' pages into the prefix cache
        if self.prefix_cache is not None:
            for _, s in finishing:
                created = self.kv.commit_prefix(s)
                if self._hybrid_caching and created:
                    snaps = self._hybrid_snapshots.get(s.seq_id, {})
                    for node in created:
                        end = self._block_depth(node) * self.config.page_size
                        if end in snaps:
                            node.state = snaps[end]
        # chunk-end eviction (streamingllm)
        self.kv.on_prefill_chunk_end(
            seqs, final=bool(finishing)
        )
        finished = self.scheduler.postprocess(
            batch, tokens, self.executor.last_logprobs
        )
        self._finalize(finished)
        return [(s, list(s.last_step_tokens)) for s in seqs]

    def _step_decode(self, batch: ScheduledBatch):
        seqs = batch.seqs
        # megastep length: bounded by model-length headroom of the batch
        # (rows cannot extend past max_model_len pages), by the largest
        # remaining max_tokens budget (no lane needs more steps than that),
        # and by the AIMD estimate tuned from observed mid-megastep
        # finishes (EOS/stop-heavy workloads shrink k automatically).
        k = self.config.decode_steps_per_dispatch
        headroom = min(
            self.config.max_model_len - s.num_tokens for s in seqs
        )
        budget = max(
            s.sampling_params.max_tokens - s.num_completion_tokens
            for s in seqs
        )
        k = max(1, min(k, headroom, budget, self._adaptive_k))
        k = 1 << (k.bit_length() - 1)  # power-of-2 jit shape bucket
        dest, ctx_start = self.kv.alloc_decode(seqs, k)
        if debug_checks.BOUNDS:
            debug_checks.check_decode_plan(self.kv, seqs, dest, ctx_start)
        rows = self.kv.rows_of(seqs)
        self.executor.apply_table_updates(self.kv.drain_table_updates())
        comp = (
            self.kv.comp_counts_of(seqs)
            if hasattr(self.kv, "comp_counts_of") else None
        )
        tokens = self.executor.run_decode(
            seqs, dest, ctx_start, rows, comp_counts=comp
        )
        self.kv.on_decode_step_end(seqs)
        finished = self.scheduler.postprocess(
            batch, tokens, self.executor.last_logprobs
        )
        self._finalize(finished)
        used = sum(len(s.last_step_tokens) for s in seqs)
        total = len(seqs) * k
        if used == total:
            self._adaptive_k = min(
                self.config.decode_steps_per_dispatch, self._adaptive_k * 2
            )
        elif (total - used) * 4 > total:  # >25% lane-steps wasted
            self._adaptive_k = max(1, self._adaptive_k // 2)
        # rkv/skipkv periodic joint eviction (reference rkv.py decode-time
        # compression; here eviction == compaction, see executor.rkv_evict)
        if hasattr(self.kv, "plan_decode_eviction"):
            alive = [s for s in seqs if not s.is_finished]
            plan = self.kv.plan_decode_eviction(alive) if alive else None
            if plan is not None:
                self.executor.rkv_evict(plan)
                self.kv.commit_compaction(plan["seqs"], plan)
        # deltakv periodic tail re-compression (raw decode tail -> latents)
        if hasattr(self.kv, "plan_decode_recompression"):
            alive = [s for s in seqs if not s.is_finished]
            plan = (
                self.kv.plan_decode_recompression(alive) if alive else None
            )
            if plan is not None:
                self.executor.recompress_decode(plan)
                self.kv.commit_recompression(plan)
        return [(s, list(s.last_step_tokens)) for s in seqs]

    # ------------------------------------------- hybrid joint prefix blocks

    @property
    def _hybrid_caching(self) -> bool:
        return (
            self.prefix_cache is not None
            and self.spec.model_type == "qwen3_next"
        )

    @staticmethod
    def _block_depth(node) -> int:
        d = 0
        while node is not None:
            d += 1
            node = node.parent
        return d

    def _hybrid_prefix_filter(self, blocks: list) -> list:
        """Usable hybrid prefix = longest chain ending on a block with a
        recurrent-state snapshot."""
        last = 0
        for i, b in enumerate(blocks):
            if b.state is not None:
                last = i + 1
        return blocks[:last]

    def _hybrid_prefix_attached(self, seq, blocks: list) -> None:
        row = self.kv.seq_rows[seq.seq_id]
        self.executor.restore_recurrent(row, blocks[-1].state)

    def _finalize(self, finished: list[Sequence]) -> None:
        for seq in finished:
            self._hybrid_snapshots.pop(seq.seq_id, None)
            self.kv.free_seq(seq)
            out = self._outputs.get(seq.seq_id)
            if out is not None:
                out.output_token_ids = list(seq.completion_token_ids)
                out.finish_reason = (
                    seq.finish_reason.value if seq.finish_reason else None
                )
                if seq.sampling_params.logprobs is not None:
                    out.logprobs = list(seq.completion_logprobs)
                    out.top_logprobs = list(seq.completion_top_logprobs)

    # ------------------------------------------------------------- generate

    def generate(
        self,
        prompts: list[str] | None = None,
        sampling_params: SamplingParams | list[SamplingParams] | None = None,
        prompt_token_ids: list[list[int]] | None = None,
        mm_features: list | None = None,  # per-prompt projector rows
    ) -> list[RequestOutput]:
        inputs = prompts if prompts is not None else prompt_token_ids
        n = len(inputs)
        sps = (
            sampling_params
            if isinstance(sampling_params, list)
            else [sampling_params or SamplingParams()] * n
        )
        mms = mm_features if mm_features is not None else [None] * n
        ids = []
        for i in range(n):
            if prompts is not None:
                ids.append(self.add_request(prompt=prompts[i],
                                            sampling_params=sps[i],
                                            mm_features=mms[i]))
            else:
                ids.append(
                    self.add_request(
                        prompt_token_ids=prompt_token_ids[i],
                        sampling_params=sps[i],
                        mm_features=mms[i],
                    )
                )
        while self.scheduler.has_work:
            self.step()
        outs = []
        for sid in ids:
            out = self._outputs[sid]
            seq = self._seqs[sid]
            if not out.output_token_ids:
                out.output_token_ids = list(seq.completion_token_ids)
                out.finish_reason = (
                    seq.finish_reason.value if seq.finish_reason else None
                )
            if self.tokenizer is not None:
                out.text = self.tokenizer.decode(out.output_token_ids)
            outs.append(out)
        return outs

    def reset_prefix_cache(self) -> dict:
        """Drop all unreferenced cached blocks (prefix-cache control API,
        reference llm_engine.py prefix-cache RPCs)."""
        if self.prefix_cache is None:
            return {"blocks": 0}
        before = self.prefix_cache.num_blocks
        for block in self.prefix_cache.reset():
            for l in range(self.spec.num_layers):
                self.kv._release_pages(l, block.pages[l : l + 1])
        self.kv._invalidate_reclaim_cache()
        return {"blocks": before - self.prefix_cache.num_blocks}

    def prefix_cache_stats(self) -> dict:
        if self.prefix_cache is None:
            return {"enabled": False}
        return {"enabled": True, **self.prefix_cache.stats()}

    def exit(self) -> None:
        """Idempotent shutdown: stop the logger thread and RELEASE the
        executor's device pools (reference _shutdown_runtime,
        llm_engine.py:375-460 — there it was worker teardown; here the
        buffers themselves are the leak surface in long test sessions)."""
        if self._exited:
            return
        self._exited = True
        self.throughput.stop()
        _LIVE_ENGINES.discard(self)
        if profiler.enabled:
            logger.info("profiler summary:\n%s", profiler.summary())
        ex = self.executor
        if ex is not None:
            for name in (
                "k_cache", "v_cache", "kv_scales", "k_stage", "v_stage",
                "stage_scales", "tables", "params", "quest_meta",
                "query_cache", "dk_state", "dk_comp", "conv_states",
                "rec_states",
            ):
                if hasattr(ex, name):
                    setattr(ex, name, None)
            if hasattr(ex, "_fn_cache"):
                ex._fn_cache = {}
        self.executor = None


class LLM(LLMEngine):
    """Public alias (reference llm.py:4)."""
