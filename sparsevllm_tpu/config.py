"""Engine configuration.

Re-expresses the reference's Config contract (src/sparsevllm/config.py:583-1598):
a single dataclass holding scheduler caps, parallel sizes, sparse-method
budgets, and per-method knobs, with exhaustive fail-fast ``__post_init__``
validation, plus ``RuntimeLayout`` mapping layers to full/sparse attention
roles (config.py:396-543).

TPU-first differences from the reference:
  * KV memory sizing is **analytic** (weights + pools + workspace arithmetic
    against an HBM budget) instead of the CUDA allocator peak-probe
    (reference base.py:286-474) — TPUs expose no equivalent probe.
  * The cache is **page-granular** (``page_size`` tokens/page) rather than
    token-granular slot pools: pages map onto Pallas block shapes and Quest
    metadata directly.
  * "Decode graph" knobs become jit **shape-bucket** knobs: batch buckets are
    powers of two up to ``max_decoding_seqs`` and context buckets grow
    geometrically up to ``max_model_len`` (same bucketing math as reference
    config.py:122-221; "capture" is the jit compile cache).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any

from . import method_registry as registry
from .utils.log import logger


def _pow2_buckets(max_value: int, start: int = 1) -> list[int]:
    """Powers of two from `start` capped at max_value (always includes cap)."""
    out = []
    v = start
    while v < max_value:
        out.append(v)
        v *= 2
    out.append(max_value)
    return out


def _geometric_context_buckets(base: int, max_value: int) -> list[int]:
    """Interleaved {2^n, 1.5*2^n} token buckets capped at max_value.

    The reference uses pure 2^n context buckets (config.py:175-187); the
    half-step buckets bound decode-kernel KV over-read at <=33% instead of
    <=100% — on TPU the padded pages are real HBM bandwidth, so bucket
    granularity is directly decode throughput.
    """
    out = []
    v = base
    while v < max_value:
        out.append(v)
        if v * 3 // 2 < max_value:
            out.append(v * 3 // 2)
        v *= 2
    out.append(max_value)
    return out


@dataclass(frozen=True)
class RuntimeLayout:
    """Layer role map (reference config.py:396-543).

    ``full_attn_layers`` lists layer indices that always run dense attention
    (OmniKV observation layers / DeltaKV reference layers); everything else is
    a sparse-eligible layer. ``kv_layer_index[l]`` maps a model layer to its
    KV-cache layer slot (identity unless KV-sharing is configured).
    """

    num_layers: int
    full_attn_layers: tuple[int, ...]
    kv_layer_index: tuple[int, ...]

    @property
    def sparse_layers(self) -> tuple[int, ...]:
        full = set(self.full_attn_layers)
        return tuple(i for i in range(self.num_layers) if i not in full)

    @property
    def num_kv_layers(self) -> int:
        return max(self.kv_layer_index) + 1 if self.kv_layer_index else 0

    @staticmethod
    def create(num_layers: int, full_attn_layers) -> "RuntimeLayout":
        full = tuple(sorted(set(int(i) for i in (full_attn_layers or ()))))
        for i in full:
            if not 0 <= i < num_layers:
                raise ValueError(
                    f"full_attn_layers entry {i} out of range [0, {num_layers})"
                )
        return RuntimeLayout(
            num_layers=num_layers,
            full_attn_layers=full,
            kv_layer_index=tuple(range(num_layers)),
        )


@dataclass
class Config:
    """Engine configuration. Field groups mirror reference config.py:583-763."""

    # --- model -----------------------------------------------------------
    model: str = ""
    tokenizer: str | None = None
    dtype: str = "bfloat16"
    trust_remote_code: bool = True
    # Tiny-random debug model (reference debug/tiny_random.py): if set, the
    # model path is ignored and a small randomly-initialized model with this
    # architecture is built (seeded; see utils/tiny_random.py).
    tiny_random: bool = False
    tiny_random_config: dict | None = None
    tiny_random_seed: int = 0
    # multimodal: vocabulary id of the image-placeholder token. Requests may
    # then pass ``mm_features`` (vision-projector rows, one per placeholder)
    # to add_request; prefill splices them into the input embeddings
    # (reference llava_ov_inference.py). None = text-only engine.
    image_token_id: int | None = None

    # --- scheduler caps (reference defaults, config.py:583-599) ----------
    max_num_batched_tokens: int = 65536
    max_num_seqs_in_batch: int = 32
    max_decoding_seqs: int = 64
    max_model_len: int = 131072
    max_num_seqs_in_gpu: int | None = None  # resident-row cap; None = rows cap
    chunk_prefill_size: int = 8192
    # prompts above this length CONSIDER host-archive streaming; they take
    # it only when dense admission can never fit the page pool (routing is
    # residency-aware, scheduler.add — quantized caches usually keep even
    # 128K prompts resident). 0 disables streaming entirely.
    long_prefill_offload_threshold: int = 98304
    prefill_policy: str | None = None  # resolved via method registry
    prompt_admission_failure_action: str = "defer"  # defer | raise

    # --- KV cache / memory (TPU analytic sizing) --------------------------
    page_size: int = 64  # tokens per KV page; multiple of TPU sublane tile
    num_kv_pages: int | None = None  # explicit page count; None = derive
    # ONE page id space shared by all layers (reference deltakv_base.py's
    # separate full/sparse pools, generalized): each layer's table points
    # into the same physical pool, so a method whose layers hold wildly
    # different residencies (deltakv: 2 observation layers keep the whole
    # prompt, 26 compressed layers keep sink+tail) pays for TOTAL pages,
    # not max-per-layer x num_layers. Scoped to deltakv (validated).
    global_kv_pool: bool = False
    hbm_utilization: float = 0.9  # fraction of per-chip HBM usable
    hbm_bytes_per_chip: int | None = None  # None = query device
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | int8 | int4 (KIVI)
    # Mixed-precision staged prefill (snapkv/pyramidkv): long prompts
    # prefill into a QUANTIZED staging pool (so a 128K prompt fits a
    # 16 GiB chip) while attention runs bf16 over a per-layer dequantized
    # scratch; prefill-end compaction dequantizes the kept tokens into the
    # bf16 main pool, so decode runs the full-speed bf16 path. This is the
    # TPU answer to the reference's long_bs1full + staging-cache posture
    # (snapkv.py:205-226) under a much smaller HBM: residency during
    # prefill is int4/int8, residency during decode is bf16-but-tiny.
    # "none" disables; "bfloat16" stages unquantized (testing / big-HBM).
    kv_staging_dtype: str = "none"  # none | int8 | int4 | bfloat16
    num_staging_pages: int | None = None  # None = max_model_len pages + pad
    # prompts above this stage (0 = auto: max(chunk, keep budget + page))
    staging_threshold_tokens: int = 0
    # Weight storage: None = model dtype; "fp8" = block-scaled e4m3
    # ((128,128) blocks + weight_scale_inv, the Qwen3.5 HF checkpoint
    # format — reference quantization/fp8.py:58-129). Halves weight HBM
    # residency/read traffic; matmuls still run bf16 on the MXU.
    weight_quantization: str | None = None

    # --- parallel sizes (reference config.py:597-599) ---------------------
    tensor_parallel_size: int = 1
    expert_parallel_size: int = 1
    data_parallel_size: int = 1

    # --- bucketed-jit decode ("graph") knobs (config.py:635-651) ----------
    decode_bucketed_jit: bool = True
    enforce_eager: bool = False
    decode_batch_buckets: tuple[int, ...] | None = None  # None = pow2 default
    decode_context_bucket_base: int = 1024
    capture_sampling: bool = True  # greedy argmax inside jitted decode step
    # Decode megastep: k decode steps run inside ONE jitted dispatch
    # (lax.scan over steps, sampled tokens fed back on device, one async
    # device->host token fetch per dispatch). TPU-native replacement for
    # per-step CUDA-graph replay (reference decode_cuda_graph.py) that also
    # amortizes host dispatch latency. Sequences finishing mid-megastep waste
    # at most k-1 steps (postprocess truncates at EOS/max_tokens).
    decode_steps_per_dispatch: int = 8

    # --- sparse budgets (config.py:626-628) --------------------------------
    method: str = ""
    num_sink_tokens: int = 64
    num_recent_tokens: int = 512
    decode_keep_tokens: int = 4096
    prefill_keep_tokens: int = 4096

    # --- snapkv / pyramidkv knobs (config.py:658-659,693-697) -------------
    snapkv_obs_window: int = 32
    snapkv_kernel_size: int = 7
    pyramidkv_beta: int = 20

    # --- omnikv / quest knobs (config.py:653-655) --------------------------
    # OmniKV decode reads: False = page-compacted tables bounded by the keep
    # budget (TPU-first; HBM reads proportional to the budget); True = the
    # reference's exact full-width logical token mask (streams the context).
    omnikv_exact_mask: bool = False
    full_attn_layers: tuple[int, ...] = ()
    quest_page_size: int = 16
    quest_skip_layers: int = 2

    # --- rkv / skipkv knobs (config.py:662-690) ----------------------------
    rkv_compression_interval: int = 128
    rkv_query_cache_size: int = 32
    rkv_redundancy_weight: float = 0.1
    # pairwise-similarity redundancy (reference config.py:665-667):
    # links below the threshold are ignored; each token's most recent
    # `recent_similar_keep` similar future tokens are forgiven; the K x K
    # similarity matmul is refused above `max_redundancy_tokens`.
    rkv_similarity_threshold: float = 0.8
    rkv_recent_similar_keep: int = 1
    rkv_max_redundancy_tokens: int = 4096
    skipkv_delimiter_tokens: tuple[int, ...] = ()
    skipkv_steering_alpha: float = 0.0
    skipkv_steering_path: str | None = None  # .npy [L, H] or [H] vector

    # --- deltakv knobs (config.py:699-757) ----------------------------------
    deltakv_checkpoint_path: str | None = None
    deltakv_cluster_ratio: float = 0.1
    deltakv_latent_bits: int = 4  # 4 | 2 (packed latent residuals)
    # full-layer + raw-region KV quantization under deltakv: 0 = follow
    # kv_cache_dtype, 4 -> int4 pool, 8 -> int8 pool (reference KIVI
    # full-layer cache, deltakv_less_memory.py:205-241)
    deltakv_kivi_bits: int = 0
    deltakv_latent_dim: int = 0  # 0 = from checkpoint / auto (io_dim // 4)
    # linear | mlp_gelu | mlp_swiglu | origin ("origin" = no learned
    # compressor; the payload is the exact K∥V−ref residual — reference
    # DELTA_ORIGIN / no-compressor configs)
    deltakv_compressor_arch: str = "linear"
    # each compressed token's reference = mean of its N nearest CAUSAL
    # centers by l2 over (K∥V) (reference deltakv_neighbor_count=4)
    deltakv_neighbor_count: int = 4
    # latent quantization group size (0 = one scale per token payload)
    deltakv_latent_group: int = 0
    deltakv_max_compressed_tokens: int = 32768  # latent capacity per row
    # fold the raw decode tail into latents every N tokens (0 = never;
    # reference tail re-compression — without it the tail grows raw forever)
    deltakv_recompress_interval: int = 1024
    # incremental reconstruction cache (ops/deltakv.py "reconstruction
    # cache"): persistent per-sparse-layer scratch of reconstructed top-k
    # KV; each decode step re-reconstructs only the selection drift. The
    # TPU-native equivalent of the reference's fused reconstruct+writeback
    # kernels (deltakv_kernels.py:2568-3488). "auto" enables it when the
    # scratch (<= rows * sparse_layers * topk * kv_dim * 2B) stays under
    # ~1.5 GiB; "on"/"off" force it.
    deltakv_recon_cache: str = "auto"
    # per-step drift budget of the cache (newly-entering tokens handled
    # incrementally; larger drift falls back to a full rebuild step)
    deltakv_recon_pad: int = 512
    kivi_group_size: int = 32
    kivi_residual_tokens: int = 32

    # --- misc ---------------------------------------------------------------
    enable_prefix_cache: bool = False
    prefix_cache_block_size: int = 0  # 0 = page_size (page-granular blocks)
    attention_impl: str = "auto"  # auto | pallas | ref
    enable_profiler: bool = False
    seed: int = 0
    allow_unknown_config_keys: bool = False

    # Derived (set in __post_init__).
    resolved_prefill_policy: str = field(init=False, default=registry.ALL_CHUNKED)

    @classmethod
    def field_names(cls) -> list[str]:
        return [f.name for f in dataclasses.fields(cls) if f.init]

    def __post_init__(self) -> None:
        self.method = registry.normalize_method(self.method)
        prof = registry.get_profile(self.method)
        self.resolved_prefill_policy = registry.resolve_prefill_policy(
            self.method, self.prefill_policy
        )

        # tuple-ify list-ish fields from JSON/kwargs.
        for name in ("full_attn_layers", "skipkv_delimiter_tokens",
                     "decode_batch_buckets"):
            v = getattr(self, name)
            if isinstance(v, list):
                setattr(self, name, tuple(v))

        if self.page_size <= 0 or self.page_size % 8 != 0:
            raise ValueError(
                f"page_size must be a positive multiple of 8 (TPU sublane "
                f"tile); got {self.page_size}"
            )
        if self.max_model_len % self.page_size != 0:
            # round up so page math is exact.
            self.max_model_len = (
                (self.max_model_len + self.page_size - 1)
                // self.page_size * self.page_size
            )
        if self.chunk_prefill_size <= 0:
            raise ValueError("chunk_prefill_size must be positive")
        if self.chunk_prefill_size % self.page_size != 0:
            raise ValueError(
                f"chunk_prefill_size ({self.chunk_prefill_size}) must be a "
                f"multiple of page_size ({self.page_size}) so chunk ends align "
                f"with page boundaries"
            )
        if self.max_num_batched_tokens < self.chunk_prefill_size:
            raise ValueError(
                "max_num_batched_tokens must be >= chunk_prefill_size"
            )
        if self.decode_steps_per_dispatch < 1:
            raise ValueError("decode_steps_per_dispatch must be >= 1")
        if self.prompt_admission_failure_action not in ("defer", "raise"):
            raise ValueError(
                "prompt_admission_failure_action must be 'defer' or 'raise'"
            )
        if self.dtype not in ("bfloat16", "float32", "float16"):
            raise ValueError(f"unsupported dtype {self.dtype!r}")
        if self.kv_cache_dtype not in ("auto", "bfloat16", "float32",
                                       "int8", "int4", "int2"):
            raise ValueError(f"unsupported kv_cache_dtype {self.kv_cache_dtype!r}")
        if self.weight_quantization not in (None, "fp8"):
            raise ValueError(
                f"unsupported weight_quantization "
                f"{self.weight_quantization!r} (None or 'fp8')"
            )
        if self.kv_staging_dtype not in ("none", "int8", "int4", "bfloat16"):
            raise ValueError(
                f"unsupported kv_staging_dtype {self.kv_staging_dtype!r} "
                f"(none | int8 | int4 | bfloat16)"
            )
        if self.kv_staging_dtype != "none":
            if self.method not in ("snapkv", "pyramidkv"):
                raise ValueError(
                    "kv_staging_dtype requires a prefill-end-compaction "
                    "method (snapkv | pyramidkv): the staging pool is freed "
                    f"by compaction; got method={self.method!r}"
                )
            if self.kv_cache_dtype not in ("auto", "bfloat16", "float32"):
                raise ValueError(
                    "kv_staging_dtype requires a float main pool "
                    "(kv_cache_dtype auto/bfloat16/float32): decode reads "
                    "dequantized compacted tokens from the main pool"
                )
            if self.chunk_prefill_size & (self.chunk_prefill_size - 1):
                raise ValueError(
                    "kv_staging_dtype requires a power-of-two "
                    "chunk_prefill_size: the staged attention scans "
                    "chunk-sized KV blocks and chunk starts must be "
                    f"block-aligned (got {self.chunk_prefill_size})"
                )
            if self.num_staging_pages is None:
                # one max_model_len prompt in flight + margin
                self.num_staging_pages = (
                    self.max_model_len // self.page_size + 2
                )
        if self.kv_cache_dtype in ("int8", "int4") and self.method == "quest":
            raise ValueError(
                f"quest with {self.kv_cache_dtype} KV is unsupported: page "
                f"min/max metadata would live in quantized space (mirror of "
                f"reference quest metadata over fp KV, quest.py:86-97)"
            )
        if not (0.0 < self.hbm_utilization <= 1.0):
            raise ValueError("hbm_utilization must be in (0, 1]")
        for name in ("max_model_len", "chunk_prefill_size",
                     "max_num_batched_tokens", "max_num_seqs_in_batch",
                     "max_decoding_seqs", "page_size",
                     "decode_steps_per_dispatch"):
            if getattr(self, name) < 1:
                raise ValueError(f"{name} must be >= 1")
        for name in ("tensor_parallel_size", "expert_parallel_size",
                     "data_parallel_size"):
            if getattr(self, name) < 1:
                raise ValueError(f"{name} must be >= 1")
        # EP == TP rides the mesh 'model' axis (experts shard alongside
        # TP, parallel/mesh.py moe_* rules). An INDEPENDENT EP degree gets
        # its own 'expert' mesh axis with everything non-expert replicated
        # across it — the reference's EP=N/TP=1 "ep_replicated_kv" group
        # (method_registry.py:59-79), which also requires TP=1 there.
        if (self.expert_parallel_size not in (1, self.tensor_parallel_size)
                and self.tensor_parallel_size != 1):
            raise NotImplementedError(
                f"independent expert_parallel_size "
                f"({self.expert_parallel_size}) requires "
                f"tensor_parallel_size=1 (got {self.tensor_parallel_size})"
                f" — mirroring the reference's ep_replicated_kv matrix; "
                f"EP may otherwise be 1 or equal TP (experts on the model "
                f"axis)"
            )
        # KIVI fidelity knobs. int8/int4 quantize per (token, kv-head) row
        # with the current token held exactly via deferred-scale merge —
        # channel grouping / fp residual do not apply there and non-default
        # settings reject (fail-fast contract). int2 (KIVI-2) implements
        # the full KIVI recipe: K is quantized PER CHANNEL over
        # ``kivi_group_size`` token groups within a page, V per token, and
        # the partial tail page stays raw bf16 (the fp-residual window;
        # its size therefore tracks page_size, not kivi_residual_tokens).
        if self.kv_cache_dtype == "int2":
            if self.kivi_group_size == 0:
                self.kivi_group_size = 32
            if (self.kivi_group_size > self.page_size
                    or self.page_size % self.kivi_group_size):
                raise ValueError(
                    f"kivi_group_size ({self.kivi_group_size}) must divide "
                    f"page_size ({self.page_size}) for int2 per-channel K "
                    f"grouping"
                )
            if self.kivi_residual_tokens not in (0, 32) and \
                    self.kivi_residual_tokens != self.page_size:
                raise NotImplementedError(
                    "kivi_residual_tokens: the int2 fp-residual window is "
                    "the partial tail page (page_size granularity); set 0, "
                    "page_size, or leave default"
                )
            if self.method not in ("", "vanilla", "streamingllm"):
                raise NotImplementedError(
                    f"kv_cache_dtype='int2' supports methods that never "
                    f"move tokens between pages (per-channel page groups "
                    f"cannot be re-gathered without requantization): "
                    f"vanilla | streamingllm, got {self.method!r}"
                )
            if self.chunk_prefill_size % self.page_size:
                raise ValueError(
                    "int2 requires chunk_prefill_size % page_size == 0 "
                    "(prefill chunks must split into whole pages for "
                    "per-channel group quantization)"
                )
            # streamed host-offload prefill is unwired for int2 (page-group
            # quantization cannot adopt streamed token rows); int2's 8x
            # capacity IS the residency story, so the router threshold is
            # disabled and long prompts go through normal admission.
            self.long_prefill_offload_threshold = 0
        else:
            if self.kivi_group_size not in (0, 32):
                raise NotImplementedError(
                    "kivi_group_size: channel grouping applies to the int2 "
                    "(KIVI-2) cache only; int8/int4 quantize per-row "
                    "(set 0 or leave default)"
                )
            if self.kv_cache_dtype in ("int8", "int4") and \
                    self.kivi_residual_tokens not in (0, 32):
                raise NotImplementedError(
                    "kivi_residual_tokens: an fp residual window is "
                    "unimplemented for int8/int4 (the current token is "
                    "already held exactly via deferred-scale merge); set 0 "
                    "or leave default"
                )
        if self.prefix_cache_block_size == 0:
            self.prefix_cache_block_size = self.page_size
        if self.prefix_cache_block_size != self.page_size:
            raise ValueError(
                f"prefix_cache_block_size "
                f"({self.prefix_cache_block_size}) must equal page_size "
                f"({self.page_size}): prefix blocks are page-granular "
                f"(block identity = hash chain of token pages, "
                f"engine/prefix_cache.py)"
            )

        # sparse-budget sanity (reference config.py token-budget checks).
        if prof.name in (registry.STREAMINGLLM, registry.SNAPKV,
                         registry.PYRAMIDKV, registry.RKV, registry.SKIPKV):
            if self.num_sink_tokens + self.num_recent_tokens >= self.max_model_len:
                raise ValueError(
                    "num_sink_tokens + num_recent_tokens must be < max_model_len"
                )
        if prof.needs_prefill_scores:
            if self.snapkv_obs_window <= 0:
                raise ValueError("snapkv_obs_window must be positive")
            if self.snapkv_obs_window > self.chunk_prefill_size:
                raise ValueError(
                    "snapkv_obs_window must fit inside the final prefill chunk"
                )
        if prof.name in (registry.OMNIKV, registry.DELTAKV):
            if not self.full_attn_layers:
                raise ValueError(
                    f"method {prof.name!r} requires full_attn_layers "
                    f"(observation/reference layers)"
                )
            # "first layer must be full" is validated by the executor in
            # LAYER space: layer 0 for flat decoders, the first
            # full-attention layer for hybrid models (whose layer 0 is
            # typically linear attention) — executor.py / hybrid_executor.py.
        if self.global_kv_pool and prof.name != registry.DELTAKV:
            raise ValueError(
                "global_kv_pool is scoped to sparse_method='deltakv' "
                "(the per-layer-residency-asymmetric method; other "
                "methods keep the per-layer pool fast paths)"
            )
        if prof.name == registry.QUEST:
            if self.quest_page_size <= 0 or self.page_size % self.quest_page_size:
                raise ValueError(
                    f"quest_page_size ({self.quest_page_size}) must divide "
                    f"page_size ({self.page_size})"
                )
        if prof.name == registry.DELTAKV:
            if self.deltakv_latent_bits not in (2, 4):
                raise ValueError(
                    "deltakv_latent_bits must be 2 or 4 (packed latents)"
                )
            if self.deltakv_kivi_bits not in (0, 4, 8):
                raise ValueError(
                    "deltakv_kivi_bits must be 0 (follow kv_cache_dtype), "
                    "4 (int4 KIVI pool), or 8 (int8 pool)"
                )
            if self.deltakv_kivi_bits:
                # KIVI full-layer cache: the paged pool (full layers AND the
                # sparse layers' raw sink/recent/tail regions) stores
                # quantized, dequant fused in the kernels (reference
                # deltakv_less_memory.py:205-241 full-layer KIVI blocks)
                want = "int4" if self.deltakv_kivi_bits == 4 else "int8"
                if self.kv_cache_dtype not in ("auto", want):
                    raise ValueError(
                        f"deltakv_kivi_bits={self.deltakv_kivi_bits} "
                        f"conflicts with kv_cache_dtype="
                        f"{self.kv_cache_dtype!r}"
                    )
                self.kv_cache_dtype = want
            if self.deltakv_recompress_interval < 0:
                raise ValueError(
                    "deltakv_recompress_interval must be >= 0 (0 = off)"
                )
            # re-compressed spans are lcm(page_size, stride)-aligned (whole
            # pages splice; cluster boundaries stay stride-aligned) — no
            # config restriction needed, the manager rounds down.
            if self.tensor_parallel_size != 1:
                raise ValueError(
                    "deltakv supports tensor_parallel_size=1 only "
                    "(mirrors reference deltakv_base.py:74)"
                )
            if not (0.0 < self.deltakv_cluster_ratio <= 1.0):
                raise ValueError("deltakv_cluster_ratio must be in (0, 1]")
            if self.deltakv_compressor_arch not in (
                "linear", "mlp_gelu", "mlp_swiglu", "origin"
            ):
                raise ValueError(
                    f"unknown deltakv_compressor_arch "
                    f"{self.deltakv_compressor_arch!r}"
                )
            if self.deltakv_neighbor_count < 1:
                raise ValueError("deltakv_neighbor_count must be >= 1")
            if self.deltakv_recon_cache not in ("auto", "on", "off"):
                raise ValueError(
                    "deltakv_recon_cache must be 'auto', 'on' or 'off' "
                    f"(got {self.deltakv_recon_cache!r})"
                )
            if self.deltakv_recon_pad < 1:
                raise ValueError("deltakv_recon_pad must be >= 1")
            if self.deltakv_latent_group < 0:
                raise ValueError("deltakv_latent_group must be >= 0")
            if self.deltakv_max_compressed_tokens % self.page_size:
                raise ValueError(
                    "deltakv_max_compressed_tokens must be a multiple of "
                    "page_size"
                )
        if self.enable_prefix_cache and not prof.supports_prefix_cache:
            raise ValueError(
                f"prefix cache unsupported for method {prof.name or 'vanilla'!r} "
                f"(supported: vanilla, omnikv, quest)"
            )
        if self.enforce_eager:
            self.decode_bucketed_jit = False
        if self.max_num_seqs_in_gpu is None:
            self.max_num_seqs_in_gpu = self.max_decoding_seqs

        if self.decode_batch_buckets is None:
            self.decode_batch_buckets = tuple(
                _pow2_buckets(self.max_decoding_seqs)
            )

    # --- derived helpers ---------------------------------------------------

    @property
    def method_profile(self) -> registry.MethodProfile:
        return registry.get_profile(self.method)

    @property
    def max_pages_per_seq(self) -> int:
        return self.max_model_len // self.page_size

    def context_page_buckets(self) -> list[int]:
        """Context buckets in PAGES for decode-kernel grids."""
        base_pages = max(self.decode_context_bucket_base // self.page_size, 1)
        return _geometric_context_buckets(base_pages, self.max_pages_per_seq)

    def batch_bucket(self, batch: int) -> int:
        for b in self.decode_batch_buckets:
            if batch <= b:
                return b
        raise ValueError(
            f"batch {batch} exceeds max bucket {self.decode_batch_buckets[-1]}"
        )

    def context_bucket_pages(self, pages: int) -> int:
        for b in self.context_page_buckets():
            if pages <= b:
                return b
        raise ValueError(
            f"context pages {pages} exceed max bucket "
            f"{self.context_page_buckets()[-1]}"
        )

    @staticmethod
    def from_json(path: str, **overrides) -> "Config":
        with open(path) as f:
            data = json.load(f)
        data.update(overrides)
        return Config(**data)
