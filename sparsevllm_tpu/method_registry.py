"""Sparse-method registry: canonical names, aliases, per-method policies.

Re-expresses the reference registry contract
(src/sparsevllm/method_registry.py:14-239): the registry is the single owner of

  * the canonical sparse-method names and their aliases,
  * which methods support prefix caching,
  * which methods support bucketed ("graph") decode,
  * the per-method default prefill scheduling policy, which the resolver
    refuses to override with a non-default value (fail-fast rule).

TPU adaptation: "decode graph support" here means the method produces
shape-stable step plans so the bucketed-jit decode executor can reuse compiled
programs (the reference's CUDA-graph criterion, method_registry.py:82-92).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Canonical method names (reference method_registry.py:32-42).
VANILLA = ""
STREAMINGLLM = "streamingllm"
SNAPKV = "snapkv"
PYRAMIDKV = "pyramidkv"
OMNIKV = "omnikv"
QUEST = "quest"
RKV = "rkv"
SKIPKV = "skipkv"
DELTAKV = "deltakv"

CANONICAL_METHODS: tuple[str, ...] = (
    VANILLA,
    STREAMINGLLM,
    SNAPKV,
    PYRAMIDKV,
    OMNIKV,
    QUEST,
    RKV,
    SKIPKV,
    DELTAKV,
)

# Aliases accepted on input, normalized to canonical (method_registry.py:14-45).
METHOD_ALIASES: dict[str, str] = {
    "vanilla": VANILLA,
    "dense": VANILLA,
    "full": VANILLA,
    "none": VANILLA,
    "attention-sink": STREAMINGLLM,
    "attention_sink": STREAMINGLLM,
    "streaming-llm": STREAMINGLLM,
    "snap-kv": SNAPKV,
    "pyramid-kv": PYRAMIDKV,
    "omni-kv": OMNIKV,
    "delta-kv": DELTAKV,
    "r-kv": RKV,
    "skip-kv": SKIPKV,
}

# Prefill scheduling policies (reference method_registry.py:94-119).
ALL_CHUNKED = "all_chunked"
LONG_BS1FULL_SHORT_BATCH = "long_bs1full_short_batch"
PREFILL_POLICIES: tuple[str, ...] = (ALL_CHUNKED, LONG_BS1FULL_SHORT_BATCH)

# Methods whose KV state is reusable across requests (prefix cache whitelist,
# reference method_registry.py:47). Eviction methods mutate history so their
# prefixes are not reusable.
PREFIX_CACHE_METHODS: frozenset[str] = frozenset({VANILLA, OMNIKV, QUEST})

# Methods with shape-stable decode plans → bucketed-jit decode supported
# (reference decode-graph support sets, method_registry.py:82-92). All our
# methods build padded static-shape plans, but RKV/SkipKV periodic joint
# eviction re-plans mid-decode; they still run bucketed because eviction is a
# host-side re-plan between steps.
BUCKETED_DECODE_METHODS: frozenset[str] = frozenset(CANONICAL_METHODS)


@dataclass(frozen=True)
class MethodProfile:
    """Static per-method behavior the scheduler and cache manager key off."""

    name: str
    # Default prefill policy (reference method_registry.py:94-119: only
    # pyramidkv + deltakv default to long_bs1full_short_batch).
    default_prefill_policy: str = ALL_CHUNKED
    # Physical eviction at prefill end (snapkv family).
    prefill_eviction: bool = False
    # Physical eviction during decode (streamingllm window, rkv/skipkv joint).
    decode_eviction: bool = False
    # Logical decode-time token/page selection (omnikv/quest/deltakv).
    decode_selection: bool = False
    # Needs prefill attention-score accumulation (snapkv family observation
    # window; reference sparse_controller.py:1398-1448).
    needs_prefill_scores: bool = False
    # Needs decode attention-score emission on observation layers (omnikv,
    # deltakv, rkv triggers).
    needs_decode_scores: bool = False
    # Whole-remaining-prompt final prefill required (pyramidkv staging,
    # deltakv full-prefill plan).
    requires_full_tail_prefill: bool = False
    supports_prefix_cache: bool = False
    supports_bucketed_decode: bool = True
    # Extra config keys this method consumes (validated in Config).
    knobs: tuple[str, ...] = ()


_PROFILES: dict[str, MethodProfile] = {
    VANILLA: MethodProfile(name=VANILLA, supports_prefix_cache=True),
    STREAMINGLLM: MethodProfile(
        name=STREAMINGLLM,
        prefill_eviction=True,
        decode_eviction=True,
    ),
    SNAPKV: MethodProfile(
        name=SNAPKV,
        prefill_eviction=True,
        decode_eviction=True,
        needs_prefill_scores=True,
        knobs=("prefill_keep_tokens", "snapkv_obs_window", "snapkv_kernel_size"),
    ),
    PYRAMIDKV: MethodProfile(
        name=PYRAMIDKV,
        default_prefill_policy=LONG_BS1FULL_SHORT_BATCH,
        prefill_eviction=True,
        decode_eviction=True,
        needs_prefill_scores=True,
        requires_full_tail_prefill=True,
        knobs=("prefill_keep_tokens", "snapkv_obs_window", "pyramidkv_beta"),
    ),
    OMNIKV: MethodProfile(
        name=OMNIKV,
        decode_selection=True,
        needs_decode_scores=True,
        supports_prefix_cache=True,
        knobs=("full_attn_layers", "decode_keep_tokens"),
    ),
    QUEST: MethodProfile(
        name=QUEST,
        decode_selection=True,
        supports_prefix_cache=True,
        knobs=("quest_page_size", "quest_skip_layers", "decode_keep_tokens"),
    ),
    RKV: MethodProfile(
        name=RKV,
        decode_eviction=True,
        needs_prefill_scores=True,
        needs_decode_scores=True,
        knobs=("rkv_compression_interval", "rkv_query_cache_size",
               "rkv_redundancy_weight"),
    ),
    SKIPKV: MethodProfile(
        name=SKIPKV,
        decode_eviction=True,
        needs_prefill_scores=True,
        needs_decode_scores=True,
        knobs=("skipkv_delimiter_tokens", "skipkv_steering_alpha"),
    ),
    DELTAKV: MethodProfile(
        name=DELTAKV,
        default_prefill_policy=LONG_BS1FULL_SHORT_BATCH,
        decode_selection=True,
        needs_decode_scores=True,
        requires_full_tail_prefill=True,
        knobs=("full_attn_layers", "decode_keep_tokens",
               "deltakv_checkpoint_path", "deltakv_cluster_ratio",
               "deltakv_latent_bits", "deltakv_kivi_bits"),
    ),
}


def normalize_method(method: str | None) -> str:
    """Canonicalize a method name; raise on unknown (fail-fast)."""
    if method is None:
        return VANILLA
    m = method.strip().lower()
    m = METHOD_ALIASES.get(m, m)
    if m not in _PROFILES:
        raise ValueError(
            f"Unknown sparse method {method!r}. Known methods: "
            f"{sorted(n or 'vanilla' for n in CANONICAL_METHODS)} "
            f"(aliases: {sorted(METHOD_ALIASES)})"
        )
    return m


def get_profile(method: str) -> MethodProfile:
    return _PROFILES[normalize_method(method)]


def resolve_prefill_policy(method: str, requested: str | None) -> str:
    """Resolve the prefill policy for a method.

    Mirrors the reference's refusal to accept a non-default override
    (method_registry.py:219-238): each method owns its policy; an explicit
    request must equal the method default or be None.
    """
    prof = get_profile(method)
    if requested is None:
        return prof.default_prefill_policy
    if requested not in PREFILL_POLICIES:
        raise ValueError(
            f"Unknown prefill policy {requested!r}; known: {PREFILL_POLICIES}"
        )
    if requested != prof.default_prefill_policy:
        raise ValueError(
            f"Method {prof.name or 'vanilla'!r} owns its prefill policy "
            f"({prof.default_prefill_policy!r}); refusing override to "
            f"{requested!r}. Remove the override or change the method."
        )
    return requested


def supports_prefix_cache(method: str) -> bool:
    return normalize_method(method) in PREFIX_CACHE_METHODS
