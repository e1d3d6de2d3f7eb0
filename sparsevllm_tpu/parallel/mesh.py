"""Device mesh + GSPMD sharding for the executor state.

TPU-native replacement for the reference's process-per-rank parallelism
(src/sparsevllm/distributed/parallel_context.py + model_runner.py SHM RPC):
one controller drives a single jitted SPMD program; sharding annotations
(``jax.sharding.NamedSharding``) tell GSPMD where tensors live and XLA
inserts the ICI collectives (psum for row-parallel matmul outputs,
all-gathers at sharding boundaries) that the reference issued by hand through
NCCL (parallel_context.py:134-248).

Mesh axes:
  * ``model`` — tensor parallelism. Column-sharded q/k/v/gate/up projections,
    row-sharded o/down projections (the classic Megatron split the reference
    implements as Column/RowParallelLinear, layers/linear.py:14-397), KV cache
    sharded over kv heads (reference base.py:194 "KV heads divided by TP").
  * ``data`` — data parallelism over the *batch dimension of a step plan*
    (the reference reserves DP groups but never shards requests in-engine,
    SURVEY §2.5; here DP is a first-class in-program batch shard).

Every rule degrades to replication when a dimension is not divisible by the
axis size, so arbitrary model/mesh combinations still compile (a warning is
logged); the fast path is the evenly divisible one.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.log import logger

DATA = "data"
MODEL = "model"
# independent expert-parallel axis (reference method_registry.py:59-79
# "ep_replicated_kv": EP=N with TP=1, experts sharded, everything else
# incl. KV replicated). Present in the mesh only when
# expert_parallel_size differs from tensor_parallel_size; when EP == TP
# experts ride the model axis as before.
EXPERT = "expert"

# Process-wide current mesh: the executor registers its mesh here so model
# code (e.g. the shard_map MoE dispatch in models/transformer.py) can bind
# per-device program blocks at trace time without threading the Mesh object
# through the (hashable, static) StepRuntime.
_CURRENT_MESH: Mesh | None = None


def set_current_mesh(mesh: Mesh | None) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def get_current_mesh() -> Mesh | None:
    return _CURRENT_MESH

# Sharding rules for stacked per-layer params ([L, ...] leading layer axis).
_LAYER_RULES: dict[str, P] = {
    # column-parallel (output-feature sharded)
    "wq": P(None, None, MODEL),
    "wk": P(None, None, MODEL),
    "wv": P(None, None, MODEL),
    "w_gate": P(None, None, MODEL),
    "w_up": P(None, None, MODEL),
    "bq": P(None, MODEL),
    "bk": P(None, MODEL),
    "bv": P(None, MODEL),
    # row-parallel (input-feature sharded; XLA inserts the psum)
    "wo": P(None, MODEL, None),
    "w_down": P(None, MODEL, None),
    # MoE (experts stacked on axis 1: [L, E, ...]) — expert-parallel over the
    # same mesh axis (reference qwen3_moe "ep_replicated_kv",
    # method_registry.py:59-79).
    "moe_w_gate": P(None, MODEL, None, None),
    "moe_w_up": P(None, MODEL, None, None),
    "moe_w_down": P(None, MODEL, None, None),
    "router": P(),
}

_TOP_RULES: dict[str, P] = {
    "embed": P(),  # replicated (tied lm_head needs full vocab anyway)
    "final_norm": P(),
    "lm_head": P(None, MODEL),  # vocab-column sharded; logits gather by GSPMD
    "lm_head_sinv": P(None, MODEL),  # fp8 block scales follow their payload
}


def build_mesh(tp: int = 1, dp: int = 1, ep: int = 1,
               devices=None) -> Mesh:
    """(data[, expert], model) mesh over the first tp*dp*ep devices.

    Axis order puts ``model`` innermost so TP collectives ride the
    fastest/nearest ICI links (scaling-book recipe: contiguous inner
    axis). An ``expert`` axis appears only for an INDEPENDENT EP degree
    (ep not in {1, tp} — the reference's EP=N/TP=1 replicated-KV group,
    method_registry.py:59-79); expert-stacked weights shard over it and
    every other array replicates across it.
    """
    if devices is None:
        devices = jax.devices()
    if ep in (1, tp):
        need = tp * dp
        if len(devices) < need:
            raise ValueError(
                f"mesh needs {need} devices (tp={tp} x dp={dp}); "
                f"only {len(devices)} visible"
            )
        arr = np.asarray(devices[:need]).reshape(dp, tp)
        return Mesh(arr, (DATA, MODEL))
    need = tp * dp * ep
    if len(devices) < need:
        raise ValueError(
            f"mesh needs {need} devices (tp={tp} x dp={dp} x ep={ep}); "
            f"only {len(devices)} visible"
        )
    arr = np.asarray(devices[:need]).reshape(dp, ep, tp)
    return Mesh(arr, (DATA, EXPERT, MODEL))


def expert_axis(mesh: Mesh) -> str:
    """The mesh axis experts shard over: the dedicated ``expert`` axis
    when present, else ``model`` (EP == TP collapse)."""
    return EXPERT if EXPERT in mesh.axis_names else MODEL


def _fit(spec: P, shape: tuple[int, ...], mesh: Mesh, what: str) -> P:
    """Downgrade sharded dims that don't divide evenly to replicated."""
    dims = list(spec) + [None] * (len(shape) - len(spec))
    out = []
    for d, (axis, size) in enumerate(zip(dims, shape)):
        if axis is None:
            out.append(None)
            continue
        ax_size = mesh.shape[axis]
        if size % ax_size == 0:
            out.append(axis)
        elif size == 1:
            # a singleton dim (bs-1 staged prefill plans) can only be
            # replicated; that is not a lost sharding — no warning.
            out.append(None)
        else:
            logger.warning(
                "%s dim %d (%d) not divisible by mesh axis %r (%d); "
                "replicating that dim", what, d, size, axis, ax_size,
            )
            out.append(None)
    return P(*out)


def _layer_rule(name: str, mesh: Mesh) -> P:
    rule = _LAYER_RULES.get(name, P())
    if name.startswith("moe_") and expert_axis(mesh) == EXPERT:
        # independent EP: expert-stacked weights move to the expert axis
        rule = P(*(EXPERT if a == MODEL else a for a in rule))
    return rule


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching the params pytree."""
    out: dict = {}
    for k, v in params.items():
        if k == "layers":
            # fp8 block-scale planes (`<name>_sinv`, ops/fp8.py) carry the
            # same rank and axis meaning as their payload at 1/128 scale:
            # shard them by the base weight's rule. _fit replicates them
            # when the block count doesn't divide the mesh axis.
            out[k] = {
                lk: NamedSharding(
                    mesh, _fit(
                        _layer_rule(
                            lk.removesuffix("_sinv") if lk.endswith("_sinv")
                            else lk, mesh
                        ), lv.shape, mesh, f"layers.{lk}"
                    )
                )
                for lk, lv in v.items()
            }
        else:
            out[k] = NamedSharding(
                mesh, _fit(_TOP_RULES.get(k, P()), v.shape, mesh, k)
            )
    return out


def kv_sharding(mesh: Mesh, kv_shape: tuple[int, ...]) -> NamedSharding:
    """[L, pages, P, Nkv, Dh] sharded over kv heads on the model axis.

    The flat-lane int4 cache is 4-D [L, pages, P, Nkv*Dh//2] with heads as
    contiguous lane windows (ops/quant.py int4 section): sharding the flat
    dim over the model axis splits it into whole-head blocks, matching the
    scales' Nkv sharding."""
    if len(kv_shape) == 4:
        spec = P(None, None, None, MODEL)
    else:
        spec = P(None, None, None, MODEL, None)
    return NamedSharding(mesh, _fit(spec, kv_shape, mesh, "kv_cache"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_executor_state(ex) -> None:
    """Apply shardings to a ModelExecutor's persistent device state in place."""
    mesh = ex.mesh
    ex.params = jax.device_put(ex.params, param_shardings(ex.params, mesh))
    kvs = kv_sharding(mesh, ex.k_cache.shape)
    ex.k_cache = jax.device_put(ex.k_cache, kvs)
    ex.v_cache = jax.device_put(ex.v_cache, kvs)
    ex.tables = jax.device_put(ex.tables, replicated(mesh))
    if getattr(ex, "kv_scales", None) is not None:
        if isinstance(ex.kv_scales, tuple):
            # KIVI-2 pytree (V planes, K channel scales, raw tail):
            # replicate — int2 is scoped to vanilla/streamingllm and its
            # arrays are small relative to the payload pools
            ex.kv_scales = jax.device_put(ex.kv_scales, replicated(mesh))
        else:
            # [2, L, pages, Nkv, P] — kv heads on model, like the cache
            ex.kv_scales = jax.device_put(
                ex.kv_scales,
                NamedSharding(mesh, _fit(
                    P(None, None, None, MODEL, None),
                    ex.kv_scales.shape, mesh, "kv_scales")),
            )
    # staged-prefill pool: same placement rules as the main cache
    # (int4 flat-lane rows keep head-contiguous lanes, so the lane axis
    # shards over model iff divisible — _fit falls back to replicate)
    for name in ("k_stage", "v_stage"):
        arr = getattr(ex, name, None)
        if arr is not None:
            spec = (P(None, None, None, MODEL, None) if arr.ndim == 5
                    else P(None, None, None, MODEL))
            setattr(ex, name, jax.device_put(
                arr, NamedSharding(mesh, _fit(spec, arr.shape, mesh, name))
            ))
    if getattr(ex, "stage_scales", None) is not None:
        ex.stage_scales = jax.device_put(
            ex.stage_scales,
            NamedSharding(mesh, _fit(P(None, None, None, MODEL, None),
                                     ex.stage_scales.shape, mesh,
                                     "stage_scales")),
        )
    if getattr(ex, "dk_state", None) is not None:
        # DeltaKV latent/center state: replicated (deltakv is TP=1 by
        # contract — reference deltakv_base.py:74; DP shards the batch
        # via the step plans, not the state rows)
        ex.dk_state = jax.device_put(ex.dk_state, replicated(mesh))
        ex.dk_comp = jax.device_put(ex.dk_comp, replicated(mesh))
    if getattr(ex, "dk_recon", None) is not None:
        # reconstruction cache follows dk_state's placement (row-table
        # indexed: rows are not sharded)
        ex.dk_recon = jax.device_put(ex.dk_recon, replicated(mesh))
    if getattr(ex, "query_cache", None) is not None:
        # [L, R, Qc, Nq, Dh] — q heads on the model axis
        ex.query_cache = jax.device_put(
            ex.query_cache,
            NamedSharding(mesh, _fit(P(None, None, None, MODEL, None),
                                     ex.query_cache.shape, mesh,
                                     "query_cache")),
        )
    if getattr(ex, "quest_meta", None) is not None:
        # [2, L, pages, Nkv, Dh] — kv heads on the model axis, like the cache
        ex.quest_meta = jax.device_put(
            ex.quest_meta,
            NamedSharding(mesh, _fit(P(None, None, None, MODEL, None),
                                     ex.quest_meta.shape, mesh, "quest_meta")),
        )
    logger.info(
        "sharded executor state over mesh %s (kv: %s)",
        dict(mesh.shape), kvs.spec,
    )


# Step-plan shardings: batch dim over "data". Keys absent here are replicated.
_PREFILL_PLAN_RULES: dict[str, P] = {
    "token_ids": P(DATA, None),
    "positions": P(DATA, None),
    "dest_slot": P(DATA, None),
    "row_ids": P(DATA),
    "ctx_lens": P(DATA),
    "new_lens": P(DATA),
    "fresh": P(DATA),  # hybrid prefill: rows starting a fresh prompt
    "temps": P(DATA),
    "top_k": P(DATA),
    "top_p": P(DATA),
}

_DECODE_PLAN_RULES: dict[str, P] = {
    "token_ids0": P(DATA),
    "positions0": P(DATA),
    "row_ids": P(DATA),
    "dest": P(None, DATA, None),  # [L, B, k]
    "ctx_start": P(None, DATA),  # [L, B]
    "temps": P(DATA),
    "top_k": P(DATA),
    "top_p": P(DATA),
}


def put_plan(mesh: Mesh, plan: dict, phase: str) -> dict:
    """device_put a host step plan with DP batch shardings."""
    rules = _PREFILL_PLAN_RULES if phase == "prefill" else _DECODE_PLAN_RULES
    out = {}
    for k, v in plan.items():
        spec = _fit(rules.get(k, P()), np.shape(v), mesh, f"plan.{k}")
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


# ------------------------------------------------------------------ hybrid
# Per-layer dicts are UNSTACKED for the hybrid model (python-list layers,
# models/qwen3_next.py), so these specs have no leading layer dim. GSPMD
# propagates/reshards through the GDN chunked scan automatically; these
# annotations place the big matmuls (in/out projections, MLP, shared
# experts) on the classic Megatron column/row split.
_HYBRID_LAYER_RULES: dict[str, P] = {
    "wq": P(None, MODEL), "wk": P(None, MODEL), "wv": P(None, MODEL),
    "wo": P(MODEL, None),
    "w_gate": P(None, MODEL), "w_up": P(None, MODEL),
    "w_down": P(MODEL, None),
    "in_proj_qkvz": P(None, MODEL), "in_proj_ba": P(None, MODEL),
    "out_proj": P(MODEL, None),
    "conv_w": P(MODEL, None),  # [C, K]: conv channels shard with heads
    "dt_bias": P(MODEL), "norm_w": P(MODEL),
    "moe_w_gate": P(MODEL, None, None), "moe_w_up": P(MODEL, None, None),
    "moe_w_down": P(MODEL, None, None),
    "shared_w_gate": P(None, MODEL), "shared_w_up": P(None, MODEL),
    "shared_w_down": P(MODEL, None), "shared_gate": P(),
    "router": P(),
}


def shard_hybrid_executor_state(ex) -> None:
    """Shardings for a HybridExecutor: layer-list params, KV pools for the
    full-attention layers, and the recurrent conv/delta state rows."""
    mesh = ex.mesh

    def layer_sharding(lp: dict) -> dict:
        return {
            k: NamedSharding(
                mesh, _fit(_HYBRID_LAYER_RULES.get(k, P()), v.shape, mesh,
                           f"hybrid.{k}")
            )
            for k, v in lp.items()
        }

    shardings = {
        k: (
            [layer_sharding(lp) for lp in v] if k == "layers"
            else NamedSharding(
                mesh, _fit(_TOP_RULES.get(k, P()), v.shape, mesh, k)
            )
        )
        for k, v in ex.params.items()
    }
    ex.params = jax.device_put(ex.params, shardings)
    kvs = kv_sharding(mesh, ex.k_cache.shape)
    ex.k_cache = jax.device_put(ex.k_cache, kvs)
    ex.v_cache = jax.device_put(ex.v_cache, kvs)
    ex.tables = jax.device_put(ex.tables, replicated(mesh))
    # conv [Llin, R, K-1, C]: channels on model; rec [Llin, R, Hv, Dk, Dv]:
    # value heads on model (row tables replicate over data — rows are not
    # batch-aligned)
    ex.conv_states = jax.device_put(
        ex.conv_states,
        NamedSharding(mesh, _fit(P(None, None, None, MODEL),
                                 ex.conv_states.shape, mesh, "conv_states")),
    )
    ex.rec_states = jax.device_put(
        ex.rec_states,
        NamedSharding(mesh, _fit(P(None, None, MODEL, None, None),
                                 ex.rec_states.shape, mesh, "rec_states")),
    )
    logger.info(
        "sharded hybrid executor state over mesh %s", dict(mesh.shape)
    )
