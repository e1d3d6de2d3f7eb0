"""Block-scaled FP8 (e4m3) weight storage.

TPU re-design of the reference's fine-grained FP8 linear backend
(src/sparsevllm/quantization/fp8.py:58-129): weights are stored as
float8_e4m3fn in (128, 128) blocks with a float32 ``weight_scale_inv``
per block — the exact format Qwen3.5-class FP8 HF checkpoints ship
(quantization_config.quant_method == "fp8", config.py:326-388).

On TPU v5e the MXU has no native fp8 matmul, so the win is HBM: weight
residency and weight read traffic halve vs bf16. Dequantization is a
VPU elementwise pass ``w8 * scale`` that XLA schedules alongside the
matmul; weights enter the MXU as bf16. Scales are kept as *inverse*
scales (multiply to dequantize), matching the HF tensor layout so
checkpoints load without conversion.

Weights are padded up to block multiples at quantization time so the
dequant is a pure reshape-multiply (no gather, no ragged edge blocks);
the pad is sliced off after dequant. Real model dims are multiples of
128, so padding is free outside tiny debug configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BLOCK = 128  # reference backend pins block_size=(128, 128)
E4M3_MAX = 448.0


def quantize(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quantize a linear weight to block-scaled fp8.

    ``w`` is [..., I, O] (leading axes: stacked layers / experts). Returns
    (w8 [..., Ip, Op] float8_e4m3fn, sinv [..., Ip/128, Op/128] float32)
    with Ip/Op padded up to BLOCK multiples.
    """
    *lead, i, o = w.shape
    ip = -(-i // BLOCK) * BLOCK
    op = -(-o // BLOCK) * BLOCK
    wf = jnp.asarray(w, jnp.float32)
    if (ip, op) != (i, o):
        wf = jnp.pad(wf, [(0, 0)] * len(lead) + [(0, ip - i), (0, op - o)])
    blocks = wf.reshape(*lead, ip // BLOCK, BLOCK, op // BLOCK, BLOCK)
    amax = jnp.max(jnp.abs(blocks), axis=(-3, -1), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / E4M3_MAX
    w8 = (blocks / scale).astype(jnp.float8_e4m3fn)
    return (
        w8.reshape(*lead, ip, op),
        scale.squeeze(-1).squeeze(-2).astype(jnp.float32),
    )


def quantize_param_tree_zeros(
    layers: dict, names=None
) -> tuple[dict, dict]:
    """fp8 tree for ZERO-initialized synthetic weights WITHOUT reading the
    bf16 originals.

    On the axon TPU backend a ``jnp.zeros`` buffer materializes lazily;
    once committed (first read) and then freed, its HBM is NEVER
    reclaimed by the allocator (scripts/probe_real_hbm.py). Running
    ``quantize_param_tree`` over a synthetic zeros tree therefore leaked
    the whole bf16 tree (~14 GiB at 7B) — the r4 7B north-star lane's
    first-prefill ResourceExhausted. This constructor builds the fp8
    payload + unit sinv directly (zeros quantize to zeros), so the bf16
    leaves are never read and stay virtual until garbage-collected."""
    names = names or GENERIC_WEIGHT_NAMES
    out = dict(layers)
    shapes: dict[str, tuple[int, int]] = {}
    for name in names:
        w = out.get(name)
        if w is None:
            continue
        *lead, i, o = w.shape
        ip = -(-i // BLOCK) * BLOCK
        op = -(-o // BLOCK) * BLOCK
        out[name] = jnp.zeros((*lead, ip, op), jnp.float8_e4m3fn)
        out[name + "_sinv"] = jnp.ones(
            (*lead, ip // BLOCK, op // BLOCK), jnp.float32
        )
        shapes[name] = (i, o)
    return out, shapes


def dequant(
    w8: jax.Array,  # [..., Ip, Op] float8_e4m3fn
    sinv: jax.Array,  # [..., Ip/128, Op/128] float32
    out_shape: tuple[int, int],
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Reconstruct [..., I, O] at ``dtype`` (I, O = out_shape, pre-pad)."""
    *lead, ip, op = w8.shape
    i, o = out_shape
    blocks = w8.astype(jnp.float32).reshape(
        *lead, ip // BLOCK, BLOCK, op // BLOCK, BLOCK
    )
    wf = blocks * sinv[..., :, None, :, None]
    wf = wf.reshape(*lead, ip, op)
    if (ip, op) != (i, o):
        wf = wf[..., :i, :o]
    return wf.astype(dtype)


# matmul weights eligible for fp8 storage. Norms, biases, embeddings,
# routers/gates (tiny), and conv kernels stay at model dtype — matching
# the reference's scope (only Linear layers run the fp8 backend).
GENERIC_WEIGHT_NAMES = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
    "moe_w_gate", "moe_w_up", "moe_w_down",
)
HYBRID_WEIGHT_NAMES = GENERIC_WEIGHT_NAMES + (
    "in_proj_qkvz", "in_proj_ba", "out_proj",
    "shared_w_gate", "shared_w_up", "shared_w_down",
)


def quantize_param_tree(
    layers: dict, names: tuple[str, ...] = GENERIC_WEIGHT_NAMES
) -> tuple[dict, dict]:
    """Replace each named weight with an fp8 payload plus a
    ``<name>_sinv`` scale entry. Non-listed params pass through untouched.
    Returns (new_layers, shapes) where shapes[name] is the true pre-pad
    (I, O) — static metadata the forward needs to slice off block padding
    (jit tracers cannot recover it from the padded array)."""
    out = dict(layers)
    shapes: dict[str, tuple[int, int]] = {}
    for name in names:
        w = out.get(name)
        if w is None:
            continue
        w8, sinv = quantize(w)
        out[name] = w8
        out[name + "_sinv"] = sinv
        shapes[name] = (int(w.shape[-2]), int(w.shape[-1]))
    return out, shapes


def dequant_layer_dict(lp: dict, shapes: dict | None, dtype) -> dict:
    """Dequantize every fp8 entry of a per-layer param dict (hybrid model
    path, where layers are a Python list of dicts rather than stacked)."""
    if not shapes:
        return lp
    out = {k: v for k, v in lp.items() if not k.endswith("_sinv")}
    for name, shape in shapes.items():
        sinv = lp.get(name + "_sinv")
        if sinv is not None:
            out[name] = dequant(lp[name], sinv, shape, dtype)
    return out


def maybe_dequant(
    xs: dict, name: str, out_shape: tuple[int, int], dtype=jnp.bfloat16
) -> jax.Array:
    """Fetch a (possibly fp8 block-scaled) weight from a scan xs slice.

    ``out_shape`` is the true (I, O) of the weight — static, known to the
    model code from its spec — used to slice off block padding.
    """
    w = xs[name]
    sinv = xs.get(name + "_sinv")
    if sinv is None:
        return w
    return dequant(w, sinv, out_shape, dtype)
