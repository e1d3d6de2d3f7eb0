"""Weight loading: HF safetensors shards -> layer-stacked JAX params pytree.

Re-expresses the reference loader (src/sparsevllm/utils/loader.py:459+) for the
TPU layout: per-layer HF tensors are transposed to [in, out] (so matmuls are
``x @ w``) and stacked on a leading layer axis for the scan-based decoder.
Also provides tiny-random model construction (reference debug/tiny_random.py):
the HF torch model is built with a fixed seed and converted, so engine-vs-HF
logits parity is exact-by-construction at the weights level.
"""

from __future__ import annotations

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.log import logger
from .spec import ModelSpec

_JNP_DTYPE = {
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "float32": jnp.float32,
}


def _stack(layers: list[np.ndarray]) -> np.ndarray:
    return np.stack(layers, axis=0)


def params_from_tensors(spec: ModelSpec, get, dtype: str):
    """Build the params pytree from a tensor lookup ``get(name) -> np.ndarray``.

    ``get`` must return float32/bf16-convertible numpy arrays in HF layout
    ([out, in] linear weights).
    """
    jdt = _JNP_DTYPE[dtype]

    def w(name):  # transposed linear weight
        return np.ascontiguousarray(get(name).T)

    layer_keys: dict[str, list[np.ndarray]] = {
        "input_norm": [],
        "post_attn_norm": [],
        "wq": [], "wk": [], "wv": [], "wo": [],
    }
    if spec.is_moe:
        layer_keys.update({
            "router": [], "moe_w_gate": [], "moe_w_up": [], "moe_w_down": [],
        })
    else:
        layer_keys.update({"w_gate": [], "w_up": [], "w_down": []})
    if spec.attn_bias:
        layer_keys.update({"bq": [], "bk": [], "bv": []})
    if spec.qk_norm:
        layer_keys.update({"q_norm": [], "k_norm": []})

    for i in range(spec.num_layers):
        pre = f"model.layers.{i}"
        layer_keys["input_norm"].append(get(f"{pre}.input_layernorm.weight"))
        layer_keys["post_attn_norm"].append(
            get(f"{pre}.post_attention_layernorm.weight")
        )
        layer_keys["wq"].append(w(f"{pre}.self_attn.q_proj.weight"))
        layer_keys["wk"].append(w(f"{pre}.self_attn.k_proj.weight"))
        layer_keys["wv"].append(w(f"{pre}.self_attn.v_proj.weight"))
        layer_keys["wo"].append(w(f"{pre}.self_attn.o_proj.weight"))
        if spec.attn_bias:
            layer_keys["bq"].append(get(f"{pre}.self_attn.q_proj.bias"))
            layer_keys["bk"].append(get(f"{pre}.self_attn.k_proj.bias"))
            layer_keys["bv"].append(get(f"{pre}.self_attn.v_proj.bias"))
        if spec.qk_norm:
            layer_keys["q_norm"].append(get(f"{pre}.self_attn.q_norm.weight"))
            layer_keys["k_norm"].append(get(f"{pre}.self_attn.k_norm.weight"))
        if spec.is_moe:
            # router + per-expert FFN stacked on an expert axis
            # (reference models/qwen3_moe.py Qwen3MoePackedExperts:75-197)
            layer_keys["router"].append(w(f"{pre}.mlp.gate.weight"))
            layer_keys["moe_w_gate"].append(np.stack([
                w(f"{pre}.mlp.experts.{e}.gate_proj.weight")
                for e in range(spec.num_experts)
            ]))
            layer_keys["moe_w_up"].append(np.stack([
                w(f"{pre}.mlp.experts.{e}.up_proj.weight")
                for e in range(spec.num_experts)
            ]))
            layer_keys["moe_w_down"].append(np.stack([
                w(f"{pre}.mlp.experts.{e}.down_proj.weight")
                for e in range(spec.num_experts)
            ]))
        else:
            layer_keys["w_gate"].append(w(f"{pre}.mlp.gate_proj.weight"))
            layer_keys["w_up"].append(w(f"{pre}.mlp.up_proj.weight"))
            layer_keys["w_down"].append(w(f"{pre}.mlp.down_proj.weight"))

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), jdt),
        "final_norm": jnp.asarray(get("model.norm.weight"), jdt),
        "layers": {
            k: jnp.asarray(_stack(v), jdt) for k, v in layer_keys.items()
        },
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(w("lm_head.weight"), jdt)
    return params


def _is_fp8_checkpoint(model_path: str) -> bool:
    """True for pre-quantized fp8 checkpoints (the Qwen3.5 ship format:
    config.json quantization_config.quant_method == 'fp8', reference
    config.py:326-388)."""
    cfg_path = os.path.join(model_path, "config.json")
    if not os.path.exists(cfg_path):
        return False
    with open(cfg_path) as f:
        qc = json.load(f).get("quantization_config") or {}
    return qc.get("quant_method") in ("fp8", "fbgemm_fp8")


def load_hf_weights(spec: ModelSpec, model_path: str, dtype: str):
    """Load from a local HF checkpoint directory (safetensors shards).

    Pre-quantized fp8 checkpoints (float8_e4m3fn payload + per-(128,128)
    block ``weight_scale_inv``) are dequantized tensor-by-tensor here; the
    executor re-quantizes into the padded TPU fp8 layout when
    ``weight_quantization='fp8'`` (which the engine forces for such
    checkpoints), so fp8 storage survives end-to-end.
    """
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(
            f"no .safetensors shards under {model_path!r}"
        )
    fp8_ckpt = _is_fp8_checkpoint(model_path)
    # torch framework handles float8 dtypes natively; numpy has no fp8
    handles = [
        safe_open(f, framework="pt" if fp8_ckpt else "numpy") for f in files
    ]
    index: dict[str, int] = {}
    for hi, h in enumerate(handles):
        for name in h.keys():
            index[name] = hi

    if fp8_ckpt:
        import torch

        def get(name: str) -> np.ndarray:
            if name not in index:
                raise KeyError(
                    f"tensor {name!r} not found in checkpoint shards"
                )
            t = handles[index[name]].get_tensor(name)
            sname = name.replace(".weight", ".weight_scale_inv")
            if t.dtype == torch.float8_e4m3fn and sname in index:
                w = t.float()
                sinv = handles[index[sname]].get_tensor(sname).float()
                bo = -(-w.shape[0] // sinv.shape[0])
                bi = -(-w.shape[1] // sinv.shape[1])
                scale = sinv.repeat_interleave(bo, 0).repeat_interleave(
                    bi, 1
                )[: w.shape[0], : w.shape[1]]
                return (w * scale).numpy()
            return t.float().numpy()

        logger.info(
            "loading %d fp8-quantized shards from %s (dequant at load; "
            "executor restores fp8 block storage)", len(files), model_path,
        )
        return params_from_tensors(spec, get, dtype)

    def get(name: str) -> np.ndarray:
        if name not in index:
            raise KeyError(f"tensor {name!r} not found in checkpoint shards")
        t = handles[index[name]].get_tensor(name)
        if t.dtype == np.dtype("V2"):  # raw bf16 comes out as void16
            t = t.view(np.uint16)
        return t

    logger.info(
        "loading %d safetensors shards from %s", len(files), model_path
    )
    return params_from_tensors(spec, _Bf16Adapter(get), dtype)


class _Bf16Adapter:
    """Convert uint16-viewed bf16 tensors to float32 on access."""

    def __init__(self, get):
        self._get = get

    def __call__(self, name: str) -> np.ndarray:
        t = self._get(name)
        if t.dtype == np.uint16:
            # bf16 bits -> fp32 by left-shifting into the high half.
            t = (t.astype(np.uint32) << 16).view(np.float32)
        return t


def params_from_torch_state_dict(spec: ModelSpec, state_dict, dtype: str):
    """Convert a torch state dict (e.g. tiny-random HF model) to params."""
    def get(name: str) -> np.ndarray:
        t = state_dict[name]
        return t.detach().to("cpu").float().numpy()

    return params_from_tensors(spec, get, dtype)


def init_params(spec: ModelSpec, seed: int, dtype: str,
                distribution: str = "normal"):
    """Random init (for standalone benchmarking without a checkpoint).

    ``distribution='zeros'`` builds weights with jnp.zeros directly on device
    — instant even at 7B scale; throughput benchmarks don't depend on weight
    values.
    """
    jdt = _JNP_DTYPE[dtype]
    rng = np.random.default_rng(seed)

    if distribution == "zeros":
        def normal(*shape):
            return jnp.zeros(shape, jdt)
    else:
        def normal(*shape):
            return jnp.asarray(
                rng.normal(0.0, 0.02, size=shape).astype(np.float32), jdt
            )

    l, h, dh = spec.num_layers, spec.hidden_size, spec.head_dim
    layers = {
        "input_norm": jnp.ones((l, h), jdt),
        "post_attn_norm": jnp.ones((l, h), jdt),
        "wq": normal(l, h, spec.q_dim),
        "wk": normal(l, h, spec.kv_dim),
        "wv": normal(l, h, spec.kv_dim),
        "wo": normal(l, spec.q_dim, h),
    }
    if spec.is_moe:
        e, im = spec.num_experts, spec.moe_intermediate_size
        layers.update(
            router=normal(l, h, e),
            moe_w_gate=normal(l, e, h, im),
            moe_w_up=normal(l, e, h, im),
            moe_w_down=normal(l, e, im, h),
        )
    else:
        layers.update(
            w_gate=normal(l, h, spec.intermediate_size),
            w_up=normal(l, h, spec.intermediate_size),
            w_down=normal(l, spec.intermediate_size, h),
        )
    if spec.attn_bias:
        layers.update(
            bq=jnp.zeros((l, spec.q_dim), jdt),
            bk=jnp.zeros((l, spec.kv_dim), jdt),
            bv=jnp.zeros((l, spec.kv_dim), jdt),
        )
    if spec.qk_norm:
        layers.update(
            q_norm=jnp.ones((l, dh), jdt), k_norm=jnp.ones((l, dh), jdt)
        )
    params = {
        "embed": normal(spec.vocab_size, h),
        "final_norm": jnp.ones((h,), jdt),
        "layers": layers,
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = normal(h, spec.vocab_size)
    return params
