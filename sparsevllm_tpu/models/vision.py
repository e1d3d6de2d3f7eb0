"""Vision tower + multimodal projector (llava-class).

Re-expresses the reference's vision-language serving path
(src/deltakv/modeling/llava_ov_inference.py — SigLIP tower -> 2-layer MLP
projector -> image-token splice into the language model's input embeddings)
as a TPU-first JAX module:

* patch embedding is a conv-as-matmul: [P*P*3, D] GEMM over unfolded
  patches (one large MXU matmul instead of a conv op);
* the encoder is a ``lax.scan`` over stacked layer params (same compiled
  body for every layer, like models/transformer.py) with pre-LN MHA over
  the full patch sequence — patch counts are small (e.g. 729) so dense
  attention is a single fused XLA attention, no paging needed;
* the projector is the llava MLP (linear -> gelu -> linear) into the
  text model's hidden size.

The engine side consumes only the projector OUTPUT: ``encode_images``
returns ``[B, N_patches, text_hidden]`` rows that LLMEngine.add_request
splices at image-placeholder token positions (see
models/transformer.py prefill_forward ``mm_embeds``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VisionSpec:
    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    intermediate_size: int = 4304
    text_hidden_size: int = 3072
    layer_norm_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny_vision_spec(text_hidden_size: int) -> VisionSpec:
    """Small tower for tests / tiny-random engines."""
    return VisionSpec(
        image_size=32, patch_size=8, hidden_size=64, num_layers=2,
        num_heads=4, intermediate_size=128,
        text_hidden_size=text_hidden_size,
    )


def init_vision_params(spec: VisionSpec, seed: int = 0,
                       dtype: str = "float32") -> dict:
    dt = jnp.dtype(dtype)
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 12)
    d, l = spec.hidden_size, spec.num_layers
    i, n = spec.intermediate_size, spec.num_patches
    pdim = spec.patch_size * spec.patch_size * 3

    def w(k, *shape):
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        return (jax.random.normal(k, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dt)

    return {
        "patch_embed": w(ks[0], pdim, d),
        "pos_embed": (jax.random.normal(ks[1], (n, d), jnp.float32)
                      * 0.02).astype(dt),
        "layers": {
            "ln1_w": jnp.ones((l, d), dt), "ln1_b": jnp.zeros((l, d), dt),
            "wq": w(ks[2], l, d, d), "wk": w(ks[3], l, d, d),
            "wv": w(ks[4], l, d, d), "wo": w(ks[5], l, d, d),
            "ln2_w": jnp.ones((l, d), dt), "ln2_b": jnp.zeros((l, d), dt),
            "fc1": w(ks[6], l, d, i), "fc1_b": jnp.zeros((l, i), dt),
            "fc2": w(ks[7], l, i, d), "fc2_b": jnp.zeros((l, d), dt),
        },
        "post_ln_w": jnp.ones((d,), dt), "post_ln_b": jnp.zeros((d,), dt),
        "proj": {
            "fc1": w(ks[8], d, spec.text_hidden_size),
            "fc1_b": jnp.zeros((spec.text_hidden_size,), dt),
            "fc2": w(ks[9], spec.text_hidden_size, spec.text_hidden_size),
            "fc2_b": jnp.zeros((spec.text_hidden_size,), dt),
        },
    }


def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def patchify(pixels: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] -> [B, N, patch*patch*3] (conv-as-matmul unfold)."""
    b, h, w, c = pixels.shape
    nh, nw = h // patch, w // patch
    x = pixels.reshape(b, nh, patch, nw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, nh, nw, P, P, C]
    return x.reshape(b, nh * nw, patch * patch * c)


def vision_forward(params: dict, pixels: jax.Array,
                   spec: VisionSpec) -> jax.Array:
    """ViT encoder: pixels [B, H, W, 3] -> features [B, N, hidden]."""
    eps = spec.layer_norm_eps
    nh, dh = spec.num_heads, spec.head_dim
    x = patchify(pixels, spec.patch_size).astype(params["patch_embed"].dtype)
    h = x @ params["patch_embed"] + params["pos_embed"]
    b, n, d = h.shape
    scale = dh ** -0.5

    def body(h, lp):
        y = _layer_norm(h, lp["ln1_w"], lp["ln1_b"], eps)
        q = (y @ lp["wq"]).reshape(b, n, nh, dh)
        k = (y @ lp["wk"]).reshape(b, n, nh, dh)
        v = (y @ lp["wv"]).reshape(b, n, nh, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(h.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, d)
        h = h + o @ lp["wo"]
        y = _layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps)
        y = jax.nn.gelu(y @ lp["fc1"] + lp["fc1_b"], approximate=True)
        return h + (y @ lp["fc2"] + lp["fc2_b"]), None

    h, _ = jax.lax.scan(body, h, params["layers"])
    return _layer_norm(h, params["post_ln_w"], params["post_ln_b"], eps)


def project_features(params: dict, feats: jax.Array) -> jax.Array:
    """llava MLP projector: [..., vision_hidden] -> [..., text_hidden]."""
    p = params["proj"]
    y = jax.nn.gelu(feats @ p["fc1"] + p["fc1_b"], approximate=True)
    return y @ p["fc2"] + p["fc2_b"]


def encode_images(params: dict, pixels: jax.Array,
                  spec: VisionSpec) -> jax.Array:
    """pixels [B, H, W, 3] -> spliceable rows [B, N_patches, text_hidden]."""
    return project_features(params, vision_forward(params, pixels, spec))
