"""DeltaKV residual compressor (learned per-layer autoencoder).

Re-expresses reference utils/compressor.py (create_compressor :36-76 —
linear / mlp_gelu / mlp_swiglu down/up pairs) as functional param pytrees:
per sparse layer, a DOWN projection maps a (K∥V residual vs. cluster center)
of width 2*Nkv*Dh to ``latent_dim`` and UP maps back; latents are what the
engine quantizes and stores (ops/deltakv.py).

Params layout (stacked over sparse layers for the scan):
    {"arch": static str,
     "down": {"w1": [Ls, D, latent] (+ "w2" for mlp)}, "up": {...}}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# "origin" = no learned compressor: the payload IS the exact (K∥V − ref)
# residual (reference _origin_codec / DELTA_ORIGIN cache impls,
# cache_pipeline.py:168-172) — the no-checkpoint DeltaKV serving mode.
ARCHS = ("linear", "mlp_gelu", "mlp_swiglu", "origin")


def init_compressor_params(
    num_sparse_layers: int,
    io_dim: int,  # 2 * Nkv * Dh (K and V residuals compressed jointly)
    latent_dim: int,
    arch: str = "linear",
    seed: int = 0,
    dtype=jnp.float32,
    hidden_mult: int = 2,
):
    """Random-init compressor stack (tests / training start point)."""
    if arch not in ARCHS:
        raise ValueError(f"compressor arch {arch!r} not in {ARCHS}")
    rng = np.random.default_rng(seed)
    ls = num_sparse_layers

    def w(*shape):
        scale = (2.0 / (shape[-2] + shape[-1])) ** 0.5
        return jnp.asarray(
            rng.normal(0, scale, size=shape).astype(np.float32), dtype
        )

    if arch == "origin":
        if latent_dim != io_dim:
            raise ValueError(
                f"origin codec stores the raw residual: latent_dim "
                f"({latent_dim}) must equal io_dim ({io_dim})"
            )
        # placeholder leaves so the param pytree shape is stable under jit
        down = {"w1": jnp.ones((ls, 1, 1), dtype)}
        up = {"w1": jnp.ones((ls, 1, 1), dtype)}
    elif arch == "linear":
        down = {"w1": w(ls, io_dim, latent_dim)}
        up = {"w1": w(ls, latent_dim, io_dim)}
    else:
        hid = latent_dim * hidden_mult
        down = {"w1": w(ls, io_dim, hid), "w2": w(ls, hid, latent_dim)}
        if arch == "mlp_swiglu":
            down["w_gate"] = w(ls, io_dim, hid)
        up = {"w1": w(ls, latent_dim, hid), "w2": w(ls, hid, io_dim)}
        if arch == "mlp_swiglu":
            up["w_gate"] = w(ls, latent_dim, hid)
    return {"arch": arch, "down": down, "up": up}


def _apply(block: dict, x: jax.Array, arch: str) -> jax.Array:
    if arch == "origin":
        return x
    if arch == "linear":
        return x @ block["w1"]
    if arch == "mlp_gelu":
        return jax.nn.gelu(x @ block["w1"]) @ block["w2"]
    h = jax.nn.silu(x @ block["w_gate"]) * (x @ block["w1"])
    return h @ block["w2"]


def compress_down(comp_layer: dict, arch: str, residual: jax.Array):
    """residual [..., io_dim] -> latent [..., latent_dim]."""
    return _apply(comp_layer, residual, arch)


def reconstruct_up(comp_layer: dict, arch: str, latent: jax.Array):
    """latent [..., latent_dim] -> residual [..., io_dim]."""
    return _apply(comp_layer, latent, arch)


def layer_slice(comp: dict, idx) -> dict:
    """Select one sparse layer's down/up blocks (traced index ok)."""
    take = lambda t: jax.lax.dynamic_index_in_dim(t, idx, 0, keepdims=False)
    return {
        "down": jax.tree_util.tree_map(take, comp["down"]),
        "up": jax.tree_util.tree_map(take, comp["up"]),
    }


def save_checkpoint(path: str, comp: dict, meta: dict) -> None:
    """npz checkpoint: compressor weights + config metadata."""
    flat = {"__arch__": np.asarray(comp["arch"])}
    for grp in ("down", "up"):
        for k, v in comp[grp].items():
            flat[f"{grp}.{k}"] = np.asarray(v, np.float32)
    for k, v in meta.items():
        flat[f"meta.{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_checkpoint(path: str, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns (compressor params, metadata dict).

    Mirrors reference sync_deltakv_config_from_checkpoint
    (utils/loader.py:186-278): the checkpoint is the source of truth for
    latent_dim / arch, read BEFORE cache allocation.
    """
    z = np.load(path, allow_pickle=False)
    arch = str(z["__arch__"])
    comp = {"arch": arch, "down": {}, "up": {}}
    meta = {}
    for k in z.files:
        if k.startswith("down.") or k.startswith("up."):
            grp, name = k.split(".", 1)
            comp[grp][name] = jnp.asarray(z[k], dtype)
        elif k.startswith("meta."):
            meta[k[5:]] = z[k].item() if z[k].ndim == 0 else z[k]
    meta["latent_dim"] = int(comp["down"]["w1"].shape[-1]) if arch == "linear" \
        else int(comp["up"]["w1"].shape[1])
    meta["arch"] = arch
    return comp, meta
