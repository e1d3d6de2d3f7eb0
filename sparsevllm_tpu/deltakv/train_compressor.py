"""Train DeltaKV residual compressors (jax/optax).

Re-expresses reference src/deltakv/train_compressor.py:49-150: freeze the
base model, collect pre-RoPE K and V per sparse layer over calibration
prompts, and train per-layer down/up autoencoders on the cluster-residual
reconstruction objective. Differences from the reference (by design):
  * the base model forward is the engine's own functional transformer
    (models/transformer.py) — no HF wrapper classes needed;
  * quantization-aware training: the INT4 pack/unpack (ops/quant.py) runs in
    the loss with a straight-through estimator, so the compressor learns to
    live with the deployed latent precision;
  * optax instead of HF Trainer/DeepSpeed; pjit-able (the loss is pure).

CLI:
    python -m sparsevllm_tpu.deltakv.train_compressor \
        --tiny-random --out /path/ckpt.npz --steps 200 [--latent-dim 16]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..layers.rope import rope_table
from ..models import transformer as tfm
from ..models.spec import ModelSpec
from ..ops import quant
from ..utils import compressor as comp_ops
from ..utils.log import logger


def collect_kv_residuals(
    params,
    spec: ModelSpec,
    prompts: list[list[int]],
    sparse_layers: list[int],
    stride: int,
) -> np.ndarray:
    """Run the base model over prompts; return cluster residuals
    [num_samples, Ls, io_dim] of pre-RoPE (K∥V) vs fixed-stride centers
    (reference collect_kv_before_rope, train_compressor.py)."""
    out = []
    cos, sin = rope_table(
        spec.head_dim, max(len(p) for p in prompts) + 1, spec.rope_theta,
        spec.rope_scaling,
    )
    for prompt in prompts:
        s = len(prompt)
        tokens = jnp.asarray(prompt, jnp.int32)[None]
        h = params["embed"][tokens]
        per_layer = {}

        # trace K/V per layer with a mini forward (dense, no cache)
        def body(h, li):
            lp = jax.tree_util.tree_map(lambda t: t[li], params["layers"])
            x = tfm.rms_norm(h, lp["input_norm"], spec.rms_norm_eps)
            q, k, v = tfm._qkv(x, lp, spec)
            per_layer[li] = (np.asarray(k[0]), np.asarray(v[0]))  # pre-RoPE
            pos = jnp.arange(s)[None]
            q = jax.vmap(lambda qq, pp: qq)(q, pos)  # no-op, keep shapes
            from ..layers.rope import apply_rope

            qr = apply_rope(q, pos, cos, sin)
            kr = apply_rope(k, pos, cos, sin)
            # dense causal attention
            nq, nkv = spec.num_q_heads, spec.num_kv_heads
            g = nq // nkv
            qf = qr.astype(jnp.float32).reshape(1, s, nkv, g, spec.head_dim)
            kf = kr.astype(jnp.float32)
            sc = jnp.einsum("bshgd,bthd->bhgst", qf, kf)
            sc = sc * spec.head_dim ** -0.5
            mask = jnp.tril(jnp.ones((s, s), bool))
            sc = jnp.where(mask[None, None, None], sc, -1e30)
            p = jax.nn.softmax(sc, axis=-1)
            o = jnp.einsum("bhgst,bthd->bshgd", p, v.astype(jnp.float32))
            o = o.reshape(1, s, spec.q_dim).astype(h.dtype)
            h2 = h + o @ lp["wo"]
            x2 = tfm.rms_norm(h2, lp["post_attn_norm"], spec.rms_norm_eps)
            return h2 + tfm._mlp(x2, lp, spec)

        for li in range(spec.num_layers):
            h = body(h, li)

        sample = []
        for li in sparse_layers:
            k, v = per_layer[li]
            kv = np.concatenate([k, v], axis=-1)  # [S, Nkv, 2Dh]
            kv = kv.reshape(s, -1).astype(np.float32)  # [S, io]
            # nearest-causal-center references (mean of 4 neighbors by l2)
            # — MUST match the runtime assignment (ops/deltakv.py
            # compress_layer; reference _cluster_refs): training on
            # positional j//stride residuals mis-scales the compressor.
            centers = kv[::stride]  # [NC, io]
            scores = 2.0 * kv @ centers.T - (centers ** 2).sum(-1)[None]
            cpos = np.arange(centers.shape[0]) * stride
            allowed = cpos[None, :] <= np.arange(s)[:, None]
            scores = np.where(allowed, scores, -np.inf)
            nn = min(4, centers.shape[0])
            fathers = np.argpartition(-scores, nn - 1, axis=1)[:, :nn]
            # early tokens have < nn causal centers: fall back to the own
            # stride group's center for disallowed picks
            picked = np.take_along_axis(scores, fathers, 1)
            own = (np.arange(s) // stride)[:, None]
            fathers = np.where(np.isfinite(picked), fathers, own)
            refs = centers[fathers].mean(axis=1)  # [S, io]
            sample.append(kv - refs)
        out.append(np.stack(sample, axis=1))  # [S, Ls, io]
    return np.concatenate(out, axis=0)


def train_compressors(
    residuals: np.ndarray,  # [N, Ls, io]
    latent_dim: int,
    arch: str = "linear",
    steps: int = 200,
    lr: float = 1e-3,
    batch: int = 256,
    seed: int = 0,
) -> tuple[dict, list[float]]:
    """Quantization-aware reconstruction training; returns (params, losses)."""
    import optax

    n, ls, io = residuals.shape
    comp = comp_ops.init_compressor_params(ls, io, latent_dim, arch, seed)
    if arch == "linear":
        # PCA init: the MSE-optimal linear codec pre-quantization (top
        # right-singular vectors of the residual sample). SGD then only
        # refines under int4 QAT; at latent_dim == io the init is already
        # exactly lossless (orthogonal basis), which makes the
        # identity-capacity control lane a true machinery test instead of
        # an SGD-convergence test (reference train_compressor.py:49-150
        # trains from scratch at scale; this env has ~1e3 steps).
        sample = np.asarray(residuals[: min(n, 8192)], np.float64)
        down_w = np.zeros((ls, io, latent_dim), np.float32)
        up_w = np.zeros((ls, latent_dim, io), np.float32)
        for sl in range(ls):
            _, _, vt = np.linalg.svd(sample[:, sl], full_matrices=False)
            basis = vt[: latent_dim]  # [r<=latent, io]
            r = basis.shape[0]
            down_w[sl, :, :r] = basis.T
            up_w[sl, :r, :] = basis
        comp["down"]["w1"] = jnp.asarray(down_w, comp["down"]["w1"].dtype)
        comp["up"]["w1"] = jnp.asarray(up_w, comp["up"]["w1"].dtype)
    trainable = {"down": comp["down"], "up": comp["up"]}
    opt = optax.adam(lr)
    state = opt.init(trainable)
    data = jnp.asarray(residuals, jnp.float32)

    def loss_fn(tr, x):  # x [B, Ls, io]
        def per_layer(sl):
            layer = {
                "down": jax.tree_util.tree_map(lambda t: t[sl], tr["down"]),
                "up": jax.tree_util.tree_map(lambda t: t[sl], tr["up"]),
            }
            lat = comp_ops.compress_down(layer["down"], arch, x[:, sl])
            # straight-through INT4: forward quantized, gradient identity
            packed, scale, zero = quant.pack_int4_groups(lat, group=latent_dim)
            lat_q = quant.unpack_int4_groups(packed, scale, zero,
                                             group=latent_dim)
            lat = lat + jax.lax.stop_gradient(lat_q - lat)
            rec = comp_ops.reconstruct_up(layer["up"], arch, lat)
            return jnp.mean((rec - x[:, sl]) ** 2)

        return jnp.mean(
            jnp.stack([per_layer(sl) for sl in range(ls)])
        )

    @jax.jit
    def step(tr, st, x):
        loss, grads = jax.value_and_grad(loss_fn)(tr, x)
        updates, st = opt.update(grads, st)
        tr = optax.apply_updates(tr, updates)
        return tr, st, loss

    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        idx = rng.integers(0, n, size=min(batch, n))
        trainable, state, loss = step(trainable, state, data[idx])
        losses.append(float(loss))
        if i % max(steps // 10, 1) == 0:
            logger.info("compressor train step %d loss %.6f", i, loss)
    comp["down"], comp["up"] = trainable["down"], trainable["up"]
    return comp, losses


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="")
    ap.add_argument("--tiny-random", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--latent-dim", type=int, default=0)
    ap.add_argument("--arch", default="linear")
    ap.add_argument("--cluster-ratio", type=float, default=0.1)
    ap.add_argument("--full-attn-layers", default="0")
    ap.add_argument("--num-prompts", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.tiny_random:
        from ..utils.tiny_random import build_tiny_params_and_spec

        params, spec = build_tiny_params_and_spec(None, args.seed, "float32")
    else:
        import transformers

        from ..models.spec import spec_from_hf_config
        from ..models.weights import load_hf_weights

        hf_config = transformers.AutoConfig.from_pretrained(args.model)
        spec = spec_from_hf_config(hf_config)
        params = load_hf_weights(spec, args.model, "float32")

    full = {int(x) for x in args.full_attn_layers.split(",") if x}
    sparse_layers = [i for i in range(spec.num_layers) if i not in full]
    stride = max(int(round(1.0 / args.cluster_ratio)), 1)
    rng = np.random.default_rng(args.seed)
    prompts = [
        rng.integers(3, spec.vocab_size, args.prompt_len).tolist()
        for _ in range(args.num_prompts)
    ]
    residuals = collect_kv_residuals(
        params, spec, prompts, sparse_layers, stride
    )
    io = residuals.shape[-1]
    latent = args.latent_dim or max(io // 4, 16)
    if latent % 2:
        latent += 1
    comp, losses = train_compressors(
        residuals, latent, args.arch, args.steps, seed=args.seed
    )
    comp_ops.save_checkpoint(
        args.out, comp,
        {"cluster_ratio": args.cluster_ratio, "stride": stride,
         "final_loss": losses[-1]},
    )
    logger.info("saved %s (loss %.6f -> %.6f)", args.out, losses[0],
                losses[-1])


if __name__ == "__main__":
    main()
