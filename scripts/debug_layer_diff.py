import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, torch, jax, jax.numpy as jnp
from sparsevllm_tpu.utils.tiny_random import build_tiny_hf_model, tiny_config
from sparsevllm_tpu.models.spec import spec_from_hf_config
from sparsevllm_tpu.models.weights import params_from_torch_state_dict
from sparsevllm_tpu.models import transformer as tfm
from sparsevllm_tpu.layers.rope import rope_table, apply_rope

cfg = tiny_config(None)
hf_config, hf = build_tiny_hf_model(cfg, 0)
spec = spec_from_hf_config(hf_config)
params = params_from_torch_state_dict(spec, hf.state_dict(), "float32")
cos, sin = rope_table(spec.head_dim, 4096, spec.rope_theta, spec.rope_scaling)

rng = np.random.default_rng(1)
T = 13
ids = rng.integers(1, cfg["vocab_size"], T).astype(np.int64)

with torch.no_grad():
    out = hf(torch.tensor(ids[None]), output_hidden_states=True)
hs = [h[0].numpy() for h in out.hidden_states]  # [L+1][T,H]

# ours, manual layer-by-layer (dense attention, no cache)
x = np.asarray(params["embed"])[ids]
print("embed diff", np.abs(x - hs[0]).max())
pos = jnp.arange(T)
h = jnp.asarray(x)
for l in range(spec.num_layers):
    lp = {k: v[l] for k, v in params["layers"].items()}
    xn = tfm.rms_norm(h, lp["input_norm"], spec.rms_norm_eps)
    q, k, v = tfm._qkv(xn, lp, spec)
    q = apply_rope(q[None], pos[None], cos, sin)[0]
    k = apply_rope(k[None], pos[None], cos, sin)[0]
    # dense attention
    g = spec.gqa_groups
    kk = jnp.repeat(k, g, axis=1)
    vv = jnp.repeat(v, g, axis=1)
    scores = jnp.einsum("qhd,khd->hqk", q, kk) * spec.head_dim**-0.5
    mask = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(mask[None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", p, vv).reshape(T, spec.q_dim)
    h = h + o @ lp["wo"]
    x2 = tfm.rms_norm(h, lp["post_attn_norm"], spec.rms_norm_eps)
    h = h + tfm._mlp(x2, lp, spec)
    print(f"layer {l} out diff", np.abs(np.asarray(h) - hs[l + 1]).max())
hn = tfm.rms_norm(h, params["final_norm"], spec.rms_norm_eps)
logits = np.asarray(tfm.compute_logits(params, hn, spec))
print("logits diff", np.abs(logits - out.logits[0].numpy()).max())
