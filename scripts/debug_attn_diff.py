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
print("attn impl:", hf.config._attn_implementation)
spec = spec_from_hf_config(hf_config)
params = params_from_torch_state_dict(spec, hf.state_dict(), "float32")
cos, sin = rope_table(spec.head_dim, 4096, spec.rope_theta, spec.rope_scaling)

rng = np.random.default_rng(1)
T = 13
ids = rng.integers(1, cfg["vocab_size"], T).astype(np.int64)

capt = {}
lyr = hf.model.layers[0]
def mk(name):
    def hook(mod, inp, out):
        capt[name] = out[0] if isinstance(out, tuple) else out
    return hook
lyr.input_layernorm.register_forward_hook(mk("ln"))
lyr.self_attn.q_proj.register_forward_hook(mk("q"))
lyr.self_attn.k_proj.register_forward_hook(mk("k"))
lyr.self_attn.v_proj.register_forward_hook(mk("v"))
lyr.self_attn.register_forward_hook(mk("attn_out"))
rotemb = hf.model.rotary_emb
def rope_hook(mod, inp, out):
    capt["cos"], capt["sin"] = out
rotemb.register_forward_hook(rope_hook)

with torch.no_grad():
    out = hf(torch.tensor(ids[None]))

x = jnp.asarray(np.asarray(params["embed"])[ids])
lp = {k: v[0] for k, v in params["layers"].items()}
xn = tfm.rms_norm(x, lp["input_norm"], spec.rms_norm_eps)
print("ln diff", np.abs(np.asarray(xn) - capt["ln"][0].numpy()).max())
q, k, v = tfm._qkv(xn, lp, spec)
print("q diff", np.abs(np.asarray(q.reshape(T, -1)) - capt["q"][0].numpy()).max())
print("v diff", np.abs(np.asarray(v.reshape(T, -1)) - capt["v"][0].numpy()).max())
hf_cos = capt["cos"][0].numpy()  # [T, Dh]
my_cos = np.asarray(cos[np.arange(T)])
print("cos diff", np.abs(my_cos - hf_cos[:, :spec.head_dim // 2]).max())
pos = jnp.arange(T)
qr = apply_rope(q[None], pos[None], cos, sin)[0]
kr = apply_rope(k[None], pos[None], cos, sin)[0]
# HF rope result: recompute with their cos/sin
def hf_rope(x, cos_t, sin_t):
    x1, x2 = np.split(x, 2, axis=-1)
    rot = np.concatenate([-x2, x1], axis=-1)
    full = np.concatenate([x1, x2], axis=-1)
    return full * cos_t[:, None, :] + rot * sin_t[:, None, :]
q_np = capt["q"][0].numpy().reshape(T, spec.num_q_heads, spec.head_dim)
q_hf_rot = hf_rope(q_np, hf_cos, capt["sin"][0].numpy())
print("q-rot diff", np.abs(np.asarray(qr) - q_hf_rot).max())
# attention
g = spec.gqa_groups
kk = jnp.repeat(kr, g, axis=1); vv = jnp.repeat(v, g, axis=1)
scores = jnp.einsum("qhd,khd->hqk", qr, kk) * spec.head_dim**-0.5
mask = jnp.tril(jnp.ones((T, T), bool))
scores = jnp.where(mask[None], scores, -1e30)
p = jax.nn.softmax(scores, axis=-1)
o = jnp.einsum("hqk,khd->qhd", p, vv).reshape(T, spec.q_dim)
attn_out = o @ lp["wo"]
print("attn_out diff", np.abs(np.asarray(attn_out) - capt["attn_out"][0].numpy()).max())

# numpy ground truth for the q matmul
ln_np = capt["ln"][0].numpy()
wq_np = np.asarray(lp["wq"])
q_np_ref = ln_np.astype(np.float64) @ wq_np.astype(np.float64)
print("torch q vs np64:", np.abs(capt["q"][0].numpy() - q_np_ref).max())
print("jax   q vs np64:", np.abs(np.asarray(q.reshape(T, -1)) - q_np_ref).max())
my_ln = np.asarray(xn)
print("jax q from my ln vs np64 from my ln:",
      np.abs(np.asarray(q.reshape(T,-1)) - my_ln.astype(np.float64) @ wq_np.astype(np.float64)).max())
wq_torch = hf.model.layers[0].self_attn.q_proj.weight.detach().numpy().T
print("weight diff:", np.abs(wq_torch - wq_np).max())
