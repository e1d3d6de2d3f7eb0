"""Smoke: prefill+decode forward vs HF tiny model, no engine involved."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

import numpy as np
import torch
import jax

jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp

from sparsevllm_tpu.utils.tiny_random import (
    build_tiny_hf_model, tiny_config,
)
from sparsevllm_tpu.models.spec import spec_from_hf_config
from sparsevllm_tpu.models.weights import params_from_torch_state_dict
from sparsevllm_tpu.models import transformer as tfm
from sparsevllm_tpu.layers.rope import rope_table

SEED = 0
P = 8  # page size
NUM_PAGES = 64
MP = 16  # max pages per seq


def main():
    cfg = tiny_config(None)
    hf_config, hf_model = build_tiny_hf_model(cfg, SEED)
    spec = spec_from_hf_config(hf_config)
    params = params_from_torch_state_dict(spec, hf_model.state_dict(), "float32")
    cos, sin = rope_table(spec.head_dim, 4096, spec.rope_theta, spec.rope_scaling)

    rng = np.random.default_rng(1)
    prompt_lens = [13, 29]
    b = len(prompt_lens)
    s = max(prompt_lens)
    tokens = np.zeros((b, s), np.int32)
    for i, pl_ in enumerate(prompt_lens):
        tokens[i, :pl_] = rng.integers(1, cfg["vocab_size"], pl_)

    # HF forward
    with torch.no_grad():
        hf_out = []
        for i, pl_ in enumerate(prompt_lens):
            ids = torch.tensor(tokens[i, :pl_][None].astype(np.int64))
            logits = hf_model(ids).logits[0]  # [pl, V]
            hf_out.append(logits[-1].numpy())

    # our forward: one prefill step, whole prompt as one chunk
    L = spec.num_layers
    k_cache = jnp.zeros((L, NUM_PAGES, P, spec.num_kv_heads, spec.head_dim), jnp.float32)
    v_cache = jnp.zeros_like(k_cache)
    # seq i gets pages [1 + i*MP, ...]; page 0 = trash
    page_table = np.zeros((b, MP), np.int32)
    dest = np.full((b, s), -1, np.int32)
    positions = np.zeros((b, s), np.int32)
    for i, pl_ in enumerate(prompt_lens):
        pages = 1 + i * MP + np.arange(MP)
        page_table[i] = pages
        slots = pages[:, None] * P + np.arange(P)[None, :]
        dest[i, :pl_] = slots.reshape(-1)[:pl_]
        positions[i, :pl_] = np.arange(pl_)
    plan = {
        "token_ids": jnp.asarray(tokens),
        "positions": jnp.asarray(positions),
        "dest_slot": jnp.asarray(dest),
        "page_table": jnp.asarray(page_table),
        "ctx_lens": jnp.asarray(np.array(prompt_lens, np.int32)),
        "new_lens": jnp.asarray(np.array(prompt_lens, np.int32)),
    }
    rt = tfm.StepRuntime(impl="ref")
    k_cache, v_cache, last_h, *_rest = tfm.prefill_forward(
        params, k_cache, v_cache, plan, (cos, sin), spec=spec, rt=rt
    )
    logits = tfm.compute_logits(params, last_h, spec)
    ours = np.asarray(logits)
    for i in range(b):
        diff = np.abs(ours[i] - hf_out[i])
        print(f"prefill seq{i}: max|Δ|={diff.max():.2e} p99={np.percentile(diff,99):.2e}")
        assert diff.max() < 2e-4, "prefill logits mismatch"

    # decode one step: feed argmax token
    next_tokens = ours.argmax(-1).astype(np.int32)
    tables = np.zeros((L, b, MP), np.int32)
    for l in range(L):
        tables[l] = page_table
    tables_j = jnp.asarray(tables)  # [L, R=b, MP]
    ctx = np.array(prompt_lens, np.int32)
    dest_d = np.zeros((L, b), np.int32)
    for l in range(L):
        for i in range(b):
            pos = ctx[i]
            dest_d[l, i] = page_table[i, pos // P] * P + pos % P
    plan_d = {
        "token_ids": jnp.asarray(next_tokens),
        "positions": jnp.asarray(ctx),
        "row_ids": jnp.asarray(np.arange(b, dtype=np.int32)),
        "dest_slot": jnp.asarray(dest_d),
        "ctx_lens": jnp.asarray(np.broadcast_to(ctx + 1, (L, b)).copy()),
    }
    k_cache, v_cache, h, *_rest = tfm.decode_forward(
        params, k_cache, v_cache, tables_j, plan_d, (cos, sin),
        spec=spec, rt=rt, mp_bucket=MP,
    )
    dec_logits = np.asarray(tfm.compute_logits(params, h, spec))

    # HF teacher-forced decode
    with torch.no_grad():
        for i, pl_ in enumerate(prompt_lens):
            ids = np.concatenate([tokens[i, :pl_], [next_tokens[i]]])
            logits = hf_model(torch.tensor(ids[None].astype(np.int64))).logits[0]
            diff = np.abs(dec_logits[i] - logits[-1].numpy())
            print(f"decode  seq{i}: max|Δ|={diff.max():.2e}")
            assert diff.max() < 2e-4, "decode logits mismatch"
    print("PARITY OK")


if __name__ == "__main__":
    main()
