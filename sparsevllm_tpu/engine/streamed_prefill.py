"""Streamed long-prefill: host-archived KV, beyond-HBM context windows.

Reference counterpart: the ``long_bs1full`` policy + pinned-CPU RawKV spill
(src/sparsevllm/engine/cache_manager/raw_kv_offload.py:25-286,
scheduler.py:171-221) that lets >96K-token prompts prefill on a device whose
HBM cannot hold the whole prompt's KV.

TPU re-design (not a port): instead of spilling *staging* copies while the
post-RoPE KV stays resident (the reference runs on 80 GiB GPUs), here the
device holds NO persistent KV during a streamed prefill at all:

  * each chunk's K/V (post-RoPE) is appended to a host-RAM archive, layer by
    layer, as soon as the layer computes it;
  * a chunk's attention runs as an online-softmax accumulation over archive
    blocks streamed host->device (double-buffered ``device_put``), merged
    with the chunk-local causal part;
  * the final chunk additionally computes SnapKV observation scores over the
    full context with a second archive sweep (same two-pass exact-softmax
    scheme as ops/attention_ref.prefill_obs_scores_blockwise);
  * compaction gathers the kept tokens straight out of the host archive
    (numpy fancy-indexing — the archive lives in host RAM) and scatters them
    into freshly allocated device pages; decode then runs the standard
    resident path.

Peak device KV for a prompt of ANY length is therefore
O(chunk + prefill_keep_tokens) — sequence length is bounded by host RAM, not
HBM. The cost is host-link bandwidth: total H2D traffic is ~ctx^2/(2*chunk)
tokens of K/V; on a production host NIC/PCIe (~50 GiB/s) a 128K prefill
streams in seconds, on the dev tunnel (~1.3 GiB/s) in minutes.

Applies to methods whose decode residency is bounded at prefill end:
snapkv / pyramidkv (score-select compaction) and deltakv (the middle
region compresses into latents/centers straight from the archive — the
reference's 512K tier, deltakv_base.py:305-399). Consumed via
``long_prefill_offload_threshold``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import sampler as sampler_ops
from ..layers.rope import apply_rope
from ..models import transformer as tfm
from ..ops import deltakv as dk_ops
from ..utils import compressor as comp_ops
from ..utils.log import logger
from ..utils.profiler import profiler

NEG_INF = -1e30


class HostKVArchive:
    """Per-layer host-RAM store of a sequence's post-RoPE K/V chunks.

    Buffers are PREALLOCATED at prompt capacity and chunks write into
    slices, so ``layer_kv`` returns zero-copy views — a per-chunk
    ``np.concatenate`` over the whole archive would cost O(ctx^2) host
    memcpy per layer across a prefill (measured dominant at 128K)."""

    def __init__(self, num_layers: int, capacity: int):
        self.capacity = capacity
        self.k: list[np.ndarray | None] = [None] * num_layers
        self.v: list[np.ndarray | None] = [None] * num_layers
        self._len = [0] * num_layers
        self.tokens = 0  # archived tokens (same for every layer)

    def append(self, layer: int, k: np.ndarray, v: np.ndarray) -> None:
        if self.k[layer] is None:
            self.k[layer] = np.empty(
                (self.capacity,) + k.shape[1:], k.dtype
            )
            self.v[layer] = np.empty(
                (self.capacity,) + v.shape[1:], v.dtype
            )
        n, off = k.shape[0], self._len[layer]
        self.k[layer][off : off + n] = k
        self.v[layer][off : off + n] = v
        self._len[layer] = off + n

    def layer_kv(self, layer: int) -> tuple[np.ndarray, np.ndarray]:
        n = self._len[layer]
        return self.k[layer][:n], self.v[layer][:n]

    @property
    def nbytes(self) -> int:
        return sum(
            a.nbytes for bufs in (self.k, self.v)
            for a in bufs if a is not None
        )


class StreamedPrefillRunner:
    """Drives one long sequence's chunked prefill with host-archived KV.

    Owned by ModelExecutor; one live archive per sequence (long prompts are
    scheduled alone at bs=1, engine/scheduler.py long bucket)."""

    def __init__(self, executor):
        self.ex = executor
        self.config = executor.config
        self.spec = executor.spec
        self._archives: dict[int, HostKVArchive] = {}
        self._fns: dict = {}
        # archive H2D block: 8K tokens x kv_dim bf16 ~ 32 MiB per layer-block
        self.block_tokens = 8192

    # ----------------------------------------------------------- jitted fns

    def _jit(self, name, fn, **cache_key):
        """Cache a jitted closure; kwargs are cache-key only (the closure
        already captured them)."""
        key = (name, tuple(sorted(cache_key.items())))
        f = self._fns.get(key)
        if f is None:
            f = jax.jit(fn)
            self._fns[key] = f
        return f

    def _f_embed(self):
        def embed(params, tokens):
            return params["embed"][tokens]  # [S, H]
        return self._jit("embed", embed)

    def _f_qkv(self):
        spec = self.spec

        def qkv(params, li, h, positions, rope):
            lp = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, li, 0, keepdims=False
                ),
                params["layers"],
            )
            x = tfm.rms_norm(h, lp["input_norm"], spec.rms_norm_eps)
            q, k, v = tfm._qkv(x, lp, spec)
            cos, sin = rope
            q = apply_rope(q[None], positions[None], cos, sin)[0]
            k = apply_rope(k[None], positions[None], cos, sin)[0]
            return q, k, v
        return self._jit("qkv", qkv)

    def _f_attend_block(self, s_block: int):
        """Online-softmax accumulation of one archive block (strictly-past
        keys: no causal masking, only a valid-length mask)."""
        spec = self.spec
        sm_scale = spec.head_dim ** -0.5
        g = spec.gqa_groups

        def attend(q, kb, vb, acc, m, l, blk_len):
            # q [S, Nq, Dh]; kb/vb [Bk, Nkv, Dh]. QK/PV matmuls run in the
            # MODEL dtype with fp32 accumulation: bf16 operands hit the
            # MXU native rate (fp32 operands would run the slow multi-pass
            # path); at dtype=float32 everything stays f32, keeping the
            # streamed-vs-resident token-identity tests exact.
            s, nq, dh = q.shape
            bk = kb.shape[0]
            kbf = jnp.repeat(kb, g, axis=1)
            vbf = jnp.repeat(vb, g, axis=1)
            kmask = jnp.arange(bk) < blk_len  # [Bk]

            def body(carry, si):
                acc, m, l = carry
                qs = jax.lax.dynamic_slice(
                    q, (si * s_block, 0, 0), (s_block, nq, dh)
                )
                st = jnp.einsum(
                    "shd,khd->shk", qs, kbf,
                    preferred_element_type=jnp.float32,
                ) * sm_scale  # [s_block, Nq, Bk]
                st = jnp.where(kmask[None, None, :], st, NEG_INF)
                ms = jax.lax.dynamic_slice(
                    m, (si * s_block, 0), (s_block, nq))
                ls = jax.lax.dynamic_slice(
                    l, (si * s_block, 0), (s_block, nq))
                accs = jax.lax.dynamic_slice(
                    acc, (si * s_block, 0, 0), (s_block, nq, dh))
                m_cur = jnp.max(st, axis=-1)
                m_new = jnp.maximum(ms, m_cur)
                alpha = jnp.exp(ms - m_new)
                p = jnp.exp(st - m_new[..., None])
                p = jnp.where(kmask[None, None, :], p, 0.0)
                pv = jnp.einsum(
                    "shk,khd->shd", p.astype(vbf.dtype), vbf,
                    preferred_element_type=jnp.float32,
                )
                accs = accs * alpha[..., None] + pv
                ls = ls * alpha + jnp.sum(p, axis=-1)
                acc = jax.lax.dynamic_update_slice(
                    acc, accs, (si * s_block, 0, 0))
                m = jax.lax.dynamic_update_slice(
                    m, m_new, (si * s_block, 0))
                l = jax.lax.dynamic_update_slice(l, ls, (si * s_block, 0))
                return (acc, m, l), None

            n = s // s_block
            (acc, m, l), _ = jax.lax.scan(
                body, (acc, m, l), jnp.arange(n))
            return acc, m, l
        return self._jit("attend_block", attend, s_block=s_block)

    def _f_attend_local(self, s_block: int):
        """Merge the chunk-local causal part and finalize the output."""
        spec = self.spec
        sm_scale = spec.head_dim ** -0.5
        g = spec.gqa_groups

        def attend(q, k, v, acc, m, l, new_len):
            s, nq, dh = q.shape
            kf = jnp.repeat(k, g, axis=1)  # model dtype; f32 accum below
            vf = jnp.repeat(v, g, axis=1)

            def body(carry, si):
                acc, m, l = carry
                qs = jax.lax.dynamic_slice(
                    q, (si * s_block, 0, 0), (s_block, nq, dh)
                )
                st = jnp.einsum(
                    "shd,khd->shk", qs, kf,
                    preferred_element_type=jnp.float32,
                ) * sm_scale  # [s_block, Nq, S]
                qi = si * s_block + jnp.arange(s_block)
                ki = jnp.arange(s)
                valid = (
                    (ki[None, :] <= qi[:, None]) & (ki[None, :] < new_len)
                )[:, None, :]
                st = jnp.where(valid, st, NEG_INF)
                ms = jax.lax.dynamic_slice(
                    m, (si * s_block, 0), (s_block, nq))
                ls = jax.lax.dynamic_slice(
                    l, (si * s_block, 0), (s_block, nq))
                accs = jax.lax.dynamic_slice(
                    acc, (si * s_block, 0, 0), (s_block, nq, dh))
                m_cur = jnp.max(st, axis=-1)
                m_new = jnp.maximum(ms, m_cur)
                alpha = jnp.exp(ms - m_new)
                p = jnp.where(valid, jnp.exp(st - m_new[..., None]), 0.0)
                pv = jnp.einsum(
                    "shk,khd->shd", p.astype(vf.dtype), vf,
                    preferred_element_type=jnp.float32,
                )
                accs = accs * alpha[..., None] + pv
                ls = ls * alpha + jnp.sum(p, axis=-1)
                acc = jax.lax.dynamic_update_slice(
                    acc, accs, (si * s_block, 0, 0))
                m = jax.lax.dynamic_update_slice(
                    m, m_new, (si * s_block, 0))
                l = jax.lax.dynamic_update_slice(l, ls, (si * s_block, 0))
                return (acc, m, l), None

            n = s // s_block
            (acc, m, l), _ = jax.lax.scan(body, (acc, m, l), jnp.arange(n))
            l_safe = jnp.where(l <= 0.0, 1.0, l)
            out = (acc / l_safe[..., None]).astype(q.dtype)
            return out, m, l
        return self._jit("attend_local", attend, s_block=s_block)

    def _f_post(self):
        spec = self.spec

        def post(params, li, h, attn_out):
            lp = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, li, 0, keepdims=False
                ),
                params["layers"],
            )
            s = h.shape[0]
            h = h + attn_out.reshape(s, spec.q_dim) @ lp["wo"]
            x2 = tfm.rms_norm(h, lp["post_attn_norm"], spec.rms_norm_eps)
            return h + tfm._ffn(x2, lp, spec, "sorted")
        return self._jit("post", post)

    def _f_score_block(self):
        """Pass-2 score contribution of one archive block for obs queries."""
        spec = self.spec
        sm_scale = spec.head_dim ** -0.5
        g = spec.gqa_groups

        def score(q_obs, kb, m, l, blk_len):
            # q_obs [W, Nq, Dh]; kb [Bk, Nkv, Dh]; m/l [W, Nq]
            kbf = jnp.repeat(kb, g, axis=1)
            st = jnp.einsum(
                "whd,khd->whk", q_obs, kbf,
                preferred_element_type=jnp.float32,
            ) * sm_scale  # [W, Nq, Bk]
            p = jnp.exp(st - m[..., None]) / l[..., None]
            kmask = jnp.arange(kb.shape[0]) < blk_len
            p = jnp.where(kmask[None, None, :], p, 0.0)
            return jnp.sum(p, axis=(0, 1))  # [Bk]
        return self._jit("score_block", score)

    def _f_score_local(self):
        spec = self.spec
        sm_scale = spec.head_dim ** -0.5
        g = spec.gqa_groups

        def score(q_obs, k, m, l, qpos, kpos0, new_len):
            # causal within the chunk: key j visible to obs query i when
            # kpos0 + j <= qpos[i]
            kf = jnp.repeat(k, g, axis=1)
            st = jnp.einsum(
                "whd,khd->whk", q_obs, kf,
                preferred_element_type=jnp.float32,
            ) * sm_scale
            ki = kpos0 + jnp.arange(k.shape[0])
            valid = (
                (ki[None, :] <= qpos[:, None])
                & (jnp.arange(k.shape[0])[None, :] < new_len)
            )[:, None, :]
            p = jnp.where(
                valid, jnp.exp(st - m[..., None]) / l[..., None], 0.0)
            return jnp.sum(p, axis=(0, 1))  # [S]
        return self._jit("score_local", score)

    # -------------------------------------------------------------- driving

    def run_chunk(self, seq, chunk: int):
        """Process one prefill chunk of a streamed sequence. Returns the
        sampled first decode token on the final chunk, else None."""
        ex, spec, cfg = self.ex, self.spec, self.config
        arch = self._archives.setdefault(
            seq.seq_id,
            HostKVArchive(spec.num_layers, seq.num_prompt_tokens),
        )
        start = seq.num_prefilled_tokens
        if arch.tokens != start:
            if start == 0:
                # preempted mid-archive and replayed from scratch
                arch = self._archives[seq.seq_id] = HostKVArchive(
                    self.spec.num_layers, seq.num_prompt_tokens
                )
            else:
                raise AssertionError("archive out of sync with sequence")
        final = start + chunk >= seq.num_prompt_tokens

        s = 1
        while s < chunk:
            s *= 2
        tokens = np.zeros(s, np.int32)
        tokens[:chunk] = seq.prompt_token_ids[start : start + chunk]
        positions = np.arange(start, start + s, dtype=np.int32)
        d_tokens = jnp.asarray(tokens)
        d_pos = jnp.asarray(positions)

        f_embed, f_qkv, f_post = self._f_embed(), self._f_qkv(), self._f_post()
        d_rope = ex.rope
        s_block = min(128, s)
        f_blk = self._f_attend_block(s_block)
        f_local = self._f_attend_local(s_block)

        params = ex.params
        nq, dh = spec.num_q_heads, spec.head_dim
        h = f_embed(params, d_tokens)
        obs_ml: list[tuple] = []  # per layer (q_obs, m, l) when final
        kv_host: list[tuple[np.ndarray, np.ndarray]] = []
        w = cfg.snapkv_obs_window
        dk_mode = getattr(cfg, "method", "") == "deltakv"
        for li in range(spec.num_layers):
            q, k, v = f_qkv(params, li, h, d_pos, d_rope)
            acc = jnp.zeros((s, nq, dh), jnp.float32)
            m = jnp.full((s, nq), NEG_INF, jnp.float32)
            l = jnp.zeros((s, nq), jnp.float32)
            for kb, vb, blk_len, _ in self._iter_blocks(arch, li):
                acc, m, l = f_blk(q, kb, vb, acc, m, l, blk_len)
            out, m, l = f_local(q, k, v, acc, m, l, chunk)
            h = f_post(params, li, h, out)
            # archive this chunk's K/V — keep device refs and fetch once
            # after the loop (a per-layer device_get forces a pipeline
            # sync per layer; one batched fetch overlaps all layers)
            kv_host.append((k[:chunk], v[:chunk]))
            if final and not dk_mode:
                # obs-query stats for the pass-2 score sweep
                oidx = np.arange(max(chunk - w, 0), chunk)
                obs_ml.append((q[oidx], m[oidx], l[oidx], k, oidx))
        kv_host = jax.device_get(kv_host)
        for li, (kh, vh) in enumerate(kv_host):
            arch.append(li, np.asarray(kh), np.asarray(vh))
        arch.tokens += chunk

        if not final:
            return None

        if dk_mode:
            token = self._compact_deltakv(seq, arch, h, chunk)
        else:
            scores = self._obs_scores(arch, obs_ml, start, chunk)
            token = self._compact_and_sample(seq, arch, scores, h, chunk)
        del self._archives[seq.seq_id]
        return token

    def _iter_blocks(self, arch: HostKVArchive, layer: int):
        """Yield (k_dev, v_dev, valid_len, kpos0) archive blocks (padded to
        block_tokens so one jit bucket serves every block).

        Double-buffered: block j+1's H2D ``device_put`` is issued before
        block j is yielded, so the host->device copy of the next block
        overlaps the attention compute on the current one (the reference
        overlaps pinned-CUDA copies with streams, raw_kv_offload.py; on
        TPU the async device_put plays that role)."""
        if arch.tokens == 0:
            return
        bt = self.block_tokens
        k_all, v_all = arch.layer_kv(layer)
        t = k_all.shape[0]

        def put(j):
            kb = k_all[j : j + bt]
            blk_len = kb.shape[0]
            if blk_len < bt:
                pad = ((0, bt - blk_len), (0, 0), (0, 0))
                kb = np.pad(kb, pad)
                vb = np.pad(v_all[j : j + bt], pad)
            else:
                vb = v_all[j : j + bt]
            return jax.device_put(kb), jax.device_put(vb), blk_len, j

        starts = list(range(0, t, bt))
        nxt = put(starts[0])
        for i, j in enumerate(starts):
            cur = nxt
            if i + 1 < len(starts):
                nxt = put(starts[i + 1])
            yield cur

    def _obs_scores(self, arch, obs_ml, start: int, chunk: int) -> np.ndarray:
        """[L, ctx] fp32 SnapKV scores over the full context (exact)."""
        spec, cfg = self.spec, self.config
        w = cfg.snapkv_obs_window
        ctx = start + chunk
        f_sb, f_sl = self._f_score_block(), self._f_score_local()
        scores = np.zeros((spec.num_layers, ctx), np.float32)
        for li in range(spec.num_layers):
            q_obs, m, l, k_local, oidx = obs_ml[li]
            l = jnp.where(l <= 0.0, 1.0, l)
            for kb, vb, blk_len, kpos0 in self._iter_blocks(arch, li):
                # archive holds [0, start): strictly before every obs query
                sc = f_sb(q_obs, kb, m, l, blk_len)
                scores[li, kpos0 : kpos0 + blk_len] += np.asarray(
                    sc
                )[:blk_len]
            qpos = jnp.asarray(start + oidx, jnp.int32)
            sc = f_sl(q_obs, k_local, m, l, qpos, start, chunk)
            scores[li, start : start + chunk] += np.asarray(sc)[:chunk]
        if cfg.snapkv_kernel_size > 1:
            p = cfg.snapkv_kernel_size
            pad = p // 2
            padded = np.pad(scores, ((0, 0), (pad, p - 1 - pad)))
            pooled = np.max(
                np.stack([padded[:, i : i + ctx] for i in range(p)],
                         axis=-1),
                axis=-1,
            )
            scores = pooled
        return scores

    def _compact_and_sample(self, seq, arch, scores, h, chunk):
        """Select kept tokens, gather their KV from the archive into fresh
        device pages, adopt the rows, and sample the first decode token."""
        ex, spec, cfg = self.ex, self.spec, self.config
        kv = ex.kv_manager
        w = cfg.snapkv_obs_window
        ctx = arch.tokens
        prefix_len = ctx - min(w, ctx)
        budgets = kv.layer_budgets  # [L]
        keep = np.minimum(budgets, ctx).astype(np.int64)  # [L]

        plan = kv.plan_streamed_adoption(seq, keep)
        p = cfg.page_size
        for li in range(spec.num_layers):
            n_prefix = max(int(keep[li]) - (ctx - prefix_len), 0)
            cand = scores[li, :prefix_len]
            if n_prefix > 0 and prefix_len > 0:
                top = np.argpartition(
                    cand, -min(n_prefix, prefix_len)
                )[-n_prefix:]
                kept = np.sort(top)
            else:
                kept = np.empty(0, np.int64)
            idx = np.concatenate([kept, np.arange(prefix_len, ctx)])
            idx = idx[: int(keep[li])]
            k_all, v_all = arch.layer_kv(li)
            k_sel = jnp.asarray(k_all[idx])
            v_sel = jnp.asarray(v_all[idx])
            pages = plan["new_pages"][li]  # [n_pages]
            n = idx.shape[0]
            slots = (
                pages[np.arange(n) // p] * p + np.arange(n) % p
            ).astype(np.int32)
            ex.store_rows_layer(li, k_sel, v_sel, jnp.asarray(slots))
        kv.commit_streamed_adoption(seq, plan)
        ex.apply_table_updates(kv.drain_table_updates())

        logger.info(
            "streamed prefill done: seq=%s ctx=%d archived=%.2f GiB "
            "kept<=%d/layer", seq.seq_id, ctx, arch.nbytes / 2**30,
            int(keep.max()),
        )
        return self._sample_first_token(seq, h, chunk)

    def _sample_first_token(self, seq, h, chunk):
        """First decode token from the final chunk's last hidden state."""
        ex = self.ex
        logits = self._f_logits()(ex.params, h, chunk - 1)
        sp = seq.sampling_params
        key = jax.random.fold_in(ex._base_key, ex._step_counter)
        ex._step_counter += 1
        if sp.temperature == 0.0:
            mode = "greedy"
        elif sp.top_k == 0 and sp.top_p >= 1.0:
            mode = "temp_only"
        else:
            mode = "full"
        tok = sampler_ops.sample(
            logits[None],
            jnp.asarray([sp.temperature], jnp.float32),
            jnp.asarray([sp.top_k], jnp.int32),
            jnp.asarray([sp.top_p], jnp.float32),
            key, mode=mode,
        )
        return int(np.asarray(tok)[0])

    # ------------------------------------------------------ deltakv final

    def _f_compress_block(self, cb: int):
        """Jitted archive-block compression for one sparse layer (bs=1).

        Same math as the executor's resident compress op (derope +
        ops/deltakv.compress_layer); block boundaries are stride-aligned
        so sequential blocks reproduce the one-shot compression exactly
        (old centers are always-allowed causal fathers)."""
        ex = self.ex
        rt = ex._rt
        comp_base = rt.dk_comp_base
        stride = rt.dk_stride

        key = ("dk_compress", cb)
        f = self._fns.get(key)
        if f is None:
            def compress(dk, dk_comp, kb, vb, rows, counts, dest, si,
                         rope):
                cos, sin = rope
                positions = (
                    comp_base + dest[:, None]
                    + jnp.arange(cb, dtype=jnp.int32)[None, :]
                )
                # archive K is post-RoPE; De-RoPE exactly before
                # compressing (reference stores pre-RoPE K)
                k_raw = dk_ops.derope(kb[None], positions, cos, sin)
                comp_layer = comp_ops.layer_slice(dk_comp, si)
                return dk_ops.compress_layer(
                    dk, si, comp_layer, rt.dk_arch, k_raw, vb[None], rows,
                    counts, stride=stride, latent_bits=rt.dk_latent_bits,
                    latent_group=rt.dk_group, neighbors=rt.dk_nn,
                    dest_offset=dest,
                )
            f = jax.jit(compress, donate_argnums=(0,))
            self._fns[key] = f
        return f

    def _compact_deltakv(self, seq, arch, h, chunk):
        """DeltaKV final sweep over the host archive (reference
        full-prefill plan deltakv_base.py:305-399 + raw_kv_offload.py):
        adopt FULL layers dense + sparse sink/recent raw into fresh
        pages, then compress the middle region straight out of the
        archive into latents/centers — the device never holds the middle
        region's raw KV, so context is bounded by host RAM + latent
        capacity, not HBM (reference 512K headline tier)."""
        ex, spec, cfg = self.ex, self.spec, self.config
        kv = ex.kv_manager
        ctx = arch.tokens
        comp_base = kv.comp_base
        count = kv.compressible_tokens(seq)
        tail_start = comp_base + count
        full = set(kv.full_layers)
        nl = spec.num_layers
        keep = np.asarray(
            [ctx if l in full else ctx - count for l in range(nl)],
            np.int64,
        )
        plan = kv.plan_streamed_adoption(seq, keep)
        p = cfg.page_size
        bt = self.block_tokens
        for li in range(nl):
            if li in full:
                idx = np.arange(ctx, dtype=np.int64)
            else:
                idx = np.concatenate([
                    np.arange(comp_base, dtype=np.int64),
                    np.arange(tail_start, ctx, dtype=np.int64),
                ])
            k_all, v_all = arch.layer_kv(li)
            pages = plan["new_pages"][li]
            for off in range(0, idx.shape[0], bt):
                blk = idx[off : off + bt]
                dst = off + np.arange(blk.shape[0])
                slots = (pages[dst // p] * p + dst % p).astype(np.int32)
                ex.store_rows_layer(
                    li, jnp.asarray(k_all[blk]), jnp.asarray(v_all[blk]),
                    jnp.asarray(slots),
                )
        kv.commit_streamed_adoption(seq, plan)
        ex.apply_table_updates(kv.drain_table_updates())

        # compress the middle region from the archive, block by block
        row = int(kv.seq_rows[seq.seq_id])
        stride = kv.stride
        cb = max((bt // stride) * stride, stride)
        sparse = [l for l in range(nl) if l not in full]
        f_comp = self._f_compress_block(cb)
        rows_d = jnp.asarray([row], jnp.int32)
        for off in range(0, count, cb):
            n = min(cb, count - off)
            for si, li in enumerate(sparse):
                k_all, v_all = arch.layer_kv(li)
                kb = k_all[comp_base + off : comp_base + off + cb]
                vb = v_all[comp_base + off : comp_base + off + cb]
                if kb.shape[0] < cb:
                    pad = ((0, cb - kb.shape[0]), (0, 0), (0, 0))
                    kb, vb = np.pad(kb, pad), np.pad(vb, pad)
                ex.dk_state = f_comp(
                    ex.dk_state, ex.dk_comp, jax.device_put(kb),
                    jax.device_put(vb), rows_d,
                    jnp.asarray([n], jnp.int32),
                    jnp.asarray([off], jnp.int32),
                    jnp.asarray(si, jnp.int32), ex.rope,
                )
        kv.comp_counts[seq.seq_id] = count
        logger.info(
            "streamed deltakv prefill done: seq=%s ctx=%d compressed=%d "
            "archived=%.2f GiB", seq.seq_id, ctx, count,
            arch.nbytes / 2**30,
        )
        return self._sample_first_token(seq, h, chunk)

    def _f_logits(self):
        spec = self.spec

        def logits(params, h, last_idx):
            hl = tfm.rms_norm(
                h[last_idx], params["final_norm"], spec.rms_norm_eps
            )
            return tfm.compute_logits(params, hl[None], spec)[0]
        return self._jit("logits", logits)

    def abort(self, seq_id: int) -> None:
        self._archives.pop(seq_id, None)
