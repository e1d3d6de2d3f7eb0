"""HF-side DeltaKV cluster cache (the accuracy oracle).

Independent pure-torch re-implementation of the reference's
``ClusterCachePipeline`` (src/deltakv/modeling/cache_pipeline.py:101-756):

  * K is stored PRE-RoPE (the wrapper applies RoPE at attention time using
    carried positions), V raw; bs=1 only (reference ``_bs1``).
  * per layer: a sink region (first ``sink`` tokens), a raw recent BUFFER,
    and a COMPRESSED history: when the buffer exceeds 2x the tail size, the
    candidate region (all but the last ``tail`` tokens, tail-aligned) is
    flushed into the compressed store (reference ``_flush``,
    cache_pipeline.py:676-709).
  * compression (reference ``_store_history``/``_cluster_refs``:554-604,
    433-481): centers sit at fixed-stride positions of the flushed span;
    each token's REFERENCE is the mean of its ``neighbor_count`` nearest
    CAUSAL centers under the l2 metric over (K ∥ V); with a learned
    compressor the payload is ``down(kv) - down(ref)`` (latent-space
    residual) and reconstruction is ``up(payload) + ref``; without one
    (origin codec) the payload is ``kv - ref`` exactly.
  * the per-token father (neighbor) indices are persisted so reconstruction
    regathers the same refs (reference ``token_father_idx``).
  * optional int4/int2 payload quantization (per-token groups, asymmetric)
    mirrors the engine's packed latents.

This is the second, engine-independent implementation of the DeltaKV math:
engine-vs-HF agreement decomposes an accuracy failure into compressor vs
selection vs kernel (VERDICT r2 missing#2).
"""

from __future__ import annotations

import torch


def _quantize_groups(x: torch.Tensor, bits: int, group: int):
    """Asymmetric per-group quantization (reference _quantize,
    cache_pipeline.py:511-527; matches ops/quant.pack_int{4,2}_groups)."""
    *lead, d = x.shape
    levels = (1 << bits) - 1
    g = x.reshape(*lead, d // group, group).float()
    lo = g.min(dim=-1).values
    hi = g.max(dim=-1).values
    scale = torch.where(hi > lo, (hi - lo) / levels, torch.ones_like(lo))
    q = torch.clamp(torch.round((g - lo[..., None]) / scale[..., None]),
                    0, levels)
    deq = (q * scale[..., None] + lo[..., None]).reshape(*lead, d)
    return deq.to(x.dtype)


class ClusterKVCache:
    """Per-layer DeltaKV cluster store; bs=1."""

    def __init__(
        self,
        num_layers: int,
        *,
        sink: int,
        tail: int,
        cluster_ratio: float,
        neighbor_count: int = 4,
        compressors: dict | None = None,  # layer -> (down fn, up fn)
        payload_bits: int = 0,  # 0 = fp payload, 4/2 = quantized groups
        payload_group: int = 0,  # 0 = one group per token payload
    ):
        self.L = num_layers
        self.sink = sink
        self.tail = tail
        self.stride = max(int(round(1.0 / cluster_ratio)), 1)
        self.nn = max(1, neighbor_count)
        self.compressors = compressors or {}
        self.payload_bits = payload_bits
        self.payload_group = payload_group
        self.sink_k = [None] * num_layers  # [1, S, H, D] pre-RoPE
        self.sink_v = [None] * num_layers
        self.sink_pos = [None] * num_layers
        self.buf_k = [None] * num_layers
        self.buf_v = [None] * num_layers
        self.buf_pos = [None] * num_layers
        self.centers = [None] * num_layers  # [1, NC, KV] flat kv-dim
        self.payload = [None] * num_layers  # [1, C, P] (latent or residual)
        self.fathers = [None] * num_layers  # [1, C, NN]
        self.comp_pos = [None] * num_layers  # [1, C]

    # ------------------------------------------------------------- helpers

    @staticmethod
    def _flat(x: torch.Tensor) -> torch.Tensor:
        b, s, h, d = x.shape
        return x.reshape(b, s, h * d)

    def _cluster_refs(self, kv: torch.Tensor, existing: torch.Tensor | None,
                      center_rel: torch.Tensor):
        """Nearest-causal-center references (reference _cluster_refs).

        kv [1, S, KV]; centers at rel positions ``center_rel``; l2 metric
        over the full (K ∥ V) vector (config default cluster_on_kv=True)."""
        new_centers = kv.index_select(1, center_rel)
        all_c = (
            torch.cat([existing, new_centers], dim=1)
            if existing is not None and existing.shape[1]
            else new_centers
        )
        # l2 ranking: argmax(2*x.c - |c|^2) == argmin |x - c|^2
        dot = torch.matmul(kv.float(), all_c.float().transpose(-1, -2))
        cn = (all_c.float() ** 2).sum(dim=-1)
        scores = 2.0 * dot - cn[:, None, :]
        s = kv.shape[1]
        nold = 0 if existing is None else existing.shape[1]
        rows = torch.arange(s).view(-1, 1)
        causal_new = center_rel.view(1, -1) <= rows
        causal = torch.cat(
            [torch.ones((s, nold), dtype=torch.bool), causal_new], dim=1
        )
        scores = scores.masked_fill(~causal[None], float("-inf"))
        k = min(self.nn, all_c.shape[1])
        vals, fathers = torch.topk(scores, k=k, dim=-1)  # [1, S, k]
        # early tokens have < k causal centers: disallowed picks (score
        # -inf) fall back to the best father so the mean stays clean
        fathers = torch.where(torch.isfinite(vals), fathers,
                              fathers[..., :1])
        refs = all_c[0, fathers[0]].mean(dim=1)[None]  # [1, S, KV]
        return refs, all_c, fathers

    def _compress_span(self, layer: int, k: torch.Tensor, v: torch.Tensor,
                       pos: torch.Tensor) -> None:
        """reference _store_history: flush one span into the compressed
        store, growing the center set."""
        kv = torch.cat([self._flat(k), self._flat(v)], dim=-1)  # [1, S, KV]
        s = kv.shape[1]
        center_rel = torch.arange(0, s, self.stride)
        refs, centers, fathers = self._cluster_refs(
            kv, self.centers[layer], center_rel
        )
        comp = self.compressors.get(layer)
        if comp is None:
            payload = kv - refs.to(kv.dtype)  # origin codec
        else:
            down, _up = comp
            payload = down(kv.float()) - down(refs.float())
        if self.payload_bits:
            group = self.payload_group or payload.shape[-1]
            payload = _quantize_groups(payload, self.payload_bits, group)
        self.centers[layer] = centers
        cat = lambda old, new: new if old is None else torch.cat(
            [old, new], dim=1)
        self.payload[layer] = cat(self.payload[layer], payload)
        self.fathers[layer] = cat(self.fathers[layer], fathers)
        self.comp_pos[layer] = cat(self.comp_pos[layer], pos[None])

    # ------------------------------------------------------------ interface

    def update(self, layer: int, k: torch.Tensor, v: torch.Tensor,
               pos: torch.Tensor):
        """Append pre-RoPE K / V ([1, S, H, D]) with absolute positions
        [S]; returns the attention view (k, v [1, T, H, D], positions [T])
        BEFORE this call's flush (the new tokens attend the pre-flush
        state, like the reference update() which views then flushes)."""
        assert k.shape[0] == 1, "HF DeltaKV cache is bs=1"
        if self.sink_k[layer] is None:
            n = min(self.sink, k.shape[1])
            self.sink_k[layer] = k[:, :n]
            self.sink_v[layer] = v[:, :n]
            self.sink_pos[layer] = pos[:n]
            k, v, pos = k[:, n:], v[:, n:], pos[n:]
        elif self.sink_pos[layer].shape[0] < self.sink:
            n = min(self.sink - self.sink_pos[layer].shape[0], k.shape[1])
            self.sink_k[layer] = torch.cat(
                [self.sink_k[layer], k[:, :n]], dim=1)
            self.sink_v[layer] = torch.cat(
                [self.sink_v[layer], v[:, :n]], dim=1)
            self.sink_pos[layer] = torch.cat(
                [self.sink_pos[layer], pos[:n]])
            k, v, pos = k[:, n:], v[:, n:], pos[n:]
        if k.shape[1]:
            if self.buf_k[layer] is None:
                self.buf_k[layer] = k
                self.buf_v[layer] = v
                self.buf_pos[layer] = pos
            else:
                self.buf_k[layer] = torch.cat([self.buf_k[layer], k], dim=1)
                self.buf_v[layer] = torch.cat([self.buf_v[layer], v], dim=1)
                self.buf_pos[layer] = torch.cat([self.buf_pos[layer], pos])
        view = self.view(layer)
        self._flush(layer)
        return view

    def _flush(self, layer: int) -> None:
        buf = self.buf_k[layer]
        if buf is None or buf.shape[1] < self.tail * 2:
            return
        cand = buf.shape[1] - self.tail
        span = (cand // self.tail) * self.tail
        if span <= 0:
            return
        self._compress_span(
            layer,
            self.buf_k[layer][:, :span],
            self.buf_v[layer][:, :span],
            self.buf_pos[layer][:span],
        )
        self.buf_k[layer] = self.buf_k[layer][:, span:]
        self.buf_v[layer] = self.buf_v[layer][:, span:]
        self.buf_pos[layer] = self.buf_pos[layer][span:]

    def reconstruct(self, layer: int, token_idx: torch.Tensor | None = None):
        """Rebuild compressed (K, V) ([1, T, H, D] pre-RoPE) + positions.

        token_idx [T] selects compressed tokens (decode-time top-k view);
        None reconstructs all (prefill view)."""
        payload = self.payload[layer]
        if payload is None:
            return None
        fathers = self.fathers[layer]
        pos = self.comp_pos[layer][0]
        if token_idx is not None:
            payload = payload[:, token_idx]
            fathers = fathers[:, token_idx]
            pos = pos[token_idx]
        refs = self.centers[layer][0, fathers[0]].mean(dim=1)[None]
        comp = self.compressors.get(layer)
        if comp is None:
            kv = payload + refs.to(payload.dtype)
        else:
            _down, up = comp
            kv = up(payload.float()) + refs.float()
        hkd = self.sink_k[layer].shape[2:]
        half = kv.shape[-1] // 2
        k = kv[..., :half].reshape(1, -1, *hkd)
        v = kv[..., half:].reshape(1, -1, *hkd)
        return k, v, pos

    def compressed_len(self, layer: int) -> int:
        p = self.comp_pos[layer]
        return 0 if p is None else int(p.shape[1])

    def view(self, layer: int, token_idx: torch.Tensor | None = None):
        """[sink | compressed (all or selected) | buffer] pre-RoPE view."""
        parts_k = [self.sink_k[layer]]
        parts_v = [self.sink_v[layer]]
        parts_p = [self.sink_pos[layer]]
        rec = self.reconstruct(layer, token_idx)
        if rec is not None:
            rk, rv, rp = rec
            parts_k.append(rk.to(parts_k[0].dtype))
            parts_v.append(rv.to(parts_v[0].dtype))
            parts_p.append(rp)
        if self.buf_k[layer] is not None:
            parts_k.append(self.buf_k[layer])
            parts_v.append(self.buf_v[layer])
            parts_p.append(self.buf_pos[layer])
        return (
            torch.cat(parts_k, dim=1),
            torch.cat(parts_v, dim=1),
            torch.cat(parts_p),
        )


# ---------------------------------------------------------------------------
# Precision-matched quantized oracle caches (VERDICT r4 #7)
#
# Torch ports of the ENGINE's KV quantization recipes (ops/quant.py —
# which themselves re-express reference triton_kernel/quant.py), so the
# int4/int8 engine lanes have an independent second implementation to
# token-check against (reference KiviQuantizedRawCache +
# DeltaCompressedQuantKivi* variants, cache_pipeline.py:891-1014).
# ---------------------------------------------------------------------------


def quant_roundtrip_rows(x: torch.Tensor, bits: int) -> torch.Tensor:
    """Quantize-dequantize per (token, head) row, matching ops/quant.py:
    int8 symmetric absmax/127; int4 asymmetric min/max over the head_dim
    row, q in [0, 15]. torch.round = round-half-even = jnp.rint."""
    xf = x.float()
    if bits == 8:
        absmax = xf.abs().amax(dim=-1)
        scale = torch.where(absmax > 0, absmax / 127.0,
                            torch.ones_like(absmax))
        q = torch.clamp(torch.round(xf / scale[..., None]), -127, 127)
        return (q * scale[..., None]).to(x.dtype)
    if bits == 4:
        lo = xf.amin(dim=-1)
        hi = xf.amax(dim=-1)
        scale = torch.where(hi > lo, (hi - lo) / 15.0, torch.ones_like(lo))
        q = torch.clamp(torch.round((xf - lo[..., None]) / scale[..., None]),
                        0, 15)
        return (q * scale[..., None] + lo[..., None]).to(x.dtype)
    raise ValueError(f"quant_roundtrip_rows: bits must be 4 or 8, got {bits}")


class QuantizedRawKVCache:
    """Dense raw cache whose PAST is row-quantized (engine int4/int8 pool
    semantics): each update's view is [quantized past | current EXACT]
    — the engine's deferred-scale merge keeps the current step exact and
    reads everything older through the fused-dequant kernels — and the
    current tokens commit quantized afterwards.

    K must be passed POST-RoPE (the engine pools rotated K)."""

    def __init__(self, num_layers: int, bits: int = 4):
        self.bits = bits
        self.k = [None] * num_layers  # committed (round-tripped)
        self.v = [None] * num_layers
        self.pos = [None] * num_layers

    def update(self, layer: int, k: torch.Tensor, v: torch.Tensor,
               pos: torch.Tensor):
        if self.k[layer] is None:
            view = (k, v, pos)
        else:
            view = (
                torch.cat([self.k[layer], k], dim=1),
                torch.cat([self.v[layer], v], dim=1),
                torch.cat([self.pos[layer], pos]),
            )
        kq = quant_roundtrip_rows(k, self.bits)
        vq = quant_roundtrip_rows(v, self.bits)
        if self.k[layer] is None:
            self.k[layer], self.v[layer], self.pos[layer] = kq, vq, pos
        else:
            self.k[layer] = torch.cat([self.k[layer], kq], dim=1)
            self.v[layer] = torch.cat([self.v[layer], vq], dim=1)
            self.pos[layer] = torch.cat([self.pos[layer], pos])
        return view
