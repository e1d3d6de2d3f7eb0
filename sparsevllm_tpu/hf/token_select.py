"""HF-side token selection math (reference modeling/token_select.py).

Pure torch; shared by the HF cache pipelines and usable as a reference
for the engine's in-scan selection semantics."""

from __future__ import annotations

import torch


def snapkv_token_selection(
    attn: torch.Tensor,  # [B, H, S, K] prefill attention probabilities
    obs_window: int,
    keep: int,
    kernel_size: int = 0,
) -> torch.Tensor:
    """SnapKV: score history tokens by the last ``obs_window`` queries'
    attention mass (head-summed, optional 1D max-pool smoothing); keep the
    top-``keep - obs_window`` prefix positions plus the window itself.
    Returns sorted kept indices [B, min(keep, K)].
    """
    b, h, s, k = attn.shape
    w = min(obs_window, s)
    scores = attn[:, :, s - w:, :].sum(dim=(1, 2))  # [B, K]
    if kernel_size > 1:
        pad = kernel_size // 2
        scores = torch.nn.functional.max_pool1d(
            scores[:, None], kernel_size, stride=1,
            padding=pad,
        )[:, 0, :k]
    prefix_len = k - w
    n_prefix = max(min(keep, k) - w, 0)
    kept = []
    for i in range(b):
        cand = scores[i, :prefix_len]
        top = torch.topk(cand, min(n_prefix, prefix_len)).indices
        idx = torch.cat([
            top.sort().values,
            torch.arange(prefix_len, k, device=attn.device),
        ])[: min(keep, k)]
        kept.append(idx)
    return torch.stack(kept)


def omnikv_token_selection(
    attn: torch.Tensor,  # [B, H, 1, K] decode attention of a FULL layer
    keep: int,
    sink: int,
    recent: int,
    ctx_len: int,
) -> torch.Tensor:
    """OmniKV: head-summed decode scores on an observation layer pick the
    top-``keep`` middle tokens; sink and recent are always kept. Returns a
    bool keep-mask [B, K] (reference token_select.omnikv_token_selection).
    """
    b, h, _, k = attn.shape
    scores = attn.sum(dim=(1, 2))  # [B, K]
    pos = torch.arange(k, device=attn.device)
    in_ctx = pos < ctx_len
    sink_m = (pos < sink) & in_ctx
    recent_m = (pos >= max(ctx_len - recent, 0)) & in_ctx
    middle = in_ctx & ~sink_m & ~recent_m
    masked = scores.masked_fill(~middle[None], float("-inf"))
    kk = min(keep, int(middle.sum()))
    sel = torch.zeros(b, k, dtype=torch.bool, device=attn.device)
    if kk > 0:
        top = torch.topk(masked, kk, dim=-1).indices
        sel.scatter_(1, top, True)
        sel &= middle[None]
    return sel | sink_m[None] | recent_m[None]
