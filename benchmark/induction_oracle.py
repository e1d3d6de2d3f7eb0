"""Hand-constructed induction-head model: exact associative recall.

The accuracy ladder needs a retrieval-CAPABLE model to measure sparse
methods against, and this offline image ships no pretrained checkpoints.
SGD on synthetic recall plateaus (induction circuits form slowly without
full LM-loss dynamics — measured: value accuracy 0.23 after 4k steps), so
the oracle is CONSTRUCTED instead: a 2-layer transformer whose weights
analytically implement the classic induction circuit

    layer 0:    two position heads write the previous-1 / previous-2
                token's code into private residual subspaces (S1 / S2)
    layers 1-2: induction heads match own-S1 (what followed me last
                time?) against every position's S2 and copy that
                position's token one-hot into the logits subspace at
                weight 0.8 each (BOTH layers must survive sparsification
                for the value to win); a 1-neuron MLP implements the
                (QUERY_MARK -> ANS_MARK) bigram

so on sequences ``... [K key A val] ... [Q key A]`` greedy decoding emits
``A val`` exactly — dense accuracy 1.0 BY CONSTRUCTION, making per-method
accuracy deltas fully attributable. Retrieval happens at decode step 2
from post-compaction cache state, exactly what the ladder measures.

Construction notes (NeoX rope, layers/rope.py: pair j = dims (j, j+64),
angle pos * theta^{-j/64}):

* position heads: q and k are CONSTANT vectors u (one-hot embeddings sum
  to 1, so W = 1_T u^T gives content-independent q/k); with u supported
  on high-frequency rope pairs the score is a function of relative
  distance only, f(d) = sum_j cos(w_j (d + delta)) — a kernel peaked at
  d = -delta. Pre-rotating u by -theta(delta) aims the peak.
* token codes: random unit codes live on the LOWEST-frequency rope pairs
  (theta = 1e8 makes their rotation < 1e-3 rad over 4K tokens), so the
  layer-2 content match is position-invariant without needing rope-free
  dims. QUERY_MARK gets an exclusive code dim so the bigram MLP gate is
  exactly zero elsewhere.
"""

from __future__ import annotations

import numpy as np

VOCAB = 512
HID = 1024
NHEADS = 8  # 0-3 value transport, 4 observation (zero-output), 5-7 unused
DH = 128
HALF = DH // 2  # 64 rope pairs
THETA = 1.0e8

# residual subspaces
T0 = 0          # token one-hot: dims [0, 512)
S1 = 512        # prev-1 code:   dims [512, 512+CODE)
S2 = 512 + 128  # prev-2 code:   dims [640, 640+CODE)

CODE = 48
# rope-safe pairs for the content match (j >= 40: w <= 1e-5 rad/token)
RS_DIMS = list(range(40, 64)) + list(range(104, 128))
# high-frequency pairs for the position kernel (j < 16)
POS_PAIRS = 16


def _codes(rng) -> np.ndarray:
    """[VOCAB, CODE] random unit codes; QUERY_MARK's last dim exclusive."""
    c = rng.standard_normal((VOCAB, CODE)).astype(np.float64)
    c[:, CODE - 1] = 0.0
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    from benchmark.accuracy_ladder import QUERY_MARK

    c[QUERY_MARK] = 0.0
    c[QUERY_MARK, CODE - 1] = 1.0
    return c


def _pos_kernel_u(delta: int) -> np.ndarray:
    """[DH] constant q-vector for a previous-``delta`` head: unit mass on
    the first POS_PAIRS rope pairs, pre-rotated by -theta(delta)."""
    u = np.zeros(DH)
    inv_freq = THETA ** (-np.arange(HALF, dtype=np.float64) / HALF)
    for j in range(POS_PAIRS):
        ang = -delta * inv_freq[j]
        # rotating (x1, x2) = (1, 0) by ang under NeoX apply_rope
        u[j] = np.cos(ang)
        u[j + HALF] = np.sin(ang)
    return u


def pos_kernel_gap(delta: int, max_d: int = 4096) -> float:
    """Score gap between the target offset and the best distractor for a
    previous-``delta`` position head: score(d) = sum_j cos(w_j (d - delta))
    over lookback distances d, peaking at POS_PAIRS when d == delta."""
    inv_freq = THETA ** (-np.arange(HALF, dtype=np.float64) / HALF)
    w = inv_freq[:POS_PAIRS]
    d = np.arange(0, max_d, dtype=np.float64)
    score = np.cos(np.outer(d - delta, w)).sum(axis=1)
    return float(POS_PAIRS - score[d != delta].max())


def build_params(seed: int = 0, dtype=np.float32) -> dict:
    """Engine-layout params dict (stacked [L, ...] per-layer weights)."""
    rng = np.random.default_rng(seed)
    codes = _codes(rng)
    from benchmark.accuracy_ladder import ANS_MARK

    # 3 layers: position heads, then TWO induction layers each writing
    # the retrieved value at weight 0.8 — BOTH must survive for the value
    # logit (1.6) to beat the position's own ANS_MARK one-hot (1.0), so
    # sparse methods that damage a single deep layer (deltakv latents,
    # omnikv keep-sets) measurably fail instead of being rescued by a
    # single all-powerful retrieval layer.
    l = 3
    IND_OUT = 0.8
    wq = np.zeros((l, HID, NHEADS * DH))
    wk = np.zeros((l, HID, NHEADS * DH))
    wv = np.zeros((l, HID, NHEADS * DH))
    wo = np.zeros((l, NHEADS * DH, HID))

    # rms_norm gain on a one-hot over HID dims: x / sqrt(mean x^2)
    rms1 = np.sqrt(HID)  # layer-1 input is the pure embedding
    sm = DH ** -0.5

    # ---- layer 0: position heads (head 0: prev-1, head 1: prev-2) ----
    gap = pos_kernel_gap(1)
    # want sharpness: scale^2 * rms1^2 * sm * gap >= 30
    c_pos = np.sqrt(30.0 / max(gap, 1e-6) / (rms1 ** 2) / sm)
    for h, delta in ((0, 1), (1, 2)):
        u_q = _pos_kernel_u(delta) * c_pos
        u_k = _pos_kernel_u(0) * c_pos
        # constant q/k: every token one-hot sums to 1 over T dims
        wq[0, T0:T0 + VOCAB, h * DH:(h + 1) * DH] = u_q[None, :]
        wk[0, T0:T0 + VOCAB, h * DH:(h + 1) * DH] = u_k[None, :]
        # value: token -> its code (on the first CODE head dims)
        wv[0, T0:T0 + VOCAB, h * DH:h * DH + CODE] = codes
        # route into S1/S2 at unit scale (attended v carries rms1 gain)
        dst = S1 if delta == 1 else S2
        for i in range(CODE):
            wo[0, h * DH + i, dst + i] = 1.0 / rms1

    # ---- layers 1..2: induction heads ----
    # residual mean-square per layer input: one-hot + S1 + S2 (+ prior
    # retrieval at layer 2)
    from benchmark.accuracy_ladder import PAIR_LO, QUERY_MARK

    # query-side code table for the observation heads: only content-bearing
    # (pair-space) tokens fire — a trained retrieval head attends key/value
    # tokens, not filler (filler-driven induction matches on repeats would
    # otherwise outnumber the needle ~200:1 in the obs-window score sum)
    qcode = codes.copy()
    qcode[:PAIR_LO] = 0.0
    qcode[QUERY_MARK] = 0.0
    qcode[ANS_MARK] = 0.0
    for li, msq in ((1, 3.0), (2, 3.0 + IND_OUT ** 2)):
        rms_l = np.sqrt(HID / msq)
        c_ind = np.sqrt(30.0 / 0.35 / (rms_l ** 2) / sm)  # 0.35 = margin
        for h in range(4):
            for i in range(CODE):
                wq[li, S1 + i, h * DH + RS_DIMS[i]] = c_ind
                wk[li, S2 + i, h * DH + RS_DIMS[i]] = c_ind
            # value: this position's token one-hot, slice h
            for i in range(DH):
                tok = h * DH + i
                if tok < VOCAB:
                    wv[li, T0 + tok, h * DH + i] = 1.0
                    wo[li, h * DH + i, T0 + tok] = IND_OUT / rms_l
        # heads 4-7: OBSERVATION heads (zero v/o — no effect on logits).
        # q = own-token code (pair-space only), k = prev-2 code, so during
        # PREFILL the final "... Q key" query attends the value position
        # exactly — giving score-driven methods (snapkv/pyramidkv/rkv
        # observation windows) the retrieval signal a real model's
        # prompt-end question carries. Without it the induction match only
        # fires at decode time and every prefill-score method structurally
        # scores 0; 4 copies out-weigh value-head filler-repeat matches in
        # the summed-over-heads score.
        for h in range(4, NHEADS):
            for i in range(CODE):
                wq[li, T0:T0 + VOCAB, h * DH + RS_DIMS[i]] = (
                    qcode[:, i] * c_ind
                )
                wk[li, S2 + i, h * DH + RS_DIMS[i]] = c_ind

    layers = {
        "input_norm": np.ones((l, HID)),
        "post_attn_norm": np.ones((l, HID)),
        "wq": wq, "wk": wk, "wv": wv, "wo": wo,
        "w_gate": np.zeros((l, HID, 4)),
        "w_up": np.zeros((l, HID, 4)),
        "w_down": np.zeros((l, 4, HID)),
    }
    # bigram MLP (LAST layer, neuron 0): prev == QUERY_MARK -> ANS_MARK.
    # gate reads S1's exclusive QUERY_MARK dim (exactly 0 otherwise);
    # up reads the always-1 token-sum so the product is linear in gate.
    # It must live in the last layer: its magnitude-6 T0 write would
    # otherwise inflate the query position's rms ~3x and crush the NEXT
    # layer's q scale (diffuse attention -> no observation score).
    rms2 = np.sqrt(HID / 3.0)
    layers["w_gate"][l - 1, S1 + CODE - 1, 0] = 8.0
    layers["w_up"][l - 1, T0:T0 + VOCAB, 0] = 1.0
    layers["w_down"][l - 1, 0, T0 + ANS_MARK] = 6.0 / rms2 / rms2

    embed = np.zeros((VOCAB, HID))
    embed[:, :VOCAB] = np.eye(VOCAB)
    params = {
        "embed": embed,
        "final_norm": np.ones(HID),
        "layers": layers,
    }

    import jax.numpy as jnp

    jdt = jnp.float32 if dtype == np.float32 else jnp.bfloat16
    return {
        k: ({kk: jnp.asarray(vv, jdt) for kk, vv in v.items()}
            if k == "layers" else jnp.asarray(v, jdt))
        for k, v in params.items()
    }


def oracle_spec():
    from sparsevllm_tpu.models.spec import ModelSpec

    return ModelSpec(
        model_type="llama", num_layers=3, hidden_size=HID,
        num_q_heads=NHEADS, num_kv_heads=NHEADS, head_dim=DH,
        intermediate_size=4, vocab_size=VOCAB, rms_norm_eps=1e-6,
        rope_theta=THETA, max_position_embeddings=16384,
        tie_word_embeddings=True,
    )
