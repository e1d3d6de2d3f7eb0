"""RoPE unit tests: rotation invariants, De-RoPE inverse, rope-scaling.

De-RoPE (reverse=True) is load-bearing for DeltaKV (pre-RoPE key storage,
reference rotary_embedding.py reverse_rotary_emb:20-33) — pin its exactness.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsevllm_tpu.layers.rope import apply_rope, rope_table


def _x(b=2, h=4, d=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)


def test_reverse_rope_is_exact_inverse():
    cos, sin = rope_table(64, 128)
    x = _x()
    pos = jnp.asarray([3, 77])
    y = apply_rope(x, pos, cos, sin)
    back = apply_rope(y, pos, cos, sin, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_rope_preserves_norm():
    cos, sin = rope_table(64, 64)
    x = _x()
    y = apply_rope(x, jnp.asarray([10, 50]), cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_position_zero_is_identity():
    cos, sin = rope_table(32, 8)
    x = _x(d=32)
    y = apply_rope(x, jnp.asarray([0, 0]), cos, sin)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_relative_position_property():
    """<RoPE(q,m), RoPE(k,n)> depends only on m-n (the core RoPE invariant)."""
    cos, sin = rope_table(64, 256)
    q, k = _x(b=1, h=1), _x(b=1, h=1, seed=1)

    def dot(m, n):
        qm = apply_rope(q, jnp.asarray([m]), cos, sin)
        kn = apply_rope(k, jnp.asarray([n]), cos, sin)
        return float(jnp.sum(qm * kn))

    assert dot(10, 7) == pytest.approx(dot(103, 100), rel=1e-4)
    assert dot(5, 5) == pytest.approx(dot(200, 200), rel=1e-4)


def test_matches_manual_neox_rotation():
    d = 8
    cos, sin = rope_table(d, 16)
    x = _x(b=1, h=1, d=d)
    pos = 9
    y = apply_rope(x, jnp.asarray([pos]), cos, sin)
    half = d // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(half) / half))
    ang = pos * inv_freq
    x1, x2 = np.asarray(x)[0, 0, :half], np.asarray(x)[0, 0, half:]
    ref = np.concatenate(
        [x1 * np.cos(ang) - x2 * np.sin(ang),
         x2 * np.cos(ang) + x1 * np.sin(ang)]
    )
    np.testing.assert_allclose(np.asarray(y)[0, 0], ref, atol=1e-5)


def test_linear_scaling_stretches_positions():
    cos_s, sin_s = rope_table(32, 64, scaling={"type": "linear", "factor": 2.0})
    cos, sin = rope_table(32, 64)
    # scaled table at position 2t equals unscaled at position t
    np.testing.assert_allclose(
        np.asarray(cos_s)[20], np.asarray(cos)[10], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sin_s)[20], np.asarray(sin)[10], atol=1e-6
    )


def test_llama3_scaling_keeps_high_freqs_scales_low():
    scaling = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
    }
    cos_s, sin_s = rope_table(128, 4096, scaling=scaling)
    cos, sin = rope_table(128, 4096)
    # the highest-frequency channel (shortest wavelength) is untouched
    np.testing.assert_allclose(
        np.asarray(cos_s)[:, 0], np.asarray(cos)[:, 0], atol=1e-7
    )
    # the lowest-frequency channel is scaled: its angle shrinks 8x, so
    # sin(pos * f/8) ~= sin(pos * f) / 8 in the small-angle regime.
    p = 4000
    ratio = float(sin[p, -1]) / float(sin_s[p, -1])
    assert ratio == pytest.approx(8.0, rel=0.05)


def test_unknown_scaling_type_rejected():
    with pytest.raises(ValueError, match="rope_scaling"):
        rope_table(32, 8, scaling={"type": "yarn", "factor": 2.0})
