"""Vision tower + multimodal image-token splice.

Reference parity target: src/deltakv/modeling/llava_ov_inference.py —
vision tower -> MLP projector -> input-embeds splice at image-placeholder
positions. The strongest check here is the SPLICE IDENTITY test: if the
projector rows handed to the engine are exactly the embedding-table rows
of some replacement tokens, generation must be token-identical to running
those replacement tokens as a plain text prompt (the splice is then a
semantic no-op, so any divergence is a splice bug, not a model choice).
"""

import numpy as np
import pytest

from sparsevllm_tpu import SamplingParams
from sparsevllm_tpu.engine.llm_engine import LLM
from sparsevllm_tpu.models import vision

GREEDY = SamplingParams(temperature=0.0, max_tokens=6)
IMG_ID = 300

BASE = dict(
    tiny_random=True,
    tiny_random_seed=0,
    dtype="float32",
    page_size=8,
    num_kv_pages=512,
    max_model_len=512,
    chunk_prefill_size=64,
    max_num_batched_tokens=256,
    max_num_seqs_in_batch=4,
    max_decoding_seqs=8,
    decode_context_bucket_base=64,
    image_token_id=IMG_ID,
)


def test_vision_tower_and_projector_shapes():
    spec = vision.tiny_vision_spec(text_hidden_size=48)
    params = vision.init_vision_params(spec, seed=0)
    px = np.random.default_rng(0).random(
        (2, spec.image_size, spec.image_size, 3), np.float32
    )
    feats = vision.vision_forward(params, px, spec)
    assert feats.shape == (2, spec.num_patches, spec.hidden_size)
    rows = vision.encode_images(params, px, spec)
    assert rows.shape == (2, spec.num_patches, 48)
    # deterministic for a fixed seed (serving-cache requirement)
    rows2 = vision.encode_images(params, px, spec)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(rows2))


@pytest.fixture(scope="module")
def engine():
    eng = LLM(**BASE)
    yield eng
    eng.exit()


def _embed_rows(eng, token_ids):
    emb = np.asarray(eng.executor.params["embed"])
    return emb[np.asarray(token_ids)]


def test_splice_identity_short_prompt(engine):
    rng = np.random.default_rng(1)
    text = rng.integers(3, 250, 20).tolist()
    repl = rng.integers(3, 250, 4).tolist()
    spliced = text[:8] + [IMG_ID] * 4 + text[8:]
    plain = text[:8] + repl + text[8:]
    out_mm = engine.generate(
        prompt_token_ids=[spliced], sampling_params=GREEDY,
        mm_features=[_embed_rows(engine, repl)],
    )[0].output_token_ids
    out_plain = engine.generate(
        prompt_token_ids=[plain], sampling_params=GREEDY,
    )[0].output_token_ids
    assert out_mm == out_plain


def test_splice_identity_across_chunks(engine):
    # placeholders straddle the 64-token chunk boundary: positions 60..75
    rng = np.random.default_rng(2)
    text = rng.integers(3, 250, 150).tolist()
    repl = rng.integers(3, 250, 16).tolist()
    spliced = text[:60] + [IMG_ID] * 16 + text[60:]
    plain = text[:60] + repl + text[60:]
    out_mm = engine.generate(
        prompt_token_ids=[spliced], sampling_params=GREEDY,
        mm_features=[_embed_rows(engine, repl)],
    )[0].output_token_ids
    out_plain = engine.generate(
        prompt_token_ids=[plain], sampling_params=GREEDY,
    )[0].output_token_ids
    assert out_mm == out_plain


def test_mixed_batch_mm_and_text(engine):
    # one multimodal + one text request in the same batch: the text row
    # must be unaffected by the mm row's plan keys
    rng = np.random.default_rng(3)
    text_a = rng.integers(3, 250, 30).tolist()
    text_b = rng.integers(3, 250, 25).tolist()
    repl = rng.integers(3, 250, 4).tolist()
    spliced = text_a[:5] + [IMG_ID] * 4 + text_a[5:]
    solo = engine.generate(
        prompt_token_ids=[text_b], sampling_params=GREEDY
    )[0].output_token_ids
    outs = engine.generate(
        prompt_token_ids=[spliced, text_b],
        sampling_params=[GREEDY, GREEDY],
        mm_features=[_embed_rows(engine, repl), None],
    )
    assert outs[1].output_token_ids == solo
    plain = text_a[:5] + repl + text_a[5:]
    assert outs[0].output_token_ids == engine.generate(
        prompt_token_ids=[plain], sampling_params=GREEDY
    )[0].output_token_ids


def test_mm_validation(engine):
    rng = np.random.default_rng(4)
    feats = _embed_rows(engine, [5, 6, 7])
    with pytest.raises(ValueError, match="image-placeholder"):
        engine.add_request(
            prompt_token_ids=[3, IMG_ID, 4], sampling_params=GREEDY,
            mm_features=feats,  # 3 rows, 1 placeholder
        )
    with pytest.raises(ValueError, match="hidden"):
        engine.add_request(
            prompt_token_ids=[3, IMG_ID, IMG_ID, IMG_ID, 4],
            sampling_params=GREEDY,
            mm_features=rng.random((3, 7), np.float32),
        )


def test_mm_requires_image_token_id():
    kw = dict(BASE)
    kw.pop("image_token_id")
    eng = LLM(**kw)
    try:
        with pytest.raises(ValueError, match="image_token_id"):
            eng.add_request(
                prompt_token_ids=[3, 4, 5], sampling_params=GREEDY,
                mm_features=np.zeros((0, 8), np.float32),
            )
    finally:
        eng.exit()


def test_llava_class_adapter_end_to_end():
    from benchmark.multimodal.adapters import build_adapter

    ad = build_adapter(
        "llava_class", "tiny-random",
        page_size=8, num_kv_pages=512, max_model_len=512,
        chunk_prefill_size=64, max_num_batched_tokens=256,
        max_num_seqs_in_batch=2, max_decoding_seqs=2,
        decode_context_bucket_base=64,
    )
    try:
        img = np.random.default_rng(0).random((40, 48, 3), np.float32)
        text = ad.generate(prompt="Which shape is shown?", image=img)
        assert isinstance(text, str) and text
        # with vs without the image must differ in SOME prompt handling:
        # same question, no image -> plain text path also works
        text2 = ad.generate(prompt="Which shape is shown?")
        assert isinstance(text2, str)
    finally:
        ad.close()
