"""Model adapters for the multimodal runners.

Reference boundary: benchmark/multimodal/common/model_adapter.py +
model_adapters/ (llava_onevision.py, qwen3_vl.py, ...). An adapter owns
model loading and ``generate(sample) -> text``; dataset code never touches
model specifics.

This environment ships no vision checkpoints (zero egress), so:

* ``engine_text`` — REAL: runs the textual side (subtitles/captions +
  question + labeled options) through the production LLMEngine. This is
  the reference's Video-MME --use_subtitles / text-ablation path.
* ``llava_onevision`` / ``qwen3_vl`` — GATED: constructing them raises
  with the exact missing piece (vision tower + checkpoint), mirroring the
  repo's loud-error-over-silent-stub rule.
"""

from __future__ import annotations


class AdapterError(RuntimeError):
    pass


class EngineTextAdapter:
    """Text-only QA through the production engine.

    ``model_path`` may be a real checkpoint directory or ``tiny-random``
    (harness self-tests). Sparse methods/kv dtypes pass through as engine
    kwargs, so visual-context-compression ablations (the reference's
    visual_cache study) can run over subtitle context today.
    """

    name = "engine_text"

    def __init__(self, model_path: str, max_new_tokens: int = 16,
                 **engine_kwargs):
        from sparsevllm_tpu import SamplingParams
        from sparsevllm_tpu.engine.llm_engine import LLM

        self._sp = SamplingParams(
            temperature=0.0, max_tokens=max_new_tokens
        )
        if model_path == "tiny-random":
            engine_kwargs.setdefault("tiny_random", True)
            engine_kwargs.setdefault("dtype", "float32")
            self.engine = LLM(**engine_kwargs)
        else:
            self.engine = LLM(model=model_path, **engine_kwargs)

    def generate(self, prompt: str | None = None,
                 prompt_token_ids: list[int] | None = None) -> str:
        if prompt_token_ids is not None:
            out = self.engine.generate(
                prompt_token_ids=[prompt_token_ids], sampling_params=self._sp
            )[0]
        else:
            out = self.engine.generate(
                [prompt], sampling_params=self._sp
            )[0]
        return out.text if out.text else " ".join(
            str(t) for t in out.output_token_ids
        )

    def close(self) -> None:
        self.engine.exit()


class LlavaClassAdapter:
    """REAL vision path: ViT tower -> llava MLP projector -> image-token
    splice through the production engine (models/vision.py +
    prefill_forward mm_embeds; reference llava_ov_inference.py flow).

    No vision checkpoints ship in this offline image, so the tower is
    seeded-random — same posture as the engine's tiny-random LM and the
    random-weight bench model: the full compute/splice path executes and
    is measurable, only the learned weights are absent. A real checkpoint
    drops in by replacing ``init_vision_params`` output.
    """

    name = "llava_class"
    accepts_images = True

    def __init__(self, model_path: str, max_new_tokens: int = 16,
                 image_token_id: int = 256, **engine_kwargs):
        import jax
        import numpy as np

        from sparsevllm_tpu import SamplingParams
        from sparsevllm_tpu.engine.llm_engine import LLM
        from sparsevllm_tpu.models import vision

        self._np = np
        self._sp = SamplingParams(
            temperature=0.0, max_tokens=max_new_tokens
        )
        self.image_token_id = image_token_id
        engine_kwargs.setdefault("image_token_id", image_token_id)
        if model_path == "tiny-random":
            engine_kwargs.setdefault("tiny_random", True)
            engine_kwargs.setdefault("dtype", "float32")
            self.engine = LLM(**engine_kwargs)
        else:
            self.engine = LLM(model=model_path, **engine_kwargs)
        hidden = self.engine.executor.params["embed"].shape[-1]
        self.vspec = vision.tiny_vision_spec(hidden)
        self.vparams = vision.init_vision_params(
            self.vspec, seed=0,
            dtype=str(self.engine.executor.params["embed"].dtype),
        )
        self._encode = jax.jit(
            lambda px: vision.encode_images(self.vparams, px, self.vspec)
        )
        self._vocab = self.engine.executor.params["embed"].shape[0]

    def _tokenize(self, text: str) -> list[int]:
        if self.engine.tokenizer is not None:
            return self.engine.tokenizer.encode(text)
        # tiny-random LM: deterministic byte-level fallback, leaving
        # [256, vocab) free for special ids like the image placeholder
        return [b for b in text.encode("utf-8")]

    def _pixels(self, image):
        np = self._np
        if isinstance(image, str):
            image = np.load(image)
        px = np.asarray(image, np.float32)
        if px.ndim == 2:
            px = np.stack([px] * 3, axis=-1)
        s = self.vspec.image_size
        if px.shape[:2] != (s, s):  # nearest-neighbor resize
            yi = (np.arange(s) * px.shape[0] // s).clip(0, px.shape[0] - 1)
            xi = (np.arange(s) * px.shape[1] // s).clip(0, px.shape[1] - 1)
            px = px[yi][:, xi]
        if px.max() > 1.5:  # uint8-range -> [-1, 1]
            px = px / 127.5 - 1.0
        return px[None]  # [1, S, S, 3]

    def generate(self, prompt: str | None = None,
                 prompt_token_ids: list[int] | None = None,
                 image=None) -> str:
        import numpy as np

        if prompt_token_ids is None:
            prompt_token_ids = self._tokenize(prompt)
        mm = None
        if image is not None:
            feats = np.asarray(self._encode(self._pixels(image))[0])
            prompt_token_ids = (
                [self.image_token_id] * feats.shape[0] + prompt_token_ids
            )
            mm = [feats]
        out = self.engine.generate(
            prompt_token_ids=[prompt_token_ids], sampling_params=self._sp,
            mm_features=mm,
        )[0]
        return out.text if out.text else " ".join(
            str(t) for t in out.output_token_ids
        )

    def close(self) -> None:
        self.engine.exit()


def _gated_vision(name: str, needs: str):
    class _Gated:
        def __init__(self, *a, **k):
            raise AdapterError(
                f"adapter {name!r} needs {needs}, which this offline TPU "
                f"image does not ship. Provide a local checkpoint and a "
                f"vision-tower forward (models/ has no ViT yet), or use "
                f"adapter='engine_text' for the subtitle/caption path."
            )

    _Gated.name = name
    return _Gated


ADAPTERS = {
    "engine_text": EngineTextAdapter,
    "llava_class": LlavaClassAdapter,
    "llava_onevision": _gated_vision(
        "llava_onevision", "the LLaVA-OneVision checkpoint + SigLIP tower"
    ),
    "qwen3_vl": _gated_vision(
        "qwen3_vl", "the Qwen3-VL checkpoint + ViT tower"
    ),
}


def build_adapter(name: str, model_path: str, **kwargs):
    if name not in ADAPTERS:
        raise AdapterError(
            f"unknown adapter {name!r}; available: {sorted(ADAPTERS)}"
        )
    return ADAPTERS[name](model_path, **kwargs)
