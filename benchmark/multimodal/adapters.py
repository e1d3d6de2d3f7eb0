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
