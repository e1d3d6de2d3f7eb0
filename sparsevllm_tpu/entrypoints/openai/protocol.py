"""OpenAI-compatible request parsing/validation (dependency-free).

Mirrors the reference's pydantic protocol models
(entrypoints/openai/protocol/) as plain validated dataclasses — this
environment has no pydantic/fastapi, and the schema surface we need
(completions + chat.completions + models) is small.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from ...sampling_params import SamplingParams


class ProtocolError(ValueError):
    """400-level request error."""


def _get(d: dict, key: str, typ, default):
    v = d.get(key, default)
    if v is default:
        return v
    if typ is float and isinstance(v, int):
        v = float(v)
    if not isinstance(v, typ):
        raise ProtocolError(f"field {key!r} must be {typ.__name__}")
    return v


def sampling_from_request(body: dict, default_max_tokens: int = 1024) -> SamplingParams:
    temperature = _get(body, "temperature", float, 1.0)
    top_p = _get(body, "top_p", float, 1.0)
    top_k = _get(body, "top_k", int, 0)
    max_tokens = body.get("max_tokens", body.get("max_completion_tokens"))
    if max_tokens is None:
        max_tokens = default_max_tokens
    if not isinstance(max_tokens, int) or max_tokens < 1:
        raise ProtocolError("max_tokens must be a positive integer")
    stop = body.get("stop")
    if stop is None:
        stop_strs: tuple[str, ...] = ()
    elif isinstance(stop, str):
        stop_strs = (stop,)
    elif isinstance(stop, list) and all(isinstance(s, str) for s in stop):
        stop_strs = tuple(stop)
    else:
        raise ProtocolError("stop must be a string or list of strings")
    seed = body.get("seed")
    ignore_eos = bool(body.get("ignore_eos", False))
    # completions: integer "logprobs"; chat: "logprobs": true +
    # "top_logprobs": N (OpenAI schema)
    logprobs = body.get("logprobs")
    if logprobs is True:
        logprobs = _get(body, "top_logprobs", int, 0)
    elif logprobs is False:
        logprobs = None
    if logprobs is not None and not isinstance(logprobs, int):
        raise ProtocolError("logprobs must be an integer or true")
    if isinstance(logprobs, int) and not 0 <= logprobs <= 20:
        raise ProtocolError("logprobs must be in [0, 20]")
    return SamplingParams(
        temperature=temperature,
        top_p=top_p,
        top_k=top_k,
        max_tokens=max_tokens,
        stop=stop_strs,
        seed=seed if isinstance(seed, int) else None,
        ignore_eos=ignore_eos,
        logprobs=logprobs if isinstance(logprobs, int) else None,
    )


@dataclass
class CompletionRequest:
    prompt: str | list[int]
    sampling: SamplingParams
    stream: bool
    model: str
    n: int = 1
    echo: bool = False
    request_id: str = field(
        default_factory=lambda: f"cmpl-{uuid.uuid4().hex[:24]}"
    )

    @staticmethod
    def from_body(body: dict, default_max_tokens: int) -> "CompletionRequest":
        prompt = body.get("prompt")
        if isinstance(prompt, list) and all(
            isinstance(t, int) for t in prompt
        ):
            pass
        elif not isinstance(prompt, str):
            raise ProtocolError("prompt must be a string or list of ints")
        return CompletionRequest(
            prompt=prompt,
            sampling=sampling_from_request(body, default_max_tokens),
            stream=bool(body.get("stream", False)),
            model=str(body.get("model", "")),
            n=_get(body, "n", int, 1),
            echo=bool(body.get("echo", False)),
        )


@dataclass
class ChatRequest:
    messages: list[dict]
    sampling: SamplingParams
    stream: bool
    model: str
    request_id: str = field(
        default_factory=lambda: f"chatcmpl-{uuid.uuid4().hex[:24]}"
    )

    @staticmethod
    def from_body(body: dict, default_max_tokens: int) -> "ChatRequest":
        messages = body.get("messages")
        if not isinstance(messages, list) or not messages:
            raise ProtocolError("messages must be a non-empty list")
        for m in messages:
            if not isinstance(m, dict) or "role" not in m:
                raise ProtocolError("each message needs a 'role'")
        return ChatRequest(
            messages=messages,
            sampling=sampling_from_request(body, default_max_tokens),
            stream=bool(body.get("stream", False)),
            model=str(body.get("model", "")),
        )


@dataclass
class ResponsesRequest:
    """OpenAI Responses API request (reference entrypoints/openai/
    protocol/responses + serving/responses.py)."""

    input_items: list[dict]  # normalized to chat-style messages
    sampling: SamplingParams
    stream: bool
    model: str
    instructions: str | None = None
    request_id: str = field(
        default_factory=lambda: f"resp_{uuid.uuid4().hex[:24]}"
    )

    @staticmethod
    def from_body(body: dict, default_max_tokens: int) -> "ResponsesRequest":
        raw = body.get("input")
        if raw is None:
            raise ProtocolError("'input' is required")
        if isinstance(raw, str):
            items = [{"role": "user", "content": raw}]
        elif isinstance(raw, list):
            items = []
            for it in raw:
                if not isinstance(it, dict) or "role" not in it:
                    raise ProtocolError(
                        "input items must be {role, content} objects")
                content = it.get("content", "")
                if isinstance(content, list):
                    # content parts: concatenate text parts; reject
                    # unsupported modalities LOUDLY (a silently-dropped
                    # image part would corrupt the request's meaning —
                    # ADVICE r2: pin a 4xx, not pass-through-drop)
                    texts = []
                    for p in content:
                        if not isinstance(p, dict):
                            raise ProtocolError(
                                "content parts must be objects")
                        if p.get("type") in ("input_text", "output_text",
                                             "text"):
                            texts.append(p.get("text", ""))
                        else:
                            raise ProtocolError(
                                f"unsupported content part type "
                                f"{p.get('type')!r} (text-only serving; "
                                f"multimodal inputs go through the "
                                f"benchmark/multimodal adapters)"
                            )
                    content = "".join(texts)
                items.append({"role": it["role"], "content": content})
        else:
            raise ProtocolError("input must be a string or a list of items")
        # responses uses max_output_tokens
        body = dict(body)
        if "max_output_tokens" in body and "max_tokens" not in body:
            body["max_tokens"] = body["max_output_tokens"]
        instructions = body.get("instructions")
        if instructions:
            items = [{"role": "system", "content": instructions}] + items
        return ResponsesRequest(
            input_items=items,
            sampling=sampling_from_request(body, default_max_tokens),
            stream=bool(body.get("stream", False)),
            model=str(body.get("model", "")),
            instructions=instructions,
        )


def parse_reasoning(text: str) -> tuple[str | None, str]:
    """Split a Qwen3-style ``<think>...</think>`` block into
    (reasoning_content, content) — reference
    entrypoints/openai/serving/response_parsing.py semantics: the block
    must open the message; an unterminated block is all reasoning."""
    s = text.lstrip()
    if not s.startswith("<think>"):
        return None, text
    body = s[len("<think>"):]
    end = body.find("</think>")
    if end < 0:
        return body.strip(), ""
    return body[:end].strip(), body[end + len("</think>"):].lstrip("\n")


def response_object(req_id: str, model: str, text: str,
                    status: str, created: int,
                    usage: dict | None = None) -> dict:
    """OpenAI Responses API response object (reasoning blocks become a
    separate output item, reference serving/responses.py)."""
    reasoning, content = parse_reasoning(text)
    output = []
    if reasoning is not None:
        output.append({
            "type": "reasoning",
            "id": f"rs_{req_id}",
            "summary": [],
            "content": [{"type": "reasoning_text", "text": reasoning}],
        })
    output.append({
        "type": "message",
        "id": f"msg_{req_id}",
        "role": "assistant",
        "status": "completed" if status == "completed" else "in_progress",
        "content": [{"type": "output_text", "text": content,
                     "annotations": []}],
    })
    return {
        "id": req_id,
        "object": "response",
        "created_at": created,
        "status": status,
        "model": model,
        "output": output,
        "output_text": content,
        "usage": usage or {},
    }


def completion_chunk(req_id: str, model: str, text: str,
                     finish_reason: str | None, created: int) -> dict:
    return {
        "id": req_id,
        "object": "text_completion",
        "created": created,
        "model": model,
        "choices": [{
            "index": 0,
            "text": text,
            "logprobs": None,
            "finish_reason": finish_reason,
        }],
    }


def chat_chunk(req_id: str, model: str, delta: dict,
               finish_reason: str | None, created: int) -> dict:
    return {
        "id": req_id,
        "object": "chat.completion.chunk",
        "created": created,
        "model": model,
        "choices": [{
            "index": 0,
            "delta": delta,
            "finish_reason": finish_reason,
        }],
    }


def usage_dict(prompt_tokens: int, completion_tokens: int) -> dict:
    return {
        "prompt_tokens": prompt_tokens,
        "completion_tokens": completion_tokens,
        "total_tokens": prompt_tokens + completion_tokens,
    }


def now() -> int:
    return int(time.time())


def completion_logprobs(token_ids: list[int], lps: list[float],
                        tops: list[dict[int, float]], tokenizer) -> dict:
    """OpenAI completions `logprobs` object (tokens / token_logprobs /
    top_logprobs / text_offset). Token ids render as strings via the
    tokenizer when available (reference serving logprobs formatting)."""
    def tok_str(t: int) -> str:
        if tokenizer is None:
            return f"token_id:{t}"
        return tokenizer.decode([t])

    tokens = [tok_str(t) for t in token_ids]
    offsets = []
    pos = 0
    for t in tokens:
        offsets.append(pos)
        pos += len(t)
    top_out = [
        {tok_str(t): lp for t, lp in d.items()} if d else None
        for d in tops
    ] if tops else None
    return {
        "tokens": tokens,
        "token_logprobs": [float(x) for x in lps],
        "top_logprobs": top_out,
        "text_offset": offsets,
    }
