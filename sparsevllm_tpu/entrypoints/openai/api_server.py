"""OpenAI-compatible API server (aiohttp).

Re-expresses reference entrypoints/openai/api_server.py:89-219 + routes/ +
serving/ on aiohttp (this environment has no fastapi/uvicorn): routes
/v1/completions, /v1/chat/completions, /v1/models, /health, /worker/info,
/worker/load; SSE streaming; stop-string enforcement on decoded text;
fatal-engine-error -> 503 + unhealthy /health (the reference shuts uvicorn
down; systemd-style supervisors restart either way).

Run:
    python -m sparsevllm_tpu.entrypoints.openai.api_server \
        --model /path/to/hf-checkpoint --port 8000 [--engine-kwargs JSON]
    python -m sparsevllm_tpu.entrypoints.openai.api_server --tiny-random
"""

from __future__ import annotations

import argparse
import asyncio
import json

from aiohttp import web

from ...engine.llm_engine import LLMEngine
from ...utils.log import logger
from . import protocol as proto
from .detokenizer import IncrementalDetokenizer
from .dispatcher import AsyncEngineDispatcher, StreamDelta


def _sse(data: dict) -> bytes:
    return b"data: " + json.dumps(data, separators=(",", ":")).encode() + b"\n\n"


_SSE_DONE = b"data: [DONE]\n\n"
_SSE_HEADERS = {
    "Content-Type": "text/event-stream",
    "Cache-Control": "no-cache",
    "Connection": "keep-alive",
}


class OpenAIServer:
    def __init__(self, engine: LLMEngine, served_model: str = "",
                 request_log_dir: str = ""):
        self.engine = engine
        self.dispatcher = AsyncEngineDispatcher(engine)
        self.served_model = served_model or engine.config.model or "tiny-random"
        self.tokenizer = engine.tokenizer
        self._request_log = None
        if request_log_dir:
            import os
            import time as _time

            os.makedirs(request_log_dir, exist_ok=True)
            self._request_log = open(
                os.path.join(
                    request_log_dir,
                    f"requests-{int(_time.time())}.jsonl",
                ),
                "a",
            )

    # ------------------------------------------------------------- helpers

    def _log_request(self, kind: str, request_id: str, prompt_tokens: int,
                     output_tokens: int, finish: str | None) -> None:
        """Per-request JSONL log (reference api_server request_log_dir)."""
        if self._request_log is None:
            return
        import time as _time

        self._request_log.write(json.dumps({
            "ts": round(_time.time(), 3),
            "kind": kind,
            "id": request_id,
            "model": self.served_model,
            "prompt_tokens": prompt_tokens,
            "output_tokens": output_tokens,
            "finish_reason": finish,
        }) + "\n")
        self._request_log.flush()

    def _encode_prompt(self, prompt) -> list[int]:
        if isinstance(prompt, list):
            return prompt
        if self.tokenizer is None:
            raise proto.ProtocolError(
                "server has no tokenizer (tiny_random); send token ids"
            )
        return self.tokenizer.encode(prompt)

    def _render_chat(self, messages: list[dict]) -> list[int]:
        if self.tokenizer is None:
            raise proto.ProtocolError(
                "server has no tokenizer (tiny_random); use /v1/completions "
                "with token ids"
            )
        try:
            return self.tokenizer.apply_chat_template(
                messages, tokenize=True, add_generation_prompt=True
            )
        except Exception:  # noqa: BLE001 — template-less tokenizers
            text = "".join(
                f"{m.get('role', 'user')}: {m.get('content', '')}\n"
                for m in messages
            ) + "assistant: "
            return self.tokenizer.encode(text)

    @staticmethod
    def _find_stop(text: str, stops: tuple[str, ...]) -> int:
        """Earliest stop-string index in text, or -1."""
        best = -1
        for s in stops:
            i = text.find(s)
            if i >= 0 and (best < 0 or i < best):
                best = i
        return best

    async def _generate(self, prompt_ids, sp, request_id):
        """Core generation: yields (text_delta, delta) honoring stop strings.

        Stop handling uses a vLLM-style holdback buffer: the last
        max(len(stop)) - 1 characters are withheld from each streamed delta
        until the next chunk rules out a stop-string match, so clients never
        see text at or past a stop string (ADVICE r1)."""
        detok = (
            IncrementalDetokenizer(self.tokenizer)
            if self.tokenizer is not None else None
        )
        holdback = max((len(s) for s in sp.stop), default=1) - 1 \
            if sp.stop else 0
        pending = ""  # decoded but not yet yielded (stop holdback tail)
        async for delta in self.dispatcher.submit(prompt_ids, sp, request_id):
            if detok is None:
                yield "", delta
                continue
            text = detok.push(delta.token_ids)
            if delta.finished:
                text += detok.finish()
            if not sp.stop:
                yield text, delta
                continue
            pending += text
            stop_at = self._find_stop(pending, sp.stop)
            if stop_at >= 0:
                yield pending[:stop_at], StreamDelta(
                    delta.token_ids, True, "stop"
                )
                self.dispatcher.abort(request_id)
                return
            if delta.finished:
                yield pending, delta
                return
            emit = pending[: max(len(pending) - holdback, 0)]
            pending = pending[len(emit):]
            yield emit, delta

    # -------------------------------------------------------------- routes

    async def completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
            req = proto.CompletionRequest.from_body(
                body, self.engine.config.max_model_len // 4
            )
            prompt_ids = self._encode_prompt(req.prompt)
        except (proto.ProtocolError, json.JSONDecodeError, ValueError) as e:
            return _err(400, str(e))
        if not self.dispatcher.healthy:
            return _err(503, "engine unavailable")
        created = proto.now()

        if req.stream:
            resp = web.StreamResponse(headers=_SSE_HEADERS)
            await resp.prepare(request)
            try:
                async for text, delta in self._generate(
                    prompt_ids, req.sampling, req.request_id
                ):
                    if text or delta.finished:
                        await resp.write(_sse(proto.completion_chunk(
                            req.request_id, self.served_model, text,
                            delta.finish_reason if delta.finished else None,
                            created,
                        )))
                await resp.write(_SSE_DONE)
            except RuntimeError as e:
                await resp.write(_sse({"error": str(e)}))
            await resp.write_eof()
            return resp

        parts: list[str] = []
        n_tokens = 0
        finish = None
        all_tokens: list[int] = []
        all_lps: list[float] = []
        all_top: list[dict[int, float]] = []
        try:
            async for text, delta in self._generate(
                prompt_ids, req.sampling, req.request_id
            ):
                parts.append(text)
                n_tokens += len(delta.token_ids)
                if req.sampling.logprobs is not None:
                    all_tokens.extend(delta.token_ids)
                    all_lps.extend(delta.logprobs or [])
                    all_top.extend(delta.top_logprobs or [])
                if delta.finished:
                    finish = delta.finish_reason
        except RuntimeError as e:
            return _err(500, str(e))
        text = "".join(parts)
        if req.echo and isinstance(req.prompt, str):
            text = req.prompt + text
        out = proto.completion_chunk(
            req.request_id, self.served_model, text, finish, created
        )
        out["object"] = "text_completion"
        out["usage"] = proto.usage_dict(len(prompt_ids), n_tokens)
        if req.sampling.logprobs is not None:
            out["choices"][0]["logprobs"] = proto.completion_logprobs(
                all_tokens, all_lps, all_top, self.tokenizer
            )
        self._log_request("completion", req.request_id, len(prompt_ids),
                          n_tokens, finish)
        return web.json_response(out)

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
            req = proto.ChatRequest.from_body(
                body, self.engine.config.max_model_len // 4
            )
            prompt_ids = self._render_chat(req.messages)
        except (proto.ProtocolError, json.JSONDecodeError, ValueError) as e:
            return _err(400, str(e))
        if not self.dispatcher.healthy:
            return _err(503, "engine unavailable")
        created = proto.now()

        if req.stream:
            resp = web.StreamResponse(headers=_SSE_HEADERS)
            await resp.prepare(request)
            await resp.write(_sse(proto.chat_chunk(
                req.request_id, self.served_model,
                {"role": "assistant", "content": ""}, None, created,
            )))
            try:
                async for text, delta in self._generate(
                    prompt_ids, req.sampling, req.request_id
                ):
                    if text or delta.finished:
                        await resp.write(_sse(proto.chat_chunk(
                            req.request_id, self.served_model,
                            {"content": text} if text else {},
                            delta.finish_reason if delta.finished else None,
                            created,
                        )))
                await resp.write(_SSE_DONE)
            except RuntimeError as e:
                await resp.write(_sse({"error": str(e)}))
            await resp.write_eof()
            return resp

        parts: list[str] = []
        n_tokens = 0
        finish = None
        try:
            async for text, delta in self._generate(
                prompt_ids, req.sampling, req.request_id
            ):
                parts.append(text)
                n_tokens += len(delta.token_ids)
                if delta.finished:
                    finish = delta.finish_reason
        except RuntimeError as e:
            return _err(500, str(e))
        reasoning, content = proto.parse_reasoning("".join(parts))
        message = {"role": "assistant", "content": content}
        if reasoning is not None:
            message["reasoning_content"] = reasoning
        self._log_request("chat", req.request_id, len(prompt_ids),
                          n_tokens, finish)
        return web.json_response({
            "id": req.request_id,
            "object": "chat.completion",
            "created": created,
            "model": self.served_model,
            "choices": [{
                "index": 0,
                "message": message,
                "finish_reason": finish,
            }],
            "usage": proto.usage_dict(len(prompt_ids), n_tokens),
        })

    async def responses(self, request: web.Request) -> web.StreamResponse:
        """OpenAI Responses API (reference routes/responses +
        serving/responses.py). Chat-rendered input; streams
        response.output_text.delta SSE events or returns one response
        object."""
        try:
            body = await request.json()
            req = proto.ResponsesRequest.from_body(
                body, self.engine.config.max_model_len // 4
            )
            prompt_ids = self._render_chat(req.input_items)
        except (proto.ProtocolError, json.JSONDecodeError, ValueError) as e:
            return _err(400, str(e))
        if not self.dispatcher.healthy:
            return _err(503, "engine unavailable")
        created = proto.now()

        if req.stream:
            # full Responses streaming event ladder with sequence numbers
            # (reference entrypoints/openai/serving/responses.py:1-671:
            # created -> in_progress -> output_item.added ->
            # content_part.added -> output_text.delta* ->
            # output_text.done -> content_part.done -> output_item.done
            # -> completed; each event carries sequence_number).
            resp = web.StreamResponse(headers=_SSE_HEADERS)
            await resp.prepare(request)
            seq = 0
            item_id = f"msg_{req.request_id}"

            async def emit(payload: dict):
                nonlocal seq
                payload["sequence_number"] = seq
                seq += 1
                await resp.write(_sse(payload))

            await emit({
                "type": "response.created",
                "response": proto.response_object(
                    req.request_id, self.served_model, "", "in_progress",
                    created),
            })
            await emit({
                "type": "response.in_progress",
                "response": proto.response_object(
                    req.request_id, self.served_model, "", "in_progress",
                    created),
            })
            await emit({
                "type": "response.output_item.added",
                "output_index": 0,
                "item": {"id": item_id, "type": "message",
                         "role": "assistant", "status": "in_progress",
                         "content": []},
            })
            await emit({
                "type": "response.content_part.added",
                "item_id": item_id, "output_index": 0,
                "content_index": 0,
                "part": {"type": "output_text", "text": ""},
            })
            parts: list[str] = []
            try:
                async for text, delta in self._generate(
                    prompt_ids, req.sampling, req.request_id
                ):
                    if text:
                        parts.append(text)
                        await emit({
                            "type": "response.output_text.delta",
                            "item_id": item_id, "output_index": 0,
                            "content_index": 0,
                            "delta": text,
                        })
                full = "".join(parts)
                await emit({
                    "type": "response.output_text.done",
                    "item_id": item_id, "output_index": 0,
                    "content_index": 0, "text": full,
                })
                await emit({
                    "type": "response.content_part.done",
                    "item_id": item_id, "output_index": 0,
                    "content_index": 0,
                    "part": {"type": "output_text", "text": full},
                })
                await emit({
                    "type": "response.output_item.done",
                    "output_index": 0,
                    "item": {"id": item_id, "type": "message",
                             "role": "assistant", "status": "completed",
                             "content": [{"type": "output_text",
                                          "text": full}]},
                })
                await emit({
                    "type": "response.completed",
                    "response": proto.response_object(
                        req.request_id, self.served_model, full,
                        "completed", created),
                })
            except RuntimeError as e:
                await emit({"type": "error", "error": str(e)})
            await resp.write_eof()
            return resp

        parts = []
        n_tokens = 0
        try:
            async for text, delta in self._generate(
                prompt_ids, req.sampling, req.request_id
            ):
                parts.append(text)
                n_tokens += len(delta.token_ids)
        except RuntimeError as e:
            return _err(500, str(e))
        usage = {
            "input_tokens": len(prompt_ids),
            "output_tokens": n_tokens,
            "total_tokens": len(prompt_ids) + n_tokens,
        }
        return web.json_response(proto.response_object(
            req.request_id, self.served_model, "".join(parts), "completed",
            created, usage))

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{
                "id": self.served_model,
                "object": "model",
                "owned_by": "sparsevllm_tpu",
            }],
        })

    async def health(self, request: web.Request) -> web.Response:
        if self.dispatcher.healthy:
            return web.json_response({"status": "ok"})
        return _err(503, f"engine down: {self.dispatcher.fatal_error!r}")

    async def worker_info(self, request: web.Request) -> web.Response:
        cfg = self.engine.config
        return web.json_response({
            "model": self.served_model,
            "method": cfg.method or "vanilla",
            "max_model_len": cfg.max_model_len,
            "prefix_cache": cfg.enable_prefix_cache,
            "tensor_parallel_size": cfg.tensor_parallel_size,
        })

    async def worker_load(self, request: web.Request) -> web.Response:
        return web.json_response(self.dispatcher.stats())

    async def prefix_cache_match(self, request: web.Request) -> web.Response:
        """Router prefix probe: longest cached prefix for given token ids."""
        body = await request.json()
        token_ids = body.get("token_ids", [])
        matched = 0
        pc = getattr(self.engine, "prefix_cache", None)
        if pc is not None and isinstance(token_ids, list):
            matched = pc.match_length(token_ids)
        return web.json_response({"matched_tokens": matched})

    async def prefix_cache_reset(self, request: web.Request) -> web.Response:
        return web.json_response(self.engine.reset_prefix_cache())

    async def prefix_cache_stats(self, request: web.Request) -> web.Response:
        return web.json_response(self.engine.prefix_cache_stats())

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=256 * 2**20)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/v1/responses", self.responses)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/health", self.health)
        app.router.add_get("/worker/info", self.worker_info)
        app.router.add_get("/worker/load", self.worker_load)
        app.router.add_post("/worker/prefix-cache/match",
                            self.prefix_cache_match)
        app.router.add_post("/worker/prefix-cache/reset",
                            self.prefix_cache_reset)
        app.router.add_get("/worker/prefix-cache/stats",
                           self.prefix_cache_stats)
        return app


def _err(status: int, message: str) -> web.Response:
    return web.json_response(
        {"error": {"message": message, "type": "invalid_request_error"
                   if status < 500 else "server_error"}},
        status=status,
    )


UNSUPPORTED_SERVING_METHOD_PREFIXES = ("deltakv",)
# (reference api_server.py:78 rejects DeltaKV for serving)


def create_app(engine: LLMEngine, served_model: str = "",
               request_log_dir: str = "") -> web.Application:
    method = engine.config.method or ""
    if method.startswith(UNSUPPORTED_SERVING_METHOD_PREFIXES):
        raise ValueError(
            f"method {method!r} is not supported for serving "
            f"(reference api_server.py:78)"
        )
    return OpenAIServer(engine, served_model,
                        request_log_dir=request_log_dir).build_app()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="")
    ap.add_argument("--tiny-random", action="store_true")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--served-model-name", default="")
    ap.add_argument("--request-log-dir", default="",
                    help="write per-request JSONL logs here")
    ap.add_argument("--engine-kwargs", default="{}",
                    help="JSON dict of engine/config kwargs")
    args = ap.parse_args()
    kwargs = json.loads(args.engine_kwargs)
    if args.tiny_random:
        kwargs.setdefault("tiny_random", True)
        kwargs.setdefault("dtype", "float32")
        # debug server: bound the auto-sized KV pool (a 2-layer toy with the
        # production max_model_len would otherwise get a multi-GiB pool
        # whose cache-sized copies wedge the first prefill)
        kwargs.setdefault("max_model_len", 4096)
    engine = LLMEngine(model=args.model, **kwargs)
    app = create_app(engine, args.served_model_name,
                     request_log_dir=args.request_log_dir)
    logger.info("serving %s on %s:%d", args.model or "tiny-random",
                args.host, args.port)
    web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
