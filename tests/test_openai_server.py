"""OpenAI API server tests against the tiny-random engine.

Mirrors the reference's FastAPI TestClient suite
(tests/test_openai_api_server.py) using aiohttp's test utilities: real
engine (tiny-random), real dispatcher thread, real SSE streams.
"""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from sparsevllm_tpu.engine.llm_engine import LLMEngine
from sparsevllm_tpu.entrypoints.openai.api_server import OpenAIServer
from sparsevllm_tpu.entrypoints.openai.detokenizer import (
    IncrementalDetokenizer,
)


@pytest.fixture(scope="module")
def engine():
    eng = LLMEngine(
        tiny_random=True,
        dtype="float32",
        page_size=8,
        num_kv_pages=256,
        max_model_len=512,
        chunk_prefill_size=64,
        max_num_batched_tokens=512,
        max_decoding_seqs=8,
        max_num_seqs_in_batch=8,
        decode_context_bucket_base=64,
        decode_steps_per_dispatch=4,
    )
    yield eng


@pytest.fixture()
def client(engine, event_loop=None):
    server = OpenAIServer(engine, served_model="tiny")
    app = server.build_app()

    async def make():
        c = TestClient(TestServer(app))
        await c.start_server()
        return c, server

    loop = asyncio.new_event_loop()
    c, srv = loop.run_until_complete(make())
    yield c, loop
    loop.run_until_complete(c.close())
    srv.dispatcher.shutdown()
    loop.close()


def _post_json(client, loop, path, body):
    async def go():
        resp = await client.post(path, json=body)
        return resp.status, await resp.json()
    return loop.run_until_complete(go())


def test_models_and_health(client):
    c, loop = client

    async def go():
        r1 = await c.get("/v1/models")
        r2 = await c.get("/health")
        r3 = await c.get("/worker/info")
        r4 = await c.get("/worker/load")
        return (await r1.json(), r2.status, await r3.json(),
                await r4.json())

    models, health, info, load = loop.run_until_complete(go())
    assert models["data"][0]["id"] == "tiny"
    assert health == 200
    assert info["method"] == "vanilla"
    assert "running" in load and "kv" in load


def test_completion_token_ids(client):
    c, loop = client
    status, out = _post_json(c, loop, "/v1/completions", {
        "model": "tiny",
        "prompt": [1, 5, 9, 12],
        "max_tokens": 8,
        "temperature": 0.0,
    })
    assert status == 200, out
    assert out["object"] == "text_completion"
    assert out["usage"]["prompt_tokens"] == 4
    assert 1 <= out["usage"]["completion_tokens"] <= 8
    assert out["choices"][0]["finish_reason"] in ("stop", "length")


def test_completion_stream(client):
    c, loop = client

    async def go():
        resp = await c.post("/v1/completions", json={
            "model": "tiny",
            "prompt": [2, 4, 6],
            "max_tokens": 6,
            "temperature": 0.0,
            "stream": True,
        })
        assert resp.status == 200
        chunks = []
        async for raw in resp.content:
            line = raw.decode().strip()
            if line.startswith("data: "):
                payload = line[6:]
                if payload == "[DONE]":
                    break
                chunks.append(json.loads(payload))
        return chunks

    chunks = loop.run_until_complete(go())
    assert chunks, "no SSE chunks"
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_bad_request_400(client):
    c, loop = client
    status, out = _post_json(c, loop, "/v1/completions", {
        "model": "tiny", "prompt": 42,
    })
    assert status == 400
    assert "error" in out
    status, out = _post_json(c, loop, "/v1/completions", {
        "model": "tiny", "prompt": [1, 2], "max_tokens": -1,
    })
    assert status == 400


def test_concurrent_requests(client):
    c, loop = client

    async def one(i):
        resp = await c.post("/v1/completions", json={
            "model": "tiny", "prompt": [i + 1, i + 2, i + 3],
            "max_tokens": 5, "temperature": 0.0,
        })
        return await resp.json()

    async def go():
        return await asyncio.gather(*[one(i) for i in range(6)])

    outs = loop.run_until_complete(go())
    assert len(outs) == 6
    for out in outs:
        assert out["usage"]["completion_tokens"] >= 1


class _FakeTok:
    """Byte-level fake tokenizer: token id = byte value."""

    def decode(self, ids, skip_special_tokens=True):
        return bytes(ids).decode("utf-8", errors="replace")


def test_incremental_detokenizer_utf8_boundary():
    d = IncrementalDetokenizer(_FakeTok())
    # '€' = 0xE2 0x82 0xAC split across pushes
    assert d.push([104, 105]) == "hi"
    assert d.push([0xE2]) == ""  # incomplete — held back
    assert d.push([0x82]) == ""
    assert d.push([0xAC]) == "€"
    assert d.finish() == ""


def test_responses_protocol_parsing():
    from sparsevllm_tpu.entrypoints.openai import protocol as proto

    r = proto.ResponsesRequest.from_body(
        {"input": "hello", "max_output_tokens": 7}, 99)
    assert r.input_items == [{"role": "user", "content": "hello"}]
    assert r.sampling.max_tokens == 7
    r = proto.ResponsesRequest.from_body({
        "input": [
            {"role": "user",
             "content": [{"type": "input_text", "text": "hi "},
                         {"type": "input_text", "text": "there"}]},
        ],
        "instructions": "be brief",
    }, 99)
    assert r.input_items[0] == {"role": "system", "content": "be brief"}
    assert r.input_items[1] == {"role": "user", "content": "hi there"}
    assert r.sampling.max_tokens == 99
    with pytest.raises(proto.ProtocolError):
        proto.ResponsesRequest.from_body({}, 9)
    with pytest.raises(proto.ProtocolError):
        proto.ResponsesRequest.from_body({"input": [{"content": "x"}]}, 9)


def test_responses_route_registered_and_tokenizer_gated(client):
    c, loop = client
    status, body = _post_json(c, loop, "/v1/responses", {"input": "hi"})
    # tiny-random engine has no tokenizer: loud 400, not 404
    assert status == 400
    assert "tokenizer" in body["error"]["message"]


def test_response_object_shape():
    from sparsevllm_tpu.entrypoints.openai import protocol as proto

    obj = proto.response_object("resp_1", "m", "hello", "completed", 123,
                                {"input_tokens": 2})
    assert obj["object"] == "response"
    assert obj["output_text"] == "hello"
    assert obj["output"][0]["content"][0]["type"] == "output_text"
    assert obj["status"] == "completed"


def test_stream_stop_holdback():
    """Streamed deltas never contain text at or past a stop string, even
    when the stop spans chunk boundaries (vLLM-style holdback)."""
    from sparsevllm_tpu.entrypoints.openai.api_server import OpenAIServer
    from sparsevllm_tpu.entrypoints.openai.dispatcher import StreamDelta
    from sparsevllm_tpu.sampling_params import SamplingParams

    class _CharTok:
        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(i) for i in ids)

    class _FakeDispatcher:
        def __init__(self, token_batches):
            self.batches = token_batches
            self.aborted = False

        async def submit(self, prompt_ids, sp, request_id):
            for i, b in enumerate(self.batches):
                yield StreamDelta(b, i == len(self.batches) - 1, "length")

        def abort(self, request_id):
            self.aborted = True

    srv = OpenAIServer.__new__(OpenAIServer)
    srv.tokenizer = _CharTok()
    # stream "hello STOP world" with the stop split across deltas
    text = "hello STOP world"
    ids = [ord(c) for c in text]
    batches = [ids[:7], ids[7:9], ids[9:12], ids[12:]]  # "...ST","OP","..."
    srv.dispatcher = _FakeDispatcher(batches)
    sp = SamplingParams(max_tokens=64, stop=("STOP",))

    async def run():
        parts = []
        async for t, d in srv._generate([1], sp, "rid"):
            parts.append((t, d.finished, d.finish_reason))
        return parts

    loop = asyncio.new_event_loop()
    parts = loop.run_until_complete(run())
    loop.close()
    streamed = "".join(t for t, _, _ in parts)
    assert streamed == "hello "
    assert parts[-1][1] is True and parts[-1][2] == "stop"
    assert srv.dispatcher.aborted
    # no intermediate delta ever contained any char of "STOP" or beyond
    for t, _, _ in parts[:-1]:
        assert "S" not in t or t.endswith("hello ")


def test_parse_reasoning():
    from sparsevllm_tpu.entrypoints.openai import protocol as proto

    r, c = proto.parse_reasoning("<think>step 1\nstep 2</think>\nanswer")
    assert r == "step 1\nstep 2" and c == "answer"
    r, c = proto.parse_reasoning("plain answer")
    assert r is None and c == "plain answer"
    r, c = proto.parse_reasoning("<think>never closed")
    assert r == "never closed" and c == ""
    # responses object splits reasoning into its own output item
    obj = proto.response_object("r1", "m", "<think>why</think>ok",
                                "completed", 0)
    assert obj["output"][0]["type"] == "reasoning"
    assert obj["output"][0]["content"][0]["text"] == "why"
    assert obj["output_text"] == "ok"


def test_request_log_written(tmp_path, engine):
    from sparsevllm_tpu.entrypoints.openai.api_server import OpenAIServer

    server = OpenAIServer(engine, served_model="tiny",
                          request_log_dir=str(tmp_path))
    app = server.build_app()

    async def go():
        c = TestClient(TestServer(app))
        await c.start_server()
        resp = await c.post("/v1/completions", json={
            "model": "tiny", "prompt": [1, 2, 3], "max_tokens": 4,
        })
        body = await resp.json()
        await c.close()
        return body

    loop = asyncio.new_event_loop()
    body = loop.run_until_complete(go())
    server.dispatcher.shutdown()
    loop.close()
    logs = list(tmp_path.glob("requests-*.jsonl"))
    assert len(logs) == 1
    rec = json.loads(logs[0].read_text().splitlines()[0])
    assert rec["kind"] == "completion"
    assert rec["prompt_tokens"] == 3
    assert rec["output_tokens"] >= 1


def test_concurrent_stress_64(client):
    """64 concurrent requests through the dispatcher (reference stress
    block: 80 concurrent; scaled to the tiny engine)."""
    c, loop = client

    async def one(i):
        resp = await c.post("/v1/completions", json={
            "model": "tiny", "prompt": [1 + i % 7, 2, 3 + i % 5],
            "max_tokens": 3,
        })
        assert resp.status == 200
        out = await resp.json()
        return out["usage"]["completion_tokens"]

    async def go():
        return await asyncio.gather(*[one(i) for i in range(64)])

    results = loop.run_until_complete(go())
    assert len(results) == 64
    assert all(r >= 1 for r in results)


def test_responses_sse_stream_event_ladder(engine):
    """Streamed /v1/responses must emit the full event ladder with
    monotonically increasing sequence numbers (reference
    entrypoints/openai/serving/responses.py streamed events)."""
    from sparsevllm_tpu.entrypoints.openai.api_server import OpenAIServer

    class _CharTok:
        def encode(self, text):
            return [ord(c) % 200 + 5 for c in text]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(int(i) % 90 + 33) for i in ids)

        def apply_chat_template(self, messages, tokenize=True,
                                add_generation_prompt=True):
            return self.encode(" ".join(m["content"] for m in messages))

    server = OpenAIServer(engine, served_model="tiny")
    server.tokenizer = _CharTok()
    app = server.build_app()

    async def go():
        c = TestClient(TestServer(app))
        await c.start_server()
        resp = await c.post("/v1/responses", json={
            "input": "hello", "stream": True, "max_output_tokens": 6,
        })
        assert resp.status == 200
        raw = await resp.content.read()
        await c.close()
        return raw.decode()

    loop = asyncio.new_event_loop()
    raw = loop.run_until_complete(go())
    server.dispatcher.shutdown()
    loop.close()

    events = []
    for line in raw.splitlines():
        if line.startswith("data: ") and line != "data: [DONE]":
            events.append(json.loads(line[len("data: "):]))
    kinds = [e["type"] for e in events]
    assert kinds[:4] == [
        "response.created", "response.in_progress",
        "response.output_item.added", "response.content_part.added",
    ]
    assert "response.output_text.delta" in kinds
    assert kinds[-4:] == [
        "response.output_text.done", "response.content_part.done",
        "response.output_item.done", "response.completed",
    ]
    seqs = [e["sequence_number"] for e in events]
    assert seqs == list(range(len(events)))
    # deltas concatenate to the final text
    deltas = "".join(e["delta"] for e in events
                     if e["type"] == "response.output_text.delta")
    done = [e for e in events if e["type"] == "response.output_text.done"]
    assert done[0]["text"] == deltas
    final = [e for e in events if e["type"] == "response.completed"]
    assert final[0]["response"]["status"] == "completed"
    assert final[0]["response"]["output_text"] == deltas
