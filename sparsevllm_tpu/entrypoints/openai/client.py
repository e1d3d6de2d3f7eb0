"""SSE smoke client (reference entrypoints/openai/client.py:1-96).

    python -m sparsevllm_tpu.entrypoints.openai.client \
        --url http://localhost:8000 --prompt "hello" [--stream]
"""

from __future__ import annotations

import argparse
import asyncio
import json

import aiohttp


async def run(url: str, prompt: str, stream: bool, max_tokens: int) -> None:
    body = {
        "model": "default",
        "prompt": prompt,
        "max_tokens": max_tokens,
        "temperature": 0.0,
        "stream": stream,
    }
    async with aiohttp.ClientSession() as s:
        async with s.post(f"{url}/v1/completions", json=body) as resp:
            if not stream:
                print(json.dumps(await resp.json(), indent=2))
                return
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                chunk = json.loads(payload)
                if "error" in chunk:
                    print("\nERROR:", chunk["error"])
                    break
                print(chunk["choices"][0]["text"], end="", flush=True)
            print()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8000")
    ap.add_argument("--prompt", default="Hello, world")
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--stream", action="store_true")
    args = ap.parse_args()
    asyncio.run(run(args.url, args.prompt, args.stream, args.max_tokens))


if __name__ == "__main__":
    main()
