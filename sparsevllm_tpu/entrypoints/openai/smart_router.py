"""Prefix-aware multi-worker router.

Re-expresses reference entrypoints/openai/smart_router.py:85-827: a worker
registry polled via /worker/info + /worker/load; per-request prefix-cache
match probes (/worker/prefix-cache/match) to all healthy candidates; routing
picks the best prefix match unless that worker is overloaded relative to the
least-loaded one (load-delta threshold), else lowest load; unhealthy workers
are routed around until their next successful poll; requests and SSE streams
are proxied transparently. Scale-out in this architecture = N independent
single-host engines behind this router (reference SURVEY §2.5 — DP at the
serving layer).

Run:
    python -m sparsevllm_tpu.entrypoints.openai.smart_router \
        --workers http://h1:8000,http://h2:8000 --port 9000
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time
from dataclasses import dataclass, field

import aiohttp
from aiohttp import web

from ...utils.log import logger


@dataclass
class WorkerState:
    url: str
    healthy: bool = False
    info: dict = field(default_factory=dict)
    load: dict = field(default_factory=dict)
    last_poll: float = 0.0
    consecutive_failures: int = 0

    @property
    def load_score(self) -> float:
        """Queue pressure: running + waiting + queued."""
        ld = self.load
        return (
            ld.get("running", 0) + ld.get("waiting", 0) + ld.get("queued", 0)
        )


class SmartRouter:
    def __init__(
        self,
        worker_urls: list[str],
        poll_interval: float = 2.0,
        prefix_probe_timeout: float = 0.25,
        load_delta_threshold: float = 8.0,
        route_log_path: str | None = None,
    ):
        self.workers = [WorkerState(url=u.rstrip("/")) for u in worker_urls]
        self.poll_interval = poll_interval
        self.probe_timeout = prefix_probe_timeout
        self.load_delta_threshold = load_delta_threshold
        self.route_log_path = route_log_path
        self._session: aiohttp.ClientSession | None = None
        self._poll_task: asyncio.Task | None = None

    # ------------------------------------------------------------- lifecycle

    async def start(self) -> None:
        self._session = aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=None, connect=5)
        )
        self._poll_task = asyncio.create_task(self._poll_loop())

    async def stop(self) -> None:
        if self._poll_task:
            self._poll_task.cancel()
        if self._session:
            await self._session.close()

    async def _poll_loop(self) -> None:
        while True:
            await asyncio.gather(
                *[self._poll_one(w) for w in self.workers],
                return_exceptions=True,
            )
            await asyncio.sleep(self.poll_interval)

    async def _poll_one(self, w: WorkerState) -> None:
        try:
            async with self._session.get(
                f"{w.url}/worker/load",
                timeout=aiohttp.ClientTimeout(total=2),
            ) as resp:
                w.load = await resp.json()
            if not w.info:
                async with self._session.get(
                    f"{w.url}/worker/info",
                    timeout=aiohttp.ClientTimeout(total=2),
                ) as resp:
                    w.info = await resp.json()
            w.healthy = bool(w.load.get("healthy", True))
            w.consecutive_failures = 0
        except Exception:  # noqa: BLE001 — mark unhealthy, route around
            w.consecutive_failures += 1
            if w.consecutive_failures >= 2:
                w.healthy = False
        w.last_poll = time.monotonic()

    # --------------------------------------------------------------- routing

    async def _probe_prefix(self, w: WorkerState, token_ids: list[int]) -> int:
        try:
            async with self._session.post(
                f"{w.url}/worker/prefix-cache/match",
                json={"token_ids": token_ids},
                timeout=aiohttp.ClientTimeout(total=self.probe_timeout),
            ) as resp:
                return int((await resp.json()).get("matched_tokens", 0))
        except Exception:  # noqa: BLE001 — probe failure = no match
            return 0

    def _candidates(self, body: dict) -> list[WorkerState]:
        target = body.get("target_worker")
        cands = [w for w in self.workers if w.healthy]
        if target:
            picked = [w for w in cands if w.url == target.rstrip("/")]
            if picked:
                return picked
        model = body.get("model")
        if model and any(w.info.get("model") == model for w in cands):
            cands = [w for w in cands if w.info.get("model") == model]
        return cands

    async def choose_worker(
        self, body: dict, token_ids: list[int] | None
    ) -> WorkerState | None:
        """Best prefix match unless overloaded, else lowest load
        (reference choose_worker, smart_router.py:545-573)."""
        cands = self._candidates(body)
        if not cands:
            return None
        if len(cands) == 1:
            return cands[0]
        least = min(cands, key=lambda w: w.load_score)
        if token_ids:
            probing = [
                w for w in cands if w.info.get("prefix_cache", False)
            ] or cands
            matches = await asyncio.gather(
                *[self._probe_prefix(w, token_ids) for w in probing]
            )
            best_i = max(range(len(probing)), key=lambda i: matches[i])
            best = probing[best_i]
            if matches[best_i] > 0 and (
                best.load_score - least.load_score
                <= self.load_delta_threshold
            ):
                return best
        return least

    def _route_log(self, entry: dict) -> None:
        if not self.route_log_path:
            return
        with open(self.route_log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")

    # ----------------------------------------------------------------- proxy

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response(
                {"error": {"message": "invalid JSON"}}, status=400
            )
        token_ids = None
        prompt = body.get("prompt")
        if isinstance(prompt, list) and all(
            isinstance(t, int) for t in prompt
        ):
            token_ids = prompt
        worker = await self.choose_worker(body, token_ids)
        if worker is None:
            return web.json_response(
                {"error": {"message": "no healthy workers"}}, status=503
            )
        self._route_log({
            "ts": time.time(), "path": request.path, "worker": worker.url,
            "model": body.get("model"),
        })
        url = f"{worker.url}{request.path}"
        try:
            upstream = await self._session.post(url, json=body)
        except Exception as e:  # noqa: BLE001 — worker died mid-route
            worker.healthy = False
            return web.json_response(
                {"error": {"message": f"worker unreachable: {e}"}},
                status=502,
            )
        if upstream.headers.get("Content-Type", "").startswith(
            "text/event-stream"
        ):
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache",
            })
            await resp.prepare(request)
            async for chunk in upstream.content.iter_any():
                await resp.write(chunk)
            await resp.write_eof()
            upstream.release()
            return resp
        data = await upstream.read()
        return web.Response(
            body=data, status=upstream.status,
            content_type="application/json",
        )

    async def list_workers(self, request: web.Request) -> web.Response:
        return web.json_response({
            "workers": [{
                "url": w.url, "healthy": w.healthy,
                "load": w.load_score, "info": w.info,
            } for w in self.workers],
        })

    async def models(self, request: web.Request) -> web.Response:
        seen = {}
        for w in self.workers:
            if w.healthy and w.info.get("model"):
                seen[w.info["model"]] = True
        return web.json_response({
            "object": "list",
            "data": [
                {"id": m, "object": "model", "owned_by": "sparsevllm_tpu"}
                for m in seen
            ],
        })

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=256 * 2**20)
        app.router.add_post("/v1/completions", self.proxy)
        app.router.add_post("/v1/chat/completions", self.proxy)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/router/workers", self.list_workers)

        async def on_start(app):
            await self.start()

        async def on_stop(app):
            await self.stop()

        app.on_startup.append(on_start)
        app.on_cleanup.append(on_stop)
        return app


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", required=True,
                    help="comma-separated worker base URLs")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=9000)
    ap.add_argument("--route-log", default=None)
    args = ap.parse_args()
    router = SmartRouter(
        args.workers.split(","), route_log_path=args.route_log
    )
    app = router.build_app()
    logger.info("router on %s:%d -> %s", args.host, args.port, args.workers)
    web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
