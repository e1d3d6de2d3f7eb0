"""AsyncEngineDispatcher: bridges asyncio handlers to the engine thread.

Re-expresses reference entrypoints/openai/dispatcher.py:66-471: a dedicated
thread owns the engine and runs the step loop; requests are admitted from a
thread-safe queue up to capacity; per-step token deltas stream back through
per-request asyncio queues; cancellation aborts in-engine; a fatal engine
error terminates all pending requests and flips the server unhealthy.
"""

from __future__ import annotations

import asyncio
import itertools
import queue
import threading
import time
from dataclasses import dataclass, field

from ...sampling_params import SamplingParams
from ...utils.log import logger

_req_counter = itertools.count()


@dataclass
class _Request:
    request_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    out_queue: asyncio.Queue = field(repr=False, default=None)
    loop: asyncio.AbstractEventLoop = field(repr=False, default=None)
    seq_id: int | None = None
    aborted: bool = False


@dataclass
class StreamDelta:
    token_ids: list[int]
    finished: bool
    finish_reason: str | None = None
    error: str | None = None
    # aligned with token_ids when the request asked for logprobs, else None
    logprobs: list[float] | None = None
    top_logprobs: list[dict[int, float]] | None = None


class AsyncEngineDispatcher:
    """One engine, one step-loop thread, many asyncio consumers."""

    def __init__(self, engine, max_queued: int = 1024):
        self.engine = engine
        self._submit_q: queue.Queue[_Request] = queue.Queue(max_queued)
        self._by_seq: dict[int, _Request] = {}
        self._abort_q: queue.Queue[str] = queue.Queue()
        self._by_rid: dict[str, _Request] = {}
        self.fatal_error: BaseException | None = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="engine-loop", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------ async API

    async def submit(
        self,
        prompt_token_ids: list[int],
        sampling_params: SamplingParams,
        request_id: str | None = None,
    ):
        """Submit a request; async-iterates StreamDelta."""
        if self.fatal_error is not None:
            raise RuntimeError(f"engine is down: {self.fatal_error!r}")
        rid = request_id or f"req-{next(_req_counter)}"
        req = _Request(
            request_id=rid,
            prompt_token_ids=prompt_token_ids,
            sampling_params=sampling_params,
            out_queue=asyncio.Queue(),
            loop=asyncio.get_running_loop(),
        )
        self._by_rid[rid] = req
        self._submit_q.put(req)
        done = False
        try:
            while True:
                delta: StreamDelta = await req.out_queue.get()
                if delta.error is not None:
                    raise RuntimeError(delta.error)
                yield delta
                if delta.finished:
                    done = True
                    return
        finally:
            if not done and not req.aborted:
                # consumer went away mid-stream (client disconnect)
                self.abort(rid)
            self._by_rid.pop(rid, None)

    def abort(self, request_id: str) -> None:
        # resolve rid -> request HERE: submit()'s finally aborts and then
        # pops _by_rid, so a rid-keyed lookup on the engine thread could
        # miss and silently leak the running request (client-disconnect
        # abort race; caught by test_dispatcher.py)
        req = self._by_rid.get(request_id)
        self._abort_q.put(req if req is not None else request_id)

    @property
    def healthy(self) -> bool:
        return self.fatal_error is None and self._thread.is_alive()

    def stats(self) -> dict:
        e = self.engine
        return {
            "running": len(e.scheduler.running),
            "waiting": len(e.scheduler.waiting),
            "queued": self._submit_q.qsize(),
            "num_preemptions": e.scheduler.num_preemptions,
            "kv": e.kv.free_slot_stats(),
            "healthy": self.healthy,
        }

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=10)

    # ---------------------------------------------------------- engine loop

    def _admit_pending(self) -> None:
        while True:
            try:
                req = self._submit_q.get_nowait()
            except queue.Empty:
                return
            if req.aborted:
                continue
            try:
                seq_id = self.engine.add_request(
                    prompt_token_ids=req.prompt_token_ids,
                    sampling_params=req.sampling_params,
                    request_id=req.request_id,
                )
            except Exception as e:  # noqa: BLE001 — per-request failure
                self._push(req, StreamDelta([], True, error=str(e)))
                continue
            req.seq_id = seq_id
            self._by_seq[seq_id] = req

    def _apply_aborts(self) -> None:
        while True:
            try:
                item = self._abort_q.get_nowait()
            except queue.Empty:
                return
            req = (item if isinstance(item, _Request)
                   else self._by_rid.get(item))
            if req is None or req.aborted:
                continue
            req.aborted = True
            if req.seq_id is not None:
                self.engine.abort_request(req.seq_id)
                self._by_seq.pop(req.seq_id, None)

    def _push(self, req: _Request, delta: StreamDelta) -> None:
        if req.loop is not None and not req.loop.is_closed():
            req.loop.call_soon_threadsafe(req.out_queue.put_nowait, delta)

    def _run(self) -> None:
        try:
            while not self._stop.is_set():
                self._apply_aborts()
                self._admit_pending()
                if not self.engine.scheduler.has_work:
                    time.sleep(0.002)
                    continue
                results = self.engine.step()
                for seq, new_tokens in results:
                    req = self._by_seq.get(seq.seq_id)
                    if req is None:
                        continue
                    fin = seq.is_finished
                    if new_tokens or fin:
                        lp = tlp = None
                        if (seq.sampling_params.logprobs is not None
                                and new_tokens):
                            lp = seq.completion_logprobs[-len(new_tokens):]
                            tlp = seq.completion_top_logprobs[
                                -len(new_tokens):]
                        self._push(
                            req,
                            StreamDelta(
                                new_tokens, fin,
                                seq.finish_reason.value
                                if seq.finish_reason else None,
                                logprobs=lp, top_logprobs=tlp,
                            ),
                        )
                    if fin:
                        self._by_seq.pop(seq.seq_id, None)
        except BaseException as e:  # noqa: BLE001 — fatal engine failure
            logger.exception("fatal engine error: %r", e)
            self.fatal_error = e
            for req in list(self._by_seq.values()):
                self._push(req, StreamDelta([], True, error=str(e)))
            self._by_seq.clear()
