"""AsyncEngineDispatcher tier-1 suite (reference dispatcher.py:66-471
coverage class: admission, streaming, aborts, per-request failure
isolation, fatal-error propagation) against a fake engine — no model, no
jax, pure control-plane behavior."""

from __future__ import annotations

import asyncio
import threading
import time
from types import SimpleNamespace

import pytest

from sparsevllm_tpu.entrypoints.openai.dispatcher import (
    AsyncEngineDispatcher,
)
from sparsevllm_tpu.sampling_params import SamplingParams


class FakeSeq:
    _ids = iter(range(10_000))

    def __init__(self, sp, tokens_per_step, total):
        self.seq_id = next(self._ids)
        self.sampling_params = sp
        self.tokens_per_step = tokens_per_step
        self.total = total
        self.emitted = 0
        self.finish_reason = None
        self.completion_logprobs = []
        self.completion_top_logprobs = []

    @property
    def is_finished(self):
        return self.emitted >= self.total

    def step(self):
        n = min(self.tokens_per_step, self.total - self.emitted)
        self.emitted += n
        toks = list(range(self.emitted - n, self.emitted))
        if self.sampling_params.logprobs is not None:
            self.completion_logprobs.extend([-0.5] * n)
            self.completion_top_logprobs.extend([{t: -0.5} for t in toks])
        if self.is_finished:
            self.finish_reason = SimpleNamespace(value="length")
        return toks


class FakeEngine:
    """Steps every live seq by tokens_per_step until total tokens."""

    def __init__(self, tokens_per_step=2, total=6, fail_prompts=(),
                 explode_after=None):
        self.tokens_per_step = tokens_per_step
        self.total = total
        self.fail_prompts = set(map(tuple, fail_prompts))
        self.explode_after = explode_after
        self.steps = 0
        self.seqs: dict[int, FakeSeq] = {}
        self.aborted: list[int] = []
        self.scheduler = SimpleNamespace(
            running=[], waiting=[], num_preemptions=0
        )
        self.kv = SimpleNamespace(free_slot_stats=lambda: {"free": 1})

    def add_request(self, prompt_token_ids, sampling_params,
                    request_id=None):
        if tuple(prompt_token_ids) in self.fail_prompts:
            raise ValueError("prompt too long")
        s = FakeSeq(sampling_params, self.tokens_per_step, self.total)
        self.seqs[s.seq_id] = s
        self.scheduler.running.append(s)
        return s.seq_id

    def abort_request(self, seq_id):
        self.aborted.append(seq_id)
        s = self.seqs.pop(seq_id, None)
        if s in self.scheduler.running:
            self.scheduler.running.remove(s)

    @property
    def _has(self):
        return bool(self.seqs)

    def step(self):
        self.steps += 1
        if self.explode_after is not None \
                and self.steps > self.explode_after:
            raise RuntimeError("device on fire")
        out = []
        for s in list(self.seqs.values()):
            toks = s.step()
            out.append((s, toks))
            if s.is_finished:
                del self.seqs[s.seq_id]
                self.scheduler.running.remove(s)
        time.sleep(0.001)
        return out


@pytest.fixture()
def loop():
    lo = asyncio.new_event_loop()
    yield lo
    lo.close()


def make(engine):
    # has_work property must reflect live seqs
    engine.scheduler.has_work = False
    eng_scheduler = engine.scheduler

    class Sched:
        running = eng_scheduler.running
        waiting = eng_scheduler.waiting
        num_preemptions = 0

        @property
        def has_work(self):
            return bool(engine.seqs)

    engine.scheduler = Sched()
    return AsyncEngineDispatcher(engine)


def collect(loop, disp, prompt, sp=None, n=None):
    sp = sp or SamplingParams(temperature=0.0, max_tokens=64)

    async def go():
        got = []
        async for d in disp.submit(prompt, sp):
            got.append(d)
            if n is not None and sum(len(g.token_ids) for g in got) >= n:
                break
        return got

    return loop.run_until_complete(go())


def test_stream_to_finish(loop):
    eng = FakeEngine(tokens_per_step=2, total=6)
    disp = make(eng)
    try:
        deltas = collect(loop, disp, [1, 2, 3])
        toks = [t for d in deltas for t in d.token_ids]
        assert toks == list(range(6))
        assert deltas[-1].finished
        assert deltas[-1].finish_reason == "length"
    finally:
        disp.shutdown()


def test_consumer_disconnect_aborts(loop):
    """Closing the stream generator mid-flight (client disconnect) must
    abort the request in the engine (the submit() finally clause)."""
    eng = FakeEngine(tokens_per_step=1, total=1000)
    disp = make(eng)
    try:
        async def go():
            gen = disp.submit(
                [1], SamplingParams(temperature=0.0, max_tokens=2000))
            got = 0
            async for d in gen:
                got += len(d.token_ids)
                if got >= 3:
                    break
            await gen.aclose()  # what aiohttp does when the client drops

        loop.run_until_complete(go())
        deadline = time.time() + 5
        while not eng.aborted and time.time() < deadline:
            time.sleep(0.01)
        assert eng.aborted, "engine.abort_request never called"
    finally:
        disp.shutdown()


def test_per_request_failure_isolated(loop):
    """A request the engine rejects gets an error delta; other requests
    keep streaming (reference: per-request failure does not kill the
    loop)."""
    eng = FakeEngine(tokens_per_step=2, total=4, fail_prompts=[(9, 9)])
    disp = make(eng)
    try:
        async def go():
            ok_task = asyncio.ensure_future(
                _drain(disp, [1, 2]), loop=loop)
            with pytest.raises(RuntimeError, match="prompt too long"):
                await _drain(disp, [9, 9])
            return await ok_task

        async def _drain(d, p):
            got = []
            async for x in d.submit(
                p, SamplingParams(temperature=0.0, max_tokens=64)
            ):
                got.extend(x.token_ids)
            return got

        toks = loop.run_until_complete(go())
        assert toks == list(range(4))
    finally:
        disp.shutdown()


def test_fatal_error_propagates_and_marks_unhealthy(loop):
    eng = FakeEngine(tokens_per_step=1, total=1000, explode_after=2)
    disp = make(eng)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            collect(loop, disp, [1])
        deadline = time.time() + 5
        while disp.healthy and time.time() < deadline:
            time.sleep(0.01)
        assert not disp.healthy
        with pytest.raises(RuntimeError, match="engine is down"):
            loop.run_until_complete(_one(disp))
    finally:
        disp.shutdown()


async def _one(disp):
    async for _ in disp.submit(
        [1], SamplingParams(temperature=0.0, max_tokens=4)
    ):
        pass


def test_logprobs_ride_stream_deltas(loop):
    eng = FakeEngine(tokens_per_step=2, total=4)
    disp = make(eng)
    try:
        deltas = collect(
            loop, disp, [1],
            sp=SamplingParams(temperature=0.0, max_tokens=64, logprobs=1),
        )
        lps = [lp for d in deltas if d.logprobs for lp in d.logprobs]
        assert lps == [-0.5] * 4
        tops = [t for d in deltas if d.top_logprobs
                for t in d.top_logprobs]
        assert len(tops) == 4 and all(isinstance(t, dict) for t in tops)
    finally:
        disp.shutdown()


def test_stats_shape(loop):
    eng = FakeEngine()
    disp = make(eng)
    try:
        st = disp.stats()
        assert set(st) >= {"running", "waiting", "queued",
                           "num_preemptions", "kv", "healthy"}
        assert st["healthy"] is True
    finally:
        disp.shutdown()


def test_shutdown_joins_thread():
    eng = FakeEngine()
    disp = make(eng)
    disp.shutdown()
    assert not disp._thread.is_alive()
