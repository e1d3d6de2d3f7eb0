"""Two-process jax.distributed dryrun: the multi-host controller design.

SURVEY §7 stage 8 / VERDICT r3 missing #6: the reference scales out with
independent single-host engines behind a router; the TPU-native design
instead runs ONE SPMD program across hosts (multi-controller jax over
DCN). This script PROVES the controller/broadcast contract on CPU:

  * two OS processes each own 4 virtual CPU devices and rendezvous via
    ``jax.distributed.initialize`` (the DCN coordinator);
  * both run the SAME engine loop over a GLOBAL mesh(data=2, model=4)
    that spans the processes — host step plans are built identically on
    every host (deterministic scheduler, no cross-host RPC; the SHM-RPC
    role of reference model_runner.py:321-461 is "same program
    everywhere");
  * step outputs (sampled tokens) are re-replicated in-program
    (executor._fetch: a jitted identity with replicated out_shardings
    inserts the cross-host all-gather) so each host's scheduler observes
    the full batch and stays in lockstep;
  * both processes must produce IDENTICAL tokens, which must also match
    a single-process mesh run of the same config.

Usage:  python scripts/dryrun_multihost.py            # launcher
        python scripts/dryrun_multihost.py <pid>      # worker (internal)
"""

from __future__ import annotations

import os
import subprocess
import sys

COORD = "localhost:12391"
NPROC = 2
DEV_PER_PROC = 4
RESULT_DIR = "/tmp/sparsevllm_multihost"


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(COORD, NPROC, pid)
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * DEV_PER_PROC

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np

    from sparsevllm_tpu.engine.llm_engine import LLMEngine
    from sparsevllm_tpu.sampling_params import SamplingParams

    eng = LLMEngine(
        tiny_random=True, dtype="float32",
        tensor_parallel_size=4, data_parallel_size=2,
        page_size=8, num_kv_pages=128, max_model_len=256,
        chunk_prefill_size=32, max_num_batched_tokens=256,
        max_decoding_seqs=4, max_num_seqs_in_batch=4,
        decode_context_bucket_base=64, decode_steps_per_dispatch=2,
    )
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, 500, n).tolist() for n in (40, 70, 55, 62)]
    outs = eng.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True),
    )
    tokens = [o.output_token_ids for o in outs]
    os.makedirs(RESULT_DIR, exist_ok=True)
    with open(f"{RESULT_DIR}/p{pid}.txt", "w") as f:
        f.write(repr(tokens))
    print(f"[p{pid}] tokens={tokens}", flush=True)
    eng.exit()
    jax.distributed.shutdown()


def single_reference() -> list:
    """Same config on ONE process (8 local devices) for cross-checking."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    code = (
        "import sys, os, numpy as np;"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r});"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from sparsevllm_tpu.engine.llm_engine import LLMEngine;"
        "from sparsevllm_tpu.sampling_params import SamplingParams;"
        "eng = LLMEngine(tiny_random=True, dtype='float32',"
        "  tensor_parallel_size=4, data_parallel_size=2, page_size=8,"
        "  num_kv_pages=128, max_model_len=256, chunk_prefill_size=32,"
        "  max_num_batched_tokens=256, max_decoding_seqs=4,"
        "  max_num_seqs_in_batch=4, decode_context_bucket_base=64,"
        "  decode_steps_per_dispatch=2);"
        "rng = np.random.default_rng(7);"
        "prompts = [rng.integers(3, 500, n).tolist() for n in (40, 70, 55, 62)];"
        "outs = eng.generate(prompt_token_ids=prompts,"
        "  sampling_params=SamplingParams(temperature=0.0, max_tokens=4,"
        "  ignore_eos=True));"
        "print('REF', repr([o.output_token_ids for o in outs]))"
    )
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900)
    for line in res.stdout.splitlines():
        if line.startswith("REF "):
            return eval(line[4:])  # noqa: S307 - own output
    raise RuntimeError(f"single-process reference failed:\n{res.stderr[-2000:]}")


def main() -> None:
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    import shutil

    shutil.rmtree(RESULT_DIR, ignore_errors=True)
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__), str(i)])
        for i in range(NPROC)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker rcs={rcs}")
    results = []
    for i in range(NPROC):
        with open(f"{RESULT_DIR}/p{i}.txt") as f:
            results.append(eval(f.read()))  # noqa: S307 - own output
    if results[0] != results[1]:
        raise SystemExit(f"processes diverged: {results}")
    ref = single_reference()
    if results[0] != ref:
        raise SystemExit(
            f"multi-host tokens != single-process mesh: {results[0]} vs {ref}"
        )
    print(f"dryrun_multihost OK: {NPROC} processes x {DEV_PER_PROC} devices, "
          f"mesh(data=2, model=4) spans hosts; tokens identical across "
          f"processes AND vs single-process: {ref}")


if __name__ == "__main__":
    main()
