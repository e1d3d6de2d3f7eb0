"""Test configuration: CPU backend with a virtual 8-device mesh.

Mirrors the reference test strategy (SURVEY.md §4): correctness tests run on
CPU; multi-chip sharding is validated on a virtual device mesh
(xla_force_host_platform_device_count) without TPU hardware.
"""

import os

# The deployment environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must
# run on CPU, so force it before jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

import jax  # noqa: E402

# The axon TPU plugin registers itself from sitecustomize regardless of
# JAX_PLATFORMS; pin the platform via config too so tests really run on CPU.
jax.config.update("jax_platforms", "cpu")
# fp32 matmuls default to fast (bf16-pass) precision even on CPU; parity
# tests against HF need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Engine lifecycle hygiene (VERDICT r2 weak#5): every engine a test builds
# must exit — a leaked engine is a daemon thread plus a full set of device
# pools held until the pytest process dies; round 2's suite accumulated 62
# threads and segfaulted the XLA CPU compiler ~50 min in.
# ---------------------------------------------------------------------------


@pytest.fixture(autouse=True, scope="module")
def _exit_live_engines():
    """Module-scoped: several suites share one module-scoped engine across
    tests (per-test exit would kill it mid-module); exiting at module end
    still bounds the leak to one module's engines."""
    yield
    from sparsevllm_tpu.engine import llm_engine as _le

    for eng in list(_le._LIVE_ENGINES):
        eng.exit()


def pytest_sessionfinish(session, exitstatus):
    import threading

    leaked = [
        t.name for t in threading.enumerate()
        if t.name == "throughput-log" and t.is_alive()
    ]
    if leaked:
        raise RuntimeError(
            f"leaked throughput-log threads at session end: {leaked} "
            f"(an engine was built outside the autouse exit fixture)"
        )


# ---------------------------------------------------------------------------
# Tiers: heavy E2E tests are marked `slow` and skipped by default so the
# stock CPU suite stays under ~10 minutes. Run them with
# SPARSEVLLM_RUN_SLOW=1 (or -m slow).
# ---------------------------------------------------------------------------


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy E2E test; skipped unless SPARSEVLLM_RUN_SLOW=1 "
        "or selected via -m slow",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARSEVLLM_RUN_SLOW"):
        return
    if "slow" in (config.option.markexpr or ""):
        return
    skip = pytest.mark.skip(
        reason="slow tier (set SPARSEVLLM_RUN_SLOW=1 or -m slow)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
