"""2-process jax.distributed controller dryrun (SURVEY §7 stage 8).

Slow tier: spawns two OS processes that rendezvous through the
jax.distributed coordinator and run the SAME engine loop over a global
mesh(data=2, model=4) spanning both — the multi-host determinism contract
(identical schedules everywhere; in-program cross-host all-gather of step
outputs). See scripts/dryrun_multihost.py.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARSEVLLM_RUN_SLOW"),
    reason="slow tier (set SPARSEVLLM_RUN_SLOW=1)",
)


def test_two_process_mesh_token_identity():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(root, "scripts",
                                      "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=1100,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "dryrun_multihost OK" in res.stdout
