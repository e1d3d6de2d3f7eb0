"""MemoryOracle: the explicit scheduler <-> cache-manager budget protocol.

Re-expresses the reference's 22-method Protocol (engine/runtime_state.py:14-43)
at page granularity: the scheduler never touches pages directly; it asks the
oracle what admission costs, what a step costs, and what is free. Cache
managers implement it per method (different methods reserve differently).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from .sequence import Sequence


@runtime_checkable
class MemoryOracle(Protocol):
    # --- capacity ---------------------------------------------------------
    def num_free_pages(self) -> int:
        """Min over layers of free pages (the admission-limiting pool)."""
        ...

    def num_free_rows(self) -> int:
        ...

    # --- admission (prefill) ----------------------------------------------
    def admission_cost_pages(self, seq: Sequence) -> int:
        """Pages (per layer) that must be free to admit this sequence's
        prefill peak (method-dependent: dense = whole prompt; streamingllm =
        window + chunk; ...)."""
        ...

    def can_admit(self, seq: Sequence) -> bool:
        ...

    # --- per-step costs ----------------------------------------------------
    def prefill_step_cost_pages(self, seq: Sequence, chunk: int) -> int:
        """New pages needed to store `chunk` more prompt tokens."""
        ...

    def decode_step_cost_pages(self, seq: Sequence) -> int:
        """New pages needed to append one decode token (0 or 1)."""
        ...

    # --- resident state -----------------------------------------------------
    def seq_resident_pages(self, seq: Sequence) -> int:
        """Pages currently held by this sequence (max over layers)."""
        ...
