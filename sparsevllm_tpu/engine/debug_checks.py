"""Env-gated runtime invariant checkers (debug tier).

Reference counterparts: the decode/prefill bounds checkers behind
``SVLLM_DEBUG_{PREFILL,DECODE}_BOUNDS`` (layers/attention_backend.py:115-173,
334-374) and the slot-leak tracer behind ``SPARSEVLLM_DEBUG_SLOTS``
(scheduler.py:440-473).

TPU re-design: device-side asserts are impossible under jit, so the checks
run HOST-side over the step plans and the manager's page bookkeeping —
which is where TPU corruption bugs actually originate (a bad dest slot or a
leaked page produces silent wrong attention, not a fault). Two gates:

  * ``SPARSEVLLM_DEBUG_BOUNDS=1`` — validate every prefill/decode plan
    before dispatch: dest slots in range and unique, store pages owned by
    the sequence's table row, context lengths within the bucket.
  * ``SPARSEVLLM_DEBUG_SLOTS=1``  — page-accounting audit after every
    engine step: free + held + trash == total per layer, refcount/zombie
    consistency; raises with the owning seq ids on a leak.

Both default off (hot-path cost is O(step plan) numpy, but why pay it);
the debug ladder (tests/test_debug_ladder.py) runs with them on.
"""

from __future__ import annotations

import os

import numpy as np

BOUNDS = bool(int(os.environ.get("SPARSEVLLM_DEBUG_BOUNDS", "0") or 0))
SLOTS = bool(int(os.environ.get("SPARSEVLLM_DEBUG_SLOTS", "0") or 0))


class BoundsError(AssertionError):
    pass


class SlotLeakError(AssertionError):
    pass


def check_prefill_plan(kv, seqs, dests, rows) -> None:
    """Validate a prefill step plan against the manager's tables."""
    p = kv.P
    staged = [getattr(s, "staged_prefill", False) for s in seqs]
    for j, (seq, dest) in enumerate(zip(seqs, dests)):
        dest = np.asarray(dest)
        if dest.size == 0:
            continue
        limit = (
            kv.num_stage_pages if staged[j] and hasattr(kv, "num_stage_pages")
            else kv.num_pages
        ) * p
        if dest.min() < 0 or dest.max() >= limit:
            raise BoundsError(
                f"prefill dest slot out of range for seq {seq.seq_id}: "
                f"[{dest.min()}, {dest.max()}] vs pool {limit} slots"
            )
        if np.unique(dest).size != dest.size:
            raise BoundsError(
                f"duplicate prefill dest slots for seq {seq.seq_id}"
            )
        # store pages must be mapped into the row's table (layer 0 is
        # representative: layers are lockstep during prefill)
        row = rows[j]
        pages = np.unique(dest // p)
        table = kv.page_tables[0, row]
        if not np.isin(pages, table).all():
            missing = pages[~np.isin(pages, table)]
            raise BoundsError(
                f"prefill stores into pages not mapped to seq "
                f"{seq.seq_id}'s row {row}: {missing.tolist()}"
            )


def check_decode_plan(kv, seqs, dest_slots, ctx_start) -> None:
    """Validate a decode megastep plan (dest [L, B, k], ctx_start [L, B])."""
    p = kv.P
    limit = kv.num_pages * p
    d = np.asarray(dest_slots)
    if d.min() < 0 or d.max() >= limit:
        raise BoundsError(
            f"decode dest slot out of range: [{d.min()}, {d.max()}] vs "
            f"pool {limit} slots"
        )
    # per (layer, lane): k destinations must be distinct (the megastep
    # writes k tokens) and pages owned by the row
    l_num, b, k = d.shape
    rows = kv.rows_of(seqs)
    # EVERY table entry of a decoding row must be a valid main-pool page:
    # the decode kernel streams pages up to the context BUCKET, so even
    # entries past the row's logical length get DMA'd — a stale id beyond
    # the pool is an out-of-bounds HBM read that crashes the chip
    # (observed with staging-pool ids after staged compaction).
    tb = kv.page_tables[:, rows]
    if tb.min() < 0 or tb.max() >= kv.num_pages:
        raise BoundsError(
            f"table rows contain out-of-pool page ids: "
            f"[{tb.min()}, {tb.max()}] vs {kv.num_pages} pages"
        )
    for j, seq in enumerate(seqs):
        for l in range(l_num):
            lane = d[l, j]
            if np.unique(lane).size != lane.size:
                raise BoundsError(
                    f"decode dest slots repeat within megastep for seq "
                    f"{seq.seq_id} layer {l}"
                )
            pages = np.unique(lane // p)
            table = kv.page_tables[l, rows[j]]
            if not np.isin(pages, table).all():
                raise BoundsError(
                    f"decode stores into unowned pages for seq "
                    f"{seq.seq_id} layer {l}"
                )
        exp = kv.row_lens[:, rows[j]] - k  # alloc_decode already advanced
        if not np.array_equal(np.asarray(ctx_start)[:, j], exp):
            raise BoundsError(
                f"decode ctx_start disagrees with row_lens for seq "
                f"{seq.seq_id}: plan {np.asarray(ctx_start)[:, j]} vs "
                f"manager {exp}"
            )


def check_page_accounting(kv, live_seq_ids) -> None:
    """Audit the manager's page pools: no leaks, no zombie rows.

    Per layer: free-stack pages + pages referenced by live rows + pages
    held only by the prefix cache + trash page 0 must cover the pool with
    consistent refcounts."""
    live = set(live_seq_ids)
    zombie = [sid for sid in kv.seq_rows if sid not in live]
    if zombie:
        raise SlotLeakError(
            f"zombie rows: seqs {zombie} hold KV rows but are not in the "
            f"scheduler's live set (reference scheduler.py:440-473 "
            f"diagnostics)"
        )
    staged_sids = set(getattr(kv, "_stage_held", {}) or {})
    gp = bool(getattr(kv, "GP", False))
    # global pool: ONE stack/refcount plane covers all layers — audit the
    # union of every layer's held pages against stack 0
    for l in ([None] if gp else range(kv.L)):
        free = set(
            int(x) for x in kv._free[0 if gp else l,
                                     : int(kv._free_top[0 if gp else l])]
        )
        layers = range(kv.L) if gp else [l]
        held: set[int] = set()
        for sid, row in kv.seq_rows.items():
            if sid in staged_sids:
                continue  # row holds STAGING page ids (separate audit)
            for ll in layers:
                n = int(-(-kv.row_lens[ll, row] // kv.P))
                held.update(int(x) for x in kv.page_tables[ll, row, :n])
        cached: set[int] = set()
        if kv.prefix_index is not None:
            for node in kv.prefix_index._nodes.values():
                for ll in layers:
                    cached.add(int(node.pages[ll]))
        overlap = free & (held | cached)
        if overlap:
            raise SlotLeakError(
                f"layer {l}: pages both free and referenced: "
                f"{sorted(overlap)[:8]}"
            )
        accounted = free | held | cached | {0}
        missing = set(range(kv.num_pages)) - accounted
        # staged rows park their pages in the staging pool; the MAIN pool
        # must still fully account
        if missing:
            raise SlotLeakError(
                f"layer {l}: {len(missing)} pages leaked (neither free nor "
                f"referenced): {sorted(missing)[:8]}"
            )


def audit_staging(kv) -> None:
    """Staging-pool audit (kv_staging_dtype managers only)."""
    if not getattr(kv, "staging", False):
        return
    free = set(kv._stage_free)
    held: set[int] = set()
    for pages_list in kv._stage_held.values():
        for pages in pages_list:
            held.update(int(x) for x in pages)
    if free & held:
        raise SlotLeakError(
            f"staging pages both free and held: {sorted(free & held)[:8]}"
        )
    missing = set(range(1, kv.num_stage_pages)) - free - held
    if missing:
        raise SlotLeakError(
            f"staging pages leaked: {sorted(missing)[:8]}"
        )
