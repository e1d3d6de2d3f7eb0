"""Block-level radix prefix cache.

Re-expresses reference engine/prefix_cache.py:120-831 (+ ADR 0001: block
identity, NOT token-granular): reusable KV across requests is tracked as a
radix tree of fixed-size token blocks; a block's identity is the hash chain
of all token blocks up to and including it, plus a fingerprint of every
config knob that changes KV contents (model, dtype, method, budgets). Blocks
carry per-layer page ids as payload; refcounts protect attached blocks;
unreferenced blocks are LRU-evicted when the page pool runs dry.

TPU twist vs the reference: block size == page size, so a cache hit is a
pure page-table edit (the hit pages are mapped into the new sequence's row
across all layers — zero KV bytes move, no recompute), and eviction frees
exactly one page per layer per block.
"""

from __future__ import annotations

import hashlib
import itertools
import time
from dataclasses import dataclass, field

import numpy as np

_node_counter = itertools.count()


def config_fingerprint(config) -> str:
    """Hash of every knob that affects stored KV (reference
    prefix_cache.py:62-85 block fingerprint)."""
    parts = (
        config.model, config.dtype, config.kv_cache_dtype, config.method,
        config.page_size, config.num_sink_tokens, config.num_recent_tokens,
        config.prefill_keep_tokens, config.decode_keep_tokens,
        tuple(config.full_attn_layers), config.quest_page_size,
        config.tiny_random_seed if config.tiny_random else "",
    )
    return hashlib.sha256(repr(parts).encode()).hexdigest()[:16]


def _block_hash(parent_hash: bytes, tokens: tuple[int, ...],
                fingerprint: str) -> bytes:
    h = hashlib.blake2b(digest_size=16)
    h.update(parent_hash)
    h.update(fingerprint.encode())
    h.update(np.asarray(tokens, np.int64).tobytes())
    return h.digest()


@dataclass
class PrefixBlock:
    key: bytes
    tokens: tuple[int, ...]
    pages: np.ndarray  # [L] int32 page id per layer
    parent: "PrefixBlock | None"
    children: dict[bytes, "PrefixBlock"] = field(default_factory=dict)
    refcount: int = 0  # live sequence attachments
    last_used: float = field(default_factory=time.monotonic)
    node_id: int = field(default_factory=lambda: next(_node_counter))
    # hybrid models: recurrent-state snapshot valid at this block's END
    # (conv tails + delta-rule matrices, host numpy). None for pure-KV
    # blocks and for blocks not on a chunk boundary (reference
    # PrefixCacheCoordinator MixedPrefixBlockPayload:18-25).
    state: object = None

    @property
    def evictable(self) -> bool:
        return self.refcount == 0 and not self.children


class RadixPrefixIndex:
    """Hash-chain radix tree over token blocks."""

    def __init__(self, block_tokens: int, num_layers: int,
                 fingerprint: str = ""):
        self.block_tokens = block_tokens
        self.L = num_layers
        self.fingerprint = fingerprint
        self._root_hash = b"root"
        self._nodes: dict[bytes, PrefixBlock] = {}
        self._roots: dict[bytes, PrefixBlock] = {}
        self.hits = 0
        self.misses = 0
        self.evictions = 0
        self.hit_tokens = 0  # total prompt tokens served from the cache

    # ------------------------------------------------------------- queries

    def _chain_keys(self, token_ids: list[int]):
        """Yield (key, tokens) per full block of the prompt."""
        n_blocks = len(token_ids) // self.block_tokens
        parent = self._root_hash
        for i in range(n_blocks):
            blk = tuple(
                token_ids[i * self.block_tokens:(i + 1) * self.block_tokens]
            )
            key = _block_hash(parent, blk, self.fingerprint)
            yield key, blk
            parent = key

    def match_longest_prefix(self, token_ids: list[int]) -> list[PrefixBlock]:
        """Longest chain of cached blocks covering a prefix of token_ids."""
        out: list[PrefixBlock] = []
        for key, _ in self._chain_keys(token_ids):
            node = self._nodes.get(key)
            if node is None:
                break
            out.append(node)
        if out:
            self.hits += 1
            self.hit_tokens += len(out) * self.block_tokens
            now = time.monotonic()
            for n in out:
                n.last_used = now
        else:
            self.misses += 1
        return out

    def match_length(self, token_ids: list[int]) -> int:
        """Matched prefix length in tokens (router probe; no ref effects)."""
        n = 0
        for key, _ in self._chain_keys(token_ids):
            if key not in self._nodes:
                break
            n += self.block_tokens
        return n

    # ------------------------------------------------------------ mutation

    def acquire(self, blocks: list[PrefixBlock]) -> None:
        for b in blocks:
            b.refcount += 1

    def release(self, blocks: list[PrefixBlock]) -> None:
        now = time.monotonic()
        for b in blocks:
            b.refcount -= 1
            b.last_used = now
            if b.refcount < 0:
                raise AssertionError(f"refcount underflow on {b.node_id}")

    def insert_chain(
        self,
        token_ids: list[int],
        pages_per_block,  # callable(block_idx) -> [L] np page ids, or list
        upto_tokens: int,
    ) -> list[PrefixBlock]:
        """Insert blocks [0, upto_tokens) of the prompt; existing blocks are
        left as-is (their pages stay canonical). Returns NEW nodes created —
        the caller transfers page ownership for exactly those."""
        created: list[PrefixBlock] = []
        parent_node: PrefixBlock | None = None
        for i, (key, blk) in enumerate(self._chain_keys(token_ids)):
            if (i + 1) * self.block_tokens > upto_tokens:
                break
            node = self._nodes.get(key)
            if node is None:
                pages = (
                    pages_per_block(i)
                    if callable(pages_per_block) else pages_per_block[i]
                )
                node = PrefixBlock(
                    key=key, tokens=blk,
                    pages=np.asarray(pages, np.int32).copy(),
                    parent=parent_node,
                )
                self._nodes[key] = node
                if parent_node is None:
                    self._roots[key] = node
                else:
                    parent_node.children[key] = node
                created.append(node)
            parent_node = node
        return created

    def evict(self, n_blocks: int) -> list[PrefixBlock]:
        """Evict up to n_blocks LRU unreferenced leaves; returns them (the
        caller frees their pages)."""
        out: list[PrefixBlock] = []
        while len(out) < n_blocks:
            cands = [n for n in self._nodes.values() if n.evictable]
            if not cands:
                break
            victim = min(cands, key=lambda n: (n.last_used, -n.node_id))
            self._remove(victim)
            out.append(victim)
        self.evictions += len(out)
        return out

    def _remove(self, node: PrefixBlock) -> None:
        del self._nodes[node.key]
        if node.parent is None:
            self._roots.pop(node.key, None)
        else:
            node.parent.children.pop(node.key, None)

    def reset(self) -> list[PrefixBlock]:
        """Drop every unreferenced block (prefix-cache control RPC)."""
        freed = []
        # iterate until fixpoint: freeing leaves exposes parents.
        while True:
            batch = self.evict(len(self._nodes) or 1)
            if not batch:
                break
            freed.extend(batch)
        return freed

    # --------------------------------------------------------------- stats

    @property
    def num_blocks(self) -> int:
        return len(self._nodes)

    def evictable_blocks(self) -> int:
        # evictable now or after descendants go (refcount-0 subtree sizes);
        # conservative quick count: refcount-0 nodes with no referenced
        # descendants. For budgeting we use the simple refcount-0 count.
        return sum(1 for n in self._nodes.values() if n.refcount == 0)

    def stats(self) -> dict:
        return {
            "blocks": self.num_blocks,
            "evictable": self.evictable_blocks(),
            "hits": self.hits,
            "hit_tokens": self.hit_tokens,
            "misses": self.misses,
            "evictions": self.evictions,
        }
