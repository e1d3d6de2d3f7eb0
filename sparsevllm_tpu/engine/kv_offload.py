"""Host (CPU RAM) KV offload tier.

Reference counterpart: engine/cache_manager/raw_kv_offload.py:25-286 — a
pinned-CPU backing store that long (>96K) chunked prefills spill raw KV
into, restored layer-chunk-by-layer-chunk at compression time.

TPU positioning (SURVEY §5 long-context): the FIRST resort for beyond-HBM
contexts is ICI-sharded KV over more chips (parallel/mesh.py); this module
is the second tier for 1M-context bs=1 on small slices. It uses JAX memory
kinds: on TPU, ``pinned_host`` keeps the buffer in host RAM addressable by
the device DMA engines (async device<->host copies); on CPU backends it
degrades to a plain copy, which keeps the tier testable everywhere.

API is page-granular to match the paged KV runtime: ``offload(key, pages)``
snapshots page payloads out of the cache; ``restore(key)`` brings them back
as a device array the caller scatters into freshly allocated pages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.log import logger


def _host_sharding():
    dev = jax.devices()[0]
    try:
        return jax.sharding.SingleDeviceSharding(
            dev, memory_kind="pinned_host"
        )
    except Exception:  # noqa: BLE001 — backend without memory kinds
        try:
            cpu = jax.devices("cpu")[0]
            return jax.sharding.SingleDeviceSharding(cpu)
        except Exception:  # noqa: BLE001
            return jax.sharding.SingleDeviceSharding(dev)


class HostKVOffload:
    """Keyed page-payload spill store (host-resident)."""

    def __init__(self):
        self._sharding = _host_sharding()
        self._store: dict = {}
        self.bytes_offloaded = 0

    def offload(self, key, k_cache: jax.Array, v_cache: jax.Array,
                layer_idx: int, pages) -> None:
        """Snapshot pages [N] of one layer to host memory (async start)."""
        pages = jnp.asarray(pages)
        k = k_cache[layer_idx][pages]  # [N, P, Nkv, Dh]
        v = v_cache[layer_idx][pages]
        hk = jax.device_put(k, self._sharding)
        hv = jax.device_put(v, self._sharding)
        self._store[key] = (hk, hv)
        self.bytes_offloaded += hk.nbytes + hv.nbytes

    def restore(self, key) -> tuple[jax.Array, jax.Array]:
        """Bring page payloads back to device ([N, P, Nkv, Dh] x2)."""
        hk, hv = self._store[key]
        dev = jax.devices()[0]
        return (
            jax.device_put(hk, jax.sharding.SingleDeviceSharding(dev)),
            jax.device_put(hv, jax.sharding.SingleDeviceSharding(dev)),
        )

    def drop(self, key) -> None:
        item = self._store.pop(key, None)
        if item is not None:
            self.bytes_offloaded -= item[0].nbytes + item[1].nbytes

    def __contains__(self, key) -> bool:
        return key in self._store

    def stats(self) -> dict:
        return {
            "entries": len(self._store),
            "bytes": self.bytes_offloaded,
            "memory_kind": getattr(self._sharding, "memory_kind", "device"),
        }


def scatter_restored(k_cache, v_cache, layer_idx: int, pages,
                     k_pages, v_pages):
    """Write restored page payloads into (freshly allocated) pages."""
    pages = jnp.asarray(pages)
    k_cache = k_cache.at[layer_idx, pages].set(
        k_pages.astype(k_cache.dtype)
    )
    v_cache = v_cache.at[layer_idx, pages].set(
        v_pages.astype(v_cache.dtype)
    )
    return k_cache, v_cache
