"""True usable-HBM probe: jnp.zeros commits lazily on the axon backend
(a 15.2 GiB zeros tree 'fits'), so measure with COMPUTED buffers that
must materialize. Binary-search the largest committed allocation, empty
device, to find the real bytes_limit the 7B lane is fighting."""

from __future__ import annotations

import sys


def main() -> None:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def make(n):
        # iota * 3 + 1: forced real materialization (not a zeros constant)
        return jax.lax.iota(jnp.float32, n) * 3.0 + 1.0

    lo, hi = 0, 20 << 30
    ok = 0
    while hi - lo > (64 << 20):
        mid = (lo + hi) // 2
        n = mid // 4
        try:
            x = jax.jit(lambda: jax.lax.iota(jnp.float32, n) * 3.0 + 1.0)()
            x.block_until_ready()
            del x
            ok = mid
            lo = mid
        except Exception as e:  # noqa: BLE001
            print(f"  {mid/2**30:.2f} GiB failed: {type(e).__name__}",
                  file=sys.stderr)
            hi = mid
    print(f"largest committed single buffer: {ok/2**30:.2f} GiB")

    # also probe total via two buffers (fragmentation check)
    half = ok // 2
    n = half // 4
    try:
        a = jax.jit(lambda: jax.lax.iota(jnp.float32, n) + 1.0)()
        b = jax.jit(lambda: jax.lax.iota(jnp.float32, n) + 2.0)()
        jax.block_until_ready((a, b))
        print(f"two buffers of {half/2**30:.2f} GiB: OK")
        lo2, hi2 = 0, 8 << 30
        ok2 = 0
        while hi2 - lo2 > (64 << 20):
            mid = (lo2 + hi2) // 2
            m = mid // 4
            try:
                c = jax.jit(lambda: jax.lax.iota(jnp.float32, m) + 3.0)()
                c.block_until_ready()
                del c
                ok2 = mid
                lo2 = mid
            except Exception:  # noqa: BLE001
                hi2 = mid
        print(f"third buffer next to 2x{half/2**30:.2f}: {ok2/2**30:.2f} "
              f"GiB -> total committed ~{(2*half+ok2)/2**30:.2f} GiB")
    except Exception as e:  # noqa: BLE001
        print(f"two-buffer probe failed: {e!r}")


if __name__ == "__main__":
    main()
