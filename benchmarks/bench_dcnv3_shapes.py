#!/usr/bin/env python
"""Per-layer DCNv3 kernel timing on the real chip (on-device loop method).

The MAPEncoder runs three stride-2 DCNv3 layers (models/heads.py):
  64x64 -> 32x32 @128ch, 32x32 -> 16x16 @128ch, 16x16 -> 8x8 @256ch.
This bench times dcnv3_fast (Pallas) and dcnv3_core (XLA) per shape so
kernel work targets the measured split, not guesses.

Usage: python benchmarks/bench_dcnv3_shapes.py [batch]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from givepose_tpu.ops.dcnv3 import dcnv3_core
from givepose_tpu.ops.dcnv3_pallas import dcnv3_pallas
from givepose_tpu.ops.dcnv3_window_pallas import dcnv3_windowed_pallas


def bench(fn, args, steps=32, reps=3):
    """Long-minus-short on-device loop; perturbs inputs in-place via the
    carry so the axon identical-input cache cannot serve repeats."""

    def loop(n):
        @jax.jit
        def run(x, off, m):
            def body(i, carry):
                c, x_, off_ = carry
                out = fn(x_, off_, m)
                return (c + jnp.sum(out) * 1e-12,
                        x_ + out * 1e-12, off_)
            c, _, _ = jax.lax.fori_loop(0, n, body,
                                        (jnp.float32(0), x, off))
            return c
        return run

    short, long_ = loop(2), loop(2 + steps)
    float(short(*args)); float(long_(*args))

    def t(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0

    ts = min(t(short) for _ in range(reps))
    tl = min(t(long_) for _ in range(reps))
    return (tl - ts) / steps


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    shapes = [
        ("64->32 c128", (b, 64, 64, 128), (b, 32, 32, 128)),
        ("32->16 c128", (b, 32, 32, 128), (b, 16, 16, 128)),
        ("16->8  c256", (b, 16, 16, 256), (b, 8, 8, 256)),
    ]
    g, p = 4, 9
    total_fast = total_win = total_core = 0.0
    for name, xs, os_ in shapes:
        n, ho, wo = os_[0], os_[1], os_[2]
        x = jnp.asarray(rng.normal(size=xs), jnp.float32)
        off = jnp.asarray(rng.normal(size=(n, ho, wo, g * p * 2)),
                          jnp.float32)
        m = jax.nn.softmax(jnp.asarray(
            rng.normal(size=(n, ho, wo, g, p)), jnp.float32),
            axis=-1).reshape(n, ho, wo, g * p)

        def fast(x_, o_, m_):
            return dcnv3_pallas(x_, o_, m_, stride=2,
                                compute_dtype=jnp.bfloat16)

        def win(x_, o_, m_):
            return dcnv3_windowed_pallas(x_, o_, m_, stride=2, window=4,
                                         compute_dtype=jnp.bfloat16)

        def core(x_, o_, m_):
            return dcnv3_core(x_, o_, m_, stride=2)

        tf = bench(fast, (x, off, m))
        tw = bench(win, (x, off, m))
        tc = bench(core, (x, off, m))
        total_fast += tf
        total_win += tw
        total_core += tc
        print(f"{name}: pallas {tf*1e3:7.3f} ms   win {tw*1e3:7.3f} ms   "
              f"xla-core {tc*1e3:7.3f} ms")
    print(f"TOTAL  : pallas {total_fast*1e3:7.3f} ms   "
          f"win {total_win*1e3:7.3f} ms   "
          f"xla-core {total_core*1e3:7.3f} ms  (batch {b}, x3 layers)")


if __name__ == "__main__":
    main()
