#!/usr/bin/env python
"""Depthwise 7x7 conv formulations on TPU.

XLA's grouped lax.conv (feature_group_count=C) measures ~13.6 ms across
ConvNeXt-B @ batch 64 — far above the VPU element floor (~5 ms).  This
benches alternatives at each stage geometry:
  conv    : lax.conv_general_dilated grouped (prod today)
  shifts  : pad + 49 static-slice FMAs (one XLA fusion, halo reuse)
  and the fused variant shifts+LayerNorm epilogue.
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, *args, steps=16, reps=3):
    def loop(n):
        @jax.jit
        def run(*a):
            def body(i, carry):
                out = fn(*a, carry)
                return carry + out * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run
    short, long_ = loop(2), loop(2 + steps)
    float(short(*args)); float(long_(*args))
    def t(f):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(long_) - t(short)) / steps


def dw_conv(x, w):
    """Grouped-conv formulation (NHWC, w: (7,7,1,C))."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def dw_shifts(x, w):
    """pad + 49 shifted FMAs; w: (7,7,C)."""
    n, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    out = jnp.zeros_like(x)
    for dy in range(7):
        for dx in range(7):
            out = out + xp[:, dy:dy + h, dx:dx + ww, :] * w[dy, dx]
    return out


def dw_shifts_ln(x, w, g, b):
    y = dw_shifts(x, w).astype(jnp.float32)
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    return ((y - mu) * jax.lax.rsqrt(var + 1e-6) * g + b).astype(x.dtype)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    # ConvNeXt-B stage geometries (res, dim, nblocks)
    stages = [(64, 128, 3), (32, 256, 3), (16, 512, 27), (8, 1024, 3)]
    tot = {"conv": 0.0, "shifts": 0.0, "shifts+ln": 0.0}
    for res, dim, nb in stages:
        x = jnp.asarray(rng.normal(size=(B, res, res, dim)), jnp.bfloat16)
        w4 = jnp.asarray(rng.normal(size=(7, 7, 1, dim)), jnp.bfloat16)
        w3 = w4[:, :, 0, :]
        g = jnp.ones((dim,), jnp.float32)
        bb = jnp.zeros((dim,), jnp.float32)
        t_conv = bench(lambda a, b_, c: jnp.sum(
            dw_conv(a + c.astype(a.dtype) * 0, b_).astype(jnp.float32)), x, w4)
        t_shift = bench(lambda a, b_, c: jnp.sum(
            dw_shifts(a + c.astype(a.dtype) * 0, b_).astype(jnp.float32)), x, w3)
        t_sln = bench(lambda a, b_, c: jnp.sum(
            dw_shifts_ln(a + c.astype(a.dtype) * 0, b_, g, bb)
            .astype(jnp.float32)), x, w3)
        print(f"res{res:3d} c{dim:4d} x{nb:2d}:  conv {t_conv*1e3:6.2f}  "
              f"shifts {t_shift*1e3:6.2f}  shifts+ln {t_sln*1e3:6.2f} ms"
              f"   (per net: {t_conv*nb*1e3:6.2f} / {t_shift*nb*1e3:6.2f}"
              f" / {t_sln*nb*1e3:6.2f})")
        tot["conv"] += t_conv * nb
        tot["shifts"] += t_shift * nb
        tot["shifts+ln"] += t_sln * nb
    print({k: round(v * 1e3, 2) for k, v in tot.items()})


if __name__ == "__main__":
    main()
