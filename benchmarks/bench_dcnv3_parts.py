#!/usr/bin/env python
"""Split one DCNv3Conv layer into its pieces and time each on the chip.

The module (models/dcnv3_module.py) is: proj Dense -> offset branch
(dwconv+LN+GELU, offset/mask Dense, softmax) -> sampling core (prep +
Pallas kernel) -> output Dense.  bench_dcnv3_shapes.py times the core
alone; this bench times the pieces so kernel work targets the measured
split.  Usage: python benchmarks/bench_dcnv3_parts.py [batch] [window]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def bench(fn, args, steps=32, reps=3):
    """Long-minus-short on-device loop, first arg perturbed via carry."""

    def loop(n):
        @jax.jit
        def run(*a):
            def body(i, carry):
                c, x0 = carry
                out = fn(x0, *a[1:])
                return (c + jnp.sum(out.astype(jnp.float32)) * 1e-12,
                        x0 + (jnp.sum(out.astype(jnp.float32)) * 1e-12
                              ).astype(x0.dtype))
            c, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), a[0]))
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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    g, p = 4, 9
    rng = np.random.default_rng(0)

    # the MAPEncoder's first (most expensive) layer: 64x64 -> 32x32 @256
    # (MAPEncoder featdim/outdim default 256 — models/heads.py:73-74;
    # this bench previously assumed 128 and under-stated every piece)
    h, c, stride = 64, 256, 2
    ho = h // stride
    dt = jnp.bfloat16

    x = jnp.asarray(rng.normal(size=(b, h, h, c)), dt)
    x1 = jnp.asarray(rng.normal(size=(b, ho, ho, c)), dt)
    off = jnp.asarray(rng.normal(size=(b, ho, ho, g * p * 2)) * 2,
                      jnp.float32)
    m = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(b, ho, ho, g, p)), jnp.float32),
        axis=-1).reshape(b, ho, ho, g * p)

    results = {}

    dense = nn.Dense(c, dtype=dt, param_dtype=jnp.float32)
    vd = dense.init(jax.random.PRNGKey(0), x)
    results["proj_dense(64x64x256)"] = bench(
        lambda a: dense.apply(vd, a), (x,))

    class OffsetBranch(nn.Module):
        @nn.compact
        def __call__(self, a):
            # strided dwconv form (models/dcnv3_module.py r4): identical
            # to full-res + [::s] slicing since LN/GELU are pointwise
            y = nn.Conv(c, (3, 3), strides=(stride, stride),
                        padding=[(1, 1), (1, 1)], feature_group_count=c,
                        dtype=dt, param_dtype=jnp.float32)(a)
            y = nn.LayerNorm(epsilon=1e-6, dtype=dt)(y)
            y = nn.gelu(y, approximate=True)
            o = nn.Dense(g * p * 2, dtype=dt, param_dtype=jnp.float32)(y)
            ml = nn.Dense(g * p, dtype=dt, param_dtype=jnp.float32)(y)
            n_, nh, nw = ml.shape[:3]
            mk = nn.softmax(ml.reshape(n_, nh, nw, g, p).astype(jnp.float32),
                            axis=-1)
            return o.astype(jnp.float32) + mk.reshape(n_, nh, nw, -1
                                                      ).sum(-1)[..., None]

        # NB returns a combined tensor only so bench has one output.

    ob = OffsetBranch()
    vo = ob.init(jax.random.PRNGKey(0), x)
    results["offset_branch"] = bench(lambda a: ob.apply(vo, a), (x,))

    from givepose_tpu.ops.dcnv3_window_pallas import (
        _prepare,
        dcnv3_windowed_pallas,
    )

    # production (P1, r4) feeds the windowed core bf16 directly — no f32
    # round trip (prep measured 1.19 ms bf16-in vs 3.28 ms via f32)
    def prep_only(a):
        img, aux, _ = _prepare(a, off, m, 3, stride, 1, 1, g, 1.0, window,
                               jnp.bfloat16)
        return jnp.sum(img.astype(jnp.float32)) + jnp.sum(aux)

    results["win_prep(xla)"] = bench(prep_only, (x,))

    def full_win(a):
        return dcnv3_windowed_pallas(a, off, m, stride=stride, window=window)

    results["win_total(prep+kernel)"] = bench(full_win, (x,))

    outd = nn.Dense(c, dtype=dt, param_dtype=jnp.float32)
    vout = outd.init(jax.random.PRNGKey(0), x1)
    results["output_dense(32x32x256)"] = bench(
        lambda a: outd.apply(vout, a), (x1,))

    for k, v in results.items():
        print(f"{k:28s}: {v*1e3:7.3f} ms")
    kernel = results["win_total(prep+kernel)"] - results["win_prep(xla)"]
    print(f"{'win_kernel(=total-prep)':28s}: {kernel*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
