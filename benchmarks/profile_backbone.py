#!/usr/bin/env python
"""Backbone cost decomposition: bench ConvNeXt-B variants that each remove
one op family (GELU, LayerNorm, depthwise conv, layer-scale) to locate the
gap between the measured forward (~34 ms @ batch 64 bf16) and the
compute/HBM floor (~13-16 ms on v5e).

Run on the real chip:  PYTHONPATH=$PYTHONPATH:. python benchmarks/profile_backbone.py 64
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


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


class Block(nn.Module):
    """ConvNeXt block with op families switchable."""
    dim: int
    use_dw: bool = True
    use_ln: bool = True
    act: str = "gelu"          # gelu | relu | none
    use_gamma: bool = True
    ln_f32: bool = True
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        r = x
        y = x
        if self.use_dw:
            y = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                        feature_group_count=self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
        if self.use_ln:
            if self.ln_f32:
                y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(
                    y.astype(jnp.float32)).astype(self.dtype)
            else:
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        if self.act == "gelu":
            y = nn.gelu(y, approximate=True)
        elif self.act == "relu":
            y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(y)
        if self.use_gamma:
            g = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,), jnp.float32)
            y = y * g.astype(self.dtype)
        return r + y


class Net(nn.Module):
    kw: dict

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(128, (4, 4), strides=(4, 4), padding="VALID",
                    dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(
            y.astype(jnp.float32)).astype(jnp.bfloat16)
        for stage, (depth, dim) in enumerate(
                zip((3, 3, 27, 3), (128, 256, 512, 1024))):
            if stage > 0:
                y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(
                    y.astype(jnp.float32)).astype(jnp.bfloat16)
                y = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            dtype=jnp.bfloat16, param_dtype=jnp.float32)(y)
            for _ in range(depth):
                y = Block(dim, **self.kw)(y)
        return y


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, 256, 256, 3)), jnp.float32)

    variants = [
        ("full (prod config)", {}),
        ("no-gelu", {"act": "none"}),
        ("relu", {"act": "relu"}),
        ("ln-bf16", {"ln_f32": False}),
        ("no-ln", {"use_ln": False}),
        ("no-dwconv", {"use_dw": False}),
        ("no-gamma", {"use_gamma": False}),
        ("matmuls-only", {"use_dw": False, "use_ln": False, "act": "none",
                          "use_gamma": False}),
    ]
    base = None
    for name, kw in variants:
        net = Net(kw=kw)
        v = jax.jit(net.init)(jax.random.PRNGKey(0), img)
        dt = bench(lambda vv, b, c: jnp.sum(
            net.apply(vv, b + c * 1e-6).astype(jnp.float32)), v, img)
        if base is None:
            base = dt
        print(f"{name:20s} {dt*1000:8.2f} ms   delta vs full "
              f"{(dt-base)*1000:+7.2f} ms")


if __name__ == "__main__":
    main()
