#!/usr/bin/env python
"""Per-component throughput profiling with the on-device loop method."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_fn(make_apply, variables, x, steps=16, reps=3):
    """Time one application of apply(v, x) via long-short loop diff."""

    def loop(n):
        @jax.jit
        def run(v, b):
            def body(i, carry):
                out = make_apply(v, b, carry)
                return carry + out * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    short, long_ = loop(2), loop(2 + steps)
    float(short(variables, x))
    float(long_(variables, x))
    ts = min(_t(short, variables, x) for _ in range(reps))
    tl = min(_t(long_, variables, x) for _ in range(reps))
    return (tl - ts) / steps


def _t(fn, v, x):
    t0 = time.perf_counter()
    float(fn(v, x))
    return time.perf_counter() - t0


def main():
    from givepose_tpu.models.convnext import convnext_base
    from givepose_tpu.models.heads import (TopDownXyzHead, MAPEncoder,
                                           ConvPnPNet, SizeHead)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    results = {}

    img = jnp.asarray(rng.normal(size=(B, 256, 256, 3)), jnp.float32)
    bb = convnext_base(dtype=jnp.bfloat16)
    vb = jax.jit(bb.init)(jax.random.PRNGKey(0), img)
    dt = bench_fn(lambda v, b, c: jnp.sum(
        bb.apply(v, b + c * 1e-6).astype(jnp.float32)), vb, img)
    results["backbone(convnext-b)"] = dt

    feat = jnp.asarray(rng.normal(size=(B, 8, 8, 1024)), jnp.bfloat16)
    xh = TopDownXyzHead(dtype=jnp.bfloat16)
    vx = jax.jit(xh.init)(jax.random.PRNGKey(0), feat)
    dt = bench_fn(lambda v, b, c: jnp.sum(
        xh.apply(v, b + c.astype(jnp.bfloat16) * 1e-6)[0]), vx, feat)
    results["xyz_head(x1)"] = dt

    cm = jnp.asarray(rng.normal(size=(B, 64, 64, 3)), jnp.bfloat16)
    me = MAPEncoder(dtype=jnp.bfloat16)
    vm = jax.jit(me.init)(jax.random.PRNGKey(0), cm)
    dt = bench_fn(lambda v, b, c: jnp.sum(
        me.apply(v, b + c.astype(jnp.bfloat16) * 1e-6).astype(jnp.float32)),
        vm, cm)
    results["map_encoder(dcnv3)"] = dt

    me2 = MAPEncoder(dtype=jnp.bfloat16, use_dcn="")
    vm2 = jax.jit(me2.init)(jax.random.PRNGKey(0), cm)
    dt = bench_fn(lambda v, b, c: jnp.sum(
        me2.apply(v, b + c.astype(jnp.bfloat16) * 1e-6).astype(jnp.float32)),
        vm2, cm)
    results["map_encoder(conv)"] = dt

    pin = jnp.asarray(rng.normal(size=(B, 64, 64, 5)), jnp.bfloat16)
    pn = ConvPnPNet(dtype=jnp.bfloat16)
    vp = jax.jit(pn.init)(jax.random.PRNGKey(0), pin)
    dt = bench_fn(lambda v, b, c: jnp.sum(
        pn.apply(v, b + c.astype(jnp.bfloat16) * 1e-6)[0]), vp, pin)
    results["pnp_net"] = dt

    total = 0.0
    for name, dt in results.items():
        print(f"{name:24s} {dt*1000:8.2f} ms  {B/dt:10.0f} crops/s")
        total += dt
    # xyz head runs twice in PoseNet
    total += results["xyz_head(x1)"]
    print(f"{'sum(2x xyz_head)':24s} {total*1000:8.2f} ms  "
          f"{B/total:10.0f} crops/s")


if __name__ == "__main__":
    main()
