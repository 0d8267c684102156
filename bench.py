#!/usr/bin/env python
"""Headline benchmark: PoseNet inference throughput (crops/sec/chip).

Runs the flagship model (ConvNeXt-B backbone, DCNv3 map encoder, bf16
compute) on the attached TPU chip and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/target}

Baseline target: >= 2000 crops/sec/chip on v5e (BASELINE.json).

Methodology: the axon tunnel to the chip has ~25-30 ms host round-trip
latency and unreliable async-completion signals, so timing per-call from
the host under-reports throughput wildly.  Instead the model is iterated
ON DEVICE inside one jitted lax.fori_loop whose carry perturbs the input
each step (defeating result caching and DCE); a scalar is fetched once.
Per-step time is the difference between a long and a short loop, which
cancels the fixed round-trip + dispatch cost.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from givepose_tpu.core.config import ModelConfig
    from givepose_tpu.models import PoseNet

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    cfg = ModelConfig(compute_dtype="bfloat16")
    model = PoseNet(cfg=cfg, backbone_variant="base")

    rng = np.random.default_rng(0)
    K = np.tile(np.array([[591.0, 0, 322.5], [0, 590.2, 244.1],
                          [0, 0, 1]], np.float32), (batch, 1, 1))
    data = {
        "roi_img": jnp.asarray(rng.normal(size=(batch, 256, 256, 3)),
                               jnp.float32),
        "roi_coord_2d": jnp.asarray(rng.uniform(-1, 1, (batch, 64, 64, 2)),
                                    jnp.float32),
        "cam_K": jnp.asarray(K),
        "bbox_center": jnp.asarray(rng.uniform(100, 400, (batch, 2)),
                                   jnp.float32),
        "resize_ratio": jnp.asarray(rng.uniform(0.2, 0.5, (batch,)),
                                    jnp.float32),
        "roi_wh": jnp.asarray(rng.uniform(50, 150, (batch, 2)), jnp.float32),
        "mean_size": jnp.asarray(np.tile([[0.1, 0.2, 0.1]], (batch, 1)),
                                 jnp.float32),
    }

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data)

    def loop(n):
        @jax.jit
        def run(v, b):
            def body(i, carry):
                b2 = dict(b)
                b2["roi_img"] = b["roi_img"] + carry * 1e-6
                out = model.apply(v, b2)
                return carry + jnp.sum(out["trans"]) * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    run_short = loop(2)
    run_long = loop(2 + steps)

    # compile both
    float(run_short(variables, data))
    float(run_long(variables, data))

    def timed(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(variables, data))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(run_short)
    t_long = timed(run_long)
    per_step = (t_long - t_short) / steps
    crops_per_sec = batch / per_step

    print(json.dumps({
        "metric": "crops/sec/chip (PoseNet-B bf16 inference, batch %d)"
                  % batch,
        "value": round(crops_per_sec, 1),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()
