#!/usr/bin/env python
"""HLO-level profile of the flagship PoseNet forward: top ops by self time.

Captures a jax.profiler trace of a few forward passes (XLA-only configs —
NEVER run this on a model containing Mosaic kernels over the axon tunnel,
it wedges the chip claim; see CLAUDE.md), then parses the .xplane.pb with
the tensorboard-plugin-profile converter and prints per-op self times
grouped by category plus the top-N individual ops.

Usage: python benchmarks/profile_hlo.py [batch] [use_dcn] [top_n]
"""

from __future__ import annotations

import collections
import glob
import os
import sys
import tempfile

import numpy as np


def build_model(batch: int, use_dcn: str):
    import jax
    import jax.numpy as jnp

    from givepose_tpu.core.config import ModelConfig
    from givepose_tpu.models import PoseNet

    cfg = ModelConfig(compute_dtype="bfloat16", use_dcn=use_dcn)
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

    # iterate ON DEVICE inside one dispatch (same shape as bench.py's
    # loop): per-call tracing over the axon tunnel otherwise records the
    # ~25 ms host round-trip as giant copy-start waits that drown the
    # real op times
    @jax.jit
    def fwd(v, b, c):
        def body(i, carry):
            b2 = dict(b)
            b2["roi_img"] = b["roi_img"] + carry * 1e-6
            out = model.apply(v, b2)
            return carry + jnp.sum(out["trans"]) * 1e-12
        return jax.lax.fori_loop(0, LOOP_STEPS, body, c)

    return fwd, variables, data


LOOP_STEPS = 8


def _import_xplane_pb2():
    """The xplane proto module moved across TF/xprof releases; probe the
    known homes (tensorboard-plugin-profile 2.13 had it under .protobuf;
    the 2.20-era env only ships it inside tensorflow.tsl)."""
    import importlib

    for mod in ("tensorboard_plugin_profile.protobuf.xplane_pb2",
                "tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "xprof.protobuf.xplane_pb2"):
        try:
            return importlib.import_module(mod)
        except ImportError:
            continue
    raise ImportError("no xplane_pb2 found in any known package")


def collect_op_times(trace_dir: str):
    """Sum per-HLO-op durations from the xplane protos (TPU device lines)."""
    xplane_pb2 = _import_xplane_pb2()

    op_time = collections.Counter()
    total = 0.0
    for path in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            name = plane.name.lower()
            if "tpu" not in name and "device" not in name:
                continue
            if "step" in name.lower():
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op lines carry the per-op events; skip step lines
                if "xla op" not in lname and "xla:op" not in lname \
                        and lname != "xla ops":
                    continue
                for ev in line.events:
                    op = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e12
                    op_time[op] += dur
                    total += dur
    return op_time, total


CATEGORIES = (
    # async DMA waits (weight prefetch / host copies) overlap compute —
    # their durations are wait time, not additive cost
    ("async dma (overlapped)", ("copy-start", "slice-start", "copy-done",
                                "slice-done", "all-reduce-start")),
    ("while shell", ("while",)),
    ("conv", ("convolution",)),
    ("dot/matmul", ("dot", "dosort")),
    ("reduce (norm stats)", ("reduce", "convert_reduce")),
    ("copy/transpose/reshape", ("copy", "transpose", "reshape",
                                "bitcast", "slice", "concatenate", "pad")),
    ("convert", ("convert",)),
    ("fusion (elementwise)", ("fusion", "multiply", "add", "subtract",
                              "tanh", "exponential", "divide", "rsqrt",
                              "maximum", "select", "compare", "broadcast")),
)


def categorize(op: str) -> str:
    low = op.lower().lstrip("%")
    for cat, keys in CATEGORIES:
        for k in keys:
            if low.startswith(k) or f".{k}" in low:
                return cat
    return "other"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    use_dcn = sys.argv[2] if len(sys.argv) > 2 else ""
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    import jax

    assert use_dcn in ("", "conv"), (
        "only XLA-only configs may be traced over axon (Mosaic kernels "
        "deadlock the chip claim)")
    use_dcn = ""

    fwd, variables, data = build_model(batch, use_dcn)
    c = fwd(variables, data, np.float32(0))
    float(c)  # compile + warm

    trace_dir = tempfile.mkdtemp(prefix="hlo_trace_")
    import jax.profiler

    jax.profiler.start_trace(trace_dir)
    c = fwd(variables, data, c)
    float(c)
    jax.profiler.stop_trace()

    op_time, total = collect_op_times(trace_dir)
    if not op_time:
        print("no device op events found in", trace_dir)
        return
    steps = LOOP_STEPS
    print(f"total device op time: {total*1e3:.2f} ms over {steps} fwd "
          f"passes ({total/steps*1e3:.2f} ms/pass, batch {batch})")

    cats = collections.Counter()
    for op, t in op_time.items():
        cats[categorize(op)] += t
    print("\nby category (ms/pass):")
    for cat, t in cats.most_common():
        print(f"  {cat:28s} {t/steps*1e3:8.2f}  ({t/total*100:5.1f}%)")
    compute = total - cats.get("async dma (overlapped)", 0.0) \
        - cats.get("while shell", 0.0)
    print(f"  {'== compute ops only':28s} {compute/steps*1e3:8.2f}")

    print(f"\ntop {top_n} ops (ms/pass):")
    shown = 0
    for op, t in op_time.most_common():
        if categorize(op) == "async dma (overlapped)":
            continue
        print(f"  {t/steps*1e3:8.3f}  {op[:150]}")
        shown += 1
        if shown >= top_n:
            break

    dump = os.environ.get("HLO_PROFILE_TSV")
    if dump:
        with open(dump, "w") as f:
            for op, t in op_time.most_common():
                f.write(f"{t/steps*1e3:.4f}\t{op}\n")
        print(f"\nfull op dump: {dump}")


if __name__ == "__main__":
    main()
