#!/usr/bin/env python
"""Split the windowed DCNv3 kernel's in-kernel cost on the chip.

The kernel (ops/dcnv3_window_pallas.py) has three cost centers per grid
step: the stage-A MXU matmul (Slab @ ExT), the VPU 2-hot weight builds
(ext over (W_pad, P*T), ey over (slab_h, P*T)), and the stage-B
slab_h-unrolled broadcast-FMA.  This bench times ablated kernel variants
(numerically meaningless, structurally identical) to attribute the time:

  full      the real kernel
  no_stageB stage A + ext build only (ey build + slab loop removed)
  const_ext stage A matmul + stage B (ext replaced by a constant 1-hot,
            so the x-corners VPU build disappears)
  no_mm     weight builds + stage B (matmul replaced by a broadcast copy)

Usage: python benchmarks/bench_win_kernel_split.py [batch] [channels]
Defaults: batch 128, channels 256 (the MAPEncoder L0 shape, 64->32 @256).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from givepose_tpu.ops.dcnv3_window_pallas import _prepare, _win_dims


def _kernel(img_ref, aux_ref, o_ref, rmix_ref, *, dims, variant,
            compute_dtype=jnp.bfloat16):
    gc = dims["gc"]
    p = dims["p"]
    t = dims["t"]
    w_pad = dims["w_pad"]
    slab_h = dims["slab_h"]
    group = img_ref.shape[1]
    rows = slab_h * gc
    lanes = p * t
    cdt = compute_dtype

    q = pl.program_id(1)
    c_first = dims["half"] + dims["stride"] * dims["tr"] * q
    y_lo = jnp.clip(c_first - dims["window"] - 1, 0,
                    dims["h_eff"] - slab_h)
    if variant == "ylo0":
        y_lo = 0  # static offset: measures the dynamic-sublane-slice cost

    def corners(v, m, n_valid):
        v0 = jnp.floor(v)
        f = v - v0
        valid0 = ((v0 >= 0.0) & (v0 < n_valid)).astype(jnp.float32)
        valid1 = ((v0 + 1.0 >= 0.0) & (v0 + 1.0 < n_valid)
                  ).astype(jnp.float32)
        c0 = jnp.clip(v0, 0.0, n_valid - 1.0)
        c1 = jnp.clip(v0 + 1.0, 0.0, n_valid - 1.0)
        return c0, c1, (1.0 - f) * valid0 * m, f * valid1 * m

    def bcast(a, rows_n):
        return jnp.broadcast_to(a, (rows_n, lanes))

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (w_pad, lanes),
                                      0).astype(jnp.float32)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (slab_h, lanes),
                                      0).astype(jnp.float32)
    y_rel = iota_y + jnp.float32(y_lo)

    for g in range(group):
        if variant in ("base", "base_ylo0", "base_half", "base_noload"):
            # pure shell: slab load + a cheap fold + store.  Brackets the
            # per-step overhead with no MXU work and no weight builds.
            # base_half loads half the slab lanes and base_noload reads a
            # single slab row — if base is slab-load-traffic-bound these
            # collapse proportionally; if it is per-step overhead they
            # stay flat.
            if variant == "base_noload":
                sl = img_ref[0, g, pl.ds(y_lo * gc, gc), :]
                o_ref[0, g] = jnp.broadcast_to(
                    sl[0:gc, 0:1].astype(jnp.float32), (gc, t))
                continue
            wl = w_pad // 2 if variant == "base_half" else w_pad
            sl = img_ref[0, g, pl.ds((0 if variant == "base_ylo0"
                                      else y_lo) * gc, rows), 0:wl]
            acc = jnp.zeros((gc, t), jnp.float32)
            for i in range(p):
                s0 = (i * gc) % (rows - gc + 1)
                acc = acc + sl[s0:s0 + gc, 0:1].astype(jnp.float32)
            o_ref[0, g] = acc
            continue
        if variant not in ("fused1", "fused2"):
            sl = img_ref[0, g, pl.ds(y_lo * gc, rows), :].astype(cdt)
        iy_l = aux_ref[0, g, 0, 0:1, :]
        ix_l = aux_ref[0, g, 0, 1:2, :]
        m_l = aux_ref[0, g, 0, 2:3, :]

        if variant == "const_ext":
            ext = (iota_x == 0.0).astype(cdt)
        else:
            x0a_l, x0b_l, wx0_l, wx1_l = corners(ix_l, m_l,
                                                 float(dims["w_in"]))
            ext = (jnp.where(iota_x == bcast(x0a_l, w_pad),
                             bcast(wx0_l, w_pad), 0.0)
                   + jnp.where(iota_x == bcast(x0b_l, w_pad),
                               bcast(wx1_l, w_pad), 0.0)).astype(cdt)

        if variant in ("fused1", "fused2"):
            # fuse stage B into stage A: per y-chunk matmul + immediate
            # broadcast-FMA, so the (rows, lanes) rmix never round-trips
            # through VMEM scratch (the measured base cost of the
            # two-stage kernel).
            y0a_l, y0b_l, wy0_l, wy1_l = corners(iy_l, 1.0,
                                                 float(dims["h_in"]))
            ey = (jnp.where(y_rel == bcast(y0a_l, slab_h),
                            bcast(wy0_l, slab_h), 0.0)
                  + jnp.where(y_rel == bcast(y0b_l, slab_h),
                              bcast(wy1_l, slab_h), 0.0)).astype(cdt)
            red = jnp.zeros((gc, lanes), jnp.float32)
            if variant == "fused1":
                for y in range(slab_h):
                    ry = jax.lax.dot_general(
                        img_ref[0, g, pl.ds((y_lo + y) * gc, gc), :
                                ].astype(cdt), ext,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    red = red + ry * ey[y:y + 1, :].astype(jnp.float32)
            else:
                assert slab_h % 2 == 0 or True
                nch = slab_h // 2
                for k in range(nch):
                    r2 = jax.lax.dot_general(
                        img_ref[0, g, pl.ds((y_lo + 2 * k) * gc, 2 * gc),
                                :].astype(cdt), ext,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    red = (red
                           + r2[0:gc] * ey[2 * k:2 * k + 1, :
                                           ].astype(jnp.float32)
                           + r2[gc:2 * gc] * ey[2 * k + 1:2 * k + 2, :
                                                ].astype(jnp.float32))
                for y in range(2 * nch, slab_h):
                    ry = jax.lax.dot_general(
                        img_ref[0, g, pl.ds((y_lo + y) * gc, gc), :
                                ].astype(cdt), ext,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    red = red + ry * ey[y:y + 1, :].astype(jnp.float32)
            acc = jnp.zeros((gc, t), jnp.float32)
            for i in range(p):
                acc = acc + red[:, i * t:(i + 1) * t]
            o_ref[0, g] = acc
            continue

        if variant == "no_mm":
            rmix_ref[...] = jnp.broadcast_to(
                sl[:, 0:1] + jnp.sum(ext[0:1, :], axis=0, keepdims=True
                                     ).astype(cdt).T[0:1, :] * 0,
                (rows, lanes)).astype(cdt)
        else:
            rmix_ref[...] = jax.lax.dot_general(
                sl, ext, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdt)

        if variant == "no_stageB":
            acc = jnp.zeros((gc, t), jnp.float32)
            for i in range(p):
                acc = acc + rmix_ref[pl.ds(0, gc), i * t:(i + 1) * t]
            o_ref[0, g] = acc
            continue

        y0a_l, y0b_l, wy0_l, wy1_l = corners(iy_l, 1.0,
                                             float(dims["h_in"]))
        ey = (jnp.where(y_rel == bcast(y0a_l, slab_h),
                        bcast(wy0_l, slab_h), 0.0)
              + jnp.where(y_rel == bcast(y0b_l, slab_h),
                          bcast(wy1_l, slab_h), 0.0)).astype(cdt)

        red = jnp.zeros((gc, lanes), jnp.float32)
        for y in range(slab_h):
            red = red + (rmix_ref[pl.ds(y * gc, gc), :]
                         * ey[y:y + 1, :]).astype(jnp.float32)
        acc = jnp.zeros((gc, t), jnp.float32)
        for i in range(p):
            acc = acc + red[:, i * t:(i + 1) * t]
        o_ref[0, g] = acc


def _mono_kernel(img_ref, aux_ref, o_ref, *, dims, n_tiles,
                 compute_dtype=jnp.bfloat16, ext_bf16=False):
    """All row-tiles of one image in ONE grid step: the tile loop is a
    static Python unroll, so y_lo is a compile-time constant (static
    sublane slices, no dynamic-slice setup) and the per-step shell cost
    is paid once per image instead of once per (image, tile).

    ext_bf16: build the (w_pad, lanes)/(slab_h, lanes) 2-hot broadcasts
    in bf16 — integer coords < 256 are exact in bf16 and the weights get
    cast to bf16 for the matmul anyway, so this halves the VPU vreg
    count of the build with no extra rounding (corner math stays f32 at
    (1, lanes))."""
    gc = dims["gc"]
    p = dims["p"]
    t = dims["t"]
    w_pad = dims["w_pad"]
    slab_h = dims["slab_h"]
    group = img_ref.shape[1]
    rows = slab_h * gc
    lanes = p * t
    cdt = compute_dtype

    def corners(v, m, n_valid):
        v0 = jnp.floor(v)
        f = v - v0
        valid0 = ((v0 >= 0.0) & (v0 < n_valid)).astype(jnp.float32)
        valid1 = ((v0 + 1.0 >= 0.0) & (v0 + 1.0 < n_valid)
                  ).astype(jnp.float32)
        c0 = jnp.clip(v0, 0.0, n_valid - 1.0)
        c1 = jnp.clip(v0 + 1.0, 0.0, n_valid - 1.0)
        return c0, c1, (1.0 - f) * valid0 * m, f * valid1 * m

    bdt = cdt if ext_bf16 else jnp.float32

    def bcast(a, rows_n):
        return jnp.broadcast_to(a.astype(bdt), (rows_n, lanes))

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (w_pad, lanes),
                                      0).astype(bdt)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (slab_h, lanes),
                                      0).astype(bdt)

    for q in range(n_tiles):
        c_first = dims["half"] + dims["stride"] * dims["tr"] * q
        y_lo = int(np.clip(c_first - dims["window"] - 1, 0,
                           dims["h_eff"] - slab_h))
        y_rel = iota_y + jnp.asarray(y_lo, bdt)
        for g in range(group):
            sl = img_ref[0, g, y_lo * gc:y_lo * gc + rows, :].astype(cdt)
            iy_l = aux_ref[0, g, q, 0:1, :]
            ix_l = aux_ref[0, g, q, 1:2, :]
            m_l = aux_ref[0, g, q, 2:3, :]

            x0a_l, x0b_l, wx0_l, wx1_l = corners(ix_l, m_l,
                                                 float(dims["w_in"]))
            ext = (jnp.where(iota_x == bcast(x0a_l, w_pad),
                             bcast(wx0_l, w_pad), jnp.asarray(0, bdt))
                   + jnp.where(iota_x == bcast(x0b_l, w_pad),
                               bcast(wx1_l, w_pad),
                               jnp.asarray(0, bdt))).astype(cdt)
            rmix = jax.lax.dot_general(
                sl, ext, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdt)

            y0a_l, y0b_l, wy0_l, wy1_l = corners(iy_l, 1.0,
                                                 float(dims["h_in"]))
            ey = (jnp.where(y_rel == bcast(y0a_l, slab_h),
                            bcast(wy0_l, slab_h), jnp.asarray(0, bdt))
                  + jnp.where(y_rel == bcast(y0b_l, slab_h),
                              bcast(wy1_l, slab_h),
                              jnp.asarray(0, bdt))).astype(cdt)

            red = jnp.zeros((gc, lanes), jnp.float32)
            for y in range(slab_h):
                red = red + (rmix[y * gc:(y + 1) * gc, :]
                             * ey[y:y + 1, :]).astype(jnp.float32)
            acc = jnp.zeros((gc, t), jnp.float32)
            for i in range(p):
                acc = acc + red[:, i * t:(i + 1) * t]
            o_ref[0, g, :, q * t:(q + 1) * t] = acc


def _chunk_kernel(img_ref, aux_ref, o_ref, rmix_ref, *, dims, ch,
                  compute_dtype=jnp.bfloat16, ext_bf16=False):
    """ch row-tiles per grid step (grid (n, n_tiles//ch), tile loop a
    static unroll with dynamic y_lo like the production kernel).  Sits
    between the production 1-tile/step kernel and the mono variant —
    if the ~6.9 ms base shell is per-grid-step block traffic this
    collapses ~1/ch of it while keeping pipelining; if it compiles like
    mono it stays flat."""
    gc = dims["gc"]
    p = dims["p"]
    t = dims["t"]
    w_pad = dims["w_pad"]
    slab_h = dims["slab_h"]
    group = img_ref.shape[1]
    rows = slab_h * gc
    lanes = p * t
    cdt = compute_dtype
    bdt = cdt if ext_bf16 else jnp.float32

    def corners(v, m, n_valid):
        v0 = jnp.floor(v)
        f = v - v0
        valid0 = ((v0 >= 0.0) & (v0 < n_valid)).astype(jnp.float32)
        valid1 = ((v0 + 1.0 >= 0.0) & (v0 + 1.0 < n_valid)
                  ).astype(jnp.float32)
        c0 = jnp.clip(v0, 0.0, n_valid - 1.0)
        c1 = jnp.clip(v0 + 1.0, 0.0, n_valid - 1.0)
        return c0, c1, (1.0 - f) * valid0 * m, f * valid1 * m

    # comparisons stay f32 (Mosaic rejects bf16 cmpf on this target);
    # ext_bf16 only shrinks the WEIGHT broadcasts to bf16 vregs
    def bcast(a, rows_n):
        return jnp.broadcast_to(a, (rows_n, lanes))

    def bcast_w(a, rows_n):
        return jnp.broadcast_to(a.astype(bdt), (rows_n, lanes))

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (w_pad, lanes),
                                      0).astype(jnp.float32)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (slab_h, lanes),
                                      0).astype(jnp.float32)

    for j in range(ch):
        q = pl.program_id(1) * ch + j
        c_first = dims["half"] + dims["stride"] * dims["tr"] * q
        y_lo = jnp.clip(c_first - dims["window"] - 1, 0,
                        dims["h_eff"] - slab_h)
        y_rel = iota_y + y_lo.astype(jnp.float32)
        for g in range(group):
            sl = img_ref[0, g, pl.ds(y_lo * gc, rows), :].astype(cdt)
            iy_l = aux_ref[0, g, j, 0:1, :]
            ix_l = aux_ref[0, g, j, 1:2, :]
            m_l = aux_ref[0, g, j, 2:3, :]

            x0a_l, x0b_l, wx0_l, wx1_l = corners(ix_l, m_l,
                                                 float(dims["w_in"]))
            ext = (jnp.where(iota_x == bcast(x0a_l, w_pad),
                             bcast_w(wx0_l, w_pad), jnp.asarray(0, bdt))
                   + jnp.where(iota_x == bcast(x0b_l, w_pad),
                               bcast_w(wx1_l, w_pad),
                               jnp.asarray(0, bdt))).astype(cdt)
            rmix_ref[...] = jax.lax.dot_general(
                sl, ext, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdt)

            y0a_l, y0b_l, wy0_l, wy1_l = corners(iy_l, 1.0,
                                                 float(dims["h_in"]))
            ey = (jnp.where(y_rel == bcast(y0a_l, slab_h),
                            bcast_w(wy0_l, slab_h), jnp.asarray(0, bdt))
                  + jnp.where(y_rel == bcast(y0b_l, slab_h),
                              bcast_w(wy1_l, slab_h),
                              jnp.asarray(0, bdt))).astype(cdt)

            red = jnp.zeros((gc, lanes), jnp.float32)
            for y in range(slab_h):
                red = red + (rmix_ref[pl.ds(y * gc, gc), :]
                             * ey[y:y + 1, :]).astype(jnp.float32)
            acc = jnp.zeros((gc, t), jnp.float32)
            for i in range(p):
                acc = acc + red[:, i * t:(i + 1) * t]
            o_ref[0, g, :, j * t:(j + 1) * t] = acc


def run_chunk(x, off, m, stride, window, ch, ext_bf16=False):
    n = x.shape[0]
    group = 4
    d = _win_dims(x.shape, off.shape, 3, stride, 1, 1, group, window)
    img, aux, _ = _prepare(x, off, m, 3, stride, 1, 1, group, 1.0, window,
                           jnp.bfloat16)
    gc, p, t = d["gc"], d["p"], d["t"]
    n_tiles = d["n_tiles"]
    assert n_tiles % ch == 0, (n_tiles, ch)
    rows = d["slab_h"] * gc
    return pl.pallas_call(
        functools.partial(_chunk_kernel, dims=d, ch=ch, ext_bf16=ext_bf16),
        grid=(n, n_tiles // ch),
        in_specs=[
            pl.BlockSpec((1, group, d["h_eff"] * gc, d["w_pad"]),
                         lambda i, q: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, ch, 3, p * t),
                         lambda i, q: (i, 0, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, gc, ch * t),
                               lambda i, q: (i, 0, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, group, gc, n_tiles * t),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, p * t), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(img, aux)


def run_mono(x, off, m, stride, window, ext_bf16=False):
    n = x.shape[0]
    group = 4
    d = _win_dims(x.shape, off.shape, 3, stride, 1, 1, group, window)
    img, aux, _ = _prepare(x, off, m, 3, stride, 1, 1, group, 1.0, window,
                           jnp.bfloat16)
    gc, p, t = d["gc"], d["p"], d["t"]
    n_tiles = d["n_tiles"]
    return pl.pallas_call(
        functools.partial(_mono_kernel, dims=d, n_tiles=n_tiles,
                          ext_bf16=ext_bf16),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, group, d["h_eff"] * gc, d["w_pad"]),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, n_tiles, 3, p * t),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, gc, n_tiles * t),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, group, gc, n_tiles * t),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(img, aux)


def run_variant(x, off, m, stride, window, variant):
    if variant.endswith("_bf16"):
        # dead end, kept for the record (08-19): Mosaic on this target
        # rejects bf16 cmpf outright, and the f32-mask -> bf16-select
        # form fails too ("Invalid relayout ... vector<...xi1>":
        # an (8,128)-tiled i1 mask cannot feed a (16,128)-tiled bf16
        # select).  The 2-hot weight builds therefore stay f32.
        raise SystemExit(f"{variant}: bf16 2-hot builds do not compile "
                         "on this Mosaic target (see comment)")
    if variant == "mono":
        return run_mono(x, off, m, stride, window)
    if variant == "mono_bf16":
        return run_mono(x, off, m, stride, window, ext_bf16=True)
    if variant.startswith("chunk"):
        spec = variant[len("chunk"):]
        ext_bf16 = spec.endswith("_bf16")
        ch = int(spec.split("_")[0])
        return run_chunk(x, off, m, stride, window, ch, ext_bf16=ext_bf16)
    n = x.shape[0]
    group = 4
    d = _win_dims(x.shape, off.shape, 3, stride, 1, 1, group, window)
    img, aux, _ = _prepare(x, off, m, 3, stride, 1, 1, group, 1.0, window,
                           jnp.bfloat16)
    gc, p, t = d["gc"], d["p"], d["t"]
    rows = d["slab_h"] * gc
    return pl.pallas_call(
        functools.partial(_kernel, dims=d, variant=variant),
        grid=(n, d["n_tiles"]),
        in_specs=[
            pl.BlockSpec((1, group, d["h_eff"] * gc, d["w_pad"]),
                         lambda i, q: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 1, 3, p * t),
                         lambda i, q: (i, 0, q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, gc, t),
                               lambda i, q: (i, 0, 0, q),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, group, gc, d["n_tiles"] * t),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, p * t), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(img, aux)


def bench(fn, args, steps=32, reps=3):
    def loop(n):
        @jax.jit
        def run(*a):
            def body(i, carry):
                c, x0 = carry
                out = fn(x0, *a[1:])
                s = jnp.sum(out.astype(jnp.float32)) * 1e-12
                return (c + s, x0 + s.astype(x0.dtype))
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
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    g, p, window, stride = 4, 9, 4, 2
    h = 64
    ho = h // stride
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, h, c)), jnp.float32)
    off = jnp.asarray(rng.normal(size=(b, ho, ho, g * p * 2)) * 2,
                      jnp.float32)
    m = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(b, ho, ho, g, p)), jnp.float32),
        axis=-1).reshape(b, ho, ho, g * p)

    def prep_only(a):
        img, aux, _ = _prepare(a, off, m, 3, stride, 1, 1, g, 1.0, window,
                               jnp.bfloat16)
        return jnp.sum(img.astype(jnp.float32)) + jnp.sum(aux)

    variants = (sys.argv[3].split(",") if len(sys.argv) > 3
                else ("full", "base"))

    if "verify" in variants:
        # numerics: chunk/mono layouts must match the production kernel
        from givepose_tpu.ops.dcnv3_window_pallas import (
            dcnv3_windowed_pallas)
        d = _win_dims(x[:4].shape, off[:4].shape, 3, stride, 1, 1, g,
                      window)
        ref = dcnv3_windowed_pallas(x[:4], off[:4], m[:4], 3, stride, 1,
                                    1, g, 1.0, window)
        for v in variants:
            if v == "verify":
                continue
            out = run_variant(x[:4], off[:4], m[:4], stride, window, v)
            img4 = (out[..., :d["q_pix"]].transpose(0, 3, 1, 2)
                    .reshape(4, d["h_out"], d["w_out"], c))
            err = float(jnp.max(jnp.abs(img4 - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
            print(f"{v:12s} vs prod: max abs err {err:.5f} "
                  f"(ref max {scale:.2f})", flush=True)
            assert err <= 0.02 * scale, (v, err)
        variants = [v for v in variants if v != "verify"]

    res = {"prep_only": bench(prep_only, (x,))}
    print(f"{'prep_only':10s}: {res['prep_only']*1e3:7.3f} ms", flush=True)
    for variant in variants:
        res[variant] = bench(
            lambda a, v=variant: run_variant(a, off, m, stride, window, v),
            (x,))
        print(f"{variant:10s}: {res[variant]*1e3:7.3f} ms", flush=True)
    if "full" in res:
        for k in res:
            if k != "full":
                print(f"{k+'-vs-full':26s}: "
                      f"{(res[k]-res['full'])*1e3:+7.3f} ms")


if __name__ == "__main__":
    main()
