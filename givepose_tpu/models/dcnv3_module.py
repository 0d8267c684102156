"""DCNv3 flax modules (NHWC).

Mirrors the reference module stack: ``DCNv3`` (ops_dcnv3/modules/dcnv3.py:
221-356 — input_proj, depthwise-conv offset/mask branch, core, output_proj)
and the ``DCNv3_C`` conv-layer wrapper (network/dcnv3.py:23-38 — 1x1 conv
then DCNv3 with stride) used by MAPEncoder.

Intentional deviation from the reference: with stride>1 the reference
computes offset/mask at FULL input resolution while its CUDA kernel
(src/cuda/dcnv3_cuda.cu:64-67) indexes them with H_out*W_out strides and no
shape check — silently reinterpreting the top rows of the full-res maps,
row-major, as the offset field.  Here offset/mask are computed at the
strided output positions (x1[:, ::s, ::s]), which is the intended
semantics; training adapts either way, and this form is shape-sound.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

import jax

from givepose_tpu.ops.dcnv3 import dcnv3_core
from givepose_tpu.ops.dcnv3_pallas import dcnv3_fast

Dtype = Any


class DCNv3(nn.Module):
    """Core deformable block, NHWC in/out at (H_out, W_out)."""

    channels: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 4
    offset_scale: float = 1.0
    impl: str = "auto"          # auto | pallas | xla
    gelu_exact: bool = False    # erf GELU in the offset branch (torch parity)
    # window > 0 clamps sampling to +-window px around each query (see
    # ops.dcnv3.clamp_to_window) and selects the windowed Pallas kernel
    # on TPU — ~4x faster than the unwindowed one.  0 = reference
    # semantics (unbounded offsets).
    window: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        assert c == self.channels
        p = self.kernel_size * self.kernel_size

        x_proj = nn.Dense(self.channels, dtype=self.dtype,
                          param_dtype=jnp.float32, name="input_proj")(x)

        # offset/mask branch: depthwise conv -> LN -> GELU
        # (reference modules/dcnv3.py:277-290 dw_conv).  The branch is
        # only consumed at the strided output positions, and LN/GELU are
        # pointwise, so at stride>1 the dwconv runs strided directly —
        # bit-identical to computing full-res then slicing ([::s] of a
        # SAME stride-1 conv == explicit-pad stride-s conv over the same
        # taps) at 1/s^2 the work (measured 1.6 ms of a 10 ms batch-128
        # DCNv3 layer before this).
        khalf = self.kernel_size // 2
        x1 = nn.Conv(self.channels, (self.kernel_size, self.kernel_size),
                     strides=(self.stride, self.stride),
                     padding=[(khalf, khalf), (khalf, khalf)],
                     feature_group_count=self.channels,
                     dtype=self.dtype, param_dtype=jnp.float32,
                     name="dw_conv")(x)
        x1 = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, dtype=self.dtype,
                          name="dw_norm")(x1)
        x1 = nn.gelu(x1, approximate=not self.gelu_exact)

        # zero-init offset/mask projections (reference _reset_parameters,
        # modules/dcnv3.py:308-316) so the block starts as a regular conv
        offset = nn.Dense(self.group * p * 2,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="offset")(x1)
        mask_logits = nn.Dense(self.group * p,
                               kernel_init=nn.initializers.zeros,
                               bias_init=nn.initializers.zeros,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="mask")(x1)
        nh, nw = mask_logits.shape[1:3]
        mask = nn.softmax(
            mask_logits.reshape(n, nh, nw, self.group, p).astype(jnp.float32),
            axis=-1).reshape(n, nh, nw, self.group * p).astype(self.dtype)

        # core sampling runs in f32 for accurate bilinear weights.
        # impl: 'pallas' = separable MXU/VPU kernel (TPU; bf16 matmul
        # rounding ~4e-3 relative), 'xla' = gather formulation (exact,
        # slow on TPU, fine on CPU), 'auto' = pallas on TPU else xla.
        impl = self.impl
        if impl == "auto":
            impl = ("pallas" if jax.default_backend() not in ("cpu",)
                    else "xla")
        kw = dict(kernel=self.kernel_size, stride=self.stride,
                  pad=self.pad, dilation=self.dilation, group=self.group,
                  offset_scale=self.offset_scale)
        if impl == "pallas" and self.window > 0:
            from givepose_tpu.ops.dcnv3_window_pallas import dcnv3_windowed
            core = dcnv3_windowed
            kw["window"] = self.window
        elif impl == "pallas":
            core = dcnv3_fast
        else:
            core = dcnv3_core
            if self.window > 0:
                kw["window"] = self.window
        # the windowed Pallas kernel pads/casts x to its bf16 compute
        # dtype itself, so feeding it the module-dtype tensor skips a
        # f32 materialization round trip (bit-identical when x_proj is
        # bf16); the xla/unwindowed cores keep the f32 input for exact
        # bilinear gathers.
        x_core = (x_proj if (impl == "pallas" and self.window > 0)
                  else x_proj.astype(jnp.float32))
        y = core(x_core,
                 offset.astype(jnp.float32),
                 mask.astype(jnp.float32), **kw).astype(self.dtype)
        return nn.Dense(self.channels, dtype=self.dtype,
                        param_dtype=jnp.float32, name="output_proj")(y)


class DCNv3Conv(nn.Module):
    """1x1 channel-projection conv then DCNv3 — the MAPEncoder conv layer
    (reference DCNv3_C, network/dcnv3.py:23-38)."""

    features: int
    stride: int = 1
    group: int = 4
    impl: str = "auto"
    gelu_exact: bool = False
    window: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (1, 1), use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="proj")(x)
        return DCNv3(self.features, stride=self.stride, group=self.group,
                     impl=self.impl, gelu_exact=self.gelu_exact,
                     window=self.window,
                     dtype=self.dtype, name="dcnv3")(y)
