"""Int8 dynamic-quantization matmul layer for TPU serving.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate (394 vs
197 TOPS), and the ConvNeXt-B forward is dominated by the 1x1
expansion/projection matmuls (~21 ms of a 42 ms batch-64 step in bf16).
``QuantDense`` is a drop-in replacement for ``flax.linen.Dense`` (same
param names/shapes, so checkpoints are interchangeable) that runs the
contraction as W8A8:

  * weights: symmetric per-output-channel int8 (scales recomputed from
    the f32 master params each forward; O(C^2) elementwise, hoisted by
    XLA out of the token dimension);
  * activations: symmetric per-token (per spatial position) int8 from a
    dynamic amax — no calibration pass needed;
  * accumulation in int32 on the MXU, dequant fused into the epilogue.

This is an inference-speed feature, NOT used in training: gradients
through round() are zero.  Enable with ``ModelConfig.quant_dense=True``
(plumbed through PoseNet -> ConvNeXt).  The reference has no equivalent
(CUDA fp16/fp32 only); this is TPU-native headroom.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def quant_matmul_w8a8(x: jnp.ndarray, w: jnp.ndarray,
                      out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(..., K) x (K, N) int8-quantized matmul with f32 dequant.

    x is quantized per leading position (amax over K), w per output
    column (amax over K).  Zero rows/columns are guarded with a minimum
    scale so 0/0 never appears.
    """
    f32 = jnp.float32
    xf = x.astype(f32)
    wf = w.astype(f32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                          1e-8) / 127.0
    w_scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    xq = jnp.round(xf / x_scale).astype(jnp.int8)
    wq = jnp.round(wf / w_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(f32) * x_scale * w_scale).astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with a fused W8A8 MXU contraction
    (ops/quant_matmul_pallas on TPU; unfused XLA formulation on CPU).

    Param tree is identical to ``nn.Dense`` (kernel (K, N) f32 + bias),
    so a model trained with Dense can be served with QuantDense by
    flipping the config flag.  ``act`` fuses a GELU into the kernel
    epilogue (saves one full HBM round-trip over the 4C expansion).
    """

    features: int
    use_bias: bool = True
    act: str = "none"                 # none | gelu_tanh | gelu_exact
    dtype: Dtype = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from givepose_tpu.ops.quant_matmul_pallas import quant_dense

        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", self.bias_init,
                              (self.features,), jnp.float32)
        return quant_dense(x, kernel, bias=bias, act=self.act,
                           out_dtype=self.dtype)


def make_dense(quant: bool, features: int, dtype: Dtype,
               name: str | None = None, use_bias: bool = True,
               act: str = "none"):
    """Dense factory: nn.Dense (param_dtype f32) or QuantDense.

    When ``quant`` is False the caller applies its own activation;
    ``act`` only takes effect in the fused quant path.
    """
    if quant:
        return QuantDense(features, use_bias=use_bias, dtype=dtype,
                          act=act, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, name=name)
