"""Tests for the int8 W8A8 serving path (models/quant.py +
ops/quant_matmul_pallas.py).  CPU CI runs the XLA formulation and the
Pallas kernel in interpret mode; the real-chip check lives in
``bench.py --check`` (see .claude/skills/verify)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from givepose_tpu.models.quant import QuantDense, make_dense
from givepose_tpu.ops.quant_matmul_pallas import (
    quant_dense,
    quant_matmul_pallas,
    quantize_weights,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestQuantMatmul:
    def test_xla_path_close_to_f32(self, rng):
        x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
        got = quant_dense(x, w, bias=b, out_dtype=jnp.float32)
        want = x @ w + b
        rel = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert rel < 0.02, rel

    def test_pallas_interpret_matches_xla(self, rng):
        x = jnp.asarray(rng.normal(size=(48, 192)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(192, 160)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(160,)), jnp.float32)
        wq, ws = quantize_weights(w)
        got = quant_matmul_pallas(x, wq, ws, bias=b, act="gelu_tanh",
                                  out_dtype=jnp.float32, interpret=True)
        # XLA formulation of the same math
        xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                         1e-8) / 127.0
        xq = jnp.round(x / xs).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        want = nn.gelu(acc.astype(jnp.float32) * xs * ws + b,
                       approximate=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_gamma_fold(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
        got = quant_dense(x, w, gamma=g, out_dtype=jnp.float32)
        want = (x @ w) * g
        rel = float(jnp.max(jnp.abs(got - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert rel < 0.02, rel


class TestQuantDense:
    def test_param_tree_interchange(self, rng):
        x = jnp.asarray(rng.normal(size=(8, 96)), jnp.float32)
        dense = nn.Dense(48, param_dtype=jnp.float32)
        qdense = QuantDense(48, dtype=jnp.float32)
        v = dense.init(jax.random.PRNGKey(0), x)
        ref = dense.apply(v, x)
        got = qdense.apply(v, x)
        rel = float(jnp.max(jnp.abs(got - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert rel < 0.02
        # and the reverse: params born from QuantDense feed Dense
        v2 = qdense.init(jax.random.PRNGKey(1), x)
        dense.apply(v2, x)

    def test_make_dense_dispatch(self):
        assert isinstance(make_dense(True, 8, jnp.float32), QuantDense)
        assert isinstance(make_dense(False, 8, jnp.float32), nn.Dense)


class TestQuantBackbone:
    def test_convnext_quant_close_and_checkpoint_compatible(self, rng):
        from givepose_tpu.models.convnext import ConvNeXt

        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        # quant_min_dim below both stage widths so EVERY block takes the
        # fused int8 path (the default 512 would silently activate zero
        # blocks at these test dims and compare identical models)
        kw = dict(depths=(1, 1), dims=(32, 64), quant_min_dim=32)
        net = ConvNeXt(quant=False, **kw)
        qnet = ConvNeXt(quant=True, **kw)
        v = net.init(jax.random.PRNGKey(0), x)
        # fresh-init layer scale is 1e-6, which suppresses the MLP branch
        # (and with it the int8 noise) below float noise — a trained net
        # has O(1) gammas.  Set them to 1 in the SHARED tree so the
        # activation check below can actually see the quantized path.
        import flax
        flat = flax.traverse_util.flatten_dict(v["params"])
        flat = {k: (np.ones_like(val) if k[-1] == "gamma" else val)
                for k, val in flat.items()}
        v = {"params": flax.traverse_util.unflatten_dict(flat)}
        ref = np.asarray(net.apply(v, x), np.float32)
        got = np.asarray(qnet.apply(v, x), np.float32)   # same tree!
        rel = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        # residual-dominated blocks keep quant noise small...
        assert rel < 0.05, rel
        # ...but nonzero: proves the int8 path actually ran
        assert rel > 1e-6, "quant path did not activate"

    def test_quant_branch_rejects_training(self, rng):
        from givepose_tpu.models.convnext import ConvNeXt

        x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
        qnet = ConvNeXt(quant=True, depths=(1,), dims=(32,),
                        quant_min_dim=32)
        v = qnet.init(jax.random.PRNGKey(0), x)
        with pytest.raises(AssertionError, match="serving mode"):
            qnet.apply(v, x, deterministic=False)
