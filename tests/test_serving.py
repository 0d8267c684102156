"""AOT serving export (eval/serving.py + cli/export.py).

The artifact must (a) roundtrip through serialize/deserialize, (b) hold
no weights (params travel as call arguments), and (c) reproduce
jit(model.apply) — the exported StableHLO is the same trace, so it is
compared against the jitted forward (eager apply differs from any
compiled path by XLA fusion reassociation, ~2e-6 abs on f32).
"""

import os

import numpy as np
import jax

from givepose_tpu.core.config import ModelConfig
from givepose_tpu.eval.serving import (
    example_serving_batch,
    export_posenet,
    load_exported,
    load_exported_file,
    save_exported,
    serving_batch_spec,
)
from givepose_tpu.models import PoseNet


def _tiny_setup(batch=2, img=64, **cfg_kw):
    cfg = ModelConfig(compute_dtype="float32", **cfg_kw)
    model = PoseNet(cfg=cfg, backbone_variant="tiny")
    batch_d = example_serving_batch(batch, img_size=img)
    variables = model.init(jax.random.PRNGKey(0), batch_d)
    return cfg, model, variables, batch_d


def test_export_roundtrip_matches_apply(tmp_path):
    cfg, model, variables, batch = _tiny_setup()
    blob = export_posenet(variables, cfg=cfg, backbone_variant="tiny",
                          batch_size=2, img_size=64, platforms=("cpu",))
    # weights are call args, not baked constants: ConvNeXt-tiny is ~28 M
    # params (>100 MB f32) — the artifact must be orders smaller
    assert len(blob) < 5 * 1024 * 1024, len(blob)

    path = os.path.join(tmp_path, "posenet_tiny.jaxexp")
    save_exported(path, blob)
    fn = load_exported_file(path)

    # compare against the jitted forward — the same compilation path the
    # export traces; eager apply differs by fusion reassociation (~2e-6)
    want = jax.jit(model.apply)(variables, batch)
    got = fn(variables, batch)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_export_shape_level_variables(tmp_path):
    """cli/export.py path: eval_shape variables (no real weights) must
    produce the same artifact as concrete ones."""
    cfg, model, variables, batch = _tiny_setup()
    var_spec = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))
    blob = export_posenet(var_spec, cfg=cfg, backbone_variant="tiny",
                          batch_size=2, img_size=64, platforms=("cpu",))
    fn = load_exported(blob)
    got = fn(variables, batch)
    want = model.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(got["trans"]),
                               np.asarray(want["trans"]),
                               rtol=1e-6, atol=1e-6)


def test_export_multiplatform_dcnv3_resolves_impl(tmp_path):
    """A (cpu,tpu) export of a dcnv3 config must not bake the export
    host's backend choice in: dcn_impl='auto' is forced to the portable
    'xla' path (eval/serving.py), so the artifact loads and runs on the
    CPU host instead of failing on a Mosaic custom call."""
    cfg, model, variables, batch = _tiny_setup(use_dcn="dcnv3")
    blob = export_posenet(variables, cfg=cfg, backbone_variant="tiny",
                          batch_size=2, img_size=64,
                          platforms=("cpu", "tpu"))
    fn = load_exported(blob)
    got = fn(variables, batch)
    assert np.isfinite(np.asarray(got["rot"])).all()


def test_serving_batch_spec_matches_example():
    spec = serving_batch_spec(4, img_size=64)
    ex = example_serving_batch(4, img_size=64)
    assert set(spec) == set(ex)
    for k in spec:
        assert spec[k].shape == ex[k].shape, k
        assert spec[k].dtype == ex[k].dtype, k


def test_export_cli(tmp_path, capsys):
    from givepose_tpu.cli.export import main
    out = os.path.join(tmp_path, "posenet.jaxexp")
    main(["--out", out, "--batch_size", "2", "--img_size", "64",
          "--backbone", "tiny", "--compute_dtype", "float32",
          "--platforms", "cpu"])
    assert os.path.exists(out)
    assert "exported" in capsys.readouterr().out
    # validation variables must match the CLI's exported config
    # (default --use_dcn '': plain-conv MAPEncoder param tree)
    cfg, model, variables, batch = _tiny_setup(use_dcn="", dcn_window=0)
    fn = load_exported_file(out)
    got = fn(variables, batch)
    assert np.isfinite(np.asarray(got["rot"])).all()
