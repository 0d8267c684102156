"""Subprocess entry for tests/test_distributed.py.

Runs N sharded train steps over the synthetic fixture using the REAL
multi-process pipeline pieces from cli/train.py — NocsRecordReader ->
collate -> on-device preprocess -> process_local_indices ->
shard_host_batch -> make_train_step — under an actual
``jax.distributed.initialize`` (Gloo CPU collectives), then saves the
final replicated params so the parent can assert the 2-process run is
numerically identical to the single-process run.

Args: <port> <process_id> <num_processes> <data_dir> <ivfc_dir> <out_npz>
"""

from __future__ import annotations

import random as pyrandom
import sys

GLOBAL_BS = 8
STEPS = 2


def main(argv):
    port, pid, nproc, data_dir, ivfc_dir, out_npz = argv

    import jax

    jax.config.update("jax_platforms", "cpu")
    if int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=int(nproc), process_id=int(pid))

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from givepose_tpu.core.config import Config, parse_overrides
    from givepose_tpu.core.mesh import (
        make_mesh,
        process_local_indices,
        shard_host_batch,
    )
    from givepose_tpu.data import (
        NocsRecordReader,
        collate_records,
        preprocess_batch,
    )
    from givepose_tpu.models import PoseNet
    from givepose_tpu.train import init_train_state, make_train_step

    cfg = parse_overrides(Config(), [
        "--dataset", "Real", "--dataset_dir", data_dir,
        "--data.ivfc_dir", ivfc_dir, "--img_size", "64",
        "--out_res", "16", "--model.compute_dtype", "float32",
        "--batch_size", str(GLOBAL_BS), "--train_size",
        str(GLOBAL_BS * STEPS), "--total_epoch", "1",
        "--warmup_iters", "1",
    ])

    reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
    n = len(reader)
    indices = np.arange(GLOBAL_BS * STEPS) % n
    local = process_local_indices(indices, GLOBAL_BS,
                                  process_id=jax.process_index(),
                                  num_processes=jax.process_count())
    local_bs = GLOBAL_BS // jax.process_count()

    def read_local_batch(step: int) -> dict:
        idx = local[step * local_bs:(step + 1) * local_bs]
        # fixed instance-pick rng per sample: determinism must not depend
        # on which process reads the record
        recs = [reader.read(int(i), pyrandom.Random(int(i)))
                for i in idx]
        return collate_records(recs)

    def build(raw, key):
        # deterministic preprocessing (zero DZI jitter, no color aug, no
        # mask deformation) so local slices equal the single-process
        # global batch rows regardless of batch composition
        out = preprocess_batch(
            key, {k: jnp.asarray(v) for k, v in raw.items()},
            img_size=64, out_res=16, train=True, color_aug_prob=0.0,
            mask_pro=0.0, dzi_scale_ratio=0.0, dzi_shift_ratio=0.0)
        return {k: np.asarray(v) for k, v in out.items()}

    mesh = make_mesh()
    model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
    pre_key = jax.random.PRNGKey(7)

    sample = build(read_local_batch(0), pre_key)
    state = init_train_state(model, cfg, sample)
    step_fn, _ = make_train_step(model, cfg, mesh=mesh)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    step_key = jax.random.PRNGKey(11)
    loss = float("nan")
    for t in range(STEPS):
        batch = shard_host_batch(mesh, build(read_local_batch(t), pre_key))
        state, metrics = step_fn(state, batch, step_key)
        loss = float(metrics["total_loss"])

    if jax.process_index() == 0:
        leaves = jax.tree_util.tree_leaves(state.params)
        np.savez(out_npz, loss=np.float32(loss),
                 **{f"p{i}": np.asarray(leaf)
                    for i, leaf in enumerate(leaves)})
    print(f"worker {pid}/{nproc}: done, loss={loss:.6f}")


if __name__ == "__main__":
    main(sys.argv[1:])
