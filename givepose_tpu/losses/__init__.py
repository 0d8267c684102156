from givepose_tpu.losses.pose_loss import PoseLossFn, pnp_loss, scale_loss
