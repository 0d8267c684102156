from givepose_tpu.train.ranger import ranger
from givepose_tpu.train.schedule import flat_and_anneal
from givepose_tpu.train.step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)
