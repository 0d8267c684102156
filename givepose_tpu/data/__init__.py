from givepose_tpu.data.records import NocsRecordReader, Record
from givepose_tpu.data.preprocess import (
    preprocess_batch,
    collate_records,
    dzi_jitter,
)
from givepose_tpu.data.sampler import EpochSampler
from givepose_tpu.data.pipeline import TrainPipeline
