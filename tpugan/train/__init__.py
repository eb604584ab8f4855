from tpugan.train.e_align import (
    EncoderTrainState,
    SynthBatch,
    attention_crops,
    make_train_step,
    make_encode_fn,
    build_stylegan1_pipeline,
)
from tpugan.train.e_mis_align import make_mis_align_step

__all__ = [
    "EncoderTrainState",
    "SynthBatch",
    "attention_crops",
    "make_train_step",
    "make_encode_fn",
    "make_mis_align_step",
    "build_stylegan1_pipeline",
]
