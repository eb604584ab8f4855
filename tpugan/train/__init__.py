from tpugan.train.e_align import (
    EncoderTrainState,
    SynthBatch,
    attention_crops,
    make_train_step,
    build_stylegan1_pipeline,
)

__all__ = [
    "EncoderTrainState",
    "SynthBatch",
    "attention_crops",
    "make_train_step",
    "build_stylegan1_pipeline",
]
