from tpugan.nn.layers import EqLinear, EqConv

__all__ = ["EqLinear", "EqConv"]
