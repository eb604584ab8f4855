from tpugan.io import convert
from tpugan.io.checkpoint import save_checkpoint, load_checkpoint, latest_step

__all__ = ["convert", "save_checkpoint", "load_checkpoint", "latest_step"]
