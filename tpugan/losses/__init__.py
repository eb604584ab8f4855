from tpugan.losses.ssim import ssim
from tpugan.losses.space_loss import space_loss, SpaceLossInfo

__all__ = ["ssim", "space_loss", "SpaceLossInfo"]
