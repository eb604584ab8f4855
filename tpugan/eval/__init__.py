from tpugan.eval.metrics import psnr, ssim_uniform, pair_metrics, PairMetrics

__all__ = ["psnr", "ssim_uniform", "pair_metrics", "PairMetrics"]
