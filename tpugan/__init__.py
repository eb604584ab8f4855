"""tpugan — TPU-native GAN encoders & inversion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
disanda/Deep-GAN-Encoders ("Improving GAN inversion via fine-tuning GAN
encoders", MTV-TSA): frozen StyleGANv1/v2, PGGAN and BigGAN-deep generators,
mirrored trainable encoders, self-supervised encoder training with
multi-term image/latent losses, real-image inversion, latent editing and a
PSNR/SSIM/LPIPS/MSE/cosine evaluation harness.

Conventions (deliberately different from the PyTorch reference):
  * all image tensors are NHWC (TPU conv layout), range [-1, 1]
  * randomness is explicit (jax.random keys), never global state
  * everything hot runs under jit; Pallas kernels back the FIR-resample,
    fused noise/bias/act and attention paths on TPU with jnp fallbacks
  * parallelism is jax.sharding Mesh + NamedSharding (data and spatial
    axes), not per-process device code
"""

__version__ = "0.1.0"
