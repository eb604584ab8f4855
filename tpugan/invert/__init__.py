from tpugan.invert.embedding import EmbeddingConfig, make_embedder
from tpugan.invert.edit import edit_latent, load_direction

__all__ = ["EmbeddingConfig", "make_embedder", "edit_latent", "load_direction"]
