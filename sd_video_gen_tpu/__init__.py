"""sd-video-gen-tpu: TPU-native framework for video prediction in SD latent space.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch codebase (jeremy-collins/sd-video-gen): frozen SD-VAE latent video
tokens, an autoregressive seq2seq frame transformer, partial-denoise DDIM
cleanup with the SD UNet, and FVD evaluation via I3D -- all designed for
TPU hardware (bf16 MXU matmuls, lax.scan rollouts, jax.sharding meshes)
rather than translated from CUDA/torch.
"""

__version__ = "0.1.0"
