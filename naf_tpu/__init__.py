"""naf_tpu: a TPU-native JAX framework for zero-shot feature upsampling.

Re-designed from scratch for TPU (jax / XLA / Pallas / pjit) with the same
capabilities as the NAF reference (valeoai/NAF): cross-scale neighborhood
attention feature upsampling, baseline upsamplers, restoration models,
VFM backbones, training / evaluation harnesses and benchmarks.

Layout
------
- ``naf_tpu.ops``       exact numerical primitives (resize, pooling, window math,
                        neighborhood attention oracle)
- ``naf_tpu.kernels``   Pallas TPU kernels (fused cross-scale NA, adaptive conv)
- ``naf_tpu.nn``        layers (conv encoder, RoPE, cross attention)
- ``naf_tpu.models``    NAF + baseline upsamplers and restorers
- ``naf_tpu.backbones`` Flax ViT + pretrained-weight conversion
- ``naf_tpu.parallel``  mesh / sharding utilities (DP + spatial parallelism)
- ``naf_tpu.train``     optax training loops (upsampler distillation, denoising)
- ``naf_tpu.evals``     segmentation probing, video propagation, denoising evals
- ``naf_tpu.data``      datasets and transforms
- ``naf_tpu.config``    config-group composition (reference `config/` parity)
"""

__version__ = "0.1.0"

from naf_tpu.api import NAFUpsampler, load_naf_params, naf  # noqa: F401
