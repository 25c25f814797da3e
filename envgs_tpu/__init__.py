"""envgs_tpu — a TPU-native (JAX/XLA/Pallas) reflective-scene Gaussian-surfel framework.

Re-implements the full capability surface of zju3dv/EnvGS (CVPR 2025) — dual
2D-Gaussian-surfel sets (base rasterized / environment ray-traced along reflected
rays), adaptive density control, the EasyVolcap-style config/registry engine,
dataset pipeline, trainer, and evaluator — as a brand-new TPU-first design:

- compute path: pure-functional JAX with fused Pallas kernels for the tile
  rasterizer and the surfel ray tracer (custom VJPs, MXU-friendly chunked
  alpha blending);
- dynamic Gaussian counts become fixed-capacity padded pools with active
  masks, so every train step has static shapes and never recompiles;
- scale-out via `jax.sharding.Mesh` + pjit instead of DDP/NCCL.

Reference contracts are cited per-module as `/root/reference/<path>:<line>`.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry pipelines need f32 matmuls: the TPU default (bfloat16 passes) loses
# ~3 decimal digits in the 4x4 projection composes and ray math. Hot kernels
# opt into lower precision explicitly via preferred_element_type/precision.
_jax.config.update("jax_default_matmul_precision", "highest")
