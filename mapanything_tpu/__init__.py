"""MapAnything-TPU: a TPU-native (JAX/XLA/Pallas) feed-forward metric 3D
reconstruction framework.

Re-designed from scratch for TPU hardware with the capability surface of the
reference MapAnything implementation (see /root/reference, a PyTorch/CUDA
codebase). The compute path is JAX + Pallas kernels; multi-chip scaling uses
``jax.sharding`` meshes with ICI collectives instead of NCCL.

Top-level layout (mirrors SURVEY.md section 1 layer map):
  - ``geometry``:   camera/ray/pointmap/quaternion math (pure jnp)
  - ``ops``:        Pallas kernels + fused attention primitives
  - ``models``:     encoders, info-sharing transformers, heads, adaptors,
                    and the flagship ``MapAnything`` model
  - ``parallel``:   mesh construction, sharding rules, context parallelism
  - ``data``:       WAI-format datasets, covisibility sampling, batching
  - ``train``:      losses, optimizer trees, train loop, checkpointing
  - ``utils``:      inference pipeline, image IO, metrics, COLMAP export
  - ``ba``:         bundle adjustment (Schur-complement CG over collectives)
"""

__version__ = "0.1.0"
