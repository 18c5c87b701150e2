"""TPU compute kernels: fused attention (Pallas flash), 2D RoPE, helpers."""
