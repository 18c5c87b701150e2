"""2D rotary position embedding (RoPE2D) as a fused jnp op.

Replaces the reference's CUDA extension
(``uniception/models/libs/croco/curope/kernels.cu`` + ``curope.cpp``; python
fallback ``libs/croco/pos_embed.py:109``) used by the CroCo encoder and
DUSt3R-style decoders. On TPU the whole computation is a handful of
elementwise multiplies that XLA fuses straight into the surrounding
attention — a dedicated kernel buys nothing, so this IS the TPU-native
equivalent of the native op.

Convention parity: head dim split in half — first half rotated by the
y-position frequencies, second half by x-position; each half uses the
"rotate_half" formulation with frequencies duplicated across both
half-of-half lanes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _cos_sin_table(d_half: int, max_pos: int, base: float):
    """Host-precomputed cos/sin tables, shape (max_pos, d_half)."""
    inv_freq = 1.0 / (base ** (np.arange(0, d_half, 2, dtype=np.float64) / d_half))
    t = np.arange(max_pos, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # (max_pos, d_half/2)
    freqs = np.concatenate([freqs, freqs], axis=-1)  # (max_pos, d_half)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope1d(tokens, pos1d, cos, sin):
    """tokens (B, N, H, Dh); pos1d (B, N) int; cos/sin (P, Dh)."""
    c = jnp.take(cos, pos1d, axis=0)[:, :, None, :].astype(tokens.dtype)
    s = jnp.take(sin, pos1d, axis=0)[:, :, None, :].astype(tokens.dtype)
    return tokens * c + _rotate_half(tokens) * s


def rope_2d(
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    base: float = 100.0,
    max_pos: int = 512,
) -> jnp.ndarray:
    """Apply 2D RoPE to attention tokens.

    Args:
        tokens: (B, N, H, D) q or k (D even; note (B, N, H, D) layout — the
            JAX attention convention, vs the reference's (B, H, N, D)).
        positions: (B, N, 2) int (y, x) token positions.
        base: frequency base (reference default 100.0).
        max_pos: static table length (>= max position + 1).

    Returns:
        tokens with rotary embedding applied, same shape/dtype.
    """
    d = tokens.shape[-1]
    assert d % 4 == 0, "head dim must be divisible by 4 for RoPE2D"
    cos_np, sin_np = _cos_sin_table(d // 2, max_pos, base)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    y, x = jnp.split(tokens, 2, axis=-1)
    y = _apply_rope1d(y, positions[..., 0], cos, sin)
    x = _apply_rope1d(x, positions[..., 1], cos, sin)
    return jnp.concatenate([y, x], axis=-1)


def make_rope2d(base: float = 100.0, max_pos: int = 512):
    """Factory returning a rope callable for the Attention modules."""

    def rope(tokens, positions):
        return rope_2d(tokens, positions, base=base, max_pos=max_pos)

    return rope


def patch_position_grid(batch: int, h: int, w: int) -> jnp.ndarray:
    """(B, h*w, 2) integer (y, x) positions (reference PositionGetter,
    uniception/models/utils/positional_encoding.py:8)."""
    y = jnp.arange(h, dtype=jnp.int32)
    x = jnp.arange(w, dtype=jnp.int32)
    grid = jnp.stack(jnp.meshgrid(y, x, indexing="ij"), axis=-1).reshape(-1, 2)
    return jnp.broadcast_to(grid, (batch, h * w, 2))
