"""Rotary position embeddings, both reference pairing conventions.

Reference: kuiper/source/op/kernels/cpu/rope_kernel.cpp —
  llama2 (#else branch): adjacent pairs (i, i+1), freq = theta^-( (i%hd) / hd )
  llama3/qwen2 branches: half-split pairs (i, i+hd/2), cache read at index
  (head_dim*2) => freq = theta^-( 2j/hd ) for pair j.
Both share the same frequency vector over pair index j: theta^(-2j/hd); only
the pairing differs. The sin/cos cache is precomputed once per model
(reference sin_cos_cache_calc, llama3.cpp:132-141) in fp32.
"""

import math

import jax.numpy as jnp

from ..config import ROPE_HALF, ROPE_INTERLEAVED, RopeScaling


def scale_inv_freq(inv_freq, scaling: RopeScaling):
    """Frequency-dependent RoPE scaling (HF Llama-3.x "llama3" rope_type, also
    "linear"). Mirrors transformers' _compute_llama3_parameters: low-frequency
    components (long wavelengths) divide by `factor`, high-frequency components
    pass through, a smooth ramp interpolates between the two bands."""
    if scaling is None:
        return inv_freq
    if scaling.rope_type == "linear":
        return inv_freq / scaling.factor
    assert scaling.rope_type == "llama3", scaling.rope_type
    old_len = float(scaling.original_max_position_embeddings)
    low_wavelen = old_len / scaling.low_freq_factor
    high_wavelen = old_len / scaling.high_freq_factor
    wavelen = 2.0 * math.pi / inv_freq
    scaled = jnp.where(wavelen > low_wavelen, inv_freq / scaling.factor, inv_freq)
    smooth = (old_len / wavelen - scaling.low_freq_factor) / (
        scaling.high_freq_factor - scaling.low_freq_factor
    )
    smoothed = (1.0 - smooth) * inv_freq / scaling.factor + smooth * inv_freq
    medium = jnp.logical_and(wavelen >= high_wavelen, wavelen <= low_wavelen)
    return jnp.where(medium, smoothed, scaled)


def rope_cache(seq_len: int, head_dim: int, theta: float,
               scaling: RopeScaling | None = None):
    """Returns (sin, cos), each [seq_len, head_dim // 2], fp32."""
    j = jnp.arange(0, head_dim, 2, dtype=jnp.float32)
    inv_freq = 1.0 / (theta ** (j / head_dim))
    inv_freq = scale_inv_freq(inv_freq, scaling)
    t = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.sin(t), jnp.cos(t)


def apply_rope(x, sin, cos, style: str):
    """Rotate x: [..., T, H, head_dim] with sin/cos gathered per position:
    sin/cos have shape broadcastable to [..., T, 1, head_dim//2]."""
    if style == ROPE_HALF:
        half = x.shape[-1] // 2
        x1 = x[..., :half].astype(jnp.float32)
        x2 = x[..., half:].astype(jnp.float32)
        out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    elif style == ROPE_INTERLEAVED:
        xe = x[..., 0::2].astype(jnp.float32)
        xo = x[..., 1::2].astype(jnp.float32)
        oe = xe * cos - xo * sin
        oo = xe * sin + xo * cos
        out = jnp.stack([oe, oo], axis=-1).reshape(x.shape)
    else:
        raise ValueError(f"unknown rope style {style!r}")
    return out.astype(x.dtype)


def gather_rope(sin, cos, positions):
    """Gather per-token sin/cos. positions: [B, T] int32 ->
    ([B, T, 1, hd/2], [B, T, 1, hd/2]) ready to broadcast over heads."""
    s = sin[positions][..., None, :]
    c = cos[positions][..., None, :]
    return s, c
