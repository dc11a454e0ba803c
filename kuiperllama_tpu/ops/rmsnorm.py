"""RMSNorm.

Reference: kuiper/source/op/kernels/cpu/rmsnorm_kernel.cpp (mean-of-squares,
eps 1e-5 / 1e-6 per family) and cuda/rmsnorm_kernel.cu:4-78. On TPU this is a
plain jnp expression — XLA fuses it into the neighbouring matmul; a hand
kernel would only add HBM round-trips. Accumulation is fp32 regardless of the
activation dtype (parity with the reference's all-fp32 math).
"""

import jax.numpy as jnp
from jax import lax


def rmsnorm(x, weight, eps: float):
    """x: [..., dim], weight: [dim]. Returns x's dtype."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(ms + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)
