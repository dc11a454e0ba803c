"""Token sampling.

The reference has exactly one sampler — greedy argmax with a per-token D2H
copy (kuiper/source/sampler/argmax_sampler.cpp, cuda/argmax_kernel.cu:80-84).
Here sampling runs on device inside the jitted step (no sync per token) and
adds temperature / top-k / top-p, which the reference lacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_greedy(logits):
    """logits: [..., vocab] -> int32 token ids [...]. Stays on device."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_token(
    logits,
    rng_key,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """General sampler. temperature<=0 means greedy. Shapes: logits [..., V]."""
    if temperature <= 0.0:
        return sample_greedy(logits)
    logits = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while cumulative prob (exclusive) < top_p
        keep = cum - probs < top_p
        cutoff = jnp.max(jnp.where(keep, sorted_logits, -jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng_key, logits, axis=-1).astype(jnp.int32)
