"""Similarity metrics used to score scale-factor candidates.

Mirrors the six metrics of the reference (quant_layers/linear.py:399-424,
quant_layers/matmul.py:442-481, quant_layers/conv.py:322-351 in
hahnyuan/PTQ4ViT):

  cosine, pearson, L1_norm, L2_norm, linear_weighted_L2_norm,
  square_weighted_L2_norm, hessian.

All functions are pure and broadcast over arbitrary leading "candidate" and
"batch" axes; the norm-style metrics reduce the feature axis with a mean, the
cosine-style metrics reduce it inside the cosine.  Callers do the remaining
mean-over-middle-dims / sum-over-batch reductions (which must match the
reference's ordering exactly — see the search engines).
"""
from __future__ import annotations

import jax.numpy as jnp

_COS_EPS = 1e-8

METRICS = (
    "cosine",
    "pearson",
    "L1_norm",
    "L2_norm",
    "linear_weighted_L2_norm",
    "square_weighted_L2_norm",
    "hessian",
)


def cosine_similarity(a, b, axis: int = -1):
    """torch.nn.functional.cosine_similarity semantics:
    dot / max(|a|*|b|, eps) along ``axis``."""
    dot = jnp.sum(a * b, axis=axis)
    na = jnp.sqrt(jnp.sum(a * a, axis=axis))
    nb = jnp.sqrt(jnp.sum(b * b, axis=axis))
    return dot / jnp.maximum(na * nb, _COS_EPS)


def similarity(raw, sim, metric: str, raw_grad=None, axis: int = -1,
               reduce_feature: bool = True):
    """Candidate-scoring similarity along feature ``axis``.

    raw:  FP32 reference output, broadcastable against ``sim``.
    sim:  candidate-quantized output (extra leading candidate axis allowed).
    raw_grad: ∂L/∂(raw output) for the hessian metric; broadcastable
       against ``raw`` (reference linear.py:417-420).

    Norm-style metrics return ``mean(sim_elem, axis)`` when
    ``reduce_feature`` (reference linear.py:423); pass
    ``reduce_feature=False`` to get the elementwise map (used by the
    channelwise conv search, reference conv.py:498-524).
    """
    if metric == "cosine":
        return cosine_similarity(raw, sim, axis=axis)
    if metric == "pearson":
        ra = raw - jnp.mean(raw, axis=axis, keepdims=True)
        sa = sim - jnp.mean(sim, axis=axis, keepdims=True)
        return cosine_similarity(ra, sa, axis=axis)
    if metric == "L1_norm":
        s = -jnp.abs(raw - sim)
    elif metric == "L2_norm":
        s = -((raw - sim) ** 2)
    elif metric == "linear_weighted_L2_norm":
        s = -jnp.abs(raw) * (raw - sim) ** 2
    elif metric == "square_weighted_L2_norm":
        s = -((raw * (raw - sim)) ** 2)
    elif metric == "hessian":
        if raw_grad is None:
            raise ValueError("hessian metric requires raw_grad")
        s = -((raw_grad * (raw - sim)) ** 2)
    else:
        raise NotImplementedError(f"metric {metric} not implemented!")
    if reduce_feature:
        return jnp.mean(s, axis=axis)
    return s
