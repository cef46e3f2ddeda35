"""Core fake-quantization primitives (pure functions, jit/vmap friendly).

These are the bit-exactness anchors of the framework: every quantizer in the
reference (quant_layers/linear.py, quant_layers/matmul.py, quant_layers/conv.py
in hahnyuan/PTQ4ViT) reduces to the formulas below.

Numerics notes (parity with the reference):
  * ``round`` is round-half-to-even in both torch and jnp.
  * symmetric int range is ``[-qmax, qmax-1]`` with ``qmax = 2**(bit-1)``
    (reference linear.py:47, matmul.py:36, conv.py:54).
  * scale ("interval") init is ``absmax / (qmax - 0.5)``
    (reference linear.py:88, conv.py:85, matmul.py:56).
  * the candidate grid has ``eq_n + 1`` entries but the reference's search
    loops only ever evaluate the first ``eq_n`` of them
    (reference linear.py:466-467, matmul.py:500-501); see
    :func:`candidate_grid` and the search engines.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def exact_div(x, c):
    """Division with IEEE true-division semantics even when ``c`` is a
    compile-time constant.

    XLA rewrites ``x / const`` into ``x * (1/const)`` during algebraic
    simplification; the reciprocal is 1 ulp off for divisors like
    ``qmax - 0.5``, which flips ``round()`` at quantization boundaries and
    diverges from the reference's (and eager JAX's) true division.  An
    optimization barrier on the divisor keeps the real divide.  Used for
    every division whose divisor can be a literal inside a jitted engine
    (interval inits, SoS rescales, the fixed post-GELU negative interval).
    """
    return x / jax.lax.optimization_barrier(jnp.asarray(c, jnp.float32))

# |min GELU(x)| quantization anchor for the fixed negative interval of the
# twin-uniform post-GELU quantizer (reference linear.py:320, linear.py:574).
GELU_NEG_CLIP = 0.16997124254703522


def qmax_for_bit(bit: int) -> int:
    """Symmetric quantization max level: 2**(bit-1)."""
    return 2 ** (bit - 1)


def candidate_grid(eq_alpha: float, eq_beta: float, eq_n: int) -> jnp.ndarray:
    """Scale-multiplier grid ``alpha + i*(beta-alpha)/n`` for ``i in [0, n]``.

    Returns ``eq_n + 1`` float32 multipliers.  NOTE: the reference generates
    all ``eq_n + 1`` candidates but its chunked search loops stop at index
    ``eq_n - 1`` (an off-by-one: the ``×beta`` candidate is never scored,
    reference linear.py:466).  The search engines in this package reproduce
    that behaviour by scoring only ``grid[:eq_n]``.
    """
    # computed in float64 then cast, to match the reference's
    # python-float list -> torch.tensor float32 conversion
    i = np.arange(eq_n + 1, dtype=np.float64)
    return jnp.asarray((eq_alpha + i * (eq_beta - eq_alpha) / eq_n)
                       .astype(np.float32))


def sos_split_grid(n: int = 20) -> jnp.ndarray:
    """Split-point candidates ``2**-i, i in [0, n)`` for the post-Softmax
    split-of-softmax quantizer (reference matmul.py:369, matmul.py:636)."""
    return 2.0 ** (-jnp.arange(n, dtype=jnp.float32))


# ---------------------------------------------------------------------------
# elementwise fake-quant
# ---------------------------------------------------------------------------

def int_quant(x, interval, qmax: int):
    """Integer levels of symmetric quantization: round(x/Δ) clipped to
    [-qmax, qmax-1].  Returned in the input dtype (not int8) so it can be fed
    straight back into arithmetic; cast for storage."""
    return jnp.clip(jnp.round(x / interval), -qmax, qmax - 1)


def fake_quant(x, interval, qmax: int):
    """Symmetric fake-quant: round(x/Δ)·Δ clipped to the int range
    (reference linear.py:47)."""
    return int_quant(x, interval, qmax) * interval


def minmax_interval(x, qmax: int):
    """Layerwise min-max scale init: absmax/(qmax-0.5) (reference linear.py:88)."""
    return exact_div(jnp.max(jnp.abs(x)), qmax - 0.5)


# ---------------------------------------------------------------------------
# blockwise fake-quant: linear weights / grouped activations
# ---------------------------------------------------------------------------

def blocked_weight_view(w, n_V: int, n_H: int):
    """(oc, ic) -> (n_V, oc//n_V, n_H, ic//n_H) block view (reference
    linear.py:154)."""
    oc, ic = w.shape
    return w.reshape(n_V, oc // n_V, n_H, ic // n_H)


def fake_quant_weight_blocked(w, interval, qmax: int):
    """Blockwise fake-quant of a (oc, ic) weight with interval of shape
    (n_V, 1, n_H, 1) (reference linear.py:152-155)."""
    n_V, _, n_H, _ = interval.shape
    oc, ic = w.shape
    w4 = blocked_weight_view(w, n_V, n_H)
    return (int_quant(w4, interval, qmax) * interval).reshape(oc, ic)


def blocked_weight_interval_init(w, n_V: int, n_H: int, qmax: int):
    """Blockwise absmax/(qmax-0.5) init, shape (n_V,1,n_H,1) (reference
    linear.py:232)."""
    w4 = blocked_weight_view(w, n_V, n_H)
    return exact_div(jnp.amax(jnp.abs(w4), axis=(1, 3), keepdims=True),
                     qmax - 0.5)


def grouped_act_view(x, n_a: int):
    """(..., ic) -> (..., n_a, ic//n_a) group view (reference linear.py:166)."""
    return x.reshape(*x.shape[:-1], n_a, x.shape[-1] // n_a)


def fake_quant_act_grouped(x, interval, qmax: int):
    """Grouped fake-quant of activations with interval shape (n_a, 1)
    (reference linear.py:164-169)."""
    n_a = interval.shape[0]
    xg = grouped_act_view(x, n_a)
    return (int_quant(xg, interval, qmax) * interval).reshape(x.shape)


def grouped_act_interval_init(x, n_a: int, qmax: int, signed: bool = True):
    """Per-group amax init over all leading dims + in-group dim, shape
    (n_a, 1).  ``signed=False`` reproduces the post-GELU positive init which
    takes amax WITHOUT abs (reference linear.py:597 vs linear.py:395)."""
    xg = grouped_act_view(x, n_a)
    v = jnp.abs(xg) if signed else xg
    axes = tuple(range(xg.ndim - 2)) + (xg.ndim - 1,)
    return exact_div(jnp.amax(v, axis=axes), qmax - 0.5)[:, None]


# ---------------------------------------------------------------------------
# twin-uniform post-GELU quantizer
# ---------------------------------------------------------------------------

def twin_quant_post_gelu(x, pos_interval, neg_interval, qmax: int):
    """Twin-uniform quantization of post-GELU activations: searched positive
    interval (per n_a group), fixed negative interval
    ``GELU_NEG_CLIP/qmax`` (reference linear.py:601-607).

    pos_interval: (n_a, 1); neg_interval: scalar.
    """
    n_a = pos_interval.shape[0]
    xg = grouped_act_view(x, n_a)
    x_pos = jnp.clip(jnp.round(xg / pos_interval), 0, qmax - 1) * pos_interval
    # neg_interval is a python-float-derived literal: exact_div keeps the
    # true division the reference computes
    x_neg = jnp.clip(jnp.round(exact_div(xg, neg_interval)), -qmax, 0) \
        * neg_interval
    return (x_pos + x_neg).reshape(x.shape)


# ---------------------------------------------------------------------------
# split-of-softmax (SoS) post-Softmax quantizer
# ---------------------------------------------------------------------------

def sos_quant_softmax(x, split, qmax: int):
    """Twin-range quantization of post-Softmax scores with a single split
    point.  Low region uses Δ=split/(qmax-1); high region Δ=1/(qmax-1).
    Reproduces the reference formula verbatim, including its additive overlap
    of the two ranges (reference matmul.py:595-598).
    """
    a_interval = exact_div(split, qmax - 1)
    x_high = exact_div(jnp.clip(jnp.round(jnp.clip(x, split, 1.0)
                                          * (qmax - 1)), 0, qmax - 1),
                       qmax - 1)
    x_low = jnp.clip(jnp.round(exact_div(jnp.clip(x, 0.0, split),
                                         a_interval)),
                     0, qmax - 1) * a_interval
    return x_high + x_low


# ---------------------------------------------------------------------------
# blocked 4-D matmul-operand quantizer (with ceil-div padding)
# ---------------------------------------------------------------------------

def matmul_block_shape(shape, n_G: int, n_V: int, n_H: int):
    """Ceil-div block sizes and pad amounts for a (B, G, R, C) operand
    (reference matmul.py:109-122).  Returns (crb_g, crb_r, crb_c,
    pad_g, pad_r, pad_c)."""
    _, G, R, C = shape
    crb_g = -(-G // n_G)
    crb_r = -(-R // n_V)
    crb_c = -(-C // n_H)
    return crb_g, crb_r, crb_c, crb_g * n_G - G, crb_r * n_V - R, crb_c * n_H - C


def fake_quant_matmul_operand(x, interval, qmax: int):
    """Blocked fake-quant of a (B, G, R, C) matmul operand with interval of
    shape (1, n_G, 1, n_V, 1, n_H, 1); pad -> block view -> quant -> unpad
    (reference matmul.py:124-138)."""
    _, n_G, _, n_V, _, n_H, _ = interval.shape
    B, G, R, C = x.shape
    crb_g, crb_r, crb_c, pad_g, pad_r, pad_c = matmul_block_shape(x.shape, n_G, n_V, n_H)
    xp = jnp.pad(x, ((0, 0), (0, pad_g), (0, pad_r), (0, pad_c)))
    xb = xp.reshape(B, n_G, crb_g, n_V, crb_r, n_H, crb_c)
    xq = int_quant(xb, interval, qmax) * interval
    xq = xq.reshape(B, n_G * crb_g, n_V * crb_r, n_H * crb_c)
    return xq[:, :G, :R, :C]


def matmul_operand_interval_init(x, n_G: int, n_V: int, n_H: int, qmax: int):
    """Blockwise absmax/(qmax-0.5) init for a (B, G, R, C) operand, shape
    (1, n_G, 1, n_V, 1, n_H, 1) (reference matmul.py:254)."""
    B, G, R, C = x.shape
    crb_g, crb_r, crb_c, pad_g, pad_r, pad_c = matmul_block_shape(x.shape, n_G, n_V, n_H)
    xp = jnp.pad(x, ((0, 0), (0, pad_g), (0, pad_r), (0, pad_c)))
    xb = xp.reshape(B, n_G, crb_g, n_V, crb_r, n_H, crb_c)
    # amax over (batch, crb_g, crb_r, crb_c) -> (1, n_G, 1, n_V, 1, n_H, 1)
    return exact_div(jnp.amax(jnp.abs(xb), axis=(0, 2, 4, 6), keepdims=True),
                     qmax - 0.5)
