"""True-int8 inference path: quantized ops executed as int8×int8→int32
MXU matmuls with per-channel rescale, instead of fake-quant fp32 matmuls.

The reference only ever *simulates* quantization (fake-quant fp32 matmuls,
linear.py:62-67 in hahnyuan/PTQ4ViT).  On TPU the int8 MXU path is both
faster (≈1.6× the fp32 rate on v5e, 4× the bf16 rate on paper) and exact:
``fake_quant(x)@fake_quant(w)ᵀ = (x_int@w_intᵀ)·(Δa·Δw)`` with int32
accumulation, so the int8 engine reproduces the fake-quant semantics up to
fp32 rounding of the final rescale (it is, if anything, *more* exact).

Supported layouts (= everything the shipped configs produce):
  * LinearQP with n_H == 1, n_a == 1: per-out-channel (n_V row blocks)
    weight scales factor out of the contraction;
  * twin post-GELU inputs: two int8 matmuls (positive/negative levels);
  * MatMulQP head-wise scales (n_V=n_H=1), incl. SoS A-operand as two
    unsigned level sets;
  * ConvQP channelwise/layerwise (patchify+matmul, activation FP when
    a_bit >= 32).

Weight levels are computed on the fly from the fp32 weights — a cheap
VPU pass XLA fuses with the operand load; pre-baked int8 weights for
external serving come from utils/integer.get_model_int_weight.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant import fakequant as fq
from ..quant.qparams import ConvQP, LinearQP, MatMulQP


def _int8_dot(x_int, w_intT):
    """(..., k) int8 @ (k, o) int8 -> (..., o) int32 on the MXU."""
    return jax.lax.dot_general(
        x_int, w_intT,
        dimension_numbers=(((x_int.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def linear_int8(x, w, b, qp: LinearQP, w_intT=None, w_scale=None):
    """int8 execution of a calibrated linear (matches apply_linear's
    fake-quant semantics; requires n_H == 1, n_a == 1).

    ``w_intT``/``w_scale`` (from ops/pack.pack_weights) skip the on-the-fly
    weight requantization and read 1-byte weights from HBM."""
    n_V, _, n_H, _ = qp.w_interval.shape
    if n_H != 1 or qp.a_interval.shape[0] != 1:
        raise NotImplementedError("int8 path needs n_H == 1 and n_a == 1")
    oc, ic = w.shape
    if w_intT is None:
        w4 = w.reshape(n_V, oc // n_V, ic)
        w_intT = fq.int_quant(w4, qp.w_interval[:, :, 0], qp.w_qmax) \
            .astype(jnp.int8).reshape(oc, ic).T
    if w_scale is None:
        # per-out-channel dequant scale (row-block v's interval)
        w_scale = jnp.broadcast_to(
            qp.w_interval[:, :, 0, 0], (n_V, oc // n_V)).reshape(oc)

    if qp.a_bit >= 32:
        # activation unquantized: fp32 x @ dequantized int weight
        y = jnp.matmul(x, w_intT.astype(jnp.float32) * w_scale[None, :],
                       preferred_element_type=jnp.float32)
        return y + b if b is not None else y

    a_scale = qp.a_interval[0, 0]
    if qp.postgelu:
        pos = jnp.clip(jnp.round(x / a_scale), 0, qp.a_qmax - 1) \
            .astype(jnp.int8)
        neg = jnp.clip(jnp.round(x / qp.a_neg_interval), -qp.a_qmax, 0) \
            .astype(jnp.int8)
        acc = (_int8_dot(pos, w_intT).astype(jnp.float32) * a_scale
               + _int8_dot(neg, w_intT).astype(jnp.float32)
               * qp.a_neg_interval)
    else:
        x_int = fq.int_quant(x, a_scale, qp.a_qmax).astype(jnp.int8)
        acc = _int8_dot(x_int, w_intT).astype(jnp.float32) * a_scale
    y = acc * w_scale
    return y + b if b is not None else y


def _blocked_operand_qp(qp: MatMulQP) -> bool:
    """True when an operand carries n_V/n_H (or sub-head n_G) block grids —
    scales then don't factor out of the contraction."""
    def blocked(iv):
        return (hasattr(iv, "ndim") and iv.ndim == 7
                and (iv.shape[3] != 1 or iv.shape[5] != 1))
    return blocked(qp.A_interval) or blocked(qp.B_interval)


def matmul_int8(a, b, qp: MatMulQP):
    """int8 execution of a calibrated A@B (head-wise scales)."""
    lead = a.shape[:-3]
    a4 = a.reshape((-1,) + a.shape[-3:])
    b4 = b.reshape((-1,) + b.shape[-3:])
    G = a4.shape[1]
    if _blocked_operand_qp(qp):
        # block-grid scales: execute the fake-quant semantics directly
        # (ablation surface only — no shipped config uses operand blocks)
        a_sim = qp.quant_A(a4)
        b_sim = qp.quant_B(b4)
        out = jnp.matmul(a_sim, b_sim, preferred_element_type=jnp.float32)
        return out.reshape(lead + out.shape[-3:])
    B_scale = qp.B_interval.reshape(G)
    b_int = jnp.clip(jnp.round(b4 / B_scale[None, :, None, None]),
                     -qp.B_qmax, qp.B_qmax - 1).astype(jnp.int8)

    def bmm(ai, bi):
        return jax.lax.dot_general(
            ai, bi, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)

    if qp.split is not None:
        # SoS: unsigned level sets for the two ranges (matmul.py:595-598)
        split = qp.split
        qm = qp.A_qmax
        hi = jnp.clip(jnp.round(jnp.clip(a4, split, 1.0) * (qm - 1)),
                      0, qm - 1).astype(jnp.int8)
        lo = jnp.clip(jnp.round(jnp.clip(a4, 0.0, split)
                                / qp.A_interval), 0, qm - 1).astype(jnp.int8)
        acc = (bmm(hi, b_int).astype(jnp.float32) / (qm - 1)
               + bmm(lo, b_int).astype(jnp.float32) * qp.A_interval)
        out = acc * B_scale[None, :, None, None]
    else:
        A_scale = qp.A_interval.reshape(G)
        a_int = jnp.clip(jnp.round(a4 / A_scale[None, :, None, None]),
                         -qp.A_qmax, qp.A_qmax - 1).astype(jnp.int8)
        out = bmm(a_int, b_int).astype(jnp.float32) \
            * (A_scale * B_scale)[None, :, None, None]
    return out.reshape(lead + out.shape[-3:])


def conv_int8(xp, w, b, qp: ConvQP, patch: int, w_intT=None, w_scale=None):
    """int8 patch-embed conv on pre-patchified input (B, N, ic*p*p)."""
    oc = w.shape[0]
    wm = w.reshape(oc, -1)
    if qp.blocked:
        # n_V x n_H PTQSL grid: column-block scales don't factor out of the
        # contraction; execute the fake-quant semantics directly (ablation
        # surface only — no shipped config produces blocked convs)
        w_sim = fq.fake_quant_weight_blocked(wm, qp.w_interval, qp.w_qmax)
        x_sim = (xp if (qp.a_bit >= 32 or qp.a_interval is None)
                 else fq.fake_quant(xp, qp.a_interval, qp.a_qmax))
        y = jnp.matmul(x_sim, w_sim.T, preferred_element_type=jnp.float32)
        return y + b if b is not None else y
    if w_scale is None:
        w_scale = jnp.broadcast_to(
            qp.w_interval.reshape(-1, 1, 1, 1)[:, 0, 0, 0]
            if qp.w_interval.ndim else qp.w_interval, (oc,))
    if w_intT is None:
        w_intT = fq.int_quant(wm, w_scale[:, None], qp.w_qmax).T
    if qp.a_bit >= 32 or qp.a_interval is None:
        y = jnp.matmul(xp, w_intT.astype(jnp.float32) * w_scale[None, :],
                       preferred_element_type=jnp.float32)
    else:
        x_int = fq.int_quant(xp, qp.a_interval, qp.a_qmax).astype(jnp.int8)
        y = _int8_dot(x_int, w_intT.astype(jnp.int8)).astype(jnp.float32) \
            * (qp.a_interval * w_scale)
    return y + b if b is not None else y
