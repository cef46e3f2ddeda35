"""Calibrated quantization parameters as immutable pytrees.

The reference holds quantization state as mutable attributes on nn.Module
subclasses with a 4-state ``mode`` machine (quant_layers/linear.py:33-44).
Here the state is explicit data: a :class:`LinearQP` / :class:`MatMulQP` /
:class:`ConvQP` pytree per quantized op, carried in a ``qstate`` dict that the
functional model forwards thread through.  ``None`` in place of a QP means
"raw FP32" — the structural difference lets XLA specialize the two paths at
trace time instead of branching at runtime.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import struct

from . import fakequant as fq


@struct.dataclass
class LinearQP:
    """Quantization parameters of a linear layer (reference
    PTQSLBatchingQuantLinear / PostGeluPTQSLBatchingQuantLinear,
    quant_layers/linear.py:349, :557)."""

    w_interval: Any                      # (n_V, 1, n_H, 1)
    a_interval: Any                      # (n_a, 1)
    a_neg_interval: Optional[Any] = None  # scalar; twin post-GELU only
    w_bit: int = struct.field(pytree_node=False, default=8)
    a_bit: int = struct.field(pytree_node=False, default=8)
    postgelu: bool = struct.field(pytree_node=False, default=False)

    @property
    def w_qmax(self) -> int:
        return fq.qmax_for_bit(self.w_bit)

    @property
    def a_qmax(self) -> int:
        return fq.qmax_for_bit(self.a_bit)

    def quant_weight(self, w):
        return fq.fake_quant_weight_blocked(w, self.w_interval, self.w_qmax)

    def quant_input(self, x):
        if self.a_bit >= 32:
            return x
        if self.postgelu:
            return fq.twin_quant_post_gelu(x, self.a_interval,
                                           self.a_neg_interval, self.a_qmax)
        return fq.fake_quant_act_grouped(x, self.a_interval, self.a_qmax)


@struct.dataclass
class GatedQP:
    """A QP whose application is switched by a TRACED boolean instead of the
    usual structural None-vs-QP dispatch.

    The structural switch makes every change of "which ops are quantized" a
    different traced program — exactly right for the production parallel
    paradigm (XLA specializes each mode), but fatal for sequential
    calibration (reference quant_calib.py:369), where op k is captured with
    ops 0..k-1 in quant_forward: a structurally-keyed capture would pay
    O(num_ops) slow remote compiles.  Wrapping every op's QP in a GatedQP
    keeps the qstate treedef CONSTANT across all sequential steps — ``on``
    flips from False to True as each op finishes — so the whole sequential
    run reuses ONE compiled capture executable (calib/capture.py
    sequential_capture_plan).

    ``qp`` must keep identical leaf shapes/dtypes across steps (template
    QPs are built with jax.eval_shape over the real search functions);
    ``on`` is a () bool array.  Only the capture path (QuantCtx
    linear/matmul/conv2d_patch with int8=False) understands GatedQP — the
    int8/fused serving paths never see one.
    """

    qp: Any
    on: Any


def apply_linear(x, w, b, qp: Optional[LinearQP]):
    """y = x @ w.T + b with optional fake-quant of w and x
    (reference linear.py:62-67)."""
    if qp is not None:
        w = qp.quant_weight(w)
        x = qp.quant_input(x)
    y = jnp.matmul(x, w.T, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y


@struct.dataclass
class MatMulQP:
    """Quantization parameters of an A@B op (reference
    PTQSLBatchingQuantMatMul / SoSPTQSLBatchingQuantMatMul,
    quant_layers/matmul.py:390, :578).

    For the SoS (post-Softmax) variant ``split`` is set and A is quantized
    with the twin-range formula; ``A_interval`` then equals
    ``split/(A_qmax-1)`` and is kept for export parity.
    """

    A_interval: Any                      # (1, n_G, 1, n_V, 1, n_H, 1) or scalar (SoS)
    B_interval: Any                      # (1, n_G, 1, n_V, 1, n_H, 1)
    split: Optional[Any] = None          # scalar; SoS only
    A_bit: int = struct.field(pytree_node=False, default=8)
    B_bit: int = struct.field(pytree_node=False, default=8)

    @property
    def A_qmax(self) -> int:
        return fq.qmax_for_bit(self.A_bit)

    @property
    def B_qmax(self) -> int:
        return fq.qmax_for_bit(self.B_bit)

    def quant_A(self, a):
        if self.split is not None:
            return fq.sos_quant_softmax(a, self.split, self.A_qmax)
        return fq.fake_quant_matmul_operand(a, self.A_interval, self.A_qmax)

    def quant_B(self, b):
        return fq.fake_quant_matmul_operand(b, self.B_interval, self.B_qmax)


def apply_matmul(a, b, qp: Optional[MatMulQP]):
    """out = A_sim @ B_sim (reference matmul.py:140-145).  Operands are 4-D
    (batch, heads, rows, cols); higher-rank inputs are flattened to 4-D for
    the blocked quantizers and restored after."""
    if qp is not None:
        lead = a.shape[:-3]
        a4 = a.reshape((-1,) + a.shape[-3:])
        b4 = b.reshape((-1,) + b.shape[-3:])
        a = qp.quant_A(a4).reshape(lead + a.shape[-3:])
        b = qp.quant_B(b4).reshape(lead + b.shape[-3:])
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


@struct.dataclass
class ConvQP:
    """Quantization parameters of the patch-embedding conv (reference
    ChannelwiseBatchingQuantConv2d / BatchingEasyQuantConv2d,
    quant_layers/conv.py:444, :279).

    ``w_interval`` is (oc, 1, 1, 1) for the channelwise variant or a scalar
    for the layerwise one; ``a_interval`` is None when a_bit >= 32
    (activation quantization off — the shipped configs, configs/PTQ4ViT.py:54).
    With ``blocked=True`` (PTQSLQuantConv2d, conv.py:126-277) ``w_interval``
    is (n_V, 1, n_H, 1) over the flattened (oc, ic*kh*kw) weight.
    """

    w_interval: Any
    a_interval: Optional[Any] = None
    w_bit: int = struct.field(pytree_node=False, default=8)
    a_bit: int = struct.field(pytree_node=False, default=32)
    blocked: bool = struct.field(pytree_node=False, default=False)

    @property
    def w_qmax(self) -> int:
        return fq.qmax_for_bit(self.w_bit)

    @property
    def a_qmax(self) -> int:
        return fq.qmax_for_bit(self.a_bit)

    def quant_weight(self, w):
        if self.blocked:
            # n_V x n_H sub-layerwise grid on the flattened weight
            # (reference quant_weight_bias, conv.py:183-189)
            oc = w.shape[0]
            wm = fq.fake_quant_weight_blocked(
                w.reshape(oc, -1), self.w_interval, self.w_qmax)
            return wm.reshape(w.shape)
        # w: (oc, ic, kh, kw); interval broadcasts (channelwise or scalar)
        return fq.fake_quant(w, self.w_interval, self.w_qmax)

    def quant_input(self, x):
        if self.a_bit >= 32 or self.a_interval is None:
            return x
        return fq.fake_quant(x, self.a_interval, self.a_qmax)
