"""Integer export — bit-compatible with the reference's utils/integer.py
(hahnyuan/PTQ4ViT).

Weights: int8 ``round(w/Δ).clamp(-qmax, qmax-1)`` per block
(integer.py:8-18).  Activations: a pre-forward capture producing uint8 twin
formats (integer.py:44-110):

  * post-GELU twin (PostGelu linears): ``uint8 = (pos_levels + 128) +
    |neg_levels|`` — MSB acts as the sign bit (integer.py:56-68);
  * SoS post-Softmax (scores@V matmul A): ``uint8 = (high_levels + 128) +
    low_levels`` — MSB selects the large interval (integer.py:79-96);
  * plain int8 for everything else (integer.py:70-77, :98-110).

The reference implements activation export as forward hooks caching
``module.int_input``; here :func:`quantize_int_activations` consumes one
capture pass and returns the same payloads keyed by op name.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..quant import fakequant as fq
from ..quant.qparams import ConvQP, LinearQP, MatMulQP


def quantize_int_weight(w: np.ndarray, qp) -> np.ndarray:
    """int8 weight levels of a calibrated linear/conv op
    (reference integer.py:8-18; w_bit must be 8)."""
    if qp.w_bit != 8:
        raise AssertionError(
            f"weight is quantized with {qp.w_bit} bits; int8 export needs 8")
    qmax = qp.w_qmax
    w = np.asarray(w, np.float32)
    if isinstance(qp, LinearQP):
        n_V, _, n_H, _ = qp.w_interval.shape
        oc, ic = w.shape
        w4 = w.reshape(n_V, oc // n_V, n_H, ic // n_H)
        lv = np.clip(np.round(w4 / np.asarray(qp.w_interval)), -qmax, qmax - 1)
        return lv.reshape(oc, ic).astype(np.int8)
    # conv: interval (oc,1,1,1) or scalar broadcasts over OIHW
    lv = np.clip(np.round(w / np.asarray(qp.w_interval)), -qmax, qmax - 1)
    return lv.astype(np.int8)


def dequantize_int_weight(w_int: np.ndarray, qp) -> np.ndarray:
    """Inverse of :func:`quantize_int_weight` (reference integer.py:20-25)."""
    w_int = np.asarray(w_int, np.float32)
    interval = np.asarray(qp.w_interval)
    if isinstance(qp, LinearQP):
        n_V, _, n_H, _ = interval.shape
        oc, ic = w_int.shape
        w4 = w_int.reshape(n_V, oc // n_V, n_H, ic // n_H)
        return (w4 * interval).reshape(oc, ic)
    return w_int * interval


def quantize_matmul_operand_int(x: np.ndarray, interval: np.ndarray,
                                qmax: int) -> np.ndarray:
    """Blocked int levels of a matmul operand, padding-aware
    (reference quantize_matmul_input, integer.py:27-41)."""
    interval = np.asarray(interval)
    _, n_G, _, n_V, _, n_H, _ = interval.shape
    B, G, R, C = x.shape
    crb_g, crb_r, crb_c, pg, pr, pc = fq.matmul_block_shape(
        x.shape, n_G, n_V, n_H)
    xp = np.pad(x, ((0, 0), (0, pg), (0, pr), (0, pc)))
    xb = xp.reshape(B, n_G, crb_g, n_V, crb_r, n_H, crb_c)
    lv = np.clip(np.round(xb / interval), -qmax, qmax - 1)
    lv = lv.reshape(B, n_G * crb_g, n_V * crb_r, n_H * crb_c)
    return lv[:, :G, :R, :C]


def quantize_int_activation(op_inputs: Dict[str, np.ndarray], qp,
                            mtype: str) -> Dict[str, np.ndarray]:
    """uint8/int8 payload of one op's input activations
    (reference quantize_int_activation, integer.py:44-110)."""
    if isinstance(qp, LinearQP):
        if qp.a_bit != 8:
            raise AssertionError(
                f"activation quantized with {qp.a_bit} bits; export needs 8")
        x = np.asarray(op_inputs["x"], np.float32)
        qmax = qp.a_qmax
        n_a = qp.a_interval.shape[0]
        xg = x.reshape(*x.shape[:-1], n_a, x.shape[-1] // n_a)
        if qp.postgelu:
            # MSB = sign: pos levels + 128, |neg levels| (integer.py:56-68)
            pos = np.clip(np.round(xg / np.asarray(qp.a_interval)),
                          0, qmax - 1).astype(np.uint8) + 128
            neg = np.abs(np.clip(np.round(
                xg / float(qp.a_neg_interval)), -qmax + 1, 0)).astype(np.uint8)
            return {"x": (pos + neg).reshape(x.shape)}
        lv = np.clip(np.round(xg / np.asarray(qp.a_interval)),
                     -qmax, qmax - 1)
        return {"x": lv.reshape(x.shape).astype(np.int8)}

    if isinstance(qp, MatMulQP):
        if qp.A_bit != 8 or qp.B_bit != 8:
            raise AssertionError("matmul export needs 8-bit A and B")
        A = np.asarray(op_inputs["a"], np.float32)
        B = np.asarray(op_inputs["b"], np.float32)
        lead = A.shape[:-3]
        A4 = A.reshape((-1,) + A.shape[-3:])
        B4 = B.reshape((-1,) + B.shape[-3:])
        qmax = qp.A_qmax
        if qp.split is not None:
            # MSB selects the large interval (integer.py:79-96)
            split = float(qp.split)
            hi = np.clip(np.round(np.clip(A4, split, 1) * (qmax - 1)),
                         0, qmax - 1).astype(np.uint8) + 128
            lo = np.clip(np.round(np.clip(A4, 0, split)
                                  / float(qp.A_interval)),
                         0, qmax - 1).astype(np.uint8)
            A_int = (hi + lo).reshape(lead + A.shape[-3:])
        else:
            A_int = quantize_matmul_operand_int(
                A4, qp.A_interval, qmax).astype(np.int8) \
                .reshape(lead + A.shape[-3:])
        B_int = quantize_matmul_operand_int(
            B4, qp.B_interval, qp.B_qmax).astype(np.int8) \
            .reshape(lead + B.shape[-3:])
        return {"a": A_int, "b": B_int}

    if isinstance(qp, ConvQP):
        x = np.asarray(op_inputs["x"], np.float32)
        if qp.a_bit >= 32 or qp.a_interval is None:
            raise AssertionError(
                "conv activation quantization is off (a_bit=32) — no int "
                "activation to export (reference only hooks int8 modules)")
        qmax = qp.a_qmax
        lv = np.clip(np.round(x / float(qp.a_interval)), -qmax, qmax - 1)
        return {"x": lv.astype(np.int8)}
    raise NotImplementedError(mtype)


def get_model_int_weight(net, qstate: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """int8 weights of every weighted op with w_bit == 8
    (reference get_model_int_weight, integer.py:113-129 — ops that fail the
    8-bit check are silently skipped there; reproduced)."""
    from ..calib.calibrator import _params_for_op
    out = {}
    for name, mtype in net.op_inventory:
        if "qmatmul" in mtype:
            continue  # no weights
        qp = qstate.get(name)
        if qp is None:
            continue
        w, _ = _params_for_op(net.params, name)
        try:
            out[name] = quantize_int_weight(np.asarray(w), qp)
        except AssertionError:
            pass
    return out


def get_model_int_activations(net, qstate: Dict[str, Any],
                              x: np.ndarray,
                              batch_size: int = 8) -> Dict[str, Dict]:
    """One capture pass -> per-op int activation payloads (replaces the
    reference's pre-forward hook caching, integer.py:44-110)."""
    from ..calib.capture import capture
    raw = capture(net, np.asarray(x, np.float32), batch_size=batch_size,
                  need_grad=False)
    out = {}
    for name, mtype in net.op_inventory:
        qp = qstate.get(name)
        if qp is None:
            continue
        try:
            out[name] = quantize_int_activation(raw[name].inputs, qp, mtype)
        except AssertionError:
            continue
    return out
