"""Synthetic inputs and quantization state for tests / benchmarks / compile
checks (no dataset or calibration required)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..calib.calibrator import _params_for_op
from ..configs.policy import QuantConfig
from ..quant import fakequant as fq
from ..quant.qparams import ConvQP, LinearQP, MatMulQP


def synthetic_images(n: int, img_size: int, seed: int = 0) -> np.ndarray:
    """Normalized-image-like gaussian inputs (NCHW float32)."""
    return np.random.default_rng(seed).standard_normal(
        (n, 3, img_size, img_size)).astype(np.float32)


def synthetic_qstate(net, quant_cfg: QuantConfig) -> Dict[str, Any]:
    """Build a structurally-correct qstate from weight statistics alone
    (activation intervals are placeholders).  Exercises the exact quantized
    forward graph without running calibration — for compile checks and
    kernel benchmarks, NOT for accuracy."""
    qstate: Dict[str, Any] = {}
    for name, mtype in net.op_inventory:
        pol = quant_cfg.op_policy(mtype)
        if "qmatmul" in mtype:
            heads = net.op_shapes[name]["heads"]
            shape = (1, heads, 1, 1, 1, 1, 1)
            A_qmax = fq.qmax_for_bit(pol.a_bit)
            sos = pol.quantizer == "sos_matmul"
            split = jnp.float32(2.0 ** -10) if sos else None
            qstate[name] = MatMulQP(
                A_interval=(split / (A_qmax - 1) if sos
                            else jnp.full(shape, 0.05, jnp.float32)),
                B_interval=jnp.full(shape, 0.05, jnp.float32),
                split=split, A_bit=pol.a_bit, B_bit=pol.b_bit)
            continue
        w, _ = _params_for_op(net.params, name)
        w = jnp.asarray(w)
        w_qmax = fq.qmax_for_bit(pol.w_bit)
        if mtype == "qconv":
            channelwise = pol.quantizer == "conv_channelwise"
            wi = (jnp.amax(jnp.abs(w), axis=(1, 2, 3), keepdims=True)
                  / (w_qmax - 0.5)) if channelwise \
                else fq.minmax_interval(w, w_qmax)
            qstate[name] = ConvQP(w_interval=wi, a_interval=None,
                                  w_bit=pol.w_bit, a_bit=32)
            continue
        postgelu = pol.quantizer == "postgelu_linear"
        a_qmax = fq.qmax_for_bit(pol.a_bit)
        qstate[name] = LinearQP(
            w_interval=fq.blocked_weight_interval_init(
                w, pol.n_V, pol.n_H, w_qmax),
            a_interval=jnp.full((pol.n_a, 1), 0.05, jnp.float32),
            a_neg_interval=(jnp.float32(fq.GELU_NEG_CLIP / a_qmax)
                            if postgelu else None),
            w_bit=pol.w_bit, a_bit=pol.a_bit, postgelu=postgelu)
    return qstate
