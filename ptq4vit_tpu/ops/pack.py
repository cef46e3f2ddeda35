"""Serving-time weight packing: bake calibrated weights to resident int8.

The int8 engine (ops/int8.py) can compute weight levels on the fly from the
fp32 weights — convenient, but every forward then (a) reads the fp32 weight
from HBM (4 bytes/param) and (b) spends a VPU pass re-deriving levels that
never change after calibration.  ``pack_weights`` does that once, producing a
``packed`` dict the model forwards thread next to ``qstate``:

    packed[name] = {"w_intT": int8 (ic_flat, oc), "w_scale": f32 (oc,)}

for every linear/conv whose QP factors per-out-channel (n_H == 1 — i.e.
everything the shipped PTQ4ViT/BasePTQ configs produce).  Ops with column
block grids (ablation-only) or matmuls (no weights) are skipped and fall
back to the unpacked path.

The int levels are stored TRANSPOSED, (in, out): the MXU contracts the
sublane dimension of the right operand, so ``x @ w_intT`` feeds the
systolic array directly — an (out, in) layout would force an in-register
transpose on every tile (measured ~30% slower in the fused kernels).

Int levels match utils/integer.get_model_int_weight bit-for-bit (same
``fq.int_quant`` on the same fp32 weights), so a packed model serves exactly
the tensors the integer-export path ships.  Reference parity: the reference
never executes integer weights (it only simulates, quant_layers/linear.py:62-67
in hahnyuan/PTQ4ViT); this is the TPU-native realization of its semantics.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..quant import fakequant as fq
from ..quant.qparams import ConvQP, LinearQP


def _params_for(params: Dict[str, Any], name: str):
    node = params
    for part in name.split("."):
        node = node[int(part)] if part.isdigit() else node[part]
    return node


def pack_weights(params: Dict[str, Any], qstate: Dict[str, Any]) -> Dict[str, Any]:
    """Bake int8 weight levels + per-out-channel dequant scales for every
    packable op in ``qstate``.  Returns the ``packed`` dict consumed by
    ``net.apply(..., int8=True, packed=packed)``."""
    packed: Dict[str, Any] = {}
    for name, qp in qstate.items():
        if isinstance(qp, LinearQP):
            n_V, _, n_H, _ = qp.w_interval.shape
            if n_H != 1:
                continue  # column-block scales don't factor out
            w = jnp.asarray(_params_for(params, name)["weight"], jnp.float32)
            oc, ic = w.shape
            w4 = w.reshape(n_V, oc // n_V, ic)
            w_int = fq.int_quant(w4, qp.w_interval[:, :, 0], qp.w_qmax) \
                .astype(jnp.int8).reshape(oc, ic)
            w_scale = jnp.broadcast_to(
                qp.w_interval[:, :, 0, 0].astype(jnp.float32),
                (n_V, oc // n_V)).reshape(oc)
            packed[name] = {"w_intT": w_int.T, "w_scale": w_scale}
        elif isinstance(qp, ConvQP) and not qp.blocked:
            w = jnp.asarray(_params_for(params, name)["weight"], jnp.float32)
            oc = w.shape[0]
            wm = w.reshape(oc, -1)
            w_scale = jnp.broadcast_to(
                qp.w_interval.reshape(-1, 1, 1, 1)[:, 0, 0, 0]
                if qp.w_interval.ndim else qp.w_interval, (oc,)) \
                .astype(jnp.float32)
            w_int = fq.int_quant(wm, w_scale[:, None], qp.w_qmax) \
                .astype(jnp.int8)
            packed[name] = {"w_intT": w_int.T, "w_scale": w_scale}
    return packed
