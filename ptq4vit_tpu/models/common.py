"""Functional building blocks shared by the ViT / DeiT / Swin forwards.

Design: the reference reifies quantizable ops as nn.Module children so they
can be swapped and hooked (utils/models.py:58-87, utils/net_wrap.py:39-81 in
hahnyuan/PTQ4ViT).  The TPU-native equivalent is a :class:`QuantCtx` the
forward threads through every quantizable op call-site:

  * ``qstate[name] is None``  -> raw FP32 op (reference mode "raw");
  * ``qstate[name]`` is a QP pytree -> fake-quant op (mode "quant_forward");
  * ``capture=True``          -> record (inputs, out) per op in ``ctx.taps``
                                 (replaces forward hooks);
  * ``eps[name]``             -> zero tensor added to the op output, whose
                                 cotangent under jax.grad is exactly
                                 ∂loss/∂(op output) — replaces
                                 register_backward_hook (quant_calib.py:173).

Ops are keyed by their timm module path (e.g. ``blocks.0.attn.qkv``) so
configs, export, and golden tests line up with reference checkpoints.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..quant.qparams import GatedQP, apply_linear, apply_matmul


class QuantCtx:
    """Per-forward context carrying quantization state / taps / grad probes."""

    def __init__(self,
                 qstate: Optional[Dict[str, Any]] = None,
                 eps: Optional[Dict[str, Any]] = None,
                 capture: bool = False,
                 int8: bool = False,
                 packed: Optional[Dict[str, Any]] = None):
        self.qstate = qstate or {}
        self.eps = eps
        self.capture = capture
        # int8=True executes quantized ops as int8 MXU matmuls (exact
        # realization of the fake-quant semantics; see ops/int8.py);
        # int8="fused" adds the whole-block Pallas path (still exact);
        # int8="fused_relaxed" additionally runs the fused kernels' VPU
        # epilogues (softmax/SoS, GELU, requant rounding) in bfloat16 —
        # NOT bit-equal to fake-quant, opt-in for serving throughput;
        # packed = resident int8 weights from ops/pack.pack_weights
        self.int8 = int8
        self.fused = int8 in ("fused", "fused_relaxed")
        self.relaxed = int8 == "fused_relaxed"
        self.packed = packed or {}
        self.taps: Dict[str, Dict[str, Any]] = {}

    def _post(self, name, out, tap):
        if self.eps is not None and name in self.eps:
            out = out + self.eps[name]
        if self.capture:
            tap["out"] = out
            self.taps[name] = tap
        return out

    def linear(self, name, x, w, b):
        """Quantizable linear; tap records input and output
        (reference linear_forward_hook, quant_calib.py:178)."""
        qp = self.qstate.get(name)
        if isinstance(qp, GatedQP):
            # traced raw/quant switch (sequential capture, qparams.GatedQP):
            # lax.cond executes ONE branch, so the raw steps cost no
            # fake-quant work
            out = jax.lax.cond(qp.on,
                               lambda: apply_linear(x, w, b, qp.qp),
                               lambda: apply_linear(x, w, b, None))
            return self._post(name, out.astype(x.dtype), {"x": x})
        if qp is not None and self.int8:
            from ..ops.int8 import linear_int8
            pk = self.packed.get(name) or {}
            out = None
            if self.fused:
                from ..ops.int8_serve import fused_linear
                out = fused_linear(x, w, b, qp, pk, relaxed=self.relaxed)
            if out is None:
                out = linear_int8(x, w, b, qp, w_intT=pk.get("w_intT"),
                                  w_scale=pk.get("w_scale"))
        else:
            out = apply_linear(x, w, b, qp)
        return self._post(name, out.astype(x.dtype), {"x": x})

    def matmul(self, name, a, b):
        """Quantizable A@B; tap records both operands
        (reference matmul_forward_hook, quant_calib.py:194)."""
        qp = self.qstate.get(name)
        if isinstance(qp, GatedQP):
            out = jax.lax.cond(qp.on,
                               lambda: apply_matmul(a, b, qp.qp),
                               lambda: apply_matmul(a, b, None))
        elif qp is not None and self.int8:
            from ..ops.int8 import matmul_int8
            out = matmul_int8(a, b, qp)
        else:
            out = apply_matmul(a, b, qp)
        return self._post(name, out.astype(a.dtype), {"a": a, "b": b})

    def linear_gelu(self, name, x, w, b):
        """gelu(linear(x)) with the GELU fused into the int8 kernel epilogue
        on the fused serving path (the pre-activation then never crosses
        HBM).  Identical semantics to gelu(self.linear(...)) — capture/eps
        modes keep the generic path so taps record the pre-GELU output."""
        qp = self.qstate.get(name)
        if (self.fused and qp is not None and not self.capture
                and self.eps is None):
            from ..ops.int8_serve import fused_linear
            out = fused_linear(x, w, b, qp, self.packed.get(name) or {},
                               epilogue="gelu", relaxed=self.relaxed)
            if out is not None:
                return out.astype(x.dtype)
        return gelu(self.linear(name, x, w, b))

    def vit_block(self, prefix, x, blk, heads, scale, ln_eps):
        """Whole-block fused serving fast path (ops/int8_serve.py
        fused_vit_block): LN fused into the linear prologues, intermediate
        activations handed between kernels as int8.  Returns the new
        residual stream or None (caller runs the generic per-op path)."""
        if not self.fused or self.capture or self.eps is not None:
            return None
        keys = {"qkv": f"{prefix}.attn.qkv",
                "matmul1": f"{prefix}.attn.matmul1",
                "matmul2": f"{prefix}.attn.matmul2",
                "proj": f"{prefix}.attn.proj",
                "fc1": f"{prefix}.mlp.fc1",
                "fc2": f"{prefix}.mlp.fc2"}
        qps = {k: self.qstate.get(n) for k, n in keys.items()}
        pks = {k: self.packed.get(n) or {} for k, n in keys.items()}
        from ..ops.int8_serve import fused_vit_block
        return fused_vit_block(x, blk, qps, pks, heads, scale, ln_eps,
                               relaxed=self.relaxed)

    def swin_block(self, prefix, x, blk, heads, ws, shift, res, bias, mask,
                   ln_eps):
        """Whole-Swin-block fused serving fast path (ops/int8_serve.py
        fused_swin_block): roll/partition first, LN in the linear
        prologues, int8 handoffs qkv->window-attention->proj and
        fc1->fc2.  Returns the new residual stream or None."""
        if not self.fused or self.capture or self.eps is not None:
            return None
        keys = {"qkv": f"{prefix}.attn.qkv",
                "matmul1": f"{prefix}.attn.matmul1",
                "matmul2": f"{prefix}.attn.matmul2",
                "proj": f"{prefix}.attn.proj",
                "fc1": f"{prefix}.mlp.fc1",
                "fc2": f"{prefix}.mlp.fc2"}
        qps = {k: self.qstate.get(n) for k, n in keys.items()}
        pks = {k: self.packed.get(n) or {} for k, n in keys.items()}
        from ..ops.int8_serve import fused_swin_block
        return fused_swin_block(x, blk, qps, pks, heads, ws, shift, res,
                                bias, mask, ln_eps, relaxed=self.relaxed)

    def window_attention_qkv(self, name1, name2, qkv, heads, nW, prescale,
                             bias, mask):
        """Fused Swin window-attention fast path (bias + shifted-window
        mask in-kernel); returns (B_, N, C) or None for the generic path."""
        if not self.fused or self.capture or self.eps is not None:
            return None
        qp1 = self.qstate.get(name1)
        qp2 = self.qstate.get(name2)
        if qp1 is None or qp2 is None:
            return None
        from ..ops.int8_serve import fused_window_attention_qkv
        return fused_window_attention_qkv(qkv, heads, nW, qp1, qp2,
                                          prescale, bias, mask,
                                          relaxed=self.relaxed)

    def attention_qkv(self, name1, name2, qkv, heads, scale):
        """Fused int8 attention fast path: softmax(q@kᵀ·scale)@v with both
        matmul QPs realized in one Pallas kernel reading q/v straight from
        the (B, N, 3d) qkv-linear output (ops/int8_serve.py).  Returns the
        (B, N, d) context or None when unavailable — the caller then runs
        the generic matmul1/softmax/matmul2 sequence (identical
        semantics)."""
        if not self.fused or self.capture or self.eps is not None:
            return None
        qp1 = self.qstate.get(name1)
        qp2 = self.qstate.get(name2)
        if qp1 is None or qp2 is None:
            return None
        from ..ops.int8_serve import fused_attention_qkv
        return fused_attention_qkv(qkv, heads, qp1, qp2, scale,
                                   relaxed=self.relaxed)

    def conv2d_patch(self, name, x, w, b, patch: int):
        """Quantizable non-overlapping patch-embedding conv (stride ==
        kernel), computed as patchify + matmul so it rides the MXU.

        x: (B, C, H, W) NCHW (reference layout); w: (oc, ic, p, p) OIHW.
        Returns (out_tokens (B, nh*nw, oc), (nh, nw)).

        The tap records the patchified input (B, N, ic*p*p) and the token
        output (B, N, oc): elementwise quantization and the similarity
        reductions are layout-invariant, so this is equivalent to the
        reference's NCHW conv caches (quant_calib.py:186) while keeping the
        search a pure matmul on the MXU.
        """
        qp = self.qstate.get(name)
        if isinstance(qp, GatedQP):
            gp = qp
            qp = None  # the int8 dispatch below never applies to GatedQP
            w, x = jax.lax.cond(
                gp.on,
                lambda: (gp.qp.quant_weight(w), gp.qp.quant_input(x)),
                lambda: (w, x))
        elif qp is not None and not self.int8:
            w = qp.quant_weight(w)
            x = qp.quant_input(x)
        B, C, H, W = x.shape
        oc = w.shape[0]
        nh, nw = H // patch, W // patch
        # (B,C,nh,p,nw,p) -> (B,nh,nw,C,p,p) -> (B, N, C*p*p): patch vector
        # ordering matches w.reshape(oc, ic*p*p)
        xp = x.reshape(B, C, nh, patch, nw, patch)
        xp = xp.transpose(0, 2, 4, 1, 3, 5).reshape(B, nh * nw, C * patch * patch)
        if qp is not None and self.int8:
            from ..ops.int8 import conv_int8
            pk = self.packed.get(name) or {}
            out = conv_int8(xp, w, b, qp, patch, w_intT=pk.get("w_intT"),
                            w_scale=pk.get("w_scale"))
        else:
            out = jnp.matmul(xp, w.reshape(oc, -1).T,
                             preferred_element_type=jnp.float32)
            if b is not None:
                out = out + b
        out = self._post(name, out.astype(x.dtype), {"x": xp})
        return out, (nh, nw)


def layer_norm(x, weight, bias, eps: float):
    # statistics in fp32 (stable under bf16 compute mode), output in x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
            * weight + bias)


def gelu(x):
    """Exact (erf) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def softmax_f32(x, axis=-1):
    """Softmax accumulated in fp32, result in x.dtype (bf16-mode safe)."""
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis).astype(x.dtype)
