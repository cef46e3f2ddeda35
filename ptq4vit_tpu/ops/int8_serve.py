"""Pallas fused int8 serving kernels: quantize -> int8 MXU matmul -> rescale
in one VMEM-resident pass.

The XLA int8 path (ops/int8.py) is numerically exact but materializes every
quantized operand through HBM: a linear costs read(x) + write(x_int8) +
read(x_int8) elementwise traffic before the matmul even starts, and the twin
post-GELU layers pay it twice (pos + neg level sets).  At ViT-B/384 bs=32
that overhead is ~40% of the step (BENCH_NOTES.md).  These kernels quantize
the activation tile in VMEM, feed the MXU int8 ports directly, and apply the
per-out-channel dequant scale + bias in the epilogue — activations cross HBM
exactly once, in the serving dtype.

Semantics are the fake-quant formulas of the reference
(hahnyuan/PTQ4ViT quant_layers/linear.py:62-67, :601-607): the int32
accumulation realizes them exactly, like ops/int8.py, so outputs match the
XLA int8 path up to fp32 rescale rounding.

Scope (= everything the shipped configs produce): LinearQP with n_H == 1,
n_a == 1, a_bit < 32, K and weights padded-friendly (K % 128 == 0).  Other
layouts fall back to the XLA path via ``q8_linear(...) -> None``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# fused quantized linear
# ---------------------------------------------------------------------------

def _linear_kernel(scal_ref, x_ref, w_ref, ws_ref, b_ref, out_ref, *,
                   a_qmax: int, postgelu: bool, epilogue: str = None):
    x = x_ref[:].astype(jnp.float32)
    if postgelu:
        # twin-uniform post-GELU input: searched positive interval +
        # fixed negative interval (reference linear.py:601-607)
        a_pos = scal_ref[0, 0]
        a_neg = scal_ref[0, 1]
        pos = jnp.clip(jnp.round(x / a_pos), 0, a_qmax - 1).astype(jnp.int8)
        neg = jnp.clip(jnp.round(x / a_neg), -a_qmax, 0).astype(jnp.int8)
        acc = (_dot_i8(pos, w_ref[:]).astype(jnp.float32) * a_pos
               + _dot_i8(neg, w_ref[:]).astype(jnp.float32) * a_neg)
    else:
        a = scal_ref[0, 0]
        xq = jnp.clip(jnp.round(x / a), -a_qmax, a_qmax - 1).astype(jnp.int8)
        acc = _dot_i8(xq, w_ref[:]).astype(jnp.float32) * a
    out = acc * ws_ref[0, :][None, :] + b_ref[0, :][None, :]
    if epilogue == "gelu":
        # erf-GELU fused so the pre-activation never crosses HBM; Mosaic has
        # no erf primitive, so use Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7
        # absolute — far inside the int8 path's rescale tolerance)
        out = 0.5 * out * (1.0 + _erf_as(out * (2.0 ** -0.5)))
    out_ref[:] = out.astype(out_ref.dtype)


def _erf_as(z):
    """float32 erf via Abramowitz & Stegun 7.1.26 (|eps| <= 1.5e-7)."""
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * za)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-za * za))


def _dot_i8(a, b):
    """(M, K) int8 @ (K, N) int8 -> (M, N) int32 on the MXU (sublane
    contraction on the rhs — the systolic-array-native layout)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


# VMEM working-set budget (double-buffered x/out tiles + the resident
# weight slab must fit in ~16 MB/core with headroom)
_VMEM_BUDGET = 10 * 2 ** 20
_W_SLAB_MAX = 4 * 2 ** 20


def _linear_tiles(M: int, K: int, N: int, x_bytes: int):
    # weight column slab: whole N when it fits (every ViT/Swin layer does) —
    # the slab then stays VMEM-resident across all M tiles and each x tile
    # is quantized exactly once
    BN = min(_round_up(N, 128), max(128, _W_SLAB_MAX // K // 128 * 128))
    BM = min(256, _round_up(M, 32))
    while BM > 32 and \
            2 * BM * (K * (x_bytes + 1) + BN * x_bytes) + K * BN \
            > _VMEM_BUDGET:
        BM //= 2
    return BM, BN


def q8_linear(x, w_intT, w_scale, b, a_interval, a_neg_interval, *,
              a_qmax: int, postgelu: bool, epilogue: str = None,
              interpret: bool = None):
    """Fused quantize->int8 matmul->rescale linear.

    x:        (..., K) fp32/bf16 activations
    w_intT:   (K, N) int8 weight levels, transposed (ops/pack.pack_weights)
    w_scale:  (N,) fp32 per-out-channel dequant scale
    b:        (N,) bias or None
    a_interval / a_neg_interval: scalar activation interval(s)

    Returns (..., N) in x.dtype, or None when the layout is out of scope
    (caller falls back to the XLA int8 path).
    """
    K, N = w_intT.shape
    if K % 128 != 0:
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    M = 1
    for s in lead:
        M *= s
    x2 = x.reshape(M, K)
    BM, BN = _linear_tiles(M, K, N, x2.dtype.itemsize)
    if BM * K * (x2.dtype.itemsize + 5) + BN * K > 2 * _VMEM_BUDGET:
        return None  # K too large for a single-slab kernel
    scal = jnp.stack([
        jnp.asarray(a_interval, jnp.float32).reshape(()),
        (jnp.asarray(a_neg_interval, jnp.float32).reshape(())
         if a_neg_interval is not None else jnp.float32(1.0)),
    ]).reshape(1, 2)
    ws2 = w_scale.astype(jnp.float32).reshape(1, N)
    b2 = (b.astype(jnp.float32) if b is not None
          else jnp.zeros((N,), jnp.float32)).reshape(1, N)
    # n outermost, m fastest: the weight slab block index is constant across
    # the m sweep, so Mosaic keeps it VMEM-resident
    grid = (-(-N // BN), -(-M // BM))
    out = pl.pallas_call(
        functools.partial(_linear_kernel, a_qmax=a_qmax, postgelu=postgelu,
                          epilogue=epilogue),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BM, K), lambda n, m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BN), lambda n, m: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda n, m: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda n, m: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda n, m: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K * (2 if postgelu else 1),
            bytes_accessed=M * K * x2.dtype.itemsize + N * K
            + M * N * x2.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(scal, x2, w_intT, ws2, b2)
    return out.reshape(lead + (N,))


# ---------------------------------------------------------------------------
# fused int8 attention: matmul1 -> softmax -> (SoS) quantize -> matmul2
# ---------------------------------------------------------------------------

def _attn_math(qf, ktf, vf, a1, b1, a2, b2, split, scale, *,
               sos: bool, A1_qmax: int, B1_qmax: int, A2_qmax: int,
               B2_qmax: int):
    """Shared per-head attention math: quantize -> q@kᵀ -> softmax ->
    (SoS) quantize -> @v, all in VMEM.  qf (BM, hd), ktf (hd, N),
    vf (N, hd) -> (BM, hd) f32."""
    q_int = jnp.clip(jnp.round(qf / a1), -A1_qmax, A1_qmax - 1) \
        .astype(jnp.int8)
    kt_int = jnp.clip(jnp.round(ktf / b1), -B1_qmax, B1_qmax - 1) \
        .astype(jnp.int8)
    logits = _dot_i8(q_int, kt_int).astype(jnp.float32) * (a1 * b1 * scale)
    p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    def pv_dot(pi, vi):
        # (BM, N) int8 @ (N, hd) int8 -> (BM, hd) int32
        return jax.lax.dot_general(
            pi, vi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    v_int = jnp.clip(jnp.round(vf / b2), -B2_qmax, B2_qmax - 1) \
        .astype(jnp.int8)
    if sos:
        # split-of-softmax twin ranges (reference matmul.py:595-598)
        a_int = split / (A2_qmax - 1)
        hi = jnp.clip(jnp.round(jnp.clip(p, split, 1.0) * (A2_qmax - 1)),
                      0, A2_qmax - 1).astype(jnp.int8)
        lo = jnp.clip(jnp.round(jnp.clip(p, 0.0, split) / a_int),
                      0, A2_qmax - 1).astype(jnp.int8)
        acc = (pv_dot(hi, v_int).astype(jnp.float32) / (A2_qmax - 1)
               + pv_dot(lo, v_int).astype(jnp.float32) * a_int)
    else:
        p_int = jnp.clip(jnp.round(p / a2), -A2_qmax, A2_qmax - 1) \
            .astype(jnp.int8)
        acc = pv_dot(p_int, v_int).astype(jnp.float32) * a2
    return acc * b2


def _attn_kernel(ph_ref, misc_ref, q_ref, kt_ref, v_ref, out_ref, *,
                 heads: int, **flags):
    g = pl.program_id(0)
    h = jax.lax.rem(g, heads)
    out_ref[0] = _attn_math(
        q_ref[0].astype(jnp.float32), kt_ref[0].astype(jnp.float32),
        v_ref[0].astype(jnp.float32),
        ph_ref[0, h], ph_ref[1, h], ph_ref[2, h], ph_ref[3, h],
        misc_ref[0, 0], misc_ref[0, 1], **flags).astype(out_ref.dtype)


def _attn_kernel_qkv(ph_ref, misc_ref, q_ref, kt_ref, v_ref, out_ref, *,
                     hd: int, hp_n: int, **flags):
    # q/v sliced straight out of the (B, N, 3d) qkv buffer; out written
    # straight into the (B, N, d) layout the proj linear consumes.  Mosaic
    # needs 128-wide column blocks, so each grid step covers hp_n = 128/hd
    # heads and slices them apart in VMEM.
    hp = pl.program_id(1)
    q2 = q_ref[0].astype(jnp.float32)        # (BM, hp_n*hd)
    v2 = v_ref[0].astype(jnp.float32)        # (N, hp_n*hd)
    outs = []
    for j in range(hp_n):
        h = hp * hp_n + j
        outs.append(_attn_math(
            q2[:, j * hd:(j + 1) * hd],
            kt_ref[0, j].astype(jnp.float32),
            v2[:, j * hd:(j + 1) * hd],
            ph_ref[0, h], ph_ref[1, h], ph_ref[2, h], ph_ref[3, h],
            misc_ref[0, 0], misc_ref[0, 1], **flags))
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


def _head_scalar(interval, heads: int):
    """Per-head scale vector from a (1, n_G, 1, 1, 1, 1, 1) interval (or a
    scalar, e.g. the SoS A_interval)."""
    iv = jnp.asarray(interval, jnp.float32)
    if iv.ndim == 0:
        return jnp.broadcast_to(iv, (heads,))
    if iv.size != heads:
        return None
    return iv.reshape(heads)


def _attn_scope(qp1, qp2, H: int, hd: int):
    """Common scope checks; returns (ph (4,H), misc-split, sos) or None."""
    if hd % 8 != 0:  # lane padding handles hd < 128; sublane needs 8|hd
        return None
    if qp1.split is not None:
        return None
    for qp in (qp1, qp2):
        for iv in (qp.A_interval, qp.B_interval):
            ivx = jnp.asarray(iv)
            if ivx.ndim == 7 and (ivx.shape[3] != 1 or ivx.shape[5] != 1):
                return None  # operand block grids: XLA path
    if max(qp1.A_bit, qp1.B_bit, qp2.A_bit, qp2.B_bit) > 8:
        return None
    sos = qp2.split is not None
    a1 = _head_scalar(qp1.A_interval, H)
    b1 = _head_scalar(qp1.B_interval, H)
    a2 = _head_scalar(qp2.A_interval, H)
    b2 = _head_scalar(qp2.B_interval, H)
    if any(s is None for s in (a1, b1, a2, b2)):
        return None
    return jnp.stack([a1, b1, a2, b2]), sos


def _attn_misc(qp2, sos: bool, scale):
    return jnp.stack([
        jnp.asarray(qp2.split if sos else 0.0, jnp.float32).reshape(()),
        jnp.asarray(scale, jnp.float32).reshape(())]).reshape(1, 2)


def _attn_flags(qp1, qp2, sos: bool):
    return dict(sos=sos, A1_qmax=qp1.A_qmax, B1_qmax=qp1.B_qmax,
                A2_qmax=qp2.A_qmax, B2_qmax=qp2.B_qmax)


def _attn_bm(N: int, hd: int):
    Np = _round_up(N, 128)
    BM = _round_up(N, 8)
    while BM > 64 and BM * Np * 6 + 3 * N * hd * 4 > _VMEM_BUDGET:
        BM = _round_up(-(-BM // 2), 8)
    return BM


def fused_attention(q, k, v, qp1, qp2, scale):
    """Fused int8 attention for softmax(Q@Kᵀ·scale)@V with per-head operand
    scales (matmul1) and SoS or per-head (matmul2) post-softmax quantization.

    q, k, v: (B, H, N, hd).  Returns (B, H, N, hd) in q.dtype, or None when
    the QP layout is out of scope (operand block grids / grouped heads).
    """
    B, H, N, hd = q.shape
    scoped = _attn_scope(qp1, qp2, H, hd)
    if scoped is None:
        return None
    ph, sos = scoped
    interpret = jax.default_backend() == "cpu"
    G = B * H
    q3 = q.reshape(G, N, hd)
    kt3 = jnp.swapaxes(k, -2, -1).reshape(G, hd, N)
    v3 = v.reshape(G, N, hd)
    misc = _attn_misc(qp2, sos, scale)
    # row tile: whole N per head when the logits tile fits (ViT-B/384
    # N=577 -> 1.5 MB f32), else split the query rows
    BM = _attn_bm(N, hd)
    grid = (G, -(-N // BM))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, heads=H,
                          **_attn_flags(qp1, qp2, sos)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BM, hd), lambda g, m: (g, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, N), lambda g, m: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hd), lambda g, m: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BM, hd), lambda g, m: (g, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * N * N * hd * (3 if sos else 2),
            bytes_accessed=4 * G * N * hd * q.dtype.itemsize,
            transcendentals=G * N * N),
        interpret=interpret,
    )(ph, misc, q3, kt3, v3)
    return out.reshape(B, H, N, hd)


def fused_attention_qkv(qkv, heads: int, qp1, qp2, scale):
    """Layout-free fused attention: reads q/v straight out of the packed
    (B, N, 3d) qkv-linear output and writes (B, N, d) — no (B,H,N,hd)
    transpose materializes in HBM (only kᵀ is staged, d/3 of the buffer).

    Returns (B, N, d) in qkv.dtype, or None when out of scope.
    """
    B, N, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    # column blocks must be 128-wide: bundle hp_n = 128/hd heads per step
    if hd <= 128:
        if 128 % hd != 0:
            return None
        hp_n = 128 // hd
    elif hd % 128 == 0:
        hp_n = 1
    else:
        return None
    if heads % hp_n != 0:
        return None
    scoped = _attn_scope(qp1, qp2, heads, hd)
    if scoped is None:
        return None
    ph, sos = scoped
    interpret = jax.default_backend() == "cpu"
    kt = jnp.transpose(qkv[:, :, d:2 * d].reshape(B, N, heads, hd),
                       (0, 2, 3, 1))                       # (B, heads, hd, N)
    misc = _attn_misc(qp2, sos, scale)
    BM = _attn_bm(N, hd)
    bw = hp_n * hd                                          # 128 (or hd)
    grid = (B, heads // hp_n, -(-N // BM))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_qkv, hd=hd, hp_n=hp_n,
                          **_attn_flags(qp1, qp2, sos)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # q rows for this tile: columns [hp*bw, (hp+1)*bw) of qkv
            pl.BlockSpec((1, BM, bw), lambda b, hp, m: (b, m, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp_n, hd, N), lambda b, hp, m: (b, hp, 0, 0),
                         memory_space=pltpu.VMEM),
            # v: all N rows, columns [2d + hp*bw, ...) -> 2*heads/hp_n + hp
            # in bw-sized block units
            pl.BlockSpec((1, N, bw),
                         lambda b, hp, m, _v0=2 * heads // hp_n:
                         (b, 0, _v0 + hp),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BM, bw), lambda b, hp, m: (b, m, hp),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * N * N * hd * (3 if sos else 2),
            bytes_accessed=2 * B * N * d3 * qkv.dtype.itemsize,
            transcendentals=B * heads * N * N),
        interpret=interpret,
    )(ph, misc, qkv, kt, qkv)
    return out


def fused_linear(x, w, b, qp, pk, epilogue: str = None):
    """Dispatch a LinearQP through the fused kernel when its layout is in
    scope; returns None to fall back to the XLA int8 path."""
    n_V, _, n_H, _ = qp.w_interval.shape
    if (n_H != 1 or qp.a_interval.shape[0] != 1 or qp.a_bit >= 32
            or qp.a_bit > 8 or qp.w_bit > 8):
        return None
    w_intT, w_scale = pk.get("w_intT"), pk.get("w_scale")
    if w_intT is None or w_scale is None:
        from ..quant import fakequant as fq
        oc, ic = w.shape
        w4 = w.astype(jnp.float32).reshape(n_V, oc // n_V, ic)
        w_intT = fq.int_quant(w4, qp.w_interval[:, :, 0], qp.w_qmax) \
            .astype(jnp.int8).reshape(oc, ic).T
        w_scale = jnp.broadcast_to(
            qp.w_interval[:, :, 0, 0].astype(jnp.float32),
            (n_V, oc // n_V)).reshape(oc)
    return q8_linear(x, w_intT, w_scale, b,
                     qp.a_interval[0, 0], qp.a_neg_interval,
                     a_qmax=qp.a_qmax, postgelu=qp.postgelu,
                     epilogue=epilogue)
