"""Pallas fused int8 serving kernels: quantize -> int8 MXU matmul -> rescale
in one VMEM-resident pass, with int8 layer-to-layer handoffs.

The XLA int8 path (ops/int8.py) is numerically exact but materializes every
quantized operand through HBM: a linear costs read(x) + write(x_int8) +
read(x_int8) elementwise traffic before the matmul even starts, and the twin
post-GELU layers pay it twice (pos + neg level sets).  At ViT-B/384 bs=32
that overhead is ~40% of the step (BENCH_NOTES.md).  These kernels quantize
the activation tile in VMEM, feed the MXU int8 ports directly, and apply the
per-out-channel dequant scale + bias in the epilogue.

Fusion modes (composed by :func:`fused_vit_block` into a full transformer
block whose intermediate activations cross HBM as int8, once):

  * prologue ``ln``: LayerNorm (fp32 statistics, models/common.py
    layer_norm) computed on the raw residual row before quantization;
  * input modes: float (quantize in-kernel), ``q8`` (pre-quantized int8 +
    scalar scale), ``q8twin`` (post-GELU twin levels packed into ONE int8 —
    pos and neg have disjoint support, so pos+neg is losslessly split back
    with max/min);
  * epilogues: erf-GELU (A&S 7.1.26 polynomial — Mosaic has no erf), and
    re-quantization of the output for the NEXT op: per-column scale vector
    (the qkv -> attention handoff, scales vary per head/section) or twin
    packing (the fc1 -> fc2 handoff).

Semantics are the fake-quant formulas of the reference
(hahnyuan/PTQ4ViT quant_layers/linear.py:62-67, :601-607,
matmul.py:595-598): int32 accumulation realizes them exactly, like
ops/int8.py, so outputs match the XLA int8 path up to fp32 rescale rounding
(and quantization-boundary level flips where two fp-equal formulations
round an ulp apart).

Scope (= everything the shipped configs produce): LinearQP with n_H == 1,
n_a == 1, a_bit <= 8, matmul QPs with per-head scales.  Sub-8-bit levels
(the reference benchmark grid's W6A6 half, example/test_all.py:107-113)
ride the same int8 MXU operands with the smaller qmax — every kernel is
parameterized by the QP's qmax, only the attention handoffs additionally
require the three matmul operand qmaxes to agree (one clip range covers
the packed q/k/v columns).  Anything else falls back to the XLA path via
``... -> None``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


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


def _rnd32(x):
    """round-to-nearest-even via f32: Mosaic cannot legalize
    ``math.roundeven`` on bf16 vectors (device-window r4 failure), and
    bf16->f32 is exact, so rounding the relaxed path's bf16 products in
    f32 is value-identical and compiles."""
    return jnp.round(x.astype(jnp.float32))


# VMEM working-set budget (double-buffered x/out tiles + the resident
# weight slab must fit in ~16 MB/core with headroom)
_VMEM_BUDGET = 10 * 2 ** 20
_W_SLAB_MAX = 4 * 2 ** 20


# ---------------------------------------------------------------------------
# fused quantized linear
# ---------------------------------------------------------------------------

def _linear_kernel(scal_ref, lnw_ref, lnb_ref, x_ref, w_ref, ws_ref, b_ref,
                   osc_ref, res_ref, out_ref, *, a_qmax: int, out_qmax: int,
                   in_mode: str, ln: bool, gelu: bool, out_q: str,
                   residual: bool, relaxed: bool = False):
    a = scal_ref[0, 0]
    a_neg = scal_ref[0, 1]

    def prologue(xs):
        """LN + input quantization (VPU) for one row sub-tile."""
        if in_mode in ("f", "f_twin"):
            x = xs.astype(jnp.float32)
            if ln:
                # fp32-statistics LayerNorm on the raw residual row
                # (models/common.py layer_norm) — the normalized activation
                # never crosses HBM
                mu = jnp.mean(x, axis=1, keepdims=True)
                var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
                x = ((x - mu) * jax.lax.rsqrt(var + scal_ref[0, 2])
                     * lnw_ref[0, :][None, :] + lnb_ref[0, :][None, :])
            if in_mode == "f_twin":
                # twin-uniform post-GELU input (reference linear.py:601-607)
                return (jnp.clip(jnp.round(x / a), 0, a_qmax - 1)
                        .astype(jnp.int8),
                        jnp.clip(jnp.round(x / a_neg), -a_qmax, 0)
                        .astype(jnp.int8))
            return jnp.clip(jnp.round(x / a), -a_qmax, a_qmax - 1) \
                .astype(jnp.int8)
        if in_mode == "q8":
            return xs
        # q8twin: packed pos+neg (disjoint support); Mosaic has no i8
        # max/min, so split via i32
        c = xs.astype(jnp.int32)
        return (jnp.maximum(c, 0).astype(jnp.int8),
                jnp.minimum(c, 0).astype(jnp.int8))

    def matmul(qx):
        if in_mode in ("f_twin", "q8twin"):
            pos, neg = qx
            return (_dot_i8(pos, w_ref[:]).astype(jnp.float32) * a
                    + _dot_i8(neg, w_ref[:]).astype(jnp.float32) * a_neg)
        return _dot_i8(qx, w_ref[:]).astype(jnp.float32) * a

    def epilogue(acc, rs):
        """Rescale + bias + GELU/residual + output (re)quantization (VPU).
        ``relaxed``: GELU and the requant rounding run in bfloat16 with
        reciprocal-multiplies (tanh-GELU instead of the erf polynomial) —
        levels can shift one step vs the exact path (opt-in mode)."""
        out = acc * ws_ref[0, :][None, :] + b_ref[0, :][None, :]
        if gelu:
            if relaxed:
                h = out.astype(jnp.bfloat16)
                out = (0.5 * h * (1.0 + jnp.tanh(
                    jnp.bfloat16(0.7978845608028654)
                    * (h + jnp.bfloat16(0.044715) * h * h * h)))) \
                    .astype(jnp.float32)
            else:
                # erf-GELU fused so the pre-activation never crosses HBM
                out = 0.5 * out * (1.0 + _erf_as(out * (2.0 ** -0.5)))
        if residual:
            # residual add in-epilogue: the separate x+y pass (one read +
            # one write of the whole stream) never happens
            out = out + rs.astype(jnp.float32)
        if out_q == "vec":
            # per-column requant for the next op (qkv -> attention handoff)
            osc = osc_ref[0, :][None, :]
            if relaxed:
                return jnp.clip(_rnd32(out.astype(jnp.bfloat16)
                                       * (1.0 / osc)
                                       .astype(jnp.bfloat16)),
                                -out_qmax, out_qmax - 1).astype(jnp.int8)
            return jnp.clip(jnp.round(out / osc), -out_qmax, out_qmax - 1) \
                .astype(jnp.int8)
        if out_q == "twin":
            # twin-pack for the next post-GELU linear (fc1 -> fc2 handoff)
            o_pos = scal_ref[0, 3]
            o_neg = scal_ref[0, 4]
            if relaxed:
                h = out.astype(jnp.bfloat16)
                p = jnp.clip(_rnd32(h * (1.0 / o_pos)
                                    .astype(jnp.bfloat16)),
                             0, out_qmax - 1)
                n = jnp.clip(_rnd32(h * (1.0 / o_neg)
                                    .astype(jnp.bfloat16)),
                             -out_qmax, 0)
                return (p + n).astype(jnp.int8)
            p = jnp.clip(jnp.round(out / o_pos), 0, out_qmax - 1)
            n = jnp.clip(jnp.round(out / o_neg), -out_qmax, 0)
            return (p + n).astype(jnp.int8)
        return out.astype(out_ref.dtype)

    # NOTE: a row-sub-tiled software pipeline (issue slice s+1's MXU dot
    # before slice s's epilogue so the VPU work runs under the matmul) was
    # measured at exactly 0 gain here (714.1 vs 714.5 img/s ViT-B/384) —
    # Mosaic schedules from the dataflow graph, not program order, so the
    # interleaving is a no-op and the VPU-bound roofline (BENCH_NOTES)
    # stands.  Kept out of the kernel to keep the body simple.
    out_ref[:] = epilogue(matmul(prologue(x_ref[:])),
                          res_ref[:] if residual else None)


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
              ln=None, in_q: str = None, out_q: str = None,
              out_scale=None, out_qmax: int = 128,
              float_dtype=None, residual=None, relaxed: bool = False,
              interpret: bool = None):
    """Fused quantize->int8 matmul->rescale linear.

    x:        (..., K) fp32/bf16 activations, or int8 when ``in_q`` is set
    w_intT:   (K, N) int8 weight levels, transposed (ops/pack.pack_weights)
    w_scale:  (N,) fp32 per-out-channel dequant scale
    b:        (N,) bias or None
    a_interval / a_neg_interval: scalar activation interval(s)
    ln:       optional (weight (K,), bias (K,), eps) LayerNorm prologue
    in_q:     None | "q8" | "q8twin" — x is pre-quantized (scales still
              given by a_interval/a_neg_interval)
    epilogue: None | "gelu"
    out_q:    None | "vec" | "twin" — re-quantize the output for the next
              op; "vec" takes out_scale (N,) per-column, "twin" takes
              out_scale = (pos_interval, neg_interval)
    residual: optional (..., N) stream added in the epilogue (the
              transformer residual connection — saves the separate x+y
              elementwise pass); float output only (no out_q)
    Returns (..., N) in x.dtype (int8 when out_q), or None when the layout
    is out of scope (caller falls back to the XLA int8 path).
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
    in_mode = in_q if in_q else ("f_twin" if postgelu else "f")
    o_pos, o_neg = (out_scale if out_q == "twin" else (0.0, 1.0))
    scal = jnp.stack([
        jnp.asarray(a_interval, jnp.float32).reshape(()),
        (jnp.asarray(a_neg_interval, jnp.float32).reshape(())
         if a_neg_interval is not None else jnp.float32(1.0)),
        jnp.asarray(ln[2] if ln else 0.0, jnp.float32).reshape(()),
        jnp.asarray(o_pos, jnp.float32).reshape(()),
        jnp.asarray(o_neg, jnp.float32).reshape(()),
    ]).reshape(1, 5)
    lnw = (ln[0].astype(jnp.float32) if ln
           else jnp.ones((K,), jnp.float32)).reshape(1, K)
    lnb = (ln[1].astype(jnp.float32) if ln
           else jnp.zeros((K,), jnp.float32)).reshape(1, K)
    ws2 = w_scale.astype(jnp.float32).reshape(1, N)
    b2 = (b.astype(jnp.float32) if b is not None
          else jnp.zeros((N,), jnp.float32)).reshape(1, N)
    osc = (out_scale.astype(jnp.float32) if out_q == "vec"
           else jnp.ones((N,), jnp.float32)).reshape(1, N)
    out_dtype = jnp.int8 if out_q else (float_dtype or x.dtype)
    has_res = residual is not None
    res2 = (residual.reshape(M, N) if has_res
            else jnp.zeros((1, 1), out_dtype))
    # n outermost, m fastest: the weight slab block index is constant across
    # the m sweep, so Mosaic keeps it VMEM-resident
    grid = (-(-N // BN), -(-M // BM))
    twin = in_mode in ("f_twin", "q8twin")
    out = pl.pallas_call(
        functools.partial(_linear_kernel, a_qmax=a_qmax, out_qmax=out_qmax,
                          in_mode=in_mode, ln=ln is not None,
                          gelu=epilogue == "gelu", out_q=out_q,
                          residual=has_res, relaxed=relaxed),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K), lambda n, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda n, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, K), lambda n, m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BN), lambda n, m: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda n, m: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda n, m: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda n, m: (0, n),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((BM, BN), lambda n, m: (m, n),
                          memory_space=pltpu.VMEM) if has_res
             else pl.BlockSpec((1, 1), lambda n, m: (0, 0),
                               memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda n, m: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K * (2 if twin else 1),
            bytes_accessed=M * K * x2.dtype.itemsize + N * K
            + M * N * (1 if out_q else x2.dtype.itemsize)
            * (2 if has_res else 1),
            transcendentals=M * N if epilogue == "gelu" else 0),
        interpret=interpret,
    )(scal, lnw, lnb, x2, w_intT, ws2, b2, osc, res2)
    return out.reshape(lead + (N,))


# ---------------------------------------------------------------------------
# fused int8 attention: matmul1 -> softmax -> (SoS) quantize -> matmul2
# ---------------------------------------------------------------------------

def _attn_math(q_in, kt_in, v_in, a1, b1, a2, b2, split, scale, a_out, *,
               sos: bool, in_q8: bool, out_q8: bool,
               A1_qmax: int, B1_qmax: int, A2_qmax: int, B2_qmax: int,
               O_qmax: int = 128, extra=None, relaxed: bool = False):
    """Shared per-head attention math: quantize -> q@kᵀ -> softmax ->
    (SoS) quantize -> @v, all in VMEM.  q_in (BM, hd), kt_in (hd, N),
    v_in (N, hd) -> (BM, hd); f32, or int8 when ``out_q8``.
    ``extra``: optional (BM, N) additive pre-softmax term (Swin relative
    position bias + shifted-window mask).
    ``relaxed``: run the post-logit VPU chain (exp, normalize, SoS/requant
    rounding) in bfloat16 with reciprocal-multiplies instead of divides —
    the attention kernel is VPU-bound on exactly this chain (BENCH_NOTES
    roofline), and bf16 halves its vector width.  Softmax levels can shift
    by one int8 step vs the exact path, so this mode intentionally breaks
    fused == fake-quant equality (opt-in, int8="fused_relaxed")."""
    if in_q8:
        q_int, kt_int, v_int = q_in, kt_in, v_in
    else:
        q_int = jnp.clip(jnp.round(q_in / a1), -A1_qmax, A1_qmax - 1) \
            .astype(jnp.int8)
        kt_int = jnp.clip(jnp.round(kt_in / b1), -B1_qmax, B1_qmax - 1) \
            .astype(jnp.int8)
        v_int = jnp.clip(jnp.round(v_in / b2), -B2_qmax, B2_qmax - 1) \
            .astype(jnp.int8)
    logits = _dot_i8(q_int, kt_int).astype(jnp.float32) * (a1 * b1 * scale)
    if extra is not None:
        logits = logits + extra
    if relaxed:
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.bfloat16))
        s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        p = e * (1.0 / s).astype(jnp.bfloat16)
    else:
        p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        p = p / jnp.sum(p, axis=-1, keepdims=True)

    def pv_dot(pi, vi):
        # (BM, N) int8 @ (N, hd) int8 -> (BM, hd) int32
        return jax.lax.dot_general(
            pi, vi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    if sos:
        # split-of-softmax twin ranges (reference matmul.py:595-598)
        a_int = split / (A2_qmax - 1)
        if relaxed:
            sp = split.astype(jnp.bfloat16)
            hi = jnp.clip(_rnd32(jnp.clip(p, sp, 1.0)
                                 * jnp.bfloat16(A2_qmax - 1)),
                          0, A2_qmax - 1).astype(jnp.int8)
            lo = jnp.clip(_rnd32(jnp.clip(p, jnp.bfloat16(0.0), sp)
                                 * (1.0 / a_int).astype(jnp.bfloat16)),
                          0, A2_qmax - 1).astype(jnp.int8)
        else:
            hi = jnp.clip(jnp.round(jnp.clip(p, split, 1.0) * (A2_qmax - 1)),
                          0, A2_qmax - 1).astype(jnp.int8)
            lo = jnp.clip(jnp.round(jnp.clip(p, 0.0, split) / a_int),
                          0, A2_qmax - 1).astype(jnp.int8)
        acc = (pv_dot(hi, v_int).astype(jnp.float32) / (A2_qmax - 1)
               + pv_dot(lo, v_int).astype(jnp.float32) * a_int)
    else:
        if relaxed:
            p_int = jnp.clip(_rnd32(p * (1.0 / a2).astype(jnp.bfloat16)),
                             -A2_qmax, A2_qmax - 1).astype(jnp.int8)
        else:
            p_int = jnp.clip(jnp.round(p / a2), -A2_qmax, A2_qmax - 1) \
                .astype(jnp.int8)
        acc = pv_dot(p_int, v_int).astype(jnp.float32) * a2
    out = acc * b2
    if out_q8:
        # re-quantize for the proj linear's int8 input (its a_qmax levels)
        if relaxed:
            return jnp.clip(_rnd32(out.astype(jnp.bfloat16)
                                   * (1.0 / a_out).astype(jnp.bfloat16)),
                            -O_qmax, O_qmax - 1).astype(jnp.int8)
        return jnp.clip(jnp.round(out / a_out), -O_qmax, O_qmax - 1) \
            .astype(jnp.int8)
    return out


def _attn_kernel(ph_ref, misc_ref, q_ref, kt_ref, v_ref, out_ref, *,
                 heads: int, **flags):
    g = pl.program_id(0)
    h = jax.lax.rem(g, heads)
    out_ref[0] = _attn_math(
        q_ref[0].astype(jnp.float32), kt_ref[0].astype(jnp.float32),
        v_ref[0].astype(jnp.float32),
        ph_ref[0, h], ph_ref[1, h], ph_ref[2, h], ph_ref[3, h],
        misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2],
        in_q8=False, **flags).astype(out_ref.dtype)


def _attn_kernel_qkv(ph_ref, misc_ref, q_ref, kt_ref, v_ref, out_ref, *,
                     hd: int, hp_n: int, in_q8: bool, **flags):
    # q/v sliced straight out of the (B, N, 3d) qkv buffer; out written
    # straight into the (B, N, d) layout the proj linear consumes.  Mosaic
    # needs 128-wide column blocks, so each grid step covers hp_n = 128/hd
    # heads and slices them apart in VMEM.
    hp = pl.program_id(1)
    q2 = q_ref[0] if in_q8 else q_ref[0].astype(jnp.float32)
    v2 = v_ref[0] if in_q8 else v_ref[0].astype(jnp.float32)
    outs = []
    for j in range(hp_n):
        h = hp * hp_n + j
        kt = kt_ref[0, j] if in_q8 else kt_ref[0, j].astype(jnp.float32)
        outs.append(_attn_math(
            q2[:, j * hd:(j + 1) * hd], kt, v2[:, j * hd:(j + 1) * hd],
            ph_ref[0, h], ph_ref[1, h], ph_ref[2, h], ph_ref[3, h],
            misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2],
            in_q8=in_q8, **flags))
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
    """Common scope checks; returns (ph (4,H), sos) or None."""
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


def _attn_misc(qp2, sos: bool, scale, a_out=None):
    return jnp.stack([
        jnp.asarray(qp2.split if sos else 0.0, jnp.float32).reshape(()),
        jnp.asarray(scale, jnp.float32).reshape(()),
        jnp.asarray(a_out if a_out is not None else 1.0,
                    jnp.float32).reshape(())]).reshape(1, 3)


def _attn_flags(qp1, qp2, sos: bool, o_qmax: int = 128,
                relaxed: bool = False):
    return dict(sos=sos, A1_qmax=qp1.A_qmax, B1_qmax=qp1.B_qmax,
                A2_qmax=qp2.A_qmax, B2_qmax=qp2.B_qmax, O_qmax=o_qmax,
                relaxed=relaxed)


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
        functools.partial(_attn_kernel, heads=H, out_q8=False,
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


def _qkv_hp(heads: int, hd: int):
    """Heads-per-step so column blocks are 128-wide; None if impossible."""
    if hd <= 128:
        if 128 % hd != 0:
            return None
        hp_n = 128 // hd
    elif hd % 128 == 0:
        hp_n = 1
    else:
        return None
    return hp_n if heads % hp_n == 0 else None


def fused_attention_qkv(qkv, heads: int, qp1, qp2, scale, *,
                        in_q8: bool = False, out_scale=None,
                        out_qmax: int = 128, relaxed: bool = False):
    """Layout-free fused attention: reads q/v straight out of the packed
    (B, N, 3d) qkv-linear output and writes (B, N, d) — no (B,H,N,hd)
    transpose materializes in HBM (only kᵀ is staged, d/3 of the buffer).

    in_q8: qkv is already int8 (quantized per-column by the qkv linear's
    ``out_q="vec"`` epilogue with exactly the a1/b1/b2 head scales).
    out_scale: when given, the context is re-quantized by this scalar and
    returned int8 (the proj linear's input scale).

    Returns (B, N, d) in qkv.dtype (int8 when out_scale), or None when out
    of scope.
    """
    B, N, d3 = qkv.shape
    d = d3 // 3
    hd = d // heads
    hp_n = _qkv_hp(heads, hd)
    if hp_n is None:
        return None
    scoped = _attn_scope(qp1, qp2, heads, hd)
    if scoped is None:
        return None
    ph, sos = scoped
    interpret = jax.default_backend() == "cpu"
    kt = jnp.transpose(qkv[:, :, d:2 * d].reshape(B, N, heads, hd),
                       (0, 2, 3, 1))                       # (B, heads, hd, N)
    misc = _attn_misc(qp2, sos, scale, out_scale)
    BM = _attn_bm(N, hd)
    bw = hp_n * hd                                          # 128 (or hd)
    out_dtype = jnp.int8 if out_scale is not None else qkv.dtype
    grid = (B, heads // hp_n, -(-N // BM))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_qkv, hd=hd, hp_n=hp_n, in_q8=in_q8,
                          out_q8=out_scale is not None,
                          **_attn_flags(qp1, qp2, sos, o_qmax=out_qmax,
                                        relaxed=relaxed)),
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
        out_shape=jax.ShapeDtypeStruct((B, N, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * heads * N * N * hd * (3 if sos else 2),
            bytes_accessed=2 * B * N * d3 * qkv.dtype.itemsize,
            transcendentals=B * heads * N * N),
        interpret=interpret,
    )(ph, misc, qkv, kt, qkv)
    return out


def _attn_kernel_win(ph_ref, misc_ref, q_ref, kt_ref, v_ref, bias_ref,
                     mask_ref, out_ref, *, hd: int, hp_n: int,
                     has_mask: bool, in_q8: bool, **flags):
    # Swin window attention: one window x hp_n heads per grid step; bias
    # (and shifted-window mask) added to the logits before softmax
    hp = pl.program_id(0)
    q2 = q_ref[0] if in_q8 else q_ref[0].astype(jnp.float32)  # (N, hp_n*hd)
    v2 = v_ref[0] if in_q8 else v_ref[0].astype(jnp.float32)
    mask = mask_ref[0] if has_mask else None
    outs = []
    for j in range(hp_n):
        h = hp * hp_n + j
        extra = bias_ref[j]
        if has_mask:
            extra = extra + mask
        kt = kt_ref[0, j] if in_q8 else kt_ref[0, j].astype(jnp.float32)
        outs.append(_attn_math(
            q2[:, j * hd:(j + 1) * hd], kt,
            v2[:, j * hd:(j + 1) * hd],
            ph_ref[0, h], ph_ref[1, h], ph_ref[2, h], ph_ref[3, h],
            misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2],
            in_q8=in_q8, extra=extra, **flags))
    out_ref[0] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


def fused_window_attention_qkv(qkv, heads: int, nW: int, qp1, qp2,
                               prescale, bias, mask, *,
                               in_q8: bool = False, out_scale=None,
                               out_qmax: int = 128, relaxed: bool = False):
    """Fused Swin window attention from the (B_, N, 3C) qkv-linear output,
    B_ = B*nW windows: softmax(q·s @ kᵀ + bias [+ mask]) @ v per head, with
    the reference's PRE-scaled q quantization (utils/models.py:34 — q is
    multiplied by s before matmul1, so the A operand quantizes q·s; here
    that folds into the quantize scale a1/s with the logit rescale a1·b1).

    bias: (H, N, N) relative-position bias;  mask: (nW, N, N) additive
    shifted-window mask or None.
    in_q8: qkv is already int8, per-column-quantized by the qkv linear's
    ``out_q="vec"`` epilogue with the (a1/s, b1, b2) head scales.
    out_scale: when given, the context is re-quantized by this scalar and
    returned int8 (the proj linear's input scale).
    Returns (B_, N, C) in qkv.dtype (int8 when out_scale), or None when
    out of scope.
    """
    B_, N, c3 = qkv.shape
    C = c3 // 3
    hd = C // heads
    hp_n = _qkv_hp(heads, hd)
    if hp_n is None or B_ % nW != 0:
        return None
    scoped = _attn_scope(qp1, qp2, heads, hd)
    if scoped is None:
        return None
    ph, sos = scoped
    # quantize q with a1/s, rescale logits by (a1/s)*b1*s = a1*b1
    s = jnp.float32(prescale)
    ph = ph.at[0].divide(s)
    # full-window row tiles only (N is small for windows)
    if _attn_bm(N, hd) < N:
        return None
    interpret = jax.default_backend() == "cpu"
    kt = jnp.transpose(qkv[:, :, C:2 * C].reshape(B_, N, heads, hd),
                       (0, 2, 3, 1))                      # (B_, heads, hd, N)
    misc = _attn_misc(qp2, sos, s, out_scale)
    bw = hp_n * hd
    bias3 = jnp.asarray(bias, jnp.float32)
    has_mask = mask is not None
    mask3 = (jnp.asarray(mask, jnp.float32) if has_mask
             else jnp.zeros((1, N, N), jnp.float32))
    out_dtype = jnp.int8 if out_scale is not None else qkv.dtype
    # hp outermost (slowest): the bias block is then constant over the
    # whole (b, w) sweep and stays VMEM-resident instead of being
    # re-fetched every window
    grid = (heads // hp_n, B_ // nW, nW)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_win, hd=hd, hp_n=hp_n,
                          has_mask=has_mask, in_q8=in_q8,
                          out_q8=out_scale is not None,
                          **_attn_flags(qp1, qp2, sos, o_qmax=out_qmax,
                                        relaxed=relaxed)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N, bw), lambda hp, b, w, _n=nW: (b * _n + w,
                                                              0, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp_n, hd, N),
                         lambda hp, b, w, _n=nW: (b * _n + w, hp, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, bw),
                         lambda hp, b, w, _n=nW, _v0=2 * heads // hp_n:
                         (b * _n + w, 0, _v0 + hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp_n, N, N), lambda hp, b, w: (hp, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N),
                         (lambda hp, b, w: (w, 0, 0)) if has_mask
                         else (lambda hp, b, w: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, bw),
                               lambda hp, b, w, _n=nW: (b * _n + w, 0, hp),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N, C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * heads * N * N * hd * (3 if sos else 2),
            bytes_accessed=2 * B_ * N * c3 * qkv.dtype.itemsize
            + heads * N * N * 4,
            transcendentals=B_ * heads * N * N),
        interpret=interpret,
    )(ph, misc, qkv, kt, qkv, bias3, mask3)
    return out


# ---------------------------------------------------------------------------
# dispatch helpers
# ---------------------------------------------------------------------------

def _linear_scope(qp):
    n_V, _, n_H, _ = qp.w_interval.shape
    return not (n_H != 1 or qp.a_interval.shape[0] != 1 or qp.a_bit >= 32
                or qp.a_bit > 8 or qp.w_bit > 8)


def _packed_or_compute(w, qp, pk):
    """(w_intT, w_scale) from the packed dict, else on the fly."""
    w_intT, w_scale = pk.get("w_intT"), pk.get("w_scale")
    if w_intT is None or w_scale is None:
        from ..quant import fakequant as fq
        n_V = qp.w_interval.shape[0]
        oc, ic = w.shape
        w4 = w.astype(jnp.float32).reshape(n_V, oc // n_V, ic)
        w_intT = fq.int_quant(w4, qp.w_interval[:, :, 0], qp.w_qmax) \
            .astype(jnp.int8).reshape(oc, ic).T
        w_scale = jnp.broadcast_to(
            qp.w_interval[:, :, 0, 0].astype(jnp.float32),
            (n_V, oc // n_V)).reshape(oc)
    return w_intT, w_scale


def fused_linear(x, w, b, qp, pk, epilogue: str = None,
                 relaxed: bool = False):
    """Dispatch a LinearQP through the fused kernel when its layout is in
    scope; returns None to fall back to the XLA int8 path."""
    if not _linear_scope(qp):
        return None
    w_intT, w_scale = _packed_or_compute(w, qp, pk)
    return q8_linear(x, w_intT, w_scale, b,
                     qp.a_interval[0, 0], qp.a_neg_interval,
                     a_qmax=qp.a_qmax, postgelu=qp.postgelu,
                     epilogue=epilogue, relaxed=relaxed)


# ---------------------------------------------------------------------------
# whole-block fusion: intermediate activations cross HBM as int8, once
# ---------------------------------------------------------------------------

def fused_vit_block(x, blk, qps, pks, heads: int, scale, ln_eps,
                    relaxed: bool = False):
    """One pre-norm transformer block (LN -> qkv -> attention -> proj ->
    residual -> LN -> fc1/GELU -> fc2 -> residual) with int8 handoffs:

      * LN1/LN2 fused into the qkv/fc1 kernels' prologue;
      * qkv output emitted int8, per-column-quantized with the attention's
        a1/b1/b2 head scales — the attention kernel consumes it directly;
      * attention context emitted int8 at the proj input scale;
      * fc1 output GELU'd and twin-packed int8 for fc2.

    x: (B, N, d).  blk: the block's parameter dict (models/vit.py layout).
    qps: {op-suffix: QP} for qkv/matmul1/matmul2/proj/fc1/fc2.
    pks: {op-suffix: packed entry} (ops/pack.pack_weights).
    Returns the new residual stream, or None when any piece is out of
    scope (the caller then runs the generic per-op path).
    """
    B, N, d = x.shape
    hd = d // heads
    qp_qkv, qp1, qp2, qp_proj, qp_fc1, qp_fc2 = (
        qps.get(k) for k in ("qkv", "matmul1", "matmul2", "proj",
                             "fc1", "fc2"))
    if any(qp is None for qp in (qp_qkv, qp1, qp2, qp_proj, qp_fc1, qp_fc2)):
        return None
    for qp in (qp_qkv, qp_proj, qp_fc1, qp_fc2):
        if not _linear_scope(qp):
            return None
    if qp_qkv.postgelu or qp_proj.postgelu or qp_fc1.postgelu \
            or not qp_fc2.postgelu:
        return None
    if _qkv_hp(heads, hd) is None or _attn_scope(qp1, qp2, heads, hd) is None:
        return None
    # the qkv -> attention handoff quantizes q/k/v in the qkv epilogue with
    # the attention's own head scales — one qmax must cover all sections
    # (any common level count <= 8 bits works, e.g. the W6A6 grid's 32)
    if not (qp1.A_qmax == qp1.B_qmax == qp2.B_qmax):
        return None
    attn_qmax = qp1.A_qmax

    a1 = _head_scalar(qp1.A_interval, heads)
    b1 = _head_scalar(qp1.B_interval, heads)
    b2 = _head_scalar(qp2.B_interval, heads)
    col_scales = jnp.concatenate([
        jnp.repeat(a1, hd), jnp.repeat(b1, hd), jnp.repeat(b2, hd)])

    attn = blk["attn"]
    mlp = blk["mlp"]
    w_qkv = _packed_or_compute(attn["qkv"]["weight"], qp_qkv,
                               pks.get("qkv") or {})
    w_proj = _packed_or_compute(attn["proj"]["weight"], qp_proj,
                                pks.get("proj") or {})
    w_fc1 = _packed_or_compute(mlp["fc1"]["weight"], qp_fc1,
                               pks.get("fc1") or {})
    w_fc2 = _packed_or_compute(mlp["fc2"]["weight"], qp_fc2,
                               pks.get("fc2") or {})

    # LN1 -> quantize(a_qkv) -> int8 qkv -> per-column requant (int8 out)
    qkv_q = q8_linear(x, w_qkv[0], w_qkv[1], attn["qkv"]["bias"],
                      qp_qkv.a_interval[0, 0], None,
                      a_qmax=qp_qkv.a_qmax, postgelu=False,
                      ln=(blk["norm1"]["weight"], blk["norm1"]["bias"],
                          ln_eps),
                      out_q="vec", out_scale=col_scales, out_qmax=attn_qmax,
                      relaxed=relaxed)
    if qkv_q is None:
        return None
    # attention on the pre-quantized buffer; context requantized for proj
    y_q = fused_attention_qkv(qkv_q, heads, qp1, qp2, scale, in_q8=True,
                              out_scale=qp_proj.a_interval[0, 0],
                              out_qmax=qp_proj.a_qmax, relaxed=relaxed)
    if y_q is None:
        return None
    # residual add fused into the proj epilogue (no separate x+y pass)
    y = q8_linear(y_q, w_proj[0], w_proj[1], attn["proj"]["bias"],
                  qp_proj.a_interval[0, 0], None,
                  a_qmax=qp_proj.a_qmax, postgelu=False, in_q="q8",
                  float_dtype=x.dtype, residual=x, relaxed=relaxed)
    if y is None:
        return None
    x = y
    # LN2 -> fc1 -> GELU -> twin-pack (int8) -> fc2 (twin input)
    z_q = q8_linear(x, w_fc1[0], w_fc1[1], mlp["fc1"]["bias"],
                    qp_fc1.a_interval[0, 0], None,
                    a_qmax=qp_fc1.a_qmax, postgelu=False,
                    ln=(blk["norm2"]["weight"], blk["norm2"]["bias"],
                        ln_eps),
                    epilogue="gelu", out_q="twin",
                    out_scale=(qp_fc2.a_interval[0, 0],
                               qp_fc2.a_neg_interval),
                    out_qmax=qp_fc2.a_qmax, relaxed=relaxed)
    if z_q is None:
        return None
    z = q8_linear(z_q, w_fc2[0], w_fc2[1], mlp["fc2"]["bias"],
                  qp_fc2.a_interval[0, 0], qp_fc2.a_neg_interval,
                  a_qmax=qp_fc2.a_qmax, postgelu=True, in_q="q8twin",
                  float_dtype=x.dtype, residual=x, relaxed=relaxed)
    return z


def _win_qkv_kernel(scal_ref, lnw_ref, lnb_ref, x_ref, w_ref, ws_ref,
                    b_ref, osc_ref, out_ref, *, a_qmax: int, ws: int,
                    nwi: int, out_qmax: int, relaxed: bool = False):
    # image-layout ROW BAND (1, ws, res, C) — one row of nwi windows; the
    # Mosaic block constraint only binds the last two dims, so the band is
    # readable while a single (ws, ws, C) window is not.  Windows split
    # apart in VMEM -> LN -> quantize -> int8 qkv -> per-column requant ->
    # window-layout (nwi, N, BN) int8
    a = scal_ref[0, 0]
    C = x_ref.shape[-1]
    N = ws * ws
    band = x_ref[0].reshape(ws, nwi, ws, C).transpose(1, 0, 2, 3)
    x = band.reshape(nwi * N, C).astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    x = ((x - mu) * jax.lax.rsqrt(var + scal_ref[0, 1])
         * lnw_ref[0, :][None, :] + lnb_ref[0, :][None, :])
    xq = jnp.clip(jnp.round(x / a), -a_qmax, a_qmax - 1).astype(jnp.int8)
    out = (_dot_i8(xq, w_ref[:]).astype(jnp.float32) * a
           * ws_ref[0, :][None, :] + b_ref[0, :][None, :])
    osc = osc_ref[0, :][None, :]
    if relaxed:
        q = _rnd32(out.astype(jnp.bfloat16) * (1.0 / osc)
                   .astype(jnp.bfloat16))
    else:
        q = jnp.round(out / osc)
    out_ref[:] = jnp.clip(q, -out_qmax, out_qmax - 1) \
        .astype(jnp.int8).reshape(nwi, N, -1)


def _win_proj_kernel(scal_ref, x_ref, w_ref, ws_ref, b_ref, res_ref,
                     out_ref, *, ws: int, nwi: int):
    # window-layout int8 context (nwi, N, C) -> proj -> + residual (image
    # row band) -> image-layout (1, ws, res, C): the window-reverse
    # permutation never materializes
    a = scal_ref[0, 0]
    Co = out_ref.shape[-1]
    N = ws * ws
    acc = _dot_i8(x_ref[:].reshape(nwi * N, -1), w_ref[:]) \
        .astype(jnp.float32) * a
    out = acc * ws_ref[0, :][None, :] + b_ref[0, :][None, :]
    band = out.reshape(nwi, ws, ws, Co).transpose(1, 0, 2, 3) \
        .reshape(ws, nwi * ws, Co)
    band = band + res_ref[0].astype(jnp.float32)
    out_ref[0] = band.astype(out_ref.dtype)


def _q8_win_qkv(x4, w_intT, w_scale, b, a_interval, ln, ws: int, col_scales,
                a_qmax: int, out_qmax: int, interpret: bool,
                relaxed: bool = False):
    """qkv over an UNSHIFTED window grid straight from the (B, res, res, C)
    image layout (window partition folded into the read pattern)."""
    B, res, _, C = x4.shape
    N3 = w_intT.shape[1]
    nwi = res // ws
    N = ws * ws
    scal = jnp.stack([jnp.asarray(a_interval, jnp.float32).reshape(()),
                      jnp.asarray(ln[2], jnp.float32).reshape(())]) \
        .reshape(1, 2)
    lnw = ln[0].astype(jnp.float32).reshape(1, C)
    lnb = ln[1].astype(jnp.float32).reshape(1, C)
    ws2 = w_scale.astype(jnp.float32).reshape(1, N3)
    b2 = (b.astype(jnp.float32) if b is not None
          else jnp.zeros((N3,), jnp.float32)).reshape(1, N3)
    osc = col_scales.astype(jnp.float32).reshape(1, N3)
    band_vmem = (nwi * N * (C * 5 + N3) + ws * res * C * 4) * 2
    if band_vmem > _VMEM_BUDGET or C * N3 > _W_SLAB_MAX * 4:
        return None
    grid = (B, nwi)
    return pl.pallas_call(
        functools.partial(_win_qkv_kernel, a_qmax=a_qmax, ws=ws, nwi=nwi,
                          out_qmax=out_qmax, relaxed=relaxed),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, res, C), lambda bb, wi: (bb, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, N3), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N3), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N3), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N3), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nwi, N, N3),
            lambda bb, wi, _w=nwi: (bb * _w + wi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nwi * nwi, N, N3), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * res * res * C * N3,
            bytes_accessed=B * res * res * C * x4.dtype.itemsize
            + C * N3 + B * res * res * N3,
            transcendentals=0),
        interpret=interpret,
    )(scal, lnw, lnb, x4, w_intT, ws2, b2, osc)


def _q8_win_proj(y_q, w_intT, w_scale, b, a_interval, ws: int, res: int,
                 residual4, interpret: bool):
    """proj over window-layout int8 context, emitting the IMAGE layout with
    the residual stream added in-kernel (reverse permutation + x+y pass
    both folded away).  Unshifted grids only."""
    B_, N, C = y_q.shape
    nwi = res // ws
    B = B_ // (nwi * nwi)
    Co = w_intT.shape[1]
    band_vmem = (nwi * N * (C + Co * 4) + 2 * ws * res * Co * 4) * 2
    if band_vmem > _VMEM_BUDGET or C * Co > _W_SLAB_MAX * 4:
        return None
    scal = jnp.asarray(a_interval, jnp.float32).reshape(1, 1)
    ws2 = w_scale.astype(jnp.float32).reshape(1, Co)
    b2 = (b.astype(jnp.float32) if b is not None
          else jnp.zeros((Co,), jnp.float32)).reshape(1, Co)
    grid = (B, nwi)
    return pl.pallas_call(
        functools.partial(_win_proj_kernel, ws=ws, nwi=nwi),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nwi, N, C),
                         lambda bb, wi, _w=nwi: (bb * _w + wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Co), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda bb, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, res, Co), lambda bb, wi: (bb, wi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, res, Co),
                               lambda bb, wi: (bb, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, res, res, Co), residual4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * N * C * Co,
            bytes_accessed=B_ * N * C + C * Co
            + 2 * B * res * res * Co * residual4.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(scal, y_q, w_intT, ws2, b2, residual4)


def fused_swin_block(x, blk, qps, pks, heads: int, ws: int, shift: int,
                     res: int, bias, mask, ln_eps, relaxed: bool = False):
    """One Swin block with int8 handoffs — the window analogue of
    :func:`fused_vit_block`:

      * the token stream is rolled/window-partitioned FIRST (a pure
        permutation, so the per-token LayerNorm commutes) and LN1 runs in
        the qkv kernel's prologue on the windowed layout;
      * qkv output emitted int8, per-column-quantized with (a1/s, b1, b2)
        head scales — a1 folded with the PRE-scaled-q quantization of the
        reference (utils/models.py:34);
      * window attention (rel-pos bias + shifted mask in-kernel) consumes
        the int8 buffer and emits the context int8 at the proj scale;
      * proj output is window-reversed/unrolled back to (B, res*res, C);
      * LN2 -> fc1/GELU -> twin-packed int8 -> fc2 as in the ViT block.

    x: (B, res*res, C).  bias: (H, N, N); mask: (nW, N, N) or None.
    Returns the new residual stream or None when out of scope.
    """
    from ..models.swin import window_partition, window_reverse
    B, T, C = x.shape
    hd = C // heads
    N = ws * ws
    qp_qkv, qp1, qp2, qp_proj, qp_fc1, qp_fc2 = (
        qps.get(k) for k in ("qkv", "matmul1", "matmul2", "proj",
                             "fc1", "fc2"))
    if any(qp is None for qp in (qp_qkv, qp1, qp2, qp_proj, qp_fc1, qp_fc2)):
        return None
    for qp in (qp_qkv, qp_proj, qp_fc1, qp_fc2):
        if not _linear_scope(qp):
            return None
    if qp_qkv.postgelu or qp_proj.postgelu or qp_fc1.postgelu \
            or not qp_fc2.postgelu:
        return None
    scoped = _attn_scope(qp1, qp2, heads, hd)
    if _qkv_hp(heads, hd) is None or scoped is None or _attn_bm(N, hd) < N:
        return None
    if not (qp1.A_qmax == qp1.B_qmax == qp2.B_qmax):
        return None  # one clip range must cover the packed q/k/v columns
    attn_qmax = qp1.A_qmax

    s = hd ** -0.5
    a1 = _head_scalar(qp1.A_interval, heads) / jnp.float32(s)
    b1 = _head_scalar(qp1.B_interval, heads)
    b2 = _head_scalar(qp2.B_interval, heads)
    col_scales = jnp.concatenate([
        jnp.repeat(a1, hd), jnp.repeat(b1, hd), jnp.repeat(b2, hd)])

    attn = blk["attn"]
    mlp = blk["mlp"]
    w_qkv = _packed_or_compute(attn["qkv"]["weight"], qp_qkv,
                               pks.get("qkv") or {})
    w_proj = _packed_or_compute(attn["proj"]["weight"], qp_proj,
                                pks.get("proj") or {})
    w_fc1 = _packed_or_compute(mlp["fc1"]["weight"], qp_fc1,
                               pks.get("fc1") or {})
    w_fc2 = _packed_or_compute(mlp["fc2"]["weight"], qp_fc2,
                               pks.get("fc2") or {})

    interpret = jax.default_backend() == "cpu"
    nW = mask.shape[0] if mask is not None else 1
    ln1 = (blk["norm1"]["weight"], blk["norm1"]["bias"], ln_eps)
    qkv_q = None
    if res % ws == 0 and C % 128 == 0:
        # the window partition is a plain rectangular tiling of the
        # (possibly rolled) image, so qkv reads one row-band of windows
        # per grid step straight from the image layout and proj writes
        # straight back with the residual added in-kernel — partition,
        # reverse, and x+y passes never materialize.  For shifted blocks
        # the whole pipeline runs in ROLLED coordinates (the residual
        # commutes with the permutation: unroll(roll(x) + y_rolled)
        # == x + unroll(y_rolled)), leaving only roll/unroll passes.
        x4 = x.reshape(B, res, res, C)
        if shift > 0:
            x4 = jnp.roll(x4, (-shift, -shift), axis=(1, 2))
        qkv_q = _q8_win_qkv(x4, w_qkv[0], w_qkv[1], attn["qkv"]["bias"],
                            qp_qkv.a_interval[0, 0], ln1, ws, col_scales,
                            qp_qkv.a_qmax, attn_qmax, interpret,
                            relaxed=relaxed)
    if qkv_q is not None:
        y_q = fused_window_attention_qkv(qkv_q, heads, nW, qp1, qp2, s,
                                         bias, mask, in_q8=True,
                                         out_scale=qp_proj.a_interval[0, 0],
                                         out_qmax=qp_proj.a_qmax,
                                         relaxed=relaxed)
        if y_q is None:
            return None
        y4 = _q8_win_proj(y_q, w_proj[0], w_proj[1], attn["proj"]["bias"],
                          qp_proj.a_interval[0, 0], ws, res, x4, interpret)
        if y4 is None:
            return None
        if shift > 0:
            y4 = jnp.roll(y4, (shift, shift), axis=(1, 2))
        x = y4.reshape(B, T, C)
    else:
        # out-of-scope geometry: roll + partition (pure permutations; LN
        # is per-token), generic fused linears, explicit residual add
        y = x.reshape(B, res, res, C)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        yw = window_partition(y, ws)                      # (B*nW, N, C)
        qkv_q = q8_linear(yw, w_qkv[0], w_qkv[1], attn["qkv"]["bias"],
                          qp_qkv.a_interval[0, 0], None,
                          a_qmax=qp_qkv.a_qmax, postgelu=False, ln=ln1,
                          out_q="vec", out_scale=col_scales,
                          out_qmax=attn_qmax, relaxed=relaxed)
        if qkv_q is None:
            return None
        y_q = fused_window_attention_qkv(qkv_q, heads, nW, qp1, qp2, s,
                                         bias, mask, in_q8=True,
                                         out_scale=qp_proj.a_interval[0, 0],
                                         out_qmax=qp_proj.a_qmax,
                                         relaxed=relaxed)
        if y_q is None:
            return None
        yw = q8_linear(y_q, w_proj[0], w_proj[1], attn["proj"]["bias"],
                       qp_proj.a_interval[0, 0], None,
                       a_qmax=qp_proj.a_qmax, postgelu=False, in_q="q8",
                       float_dtype=x.dtype)
        if yw is None:
            return None
        y = window_reverse(yw, ws, res, res)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y.reshape(B, T, C)

    # LN2 -> fc1 -> GELU -> twin-pack (int8) -> fc2 (twin input)
    z_q = q8_linear(x, w_fc1[0], w_fc1[1], mlp["fc1"]["bias"],
                    qp_fc1.a_interval[0, 0], None,
                    a_qmax=qp_fc1.a_qmax, postgelu=False,
                    ln=(blk["norm2"]["weight"], blk["norm2"]["bias"],
                        ln_eps),
                    epilogue="gelu", out_q="twin",
                    out_scale=(qp_fc2.a_interval[0, 0],
                               qp_fc2.a_neg_interval),
                    out_qmax=qp_fc2.a_qmax, relaxed=relaxed)
    if z_q is None:
        return None
    z = q8_linear(z_q, w_fc2[0], w_fc2[1], mlp["fc2"]["bias"],
                  qp_fc2.a_interval[0, 0], qp_fc2.a_neg_interval,
                  a_qmax=qp_fc2.a_qmax, postgelu=True, in_q="q8twin",
                  float_dtype=x.dtype, residual=x, relaxed=relaxed)
    return z
