"""Pallas TPU kernel: fused candidate-scored linear search.

The XLA path of the weight-interval search materializes
``out_sim = x_sim @ W_pᵀ`` for P candidates — an (M, P, oc) fp32 tensor
written to and re-read from HBM just to be reduced into P scalars
(calib/search.py score_w).  This kernel fuses quantize(W; Δ_p) → matmul →
hessian similarity → reduction entirely in VMEM: HBM traffic drops from
O(M·P·oc) to O(P·(M·ic + M·oc + oc·ic) tile reads), and the MXU never waits
on the writeback.

Scope: the production-config case (n_V = n_H = 1, hessian metric —
configs/PTQ4ViT.py:16-48 in hahnyuan/PTQ4ViT).  The general blocked cases
stay on the XLA path (calib/search.py).

The kernel computes ``sims[p] = -Σ_{m,o} (g·(raw' − x@Q(W;Δ_p)ᵀ))²`` with
raw' = raw − bias pre-subtracted; the caller rescales by 1/(T·oc) to match
the reference's mean-then-sum reduction (a uniform positive factor —
argmax-invariant).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _ploop_default() -> bool:
    """Candidate-loop-in-kernel layout (default).

    The original linear-scorer layout put the candidate index in the GRID
    (P, M, O): every candidate re-DMAs every x/w/raw/grad tile, so at
    big-M ops (Swin stage-0 at 128 imgs: M = 1.2M rows) the kernel is
    ~8x DMA-bound (raw+grad tiles alone are ~260 KB/step x P=100 sweeps).
    The p-loop layout uses grid (M, O) with a fori_loop over candidates
    INSIDE the kernel — each tile is read once per score call, the
    per-candidate work is pure MXU/VPU on VMEM-resident values, and the
    per-candidate accumulation order over (m, o) tiles is unchanged, so
    results are BITWISE-equal to the grid layout
    (test_linear_scorer_ploop_bitwise_equal).
    PTQ4VIT_TPU_SCORER_PLOOP=0 restores the grid layout for device A/Bs.
    """
    return os.environ.get("PTQ4VIT_TPU_SCORER_PLOOP", "1") != "0"


def _kernel(cand_ref, x_ref, w_ref, raw_ref, g_ref, out_ref, *,
            qmax: int, n_V: int, crb_tiles: int):
    p = pl.program_id(0)
    m = pl.program_id(1)
    o = pl.program_id(2)
    # row-block (n_V) this output tile belongs to; oc padding tiles clamp to
    # the last block and contribute zero (their grad rows are zero)
    v = jnp.minimum(o // crb_tiles, n_V - 1)
    delta = cand_ref[p, v]                  # candidates (P, n_V) in SMEM
    w_sim = jnp.clip(jnp.round(w_ref[:] / delta), -qmax, qmax - 1) * delta
    out = jax.lax.dot_general(
        x_ref[:], w_sim, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # TM, TO
    d = g_ref[:] * (raw_ref[:] - out)
    part = -jnp.sum(d * d)

    @pl.when((m == 0) & (o == 0))
    def _():
        for vv in range(n_V):
            out_ref[p, vv] = 0.0

    out_ref[p, v] += part


def _kernel_ploop(cand_ref, x_ref, w_ref, raw_ref, g_ref, out_ref, *,
                  qmax: int, n_V: int, crb_tiles: int, P: int):
    """Grid (M, O); all P candidates scored in-kernel on the resident tile
    (see _ploop_default)."""
    m = pl.program_id(0)
    o = pl.program_id(1)
    v = jnp.minimum(o // crb_tiles, n_V - 1)

    @pl.when((m == 0) & (o == 0))
    def _():
        def z(p, _):
            for vv in range(n_V):
                out_ref[p, vv] = 0.0
            return 0
        jax.lax.fori_loop(0, P, z, 0)

    x = x_ref[:]
    w = w_ref[:]
    raw = raw_ref[:]
    g = g_ref[:]

    def body(p, _):
        delta = cand_ref[p, v]
        w_sim = jnp.clip(jnp.round(w / delta), -qmax, qmax - 1) * delta
        out = jax.lax.dot_general(
            x, w_sim, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = g * (raw - out)
        out_ref[p, v] += -jnp.sum(d * d)
        return 0

    jax.lax.fori_loop(0, P, body, 0)


def pallas_tile_ok(oc: int, n_V: int) -> bool:
    """The output tile must not straddle row blocks: TO | oc/n_V."""
    return n_V == 1 or (oc % n_V == 0 and (oc // n_V) % 128 == 0)


@functools.partial(jax.jit, static_argnames=("qmax", "interpret"))
def linear_w_hessian_sims(x_sim, w, cands, raw_minus_bias, grad,
                          qmax: int, interpret: bool = None):
    """Fused scorer.

    x_sim:          (M, ic) already input-quantized activations
    w:              (oc, ic) fp32 weight
    cands:          (P,) or (P, n_V) candidate scale values (n_H = 1;
                    n_V row blocks need TO | oc/n_V — see pallas_tile_ok)
    raw_minus_bias: (M, oc) FP32 reference output with bias pre-subtracted
    grad:           (M, oc) ∂L/∂out
    Returns (P,) or (P, n_V) float32 un-normalized similarity sums.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, ic = x_sim.shape
    oc = w.shape[0]
    P = cands.shape[0]
    squeeze = cands.ndim == 1
    if squeeze:
        cands = cands[:, None]
    n_V = cands.shape[1]

    # tile choice under the VMEM budget: x/w tiles plus raw/grad/out tiles,
    # double-buffered by the pipeline
    icp = _round_up(ic, 128)
    TM = TO = None
    for tm, to in ((512, 256), (256, 256), (256, 128), (128, 128),
                   (64, 128), (32, 128)):
        if n_V > 1 and (oc // n_V) % to != 0:
            continue
        if (tm * icp + to * icp + 2 * tm * to) * 4 * 2 <= 10 << 20:
            TM, TO = tm, to
            break
    if TM is None:
        TM, TO = 32, 128
    crb_tiles = (oc // n_V) // TO if n_V > 1 else 1 << 30
    Mp, ocp = _round_up(M, TM), _round_up(oc, TO)
    # zero padding is exact: padded grad rows/cols contribute 0 to the sum,
    # padded ic columns multiply zero weights
    x_sim = jnp.pad(x_sim, ((0, Mp - M), (0, icp - ic)))
    w = jnp.pad(w, ((0, ocp - oc), (0, icp - ic)))
    raw_minus_bias = jnp.pad(raw_minus_bias, ((0, Mp - M), (0, ocp - oc)))
    grad = jnp.pad(grad, ((0, Mp - M), (0, ocp - oc)))

    if _ploop_default():
        grid = (Mp // TM, ocp // TO)
        kern = functools.partial(_kernel_ploop, qmax=qmax, n_V=n_V,
                                 crb_tiles=crb_tiles, P=P)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, icp), lambda m, o: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, icp), lambda m, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda m, o: (m, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda m, o: (m, o),
                         memory_space=pltpu.VMEM),
        ]
    else:
        grid = (P, Mp // TM, ocp // TO)
        kern = functools.partial(_kernel, qmax=qmax, n_V=n_V,
                                 crb_tiles=crb_tiles)
        in_specs = [
            # whole candidate vector in SMEM, indexed by program_id(0)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, icp), lambda p, m, o: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, icp), lambda p, m, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda p, m, o: (m, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda p, m, o: (m, o),
                         memory_space=pltpu.VMEM),
        ]
    sims = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((P, n_V), jnp.float32),
        interpret=interpret,
    )(cands.astype(jnp.float32), x_sim, w, raw_minus_bias, grad)
    return sims[:, 0] if squeeze else sims


# ---------------------------------------------------------------------------
# int8-scored variants: the candidate dot runs on the MXU's int8 ports
# (~1.6x the fp32 rate on v5e) with ONE fp32 rescale after the int32
# accumulation.  Mathematically equal to the fp32 scorer, but the single
# rescale rounds differently from per-accumulation fp32 rounding, so sims
# (and, rarely, argmaxes) can differ in the last ulp — gated behind the
# int8-scoring flag (calib/search.py _int8_score_default; divergence
# characterized in scripts/int8_score_divergence.py + README parity notes).
# ---------------------------------------------------------------------------

def _dot_i8(a, b_t):
    """(M, K) int8 @ (N, K)ᵀ int8 -> (M, N) int32 on the MXU."""
    return jax.lax.dot_general(
        a, b_t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def _kernel_i8(cand_ref, scal_ref, x_ref, xn_ref, w_ref, raw_ref, g_ref,
               out_ref, *, qmax: int, n_V: int, crb_tiles: int, twin: bool):
    p = pl.program_id(0)
    m = pl.program_id(1)
    o = pl.program_id(2)
    v = jnp.minimum(o // crb_tiles, n_V - 1)
    delta = cand_ref[p, v]
    a = scal_ref[0, 0]
    w_lv = jnp.clip(jnp.round(w_ref[:] / delta), -qmax, qmax - 1) \
        .astype(jnp.int8)
    acc = _dot_i8(x_ref[:], w_lv).astype(jnp.float32) * (a * delta)
    if twin:
        a_neg = scal_ref[0, 1]
        acc += _dot_i8(xn_ref[:], w_lv).astype(jnp.float32) * (a_neg * delta)
    d = g_ref[:] * (raw_ref[:] - acc)
    part = -jnp.sum(d * d)

    @pl.when((m == 0) & (o == 0))
    def _():
        for vv in range(n_V):
            out_ref[p, vv] = 0.0

    out_ref[p, v] += part


def _kernel_i8_ploop(cand_ref, scal_ref, x_ref, xn_ref, w_ref, raw_ref,
                     g_ref, out_ref, *, qmax: int, n_V: int, crb_tiles: int,
                     twin: bool, P: int):
    """Grid (M, O) int8-scored variant of _kernel_ploop."""
    m = pl.program_id(0)
    o = pl.program_id(1)
    v = jnp.minimum(o // crb_tiles, n_V - 1)

    @pl.when((m == 0) & (o == 0))
    def _():
        def z(p, _):
            for vv in range(n_V):
                out_ref[p, vv] = 0.0
            return 0
        jax.lax.fori_loop(0, P, z, 0)

    a = scal_ref[0, 0]
    x = x_ref[:]
    w = w_ref[:]
    raw = raw_ref[:]
    g = g_ref[:]
    if twin:
        a_neg = scal_ref[0, 1]
        xn = xn_ref[:]

    def body(p, _):
        delta = cand_ref[p, v]
        w_lv = jnp.clip(jnp.round(w / delta), -qmax, qmax - 1) \
            .astype(jnp.int8)
        acc = _dot_i8(x, w_lv).astype(jnp.float32) * (a * delta)
        if twin:
            acc += _dot_i8(xn, w_lv).astype(jnp.float32) * (a_neg * delta)
        d = g * (raw - acc)
        out_ref[p, v] += -jnp.sum(d * d)
        return 0

    jax.lax.fori_loop(0, P, body, 0)


@functools.partial(jax.jit, static_argnames=("qmax", "interpret"))
def linear_w_hessian_sims_i8(x_lv, x_neg_lv, a, a_neg, w, cands,
                             raw_minus_bias, grad, qmax: int,
                             interpret: bool = None):
    """int8-scored weight-interval search (n_a = 1 so the input scale is a
    scalar that factors out of the contraction).

    x_lv:     (M, ic) int8 input levels (positive/full set)
    x_neg_lv: (M, ic) int8 negative twin levels, or None (non-postgelu)
    a, a_neg: scalar input interval(s); a_neg ignored when x_neg_lv is None
    Other args/returns as :func:`linear_w_hessian_sims`.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, ic = x_lv.shape
    oc = w.shape[0]
    P = cands.shape[0]
    squeeze = cands.ndim == 1
    if squeeze:
        cands = cands[:, None]
    n_V = cands.shape[1]
    twin = x_neg_lv is not None

    icp = _round_up(ic, 128)
    TM = TO = None
    for tm, to in ((512, 256), (256, 256), (256, 128), (128, 128),
                   (64, 128), (32, 128)):
        if n_V > 1 and (oc // n_V) % to != 0:
            continue
        if (tm * icp + to * icp + 2 * tm * to) * 4 * 2 <= 10 << 20:
            TM, TO = tm, to
            break
    if TM is None:
        TM, TO = 32, 128
    crb_tiles = (oc // n_V) // TO if n_V > 1 else 1 << 30
    Mp, ocp = _round_up(M, TM), _round_up(oc, TO)
    x_lv = jnp.pad(x_lv, ((0, Mp - M), (0, icp - ic)))
    xn = (jnp.pad(x_neg_lv, ((0, Mp - M), (0, icp - ic))) if twin
          else jnp.zeros((1, icp), jnp.int8))
    w = jnp.pad(w, ((0, ocp - oc), (0, icp - ic)))
    raw_minus_bias = jnp.pad(raw_minus_bias, ((0, Mp - M), (0, ocp - oc)))
    grad = jnp.pad(grad, ((0, Mp - M), (0, ocp - oc)))
    scal = jnp.stack([jnp.asarray(a, jnp.float32).reshape(()),
                      jnp.asarray(a_neg if a_neg is not None else 1.0,
                                  jnp.float32).reshape(())]).reshape(1, 2)

    if _ploop_default():
        grid = (Mp // TM, ocp // TO)
        kern = functools.partial(_kernel_i8_ploop, qmax=qmax, n_V=n_V,
                                 crb_tiles=crb_tiles, twin=twin, P=P)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, icp), lambda m, o: (m, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((TM, icp), lambda m, o: (m, 0),
                          memory_space=pltpu.VMEM) if twin
             else pl.BlockSpec((1, icp), lambda m, o: (0, 0),
                               memory_space=pltpu.VMEM)),
            pl.BlockSpec((TO, icp), lambda m, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda m, o: (m, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda m, o: (m, o),
                         memory_space=pltpu.VMEM),
        ]
    else:
        grid = (P, Mp // TM, ocp // TO)
        kern = functools.partial(_kernel_i8, qmax=qmax, n_V=n_V,
                                 crb_tiles=crb_tiles, twin=twin)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, icp), lambda p, m, o: (m, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((TM, icp), lambda p, m, o: (m, 0),
                          memory_space=pltpu.VMEM) if twin
             else pl.BlockSpec((1, icp), lambda p, m, o: (0, 0),
                               memory_space=pltpu.VMEM)),
            pl.BlockSpec((TO, icp), lambda p, m, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda p, m, o: (m, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda p, m, o: (m, o),
                         memory_space=pltpu.VMEM),
        ]
    sims = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((P, n_V), jnp.float32),
        interpret=interpret,
    )(cands.astype(jnp.float32), scal, x_lv, xn, w, raw_minus_bias, grad)
    return sims[:, 0] if squeeze else sims


def _a_kernel_i8(cand_ref, x_ref, w_ref, ws_ref, raw_ref, g_ref, out_ref, *,
                 a_qmax: int, postgelu: bool, a_neg: float):
    p = pl.program_id(0)
    m = pl.program_id(1)
    o = pl.program_id(2)
    delta = cand_ref[p]
    x = x_ref[:]
    w_lv = w_ref[:]
    ws = ws_ref[0, :][None, :]                       # per-row-block scales
    if postgelu:
        pos = jnp.clip(jnp.round(x / delta), 0, a_qmax - 1).astype(jnp.int8)
        neg = jnp.clip(jnp.round(x / a_neg), -a_qmax, 0).astype(jnp.int8)
        acc = (_dot_i8(pos, w_lv).astype(jnp.float32) * delta
               + _dot_i8(neg, w_lv).astype(jnp.float32) * a_neg)
    else:
        xq = jnp.clip(jnp.round(x / delta), -a_qmax, a_qmax - 1) \
            .astype(jnp.int8)
        acc = _dot_i8(xq, w_lv).astype(jnp.float32) * delta
    out = acc * ws
    d = g_ref[:] * (raw_ref[:] - out)
    part = -jnp.sum(d * d)

    @pl.when((m == 0) & (o == 0))
    def _():
        out_ref[p] = 0.0

    out_ref[p] += part


def _a_kernel_i8_ploop(cand_ref, x_ref, w_ref, ws_ref, raw_ref, g_ref,
                       out_ref, *, a_qmax: int, postgelu: bool,
                       a_neg: float, P: int):
    """Grid (M, O) int8-scored input-interval search (see _ploop_default)."""
    m = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when((m == 0) & (o == 0))
    def _():
        def z(p, _):
            out_ref[p] = 0.0
            return 0
        jax.lax.fori_loop(0, P, z, 0)

    x = x_ref[:]
    w_lv = w_ref[:]
    ws = ws_ref[0, :][None, :]                       # per-row-block scales
    raw = raw_ref[:]
    g = g_ref[:]
    if postgelu:
        # the fixed negative-twin contribution is candidate-independent
        neg = jnp.clip(jnp.round(x / a_neg), -a_qmax, 0).astype(jnp.int8)
        acc_neg = _dot_i8(neg, w_lv).astype(jnp.float32) * a_neg

    def body(p, _):
        delta = cand_ref[p]
        if postgelu:
            pos = jnp.clip(jnp.round(x / delta), 0, a_qmax - 1) \
                .astype(jnp.int8)
            acc = _dot_i8(pos, w_lv).astype(jnp.float32) * delta + acc_neg
        else:
            xq = jnp.clip(jnp.round(x / delta), -a_qmax, a_qmax - 1) \
                .astype(jnp.int8)
            acc = _dot_i8(xq, w_lv).astype(jnp.float32) * delta
        d = g * (raw - acc * ws)
        out_ref[p] += -jnp.sum(d * d)
        return 0

    jax.lax.fori_loop(0, P, body, 0)


@functools.partial(jax.jit, static_argnames=("a_qmax", "postgelu",
                                             "a_neg", "interpret"))
def linear_a_hessian_sims_i8(x, w_lv, w_scale, cands, raw_minus_bias, grad,
                             a_qmax: int, postgelu: bool = False,
                             a_neg: float = 0.0, interpret: bool = None):
    """int8-scored input-interval search (n_H = 1 so the weight scale is
    per OUT channel and factors out of the contraction).

    x:       (M, ic) RAW fp32 activations (quantized per candidate in-kernel)
    w_lv:    (oc, ic) int8 weight levels under the current intervals
    w_scale: (oc,) fp32 per-out-channel dequant scale (row-block interval)
    Other args/returns as :func:`linear_a_hessian_sims`.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, ic = x.shape
    oc = w_lv.shape[0]
    P = cands.shape[0]
    icp = _round_up(ic, 128)
    TM = TO = None
    for tm, to in ((512, 256), (256, 256), (256, 128), (128, 128),
                   (64, 128), (32, 128)):
        if (tm * icp + to * icp + 2 * tm * to) * 4 * 2 <= 10 << 20:
            TM, TO = tm, to
            break
    if TM is None:
        TM, TO = 32, 128
    Mp, ocp = _round_up(M, TM), _round_up(oc, TO)
    x = jnp.pad(x, ((0, Mp - M), (0, icp - ic)))
    w_lv = jnp.pad(w_lv, ((0, ocp - oc), (0, icp - ic)))
    w_scale = jnp.pad(w_scale.astype(jnp.float32), (0, ocp - oc)) \
        .reshape(1, ocp)
    raw_minus_bias = jnp.pad(raw_minus_bias, ((0, Mp - M), (0, ocp - oc)))
    grad = jnp.pad(grad, ((0, Mp - M), (0, ocp - oc)))

    if _ploop_default():
        grid = (Mp // TM, ocp // TO)
        kern = functools.partial(_a_kernel_i8_ploop, a_qmax=a_qmax,
                                 postgelu=postgelu, a_neg=float(a_neg), P=P)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, icp), lambda m, o: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, icp), lambda m, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO), lambda m, o: (0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda m, o: (m, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda m, o: (m, o),
                         memory_space=pltpu.VMEM),
        ]
    else:
        grid = (P, Mp // TM, ocp // TO)
        kern = functools.partial(_a_kernel_i8, a_qmax=a_qmax,
                                 postgelu=postgelu, a_neg=float(a_neg))
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, icp), lambda p, m, o: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, icp), lambda p, m, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO), lambda p, m, o: (0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda p, m, o: (m, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda p, m, o: (m, o),
                         memory_space=pltpu.VMEM),
        ]
    sims = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((P,), jnp.float32),
        interpret=interpret,
    )(cands.astype(jnp.float32), x, w_lv, w_scale, raw_minus_bias, grad)
    return sims


# ---------------------------------------------------------------------------
# fused matmul candidate scorer: the XLA matmul search materializes
# out_sim = A_sim@B (P, bs, G, R, Co) in HBM per candidate chunk — for the
# ViT-B/384 attention matmul1 at 128 calib images that is a 2 GB round-trip
# per candidate (plan_chunks collapses to P = 1), and grad/raw are re-read
# per chunk as well.  This kernel instead keeps ONE (sample, head) tile of
# A/B/grad VMEM-resident, recomputes raw = A@B once per tile, and loops all
# eq_n candidates in-kernel: HBM traffic drops from O(eq_n · S·G·R·Co) to
# ONE pass over the caches per score call, with the per-candidate work pure
# MXU/VPU.  int8 scoring semantics (one fp32 rescale after the int32 dot —
# the accelerator default, calib/search.py _int8_score_default).
#
# Scope: hessian metric, unblocked head-wise groups (n_V = n_H = 1,
# n_G = G — the production config), raw_out recomputed.  Reference hot
# loop: matmul.py:483-563 in hahnyuan/PTQ4ViT.
# ---------------------------------------------------------------------------

def _mm_kernel(cand_ref, scal_ref, sos_ref, a_ref, b_ref, g_ref, out_ref,
               raw_ref, g2_ref, cand_f32_ref, *fix_refs, P: int, mode: str,
               cand_qmax: int, fixed_qmax: int, SB: int):
    """Sample-blocked scorer step: SB (sample, head) tiles per grid step.

    Per step: raw = A@B, grad^2, the FIXED operand's int8 levels and an
    f32 copy of the CANDIDATE operand are computed once per sample into
    VMEM scratch; the candidate loop then reuses them — amortizing tile
    DMA, the bf16->f32 cast, scalar-loop and SMEM-RMW overhead across SB
    samples (the un-blocked grid ran ~32k steps at Swin-B/384 x 128 imgs,
    ~3x over the padded-dot roofline).
    """
    g = pl.program_id(0)
    sblk = pl.program_id(1)

    def dot_f32(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_i32(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    if mode in ("a", "b"):
        f_int = scal_ref[0, g]
    else:                                                  # "b_sos"
        split = sos_ref[0, 0]
        a_int = sos_ref[0, 1]                              # split/(qmax-1)
        s_hi = sos_ref[0, 2]                               # 1/(qmax-1)
        s_lo = sos_ref[0, 3]                               # a_int == scale lo

    # per-sample prep: raw = A@B exact, grad^2, fixed-operand int8 levels,
    # candidate operand cast to f32 once
    for sb in range(SB):
        a = a_ref[sb, 0].astype(jnp.float32)               # (Rp, Cip)
        b = b_ref[sb, 0].astype(jnp.float32)               # (Cip, Cop)
        grad = g_ref[sb, 0].astype(jnp.float32)            # (Rp, Cop)
        raw_ref[sb] = dot_f32(a, b)
        g2_ref[sb] = grad * grad
        if mode == "a":                                    # candidates on A
            cand_f32_ref[sb] = a
            fix_refs[0][sb] = jnp.clip(
                jnp.round(b / f_int), -fixed_qmax, fixed_qmax - 1) \
                .astype(jnp.int8)
        elif mode == "b":                                  # candidates on B
            cand_f32_ref[sb] = b
            fix_refs[0][sb] = jnp.clip(
                jnp.round(a / f_int), -fixed_qmax, fixed_qmax - 1) \
                .astype(jnp.int8)
        else:
            cand_f32_ref[sb] = b
            fix_refs[0][sb] = jnp.clip(
                jnp.round(jnp.clip(a, split, 1.0) * (fixed_qmax - 1)),
                0, fixed_qmax - 1).astype(jnp.int8)
            fix_refs[1][sb] = jnp.clip(
                jnp.round(jnp.clip(a, 0.0, split) / a_int),
                0, fixed_qmax - 1).astype(jnp.int8)

    def body(p, _):
        d = cand_ref[p, g]
        part = jnp.float32(0.0)
        for sb in range(SB):
            c_lv = jnp.clip(jnp.round(cand_f32_ref[sb] / d),
                            -cand_qmax, cand_qmax - 1).astype(jnp.int8)
            if mode == "a":
                out = dot_i32(c_lv, fix_refs[0][sb]).astype(jnp.float32) \
                    * (d * f_int)
            elif mode == "b":
                out = dot_i32(fix_refs[0][sb], c_lv).astype(jnp.float32) \
                    * (f_int * d)
            else:
                hi32 = dot_i32(fix_refs[0][sb], c_lv)
                lo32 = dot_i32(fix_refs[1][sb], c_lv)
                out = (hi32.astype(jnp.float32) * s_hi
                       + lo32.astype(jnp.float32) * s_lo) * d
            diff = raw_ref[sb] - out
            part += -jnp.sum(g2_ref[sb] * diff * diff)
        base = jnp.where(sblk == 0, 0.0, out_ref[p, g])
        out_ref[p, g] = base + part
        return 0

    jax.lax.fori_loop(0, P, body, 0)


def _mm_kernel_folded(cand_ref, scal_ref, sos_ref, a_ref, b_ref, g_ref,
                      out_ref, raw_ref, g2_ref, cand_f32_ref, *fix_refs,
                      P: int, mode: str, cand_qmax: int, fixed_qmax: int,
                      SB: int, F: int, Ci: int, Co: int,
                      rowsum: bool = False):
    """Head-folded scorer step: F heads share ONE dense-K dot per tile.

    Small window-attention matmuls (Swin: R=49, Ci or Co = 32/49) pad each
    per-head dot's K and lane dims to the 128-wide MXU — 4-8x wasted MACs.
    Folding concatenates F heads' candidate operand along K (A_cat /
    B_diag) and lays the fixed operand out BLOCK-DIAGONALLY, so one
    (R, F*Ci) @ (F*Ci, F*Co) dot computes all F heads exactly (off-diagonal
    zeros contribute nothing), cutting padded MACs ~2x and HBM ~2x at Swin
    shapes.  Per-head candidate/fixed scales are applied as per-column-block
    vectors (iota selects); per-head similarities come from column-block
    masked reductions.  Scale selects default to 1.0 on padding columns
    (blk >= F) so round(0/1) = 0 keeps padding exact.
    """
    g = pl.program_id(0)                                   # folded group
    sblk = pl.program_id(1)

    def dot_f32(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_i32(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    Cip = a_ref.shape[-1]                                  # roundup(F*Ci)
    Cop = b_ref.shape[-1]                                  # roundup(F*Co)
    blk_ci = jax.lax.broadcasted_iota(jnp.int32, (1, Cip), 1) // Ci
    blk_co = jax.lax.broadcasted_iota(jnp.int32, (1, Cop), 1) // Co

    def sel(blk, vals):
        """(1, n) f32: vals[f] on column block f, 1.0 on padding blocks."""
        out = jnp.full(blk.shape, 1.0, jnp.float32)
        for f in range(F):
            out = jnp.where(blk == f, vals[f], out)
        return out

    if mode in ("a", "b"):
        f_int = [scal_ref[0, g * F + f] for f in range(F)]
    else:                                                  # "b_sos"
        split = sos_ref[0, 0]
        a_int = sos_ref[0, 1]
        s_hi = sos_ref[0, 2]
        s_lo = sos_ref[0, 3]

    # per-sample prep: raw = A_cat@B_diag (all F heads at once), grad^2,
    # fixed-operand int8 levels, candidate operand cast to f32 once
    for sb in range(SB):
        a = a_ref[sb, 0].astype(jnp.float32)               # (Rp, Cip)
        b = b_ref[sb, 0].astype(jnp.float32)               # (Cip, Cop)
        grad = g_ref[sb, 0].astype(jnp.float32)            # (Rp, Cop)
        raw_ref[sb] = dot_f32(a, b)
        g2_ref[sb] = grad * grad
        if mode == "a":                                    # candidates on A
            cand_f32_ref[sb] = a
            fix_refs[0][sb] = jnp.clip(
                jnp.round(b / sel(blk_co, f_int)),
                -fixed_qmax, fixed_qmax - 1).astype(jnp.int8)
        elif mode == "b":                                  # candidates on B
            cand_f32_ref[sb] = b
            fix_refs[0][sb] = jnp.clip(
                jnp.round(a / sel(blk_ci, f_int)),
                -fixed_qmax, fixed_qmax - 1).astype(jnp.int8)
        else:       # SoS twin on A is elementwise with GLOBAL scalars, but
            # A_cat padding columns must quantize to 0 (they face real
            # B_diag rows only off-block, which are zero anyway; masking
            # keeps the levels zero for clarity and exactness symmetry)
            cand_f32_ref[sb] = b
            real = blk_ci < F                              # (1, Cip)
            fix_refs[0][sb] = jnp.where(real, jnp.clip(
                jnp.round(jnp.clip(a, split, 1.0) * (fixed_qmax - 1)),
                0, fixed_qmax - 1), 0.0).astype(jnp.int8)
            fix_refs[1][sb] = jnp.where(real, jnp.clip(
                jnp.round(jnp.clip(a, 0.0, split) / a_int),
                0, fixed_qmax - 1), 0.0).astype(jnp.int8)

    def body(p, _):
        d = [cand_ref[p, g * F + f] for f in range(F)]
        if mode == "a":
            d_col = sel(blk_ci, d)                         # quantize A_cat
            s_out = sel(blk_co, [d[f] * f_int[f] for f in range(F)])
        elif mode == "b":
            d_col = sel(blk_co, d)                         # quantize B_diag
            s_out = sel(blk_co, [f_int[f] * d[f] for f in range(F)])
        else:
            d_col = sel(blk_co, d)
            s_out = sel(blk_co, d)
        parts = [jnp.float32(0.0)] * F
        for sb in range(SB):
            c_lv = jnp.clip(jnp.round(cand_f32_ref[sb] / d_col),
                            -cand_qmax, cand_qmax - 1).astype(jnp.int8)
            if mode == "a":
                out = dot_i32(c_lv, fix_refs[0][sb]).astype(jnp.float32) \
                    * s_out
            elif mode == "b":
                out = dot_i32(fix_refs[0][sb], c_lv).astype(jnp.float32) \
                    * s_out
            else:
                hi32 = dot_i32(fix_refs[0][sb], c_lv)
                lo32 = dot_i32(fix_refs[1][sb], c_lv)
                out = (hi32.astype(jnp.float32) * s_hi
                       + lo32.astype(jnp.float32) * s_lo) * s_out
            diff = raw_ref[sb] - out
            dw = g2_ref[sb] * diff * diff
            if rowsum:
                # one row-reduction then F tiny masked sums (saves F-1
                # full-tile passes; fp32 sum ORDER differs from the
                # bitwise-exact PTQ4VIT_TPU_MM_ROWSUM=0 mode — last-ulp
                # class, 0 differing qstate slots / 2840 across 20 full
                # tiny-net calibrations on realistic activations,
                # docs/rowsum_divergence_real.json).  Default ON for
                # folded kernels since the r4 device A/B: 9.9 -> 6.8
                # us/step at the Swin-B/384 window-144 matmul shapes,
                # projected full-search scorer 37.1 -> 26.4 s (the F-1
                # extra masked full-tile reductions were eating most of
                # the fold's MAC savings).
                rs = jnp.sum(dw, axis=0, keepdims=True)
                for f in range(F):
                    parts[f] += -jnp.sum(jnp.where(blk_co == f, rs, 0.0))
            else:
                for f in range(F):
                    parts[f] += -jnp.sum(jnp.where(blk_co == f, dw, 0.0))
        for f in range(F):
            base = jnp.where(sblk == 0, 0.0, out_ref[p, g * F + f])
            out_ref[p, g * F + f] = base + parts[f]
        return 0

    jax.lax.fori_loop(0, P, body, 0)


def _mm_fold_factor(G: int, Ci: int, Co: int) -> int:
    """Largest head-fold F that strictly reduces padded MACs per head.

    PTQ4VIT_TPU_MM_FOLD=1 disables (F=1); an integer > 1 forces that fold
    when G divides.  Picks F=1 at ViT shapes (Ci=64/Co>=128 gains nothing)
    and F>1 only where lane padding is the waste (Swin windows)."""
    import os
    env = os.environ.get("PTQ4VIT_TPU_MM_FOLD")
    if env is not None:
        f = int(env)
        return f if f > 1 and G % f == 0 else 1
    best_cost = _round_up(Ci, 128) * _round_up(Co, 128)
    best = 1
    for f in (8, 4, 2):
        if G % f:
            continue
        cost = _round_up(f * Ci, 128) * _round_up(f * Co, 128) / f
        if cost < best_cost:
            best_cost, best = cost, f
    return best


@functools.partial(jax.jit, static_argnames=("mode", "cand_qmax",
                                             "fixed_qmax", "interpret"))
def matmul_hessian_sims(A, B, grad, cands, fixed_int, mode: str,
                        cand_qmax: int, fixed_qmax: int, sos=None,
                        interpret: bool = None):
    """Fused per-head matmul candidate scorer.

    A:         (S, G, R, Ci) raw operand (fp32 or bf16 calib cache)
    B:         (S, G, Ci, Co) raw operand
    grad:      (S, G, R, Co) dL/dout probe gradient
    cands:     (P, G) per-head candidate scales for the searched operand
    fixed_int: (G,) per-head scale of the FIXED operand (ignored for
               mode "b_sos", where the fixed A side is the SoS twin)
    mode:      "a" | "b" | "b_sos" — which operand the candidates quantize
    sos:       (split, a_int, s_hi, s_lo) scalars for "b_sos"
    Returns (P, G) similarity sums over (samples, R, Co) — the XLA path's
    mean-then-sum reduction times the uniform R*Co factor (argmax-equal).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    S, G, R, Ci = A.shape
    Co = B.shape[-1]
    P = cands.shape[0]

    # head folding (Swin window shapes): F heads -> one dense-K dot with a
    # block-diagonal fixed operand; exact (off-blocks are zero), ~2x fewer
    # padded MACs and ~2x less padded HBM when Ci/Co < 128.  Per-head sims
    # come back in original head order, so callers see no difference.
    F = _mm_fold_factor(G, Ci, Co)
    Gk, Cik, Cok = G // F, F * Ci, F * Co
    if F > 1:
        A = (A.reshape(S, Gk, F, R, Ci).transpose(0, 1, 3, 2, 4)
             .reshape(S, Gk, R, Cik))
        eye = jnp.eye(F, dtype=B.dtype)
        B = ((B.reshape(S, Gk, F, 1, Ci, Co)
              * eye[:, :, None, None]).transpose(0, 1, 2, 4, 3, 5)
             .reshape(S, Gk, Cik, Cok))
        grad = (grad.reshape(S, Gk, F, R, Co).transpose(0, 1, 3, 2, 4)
                .reshape(S, Gk, R, Cok))
    Rp, Cip, Cop = _round_up(R, 8), _round_up(Cik, 128), _round_up(Cok, 128)

    # sample block: amortize per-grid-step overhead under a VMEM budget
    # (inputs double-buffered by the pipeline + per-sample scratch).
    # PTQ4VIT_TPU_MM_SB caps/overrides for hardware A/B without code edits.
    import os
    isz = A.dtype.itemsize
    per_sample = ((Rp * Cip + Cip * Cop + Rp * Cop) * isz * 2   # in tiles x2
                  + 2 * Rp * Cop * 4                            # raw + grad^2
                  + (Rp * Cip if mode == "a" else Cip * Cop) * 4  # cand f32
                  + (Rp * Cip if mode != "a" else Cip * Cop)    # fixed levels
                  * (2 if mode == "b_sos" else 1))
    # VMEM is ~16 MB/core; 12 MB leaves margin for Mosaic's own buffers.
    # (The folded window-144 tiles are ~1.7 MB/sample — a 24 MB budget
    # would pick SB=8 and overflow physical VMEM.)
    sb_cap = int(os.environ.get("PTQ4VIT_TPU_MM_SB", "16"))
    SB = 1
    for sb_try in (16, 8, 4, 2):
        if sb_try <= sb_cap and sb_try * per_sample <= 12 << 20:
            SB = sb_try
            break
    Sp = _round_up(S, SB)
    # zero padding is exact: padded grad entries contribute 0 to the sum;
    # padded Ci columns multiply zero rows of B; round(0/d) = 0
    A = jnp.pad(A, ((0, Sp - S), (0, 0), (0, Rp - R), (0, Cip - Cik)))
    B = jnp.pad(B, ((0, Sp - S), (0, 0), (0, Cip - Cik), (0, Cop - Cok)))
    grad = jnp.pad(grad, ((0, Sp - S), (0, 0), (0, Rp - R), (0, Cop - Cok)))
    if sos is None:
        sos = (0.0, 1.0, 1.0, 1.0)
    scal = (jnp.broadcast_to(fixed_int.astype(jnp.float32).reshape(-1), (G,))
            .reshape(1, G))
    sosv = jnp.stack([jnp.asarray(v, jnp.float32).reshape(())
                      for v in sos]).reshape(1, 4)
    scratch = [pltpu.VMEM((SB, Rp, Cop), jnp.float32),     # raw
               pltpu.VMEM((SB, Rp, Cop), jnp.float32),     # grad^2
               # f32 copy of the candidate operand (cast hoisted out of
               # the candidate loop)
               pltpu.VMEM((SB, Rp, Cip) if mode == "a" else (SB, Cip, Cop),
                          jnp.float32)]
    if mode == "a":
        scratch.append(pltpu.VMEM((SB, Cip, Cop), jnp.int8))
    elif mode == "b":
        scratch.append(pltpu.VMEM((SB, Rp, Cip), jnp.int8))
    else:
        scratch += [pltpu.VMEM((SB, Rp, Cip), jnp.int8),
                    pltpu.VMEM((SB, Rp, Cip), jnp.int8)]
    grid = (Gk, Sp // SB)
    kern = (functools.partial(_mm_kernel_folded, P=P, mode=mode,
                              cand_qmax=cand_qmax, fixed_qmax=fixed_qmax,
                              SB=SB, F=F, Ci=Ci, Co=Co,
                              rowsum=os.environ.get(
                                  "PTQ4VIT_TPU_MM_ROWSUM", "1") != "0")
            if F > 1 else
            functools.partial(_mm_kernel, P=P, mode=mode,
                              cand_qmax=cand_qmax, fixed_qmax=fixed_qmax,
                              SB=SB))
    sims = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # cands (P, G)
            pl.BlockSpec(memory_space=pltpu.SMEM),         # scal (1, G)
            pl.BlockSpec(memory_space=pltpu.SMEM),         # sos  (1, 4)
            pl.BlockSpec((SB, 1, Rp, Cip), lambda g, s: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 1, Cip, Cop), lambda g, s: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 1, Rp, Cop), lambda g, s: (s, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((P, G), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(cands.astype(jnp.float32), scal, sosv, A, B, grad)
    return sims


def _a_kernel(cand_ref, x_ref, w_ref, raw_ref, g_ref, out_ref, *,
              a_qmax: int, postgelu: bool, a_neg: float):
    p = pl.program_id(0)
    m = pl.program_id(1)
    o = pl.program_id(2)
    delta = cand_ref[p]
    x = x_ref[:]
    if postgelu:
        # twin post-GELU: searched positive interval + fixed negative
        # interval (reference linear.py:609-642)
        xq = (jnp.clip(jnp.round(x / delta), 0, a_qmax - 1) * delta
              + jnp.clip(jnp.round(x / a_neg), -a_qmax, 0) * a_neg)
    else:
        xq = jnp.clip(jnp.round(x / delta), -a_qmax, a_qmax - 1) * delta
    out = jax.lax.dot_general(
        xq, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # TM, TO
    d = g_ref[:] * (raw_ref[:] - out)
    part = -jnp.sum(d * d)

    @pl.when((m == 0) & (o == 0))
    def _():
        out_ref[p] = 0.0

    out_ref[p] += part


def _a_kernel_ploop(cand_ref, x_ref, w_ref, raw_ref, g_ref, out_ref, *,
                    a_qmax: int, postgelu: bool, a_neg: float, P: int):
    """Grid (M, O) fp32 input-interval search (see _ploop_default)."""
    m = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when((m == 0) & (o == 0))
    def _():
        def z(p, _):
            out_ref[p] = 0.0
            return 0
        jax.lax.fori_loop(0, P, z, 0)

    x = x_ref[:]
    w = w_ref[:]
    raw = raw_ref[:]
    g = g_ref[:]
    if postgelu:
        xq_neg = jnp.clip(jnp.round(x / a_neg), -a_qmax, 0) * a_neg

    def body(p, _):
        delta = cand_ref[p]
        if postgelu:
            xq = jnp.clip(jnp.round(x / delta), 0, a_qmax - 1) * delta \
                + xq_neg
        else:
            xq = jnp.clip(jnp.round(x / delta), -a_qmax, a_qmax - 1) * delta
        out = jax.lax.dot_general(
            xq, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = g * (raw - out)
        out_ref[p] += -jnp.sum(d * d)
        return 0

    jax.lax.fori_loop(0, P, body, 0)


@functools.partial(jax.jit, static_argnames=("a_qmax", "postgelu",
                                             "a_neg", "interpret"))
def linear_a_hessian_sims(x, w_sim, cands, raw_minus_bias, grad,
                          a_qmax: int, postgelu: bool = False,
                          a_neg: float = 0.0, interpret: bool = None):
    """Fused input-interval scorer (layerwise n_a = 1, hessian metric).

    x:     (M, ic) RAW activations (quantized per candidate in-kernel)
    w_sim: (oc, ic) weight already fake-quantized with the current intervals
    cands: (P,) input-scale candidates
    Returns (P,) un-normalized similarity sums.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, ic = x.shape
    oc = w_sim.shape[0]
    P = cands.shape[0]
    icp = _round_up(ic, 128)
    TM = TO = None
    for tm, to in ((512, 256), (256, 256), (256, 128), (128, 128),
                   (64, 128), (32, 128)):
        if (tm * icp + to * icp + 2 * tm * to) * 4 * 2 <= 10 << 20:
            TM, TO = tm, to
            break
    if TM is None:
        TM, TO = 32, 128
    Mp, ocp = _round_up(M, TM), _round_up(oc, TO)
    x = jnp.pad(x, ((0, Mp - M), (0, icp - ic)))
    w_sim = jnp.pad(w_sim, ((0, ocp - oc), (0, icp - ic)))
    raw_minus_bias = jnp.pad(raw_minus_bias, ((0, Mp - M), (0, ocp - oc)))
    grad = jnp.pad(grad, ((0, Mp - M), (0, ocp - oc)))

    if _ploop_default():
        grid = (Mp // TM, ocp // TO)
        kern = functools.partial(_a_kernel_ploop, a_qmax=a_qmax,
                                 postgelu=postgelu, a_neg=float(a_neg), P=P)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, icp), lambda m, o: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, icp), lambda m, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda m, o: (m, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda m, o: (m, o),
                         memory_space=pltpu.VMEM),
        ]
    else:
        grid = (P, Mp // TM, ocp // TO)
        kern = functools.partial(_a_kernel, a_qmax=a_qmax, postgelu=postgelu,
                                 a_neg=float(a_neg))
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, icp), lambda p, m, o: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, icp), lambda p, m, o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda p, m, o: (m, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TO), lambda p, m, o: (m, o),
                         memory_space=pltpu.VMEM),
        ]
    sims = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((P,), jnp.float32),
        interpret=interpret,
    )(cands.astype(jnp.float32), x, w_sim, raw_minus_bias, grad)
    return sims
