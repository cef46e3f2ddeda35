"""Batched scale-factor candidate search — the calibration hot path.

Reference semantics: PTQSLBatchingQuantLinear / PostGeluPTQSLBatchingQuantLinear
(quant_layers/linear.py:349-642), PTQSLBatchingQuantMatMul /
SoSPTQSLBatchingQuantMatMul (quant_layers/matmul.py:390-644),
ChannelwiseBatchingQuantConv2d / BatchingEasyQuantConv2d
(quant_layers/conv.py:279-614 in hahnyuan/PTQ4ViT).

TPU-native design:
  * the whole per-layer search (interval init + search_round × alternating
    weight/input searches) is ONE jitted function — no host round-trips
    between candidate batches, XLA pipelines quantize→matmul→reduce;
  * candidate and calibration-batch chunking are `lax.scan`s with statically
    chosen chunk sizes from a byte budget (replaces the reference's dynamic
    `parallel_eq_n`/`calib_batch_size` halving loops, linear.py:365-378 —
    chunk sizes don't affect results, only memory);
  * block-position loops (h / a / (v,h)) are `fori_loop`s with one-hot
    masks instead of per-position retraces.

Parity notes:
  * the candidate grid has eq_n+1 entries but only the first eq_n are scored
    (reference off-by-one, linear.py:466) — reproduced;
  * per-batch similarities are summed, then argmax (first max wins on ties,
    matching torch.argmax), linear.py:487-492;
  * the linear pearson metric uses the reference's batch-chunk-local means
    (linear.py:426-453): when the caller passes ``calib_bs`` (the
    calibrator's batch size) and it divides the calib size, the batch scan
    chunk is pinned to it so the per-chunk means match the reference's
    ``calib_batch_size`` chunks exactly; otherwise the planner's chunk is
    used (argmax-equivalent in practice, documented divergence).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

import os

from ..configs.policy import OpPolicy
from ..quant import fakequant as fq
from ..quant.metrics import cosine_similarity
from ..quant.qparams import ConvQP, LinearQP, MatMulQP

DEFAULT_BUDGET = 2 << 30  # bytes of out_sim scratch per candidate chunk

# fused Pallas scorer for the production linear w-search case (n_H=1,
# hessian) — ~4.6x the XLA scorer on TPU (see ops/pallas_search.py).  On by
# default on accelerator backends; PTQ4VIT_TPU_PALLAS=0/1 overrides.
def _pallas_default() -> bool:
    flag = os.environ.get("PTQ4VIT_TPU_PALLAS")
    if flag is not None:
        return flag == "1"
    import jax as _jax
    return _jax.default_backend() != "cpu"


# int8 candidate scoring (matmul searches AND the Pallas linear scorers):
# out_sim is computed as an int8xint8->int32 dot rescaled once, instead of
# an fp32 einsum/dot of the fake values — ~1.6x the MXU rate.
# Mathematically equal, but the single fp32 rescale rounds differently from
# per-accumulation fp32 rounding, so sims (and rarely argmaxes) can shift
# in the last ulp.  Default: ON on accelerator backends (the measured
# interval-divergence rate is small and interval-adjacent — see README
# parity notes + scripts/int8_score_divergence.py), OFF on CPU where the
# torch-oracle parity tests pin exact reference rounding.
# PTQ4VIT_TPU_INT8_SCORE=0/1 overrides either way; =0 also bypasses the
# fused Pallas matmul scorer (whose semantics are int8-only), restoring
# exact scoring without additionally needing PTQ4VIT_TPU_PALLAS=0.
def _int8_score_default() -> bool:
    flag = os.environ.get("PTQ4VIT_TPU_INT8_SCORE")
    if flag is not None:
        return flag == "1"
    import jax as _jax
    return _jax.default_backend() != "cpu"


def _mesh_sims(mesh, fn, sharded, replicated):
    """Run a fused Pallas scorer under a data-sharded mesh.

    ``pallas_call`` is opaque to the GSPMD partitioner, so sharded caches
    can't just flow into it under jit.  Every fused scorer reduces over the
    sample/row axis, which is exactly the mesh's "data" axis: shard_map runs
    the kernel on each device's local shard and a psum over "data" restores
    the global similarity sums.  ``fn(*sharded, *replicated)`` must return
    per-shard sims; ``sharded`` args carry samples/rows on axis 0,
    ``replicated`` args (weights, candidates, scalars) are full-size
    everywhere.  fp32 sums associate per-shard-then-psum instead of
    sequentially, so sims can differ from single-device in the last ulp
    (same class of divergence as int8 scoring — see README parity notes).
    """
    from jax.sharding import PartitionSpec as PS

    def f(*args):
        return jax.lax.psum(fn(*args), "data")

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=tuple([PS("data")] * len(sharded)
                       + [PS()] * len(replicated)),
        out_specs=PS(), check_vma=False)(*sharded, *replicated)


# ---------------------------------------------------------------------------
# chunk planning (static)
# ---------------------------------------------------------------------------

def plan_chunks(eq_n: int, samples: int, out_elems_per_sample_candidate: int,
                budget: int = DEFAULT_BUDGET):
    """Pick static (candidate_chunk P, batch_chunk bs).  bytes ≈
    bs * P * out_elems * 4 <= budget, preferring P big."""
    per_cand = samples * out_elems_per_sample_candidate * 4
    P = int(max(1, min(eq_n, budget // max(per_cand, 1))))
    bs = samples
    while P < 2 and bs > 1:
        bs = (bs + 1) // 2
        per_cand = bs * out_elems_per_sample_candidate * 4
        P = int(max(1, min(eq_n, budget // max(per_cand, 1))))
    while samples % bs != 0:   # keep exact chunking
        bs -= 1
    return P, bs


def _pad_chunk_candidates(cands, P: int):
    """(eq_n, ...) -> (nc, P, ...) zero-padded (padding scored then sliced
    off before argmax)."""
    eq_n = cands.shape[0]
    nc = -(-eq_n // P)
    pad = nc * P - eq_n
    if pad:
        cands = jnp.concatenate(
            [cands, jnp.broadcast_to(cands[-1:], (pad,) + cands.shape[1:])], 0)
    return cands.reshape((nc, P) + cands.shape[1:])


def _chunk_batch(x, bs: int):
    """(S, ...) -> (nb, bs, ...)."""
    return x.reshape((x.shape[0] // bs, bs) + x.shape[1:])


# ---------------------------------------------------------------------------
# similarity reductions
# ---------------------------------------------------------------------------

def _feature_similarity(raw, sim, metric: str, raw_grad, axis: int):
    """Metric along ``axis`` -> reduced along it (reference
    _get_similarity, linear.py:399-424)."""
    if metric == "cosine":
        return cosine_similarity(raw, sim, axis=axis)
    if metric == "pearson":
        # centered cosine along the feature axis (reference matmul pearson,
        # matmul.py:442-449: F.cosine_similarity(raw-mean, sim-mean, dim));
        # NOTE the linear engine's pearson is different (chunk-global means,
        # linear.py:426-453) and lives in its own path
        return cosine_similarity(raw - jnp.mean(raw, axis=axis, keepdims=True),
                                 sim - jnp.mean(sim, axis=axis, keepdims=True),
                                 axis=axis)
    if metric == "L1_norm":
        s = -jnp.abs(raw - sim)
    elif metric == "L2_norm":
        s = -((raw - sim) ** 2)
    elif metric == "linear_weighted_L2_norm":
        s = -jnp.abs(raw) * (raw - sim) ** 2
    elif metric == "square_weighted_L2_norm":
        s = -((raw * (raw - sim)) ** 2)
    elif metric == "hessian":
        s = -((raw_grad * (raw - sim)) ** 2)
    else:
        raise NotImplementedError(f"metric {metric} not implemented!")
    return jnp.mean(s, axis=axis)


def _quant_act_linear(x, a_interval, a_neg_interval, policy: OpPolicy):
    """Grouped (or twin post-GELU) input fake-quant with current intervals."""
    qmax = fq.qmax_for_bit(policy.a_bit)
    if policy.quantizer == "postgelu_linear":
        return fq.twin_quant_post_gelu(x, a_interval, a_neg_interval, qmax)
    return fq.fake_quant_act_grouped(x, a_interval, qmax)


# ---------------------------------------------------------------------------
# linear search
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("policy", "P", "bs", "use_pallas",
                                  "int8_score", "mesh"))
def _linear_search_jit(w, b, x, raw_out, raw_grad, policy: OpPolicy,
                       P: int, bs: int, use_pallas: bool = False,
                       int8_score: bool = False, mesh=None):
    """Full calibration_step2 of a linear layer (reference linear.py:536-555
    semantics) as one compiled program.

    x: (S, T, ic) — middle dims pre-flattened to one token axis (mean over
    it equals the reference's mean over all middle dims); raw_out/raw_grad:
    (S, T, oc).
    """
    x = x.astype(jnp.float32)
    if raw_out is None:
        # captured with store_raw_out=False: the raw output is the same XLA
        # dot on the same operands the capture forward ran — bit-identical
        # (apply_linear, quant/qparams.py:60); materialized transiently here
        # instead of living in the resident caches for the whole group
        raw_out = jnp.matmul(x, w.astype(jnp.float32).T,
                             preferred_element_type=jnp.float32)
        if b is not None:
            raw_out = raw_out + b
    raw_out = raw_out.astype(jnp.float32)
    if raw_grad is not None:
        raw_grad = raw_grad.astype(jnp.float32)
    S, T, ic = x.shape
    oc = raw_out.shape[-1]
    n_V, n_H, n_a = policy.n_V, policy.n_H, policy.n_a
    crb_r, crb_c, crb_a = oc // n_V, ic // n_H, ic // n_a
    w_qmax = fq.qmax_for_bit(policy.w_bit)
    a_qmax = fq.qmax_for_bit(policy.a_bit)
    postgelu = policy.quantizer == "postgelu_linear"
    a_neg = (jnp.float32(fq.GELU_NEG_CLIP / a_qmax) if postgelu else None)
    if raw_grad is None:
        raw_grad = jnp.zeros((1, 1, 1), jnp.float32)  # unused placeholder

    # ---- interval init (linear.py:380-397, :576-599)
    if policy.init_layerwise:
        w_int0 = jnp.broadcast_to(fq.minmax_interval(w, w_qmax)
                                  .reshape(1, 1, 1, 1), (n_V, 1, n_H, 1))
        xg = fq.grouped_act_view(x, n_a)
        v = jnp.abs(xg) if not postgelu else xg
        a_int0 = jnp.broadcast_to(
            fq.exact_div(jnp.max(v), a_qmax - 0.5).reshape(1, 1), (n_a, 1))
    else:
        w_int0 = fq.blocked_weight_interval_init(w, n_V, n_H, w_qmax)
        a_int0 = fq.grouped_act_interval_init(x, n_a, a_qmax,
                                              signed=not postgelu)

    grid = fq.candidate_grid(policy.eq_alpha, policy.eq_beta, policy.eq_n)
    eq_n = policy.eq_n  # only the first eq_n searched (linear.py:466)
    w_cands = grid[:eq_n, None, None, None, None] * w_int0[None]
    a_cands = grid[:eq_n, None, None] * a_int0[None]     # (eq_n, n_a, 1)
    w_cands_c = _pad_chunk_candidates(w_cands, P)         # nc,P,n_V,1,n_H,1
    a_cands_c = _pad_chunk_candidates(a_cands, P)         # nc,P,n_a,1

    xb = _chunk_batch(x, bs)
    rb = _chunk_batch(raw_out, bs)
    gb = (_chunk_batch(raw_grad, bs) if policy.metric == "hessian"
          else jnp.zeros((xb.shape[0], 1, 1, 1), jnp.float32))

    w4 = fq.blocked_weight_view(w, n_V, n_H)              # n_V,crb_r,n_H,crb_c

    from ..ops.pallas_search import pallas_tile_ok
    pallas_ok = (use_pallas and n_H == 1 and policy.metric == "hessian"
                 and pallas_tile_ok(oc, n_V))
    pallas_a_ok = (use_pallas and n_a == 1 and policy.metric == "hessian")

    def score_w_pallas(w_int, a_int):
        """Fused VMEM scorer (ops/pallas_search.py): all eq_n candidates in
        one kernel, no out_sim materialization.  Same reduction up to the
        uniform 1/(T*crb_r) factor.  With int8 scoring (and n_a == 1 so the
        input scale factors out), the candidate dot runs on the MXU's int8
        ports with one fp32 rescale."""
        from ..ops.pallas_search import (linear_w_hessian_sims,
                                         linear_w_hessian_sims_i8)
        rawb = raw_out if b is None else raw_out - b
        if int8_score and n_a == 1:
            a_sc = a_int.reshape(())
            if postgelu:
                pos = jnp.clip(jnp.round(x / a_sc), 0, a_qmax - 1) \
                    .astype(jnp.int8).reshape(S * T, ic)
                neg = jnp.clip(jnp.round(x / a_neg), -a_qmax, 0) \
                    .astype(jnp.int8).reshape(S * T, ic)
                fn = lambda p_, n_, r_, g_, a_, w_, c_: \
                    linear_w_hessian_sims_i8(p_, n_, a_, a_neg, w_, c_,
                                             r_, g_, w_qmax)
                sh = (pos, neg, rawb.reshape(S * T, oc),
                      raw_grad.reshape(S * T, oc))
                rep = (a_sc, w, w_cands.reshape(eq_n, n_V))
            else:
                x_lv = jnp.clip(jnp.round(x / a_sc), -a_qmax, a_qmax - 1) \
                    .astype(jnp.int8).reshape(S * T, ic)
                fn = lambda x_, r_, g_, a_, w_, c_: \
                    linear_w_hessian_sims_i8(x_, None, a_, None, w_, c_,
                                             r_, g_, w_qmax)
                sh = (x_lv, rawb.reshape(S * T, oc),
                      raw_grad.reshape(S * T, oc))
                rep = (a_sc, w, w_cands.reshape(eq_n, n_V))
        else:
            x_sim = _quant_act_linear(x, a_int, a_neg, policy) \
                .reshape(S * T, ic)
            fn = lambda x_, r_, g_, w_, c_: \
                linear_w_hessian_sims(x_, w_, c_, r_, g_, w_qmax)
            sh = (x_sim, rawb.reshape(S * T, oc),
                  raw_grad.reshape(S * T, oc))
            rep = (w, w_cands.reshape(eq_n, n_V))
        sims = (_mesh_sims(mesh, fn, sh, rep) if mesh is not None
                else fn(*sh, *rep))
        return sims / (T * crb_r)                          # eq_n, n_V

    def score_w(w_int, a_int, h):
        """Summed similarities (eq_n, n_V) of candidate intervals for
        weight column-block h (linear.py:455-495)."""
        if pallas_ok:
            return score_w_pallas(w_int, a_int)
        x_sim_all = _chunk_batch(
            _quant_act_linear(x, a_int, a_neg, policy), bs)
        mask_h = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, n_H, 1), 3)
                  == h)

        def cand_body(_, wc):                              # wc: P,n_V,1,n_H,1
            cur = jnp.where(mask_h, wc, w_int[None])
            w_sim = fq.int_quant(w4[None], cur[:, :, :, :, None]
                                 .reshape(P, n_V, 1, n_H, 1), w_qmax)
            w_sim = (w_sim * cur.reshape(P, n_V, 1, n_H, 1)).reshape(P, oc, ic)

            def batch_body(acc, inp):
                x_s, r_s, g_s = inp
                out = jnp.einsum("bti,poi->btpo", x_s, w_sim,
                                 preferred_element_type=jnp.float32)
                if b is not None:
                    out = out + b
                outc = out.reshape(bs, T, P, n_V, crb_r)
                rawc = r_s.reshape(bs, T, 1, n_V, crb_r)
                if policy.metric == "pearson":
                    sim = _pearson_w(rawc, outc)          # (bs, P, n_V)
                else:
                    gc = (g_s.reshape(bs, T, 1, n_V, crb_r)
                          if policy.metric == "hessian" else None)
                    sim = _feature_similarity(rawc, outc, policy.metric,
                                              gc, axis=-1)  # bs,T,P,n_V
                    sim = jnp.mean(sim, axis=1)           # bs,P,n_V
                return acc + jnp.sum(sim, axis=0), None

            s, _ = jax.lax.scan(batch_body, jnp.zeros((P, n_V)),
                                (x_sim_all, rb, gb))
            return None, s

        _, sims = jax.lax.scan(cand_body, None, w_cands_c)
        return sims.reshape(-1, n_V)[:eq_n]

    def score_a_pallas(w_int):
        """Fused input-interval scorer (ops/pallas_search.py); x quantized
        per candidate in-kernel, same reduction up to 1/(T*oc).  With int8
        scoring (and n_H == 1 so the weight scale is per out-channel), the
        weight ships as int8 levels + a per-channel rescale vector."""
        from ..ops.pallas_search import (linear_a_hessian_sims,
                                         linear_a_hessian_sims_i8)
        rawb = raw_out if b is None else raw_out - b
        a_neg_f = fq.GELU_NEG_CLIP / a_qmax if postgelu else 0.0
        if int8_score and n_H == 1:
            # w_int is (n_V, 1, n_H, 1) == (n_V, 1, 1, 1) here
            w_lv = fq.int_quant(w4, w_int, w_qmax) \
                .astype(jnp.int8).reshape(oc, ic)
            w_sc = jnp.broadcast_to(w_int[:, 0, 0, 0][:, None],
                                    (n_V, crb_r)).reshape(oc)
            fn = lambda x_, r_, g_, wl_, ws_, c_: linear_a_hessian_sims_i8(
                x_, wl_, ws_, c_, r_, g_, a_qmax, postgelu=postgelu,
                a_neg=a_neg_f)
            rep = (w_lv, w_sc, a_cands.reshape(eq_n))
        else:
            w_sim = fq.fake_quant_weight_blocked(w, w_int, w_qmax)
            fn = lambda x_, r_, g_, ws_, c_: linear_a_hessian_sims(
                x_, ws_, c_, r_, g_, a_qmax, postgelu=postgelu,
                a_neg=a_neg_f)
            rep = (w_sim, a_cands.reshape(eq_n))
        sh = (x.reshape(S * T, ic), rawb.reshape(S * T, oc),
              raw_grad.reshape(S * T, oc))
        sims = (_mesh_sims(mesh, fn, sh, rep) if mesh is not None
                else fn(*sh, *rep))
        return sims / (T * oc)

    def score_a(w_int, a_int, a):
        """Summed similarities (eq_n,) of candidate intervals for input
        group a (linear.py:497-533, :609-642)."""
        if pallas_a_ok:
            return score_a_pallas(w_int)
        w_sim = fq.fake_quant_weight_blocked(w, w_int, w_qmax)
        mask_a = (jax.lax.broadcasted_iota(jnp.int32, (1, n_a, 1), 1) == a)

        def cand_body(_, ac):                              # ac: P,n_a,1
            cur = jnp.where(mask_a, ac, a_int[None])       # P,n_a,1

            def batch_body(acc, inp):
                x_s, r_s, g_s = inp
                xg = fq.grouped_act_view(x_s, n_a)         # bs,T,n_a,crb_a
                xq = xg[:, :, None] / cur[None, None]      # bs,T,P,n_a,crb_a
                if postgelu:
                    xp = jnp.clip(jnp.round(xq), 0, a_qmax - 1) \
                        * cur[None, None]
                    xn = jnp.clip(jnp.round(fq.exact_div(xg, a_neg)),
                                  -a_qmax, 0) * a_neg
                    x_sim = xp + xn[:, :, None]
                else:
                    x_sim = jnp.clip(jnp.round(xq), -a_qmax, a_qmax - 1) \
                        * cur[None, None]
                x_sim = x_sim.reshape(bs, T, P, ic)
                out = jnp.einsum("btpi,oi->btpo", x_sim, w_sim,
                                 preferred_element_type=jnp.float32)
                if b is not None:
                    out = out + b
                raw = r_s[:, :, None]                      # bs,T,1,oc
                if policy.metric == "pearson":
                    sim = _pearson_a(raw, out)             # (bs, P)
                else:
                    gc = (g_s[:, :, None] if policy.metric == "hessian"
                          else None)
                    sim = _feature_similarity(raw, out, policy.metric, gc,
                                              axis=-1)     # bs,T,P
                    sim = jnp.mean(sim, axis=1)            # bs,P
                return acc + jnp.sum(sim, axis=0), None

            s, _ = jax.lax.scan(batch_body, jnp.zeros((P,)),
                                (xb, rb, gb))
            return None, s

        _, sims = jax.lax.scan(cand_body, None, a_cands_c)
        return sims.reshape(-1)[:eq_n]

    def round_body(_, carry):
        w_int, a_int = carry

        def h_body(h, w_int):
            sims = score_w(w_int, a_int, h)                # eq_n, n_V
            best = jnp.argmax(sims, axis=0)                # n_V
            chosen = jnp.take_along_axis(
                w_cands[:, :, 0, :, 0], best[None, :, None], axis=0)[0]
            # chosen: (n_V, n_H); splice column h
            mask_h = (jax.lax.broadcasted_iota(
                jnp.int32, (n_V, 1, n_H, 1), 2) == h)
            return jnp.where(mask_h, chosen[:, None, :, None], w_int)

        w_int = jax.lax.fori_loop(0, n_H, h_body, w_int)

        def a_body(a, a_int):
            sims = score_a(w_int, a_int, a)                # eq_n
            best = jnp.argmax(sims)
            chosen = a_cands[best]                         # n_a,1
            mask_a = (jax.lax.broadcasted_iota(
                jnp.int32, (n_a, 1), 0) == a)
            return jnp.where(mask_a, chosen, a_int)

        a_int = jax.lax.fori_loop(0, n_a, a_body, a_int)
        return w_int, a_int

    w_int, a_int = jax.lax.fori_loop(0, policy.search_round, round_body,
                                     (w_int0, a_int0))
    return w_int, a_int


def _pearson_w(raw, sim):
    """Reference _get_pearson_w (linear.py:426-439) with full-batch means.
    raw: (bs,T,1,n_V,crb); sim: (bs,T,P,n_V,crb) -> (bs,P,n_V)."""
    bs, T, P, n_V, crb = sim.shape
    s = sim.transpose(0, 1, 4, 3, 2).reshape(bs, T * crb, n_V, P)
    r = raw.transpose(0, 1, 4, 3, 2).reshape(bs, T * crb, n_V, 1)
    s = s - jnp.mean(s, axis=(0, 1), keepdims=True)
    r = r - jnp.mean(r, axis=(0, 1), keepdims=True)
    c = cosine_similarity(r, s, axis=1)                    # bs,n_V,P
    return c.transpose(0, 2, 1)


def _pearson_a(raw, sim):
    """Reference _get_pearson_a (linear.py:441-453). raw: (bs,T,1,oc);
    sim: (bs,T,P,oc) -> (bs,P)."""
    bs, T, P, oc = sim.shape
    s = sim.transpose(0, 1, 3, 2).reshape(bs, T * oc, P)
    r = raw.transpose(0, 1, 3, 2).reshape(bs, T * oc, 1)
    s = s - jnp.mean(s, axis=(0, 1), keepdims=True)
    r = r - jnp.mean(r, axis=(0, 1), keepdims=True)
    return cosine_similarity(r, s, axis=1)


def search_linear(w, b, cap, policy: OpPolicy,
                  budget: int = DEFAULT_BUDGET,
                  calib_bs: int = None, mesh=None) -> LinearQP:
    """Calibrate a linear op from captured raw data (host or device).
    ``calib_bs`` pins the batch scan chunk for the pearson metric (see
    module docstring)."""
    x = jnp.asarray(cap.inputs["x"])
    raw_out = None if cap.out is None else jnp.asarray(cap.out)
    S, ic = x.shape[0], x.shape[-1]
    oc = w.shape[0]
    T = int(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1
    x = x.reshape(S, T, ic)
    if raw_out is not None:
        raw_out = raw_out.reshape(S, T, oc)
    grad = (jnp.asarray(cap.grad).reshape(S, T, oc)
            if policy.metric == "hessian" else None)
    P, bs = plan_chunks(policy.eq_n, S, T * oc, budget)
    if policy.metric == "pearson" and calib_bs and S % calib_bs == 0:
        # pearson means are chunk-local in the reference (linear.py:426-453,
        # chunks of calib_batch_size): pin the scan chunk to reproduce them
        bs = calib_bs
        P = max(1, min(policy.eq_n, budget // max(bs * T * oc * 4, 1)))
    w_int, a_int = _linear_search_jit(
        jnp.asarray(w), None if b is None else jnp.asarray(b),
        x, raw_out, grad, policy, P, bs, use_pallas=_pallas_default(),
        int8_score=_int8_score_default(), mesh=mesh)
    postgelu = policy.quantizer == "postgelu_linear"
    a_qmax = fq.qmax_for_bit(policy.a_bit)
    return LinearQP(
        w_interval=w_int, a_interval=a_int,
        a_neg_interval=(jnp.float32(fq.GELU_NEG_CLIP / a_qmax)
                        if postgelu else None),
        w_bit=policy.w_bit, a_bit=policy.a_bit, postgelu=postgelu)


# ---------------------------------------------------------------------------
# matmul search
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("policy", "P", "bs", "n_G", "int8_score",
                                  "use_pallas", "mesh"))
def _matmul_search_jit(A, B, raw_out, raw_grad, policy: OpPolicy,
                       P: int, bs: int, n_G: int, int8_score: bool = False,
                       use_pallas: bool = False, mesh=None):
    """Full calibration_step2 of an A@B op (reference matmul.py:565-576).
    Head-wise groups: n_G_A = n_G_B = heads (matmul.py:411-417); the shipped
    configs use n_V=n_H=1 so block grids collapse and no padding occurs.

    A: (S,G,R,Ci); B: (S,G,Ci,Co); raw_out/raw_grad: (S,G,R,Co).
    """
    S, G, R, Ci = A.shape
    Co = B.shape[-1]
    sos = policy.quantizer == "sos_matmul"
    A_qmax = fq.qmax_for_bit(policy.a_bit)
    B_qmax = fq.qmax_for_bit(policy.b_bit)
    # the fused Pallas scorer reads the caches in their stored dtype and
    # casts per VMEM tile — keep pre-cast references for it
    A_raw, B_raw, grad_raw = A, B, raw_grad
    use_pallas = (use_pallas and not (policy.n_V_A != 1 or policy.n_H_A != 1
                                      or policy.n_V_B != 1
                                      or policy.n_H_B != 1)
                  and n_G == G and policy.metric == "hessian"
                  and raw_out is None and raw_grad is not None)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    recompute_raw = raw_out is None   # raw_out == A@B exactly; recomputing
                                      # per batch-chunk frees the largest
                                      # HBM tenant (device-resident mode)
    if raw_grad is None:
        raw_grad = jnp.zeros((1, 1, 1, 1), jnp.float32)

    # interval shapes (1,n_G,1,n_V,1,n_H,1) with n_V=n_H=1, n_G=G
    def init_interval(x, qmax):
        if policy.init_layerwise:
            return jnp.broadcast_to(
                fq.exact_div(jnp.max(jnp.abs(x)), qmax - 0.5)
                .reshape(1, 1, 1, 1, 1, 1, 1),
                (1, n_G, 1, 1, 1, 1, 1))
        return fq.matmul_operand_interval_init(x, n_G, 1, 1, qmax)

    B_int0 = init_interval(B, B_qmax)
    if sos:
        split0 = jnp.float32(0.01)                         # matmul.py:354
        A_int0 = None
    else:
        A_int0 = init_interval(A, A_qmax)
        split0 = None

    grid = fq.candidate_grid(policy.eq_alpha, policy.eq_beta, policy.eq_n)
    eq_n = policy.eq_n
    B_cands = grid[:eq_n].reshape(-1, 1, 1, 1, 1, 1, 1, 1) * B_int0[None]
    B_cands_c = _pad_chunk_candidates(B_cands, P)
    if not sos:
        A_cands = grid[:eq_n].reshape(-1, 1, 1, 1, 1, 1, 1, 1) * A_int0[None]
        A_cands_c = _pad_chunk_candidates(A_cands, P)
    splits = fq.sos_split_grid(20)                         # matmul.py:636

    Ab = _chunk_batch(A, bs)
    Bb = _chunk_batch(B, bs)
    rb = (jnp.zeros((Ab.shape[0], 1, 1, 1, 1), jnp.float32) if recompute_raw
          else _chunk_batch(raw_out.astype(jnp.float32), bs))
    gb = (_chunk_batch(raw_grad.astype(jnp.float32), bs)
          if policy.metric == "hessian"
          else jnp.zeros((Ab.shape[0], 1, 1, 1, 1), jnp.float32))

    def get_raw(a_s, b_s, r_s):
        if recompute_raw:
            return jnp.einsum("bgrc,bgco->bgro", a_s, b_s,
                              preferred_element_type=jnp.float32)
        return r_s

    def quant_A(a, a_state):
        if sos:
            return fq.sos_quant_softmax(a, a_state, A_qmax)
        return fq.fake_quant_matmul_operand(a, a_state, A_qmax)

    def _gview(x, lead=()):
        """(..., G, R, C) -> (..., n_G, G//n_G, R, C) block view."""
        sh = x.shape
        return x.reshape(sh[:-3] + (n_G, G // n_G) + sh[-2:])

    def _cand_levels(x_blocked, cur, qmax):
        """int8 levels of a (1,bs,n_G,crb,R,C) view under (P,n_G) scales."""
        return jnp.clip(jnp.round(x_blocked / cur.reshape(P, 1, n_G, 1, 1, 1)),
                        -qmax, qmax - 1).astype(jnp.int8)

    def _sos_levels(a, split):
        """SoS hi/lo int8 level sets + their scales (matmul.py:595-598)."""
        a_int = fq.exact_div(split, A_qmax - 1)
        hi = jnp.clip(jnp.round(jnp.clip(a, split, 1.0) * (A_qmax - 1)),
                      0, A_qmax - 1).astype(jnp.int8)
        lo = jnp.clip(jnp.round(fq.exact_div(jnp.clip(a, 0.0, split), a_int)),
                      0, A_qmax - 1).astype(jnp.int8)
        return hi, lo, fq.exact_div(jnp.float32(1.0), A_qmax - 1), a_int

    def _sim_reduce(out, r_s, g_s):
        """(P,bs,G,R,Co) -> (P, G) per-head summed similarity
        (matmul.py:510-518)."""
        raw = r_s[None]
        gc = g_s[None] if policy.metric == "hessian" else None
        sim = _feature_similarity(raw, out, policy.metric, gc, axis=-1)
        sim = jnp.mean(sim, axis=3)                        # P,bs,G
        return jnp.sum(sim, axis=1)                        # P,G

    def score_A(a_state, B_int):
        """(eq_n, G) summed sims of A-interval candidates
        (matmul.py:483-522); SoS scores split candidates instead
        (matmul.py:600-631, B left unquantized there)."""
        if not sos and use_pallas:
            # fused scorer: one pass over the caches for ALL candidates
            # (ops/pallas_search.matmul_hessian_sims); int8 rescale
            # semantics; 1/(R*Co) restores the mean-then-sum magnitude
            from ..ops.pallas_search import matmul_hessian_sims
            fn = lambda a_, b_, g_, c_, f_: matmul_hessian_sims(
                a_, b_, g_, c_, f_, "a", A_qmax, B_qmax)
            sh = (A_raw, B_raw, grad_raw)
            rep = (A_cands.reshape(eq_n, G), B_int.reshape(G))
            sims = (_mesh_sims(mesh, fn, sh, rep) if mesh is not None
                    else fn(*sh, *rep)) / (R * Co)
            return sims.reshape(eq_n, n_G, G // n_G).mean(-1)
        if sos:
            def cand_body(_, sp):                          # scalar split
                def batch_body(acc, inp):
                    a_s, b_s, r_s, g_s = inp
                    A_sim = fq.sos_quant_softmax(a_s, sp, A_qmax)
                    out = jnp.einsum("bgrc,bgco->bgro", A_sim, b_s,
                                     preferred_element_type=jnp.float32)
                    raw = get_raw(a_s, b_s, r_s)
                    gc = g_s if policy.metric == "hessian" else None
                    sim = _feature_similarity(raw, out, policy.metric, gc,
                                              axis=-1)     # bs,G,R
                    sim = jnp.mean(sim, axis=(1, 2))       # bs  (matmul.py:620)
                    return acc + jnp.sum(sim), None
                s, _ = jax.lax.scan(batch_body, jnp.float32(0.0),
                                    (Ab, Bb, rb, gb))
                return None, s
            _, sims = jax.lax.scan(cand_body, None, splits)
            return sims                                    # (20,)

        if int8_score:
            # fixed side as int8 levels; candidate side quantized to levels
            # in-scan; ONE rescale after the int32 dot
            B_lvb = jax.vmap(lambda b_s: jnp.clip(
                jnp.round(_gview(b_s)
                          / B_int.reshape(1, n_G, 1, 1, 1)),
                -B_qmax, B_qmax - 1).astype(jnp.int8)
                .reshape(bs, G, Ci, Co))(Bb)
            b_sc = B_int.reshape(n_G)

        else:
            B_simb = jax.vmap(lambda b_s: fq.fake_quant_matmul_operand(
                b_s, B_int, B_qmax))(Bb)

        def cand_body(_, ac):                              # P,1,n_G,1,1,1,1,1
            cur = ac                                       # n_V=n_H=1: whole
            def batch_body(acc, inp):
                a_s, b_raw, b_s, r_s, g_s = inp
                raw = get_raw(a_s, b_raw, r_s)
                blocked = a_s.reshape(1, bs, n_G, G // n_G, R, Ci)
                if int8_score:
                    a_lv = _cand_levels(blocked, cur, A_qmax) \
                        .reshape(P, bs, G, R, Ci)
                    acc32 = jnp.einsum("pbgrc,bgco->pbgro", a_lv, b_s,
                                       preferred_element_type=jnp.int32)
                    out = (_gview(acc32.astype(jnp.float32))
                           * cur.reshape(P, 1, n_G, 1, 1, 1)
                           * b_sc.reshape(1, 1, n_G, 1, 1, 1)) \
                        .reshape(P, bs, G, R, Co)
                else:
                    q = jnp.clip(jnp.round(
                        blocked / cur.reshape(P, 1, n_G, 1, 1, 1)),
                        -A_qmax, A_qmax - 1) * cur.reshape(P, 1, n_G, 1, 1, 1)
                    A_sim = q.reshape(P, bs, G, R, Ci)
                    out = jnp.einsum("pbgrc,bgco->pbgro", A_sim, b_s,
                                     preferred_element_type=jnp.float32)
                return acc + _sim_reduce(out, raw, g_s), None
            s, _ = jax.lax.scan(batch_body, jnp.zeros((P, G)),
                                (Ab, Bb, B_lvb if int8_score else B_simb,
                                 rb, gb))
            return None, s
        _, sims = jax.lax.scan(cand_body, None, A_cands_c)
        sims = sims.reshape(-1, G)[:eq_n]
        return sims.reshape(eq_n, n_G, G // n_G).mean(-1)  # eq_n, n_G

    def score_B(a_state, B_int):
        """(eq_n, n_G) summed sims of B-interval candidates
        (matmul.py:524-563)."""
        if use_pallas:
            from ..ops.pallas_search import matmul_hessian_sims
            sh = (A_raw, B_raw, grad_raw)
            if sos:
                a_int = fq.exact_div(a_state, A_qmax - 1)
                s_hi = fq.exact_div(jnp.float32(1.0), A_qmax - 1)
                fn = lambda a_, b_, g_, c_, f_, sv_: matmul_hessian_sims(
                    a_, b_, g_, c_, f_, "b_sos", B_qmax, A_qmax,
                    sos=(sv_[0], sv_[1], sv_[2], sv_[3]))
                rep = (B_cands.reshape(eq_n, G), jnp.ones((G,), jnp.float32),
                       jnp.stack([a_state, a_int, s_hi, a_int]))
            else:
                fn = lambda a_, b_, g_, c_, f_: matmul_hessian_sims(
                    a_, b_, g_, c_, f_, "b", B_qmax, A_qmax)
                rep = (B_cands.reshape(eq_n, G), a_state.reshape(G))
            sims = (_mesh_sims(mesh, fn, sh, rep) if mesh is not None
                    else fn(*sh, *rep)) / (R * Co)
            return sims.reshape(eq_n, n_G, G // n_G).mean(-1)
        if int8_score:
            # fixed A side as int8 levels (two level sets for SoS)
            if sos:
                packs = jax.vmap(lambda a_s: _sos_levels(a_s, a_state)[:2])(Ab)
                s_hi = fq.exact_div(jnp.float32(1.0), A_qmax - 1)
                s_lo = fq.exact_div(a_state, A_qmax - 1)
                A_lvb = jnp.stack(packs, axis=1)           # nb,2,bs,G,R,Ci
                a_sc = None
            else:
                A_lvb = jax.vmap(lambda a_s: jnp.clip(
                    jnp.round(_gview(a_s)
                              / a_state.reshape(1, n_G, 1, 1, 1)),
                    -A_qmax, A_qmax - 1).astype(jnp.int8)
                    .reshape(1, bs, G, R, Ci))(Ab)          # nb,1,bs,G,R,Ci
                a_sc = a_state.reshape(n_G)
        else:
            A_simb = jax.vmap(lambda a_s: quant_A(a_s, a_state))(Ab)

        def cand_body(_, bc):
            cur = bc
            def batch_body(acc, inp):
                a_raw, a_s, b_s, r_s, g_s = inp
                raw = get_raw(a_raw, b_s, r_s)
                blocked = b_s.reshape(1, bs, n_G, G // n_G, Ci, Co)
                if int8_score:
                    b_lv = _cand_levels(blocked, cur, B_qmax) \
                        .reshape(P, bs, G, Ci, Co)
                    if sos:
                        hi32 = jnp.einsum("bgrc,pbgco->pbgro", a_s[0], b_lv,
                                          preferred_element_type=jnp.int32)
                        lo32 = jnp.einsum("bgrc,pbgco->pbgro", a_s[1], b_lv,
                                          preferred_element_type=jnp.int32)
                        acc32 = (hi32.astype(jnp.float32) * s_hi
                                 + lo32.astype(jnp.float32) * s_lo)
                        out = (_gview(acc32)
                               * cur.reshape(P, 1, n_G, 1, 1, 1)) \
                            .reshape(P, bs, G, R, Co)
                    else:
                        acc32 = jnp.einsum("bgrc,pbgco->pbgro", a_s[0], b_lv,
                                           preferred_element_type=jnp.int32)
                        out = (_gview(acc32.astype(jnp.float32))
                               * cur.reshape(P, 1, n_G, 1, 1, 1)
                               * a_sc.reshape(1, 1, n_G, 1, 1, 1)) \
                            .reshape(P, bs, G, R, Co)
                else:
                    q = jnp.clip(jnp.round(
                        blocked / cur.reshape(P, 1, n_G, 1, 1, 1)),
                        -B_qmax, B_qmax - 1) * cur.reshape(P, 1, n_G, 1, 1, 1)
                    B_sim = q.reshape(P, bs, G, Ci, Co)
                    out = jnp.einsum("bgrc,pbgco->pbgro", a_s, B_sim,
                                     preferred_element_type=jnp.float32)
                return acc + _sim_reduce(out, raw, g_s), None
            s, _ = jax.lax.scan(batch_body, jnp.zeros((P, G)),
                                (Ab, A_lvb if int8_score else A_simb,
                                 Bb, rb, gb))
            return None, s
        _, sims = jax.lax.scan(cand_body, None, B_cands_c)
        sims = sims.reshape(-1, G)[:eq_n]
        return sims.reshape(eq_n, n_G, G // n_G).mean(-1)

    def round_body(_, carry):
        a_state, B_int = carry
        simsA = score_A(a_state, B_int)
        if sos:
            a_state = splits[jnp.argmax(simsA)]
        else:
            best = jnp.argmax(simsA, axis=0)               # n_G
            a_state = jnp.take_along_axis(
                A_cands.reshape(eq_n, n_G), best[None], axis=0)[0] \
                .reshape(1, n_G, 1, 1, 1, 1, 1)
        simsB = score_B(a_state, B_int)
        best = jnp.argmax(simsB, axis=0)
        B_int = jnp.take_along_axis(
            B_cands.reshape(eq_n, n_G), best[None], axis=0)[0] \
            .reshape(1, n_G, 1, 1, 1, 1, 1)
        return a_state, B_int

    a_state, B_int = jax.lax.fori_loop(
        0, policy.search_round, round_body,
        (split0 if sos else A_int0, B_int0))
    return a_state, B_int


@partial(jax.jit, static_argnames=("policy", "P", "bs", "n_G_A", "n_G_B"))
def _matmul_blocked_search_jit(A, B, raw_out, raw_grad, policy: OpPolicy,
                               P: int, bs: int, n_G_A: int, n_G_B: int):
    """General blocked-operand matmul search: each operand split
    n_G x n_V x n_H with ceil-div padding (reference PTQSLQuantMatMul
    matmul.py:109-138; search matmul.py:177-241 and its batching form
    matmul.py:483-563).  Per (v, h) block position, candidates are spliced
    into the current interval grid, similarities reduced per head, the
    group axis ZERO-padded to n_G*crb_g before the per-group mean
    (matmul.py:519 — reproduced including the zero pad), and argmaxed per
    group.  The shipped head-wise n_V=n_H=1 case takes the specialized
    `_matmul_search_jit`; this engine serves the reference's ablation
    surface.  SoS: split-grid A search (n_*_A forced 1), B blocked.
    """
    S, G, R, Ci = A.shape
    Co = B.shape[-1]
    sos = policy.quantizer == "sos_matmul"
    A_qmax = fq.qmax_for_bit(policy.a_bit)
    B_qmax = fq.qmax_for_bit(policy.b_bit)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    recompute_raw = raw_out is None
    if raw_grad is None:
        raw_grad = jnp.zeros((1, 1, 1, 1), jnp.float32)
    nVA, nHA = (1, 1) if sos else (policy.n_V_A, policy.n_H_A)
    nVB, nHB = policy.n_V_B, policy.n_H_B

    def init_interval(x, qmax, nG, nV, nH):
        if policy.init_layerwise:
            return jnp.broadcast_to(
                fq.exact_div(jnp.max(jnp.abs(x)), qmax - 0.5)
                .reshape(1, 1, 1, 1, 1, 1, 1), (1, nG, 1, nV, 1, nH, 1))
        return fq.matmul_operand_interval_init(x, nG, nV, nH, qmax)

    B_int0 = init_interval(B, B_qmax, n_G_B, nVB, nHB)
    a_state0 = (jnp.float32(0.01) if sos
                else init_interval(A, A_qmax, n_G_A, nVA, nHA))

    grid = fq.candidate_grid(policy.eq_alpha, policy.eq_beta, policy.eq_n)
    eq_n = policy.eq_n
    B_cands = grid[:eq_n].reshape(-1, 1, 1, 1, 1, 1, 1, 1) * B_int0[None]
    A_cands = (None if sos else
               grid[:eq_n].reshape(-1, 1, 1, 1, 1, 1, 1, 1) * a_state0[None])
    splits = fq.sos_split_grid(20)

    Ab = _chunk_batch(A, bs)
    Bb = _chunk_batch(B, bs)
    rb = (jnp.zeros((Ab.shape[0], 1, 1, 1, 1), jnp.float32) if recompute_raw
          else _chunk_batch(raw_out.astype(jnp.float32), bs))
    gb = (_chunk_batch(raw_grad.astype(jnp.float32), bs)
          if policy.metric == "hessian"
          else jnp.zeros((Ab.shape[0], 1, 1, 1, 1), jnp.float32))

    def get_raw(a_s, b_s, r_s):
        if recompute_raw:
            return jnp.einsum("bgrc,bgco->bgro", a_s, b_s,
                              preferred_element_type=jnp.float32)
        return r_s

    def quant_A_state(a, st):
        if sos:
            return fq.sos_quant_softmax(a, st, A_qmax)
        return fq.fake_quant_matmul_operand(a, st, A_qmax)

    def quant_P(x_s, cur, qmax, nG, nV, nH, R_, C_):
        """Blocked quant of (bs,G,R_,C_) under P interval grids
        (P,1,nG,1,nV,1,nH,1) -> (P,bs,G,R_,C_), pad/unpad round trip
        (matmul.py:124-138)."""
        crb_g, crb_r, crb_c, pg, pr, pc = fq.matmul_block_shape(
            x_s.shape, nG, nV, nH)
        xp = jnp.pad(x_s, ((0, 0), (0, pg), (0, pr), (0, pc)))
        xbk = xp.reshape(1, bs, nG, crb_g, nV, crb_r, nH, crb_c)
        cur8 = cur.reshape(P, 1, nG, 1, nV, 1, nH, 1)
        q = jnp.clip(jnp.round(xbk / cur8), -qmax, qmax - 1) * cur8
        q = q.reshape(P, bs, nG * crb_g, nV * crb_r, nH * crb_c)
        return q[:, :, :G, :R_, :C_]

    def head_sims(out, raw, g_s):
        """(P,bs,G,R,Co) -> (P,G): feature metric over Co, mean over rows,
        summed over the batch (matmul.py:511-513)."""
        raw = raw[None]
        gc = g_s[None] if policy.metric == "hessian" else None
        sim = _feature_similarity(raw, out, policy.metric, gc, axis=-1)
        return jnp.sum(jnp.mean(sim, axis=3), axis=1)      # P,G

    def group_reduce(sims, nG):
        """(eq_n, G) head sims -> (eq_n, nG): ZERO-pad the group axis to
        nG*crb_g, then per-group mean (matmul.py:519)."""
        crb_g = -(-G // nG)
        sims = jnp.pad(sims, ((0, 0), (0, nG * crb_g - G)))
        return sims.reshape(eq_n, nG, crb_g).mean(-1)

    def search_blocks(opA: bool, a_state, B_int):
        nG = n_G_A if opA else n_G_B
        nV = nVA if opA else nVB
        nH = nHA if opA else nHB
        cands = A_cands if opA else B_cands
        cands_c = _pad_chunk_candidates(cands, P)
        qmax = A_qmax if opA else B_qmax
        interval0 = a_state if opA else B_int
        if opA:
            otherq = jax.vmap(lambda b_s: fq.fake_quant_matmul_operand(
                b_s, B_int, B_qmax))(Bb)
        else:
            otherq = jax.vmap(lambda a_s: quant_A_state(a_s, a_state))(Ab)

        def mask_vh(v, h):
            shape7 = (1, 1, 1, nV, 1, nH, 1)
            return ((jax.lax.broadcasted_iota(jnp.int32, shape7, 3) == v)
                    & (jax.lax.broadcasted_iota(jnp.int32, shape7, 5) == h))

        def vh_body(idx, interval):
            v, h = idx // nH, idx % nH
            m = mask_vh(v, h)

            def cand_body(_, cc):                # cc: P,1,nG,1,nV,1,nH,1
                cur = jnp.where(m, cc, interval[None])

                def batch_body(acc, inp):
                    a_s, b_s, oq, r_s, g_s = inp
                    raw = get_raw(a_s, b_s, r_s)
                    if opA:
                        x_q = quant_P(a_s, cur, qmax, nG, nV, nH, R, Ci)
                        out = jnp.einsum("pbgrc,bgco->pbgro", x_q, oq,
                                         preferred_element_type=jnp.float32)
                    else:
                        x_q = quant_P(b_s, cur, qmax, nG, nV, nH, Ci, Co)
                        out = jnp.einsum("bgrc,pbgco->pbgro", oq, x_q,
                                         preferred_element_type=jnp.float32)
                    return acc + head_sims(out, raw, g_s), None

                s, _ = jax.lax.scan(batch_body, jnp.zeros((P, G)),
                                    (Ab, Bb, otherq, rb, gb))
                return None, s

            _, sims = jax.lax.scan(cand_body, None, cands_c)
            sims = group_reduce(sims.reshape(-1, G)[:eq_n], nG)
            best = jnp.argmax(sims, axis=0)                # (nG,)
            chosen = jnp.take_along_axis(
                cands.reshape(eq_n, nG, nV, nH),
                jnp.broadcast_to(best[None, :, None, None], (1, nG, nV, nH)),
                axis=0)[0]
            chosen7 = chosen.reshape(1, nG, 1, nV, 1, nH, 1)
            return jnp.where(m, chosen7, interval)

        return jax.lax.fori_loop(0, nV * nH, vh_body, interval0)

    def score_splits(B_int):
        """SoS split grid (matmul.py:600-631; B raw in the A search)."""
        def cand_body(_, sp):
            def batch_body(acc, inp):
                a_s, b_s, r_s, g_s = inp
                A_sim = fq.sos_quant_softmax(a_s, sp, A_qmax)
                out = jnp.einsum("bgrc,bgco->bgro", A_sim, b_s,
                                 preferred_element_type=jnp.float32)
                raw = get_raw(a_s, b_s, r_s)
                gc = g_s if policy.metric == "hessian" else None
                sim = _feature_similarity(raw, out, policy.metric, gc,
                                          axis=-1)
                return acc + jnp.sum(jnp.mean(sim, axis=(1, 2))), None
            s, _ = jax.lax.scan(batch_body, jnp.float32(0.0),
                                (Ab, Bb, rb, gb))
            return None, s
        _, sims = jax.lax.scan(cand_body, None, splits)
        return sims

    def round_body(_, carry):
        a_state, B_int = carry
        if sos:
            a_state = splits[jnp.argmax(score_splits(B_int))]
        else:
            a_state = search_blocks(True, a_state, B_int)
        B_int = search_blocks(False, a_state, B_int)
        return a_state, B_int

    return jax.lax.fori_loop(0, policy.search_round, round_body,
                             (a_state0, B_int0))


def search_matmul(cap, policy: OpPolicy,
                  budget: int = DEFAULT_BUDGET, mesh=None) -> MatMulQP:
    """Calibrate an A@B op from captured raw data (head-wise groups).
    Accepts host or device arrays; ``cap.out=None`` recomputes raw_out as
    A@B inside the search (exact — same op, same operands)."""
    A = jnp.asarray(cap.inputs["a"])
    B = jnp.asarray(cap.inputs["b"])
    raw_out = None if cap.out is None else jnp.asarray(cap.out)
    grad = (jnp.asarray(cap.grad)
            if policy.metric == "hessian" else None)
    S, G, R, _ = A.shape
    Co = B.shape[-1]
    P, bs = plan_chunks(policy.eq_n, S, G * R * Co, budget)
    sos = policy.quantizer == "sos_matmul"
    blocked = (policy.n_V_A != 1 or policy.n_H_A != 1 or policy.n_V_B != 1
               or policy.n_H_B != 1 or policy.n_G_A > 1 or policy.n_G_B > 1)
    if blocked:
        # general n_G x n_V x n_H operand grids (the reference's ablation
        # surface, matmul.py:177-241); n_G defaults to head-wise like the
        # batching class (matmul.py:411-417), an explicit policy n_G > 1
        # overrides it (the non-batching class's free n_G)
        n_G_A = policy.n_G_A if policy.n_G_A > 1 else G
        n_G_B = policy.n_G_B if policy.n_G_B > 1 else G
        a_state, B_int = _matmul_blocked_search_jit(
            A, B, raw_out, grad, policy, P, bs, n_G_A, n_G_B)
    else:
        int8 = _int8_score_default()
        # the fused Pallas matmul scorer has int8-rescale semantics ONLY, so
        # PTQ4VIT_TPU_INT8_SCORE=0 (exact fp32 reference rounding) must also
        # bypass it — otherwise the flag would be silently ignored for
        # matmul searches on accelerators
        a_state, B_int = _matmul_search_jit(
            A, B, raw_out, grad, policy, P, bs, G,
            int8_score=int8,
            use_pallas=_pallas_default() and int8, mesh=mesh)
    A_qmax = fq.qmax_for_bit(policy.a_bit)
    if sos:
        return MatMulQP(A_interval=a_state / (A_qmax - 1), B_interval=B_int,
                        split=a_state, A_bit=policy.a_bit, B_bit=policy.b_bit)
    return MatMulQP(A_interval=a_state, B_interval=B_int, split=None,
                    A_bit=policy.a_bit, B_bit=policy.b_bit)


def search_matmul_batch(caps, policy: OpPolicy,
                        budget: int = DEFAULT_BUDGET):
    """Calibrate L same-shape matmul ops in ONE vmapped dispatch.

    The reference searches each module separately (matmul.py:565-576); on a
    high-dispatch-latency device, L separate jit calls for the L identical
    window-attention matmuls of a Swin stage cost L dispatches and run
    MXU-hostile small shapes one at a time.  vmapping the whole search over
    the op axis amortizes both.  Results are identical to per-op calls
    (the op axis is batched, never reduced over).

    caps: list of OpCapture with identical A/B/grad shapes.  CONSUMES the
    caps: their buffers are released as soon as the stacked copies are
    built, so the transient op-axis copy does not stack on top of the
    resident group caches (HBM headroom).
    Returns [MatMulQP] in caps order.
    """
    L = len(caps)
    if L == 1:
        return [search_matmul(caps[0], policy, budget)]
    A = jnp.stack([jnp.asarray(c.inputs["a"]) for c in caps])
    B = jnp.stack([jnp.asarray(c.inputs["b"]) for c in caps])
    have_raw = caps[0].out is not None
    have_grad = policy.metric == "hessian"
    raw = (jnp.stack([jnp.asarray(c.out) for c in caps]) if have_raw
           else jnp.zeros((L, 1), jnp.float32))
    grad = (jnp.stack([jnp.asarray(c.grad) for c in caps]) if have_grad
            else jnp.zeros((L, 1), jnp.float32))
    for c in caps:
        c.inputs.clear()
        c.out = None
        c.grad = None
    S, G, R, _ = A.shape[1:]
    Co = B.shape[-1]
    P, bs = plan_chunks(policy.eq_n, S, L * G * R * Co, budget)

    def one(a, b, r, g):
        # use_pallas stays off here: the cohort path vmaps the whole
        # search and a batched pallas_call lowering is not exercised —
        # the XLA int8 scorer is the vmap-safe engine
        return _matmul_search_jit(a, b, r if have_raw else None,
                                  g if have_grad else None,
                                  policy, P, bs, G,
                                  int8_score=_int8_score_default())

    a_states, B_ints = jax.vmap(one)(A, B, raw, grad)
    A_qmax = fq.qmax_for_bit(policy.a_bit)
    sos = policy.quantizer == "sos_matmul"
    out = []
    for i in range(L):
        a_state, B_int = a_states[i], B_ints[i]
        if sos:
            out.append(MatMulQP(A_interval=a_state / (A_qmax - 1),
                                B_interval=B_int, split=a_state,
                                A_bit=policy.a_bit, B_bit=policy.b_bit))
        else:
            out.append(MatMulQP(A_interval=a_state, B_interval=B_int,
                                split=None, A_bit=policy.a_bit,
                                B_bit=policy.b_bit))
    return out


# ---------------------------------------------------------------------------
# conv search (patch-embedding conv as matmul)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("policy", "P", "bs", "channelwise"))
def _conv_search_jit(w, b, x, raw_out, raw_grad, policy: OpPolicy,
                     P: int, bs: int, channelwise: bool):
    """Full calibration_step2 of the patch-embed conv (reference
    ChannelwiseBatchingQuantConv2d.calibration_step2, conv.py:591-603, and
    BatchingEasyQuantConv2d, conv.py:429-441).

    x: (S, N, icp) patchified input; w: (oc, icp) flattened kernel.
    Similarity reductions operate on the token axis — elementwise-equivalent
    to the reference's NCHW spatial means.
    """
    x = x.astype(jnp.float32)
    if raw_out is None:
        # store_raw_out=False capture: same dot as conv2d_patch
        # (models/common.py) on the same operands -> bit-identical
        raw_out = jnp.matmul(x, w.astype(jnp.float32).T,
                             preferred_element_type=jnp.float32)
        if b is not None:
            raw_out = raw_out + b
    raw_out = raw_out.astype(jnp.float32)
    if raw_grad is not None:
        raw_grad = raw_grad.astype(jnp.float32)
    S, N, icp = x.shape
    oc = w.shape[0]
    w_qmax = fq.qmax_for_bit(policy.w_bit)
    a_qmax = fq.qmax_for_bit(policy.a_bit)
    quant_act = policy.a_bit < 32
    if raw_grad is None:
        raw_grad = jnp.zeros((1, 1, 1), jnp.float32)

    if channelwise:
        if policy.init_layerwise:
            w_int0 = jnp.broadcast_to(fq.minmax_interval(w, w_qmax)
                                      .reshape(1, 1), (oc, 1))
        else:
            w_int0 = fq.exact_div(jnp.amax(jnp.abs(w), axis=1, keepdims=True),
                                  w_qmax - 0.5)            # oc,1
    else:
        w_int0 = fq.minmax_interval(w, w_qmax).reshape(1, 1)
    a_int0 = fq.exact_div(jnp.max(jnp.abs(x)), a_qmax - 0.5)

    grid = fq.candidate_grid(policy.eq_alpha, policy.eq_beta, policy.eq_n)
    eq_n = policy.eq_n
    w_cands = grid[:eq_n, None, None] * w_int0[None]       # eq_n,oc|1,1
    a_cands = grid[:eq_n] * a_int0
    w_cands_c = _pad_chunk_candidates(w_cands, P)
    a_cands_c = _pad_chunk_candidates(a_cands, P)

    xb = _chunk_batch(x, bs)
    rb = _chunk_batch(raw_out, bs)
    gb = (_chunk_batch(raw_grad, bs) if policy.metric == "hessian"
          else jnp.zeros((xb.shape[0], 1, 1, 1), jnp.float32))

    def score_w(w_int, a_int):
        def cand_body(_, wc):                              # P,oc|1,1
            w_sim = fq.int_quant(w[None], wc, w_qmax) * wc  # P,oc,icp

            def batch_body(acc, inp):
                x_s, r_s, g_s = inp
                if quant_act:
                    x_s = fq.fake_quant(x_s, a_int, a_qmax)
                out = jnp.einsum("bti,poi->btpo", x_s, w_sim,
                                 preferred_element_type=jnp.float32)
                if b is not None:
                    out = out + b
                raw = r_s[:, :, None]                      # bs,N,1,oc
                if channelwise:
                    # per-channel selection (conv.py:498-557)
                    if policy.metric == "cosine":
                        sim = cosine_similarity(
                            raw.transpose(0, 2, 3, 1),
                            out.transpose(0, 2, 3, 1), axis=-1)  # bs,P,oc
                    else:
                        gc = (g_s[:, :, None]
                              if policy.metric == "hessian" else None)
                        sim = _feature_similarity(raw, out, policy.metric,
                                                  gc, axis=())  # elementwise
                        sim = jnp.mean(sim, axis=1)        # bs,P,oc
                    return acc + jnp.sum(sim, axis=0), None
                # layerwise: metric over channel axis (conv.py:365-396)
                if policy.metric == "cosine":
                    sim = cosine_similarity(raw, out, axis=-1)  # bs,N,P
                    sim = jnp.mean(sim, axis=1)
                elif policy.metric == "pearson":
                    sim = cosine_similarity(
                        raw.reshape(bs, 1, -1), out.transpose(0, 2, 1, 3)
                        .reshape(bs, P, -1), axis=-1)      # bs,P
                else:
                    gc = (g_s[:, :, None]
                          if policy.metric == "hessian" else None)
                    sim = _feature_similarity(raw, out, policy.metric, gc,
                                              axis=-1)     # bs,N,P
                    sim = jnp.mean(sim, axis=1)            # bs,P
                return acc + jnp.sum(sim, axis=0), None

            s, _ = jax.lax.scan(
                batch_body,
                jnp.zeros((P, oc) if channelwise else (P,)), (xb, rb, gb))
            return None, s

        _, sims = jax.lax.scan(cand_body, None, w_cands_c)
        return sims.reshape((-1, oc) if channelwise else (-1,))[:eq_n]

    def score_a(w_int, a_int):
        # (oc,1) channelwise interval broadcasts over (oc,icp); scalar
        # layerwise likewise (reference quant_weight_bias, conv.py:570)
        w_sim = fq.fake_quant(w, w_int, w_qmax)

        def cand_body(_, ac):                              # (P,)
            def batch_body(acc, inp):
                x_s, r_s, g_s = inp
                x_sim = (jnp.clip(jnp.round(
                    x_s[:, :, None] / ac[None, None, :, None]),
                    -a_qmax, a_qmax - 1) * ac[None, None, :, None])
                out = jnp.einsum("btpi,oi->btpo", x_sim, w_sim,
                                 preferred_element_type=jnp.float32)
                if b is not None:
                    out = out + b
                raw = r_s[:, :, None]
                gc = (g_s[:, :, None] if policy.metric == "hessian" else None)
                if channelwise:
                    # elementwise metric, then mean over (channels, tokens)
                    # == reference mean over [oc, fw, fh] (conv.py:582)
                    if policy.metric == "cosine":
                        sim = cosine_similarity(
                            raw.transpose(0, 2, 3, 1),
                            out.transpose(0, 2, 3, 1), axis=-1)  # bs,P,oc
                        sim = jnp.mean(sim, axis=2)              # bs,P
                    else:
                        sim = _feature_similarity(raw, out, policy.metric,
                                                  gc, axis=())   # bs,N,P,oc
                        sim = jnp.mean(sim, axis=(1, 3))         # bs,P
                else:
                    # metric over channel axis, mean over tokens
                    # (conv.py:419-420; the reference's own mean there is a
                    # latent shape bug on a path its configs never enable)
                    sim = _feature_similarity(raw, out, policy.metric, gc,
                                              axis=-1)           # bs,N,P
                    sim = jnp.mean(sim, axis=1)                  # bs,P
                return acc + jnp.sum(sim, axis=0), None

            s, _ = jax.lax.scan(batch_body, jnp.zeros((P,)), (xb, rb, gb))
            return None, s

        _, sims = jax.lax.scan(cand_body, None, a_cands_c)
        return sims.reshape(-1)[:eq_n]

    def round_body(_, carry):
        w_int, a_int = carry
        sims = score_w(w_int, a_int)
        if channelwise:
            best = jnp.argmax(sims, axis=0)                # oc
            w_int = jnp.take_along_axis(w_cands[:, :, 0], best[None],
                                        axis=0)[0][:, None]
        else:
            w_int = w_cands[jnp.argmax(sims)]
        if quant_act:
            a_int = a_cands[jnp.argmax(score_a(w_int, a_int))]
        return w_int, a_int

    w_int, a_int = jax.lax.fori_loop(0, policy.search_round, round_body,
                                     (w_int0, a_int0))
    return w_int, a_int


@partial(jax.jit, static_argnames=("policy", "P", "bs"))
def _conv_ptqsl_search_jit(w, b, x, raw_out, raw_grad, policy: OpPolicy,
                           P: int, bs: int):
    """Sub-layerwise n_V x n_H conv weight grid (reference PTQSLQuantConv2d,
    conv.py:126-277): per-(v,h) candidate splice into the current interval,
    channel-axis metric, SCALAR argmax per block position (conv.py:214-219 —
    unlike the linear search there is no per-row-block argmax), alternating
    with the layerwise input search (conv.py:222-243, skipped at a_bit>=32).

    x: (S, N, icp) patchified input; w: (oc, icp) flattened kernel.
    """
    x = x.astype(jnp.float32)
    if raw_out is None:
        # store_raw_out=False capture: same dot as conv2d_patch
        # (models/common.py) on the same operands -> bit-identical
        raw_out = jnp.matmul(x, w.astype(jnp.float32).T,
                             preferred_element_type=jnp.float32)
        if b is not None:
            raw_out = raw_out + b
    raw_out = raw_out.astype(jnp.float32)
    if raw_grad is not None:
        raw_grad = raw_grad.astype(jnp.float32)
    S, N, icp = x.shape
    oc = w.shape[0]
    n_V, n_H = policy.n_V, policy.n_H
    w_qmax = fq.qmax_for_bit(policy.w_bit)
    a_qmax = fq.qmax_for_bit(policy.a_bit)
    quant_act = policy.a_bit < 32
    if raw_grad is None:
        raw_grad = jnp.zeros((1, 1, 1), jnp.float32)

    # interval init (conv.py:246-251)
    if policy.init_layerwise:
        w_int0 = jnp.broadcast_to(fq.minmax_interval(w, w_qmax)
                                  .reshape(1, 1, 1, 1), (n_V, 1, n_H, 1))
    else:
        w_int0 = fq.blocked_weight_interval_init(w, n_V, n_H, w_qmax)
    a_int0 = fq.exact_div(jnp.max(jnp.abs(x)), a_qmax - 0.5)

    grid = fq.candidate_grid(policy.eq_alpha, policy.eq_beta, policy.eq_n)
    eq_n = policy.eq_n
    w_cands = grid[:eq_n, None, None, None, None] * w_int0[None]
    a_cands = grid[:eq_n] * a_int0
    w_cands_c = _pad_chunk_candidates(w_cands, P)          # nc,P,n_V,1,n_H,1
    a_cands_c = _pad_chunk_candidates(a_cands, P)

    xb = _chunk_batch(x, bs)
    rb = _chunk_batch(raw_out, bs)
    gb = (_chunk_batch(raw_grad, bs) if policy.metric == "hessian"
          else jnp.zeros((xb.shape[0], 1, 1, 1), jnp.float32))
    w4 = fq.blocked_weight_view(w, n_V, n_H)

    def mask_vh(v, h):
        return ((jax.lax.broadcasted_iota(jnp.int32, (n_V, 1, n_H, 1), 0) == v)
                & (jax.lax.broadcasted_iota(jnp.int32, (n_V, 1, n_H, 1), 2)
                   == h))

    def chan_sims(out, r_s, g_s):
        """(bs,N,P,oc) -> (P,): channel-axis metric, mean over tokens,
        summed over the batch (mean in the reference — argmax-equivalent)."""
        raw = r_s[:, :, None]
        if policy.metric == "cosine":
            sim = cosine_similarity(raw, out, axis=-1)     # bs,N,P
        else:
            gc = (g_s[:, :, None] if policy.metric == "hessian" else None)
            sim = _feature_similarity(raw, out, policy.metric, gc, axis=-1)
        return jnp.sum(jnp.mean(sim, axis=1), axis=0)      # P

    def score_w(w_int, a_int, v, h):
        m = mask_vh(v, h)

        def cand_body(_, wc):                              # wc: P,n_V,1,n_H,1
            cur = jnp.where(m, wc, w_int[None])
            w_sim = (fq.int_quant(w4[None], cur, w_qmax)
                     * cur).reshape(P, oc, icp)

            def batch_body(acc, inp):
                x_s, r_s, g_s = inp
                if quant_act:
                    x_s = fq.fake_quant(x_s, a_int, a_qmax)
                out = jnp.einsum("bti,poi->btpo", x_s, w_sim,
                                 preferred_element_type=jnp.float32)
                if b is not None:
                    out = out + b
                return acc + chan_sims(out, r_s, g_s), None

            s, _ = jax.lax.scan(batch_body, jnp.zeros((P,)), (xb, rb, gb))
            return None, s

        _, sims = jax.lax.scan(cand_body, None, w_cands_c)
        return sims.reshape(-1)[:eq_n]

    def score_a(w_int):
        w_sim = fq.fake_quant_weight_blocked(w, w_int, w_qmax)

        def cand_body(_, ac):                              # (P,)
            def batch_body(acc, inp):
                x_s, r_s, g_s = inp
                x_sim = (jnp.clip(jnp.round(
                    x_s[:, :, None] / ac[None, None, :, None]),
                    -a_qmax, a_qmax - 1) * ac[None, None, :, None])
                out = jnp.einsum("btpi,oi->btpo", x_sim, w_sim,
                                 preferred_element_type=jnp.float32)
                if b is not None:
                    out = out + b
                return acc + chan_sims(out, r_s, g_s), None

            s, _ = jax.lax.scan(batch_body, jnp.zeros((P,)), (xb, rb, gb))
            return None, s

        _, sims = jax.lax.scan(cand_body, None, a_cands_c)
        return sims.reshape(-1)[:eq_n]

    def round_body(_, carry):
        w_int, a_int = carry

        def vh_body(idx, w_int):
            v, h = idx // n_H, idx % n_H
            best = jnp.argmax(score_w(w_int, a_int, v, h))
            return jnp.where(mask_vh(v, h), w_cands[best], w_int)

        w_int = jax.lax.fori_loop(0, n_V * n_H, vh_body, w_int)
        if quant_act:
            a_int = a_cands[jnp.argmax(score_a(w_int))]
        return w_int, a_int

    return jax.lax.fori_loop(0, policy.search_round, round_body,
                             (w_int0, a_int0))


def chunked_quantile(x: np.ndarray, q: float) -> float:
    """Quantile with the reference's >=2^24-element chunking: the mean of
    per-chunk quantiles (QuantileQuantConv2d._quantile, conv.py:111-116)."""
    flat = np.abs(np.asarray(x)).reshape(-1)
    if flat.size >= 16777216:
        n = flat.size // 16777216
        chunks = flat[:16777216 * n].reshape(n, 16777216)
        return float(np.mean(np.quantile(chunks, q, axis=1)))
    return float(np.quantile(flat, q))


def quantile_conv(w, cap, policy: OpPolicy) -> ConvQP:
    """Quantile-based conv scale init, no search (reference
    QuantileQuantConv2d, conv.py:91-124)."""
    w_qmax = fq.qmax_for_bit(policy.w_bit)
    a_qmax = fq.qmax_for_bit(policy.a_bit)
    w_int = jnp.float32(chunked_quantile(w, policy.w_quantile)
                        / (w_qmax - 0.5))
    a_int = None
    if policy.a_bit < 32:
        a_int = jnp.float32(
            chunked_quantile(cap.inputs["x"], policy.a_quantile)
            / (a_qmax - 0.5))
    return ConvQP(w_interval=w_int, a_interval=a_int,
                  w_bit=policy.w_bit, a_bit=policy.a_bit)


def search_conv(w, b, cap, policy: OpPolicy,
                budget: int = DEFAULT_BUDGET) -> ConvQP:
    """Calibrate the patch-embedding conv.  w: (oc, ic, kh, kw)."""
    if policy.quantizer == "conv_quantile":
        return quantile_conv(np.asarray(w), cap, policy)
    x = jnp.asarray(cap.inputs["x"])                        # S,N,icp
    raw_out = None if cap.out is None else jnp.asarray(cap.out)  # S,N,oc
    grad = (jnp.asarray(cap.grad)
            if policy.metric == "hessian" else None)
    oc = w.shape[0]
    wm = jnp.asarray(w).reshape(oc, -1)
    S, N, _ = x.shape
    P, bs = plan_chunks(policy.eq_n, S, N * oc, budget)
    if policy.quantizer == "conv_ptqsl":
        # n_V x n_H sub-layerwise weight grid (PTQSLQuantConv2d)
        w_int, a_int = _conv_ptqsl_search_jit(
            wm, None if b is None else jnp.asarray(b),
            x, raw_out, grad, policy, P, bs)
        return ConvQP(w_interval=w_int,
                      a_interval=(a_int if policy.a_bit < 32 else None),
                      w_bit=policy.w_bit, a_bit=policy.a_bit, blocked=True)
    channelwise = policy.quantizer == "conv_channelwise"
    w_int, a_int = _conv_search_jit(
        wm, None if b is None else jnp.asarray(b),
        x, raw_out, grad, policy, P, bs,
        channelwise)
    # store conv-layout interval: (oc,1,1,1) channelwise, scalar layerwise
    if channelwise:
        w_int = w_int.reshape(oc, 1, 1, 1)
    else:
        w_int = w_int.reshape(())
    return ConvQP(w_interval=w_int,
                  a_interval=(a_int if policy.a_bit < 32 else None),
                  w_bit=policy.w_bit, a_bit=policy.a_bit)
