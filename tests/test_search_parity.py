"""Search-engine parity vs torch oracles implementing the reference
algorithm semantics (alternating candidate grid search, summed-then-argmaxed
similarities, eq_n-of-eq_n+1 candidate scoring, head-wise matmul groups,
twin-uniform and SoS quantizers).

Oracles are unchunked (chunking does not change the math) and written
directly from the documented semantics in SURVEY.md §2.1.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ptq4vit_tpu.calib.capture import OpCapture
from ptq4vit_tpu.calib import search as S
from ptq4vit_tpu.configs.policy import OpPolicy
from ptq4vit_tpu.quant.fakequant import GELU_NEG_CLIP


def T(x):
    return torch.from_numpy(np.asarray(x).copy())


def grid_t(pol):
    return torch.tensor([pol.eq_alpha + i * (pol.eq_beta - pol.eq_alpha)
                         / pol.eq_n for i in range(pol.eq_n + 1)],
                        dtype=torch.float32)


def tsim(raw, sim, metric, grad=None, dim=-1):
    if metric == "cosine":
        return torch.nn.functional.cosine_similarity(raw, sim, dim=dim)
    if metric == "L1_norm":
        s = -(raw - sim).abs()
    elif metric == "L2_norm":
        s = -((raw - sim) ** 2)
    elif metric == "hessian":
        s = -((grad * (raw - sim)) ** 2)
    else:
        raise NotImplementedError
    return s.mean(dim)


# ---------------------------------------------------------------------------
# linear oracle
# ---------------------------------------------------------------------------

def oracle_linear(w, b, x, raw_out, grad, pol, postgelu=False):
    w, x, raw_out = T(w), T(x), T(raw_out)
    b = None if b is None else T(b)
    grad = None if grad is None else T(grad)
    S_, Tk, ic = x.shape
    oc = raw_out.shape[-1]
    n_V, n_H, n_a = pol.n_V, pol.n_H, pol.n_a
    crb_r, crb_c, crb_a = oc // n_V, ic // n_H, ic // n_a
    wq, aq = 2 ** (pol.w_bit - 1), 2 ** (pol.a_bit - 1)
    neg = GELU_NEG_CLIP / aq

    w4 = w.view(n_V, crb_r, n_H, crb_c)
    w_int = w4.abs().amax([1, 3], keepdim=True) / (wq - 0.5)
    xg = x.view(S_, Tk, n_a, crb_a)
    val = xg if postgelu else xg.abs()
    a_int = (val.amax([0, 1, 3]) / (aq - 0.5)).unsqueeze(-1)

    g = grid_t(pol)
    w_c = g.view(-1, 1, 1, 1, 1) * w_int.unsqueeze(0)
    a_c = g.view(1, 1, -1) * a_int.unsqueeze(-1)

    def quant_in(xx, ai):
        xgg = xx.view(S_, Tk, n_a, crb_a)
        if postgelu:
            xp = (xgg / ai).round_().clamp_(0, aq - 1) * ai
            xn = (xgg / neg).round_().clamp_(-aq, 0) * neg
            return (xp + xn).view(S_, Tk, ic)
        return ((xgg / ai).round_().clamp_(-aq, aq - 1) * ai).view(S_, Tk, ic)

    for _ in range(pol.search_round):
        for h in range(n_H):
            sims = []
            for i in range(pol.eq_n):   # last candidate never scored
                cur = w_int.clone()
                cur[:, :, h:h + 1, :] = w_c[i, :, :, h:h + 1, :]
                w_sim = ((w4 / cur).round().clamp(-wq, wq - 1) * cur) \
                    .view(oc, ic)
                out = torch.nn.functional.linear(quant_in(x, a_int), w_sim, b)
                outc = out.view(S_, Tk, n_V, crb_r)
                rawc = raw_out.view(S_, Tk, n_V, crb_r)
                gc = None if grad is None else grad.view(S_, Tk, n_V, crb_r)
                s = tsim(rawc, outc, pol.metric, gc)        # S,T,n_V
                sims.append(s.mean(1).sum(0))               # n_V
            best = torch.stack(sims).argmax(0)              # n_V
            for v in range(n_V):
                w_int[v, :, h, :] = w_c[best[v], v, :, h, :]
        for a in range(n_a):
            sims = []
            for i in range(pol.eq_n):
                cur = a_int.clone()
                cur[a] = a_c[a, :, i]
                w_sim = ((w4 / w_int).round().clamp(-wq, wq - 1) * w_int) \
                    .view(oc, ic)
                out = torch.nn.functional.linear(quant_in(x, cur), w_sim, b)
                gc = grad
                s = tsim(raw_out, out, pol.metric, gc)      # S,T
                sims.append(s.mean(1).sum(0))
            best = int(torch.stack(sims).argmax())
            a_int[a] = a_c[a, :, best]
    return w_int.numpy(), a_int.numpy()


def _pol(**kw):
    d = dict(quantizer="linear", metric="L2_norm", eq_alpha=0.2, eq_beta=1.2,
             eq_n=8, search_round=2, w_bit=6, a_bit=6)
    d.update(kw)
    return OpPolicy(**d)


@pytest.mark.parametrize("metric", ["L2_norm", "cosine", "hessian"])
def test_linear_search_parity(rng, metric):
    pol = _pol(metric=metric, n_V=3, n_H=2, n_a=2)
    S_, Tk, ic, oc = 4, 6, 8, 12
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = rng.standard_normal((S_, Tk, ic)).astype(np.float32)
    raw_out = (x @ w.T + b).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="linear", inputs={"x": x}, out=raw_out, grad=grad)
    qp = S.search_linear(w, b, cap, pol)
    ref_w, ref_a = oracle_linear(w, b, x, raw_out,
                                 grad if metric == "hessian" else None, pol)
    np.testing.assert_allclose(np.asarray(qp.w_interval), ref_w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qp.a_interval), ref_a, rtol=1e-6)


def test_postgelu_linear_search_parity(rng):
    pol = _pol(quantizer="postgelu_linear", metric="hessian", n_V=2, n_a=2,
               search_round=3)
    S_, Tk, ic, oc = 4, 5, 8, 6
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    # post-GELU-like input
    x = np.abs(rng.standard_normal((S_, Tk, ic))).astype(np.float32)
    x[:, :, ::3] = -0.05 * rng.random((S_, Tk, 3)).astype(np.float32)
    raw_out = (x @ w.T + b).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="linear", inputs={"x": x}, out=raw_out, grad=grad)
    qp = S.search_linear(w, b, cap, pol)
    ref_w, ref_a = oracle_linear(w, b, x, raw_out, grad, pol, postgelu=True)
    np.testing.assert_allclose(np.asarray(qp.w_interval), ref_w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qp.a_interval), ref_a, rtol=1e-6)
    assert qp.postgelu and abs(qp.a_neg_interval - GELU_NEG_CLIP / 32) < 1e-9


def oracle_linear_pearson(w, b, x, raw_out, pol, cbs):
    """Pearson-metric linear search with the reference's CHUNK-LOCAL means
    (_get_pearson_w/_get_pearson_a, linear.py:426-453, chunks of
    calib_batch_size in the b_st loops, linear.py:459-532)."""
    w, x, raw_out = T(w), T(x), T(raw_out)
    b = None if b is None else T(b)
    S_, Tk, ic = x.shape
    oc = raw_out.shape[-1]
    n_V = pol.n_V
    crb_r = oc // n_V
    wq, aq = 2 ** (pol.w_bit - 1), 2 ** (pol.a_bit - 1)

    w4 = w.view(n_V, crb_r, 1, ic)
    w_int = w4.abs().amax([1, 3], keepdim=True) / (wq - 0.5)
    a_int = (x.abs().amax() / (aq - 0.5)).view(1, 1)
    g = grid_t(pol)
    w_c = g.view(-1, 1, 1, 1, 1) * w_int.unsqueeze(0)
    a_c = g.view(1, -1) * a_int

    def quant_in(xx, ai):
        return (xx / ai.view(())).round().clamp(-aq, aq - 1) * ai.view(())

    def pearson_w(rawc, outc):
        # rawc: b,T,1,n_V,crb ; outc: b,T,P,n_V,crb -> (b, P, n_V)
        bb, _, P = outc.shape[0], 0, outc.shape[2]
        s = outc.permute(0, 1, 4, 3, 2).reshape(bb, -1, n_V, P)
        r = rawc.permute(0, 1, 4, 3, 2).reshape(bb, -1, n_V, 1)
        s = s - s.mean(dim=[0, 1], keepdim=True)
        r = r - r.mean(dim=[0, 1], keepdim=True)
        c = torch.nn.functional.cosine_similarity(r, s, dim=1)  # b,n_V,P
        return c.permute(0, 2, 1)

    def pearson_a(raw, out):
        # raw: b,T,1,oc ; out: b,T,P,oc -> (b, P)
        bb, P = out.shape[0], out.shape[2]
        s = out.permute(0, 1, 3, 2).reshape(bb, -1, P)
        r = raw.permute(0, 1, 3, 2).reshape(bb, -1, 1)
        s = s - s.mean(dim=[0, 1], keepdim=True)
        r = r - r.mean(dim=[0, 1], keepdim=True)
        return torch.nn.functional.cosine_similarity(r, s, dim=1)

    for _ in range(pol.search_round):
        sims_total = torch.zeros(pol.eq_n, n_V)
        for b_st in range(0, S_, cbs):
            xc = x[b_st:b_st + cbs]
            rawc = raw_out[b_st:b_st + cbs].view(-1, Tk, 1, n_V, crb_r)
            outs = []
            for i in range(pol.eq_n):
                w_sim = ((w4 / w_c[i]).round().clamp(-wq, wq - 1)
                         * w_c[i]).view(oc, ic)
                outs.append(torch.nn.functional.linear(
                    quant_in(xc, a_int), w_sim, b))
            outc = torch.stack(outs, dim=2).view(-1, Tk, pol.eq_n, n_V, crb_r)
            sims_total += pearson_w(rawc, outc).sum(0)
        best = sims_total.argmax(0)
        for v in range(n_V):
            w_int[v] = w_c[best[v], v]
        sims_total = torch.zeros(pol.eq_n)
        w_sim = ((w4 / w_int).round().clamp(-wq, wq - 1) * w_int).view(oc, ic)
        for b_st in range(0, S_, cbs):
            xc = x[b_st:b_st + cbs]
            raw = raw_out[b_st:b_st + cbs].view(-1, Tk, 1, oc)
            outs = [torch.nn.functional.linear(quant_in(xc, a_c[:, i]),
                                               w_sim, b)
                    for i in range(pol.eq_n)]
            out = torch.stack(outs, dim=2)
            sims_total += pearson_a(raw, out).sum(0)
        a_int = a_c[:, int(sims_total.argmax())].view(1, 1)
    return w_int.numpy(), a_int.numpy()


def test_linear_search_pearson_chunk_parity(rng):
    """Pearson means are chunk-local: the engine pinned to calib_bs must
    match the chunked torch oracle, and (sanity) differ from a full-batch
    statistics run when chunking changes the argmax."""
    pol = _pol(metric="pearson", n_V=2, n_H=1, n_a=1, search_round=2)
    S_, Tk, ic, oc = 6, 5, 8, 10
    cbs = 2
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = rng.standard_normal((S_, Tk, ic)).astype(np.float32)
    # shift per-sample means so chunk-local centering actually matters
    x += rng.standard_normal((S_, 1, 1)).astype(np.float32)
    raw_out = (x @ w.T + b).astype(np.float32)
    cap = OpCapture(kind="linear", inputs={"x": x}, out=raw_out, grad=None)
    qp = S.search_linear(w, b, cap, pol, calib_bs=cbs)
    ref_w, ref_a = oracle_linear_pearson(w, b, x, raw_out, pol, cbs)
    np.testing.assert_allclose(np.asarray(qp.w_interval).reshape(ref_w.shape),
                               ref_w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qp.a_interval).reshape(ref_a.shape),
                               ref_a, rtol=1e-6)


def test_int8_score_same_argmax(rng, monkeypatch):
    """PTQ4VIT_TPU_INT8_SCORE=1 computes out_sim via int8 dots + one rescale
    (vs fp32 fake-value einsums): same argmax -> identical intervals on the
    parity fixtures."""
    for quantizer in ("matmul", "sos_matmul"):
        pol = _pol(quantizer=quantizer, metric="hessian", a_bit=8, b_bit=8)
        A = rng.standard_normal((4, 3, 6, 5)).astype(np.float32)
        if quantizer == "sos_matmul":
            A = np.abs(A) / np.abs(A).max()
        B = rng.standard_normal((4, 3, 5, 7)).astype(np.float32)
        out = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
        grad = rng.standard_normal(out.shape).astype(np.float32)
        cap = OpCapture(kind="matmul", inputs={"a": A, "b": B}, out=out,
                        grad=grad)
        monkeypatch.delenv("PTQ4VIT_TPU_INT8_SCORE", raising=False)
        ref = S.search_matmul(cap, pol)
        monkeypatch.setenv("PTQ4VIT_TPU_INT8_SCORE", "1")
        got = S.search_matmul(cap, pol)
        np.testing.assert_array_equal(np.asarray(ref.A_interval),
                                      np.asarray(got.A_interval))
        np.testing.assert_array_equal(np.asarray(ref.B_interval),
                                      np.asarray(got.B_interval))


def test_search_matmul_batch_matches_per_op(rng):
    """The vmapped same-shape cohort search must reproduce per-op results
    exactly (the op axis is batched, never reduced over)."""
    for quantizer in ("matmul", "sos_matmul"):
        pol = _pol(quantizer=quantizer, metric="hessian", a_bit=8, b_bit=8)
        caps = []
        for _ in range(3):
            A = rng.standard_normal((4, 2, 6, 5)).astype(np.float32)
            B = rng.standard_normal((4, 2, 5, 7)).astype(np.float32)
            if quantizer == "sos_matmul":
                A = np.abs(A) / np.abs(A).max()
            out = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
            grad = rng.standard_normal(out.shape).astype(np.float32)
            caps.append(OpCapture(kind="matmul", inputs={"a": A, "b": B},
                                  out=out, grad=grad))
        per_op = [S.search_matmul(c, pol) for c in caps]
        batched = S.search_matmul_batch(caps, pol)
        for qp_ref, qp_got in zip(per_op, batched):
            np.testing.assert_array_equal(np.asarray(qp_ref.A_interval),
                                          np.asarray(qp_got.A_interval))
            np.testing.assert_array_equal(np.asarray(qp_ref.B_interval),
                                          np.asarray(qp_got.B_interval))
            if quantizer == "sos_matmul":
                np.testing.assert_array_equal(np.asarray(qp_ref.split),
                                              np.asarray(qp_got.split))


# ---------------------------------------------------------------------------
# matmul oracle (head-wise groups, n_V=n_H=1)
# ---------------------------------------------------------------------------

def oracle_matmul(A, B, raw_out, grad, pol, sos=False):
    A, B, raw_out = T(A), T(B), T(raw_out)
    grad = None if grad is None else T(grad)
    S_, G, R, Ci = A.shape
    Co = B.shape[-1]
    Aq, Bq = 2 ** (pol.a_bit - 1), 2 ** (pol.b_bit - 1)

    def init_int(x, q):
        return x.abs().amax([0, 2, 3], keepdim=True).unsqueeze(0) / (q - 0.5)

    B_int = init_int(B, Bq)                                 # 1,1,G,1,1 (vision)
    g = grid_t(pol)
    B_c = [g[i] * B_int for i in range(pol.eq_n)]
    if sos:
        split = torch.tensor(0.01)
        splits = torch.tensor([2.0 ** (-i) for i in range(20)])
    else:
        A_int = init_int(A, Aq)
        A_c = [g[i] * A_int for i in range(pol.eq_n)]

    def qA(a, state):
        if sos:
            ai = state / (Aq - 1)
            hi = (a.clamp(state, 1) * (Aq - 1)).round().clamp(0, Aq - 1) / (Aq - 1)
            lo = (a.clamp(0, state) / ai).round().clamp(0, Aq - 1) * ai
            return hi + lo
        return (a.unsqueeze(0) / state).round().clamp(-Aq, Aq - 1) \
            .mul(state).squeeze(0)

    def qB(b_, state):
        return (b_.unsqueeze(0) / state).round().clamp(-Bq, Bq - 1) \
            .mul(state).squeeze(0)

    def headwise_sims(out, metric):
        # out: (S,G,R,Co) -> per-head scalar after feature mean + row mean
        s = tsim(raw_out, out, metric, grad)                # S,G,R
        return s.mean(2).sum(0)                             # G

    state = split if sos else A_int
    for _ in range(pol.search_round):
        if sos:
            sims = []
            for sp in splits:
                out = qA(A, sp) @ B                         # B raw in SoS A-search
                s = tsim(raw_out, out, pol.metric, grad)    # S,G,R
                sims.append(s.mean([1, 2]).sum(0))
            state = splits[int(torch.stack(sims).argmax())]
        else:
            Bs = qB(B, B_int)
            sims = [headwise_sims(qA(A, A_c[i]) @ Bs, pol.metric)
                    for i in range(pol.eq_n)]
            best = torch.stack(sims).argmax(0)              # G
            for gi in range(G):
                A_int[0, 0, gi] = A_c[best[gi]][0, 0, gi]
            state = A_int
        As = qA(A, state)
        sims = [headwise_sims(As @ qB(B, B_c[i]), pol.metric)
                for i in range(pol.eq_n)]
        best = torch.stack(sims).argmax(0)
        for gi in range(G):
            B_int[0, 0, gi] = B_c[best[gi]][0, 0, gi]
    return (state.numpy() if sos else state.numpy()), B_int.numpy()


def _mpol(**kw):
    d = dict(quantizer="matmul", metric="hessian", eq_alpha=0.2, eq_beta=1.2,
             eq_n=8, search_round=2, a_bit=6, b_bit=6)
    d.update(kw)
    return OpPolicy(**d)


@pytest.mark.parametrize("metric", ["L2_norm", "hessian"])
def test_matmul_search_parity(rng, metric):
    pol = _mpol(metric=metric)
    S_, G, R, Ci, Co = 4, 3, 6, 5, 7
    A = rng.standard_normal((S_, G, R, Ci)).astype(np.float32)
    B = rng.standard_normal((S_, G, Ci, Co)).astype(np.float32)
    raw_out = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="matmul", inputs={"a": A, "b": B}, out=raw_out,
                    grad=grad)
    qp = S.search_matmul(cap, pol)
    ref_A, ref_B = oracle_matmul(A, B, raw_out,
                                 grad if metric == "hessian" else None, pol)
    np.testing.assert_allclose(
        np.asarray(qp.A_interval).reshape(G), ref_A.reshape(G), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(qp.B_interval).reshape(G), ref_B.reshape(G), rtol=1e-6)


def test_sos_matmul_search_parity(rng):
    pol = _mpol(quantizer="sos_matmul", a_bit=8, b_bit=8, search_round=3)
    S_, G, R, Co = 4, 2, 6, 5
    # A is softmax-like
    logits = rng.standard_normal((S_, G, R, R)).astype(np.float32) * 3
    A = torch.softmax(torch.from_numpy(logits), -1).numpy()
    B = rng.standard_normal((S_, G, R, Co)).astype(np.float32)
    raw_out = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="matmul", inputs={"a": A, "b": B}, out=raw_out,
                    grad=grad)
    qp = S.search_matmul(cap, pol)
    ref_split, ref_B = oracle_matmul(A, B, raw_out, grad, pol, sos=True)
    np.testing.assert_allclose(float(qp.split), float(ref_split), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(qp.B_interval).reshape(G), ref_B.reshape(G), rtol=1e-6)


# ---------------------------------------------------------------------------
# conv oracle (patchified layout)
# ---------------------------------------------------------------------------

def oracle_conv(wm, b, x, raw_out, grad, pol, channelwise):
    wm, x, raw_out = T(wm), T(x), T(raw_out)
    b = None if b is None else T(b)
    grad = None if grad is None else T(grad)
    S_, N, icp = x.shape
    oc = wm.shape[0]
    wq = 2 ** (pol.w_bit - 1)
    aq = 2 ** (pol.a_bit - 1)
    quant_act = pol.a_bit < 32
    g = grid_t(pol)
    if channelwise:
        w_int = wm.abs().amax(1, keepdim=True) / (wq - 0.5)  # oc,1
    else:
        w_int = wm.abs().max() / (wq - 0.5)
    w_c = [g[i] * w_int for i in range(pol.eq_n)]
    a_int = x.abs().max() / (aq - 0.5) if quant_act else None
    a_c = [g[i] * a_int for i in range(pol.eq_n)] if quant_act else None

    def qx(xx, ai):
        return (xx / ai).round().clamp(-aq, aq - 1) * ai

    for _ in range(pol.search_round):
        sims = []
        xin = qx(x, a_int) if quant_act else x
        for i in range(pol.eq_n):
            w_sim = (wm / w_c[i]).round().clamp(-wq, wq - 1) * w_c[i]
            out = xin @ w_sim.t()
            if b is not None:
                out = out + b
            if channelwise:
                if pol.metric == "cosine":
                    s = torch.nn.functional.cosine_similarity(
                        raw_out.transpose(1, 2), out.transpose(1, 2), dim=-1)
                else:
                    gr = None if grad is None else grad
                    s = (-(gr * (raw_out - out)) ** 2 if pol.metric ==
                         "hessian" else -((raw_out - out) ** 2))
                    s = s.mean(1)                           # S,oc
                sims.append(s.sum(0))                       # oc
            else:
                s = tsim(raw_out, out, pol.metric, grad)    # S,N
                sims.append(s.mean(1).sum(0))
        best = torch.stack(sims).argmax(0)
        if channelwise:
            for c in range(oc):
                w_int[c] = w_c[best[c]][c]
        else:
            w_int = w_c[int(best)]
        if quant_act:
            # activation search (conv.py:559-589): elementwise metric,
            # mean over tokens+channels, summed over batch, scalar argmax
            w_sim = (wm / w_int).round().clamp(-wq, wq - 1) * w_int
            sims = []
            for i in range(pol.eq_n):
                out = qx(x, a_c[i]) @ w_sim.t()
                if b is not None:
                    out = out + b
                if channelwise:
                    if pol.metric == "cosine":
                        s = torch.nn.functional.cosine_similarity(
                            raw_out.transpose(1, 2), out.transpose(1, 2),
                            dim=-1).mean(1)                 # S
                    else:
                        gr = None if grad is None else grad
                        s = (-(gr * (raw_out - out)) ** 2 if pol.metric ==
                             "hessian" else -((raw_out - out) ** 2))
                        s = s.mean([1, 2])                  # S
                else:
                    s = tsim(raw_out, out, pol.metric, grad).mean(1)
                sims.append(s.sum(0))
            a_int = a_c[int(torch.stack(sims).argmax())]
    return np.asarray(w_int), (None if a_int is None else np.asarray(a_int))


@pytest.mark.parametrize("channelwise,metric", [(True, "hessian"),
                                                (True, "cosine"),
                                                (False, "cosine")])
def test_conv_search_parity(rng, channelwise, metric):
    pol = OpPolicy(quantizer=("conv_channelwise" if channelwise
                              else "conv_layerwise"),
                   metric=metric, eq_alpha=0.2, eq_beta=1.2, eq_n=8,
                   search_round=2, w_bit=8, a_bit=32)
    S_, N, ic, p, oc = 4, 9, 3, 2, 6
    w = rng.standard_normal((oc, ic, p, p)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = rng.standard_normal((S_, N, ic * p * p)).astype(np.float32)
    raw_out = (x @ w.reshape(oc, -1).T + b).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="conv", inputs={"x": x}, out=raw_out, grad=grad)
    qp = S.search_conv(w, b, cap, pol)
    ref, _ = oracle_conv(w.reshape(oc, -1), b, x, raw_out,
                         grad if metric == "hessian" else None, pol,
                         channelwise)
    got = np.asarray(qp.w_interval).reshape(-1)
    np.testing.assert_allclose(got, ref.reshape(-1), rtol=1e-6)
    assert qp.a_interval is None  # a_bit=32 -> activation quant off


@pytest.mark.parametrize("channelwise,metric", [(True, "hessian"),
                                                (True, "cosine"),
                                                (False, "cosine")])
def test_conv_search_parity_quant_act(rng, channelwise, metric):
    """a_bit=8 conv path (the shipped configs force a_bit=32, so the
    activation search branch was previously untested — ADVICE r1)."""
    pol = OpPolicy(quantizer=("conv_channelwise" if channelwise
                              else "conv_layerwise"),
                   metric=metric, eq_alpha=0.2, eq_beta=1.2, eq_n=8,
                   search_round=2, w_bit=8, a_bit=8)
    S_, N, ic, p, oc = 4, 9, 3, 2, 6
    w = rng.standard_normal((oc, ic, p, p)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = rng.standard_normal((S_, N, ic * p * p)).astype(np.float32)
    raw_out = (x @ w.reshape(oc, -1).T + b).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="conv", inputs={"x": x}, out=raw_out, grad=grad)
    qp = S.search_conv(w, b, cap, pol)
    ref_w, ref_a = oracle_conv(w.reshape(oc, -1), b, x, raw_out,
                               grad if metric == "hessian" else None, pol,
                               channelwise)
    np.testing.assert_allclose(np.asarray(qp.w_interval).reshape(-1),
                               ref_w.reshape(-1), rtol=1e-6)
    np.testing.assert_allclose(float(qp.a_interval), float(ref_a), rtol=1e-6)


# ---------------------------------------------------------------------------
# blocked-operand matmul oracle (n_G x n_V x n_H grids with ceil-div padding,
# reference matmul.py:109-138, :483-563)
# ---------------------------------------------------------------------------

def _pad_params(shape, nG, nV, nH):
    _, G_, R_, C_ = shape
    crg, crr, crc = -(-G_ // nG), -(-R_ // nV), -(-C_ // nH)
    return crg, crr, crc, crg * nG - G_, crr * nV - R_, crc * nH - C_


def oracle_matmul_blocked(A, B, raw_out, grad, pol, n_G_A, n_G_B, sos=False):
    import torch.nn.functional as F
    A, B, raw_out = T(A), T(B), T(raw_out)
    grad = None if grad is None else T(grad)
    S_, G, R, Ci = A.shape
    Co = B.shape[-1]
    Aq, Bq = 2 ** (pol.a_bit - 1), 2 ** (pol.b_bit - 1)
    nVA, nHA = (1, 1) if sos else (pol.n_V_A, pol.n_H_A)
    nVB, nHB = pol.n_V_B, pol.n_H_B
    g = grid_t(pol)

    def blocked(x, nG, nV, nH):
        crg, crr, crc, pg, pr, pc = _pad_params(x.shape, nG, nV, nH)
        xp = F.pad(x, [0, pc, 0, pr, 0, pg])
        return xp.view(-1, nG, crg, nV, crr, nH, crc)

    def init_int(x, q, nG, nV, nH):
        # (B,nG,crg,nV,crr,nH,crc) -> (1,nG,1,nV,1,nH,1)
        return blocked(x, nG, nV, nH).abs() \
            .amax([0, 2, 4, 6], keepdim=True) / (q - 0.5)

    def quant_op(x, interval, q, nG, nV, nH):
        crg, crr, crc, pg, pr, pc = _pad_params(x.shape, nG, nV, nH)
        xb = blocked(x, nG, nV, nH)
        xq = (xb / interval).round().clamp(-q, q - 1) * interval
        xq = xq.reshape(-1, nG * crg, nV * crr, nH * crc)
        return xq[:, :x.shape[1], :x.shape[2], :x.shape[3]]

    A_int0 = None if sos else init_int(A, Aq, n_G_A, nVA, nHA)
    B_int0 = init_int(B, Bq, n_G_B, nVB, nHB)
    A_c = None if sos else [g[i] * A_int0 for i in range(pol.eq_n)]
    B_c = [g[i] * B_int0 for i in range(pol.eq_n)]
    splits = torch.tensor([2.0 ** (-i) for i in range(20)])

    def qA_state(a, st):
        if sos:
            ai = st / (Aq - 1)
            hi = (a.clamp(st, 1) * (Aq - 1)).round().clamp(0, Aq - 1) / (Aq - 1)
            lo = (a.clamp(0, st) / ai).round().clamp(0, Aq - 1) * ai
            return hi + lo
        return quant_op(a, st, Aq, n_G_A, nVA, nHA)

    def search_op(opA, cur, other_sim):
        nG = n_G_A if opA else n_G_B
        nV, nH = (nVA, nHA) if opA else (nVB, nHB)
        q = Aq if opA else Bq
        cands = A_c if opA else B_c
        crg = -(-G // nG)
        cur = cur.clone()
        for v in range(nV):
            for h in range(nH):
                sims = []
                for i in range(pol.eq_n):
                    c = cur.clone()
                    c[:, :, :, v:v + 1, :, h:h + 1, :] = \
                        cands[i][:, :, :, v:v + 1, :, h:h + 1, :]
                    if opA:
                        out = quant_op(A, c, q, nG, nV, nH) @ other_sim
                    else:
                        out = other_sim @ quant_op(B, c, q, nG, nV, nH)
                    s = tsim(raw_out, out, pol.metric, grad)   # S,G,R
                    s = s.mean(2).sum(0)                       # G
                    s = F.pad(s, [0, nG * crg - G]) \
                        .view(nG, crg).mean(-1)                # nG (zero pad!)
                    sims.append(s)
                best = torch.stack(sims).argmax(0)             # nG
                for gi in range(nG):
                    cur[:, gi, :, v, :, h, :] = \
                        cands[best[gi]][:, gi, :, v, :, h, :]
        return cur

    a_state = torch.tensor(0.01) if sos else A_int0.clone()
    B_int = B_int0.clone()
    for _ in range(pol.search_round):
        if sos:
            sims = []
            for sp in splits:
                out = qA_state(A, sp) @ B                      # B raw
                s = tsim(raw_out, out, pol.metric, grad)
                sims.append(s.mean([1, 2]).sum(0))
            a_state = splits[int(torch.stack(sims).argmax())]
        else:
            B_sim = quant_op(B, B_int, Bq, n_G_B, nVB, nHB)
            a_state = search_op(True, a_state, B_sim)
        A_sim = qA_state(A, a_state)
        B_int = search_op(False, B_int, A_sim)
    return (a_state.numpy(), B_int.numpy())


@pytest.mark.parametrize("metric", ["L2_norm", "hessian"])
def test_matmul_blocked_search_parity(rng, metric):
    """n_V/n_H operand grids with ceil-div padding (previously rejected with
    NotImplementedError).  R=7, Ci=5 force row/col padding."""
    pol = _mpol(metric=metric, n_V_A=2, n_H_A=2, n_V_B=2, n_H_B=2)
    S_, G, R, Ci, Co = 4, 3, 7, 5, 6
    A = rng.standard_normal((S_, G, R, Ci)).astype(np.float32)
    B = rng.standard_normal((S_, G, Ci, Co)).astype(np.float32)
    raw_out = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="matmul", inputs={"a": A, "b": B}, out=raw_out,
                    grad=grad)
    qp = S.search_matmul(cap, pol)
    ref_A, ref_B = oracle_matmul_blocked(
        A, B, raw_out, grad if metric == "hessian" else None, pol, G, G)
    np.testing.assert_allclose(np.asarray(qp.A_interval).reshape(-1),
                               ref_A.reshape(-1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qp.B_interval).reshape(-1),
                               ref_B.reshape(-1), rtol=1e-6)


def test_matmul_blocked_group_pad_parity(rng):
    """Explicit n_G < G exercises the group-axis ZERO-padding of the
    similarity reduction (matmul.py:519)."""
    pol = _mpol(metric="L2_norm", n_G_A=2, n_G_B=2, n_V_A=2, n_H_B=2)
    S_, G, R, Ci, Co = 4, 3, 6, 4, 6
    A = rng.standard_normal((S_, G, R, Ci)).astype(np.float32)
    B = rng.standard_normal((S_, G, Ci, Co)).astype(np.float32)
    raw_out = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
    cap = OpCapture(kind="matmul", inputs={"a": A, "b": B}, out=raw_out,
                    grad=None)
    qp = S.search_matmul(cap, pol)
    ref_A, ref_B = oracle_matmul_blocked(A, B, raw_out, None, pol, 2, 2)
    np.testing.assert_allclose(np.asarray(qp.A_interval).reshape(-1),
                               ref_A.reshape(-1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(qp.B_interval).reshape(-1),
                               ref_B.reshape(-1), rtol=1e-6)


def test_sos_matmul_blocked_B_parity(rng):
    """SoS split search with a blocked B operand (matmul.py:636-642)."""
    pol = _mpol(quantizer="sos_matmul", a_bit=8, b_bit=8, n_V_B=2, n_H_B=2,
                search_round=2)
    S_, G, R, Co = 4, 2, 6, 5
    logits = rng.standard_normal((S_, G, R, R)).astype(np.float32) * 3
    A = torch.softmax(torch.from_numpy(logits), -1).numpy()
    B = rng.standard_normal((S_, G, R, Co)).astype(np.float32)
    raw_out = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="matmul", inputs={"a": A, "b": B}, out=raw_out,
                    grad=grad)
    qp = S.search_matmul(cap, pol)
    ref_split, ref_B = oracle_matmul_blocked(A, B, raw_out, grad, pol, G, G,
                                             sos=True)
    np.testing.assert_allclose(float(qp.split), float(ref_split), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(qp.B_interval).reshape(-1),
                               ref_B.reshape(-1), rtol=1e-6)


# ---------------------------------------------------------------------------
# PTQSL conv oracle (n_V x n_H weight grid, scalar per-position argmax,
# reference conv.py:126-277)
# ---------------------------------------------------------------------------

def oracle_conv_ptqsl(wm, b, x, raw_out, grad, pol):
    wm, x, raw_out = T(wm), T(x), T(raw_out)
    b = None if b is None else T(b)
    grad = None if grad is None else T(grad)
    oc, icp = wm.shape
    n_V, n_H = pol.n_V, pol.n_H
    wq, aq = 2 ** (pol.w_bit - 1), 2 ** (pol.a_bit - 1)
    quant_act = pol.a_bit < 32
    g = grid_t(pol)
    w4 = wm.view(n_V, oc // n_V, n_H, icp // n_H)
    w_int = w4.abs().amax([1, 3], keepdim=True) / (wq - 0.5)
    a_int = x.abs().max() / (aq - 0.5) if quant_act else None
    w_c = [g[i] * w_int for i in range(pol.eq_n)]
    a_c = [g[i] * a_int for i in range(pol.eq_n)] if quant_act else None

    def qx(xx, ai):
        return (xx / ai).round().clamp(-aq, aq - 1) * ai

    def chan_sim(out):
        s = tsim(raw_out, out, pol.metric, grad)               # S,N
        return s.mean(1).sum(0)                                # scalar

    for _ in range(pol.search_round):
        for v in range(n_V):
            for h in range(n_H):
                xin = qx(x, a_int) if quant_act else x
                sims = []
                for i in range(pol.eq_n):
                    cur = w_int.clone()
                    cur[v:v + 1, :, h:h + 1, :] = \
                        w_c[i][v:v + 1, :, h:h + 1, :]
                    w_sim = ((w4 / cur).round().clamp(-wq, wq - 1) * cur) \
                        .view(oc, icp)
                    out = xin @ w_sim.t()
                    if b is not None:
                        out = out + b
                    sims.append(chan_sim(out))                 # SCALAR argmax
                best = int(torch.stack(sims).argmax())
                w_int[v:v + 1, :, h:h + 1, :] = \
                    w_c[best][v:v + 1, :, h:h + 1, :]
        if quant_act:
            w_sim = ((w4 / w_int).round().clamp(-wq, wq - 1) * w_int) \
                .view(oc, icp)
            sims = []
            for i in range(pol.eq_n):
                out = qx(x, a_c[i]) @ w_sim.t()
                if b is not None:
                    out = out + b
                sims.append(chan_sim(out))
            a_int = a_c[int(torch.stack(sims).argmax())]
    return np.asarray(w_int), (None if a_int is None else np.asarray(a_int))


@pytest.mark.parametrize("metric,a_bit", [("hessian", 8), ("cosine", 32),
                                          ("L2_norm", 8)])
def test_conv_ptqsl_search_parity(rng, metric, a_bit):
    """Sub-layerwise n_V x n_H conv weight grid (previously only
    channelwise/layerwise were implemented)."""
    pol = OpPolicy(quantizer="conv_ptqsl", metric=metric, eq_alpha=0.2,
                   eq_beta=1.2, eq_n=8, search_round=2, w_bit=8, a_bit=a_bit,
                   n_V=3, n_H=2)
    S_, N, ic, p, oc = 4, 9, 3, 2, 6
    w = rng.standard_normal((oc, ic, p, p)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = rng.standard_normal((S_, N, ic * p * p)).astype(np.float32)
    raw_out = (x @ w.reshape(oc, -1).T + b).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    cap = OpCapture(kind="conv", inputs={"x": x}, out=raw_out, grad=grad)
    qp = S.search_conv(w, b, cap, pol)
    ref_w, ref_a = oracle_conv_ptqsl(
        w.reshape(oc, -1), b, x, raw_out,
        grad if metric == "hessian" else None, pol)
    assert qp.blocked
    np.testing.assert_allclose(np.asarray(qp.w_interval), ref_w, rtol=1e-6)
    if a_bit < 32:
        np.testing.assert_allclose(float(qp.a_interval), float(ref_a),
                                   rtol=1e-6)
    else:
        assert qp.a_interval is None
    # blocked quant_forward applies the grid on the flattened weight
    wq = np.asarray(qp.quant_weight(jnp.asarray(w)))
    w4 = torch.from_numpy(w.reshape(pol.n_V, oc // pol.n_V, pol.n_H, -1))
    wref = ((w4 / torch.from_numpy(ref_w)).round().clamp(-128, 127)
            * torch.from_numpy(ref_w)).view(oc, ic, p, p).numpy()
    np.testing.assert_allclose(wq, wref, rtol=1e-6)


def test_matmul_search_recompute_raw_out_equivalent(rng):
    """cap.out=None (device-resident mode) must give identical intervals —
    raw_out is recomputed as A@B inside the search."""
    pol = _mpol(metric="hessian")
    S_, G, R, Ci, Co = 4, 3, 6, 5, 7
    A = rng.standard_normal((S_, G, R, Ci)).astype(np.float32)
    B = rng.standard_normal((S_, G, Ci, Co)).astype(np.float32)
    raw_out = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
    grad = rng.standard_normal(raw_out.shape).astype(np.float32)
    qp1 = S.search_matmul(OpCapture(kind="matmul",
                                    inputs={"a": A, "b": B},
                                    out=raw_out, grad=grad), pol)
    qp2 = S.search_matmul(OpCapture(kind="matmul",
                                    inputs={"a": A, "b": B},
                                    out=None, grad=grad), pol)
    np.testing.assert_array_equal(np.asarray(qp1.A_interval),
                                  np.asarray(qp2.A_interval))
    np.testing.assert_array_equal(np.asarray(qp1.B_interval),
                                  np.asarray(qp2.B_interval))
