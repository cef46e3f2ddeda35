"""Calibration orchestration — the functional equivalent of the reference's
QuantCalibrator / HessianQuantCalibrator (utils/quant_calib.py:9-378 in
hahnyuan/PTQ4ViT).

Parallel paradigm (the production path, sequential=False): every op is
calibrated against the FP32 net's own inputs/outputs.  The reference
re-feeds the whole calib set through the whole net once PER MODULE with
hooks on just that module (quant_calib.py:316-341); here ONE capture pass
(grouped only if host memory requires it) collects every op's raw data, then
each op's jitted search runs back-to-back on device.

Sequential mode (reference sequential=True, quant_calib.py:369): each op is
calibrated with all PRECEDING ops already in quant_forward mode, which
requires a fresh capture per op — supported, at the cost the reference also
pays.  NOTE: each of those captures is a DISTINCT executable (the quantized
prefix and the tapped op change the traced structure per step; one unified
graph would need every op's taps as outputs at once, i.e. the whole
activation volume resident), so on a remote-compile backend (axon tunnel)
sequential mode pays O(num_ops) slow compiles on the first run.  Use the
parallel paradigm (the reference's production default, and ours) unless the
sequential semantics are specifically under study; the persistent XLA cache
makes repeat sequential runs tolerable.

Bias correction: the reference's batching pipeline sets
``bias_correction=True`` (configs/PTQ4ViT.py:34) but never invokes
``_bias_correction_quant_forward`` on that path (linear.py:536-555 has the
call commented out; forward dispatch never routes to it) — i.e. the flag is
inert in the shipped pipeline.  We reproduce that default and expose the
correction as an explicit opt-in (:func:`apply_bias_correction`).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.policy import QuantConfig
from ..quant.qparams import ConvQP, LinearQP, MatMulQP
from . import search as S
from .capture import capture


def _params_for_op(params: Dict[str, Any], name: str):
    """Fetch (weight, bias) of a linear/conv op by its dotted timm path."""
    node = params
    for part in name.split("."):
        if isinstance(node, list):
            node = node[int(part)]
        else:
            node = node[part]
    return node.get("weight"), node.get("bias")


def _tap_nelems(net) -> Dict[str, Dict[str, int]]:
    """Per-image element counts of each op's capture taps, from ONE abstract
    trace (jax.eval_shape re-traces the whole net — seconds on deep models —
    so callers needing several byte views share this)."""
    xb = jax.ShapeDtypeStruct((1,) + (3, net.cfg.img_size, net.cfg.img_size),
                              jnp.float32)
    _, shapes = jax.eval_shape(
        lambda p, x: net.forward(p, x, net.cfg, capture=True), net.params, xb)
    return {name: {k: int(np.prod(v.shape))
                   for k, v in shapes[name].items()}
            for name, _ in net.op_inventory}


def _tap_bytes(net, calib_n: int, need_grad: bool,
               store_raw_out: bool = True,
               elem_bytes: int = 4,
               nelems: Optional[Dict[str, Dict[str, int]]] = None
               ) -> Dict[str, int]:
    """Bytes of each op's full-calib-set capture (inputs+out[+grad])."""
    if nelems is None:
        nelems = _tap_nelems(net)
    out = {}
    for name, elems in nelems.items():
        n = 0
        for key, v in elems.items():
            if key == "out" and not store_raw_out:
                continue
            n += v * elem_bytes
        if need_grad:
            n += elems["out"] * elem_bytes
        out[name] = n * calib_n
    return out


def _device_budget_bytes(default: int = 8 << 30) -> int:
    """Usable HBM for the per-group calibration caches.  Headroom must cover
    the capture fwd+bwd workspace, the search out_sim scratch
    (search.DEFAULT_BUDGET), params, and XLA fragmentation — ~0.35 of a
    16 GB chip is a safe cache share."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return max(1 << 30, int(limit * 0.45))
    except Exception:
        pass
    return default


@dataclasses.dataclass
class CalibReport:
    """Per-layer timing + config echo (replaces the reference's tqdm
    postfix/print logging, quant_calib.py:316-318)."""
    model: str
    config: str
    capture_seconds: float = 0.0   # host-side dispatch of the capture
                                   # programs (device execution of a
                                   # capture tail lands on the first
                                   # search blocked after it)
    target_seconds: float = 0.0
    sync_seconds: float = 0.0      # residual group-end block (~0: per-op
                                   # blocks below attribute the device time)
    setup_seconds: float = 0.0
    num_groups: int = 0            # capture groups the planner formed
    # per-op dispatch + in-order completion wait == device occupancy
    # attribution (the device retires programs in enqueue order)
    search_seconds: Dict[str, float] = dataclasses.field(default_factory=dict)

    @property
    def total_seconds(self) -> float:
        return (self.capture_seconds + self.target_seconds +
                self.sync_seconds + self.setup_seconds +
                sum(self.search_seconds.values()))


class HessianQuantCalibrator:
    """Drop-in counterpart of the reference class of the same name
    (quant_calib.py:203).  ``batching_quant_calib`` returns the calibrated
    qstate dict to feed the model forward."""

    def __init__(self, net, quant_cfg: QuantConfig, calib_x: np.ndarray,
                 sequential: bool = False, batch_size: int = 4,
                 cache_budget_bytes: Optional[int] = None,
                 search_budget_bytes: int = S.DEFAULT_BUDGET,
                 probe_seed: int = 3, probe_sigma: float = 1e-3,
                 checkpoint_dir: Optional[str] = None,
                 wrapped_modules: Optional[Dict[str, str]] = None,
                 device_resident: bool = True,
                 cache_dtype=None,
                 profile_dir: Optional[str] = None,
                 mesh=None):
        # mesh: optional jax.sharding.Mesh with a "data" axis — capture
        # micro-batches and the device-resident caches shard over it, so
        # the whole calibration (capture fwd+bwd AND the candidate-search
        # einsums) runs data-parallel; similarity sums become XLA psums
        # (the reduction at reference linear.py:487-492)
        self.mesh = mesh
        self.net = net
        self.cfg = quant_cfg
        self.calib_x = np.asarray(calib_x, np.float32)
        self.sequential = sequential
        self.batch_size = batch_size
        # calibration caches live in HBM by default (host round-trips can be
        # catastrophically slow on tunneled/remote devices); ops are grouped
        # so each group's caches fit the budget
        self.device_resident = device_resident
        # bfloat16 caches halve the group count (fewer capture executables —
        # the dominant capture cost on a high-dispatch-latency device) and
        # the resident-HBM pressure.  Default: bf16 on accelerators, fp32 on
        # CPU (where the torch-oracle parity tests pin exact reference
        # numerics).  cache_dtype="auto" applies the same rule explicitly;
        # PTQ4VIT_TPU_CACHE_DTYPE=float32|bfloat16 overrides either way.
        # Searches cast caches back to fp32, so only the stored activations
        # and probe-grads round; the interval argmaxes are robust to that
        # rounding (PTQ noise level — see BENCH_NOTES.md).
        env_dtype = os.environ.get("PTQ4VIT_TPU_CACHE_DTYPE")
        if env_dtype:
            cache_dtype = {"float32": None,
                           "bfloat16": jnp.bfloat16}[env_dtype]
        elif cache_dtype in (None, "auto"):
            cache_dtype = (jnp.bfloat16 if jax.default_backend() != "cpu"
                           else None)
        elif cache_dtype == "float32":
            cache_dtype = None
        self.cache_dtype = cache_dtype
        self.profile_dir = profile_dir
        self._explicit_cache_budget = cache_budget_bytes is not None
        self.cache_budget = (cache_budget_bytes if cache_budget_bytes
                             else (_device_budget_bytes() if device_resident
                                   else 48 << 30))
        self.search_budget = search_budget_bytes
        self.probe_seed = probe_seed
        self.probe_sigma = probe_sigma
        self.checkpoint_dir = checkpoint_dir
        # op subset (reference wrap_certain_modules_in_net ablations);
        # default: every quantizable op
        self.wrapped_modules = (list(wrapped_modules.items())
                                if wrapped_modules is not None
                                else list(net.op_inventory))
        if sequential:
            # sequential steps follow the reference's module-walk order
            # (proj BEFORE the attention matmuls — see
            # net_wrap.reference_wrap_order; behaviorally load-bearing:
            # quantized proj kills the matmuls' probe gradients)
            from ..models.net_wrap import reference_wrap_order
            self.wrapped_modules = reference_wrap_order(self.wrapped_modules)
        self.report = CalibReport(model=net.name, config=quant_cfg.name)

    # -- checkpoint/resume -------------------------------------------------
    def _ckpt_path(self, name: str) -> Optional[str]:
        if self.checkpoint_dir is None:
            return None
        return os.path.join(self.checkpoint_dir, name.replace("/", "_") + ".npz")

    def _ckpt_scope(self, mtype: str) -> str:
        """Identity stamp for resume validation: reusing a checkpoint_dir
        across models or configs (different bits/n_V/...) must not silently
        return stale QPs."""
        return f"{self.net.name}|{self.cfg.name}|{self.cfg.op_policy(mtype)}"

    def _load_ckpt(self, name: str, mtype: str):
        p = self._ckpt_path(name)
        if p is None or not os.path.exists(p):
            return None
        import json
        with np.load(p) as data:
            meta = json.loads(str(data["__meta__"]))
        if meta.get("scope") != self._ckpt_scope(mtype):
            return None  # stale (other model/config) -> recalibrate
        return load_op_qp(p)

    def _save_ckpt(self, name: str, mtype: str, qp):
        p = self._ckpt_path(name)
        if p is None:
            return
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        save_op_qp(p, qp, scope=self._ckpt_scope(mtype))

    def quant_calib(self, verbose: bool = True) -> Dict[str, Any]:
        """Reference-compatible alias (quant_calib.py:95-104, :216-298):
        the non-batching reference calibrators differ from the batching one
        only in memory staging, which the static chunk planner already
        covers — both paths land here."""
        return self.batching_quant_calib(verbose=verbose)

    # -- main entry (reference quant_calib.py:300-378) ---------------------
    def batching_quant_calib(self, verbose: bool = True) -> Dict[str, Any]:
        if self.profile_dir is not None:
            import jax.profiler
            with jax.profiler.trace(self.profile_dir):
                return self._batching_quant_calib(verbose)
        return self._batching_quant_calib(verbose)

    def _batching_quant_calib(self, verbose: bool = True) -> Dict[str, Any]:
        net, cfg = self.net, self.cfg
        policies = {name: cfg.op_policy(mtype)
                    for name, mtype in self.wrapped_modules}
        need_grad = any(p.metric == "hessian" for p in policies.values())

        qstate: Dict[str, Any] = {}
        todo = []
        for n, t in self.wrapped_modules:
            qp = self._load_ckpt(n, t)
            if qp is None:
                todo.append((n, t))
            else:
                qstate[n] = qp

        if self.sequential:
            # target distribution from the raw net, computed once
            # (quant_calib.py:309-313); then each op captured with the
            # already-calibrated prefix in quant_forward mode
            from .capture import probe_target
            logits_fn = jax.jit(
                lambda p, x: net.forward(p, x, net.cfg))
            raw_logits = np.concatenate([
                np.asarray(logits_fn(net.params,
                                     jnp.asarray(self.calib_x[s0:s0 + 8])))
                for s0 in range(0, len(self.calib_x), 8)])
            target = probe_target(raw_logits, self.probe_seed,
                                  self.probe_sigma) if need_grad else None

            # Compiled-once structure sharing (default): ONE capture
            # executable serves every step — the quantized prefix is a
            # traced GatedQP flag per op and the tapped op a traced switch
            # index (capture.SequentialCapturePlan), so the O(num_ops)
            # per-step compiles (and per-step calib re-staging) of the
            # naive formulation disappear.  PTQ4VIT_TPU_SEQ_SHARED=0
            # restores the per-op structural captures (and is the
            # fallback when a template QP cannot be shape-evaluated, e.g.
            # the np-based quantile conv).
            plan = None
            if (os.environ.get("PTQ4VIT_TPU_SEQ_SHARED", "1") != "0"
                    and todo):
                try:
                    from .capture import SequentialCapturePlan
                    plan = SequentialCapturePlan(
                        net, self.calib_x, batch_size=self.batch_size,
                        need_grad=need_grad, probe_sigma=self.probe_sigma,
                        target_probs=target,
                        ops=[n for n, _ in self.wrapped_modules],
                        mesh=self.mesh)
                    templates = {
                        n: self._template_qp(n, t, policies[n], plan)
                        for n, t in self.wrapped_modules}
                except Exception:
                    plan = None
            if plan is not None:
                from ..quant.qparams import GatedQP
                gated = {
                    n: (GatedQP(qp=qstate[n], on=jnp.asarray(True))
                        if n in qstate
                        else GatedQP(qp=templates[n], on=jnp.asarray(False)))
                    for n, _ in self.wrapped_modules}
                for name, mtype in todo:
                    t0 = time.time()
                    raw = plan.step(gated, name)
                    self.report.capture_seconds += time.time() - t0
                    t0 = time.time()
                    qp = self._search_one(name, mtype, policies[name], raw)
                    self.report.search_seconds[name] = time.time() - t0
                    qstate[name] = qp
                    gated[name] = GatedQP(qp=qp, on=jnp.asarray(True))
                    self._save_ckpt(name, mtype, qp)
                return qstate

            for name, mtype in todo:
                t0 = time.time()
                raw = capture(net, self.calib_x, batch_size=self.batch_size,
                              need_grad=need_grad, probe_seed=self.probe_seed,
                              probe_sigma=self.probe_sigma, ops=[name],
                              qstate=dict(qstate), target_probs=target,
                              mesh=self.mesh)
                self.report.capture_seconds += time.time() - t0
                t0 = time.time()
                qp = self._search_one(name, mtype, policies[name], raw[name])
                self.report.search_seconds[name] = time.time() - t0
                qstate[name] = qp
                self._save_ckpt(name, mtype, qp)
            return qstate

        # probe target (quant_calib.py:309-313): computed INSIDE the first
        # group's capture program (capture.py fused_target) — per-sample
        # independent, so batch-local softmax(logits + sigma*u) equals the
        # reference's full-set pass and no separate target executable is
        # compiled/loaded/dispatched; later groups reuse the returned probs
        # so their (large) capture executables stay lean.
        target = None

        # Pipeline captures with searches: group g+1's capture is DISPATCHED
        # (executable load, H2D staging, enqueue — all host-side work, and
        # nearly all of the measured capture wall-clock on a remote-dispatch
        # device) while the device still executes group g's searches.  The
        # device runs programs in enqueue order, so results are identical;
        # the capture merely costs no wall-clock of its own.  Grouping
        # keeps the FULL cache budget (a halved budget doubles the group
        # count, and the per-group executable-load cost dominates capture —
        # measured Swin-B/384 capture 30 s -> 95 s when halved); instead
        # the prefetch waits until enough of the current group's searches
        # have retired that ~half its caches are free, bounding the extra
        # HBM residency to ~0.5x the budget.  PTQ4VIT_TPU_OVERLAP=0
        # restores the strictly serial capture->search->block loop.
        overlap = (os.environ.get("PTQ4VIT_TPU_OVERLAP", "1") != "0"
                   and self.device_resident)

        # group ops so each capture pass fits the cache budget
        t_setup = time.time()
        elem = 2 if self.cache_dtype is not None else 4
        nelems = _tap_nelems(net)  # one abstract trace for both byte views
        sizes = _tap_bytes(net, self.calib_x.shape[0], need_grad,
                           store_raw_out=not self.device_resident,
                           elem_bytes=elem, nelems=nelems)
        cache_budget = self.cache_budget
        if self.device_resident:
            # HBM headroom planner: the steady-state peak is
            #   the prefetched next group (<= budget) + what remains of the
            #     current one (<= 0.5x budget at the overlap trigger), so
            #     <= 1.5x budget of caches
            #   + the in-flight search's working set (the op's caches cast
            #     to fp32, the recomputed raw_out, the probe grad — exactly
            #     _tap_bytes at elem=4 with out stored — plus the
            #     candidate-chunk out_sim scratch)
            #   + the capture fwd+bwd workspace (~1 GB at micro-batch 4).
            # At 32 calib imgs the per-op working sets are small and this
            # leaves the budget unchanged; at 128 imgs the ViT-B/384
            # attention matmuls materialize ~6.5 GB per search and the
            # budget must shrink to fit (measured OOM at the static 8 GB).
            work = _tap_bytes(net, self.calib_x.shape[0], need_grad,
                              store_raw_out=True, elem_bytes=4, nelems=nelems)
            # the full search budget: plan_chunks sizes candidate chunks up
            # to it, so reserving less (e.g. capping at DEFAULT_BUDGET)
            # under-counts the steady-state peak when callers raise it
            scratch = self.search_budget
            search_set = (max(work.values()) if work else 0) + scratch
            hbm = float(os.environ.get("PTQ4VIT_TPU_HBM_GB", "16")) * (1 << 30)
            usable = hbm * 0.85 - search_set - (1 << 30)
            planned = int(usable / (1.5 if overlap else 1.05))
            if self._explicit_cache_budget:
                # an explicit cache_budget_bytes is a hard cap on group size
                # (the caller is bounding residency); the planner may only
                # SHRINK it when HBM headroom demands
                cache_budget = min(cache_budget, max(planned, 1 << 20))
            else:
                # the 1-GB floor protects the DEFAULT budget from a planner
                # underestimate on small-HBM stats; never a user override
                cache_budget = max(1 << 30, min(cache_budget, planned))
        groups: List[List[str]] = [[]]
        acc = 0
        for name, _ in todo:
            if groups[-1] and acc + sizes[name] > cache_budget:
                groups.append([])
                acc = 0
            groups[-1].append(name)
            acc += sizes[name]
        groups = [g for g in groups if g]
        self.report.num_groups = len(groups)

        mtypes = dict(self.wrapped_modules)
        self.report.setup_seconds = time.time() - t_setup

        def dispatch_capture(group):
            t0 = time.time()
            out = capture(
                net, self.calib_x, batch_size=self.batch_size,
                need_grad=need_grad, probe_seed=self.probe_seed,
                probe_sigma=self.probe_sigma, ops=group,
                to_host=not self.device_resident,
                store_raw_out=not self.device_resident,
                cache_dtype=self.cache_dtype,
                target_probs=target, mesh=self.mesh, want_target=True)
            self.report.capture_seconds += time.time() - t0
            return out

        pending = None
        for gi, group in enumerate(groups):
            if pending is not None:
                raw, target = pending
                pending = None
            else:
                raw, target = dispatch_capture(group)
            dispatched: List[List[str]] = []  # enqueue order (cohorts
                                              # grouped), for attribution

            # batch same-shape matmul searches (e.g. the L identical
            # window-attention matmuls of a Swin stage) into one vmapped
            # dispatch each — see search.search_matmul_batch.  Tuning knobs
            # (hardware A/B without code edits):
            #   PTQ4VIT_TPU_MATMUL_COHORT=0    disable, per-op searches
            #   PTQ4VIT_TPU_COHORT_STACK_MB    stacked-copy bound (def 1024)
            #   PTQ4VIT_TPU_COHORT_BUDGET_MB   scratch budget cap (def 1024)
            cohort_on = os.environ.get("PTQ4VIT_TPU_MATMUL_COHORT") != "0"
            stack_b = int(os.environ.get("PTQ4VIT_TPU_COHORT_STACK_MB",
                                         "1024")) << 20
            budget_b = int(os.environ.get("PTQ4VIT_TPU_COHORT_BUDGET_MB",
                                          "1024")) << 20
            # cohorts compose with mesh sharding: the stacked op axis is a
            # new leading dim, the sample axis stays sharded over "data"
            # and the vmapped search's reductions psum exactly as in the
            # per-op mesh path (qstate equality pinned in test_parallel)
            if cohort_on:
                pallas_on = S._pallas_default()
                cohorts: Dict[Any, List[str]] = {}
                for name in group:
                    pol = policies[name]
                    blocked = (pol.n_V_A != 1 or pol.n_H_A != 1
                               or pol.n_V_B != 1 or pol.n_H_B != 1
                               or pol.n_G_A > 1 or pol.n_G_B > 1)
                    if "qmatmul" not in mtypes[name] or blocked:
                        continue
                    cap = raw[name]
                    if (pallas_on and pol.metric == "hessian"
                            and cap.out is None and cap.grad is not None):
                        # the per-op fused Pallas scorer beats the vmapped
                        # XLA cohort on these ops (measured Swin-B/384
                        # 0.76 vs 1.01 min, ViT-B/384 0.46 vs 0.71 — one
                        # cache pass for ALL candidates vs per-chunk HBM
                        # round-trips); leave them to the per-op path.
                        # Under a mesh the scorer runs shard_map'd over the
                        # data axis with a psum of the per-shard sims
                        # (search._mesh_sims), so the fused path no longer
                        # falls back to cohorts on multi-chip.
                        continue
                    key = (mtypes[name], pol, cap.inputs["a"].shape,
                           cap.inputs["b"].shape, cap.out is not None,
                           cap.grad is not None)
                    cohorts.setdefault(key, []).append(name)
                for all_names in cohorts.values():
                    if len(all_names) < 2:
                        continue
                    # bound the transient stacked copy to ~1 GB of caches:
                    # the batched search's peak = resident group (budget)
                    # + this stack + L-scaled scratch, and the whole sum
                    # must stay inside HBM alongside the capture workspace
                    c0 = raw[all_names[0]]
                    # count fp32 footprint: the search casts bf16 caches up
                    per = sum(int(np.prod(a.shape)) * 4
                              for a in [c0.inputs["a"], c0.inputs["b"]]
                              + ([c0.grad] if c0.grad is not None else [])
                              + ([c0.out] if c0.out is not None else []))
                    lc = int(stack_b // max(per, 1))
                    if lc < 2:
                        if 2 * per > 3 * stack_b // 2:
                            # one op's caches alone bust the stack bound
                            # (e.g. the 577x577 ViT-B/384 attention matmuls
                            # at 128 calib imgs, ~2.5 GB fp32 each): even a
                            # pair would OOM on top of the resident group,
                            # so leave the whole cohort to the per-op path
                            # below (whose candidate chunking stays inside
                            # search_budget)
                            continue
                        # a pair overshoots the bound by <= 1.5x: accept it
                        # (measured safe — this is the 32-img ViT-B/384
                        # regime, where pairing halves dispatch count)
                        lc = 2
                    for st in range(0, len(all_names), lc):
                        names = all_names[st:st + lc]
                        t0 = time.time()
                        qps = S.search_matmul_batch(
                            [raw[n] for n in names], policies[names[0]],
                            min(self.search_budget, budget_b))
                        dt = (time.time() - t0) / len(names)
                        for n, qp in zip(names, qps):
                            qstate[n] = qp
                            self._save_ckpt(n, mtypes[n], qp)
                            self.report.search_seconds[n] = dt
                            raw[n] = None
                        dispatched.append(names)

            # Per-op searches.  Dispatch is host-bound on a FRESH process:
            # each new shape's trace + persistent-cache deserialize +
            # executable load through the tunnel runs serially before the
            # (async) enqueue, so a cold run costs ~sum(loads) while the
            # device starves (measured fresh/warm 0.93/0.15 min ViT-B/384).
            # PTQ4VIT_TPU_DISPATCH_THREADS=K > 1 dispatches the independent
            # per-op searches from a K-thread pool so those compile-loads
            # overlap; results land in group order, so the attribution
            # block loop below is unchanged (its per-op times become
            # approximate when enqueue order interleaves across threads).
            # Default 4 on accelerator backends (device A/B r4: ViT-B/384
            # fresh 1.13 -> 0.97 min, warm unchanged — the per-op
            # executable loads through the tunnel are what a cold process
            # serializes on); 1 on CPU, where there is no load latency to
            # hide and deterministic per-op attribution matters for tests.
            remaining = [n for n in group if n not in qstate]
            n_threads = max(1, int(os.environ.get(
                "PTQ4VIT_TPU_DISPATCH_THREADS",
                "1" if jax.default_backend() == "cpu" else "4")))

            def one(name):
                t0 = time.time()
                qp = self._search_one(name, mtypes[name], policies[name],
                                      raw[name])
                return qp, time.time() - t0

            if n_threads > 1 and len(remaining) > 1:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(n_threads) as pool:
                    futs = [(n, pool.submit(one, n)) for n in remaining]
                    results = [(n, f.result()) for n, f in futs]
            else:
                results = [(n, one(n)) for n in remaining]
            for name, (qp, dt) in results:
                self.report.search_seconds[name] = dt
                qstate[name] = qp
                self._save_ckpt(name, mtypes[name], qp)
                raw[name] = None  # free the group caches eagerly
                dispatched.append([name])

            # per-op occupancy attribution: the device retires programs in
            # enqueue order, so blocking op-by-op in that order times each
            # search's actual device execution (the first entry also absorbs
            # any capture tail).  This replaces the single group-end block
            # whose lump sum hid where the time went.  The NEXT group's
            # capture is dispatched mid-loop, as soon as the retired
            # searches have freed >= half this group's cache bytes: its
            # host-side cost (executable load, H2D staging) hides behind
            # the remaining searches' device execution while peak HBM
            # residency stays <= ~1.5x the cache budget.
            next_group = groups[gi + 1] if gi + 1 < len(groups) else None
            group_bytes = sum(sizes[n] for n in group)
            freed = 0
            for names in dispatched:
                t0 = time.time()
                jax.block_until_ready([qstate[n] for n in names])
                dt = (time.time() - t0) / len(names)
                freed += sum(sizes[n] for n in names)
                if (overlap and next_group is not None
                        and 2 * freed >= group_bytes):
                    pending = dispatch_capture(next_group)
                    next_group = None
                for n in names:
                    self.report.search_seconds[n] += dt
                if verbose:
                    label = (names[0] if len(names) == 1
                             else f"{len(names)} x matmul batch "
                                  f"({names[0]}...)")
                    print(f"[calib] {label}: "
                          f"{sum(self.report.search_seconds[n] for n in names):.2f}s",
                          flush=True)
            # residual safety block (should be ~0 with attribution above)
            t0 = time.time()
            jax.block_until_ready([qstate[n] for n in group])
            self.report.sync_seconds += time.time() - t0
            if next_group is not None:
                # overlap off, or the loop never crossed the free-bytes
                # threshold (e.g. nothing to search in this group): fall
                # back to a serial capture of the next group
                pending = dispatch_capture(next_group)
        return qstate

    def _replicated(self, x):
        """Params fed to a search alongside mesh-sharded caches must be
        mesh-resident too (single-device-committed arrays can't mix)."""
        if x is None or self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, P()))

    def _template_qp(self, name: str, mtype: str, policy, plan):
        """Aval-exact placeholder QP for the shared sequential capture.

        The shared executable (capture.SequentialCapturePlan) only stays
        compiled-once if replacing a template with the real searched QP
        never changes a leaf's shape/dtype — so the template STRUCTURE is
        derived by ``jax.eval_shape`` over the *actual* search function the
        op will run, with interval values of 1 (a valid quantizer; the
        values are never consumed before the op's own step enables it,
        and lax.cond skips the disabled branch entirely)."""
        from .capture import OpCapture
        shapes = plan.tap_shapes[name]
        n_micro = plan._n_micro

        def full(f):
            s = tuple(shapes[f].shape)
            return jax.ShapeDtypeStruct((n_micro * s[0],) + s[1:],
                                        jnp.float32)
        grad_spec = full("out") if policy.metric == "hessian" else None
        if mtype == "qconv":
            w, b = _params_for_op(self.net.params, name)

            def f(x, out, grad):
                cap = OpCapture("conv", {"x": x}, out=out, grad=grad)
                return S.search_conv(w, b, cap, policy, self.search_budget)
            specs = (full("x"), full("out"), grad_spec)
        elif "qmatmul" in mtype:
            def f(a, b_, out, grad):
                cap = OpCapture("matmul", {"a": a, "b": b_}, out=out,
                                grad=grad)
                return S.search_matmul(cap, policy, self.search_budget)
            specs = (full("a"), full("b"), full("out"), grad_spec)
        else:
            w, b = _params_for_op(self.net.params, name)

            def f(x, out, grad):
                cap = OpCapture("linear", {"x": x}, out=out, grad=grad)
                return S.search_linear(w, b, cap, policy,
                                       self.search_budget,
                                       calib_bs=self.batch_size)
            specs = (full("x"), full("out"), grad_spec)
        qp_struct = jax.eval_shape(f, *specs)
        return jax.tree.map(lambda s: jnp.ones(s.shape, s.dtype), qp_struct)

    def _search_one(self, name: str, mtype: str, policy, cap):
        if mtype == "qconv":
            w, b = _params_for_op(self.net.params, name)
            return S.search_conv(self._replicated(w), self._replicated(b),
                                 cap, policy, self.search_budget)
        if "qmatmul" in mtype:
            return S.search_matmul(cap, policy, self.search_budget,
                                   mesh=self.mesh)
        w, b = _params_for_op(self.net.params, name)
        return S.search_linear(self._replicated(w), self._replicated(b),
                               cap, policy, self.search_budget,
                               calib_bs=self.batch_size, mesh=self.mesh)


# convenience alias matching the reference's base class name
QuantCalibrator = HessianQuantCalibrator


def minmax_calib(net, quant_cfg: QuantConfig, calib_x: np.ndarray,
                 batch_size: int = 8) -> Dict[str, Any]:
    """Plain min-max calibration (reference MinMaxQuant* calibration_step2,
    linear.py:86-92, matmul.py:54-60) — a fast baseline, no search."""
    from ..quant import fakequant as fq
    raw = capture(net, calib_x, batch_size=batch_size, need_grad=False)
    qstate = {}
    for name, mtype in net.op_inventory:
        pol = quant_cfg.op_policy(mtype)
        cap = raw[name]
        if "qmatmul" in mtype:
            A = jnp.asarray(cap.inputs["a"])
            B = jnp.asarray(cap.inputs["b"])
            G = A.shape[1]
            qstate[name] = MatMulQP(
                A_interval=fq.matmul_operand_interval_init(
                    A, G, 1, 1, fq.qmax_for_bit(pol.a_bit)),
                B_interval=fq.matmul_operand_interval_init(
                    B, G, 1, 1, fq.qmax_for_bit(pol.b_bit)),
                A_bit=pol.a_bit, B_bit=pol.b_bit)
        elif mtype == "qconv":
            w, b = _params_for_op(net.params, name)
            qmax = fq.qmax_for_bit(pol.w_bit)
            qstate[name] = ConvQP(
                w_interval=fq.minmax_interval(jnp.asarray(w), qmax),
                a_interval=None, w_bit=pol.w_bit, a_bit=32)
        else:
            w, b = _params_for_op(net.params, name)
            qmax_w = fq.qmax_for_bit(pol.w_bit)
            qmax_a = fq.qmax_for_bit(pol.a_bit)
            x = jnp.asarray(cap.inputs["x"])
            qstate[name] = LinearQP(
                w_interval=fq.minmax_interval(
                    jnp.asarray(w), qmax_w).reshape(1, 1, 1, 1),
                a_interval=(jnp.max(jnp.abs(x)) / (qmax_a - 0.5)).reshape(1, 1),
                w_bit=pol.w_bit, a_bit=pol.a_bit)
    return qstate


def apply_bias_correction(net, qstate: Dict[str, Any], calib_x: np.ndarray,
                          batch_size: int = 8) -> Dict[str, Any]:
    """Explicit one-shot bias correction (reference
    _bias_correction_quant_forward, linear.py:69-77): subtract the mean
    quantization-induced output error from each linear bias.  NOT part of
    the shipped pipeline (the reference flag is inert there) — opt-in.

    Returns a NEW params pytree with corrected biases; qstate unchanged.
    """
    raw = capture(net, calib_x, batch_size=batch_size, need_grad=False)
    params = jax.tree.map(lambda a: a, net.params)  # shallow copy via rebuild

    def set_bias(params, name, new_bias):
        node = params
        parts = name.split(".")
        for part in parts[:-1]:
            node = node[int(part)] if isinstance(node, list) else node[part]
        node[parts[-1]]["bias"] = new_bias

    for name, mtype in net.op_inventory:
        if not mtype.startswith("qlinear"):
            continue
        qp = qstate.get(name)
        if qp is None:
            continue
        w, b = _params_for_op(net.params, name)
        if b is None:
            continue
        x = jnp.asarray(raw[name].inputs["x"])
        w_sim = qp.quant_weight(w)
        x_sim = qp.quant_input(x.reshape(-1, x.shape[-1]))
        eps = jnp.mean(jnp.matmul(x_sim, (w_sim - w).T), axis=0)
        set_bias(params, name, b - eps)
    return params


# ---------------------------------------------------------------------------
# qstate persistence (SURVEY.md §5: tiny per-layer state makes calibration
# resumable; the reference has no calibration resume at all)
# ---------------------------------------------------------------------------

_QP_KINDS = {"LinearQP": LinearQP, "MatMulQP": MatMulQP, "ConvQP": ConvQP}


def save_op_qp(path: str, qp, scope: Optional[str] = None) -> None:
    import json
    arrays = {}
    meta = {"kind": type(qp).__name__}
    if scope is not None:
        meta["scope"] = scope
    for f in dataclasses.fields(qp):
        v = getattr(qp, f.name)
        if v is None:
            continue
        if hasattr(v, "shape") or isinstance(v, (np.ndarray, np.generic)):
            arrays[f.name] = np.asarray(v)
        else:
            meta[f.name] = v
    np.savez(path, __meta__=np.asarray(json.dumps(meta)), **arrays)


def load_op_qp(path: str):
    import json
    data = np.load(path)
    meta = json.loads(str(data["__meta__"]))
    meta.pop("scope", None)
    cls = _QP_KINDS[meta.pop("kind")]
    kw = dict(meta)
    for k in data.files:
        if k != "__meta__":
            kw[k] = jnp.asarray(data[k])
    return cls(**kw)


def save_qstate(dirpath: str, qstate: Dict[str, Any]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    for name, qp in qstate.items():
        save_op_qp(os.path.join(dirpath, name.replace("/", "_") + ".npz"), qp)


def load_qstate(dirpath: str) -> Dict[str, Any]:
    out = {}
    for fn in sorted(os.listdir(dirpath)):
        if fn.endswith(".npz"):
            out[fn[:-4]] = load_op_qp(os.path.join(dirpath, fn))
    return out
