"""Calibration data capture: per-op FP32 inputs, outputs, and output
gradients in ONE forward+backward per micro-batch.

Replaces the reference's hook machinery (quant_calib.py:173-201 in
hahnyuan/PTQ4ViT) and — crucially — its **per-module** full-net passes: the
reference re-runs the whole network once per quantizable module
(quant_calib.py:316-341, ~50-200 full fwd+bwd over the calib set per model);
here a single pass captures every tap at once because the parallel paradigm
keeps the whole net FP32 during capture.  This is the main source of the
TPU calibration-time win.

Gradient capture ("hessian" metric).  The reference computes
``loss = KL(log_softmax(pred) ‖ raw_pred_softmax)`` and backprops
(quant_calib.py:332-341).  In parallel mode the net is FP32 during capture,
so ``pred == raw_pred`` up to kernel-scheduling noise and the analytic
gradient ``(softmax(pred) - target)/B`` is ~zero: the useful signal the
reference actually harvests is ``Jᵀ·ε`` for hardware float noise ε — an
inadvertent one-sample Hutchinson probe of the Gauss-Newton diagonal
(E[(Jᵀε)_j²] ∝ (JᵀJ)_jj).  On TPU the same computation would be exactly
zero, so this module makes the probe explicit and deterministic: the target
distribution is ``softmax(logits + σ·u)`` with seeded gaussian u.  The
hessian similarity ``-(g·(raw-sim))²`` is scale-invariant in g across
candidates, so σ only needs to stay in the linear regime.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

TAP_FIELDS = {"linear": ("x",), "conv": ("x",), "matmul": ("a", "b")}

# per-net memoization of the jitted capture executables and the whole-net
# abstract trace (keyed off the net without touching its __dict__ — Nets
# get reconstructed from it); entries die with the net
_NET_CACHES: Dict[int, tuple] = {}


def _net_cache(net) -> Dict:
    import weakref
    ent = _NET_CACHES.get(id(net))
    if ent is None or ent[0]() is not net:
        ref = weakref.ref(
            net, lambda _, k=id(net): _NET_CACHES.pop(k, None))
        ent = _NET_CACHES[id(net)] = (ref, {})
    return ent[1]


@dataclasses.dataclass
class OpCapture:
    """Host-side raw calibration data of one op (reference raw_input /
    raw_out / raw_grad caches, quant_calib.py:343-354)."""
    kind: str
    inputs: Dict[str, np.ndarray]   # linear/conv: {"x"}; matmul: {"a","b"}
    out: Optional[np.ndarray] = None   # None when captured with
                                       # store_raw_out=False (recomputed
                                       # from inputs+params in the search)
    grad: Optional[np.ndarray] = None


def probe_target(raw_logits: np.ndarray, probe_seed: int,
                 probe_sigma: float) -> np.ndarray:
    """softmax(logits + sigma*u) with seeded gaussian u (see module docs)."""
    u = jax.random.normal(jax.random.PRNGKey(probe_seed),
                          raw_logits.shape, jnp.float32)
    return np.asarray(jax.nn.softmax(
        jnp.asarray(raw_logits) + probe_sigma * u, axis=-1))


def _kl_batchmean(logits, target):
    """torch F.kl_div(log_softmax(logits), target, reduction="batchmean")."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logt = jnp.log(jnp.maximum(target, 1e-30))
    return jnp.sum(target * (logt - logp)) / logits.shape[0]


def _plan_budget_bytes(default: int = 10 << 30) -> int:
    """HBM ceiling for the shared sequential-capture executable's liveness
    estimate.  memory_stats() is None on the axon tunnel (CLAUDE.md), so
    the default assumes a 16 GiB v5e minus params/executables headroom."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return max(1 << 30, int(limit * 0.70))
    except Exception:
        pass
    return default


class SequentialCapturePlan:
    """ONE compiled capture executable serving EVERY step of a sequential
    calibration (reference quant_calib.py:369: op k is captured with ops
    0..k-1 already in quant_forward mode).

    The naive formulation pays O(num_ops) slow remote compiles on a
    tunneled TPU: each step taps a different op AND has a different
    quantized-prefix structure (None vs QP is a structural switch).  This
    plan removes both sources of retracing:

      * the qstate is structure-stable — every op carries a
        :class:`~ptq4vit_tpu.quant.qparams.GatedQP` whose traced ``on``
        boolean flips raw->quant per step (lax.cond in models/common.py),
        with template QPs (aval-exact via jax.eval_shape over the real
        search functions) standing in for not-yet-calibrated ops;
      * the tapped op is a traced ``k`` index — the program computes all
        taps (it must run the full fwd+bwd anyway) and a ``lax.switch``
        writes op k's (inputs, out) into flat buffers padded to the
        largest op, so every step shares one output signature.  The eps
        probe is ONE padded buffer masked to op k (not a per-op dict), so
        the backward materializes a single padded cotangent rather than
        every op's gradient; together with an HBM-aware micro-batch
        shrink this keeps the plan inside a 16 GiB chip at Swin-B/384
        shapes (a MemoryError at micro-batch 1 falls back to the legacy
        per-op captures in the calibrator).

    Per step the cost is one enqueue of the already-loaded executable plus
    the device fwd+bwd over the calibration set — the same device work the
    reference pays per module, with zero per-step compiles.  The
    calibration inputs/targets ship to the device ONCE at plan build (the
    legacy loop re-staged them every step).

    Caches are returned device-resident (jnp) with the sample axis
    leading, exactly like :func:`capture`'s output for one op.
    """

    def __init__(self, net, calib_x: np.ndarray, *, batch_size: int,
                 need_grad: bool, probe_sigma: float,
                 target_probs: Optional[np.ndarray],
                 ops: Sequence[str], mesh=None):
        params, cfg, fwd = net.params, net.cfg, net.forward
        num = calib_x.shape[0]
        if num % batch_size != 0:
            batch_size = next(b for b in range(min(batch_size, num), 0, -1)
                              if num % b == 0)
        if mesh is not None:
            # sequential mode on the mesh (reference quant_calib.py:28-55
            # semantics under SPMD): each micro-batch shards its sample axis
            # over "data", every padded tap/eps buffer keeps the sample axis
            # leading so it shards the same way, and the step output lands
            # P("data") like capture()'s caches
            dp = mesh.shape["data"]
            if batch_size % dp != 0 or num % batch_size != 0:
                batch_size = next(
                    (b for b in range(min(max(batch_size, dp), num), 0, -1)
                     if num % b == 0 and b % dp == 0), None)
                if batch_size is None:
                    raise ValueError(
                        f"calib size {num} not shardable over data={dp}")
        self.mesh = mesh
        self.net = net
        self.names = list(ops)
        self.need_grad = need_grad
        kinds = {}
        for n, mtype in net.op_inventory:
            kinds[n] = ("conv" if mtype == "qconv"
                        else "matmul" if "qmatmul" in mtype else "linear")
        self.kinds = kinds
        names = self.names

        shape_cache = _net_cache(net).setdefault("tap_shapes", {})

        def shapes_for(b):
            sk = (b,) + calib_x.shape[1:]
            if sk not in shape_cache:
                spec = jax.ShapeDtypeStruct(sk, jnp.float32)
                shape_cache[sk] = jax.eval_shape(
                    lambda p, x: fwd(p, x, cfg, qstate=None, capture=True),
                    params, spec)
            return shape_cache[sk][1]

        def nel(ts, n, field):
            return int(np.prod(ts[n][field].shape))

        def pads_of(ts, b):
            # pads are PER-IMAGE: every tap keeps the sample axis leading
            # (Swin matmuls are samples-major over windows), so the padded
            # buffers are (batch, pad_img) — shardable over "data" on a
            # mesh — and the pads are micro-batch-size independent
            p1 = max(nel(ts, n, "a" if kinds[n] == "matmul" else "x")
                     for n in names) // b
            mm = [n for n in names if kinds[n] == "matmul"]
            p2 = max((nel(ts, n, "b") for n in mm), default=b) // b
            po = max(nel(ts, n, "out") for n in names) // b
            return p1, p2, po

        tap_shapes = shapes_for(batch_size)
        pad_in1, pad_in2, pad_out = pads_of(tap_shapes, batch_size)

        # HBM-aware micro-batch: the shared executable's peak liveness is
        # every op's taps at the traced switch (the tap index is dynamic,
        # so no branch can be dead-code-eliminated) plus the scan-stacked
        # padded buffers (batch-independent: n_micro x per-micro pads =
        # num x per-image pads).  All tap arrays carry the micro-batch as
        # their leading axis, so per-image sizes are exact linear scalings.
        # Shrink the micro-batch until the estimate fits — Swin-B/384 at
        # the calibrator default batch 4 otherwise RESOURCE_EXHAUSTs a
        # 16 GB v5e (measured, device_log_r4.txt seq_swin_base).
        live = sum(nel(tap_shapes, n, "a" if kinds[n] == "matmul" else "x")
                   + (nel(tap_shapes, n, "b") if kinds[n] == "matmul" else 0)
                   + nel(tap_shapes, n, "out") for n in names)
        per_img_live = live / batch_size
        per_img_stack = (pad_in1 + pad_in2            # pads are per-image
                         + pad_out * (2 if need_grad else 1))
        budget = _plan_budget_bytes()
        slack = 2.0 if need_grad else 1.3   # bwd residuals / XLA workspace
        fixed = 4.0 * per_img_stack * num

        def fits(b):
            return 4.0 * slack * per_img_live * b + fixed <= budget

        if not fits(batch_size):
            dp = 1 if mesh is None else mesh.shape["data"]
            b_ok = next((b for b in range(batch_size - 1, 0, -1)
                         if num % b == 0 and b % dp == 0 and fits(b)), None)
            if b_ok is None:
                raise MemoryError(
                    "sequential capture plan exceeds the HBM budget "
                    f"({budget / 2**30:.1f} GiB) even at micro-batch "
                    f"{dp} (per-image live ~"
                    f"{per_img_live * 4 / 2**30:.2f} GiB)")
            batch_size = b_ok
            tap_shapes = shapes_for(batch_size)
            pad_in1, pad_in2, pad_out = pads_of(tap_shapes, batch_size)

        self.tap_shapes = tap_shapes
        self.pad_in1, self.pad_in2, self.pad_out = pad_in1, pad_in2, pad_out
        self.batch_size = batch_size
        # introspection for tests / sizing studies
        self._est_bytes = lambda b: 4.0 * slack * per_img_live * b + fixed
        eps_shapes = {n: tap_shapes[n]["out"].shape for n in names}
        idx = {n: i for i, n in enumerate(names)}

        def padflat(a, size):
            # per-sample layout: (batch, pad_img) — every tap keeps the
            # sample axis leading (Swin matmul taps are samples-major over
            # windows), so on a mesh the buffer shards over "data" with
            # zero cross-device gathers
            a = a.astype(jnp.float32).reshape(batch_size, -1)
            return jnp.pad(a, ((0, 0), (0, size - a.shape[1])))

        def step_fn(p, qs, k, xb, tb):
            if need_grad:
                # ONE padded eps buffer, masked to op k: the VJP then
                # carries a single (batch, pad_out) cotangent instead of
                # materializing EVERY op's gradient at the switch (the
                # all-ops grads dict plus its eps_zeros inputs kept
                # ~2 x sum(out elements) floats live per micro-batch —
                # several GiB at Swin-B/384 shapes).  Selected-op
                # gradient is bit-identical: d(eps_flat) = sum_n mask_n *
                # pad(dKL/d out_n), and every mask but op k's is an
                # exact 0.0.
                def loss_fn(eps_flat):
                    eps = {}
                    for n, sh in eps_shapes.items():
                        m = (k == idx[n]).astype(jnp.float32)
                        nelm = int(np.prod(sh)) // batch_size
                        eps[n] = (eps_flat[:, :nelm] * m).reshape(sh)
                    logits, taps = fwd(p, xb, cfg, qstate=qs, eps=eps,
                                       capture=True)
                    return _kl_batchmean(logits, tb), taps
                (_, taps), gflat = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                        jnp.zeros((batch_size, pad_out), jnp.float32))
            else:
                _, taps = fwd(p, xb, cfg, qstate=qs, capture=True)
                gflat = None

            def mk_branch(n):
                def br():
                    t = taps[n]
                    in1 = padflat(t["a" if kinds[n] == "matmul" else "x"],
                                  pad_in1)
                    in2 = (padflat(t["b"], pad_in2)
                           if kinds[n] == "matmul"
                           else jnp.zeros((batch_size, pad_in2),
                                          jnp.float32))
                    out = padflat(t["out"], pad_out)
                    return in1, in2, out
                return br
            sel = jax.lax.switch(k, [mk_branch(n) for n in names])
            return sel + (gflat,) if need_grad else sel

        def plan_fn(p, qs, k, x_all, t_all):
            def body(_, inp):
                xb, tb = inp
                return None, step_fn(p, qs, k, xb, tb)
            _, stacked = jax.lax.scan(body, None, (x_all, t_all))
            # (n_micro, batch, pad) -> (num, pad): the whole-run sample axis
            # leads, exactly like capture()'s caches (P("data") on a mesh)
            return jax.tree.map(
                lambda a: a.reshape((-1,) + a.shape[2:]), stacked)

        # memoized like capture()'s executables: repeat sequential runs on
        # the same net (bench repeats, resumed runs) reuse the loaded
        # executable.  Mesh OBJECT in the key (hashable; a dead mesh must
        # not alias a recycled one).
        key = ("seq", tuple(names), batch_size, need_grad,
               float(probe_sigma), calib_x.shape[1:], mesh)
        jit_cache = _net_cache(net).setdefault("capture_jit", {})
        self._jit = jit_cache.get(key)
        if self._jit is None:
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._jit = jax.jit(
                    plan_fn, out_shardings=NamedSharding(mesh, P("data")))
            else:
                self._jit = jax.jit(plan_fn)
            jit_cache[key] = self._jit

        self._params = params
        self._n_micro = num // batch_size
        self._x_all = jnp.asarray(calib_x).reshape(
            (self._n_micro, batch_size) + calib_x.shape[1:])
        if need_grad:
            self._t_all = jnp.asarray(target_probs, jnp.float32).reshape(
                self._n_micro, batch_size, -1)
        else:
            self._t_all = jnp.zeros((self._n_micro, batch_size, 1),
                                    jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())
            self._x_all = jax.device_put(
                self._x_all, NamedSharding(mesh, P(None, "data")))
            self._t_all = jax.device_put(
                self._t_all, NamedSharding(mesh, P(None, "data")))
            self._params = jax.device_put(params, rep)

    def step(self, gated_qstate, name: str) -> OpCapture:
        """Capture op ``name`` under the prefix encoded in ``gated_qstate``
        (a {op: GatedQP} dict with the SAME treedef every call)."""
        k = self.names.index(name)
        res = self._jit(self._params, gated_qstate, jnp.int32(k),
                        self._x_all, self._t_all)
        kind = self.kinds[name]
        shapes = self.tap_shapes[name]

        def unpad(buf, field):
            # buf: (num, pad_img) sample-major -> (num*k, per-sample shape)
            # where shp = one micro-batch's tap shape (leading batch*k)
            shp = tuple(shapes[field].shape)
            n_img = int(np.prod(shp)) // self.batch_size
            a = buf[:, :n_img].reshape((self._n_micro,) + shp)
            return a.reshape((-1,) + shp[1:])

        if kind == "matmul":
            inputs = {"a": unpad(res[0], "a"), "b": unpad(res[1], "b")}
        else:
            inputs = {"x": unpad(res[0], "x")}
        return OpCapture(
            kind=kind, inputs=inputs, out=unpad(res[2], "out"),
            grad=unpad(res[3], "out") if self.need_grad else None)


def capture(net, calib_x: np.ndarray, *, batch_size: int = 8,
            need_grad: bool = True, probe_seed: int = 3,
            probe_sigma: float = 1e-3,
            ops: Optional[Sequence[str]] = None,
            qstate: Optional[Dict] = None,
            target_probs: Optional[np.ndarray] = None,
            to_host: bool = True,
            store_raw_out: bool = True,
            cache_dtype=None,
            mesh=None,
            want_target: bool = False):
    """Run the capture pass over the calibration set.

    net: models.registry.Net;  calib_x: (num, 3, H, W) float32 host array.
    batch_size: micro-batch size (reference HessianQuantCalibrator
       batch_size, quant_calib.py:334).
    need_grad: also capture ∂KL/∂(op output) per tap (hessian metric).
    probe_sigma: σ of the logit-space probe; 0.0 reproduces the reference's
       analytically-zero gradient (useful only for debugging).
    ops: subset of op names to capture (default: all quantizable ops).
    qstate: quantization state applied during the pass (sequential mode —
       preceding ops in quant_forward, reference quant_calib.py:369).
    target_probs: precomputed probe target distribution; when given, the
       target pass is skipped (sequential mode computes it once on the raw
       net, reference quant_calib.py:309-313).
    to_host: True -> numpy caches (reference parity: CPU tensors,
       quant_calib.py:178-201).  False -> the caches stay DEVICE-resident
       (jnp arrays, concatenated in HBM) — the production TPU path: host
       round-trips on a tunneled/remote device run at ~MB/s, so calibration
       data must never leave the chip.
    store_raw_out: False drops every op's raw_out from the caches — the
       searches recompute it from the cached inputs + params (matmul:
       out == A@B; linear/conv: out == x@wT+b, the same XLA dot on the same
       operands, so bit-identical).  Saves the largest HBM tenants (the
       (S,H,N,N) attention-score outputs and the (S,T,4d) MLP outs) and
       cuts the op-group count of grouped capture.
    cache_dtype: storage dtype of the caches (e.g. jnp.bfloat16 halves the
       HBM footprint and the op-group count; searches upcast to fp32 —
       scale selection may shift by the bf16 rounding of the raw data, so
       the parity default is float32/None).
    mesh: optional ``jax.sharding.Mesh`` with a "data" axis.  Each
       micro-batch is sharded over "data" (samples are independent, so the
       per-sample caches are bit-identical to single-device capture) and
       the returned caches stay sharded on the sample axis — downstream
       searches then run data-parallel with XLA-inserted psums for the
       similarity sums (the reduction of reference linear.py:487-492).

    Returns {op name: OpCapture} whose leading axis is the
    calibration-sample axis (for Swin matmuls: samples × windows, matching
    the reference's cache-concat semantics, quant_calib.py:350).
    """
    params, cfg, fwd = net.params, net.cfg, net.forward
    num = calib_x.shape[0]
    if num % batch_size != 0:
        batch_size = next(b for b in range(min(batch_size, num), 0, -1)
                          if num % b == 0)
    if mesh is not None:
        dp = mesh.shape["data"]
        if batch_size % dp != 0 or num % batch_size != 0:
            # micro-batches shard evenly over "data"; grad scale changes
            # with batch_size are uniform (KL batchmean /B), argmax-safe
            batch_size = next(
                (b for b in range(min(max(batch_size, dp), num), 0, -1)
                 if num % b == 0 and b % dp == 0), None)
            if batch_size is None:
                raise ValueError(
                    f"calib size {num} not shardable over data={dp}")
    names = [n for n, _ in net.op_inventory]
    if ops is not None:
        names = [n for n in names if n in set(ops)]
    name_set = set(names)

    # ---- probe target (quant_calib.py:309).  When the caller does not
    # supply one, the target is computed INSIDE the capture program: each
    # micro-batch runs a raw forward, adds the seeded probe noise, and
    # softmaxes — per-sample independent, so batch-local computation equals
    # the reference's full-set pass, and the separate target executable
    # (one more slow remote compile + ~130 ms dispatch) disappears.  Only
    # the (num, classes) noise u ships from host.  The extra in-scan
    # forward bloats the executable (load time scales with program size on
    # a tunneled device), so grouped callers should fuse it only into the
    # FIRST group (want_target=True returns the computed probs for reuse)
    # and pass target_probs to the rest.  Sequential mode must pass
    # target_probs explicitly (its target comes from the RAW net, not the
    # prefix-quantized one traced here).
    fused_target = False
    if need_grad and target_probs is not None:
        # np or device-resident jnp both fine (jnp stays on device)
        target_all = target_probs
    elif need_grad:
        fused_target = True
        target_all = None
    else:
        target_all = None

    # ---- eps skeleton from tap output shapes (static); the zeros are
    # created INSIDE the jitted program (device-side fill) so they are
    # neither baked into the executable as constants nor shipped per call
    xb_spec = jax.ShapeDtypeStruct((batch_size,) + calib_x.shape[1:],
                                   jnp.float32)
    # tap shapes are qstate-independent; memoize the whole-net abstract
    # trace per (batch, image) shape on the net (host-side seconds per
    # call on deep models)
    shape_cache = _net_cache(net).setdefault("tap_shapes", {})
    sk = (batch_size,) + calib_x.shape[1:]
    if sk not in shape_cache:
        shape_cache[sk] = jax.eval_shape(
            lambda p, x: fwd(p, x, cfg, qstate=qstate, capture=True),
            params, xb_spec)
    logits_spec, tap_shapes = shape_cache[sk]
    eps_shapes = {n: tap_shapes[n]["out"].shape for n in names}
    if fused_target:
        # seeded over the FULL (num, classes) shape then sliced per batch —
        # identical values to probe_target on the concatenated logits
        n_classes = logits_spec.shape[-1]
        target_all = np.asarray(jax.random.normal(
            jax.random.PRNGKey(probe_seed), (num, n_classes), jnp.float32))

    kinds = {}
    for n, mtype in net.op_inventory:
        kinds[n] = ("conv" if mtype == "qconv"
                    else "matmul" if "qmatmul" in mtype else "linear")

    def filter_taps(taps):
        """Keep only the requested ops/fields (drops raw outs when they
        will be recomputed); cast to the cache dtype."""
        cast = ((lambda a: a.astype(cache_dtype)) if cache_dtype is not None
                else (lambda a: a))
        out = {}
        for n in names:
            rec = {k: cast(taps[n][k]) for k in TAP_FIELDS[kinds[n]]}
            if store_raw_out:
                rec["out"] = cast(taps[n]["out"])
            out[n] = rec
        return out

    def build_capture_all():
        def step(p, qs, xb, tb):
            if need_grad:
                if fused_target:
                    # tb carries the probe noise u; the raw forward has no
                    # eps dependence, so no gradient flows through the
                    # target
                    raw_logits = fwd(p, xb, cfg, qstate=qs)
                    tb = jax.nn.softmax(raw_logits + probe_sigma * tb,
                                        axis=-1)
                eps_zeros = {n: jnp.zeros(sh, jnp.float32)
                             for n, sh in eps_shapes.items()}
                def loss_fn(eps):
                    logits, taps = fwd(p, xb, cfg, qstate=qs, eps=eps,
                                       capture=True)
                    return _kl_batchmean(logits, tb), filter_taps(taps)
                (_, taps), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(eps_zeros)
                for n in names:
                    taps[n]["grad"] = (grads[n].astype(cache_dtype)
                                       if cache_dtype is not None
                                       else grads[n])
                if fused_target and want_target:
                    taps["__target__"] = tb
                return taps
            _, taps = fwd(p, xb, cfg, qstate=qs, capture=True)
            return filter_taps(taps)

        # ONE jitted scan over all micro-batches: outputs come back stacked
        # as (n_micro, bs, ...) and are flattened in the same program.  A
        # single dispatch/compile per capture pass — per-op concatenates
        # would cost hundreds of tiny dispatches on a high-latency
        # (tunneled) device.
        def capture_all_fn(p, qs, x_all, t_all):
            def body(_, inp):
                xb, tb = inp
                return None, step(p, qs, xb, tb)
            _, stacked = jax.lax.scan(body, None, (x_all, t_all))
            return jax.tree.map(
                lambda a: a.reshape((-1,) + a.shape[2:]), stacked)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.jit(capture_all_fn,
                           out_shardings=NamedSharding(mesh, P("data")))
        return jax.jit(capture_all_fn)

    # Memoize the jitted callable on the net: a fresh closure per call
    # would re-trace AND re-load the (large) capture executable onto the
    # device every time — ~seconds per group through a tunneled device,
    # even with the persistent compile cache hot.  qstate is a traced
    # ARGUMENT (not a baked closure constant) so repeat captures with the
    # same op group and qstate STRUCTURE (bench repeats, multi-model grids,
    # resumed runs) reuse the already-loaded executable and cost only the
    # enqueue.  None entries in qstate are structural (treedef key).
    # Key on the Mesh OBJECT (hashable), not id(mesh): a recycled id after
    # GC would silently reuse an executable whose out_shardings bind a dead
    # mesh.  Image dims are in the key because the closure bakes eps_shapes
    # derived from them — same batch_size at a different resolution must
    # rebuild.
    cache_key = (tuple(names), batch_size, need_grad, fused_target,
                 want_target, store_raw_out, str(cache_dtype),
                 float(probe_sigma), calib_x.shape[1:],
                 mesh,
                 jax.tree.structure(qstate))
    jit_cache = _net_cache(net).setdefault("capture_jit", {})
    capture_all = jit_cache.get(cache_key)
    if capture_all is None:
        capture_all = jit_cache[cache_key] = build_capture_all()

    x_all = jnp.asarray(calib_x).reshape(
        (num // batch_size, batch_size) + calib_x.shape[1:])
    t_all = (jnp.asarray(target_all).reshape(
        num // batch_size, batch_size, -1) if need_grad
        else jnp.zeros((num // batch_size, batch_size, 1), jnp.float32))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        x_all = jax.device_put(x_all, NamedSharding(mesh, P(None, "data")))
        t_all = jax.device_put(t_all, NamedSharding(mesh, P(None, "data")))
        params = jax.device_put(params, rep)
        if qstate:
            qstate = jax.device_put(qstate, rep)
    flat = capture_all(params, qstate, x_all, t_all)
    if to_host:
        flat = jax.device_get(flat)

    result: Dict[str, OpCapture] = {}
    for n in names:
        kind = kinds[n]
        rec = flat[n]
        result[n] = OpCapture(
            kind=kind,
            inputs={k: rec[k] for k in TAP_FIELDS[kind]},
            out=rec.get("out"),
            grad=rec.get("grad"))
    if want_target:
        tgt = flat.get("__target__") if fused_target else target_all
        return result, tgt
    return result
