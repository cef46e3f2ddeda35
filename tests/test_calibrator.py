"""End-to-end calibration on a tiny ViT: full PTQ4ViT pipeline (hessian +
twin quantizers), BasePTQ pipeline, minmax baseline, checkpoint/resume,
sequential mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptq4vit_tpu.calib.calibrator import (HessianQuantCalibrator, load_qstate,
                                          minmax_calib, save_qstate,
                                          apply_bias_correction)
from ptq4vit_tpu.configs import base_ptq, get_config, ptq4vit
from ptq4vit_tpu.quant.qparams import ConvQP, LinearQP, MatMulQP
from tests.test_capture import tiny_net


def small_cfg(cfg):
    """Shrink the search so CPU tests stay fast (semantics unchanged)."""
    for kw in (cfg.ptqsl_conv2d_kwargs, cfg.ptqsl_linear_kwargs,
               cfg.ptqsl_matmul_kwargs):
        kw["eq_n"] = 8
        kw["search_round"] = 1
    return cfg


@pytest.fixture(scope="module")
def net():
    return tiny_net()


@pytest.fixture(scope="module")
def calib_x():
    return np.random.default_rng(3).standard_normal(
        (8, 3, 32, 32)).astype(np.float32)


def test_ptq4vit_pipeline(net, calib_x):
    cfg = small_cfg(ptq4vit())
    calib = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4)
    qstate = calib.batching_quant_calib(verbose=False)
    assert set(qstate) == {n for n, _ in net.op_inventory}
    # quantizer kinds resolved per the PTQ4ViT policy
    assert isinstance(qstate["patch_embed.proj"], ConvQP)
    assert qstate["patch_embed.proj"].a_interval is None          # a_bit=32
    assert qstate["patch_embed.proj"].w_interval.shape == (24, 1, 1, 1)
    qkv = qstate["blocks.0.attn.qkv"]
    assert isinstance(qkv, LinearQP) and qkv.w_interval.shape == (3, 1, 1, 1)
    fc2 = qstate["blocks.0.mlp.fc2"]
    assert fc2.postgelu and fc2.a_neg_interval is not None
    mm2 = qstate["blocks.0.attn.matmul2"]
    assert isinstance(mm2, MatMulQP) and mm2.split is not None
    mm1 = qstate["blocks.0.attn.matmul1"]
    assert mm1.split is None
    assert mm1.A_interval.shape == (1, 3, 1, 1, 1, 1, 1)          # head-wise
    head = qstate["head"]
    assert head.w_interval.shape == (1, 1, 1, 1)                   # n_V=1

    # quantized forward runs and stays close to FP32
    x = calib_x[:4]
    fp = np.asarray(net.apply(jnp.asarray(x)))
    q8 = np.asarray(net.apply(jnp.asarray(x), qstate=qstate))
    rel = np.abs(q8 - fp).max() / (np.abs(fp).max() + 1e-9)
    assert rel < 0.5  # W8A8-ish on random weights: rough but bounded

    # search beats plain minmax calibration on output error
    mm_qstate = minmax_calib(net, small_cfg(ptq4vit()), calib_x)
    qmm = np.asarray(net.apply(jnp.asarray(x), qstate=mm_qstate))
    assert np.mean((q8 - fp) ** 2) <= np.mean((qmm - fp) ** 2) * 1.5

    # report populated
    assert calib.report.total_seconds > 0
    assert len(calib.report.search_seconds) == len(qstate)


def test_base_ptq_pipeline(net, calib_x):
    cfg = small_cfg(base_ptq())
    qstate = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    # BasePTQ: no twin quantizers, layerwise conv
    assert qstate["blocks.0.mlp.fc2"].postgelu is False
    assert qstate["blocks.0.attn.matmul2"].split is None
    assert qstate["patch_embed.proj"].w_interval.shape == ()
    np.asarray(net.apply(jnp.asarray(calib_x[:2]), qstate=qstate))


def test_w6a6_bits(net, calib_x):
    cfg = small_cfg(ptq4vit()).set_bits(6, 6)
    qstate = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    assert qstate["blocks.0.attn.qkv"].w_bit == 6
    assert qstate["blocks.0.attn.matmul1"].A_bit == 6


def test_checkpoint_resume(tmp_path, net, calib_x):
    cfg = small_cfg(ptq4vit())
    d = str(tmp_path / "ck")
    c1 = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                checkpoint_dir=d)
    q1 = c1.batching_quant_calib(verbose=False)
    # resume: everything loaded from disk, no search run
    c2 = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                checkpoint_dir=d)
    q2 = c2.batching_quant_calib(verbose=False)
    assert len(c2.report.search_seconds) == 0
    for n in q1:
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), q1[n], q2[n])


def test_checkpoint_scope_mismatch(tmp_path, net, calib_x):
    """Reusing a checkpoint_dir across configs must not silently return
    stale QPs (ADVICE r1): a bit change invalidates every checkpoint."""
    d = str(tmp_path / "ck")
    HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib_x, batch_size=4,
                           checkpoint_dir=d) \
        .batching_quant_calib(verbose=False)
    c2 = HessianQuantCalibrator(net, small_cfg(ptq4vit()).set_bits(6, 6),
                                calib_x, batch_size=4, checkpoint_dir=d)
    q2 = c2.batching_quant_calib(verbose=False)
    # every op re-searched, and the result carries the new bits
    assert len(c2.report.search_seconds) == len(q2)
    assert q2["blocks.0.attn.qkv"].w_bit == 6
    # and the refreshed checkpoints resume cleanly under the new config
    c3 = HessianQuantCalibrator(net, small_cfg(ptq4vit()).set_bits(6, 6),
                                calib_x, batch_size=4, checkpoint_dir=d)
    c3.batching_quant_calib(verbose=False)
    assert len(c3.report.search_seconds) == 0


def test_qstate_save_load(tmp_path, net, calib_x):
    cfg = small_cfg(ptq4vit())
    qstate = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    d = str(tmp_path / "qs")
    save_qstate(d, qstate)
    loaded = load_qstate(d)
    assert set(loaded) == set(qstate)
    fp = np.asarray(net.apply(jnp.asarray(calib_x[:2]), qstate=qstate))
    lq = np.asarray(net.apply(jnp.asarray(calib_x[:2]), qstate=loaded))
    np.testing.assert_array_equal(fp, lq)


def test_sequential_mode(net, calib_x):
    cfg = small_cfg(get_config("BasePTQ"))
    qstate = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                    sequential=True) \
        .batching_quant_calib(verbose=False)
    assert set(qstate) == {n for n, _ in net.op_inventory}


def test_sequential_shared_plan(net, calib_x, monkeypatch):
    """The default sequential path must (a) engage the compiled-once
    SequentialCapturePlan, (b) trace it exactly ONCE for all steps (the
    GatedQP qstate keeps the treedef constant; the tapped op is a traced
    switch index), and (c) calibrate the same state as the legacy per-op
    structural captures (PTQ4VIT_TPU_SEQ_SHARED=0)."""
    from ptq4vit_tpu.calib import capture as cap_mod

    plans = []
    orig_init = cap_mod.SequentialCapturePlan.__init__

    def spy(self, *a, **k):
        orig_init(self, *a, **k)
        plans.append(self)

    monkeypatch.setattr(cap_mod.SequentialCapturePlan, "__init__", spy)
    cfg = small_cfg(ptq4vit())   # hessian: covers the fwd+bwd capture
    q_shared = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                      sequential=True) \
        .batching_quant_calib(verbose=False)
    assert len(plans) == 1
    assert plans[0]._jit._cache_size() == 1   # ONE compile, all 14 steps

    monkeypatch.setenv("PTQ4VIT_TPU_SEQ_SHARED", "0")
    q_legacy = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                      sequential=True) \
        .batching_quant_calib(verbose=False)
    assert len(plans) == 1                    # legacy path built no plan
    assert set(q_shared) == set(q_legacy)
    for n in q_shared:
        for a, b in zip(jax.tree.leaves(q_shared[n]),
                        jax.tree.leaves(q_legacy[n])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, err_msg=n)


def test_sequential_plan_hbm_shrink(net, calib_x, monkeypatch):
    """When the liveness estimate exceeds the HBM budget, the shared plan
    shrinks its micro-batch to a divisor of the calib size instead of
    OOMing (measured failure mode: Swin-B/384 at batch 4
    RESOURCE_EXHAUSTed a 16 GiB v5e, device_log_r4.txt seq_swin_base).
    Micro-batching only rescales the KL-batchmean gradients uniformly
    (1/B), so the calibrated state is argmax-identical.  Below the
    micro-batch-1 floor the plan raises and the calibrator falls back to
    the legacy per-op captures — still completing with the same state."""
    from ptq4vit_tpu.calib import capture as cap_mod

    plans = []
    orig_init = cap_mod.SequentialCapturePlan.__init__

    def spy(self, *a, **k):
        orig_init(self, *a, **k)
        plans.append(self)

    monkeypatch.setattr(cap_mod.SequentialCapturePlan, "__init__", spy)
    cfg = small_cfg(ptq4vit())
    base = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                  sequential=True) \
        .batching_quant_calib(verbose=False)
    assert plans[0].batch_size == 4   # default budget: no shrink

    def check(qstate):
        assert set(qstate) == set(base)
        for n in base:
            for a, b in zip(jax.tree.leaves(base[n]),
                            jax.tree.leaves(qstate[n])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, err_msg=n)

    # budget that admits micro-batch 2 but not 4 -> plan shrinks
    monkeypatch.setattr(cap_mod, "_plan_budget_bytes",
                        lambda default=0: int(plans[0]._est_bytes(2)) + 1)
    q_shrunk = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                      sequential=True) \
        .batching_quant_calib(verbose=False)
    assert plans[1].batch_size == 2
    check(q_shrunk)

    # budget below the micro-batch-1 floor -> MemoryError -> legacy path
    monkeypatch.setattr(cap_mod, "_plan_budget_bytes",
                        lambda default=0: int(plans[0]._est_bytes(1)) - 1)
    n_plans = len(plans)
    q_legacy = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                      sequential=True) \
        .batching_quant_calib(verbose=False)
    assert len(plans) == n_plans      # plan build failed, none recorded
    check(q_legacy)


def test_bias_correction_optin(net, calib_x):
    cfg = small_cfg(ptq4vit())
    qstate = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    params2 = apply_bias_correction(net, qstate, calib_x)
    b0 = np.asarray(net.params["blocks"][0]["attn"]["qkv"]["bias"])
    b1 = np.asarray(params2["blocks"][0]["attn"]["qkv"]["bias"])
    assert not np.array_equal(b0, b1)   # correction applied
    # original params untouched
    assert np.array_equal(
        b0, np.asarray(net.params["blocks"][0]["attn"]["qkv"]["bias"]))


def test_bf16_cache_dtype(net, calib_x):
    import jax.numpy as jnp
    cfg = small_cfg(ptq4vit())
    q32 = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    qbf = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                 cache_dtype=jnp.bfloat16) \
        .batching_quant_calib(verbose=False)
    # bf16 caches perturb raw data slightly; intervals stay within the
    # candidate-grid step of the fp32 selection
    for n in q32:
        a = np.asarray(jax.tree.leaves(q32[n])[0]).ravel()
        b = np.asarray(jax.tree.leaves(qbf[n])[0]).ravel()
        np.testing.assert_allclose(a, b, rtol=0.35)


def test_matmul_cohort_off_same_qstate(net, calib_x, monkeypatch):
    """PTQ4VIT_TPU_MATMUL_COHORT=0 (per-op searches) must produce the same
    calibrated state as the vmapped cohort path — the op axis is batched,
    never reduced over."""
    cfg = small_cfg(ptq4vit())
    q_on = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    monkeypatch.setenv("PTQ4VIT_TPU_MATMUL_COHORT", "0")
    q_off = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    for n in q_on:
        for a, b in zip(jax.tree.leaves(q_on[n]), jax.tree.leaves(q_off[n])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)


def test_matmul_pallas_default_same_qstate(net, calib_x, monkeypatch):
    """PTQ4VIT_TPU_PALLAS=1 (the accelerator default) routes hessian
    matmuls past the cohort builder into the per-op fused Pallas scorer
    (interpret-mode here); the calibrated state must equal the XLA int8
    scorer's, which the fused kernel reimplements exactly."""
    cfg = small_cfg(ptq4vit())
    monkeypatch.setenv("PTQ4VIT_TPU_INT8_SCORE", "1")
    q_xla = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    monkeypatch.setenv("PTQ4VIT_TPU_PALLAS", "1")
    q_pal = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    for n in q_xla:
        for a, b in zip(jax.tree.leaves(q_xla[n]),
                        jax.tree.leaves(q_pal[n])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)


def test_int8_score_off_bypasses_pallas_matmul(net, calib_x, monkeypatch):
    """PTQ4VIT_TPU_INT8_SCORE=0 restores exact fp32 reference rounding even
    with the Pallas scorers enabled: the fused matmul scorer is int8-only,
    so the flag must bypass it (BITWISE equality with the plain XLA path,
    which last-ulp int8-rescale differences would break)."""
    cfg = small_cfg(ptq4vit())
    monkeypatch.setenv("PTQ4VIT_TPU_INT8_SCORE", "0")
    ref = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    monkeypatch.setenv("PTQ4VIT_TPU_PALLAS", "1")
    q = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    for n in ref:
        bitwise = "matmul" in n  # linear Pallas fp32 kernels may differ
        for a, b in zip(jax.tree.leaves(ref[n]), jax.tree.leaves(q[n])):
            if bitwise:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            else:
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6)


def test_multigroup_overlap_same_qstate(net, calib_x, monkeypatch):
    """A cache budget of 1 byte forces every op into its own capture group,
    exercising the group planner and the capture/search overlap prefetch
    (group g+1's capture dispatched while group g's searches retire) —
    the calibrated state must equal the single-group run's, overlap on or
    off."""
    cfg = small_cfg(ptq4vit())
    ref = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    for ov in ("1", "0"):
        monkeypatch.setenv("PTQ4VIT_TPU_OVERLAP", ov)
        c = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4,
                                   cache_budget_bytes=1)
        q = c.batching_quant_calib(verbose=False)
        # guard against the planner clamping the explicit budget back up
        # (which would silently collapse this to a single-group run and
        # leave the overlap path untested)
        assert c.report.num_groups == len(q), \
            f"expected per-op groups, got {c.report.num_groups}"
        for n in ref:
            for a, b in zip(jax.tree.leaves(ref[n]), jax.tree.leaves(q[n])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6)


def test_hbm_planner_budget_shrink(net, calib_x, monkeypatch):
    """PTQ4VIT_TPU_HBM_GB bounds the cache-group budget (prefetch + search
    working set + capture workspace must fit); a tight bound must change
    results not at all."""
    cfg = small_cfg(ptq4vit())
    ref = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    monkeypatch.setenv("PTQ4VIT_TPU_HBM_GB", "2")
    q = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    for n in ref:
        for a, b in zip(jax.tree.leaves(ref[n]), jax.tree.leaves(q[n])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)


def test_dispatch_threads_same_qstate(net, calib_x, monkeypatch):
    """PTQ4VIT_TPU_DISPATCH_THREADS=4 (fresh-run lever: per-op search
    compile-loads dispatched from a thread pool instead of serially) must
    produce a BITWISE-identical calibrated state — the searches are
    independent pure programs; only host dispatch concurrency changes."""
    cfg = small_cfg(ptq4vit())
    ref = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    monkeypatch.setenv("PTQ4VIT_TPU_DISPATCH_THREADS", "4")
    # disable cohorts so every search rides the threaded per-op path
    monkeypatch.setenv("PTQ4VIT_TPU_MATMUL_COHORT", "0")
    q = HessianQuantCalibrator(net, cfg, calib_x, batch_size=4) \
        .batching_quant_calib(verbose=False)
    assert set(ref) == set(q)
    for n in ref:
        for a, b in zip(jax.tree.leaves(ref[n]), jax.tree.leaves(q[n])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_dtype_defaults(net, calib_x, monkeypatch):
    """cache_dtype resolution: fp32 on the CPU backend (exact parity),
    "auto" forces bf16, and PTQ4VIT_TPU_CACHE_DTYPE overrides both ways."""
    import jax.numpy as jnp
    cfg = small_cfg(ptq4vit())
    mk = lambda **kw: HessianQuantCalibrator(net, cfg, calib_x, **kw)
    assert mk().cache_dtype is None                     # cpu backend default
    assert mk(cache_dtype="auto").cache_dtype is None   # same rule
    assert mk(cache_dtype="float32").cache_dtype is None
    assert mk(cache_dtype=jnp.bfloat16).cache_dtype == jnp.bfloat16
    monkeypatch.setenv("PTQ4VIT_TPU_CACHE_DTYPE", "bfloat16")
    assert mk().cache_dtype == jnp.bfloat16             # env overrides
    monkeypatch.setenv("PTQ4VIT_TPU_CACHE_DTYPE", "float32")
    assert mk(cache_dtype=jnp.bfloat16).cache_dtype is None


def test_swin_pipeline_end_to_end(rng):
    """Tiny Swin through the full PTQ4ViT pipeline: window-attention
    matmuls get head-wise scales, patch-merging reduction is calibrated."""
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from ptq4vit_tpu.models import swin as swin_mod
    cfg = swin_mod.SwinConfig(name="test_swin", img_size=32, patch_size=2,
                              embed_dim=12, depths=(2, 2), num_heads=(2, 4),
                              window_size=4, num_classes=7)
    params = swin_mod.init_params(jax.random.PRNGKey(1), cfg)
    net = Net(name=cfg.name, cfg=cfg, params=params,
              forward=swin_mod.forward,
              op_inventory=swin_mod.op_inventory(cfg),
              op_shapes=swin_mod.op_shapes(cfg),
              data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4) \
        .batching_quant_calib(verbose=False)
    assert set(qstate) == {n for n, _ in net.op_inventory}
    # head-wise matmul scales per stage
    assert qstate["layers.0.blocks.0.attn.matmul1"].A_interval.shape == \
        (1, 2, 1, 1, 1, 1, 1)
    assert qstate["layers.1.blocks.0.attn.matmul1"].A_interval.shape == \
        (1, 4, 1, 1, 1, 1, 1)
    assert qstate["layers.0.downsample.reduction"].w_interval.shape == \
        (1, 1, 1, 1)
    # quantized + int8 forwards run
    x = jnp.asarray(calib[:2])
    fake = np.asarray(net.apply(x, qstate=qstate))
    i8 = np.asarray(net.apply(x, qstate=qstate, int8=True))
    np.testing.assert_allclose(i8, fake, rtol=2e-3, atol=2e-3)
