"""Mesh/sharding tests on the virtual 8-device CPU mesh: DP eval parity,
TP weight sharding parity, sharded capture."""
import jax
import jax.numpy as jnp
import numpy as np

from ptq4vit_tpu.parallel import Evaluator, make_mesh
from tests.test_capture import tiny_net


def test_mesh_shapes():
    m = make_mesh(8)
    assert m.shape == {"data": 8, "model": 1}
    m2 = make_mesh(8, model_parallel=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_dp_eval_matches_single_device(rng):
    net = tiny_net()
    x = rng.standard_normal((16, 3, 32, 32)).astype(np.float32)
    y = rng.integers(0, 10, 16).astype(np.int64)
    single = Evaluator(net).n_correct(jnp.asarray(x), jnp.asarray(y))
    mesh = make_mesh(8)
    multi = Evaluator(net, mesh=mesh).n_correct(x, y)
    assert single == multi


def test_dp_eval_with_padding(rng):
    net = tiny_net()
    # 13 samples over 8 devices -> padded; padded labels -1 never match
    x = rng.standard_normal((13, 3, 32, 32)).astype(np.float32)
    y = rng.integers(0, 10, 13).astype(np.int64)
    single = Evaluator(net).n_correct(jnp.asarray(x), jnp.asarray(y))
    multi = Evaluator(net, mesh=make_mesh(8)).n_correct(x, y)
    assert single == multi


def test_tp_eval_matches_single_device(rng):
    net = tiny_net()
    x = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    y = rng.integers(0, 10, 8).astype(np.int64)
    single = Evaluator(net).n_correct(jnp.asarray(x), jnp.asarray(y))
    mesh = make_mesh(8, model_parallel=2)
    multi = Evaluator(net, mesh=mesh, tensor_parallel=True).n_correct(x, y)
    assert single == multi


def test_sharded_capture_matches_host(rng):
    """Capture with inputs sharded across the mesh equals host capture."""
    from ptq4vit_tpu.calib.capture import capture
    net = tiny_net()
    x = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    raw_host = capture(net, x, batch_size=8, need_grad=True)
    # same capture but sharding the micro-batch over devices
    mesh = make_mesh(8)
    params = jax.device_put(
        net.params, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
    net2 = type(net)(**{**net.__dict__, "params": params})
    raw_mesh = capture(net2, x, batch_size=8, need_grad=True)
    g1 = raw_host["blocks.0.attn.qkv"].grad
    g2 = raw_mesh["blocks.0.attn.qkv"].grad
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-7)


def test_mesh_calibration_matches_single_device(rng):
    """Full batching_quant_calib over an 8-device data mesh produces the
    same qstate as single-device calibration.  Tolerance: XLA tiles the
    per-shard contractions differently, so captured activations (and hence
    interval inits) can shift by ~1 ulp; a wrong argmax/psum would show up
    as a full grid step (~12%), far above rtol."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from tests.test_calibrator import small_cfg
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    q_single = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                      batch_size=8) \
        .batching_quant_calib(verbose=False)
    q_mesh = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=8, mesh=make_mesh(8)) \
        .batching_quant_calib(verbose=False)
    assert set(q_single) == set(q_mesh)
    for n in q_single:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, err_msg=n),
            q_single[n], q_mesh[n])


def test_mesh_cohort_matches_cohort_off(rng, monkeypatch):
    """Mesh calibration with the vmapped same-shape matmul cohorts must
    equal the mesh per-op path (the cohort optimization previously fell
    back under mesh; now it composes with data sharding)."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from tests.test_calibrator import small_cfg
    net = tiny_net()
    mesh = make_mesh(8)
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    q_cohort = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                      batch_size=8, mesh=mesh) \
        .batching_quant_calib(verbose=False)
    monkeypatch.setenv("PTQ4VIT_TPU_MATMUL_COHORT", "0")
    q_per_op = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                      batch_size=8, mesh=mesh) \
        .batching_quant_calib(verbose=False)
    for n in q_per_op:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, err_msg=n),
            q_cohort[n], q_per_op[n])


def test_mesh_calibration_quantized_eval(rng):
    """Mesh-calibrated qstate drives a mesh-sharded quantized eval."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import base_ptq
    from tests.test_calibrator import small_cfg
    net = tiny_net()
    mesh = make_mesh(8)
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(base_ptq()), calib,
                                    batch_size=4, mesh=mesh) \
        .batching_quant_calib(verbose=False)
    x = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    y = rng.integers(0, 10, 8).astype(np.int64)
    qhost = jax.device_get(qstate)
    single = Evaluator(net, qstate=qhost).n_correct(jnp.asarray(x),
                                                    jnp.asarray(y))
    multi = Evaluator(net, qstate=qhost, mesh=mesh).n_correct(x, y)
    assert single == multi


def test_uint8_device_normalize_eval(rng):
    """uint8 inputs + on-device normalization match host-normalized eval."""
    from ptq4vit_tpu.models.registry import DataConfig
    net = tiny_net()
    dc = DataConfig(32, 1.0, (0.5, 0.4, 0.3), (0.2, 0.25, 0.3))
    u8 = rng.integers(0, 256, (6, 3, 32, 32)).astype(np.uint8)
    mean = np.asarray(dc.mean, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(dc.std, np.float32).reshape(1, 3, 1, 1)
    xf = (u8.astype(np.float32) / 255.0 - mean) / std
    y = rng.integers(0, 10, 6).astype(np.int64)
    a = Evaluator(net).n_correct(jnp.asarray(xf), jnp.asarray(y))
    b = Evaluator(net, data_config=dc).n_correct(jnp.asarray(u8),
                                                 jnp.asarray(y))
    assert a == b


def test_mesh_fused_serving_matches_single_device(rng):
    """ServingEngine: shard_map'd fused int8 serving over the data axis
    must produce the same logits as the single-device fused path."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.parallel import ServingEngine
    from tests.test_calibrator import small_cfg
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4) \
        .batching_quant_calib(verbose=False)
    x = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    single = np.asarray(
        ServingEngine(net, qstate, compute_dtype=jnp.float32)(x))
    mesh = make_mesh(8)
    multi = np.asarray(
        ServingEngine(net, qstate, mesh=mesh, compute_dtype=jnp.float32)(x))
    np.testing.assert_allclose(multi, single, rtol=1e-5,
                               atol=1e-5 * np.abs(single).max())

def test_mesh_pallas_scorers_match_single_device(rng, monkeypatch):
    """Mesh calibration with the fused Pallas scorers forced ON must match
    the single-device Pallas path: every scorer runs shard_map'd over the
    data axis with a psum of per-shard sims (search._mesh_sims).  int8
    scoring stays off so both sides use exact fp32 scorer semantics; rtol
    covers per-shard-then-psum fp32 summation order (a wrong spec/psum
    would shift intervals by a full ~12% grid step)."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from tests.test_calibrator import small_cfg
    monkeypatch.setenv("PTQ4VIT_TPU_PALLAS", "1")
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    q_single = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                      batch_size=8) \
        .batching_quant_calib(verbose=False)
    q_mesh = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=8, mesh=make_mesh(8)) \
        .batching_quant_calib(verbose=False)
    assert set(q_single) == set(q_mesh)
    for n in q_single:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, err_msg=n),
            q_single[n], q_mesh[n])


def test_mesh_swin_calibration_matches_single_device(rng):
    """Swin on the mesh (VERDICT r3 #4): full batching_quant_calib of the
    tiny windowed net (shifted windows, rel-pos bias, reduction linear,
    per-head window matmuls) over the 8-device data mesh must equal the
    single-device qstate."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from tests.test_calibrator import small_cfg
    from tests.test_pipeline_parity import tiny_swin_net
    net = tiny_swin_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    q_single = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                      batch_size=8) \
        .batching_quant_calib(verbose=False)
    q_mesh = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=8, mesh=make_mesh(8)) \
        .batching_quant_calib(verbose=False)
    assert set(q_single) == set(q_mesh)
    for n in q_single:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, err_msg=n),
            q_single[n], q_mesh[n])


def test_mesh_swin_pallas_scorers_match_single_device(rng, monkeypatch):
    """Swin window shapes through the forced-ON fused Pallas scorers under
    the mesh: exercises the head-folded dense-K dots (F>1 engages at the
    tiny window matmul shapes: Ci=6/Co=16 with G=2 heads folds F=2,
    ops/pallas_search.py:_mm_fold_factor) shard_map'd over the data axis."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.ops.pallas_search import _mm_fold_factor
    from tests.test_calibrator import small_cfg
    from tests.test_pipeline_parity import tiny_swin_net
    assert _mm_fold_factor(2, 6, 16) > 1   # the fold path really engages
    monkeypatch.setenv("PTQ4VIT_TPU_PALLAS", "1")
    net = tiny_swin_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    q_single = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                      batch_size=8) \
        .batching_quant_calib(verbose=False)
    q_mesh = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=8, mesh=make_mesh(8)) \
        .batching_quant_calib(verbose=False)
    assert set(q_single) == set(q_mesh)
    for n in q_single:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, err_msg=n),
            q_single[n], q_mesh[n])


def test_mesh_swin_window_kernels_engage(rng):
    """Swin fused serving at IN-SCOPE dims (embed 128 -> head_dim 64, so
    the window-band Pallas kernels engage instead of the generic int8
    fallback) shard_map'd over the data axis must match single-device.
    A spy on ops.int8_serve.fused_swin_block (re-imported per call in
    models/common.py, so the module attribute is live) proves the fused
    path really ran on both sides."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import swin as swin_mod
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from ptq4vit_tpu.ops import int8_serve as ser
    from ptq4vit_tpu.parallel import ServingEngine
    from tests.test_calibrator import small_cfg
    cfg = swin_mod.SwinConfig(name="mesh_swin128", img_size=32,
                              patch_size=2, embed_dim=128, depths=(2, 2),
                              num_heads=(2, 4), window_size=4,
                              num_classes=7)
    net = Net(name=cfg.name, cfg=cfg,
              params=swin_mod.init_params(jax.random.PRNGKey(3), cfg),
              forward=swin_mod.forward,
              op_inventory=swin_mod.op_inventory(cfg),
              op_shapes=swin_mod.op_shapes(cfg),
              data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))
    calib = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4) \
        .batching_quant_calib(verbose=False)
    x = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    hits = {"n": 0}
    orig = ser.fused_swin_block

    def spy(*a, **kw):
        r = orig(*a, **kw)
        hits["n"] += r is not None
        return r

    ser.fused_swin_block = spy
    try:
        single = np.asarray(
            ServingEngine(net, qstate, compute_dtype=jnp.float32)(x))
        assert hits["n"] > 0, "window-band kernels never engaged (1-dev)"
        hits["n"] = 0
        multi = np.asarray(
            ServingEngine(net, qstate, mesh=make_mesh(8),
                          compute_dtype=jnp.float32)(x))
        assert hits["n"] > 0, "window-band kernels never engaged (mesh)"
    finally:
        ser.fused_swin_block = orig
    np.testing.assert_allclose(multi, single, rtol=1e-5,
                               atol=1e-5 * np.abs(single).max())


def test_mesh_swin_fused_serving_matches_single_device(rng):
    """Swin fused int8 serving shard_map'd over the data axis must match
    single-device.  (At these tiny dims — head_dim 6 — the window-band
    kernels are out of scope and the engine takes the generic int8 path;
    test_mesh_swin_window_kernels_engage covers the in-scope kernels.)"""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.parallel import ServingEngine
    from tests.test_calibrator import small_cfg
    from tests.test_pipeline_parity import tiny_swin_net
    net = tiny_swin_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4) \
        .batching_quant_calib(verbose=False)
    x = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    single = np.asarray(
        ServingEngine(net, qstate, compute_dtype=jnp.float32)(x))
    mesh = make_mesh(8)
    multi = np.asarray(
        ServingEngine(net, qstate, mesh=mesh, compute_dtype=jnp.float32)(x))
    np.testing.assert_allclose(multi, single, rtol=1e-5,
                               atol=1e-5 * np.abs(single).max())


def test_mesh_sequential_matches_single_device(rng):
    """Sequential mode (shared compiled-once plan) on the 8-device data mesh
    produces the same qstate as single-device sequential calibration
    (VERDICT r4 #5: the plan previously required mesh=None and silently
    fell back to O(num_ops) structural captures).  The plan's padded
    tap/eps buffers keep the sample axis leading, so they shard over
    "data" like capture()'s caches."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from tests.test_calibrator import small_cfg
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    q_single = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                      batch_size=8, sequential=True) \
        .batching_quant_calib(verbose=False)
    cal = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                 batch_size=8, sequential=True,
                                 mesh=make_mesh(8))
    q_mesh = cal.batching_quant_calib(verbose=False)
    assert set(q_single) == set(q_mesh)
    for n in q_single:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, err_msg=n),
            q_single[n], q_mesh[n])


def test_pipelined_evaluate_matches_sync(rng):
    """Evaluator.evaluate's pipelined drain (dispatch ahead, read late)
    returns exactly the per-batch-synced accuracy — summation is merely
    deferred."""
    net = tiny_net()
    loader = []
    for i in range(5):
        x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
        y = rng.integers(0, 10, 4).astype(np.int64)
        loader.append((x, y))
    ev = Evaluator(net)
    assert ev.evaluate(loader, pipeline=0) == ev.evaluate(loader, pipeline=8)
    ev_mesh = Evaluator(net, mesh=make_mesh(8))
    assert ev.evaluate(loader, pipeline=0) == \
        ev_mesh.evaluate(loader, pipeline=8)


def test_serving_engine_raw_uint8(rng):
    """ServingEngine(raw_uint8=True) on uint8 NCHW equals the f32 engine on
    the host-normalized images (on-device (x/255-mean)/std, 4x less H2D)."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.parallel import ServingEngine
    from tests.test_calibrator import small_cfg
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4) \
        .batching_quant_calib(verbose=False)
    u8 = rng.integers(0, 255, (4, 3, 32, 32), dtype=np.uint8)
    dc = net.data_config
    mean = np.asarray(dc.mean, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(dc.std, np.float32).reshape(1, 3, 1, 1)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std
    a = np.asarray(ServingEngine(net, qstate, compute_dtype=jnp.float32,
                                 raw_uint8=True)(u8))
    b = np.asarray(ServingEngine(net, qstate,
                                 compute_dtype=jnp.float32)(f32))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * np.abs(b).max())
