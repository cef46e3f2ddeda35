"""Device-mesh parallelism.

The reference's only distribution is experiment-level task parallelism over
GPUs via a multiprocessing.Queue (example/test_vit.py:47-80 in
hahnyuan/PTQ4ViT) — no collectives of any kind (SURVEY.md §2.5).  The
TPU-native design adds real SPMD:

  * ``data`` axis: calibration capture (fwd+bwd) and evaluation shard the
    sample axis; similarity/accuracy reductions become XLA-inserted psums
    over ICI (the per-batch similarity sums of linear.py:487-492 are exactly
    the reduction that rides the interconnect);
  * ``model`` axis (optional): Megatron-style column/row sharding of the
    big linear weights (qkv/fc1 column-parallel, proj/fc2 row-parallel) for
    ViT-L-class models — XLA inserts the all-reduces;
  * experiment-level parallelism stays available one process per slice
    (examples/experiment.py), matching the reference's outer loop.

Everything uses `jax.sharding.NamedSharding` + jit: annotate, let XLA place
collectives, no hand-written NCCL-style code.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def shard_batch(x, mesh: Mesh):
    """Shard the leading (sample) axis over the data axis."""
    return jax.device_put(
        x, NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1)))))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


# -- Megatron-style tensor-parallel weight layout ---------------------------
# column-parallel (shard out-features): qkv, fc1 — activations stay sharded
#   on the feature axis into the next op;
# row-parallel (shard in-features): proj, fc2 — XLA inserts the all-reduce.
_COL_SUFFIX = ("attn.qkv", "mlp.fc1")
_ROW_SUFFIX = ("attn.proj", "mlp.fc2")


def _tp_spec(path: str, shape) -> P:
    if len(shape) != 2:
        return P()
    if any(path.endswith(s + ".weight") for s in _COL_SUFFIX):
        return P("model", None)      # (out, in) sharded on out
    if any(path.endswith(s + ".weight") for s in _ROW_SUFFIX):
        return P(None, "model")      # sharded on in
    return P()


def shard_params(params: Dict[str, Any], mesh: Mesh):
    """Apply the TP layout to a param pytree (replicates everything else)."""
    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}.{i}") for i, v in enumerate(node)]
        return jax.device_put(
            node, NamedSharding(mesh, _tp_spec(path, np.shape(node))))
    return walk(params, "")


# -- sharded evaluation -----------------------------------------------------

class Evaluator:
    """Jitted (optionally quantized) classification over a mesh
    (reference test_classification, example/test_vit.py:26-45)."""

    def __init__(self, net, qstate: Optional[Dict[str, Any]] = None,
                 mesh: Optional[Mesh] = None, tensor_parallel: bool = False,
                 int8: bool = False, data_config=None):
        # data_config: normalize uint8 inputs on-device ((x/255-mean)/std) —
        # pairs with EvalTransform(raw_uint8=True) to cut H2D traffic 4x
        self.net = net
        self.qstate = qstate
        self.mesh = mesh
        params = net.params
        if mesh is not None:
            params = (shard_params(params, mesh) if tensor_parallel
                      else replicate(params, mesh))
            qstate = replicate(qstate, mesh) if qstate else qstate
        self._params = params
        self._qstate = qstate

        if data_config is not None:
            mean = np.asarray(data_config.mean, np.float32).reshape(1, 3, 1, 1)
            std = np.asarray(data_config.std, np.float32).reshape(1, 3, 1, 1)

        def step(params, qstate, x, y):
            if data_config is not None:
                x = (x.astype(jax.numpy.float32) / 255.0 - mean) / std
            logits = net.forward(params, x, net.cfg, qstate=qstate,
                                 int8=int8)
            return jax.numpy.sum(jax.numpy.argmax(logits, -1) == y)

        self._step = jax.jit(step)

    def n_correct(self, x, y) -> int:
        return int(self._n_correct_dev(x, y))

    def _n_correct_dev(self, x, y):
        """Like n_correct but returns the DEVICE scalar without syncing."""
        if self.mesh is not None:
            pad = (-len(x)) % self.mesh.shape["data"]
            if pad:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:],
                                                x.dtype)])
                y = np.concatenate([y, np.full((pad,), -1, y.dtype)])
            x = shard_batch(jax.numpy.asarray(x), self.mesh)
            y = shard_batch(jax.numpy.asarray(y), self.mesh)
        return self._step(self._params, self._qstate, x, y)

    def evaluate(self, loader, max_iteration: Optional[int] = None,
                 verbose: bool = False, pipeline: int = 8) -> float:
        """Pipelined evaluation: dispatches run ahead of result reads so
        H2D staging, compute, and the per-batch D2H scalar overlap instead
        of a full round-trip sync per batch (the difference is ~3x
        end-to-end on a high-latency link; identical numbers — summation is
        merely deferred).  ``pipeline`` bounds in-flight batches (device
        input buffers); 0 restores strict per-batch syncing."""
        pos = tot = 0
        pending = []                    # (device scalar, batch size)
        for i, (x, y) in enumerate(loader):
            pending.append((self._n_correct_dev(x, y), len(y)))
            while len(pending) > max(pipeline, 0):
                c, n = pending.pop(0)
                pos += int(c)
                tot += n
                if verbose:
                    print(f"\r[eval] {pos}/{tot} "
                          f"acc={pos / max(tot, 1):.4f}", end="", flush=True)
            if max_iteration is not None and i + 1 >= max_iteration:
                break
        for c, n in pending:
            pos += int(c)
            tot += n
            if verbose:
                print(f"\r[eval] {pos}/{tot} acc={pos / max(tot, 1):.4f}",
                      end="", flush=True)
        if verbose:
            print()
        return pos / max(tot, 1)


def test_classification(net, loader, qstate=None, mesh=None,
                        max_iteration=None, description=None) -> float:
    """Reference-compatible helper (example/test_vit.py:26-45)."""
    acc = Evaluator(net, qstate=qstate, mesh=mesh).evaluate(
        loader, max_iteration=max_iteration, verbose=description is not None)
    print(acc)
    return acc
