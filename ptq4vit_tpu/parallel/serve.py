"""Mesh-parallel fused int8 serving.

The single-chip serving fast path (`int8="fused"`, ops/int8_serve.py) is
built from Pallas kernels, which XLA's GSPMD partitioner cannot split
automatically the way it splits plain jitted ops (the Evaluator path).
Scaling fused serving across chips is therefore expressed with
``shard_map``: the batch shards over the mesh's "data" axis and every
device runs the whole fused forward on its shard — pure data parallelism,
zero cross-device communication inside the forward, so throughput scales
linearly with chips on ICI.

The reference has no serving engine at all (it only simulates quantization
with fp32 fake-quant, quant_layers/linear.py:62-67); both the kernels and
this scaling wrapper are upgrades on top of reproducing its semantics.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import replicate, shard_batch


class ServingEngine:
    """Batched quantized inference: packed int8 weights, fused kernels,
    optional data-parallel mesh.

    net:     models.registry.Net
    qstate:  calibrated quantization state
    mesh:    optional Mesh with a "data" axis; weights/qstate replicate,
             the batch shards
    compute_dtype: activation dtype for the float segments (bf16 default)
    relaxed: run the fused kernels' VPU epilogues (softmax/SoS, GELU,
             requant rounding) in bfloat16 — the serving ceiling is
             VPU-bound (BENCH_NOTES roofline), and this trades exact
             fake-quant equality (levels can shift one int8 step) for
             throughput.  Off by default; opt-in for deployments that
             accept the divergence.
    """

    def __init__(self, net, qstate: Dict[str, Any],
                 mesh: Optional[Mesh] = None, compute_dtype=jnp.bfloat16,
                 relaxed: bool = False, raw_uint8: bool = False):
        from ..ops.pack import pack_weights
        import numpy as np
        self.net = net
        self.mesh = mesh
        packed = pack_weights(net.params, qstate)
        params = net.params
        mode = "fused_relaxed" if relaxed else "fused"
        # raw_uint8: accept (B, 3, H, W) uint8 and normalize ON DEVICE with
        # the model's data_config — host->device traffic drops 4x, which is
        # the end-to-end serving bottleneck whenever the ingest link is
        # slower than ~{device img/s} x {img bytes} (this sandbox's
        # tunneled H2D of ~75 MB/s caps f32 ViT-B/384 ingest at ~42 img/s
        # vs the 715 img/s device rate; uint8 lifts the cap 4x)
        if raw_uint8:
            dc = net.data_config
            mean = np.asarray(dc.mean, np.float32).reshape(1, 3, 1, 1)
            std = np.asarray(dc.std, np.float32).reshape(1, 3, 1, 1)

        def fwd(p, pk, x):
            if raw_uint8:
                x = (x.astype(jnp.float32) / 255.0 - mean) / std
            return net.forward(p, x, net.cfg, qstate=qstate, int8=mode,
                               packed=pk, compute_dtype=compute_dtype)

        if mesh is None:
            self._params, self._packed = params, packed
            self._step = jax.jit(fwd)
        else:
            self._params = replicate(params, mesh)
            self._packed = replicate(packed, mesh)
            self._step = jax.jit(jax.shard_map(
                fwd, mesh=mesh,
                in_specs=(P(), P(), P("data")), out_specs=P("data"),
                check_vma=False))

    def __call__(self, x) -> jax.Array:
        """x: (B, 3, H, W) -> (B, num_classes) logits.  With a mesh, B must
        divide by the data axis (pad upstream if needed)."""
        if self.mesh is not None:
            x = shard_batch(jnp.asarray(x), self.mesh)
        return self._step(self._params, self._packed, jnp.asarray(x))
