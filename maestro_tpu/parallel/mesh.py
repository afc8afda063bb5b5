"""Device mesh + sharding rules (data x tensor parallel, optional FSDP).

The reference delegates all parallelism to Lightning DDP over NCCL
(/root/reference/maestro/conf/trainer.py:12-14).  TPU-native replacement:
one ``jax.sharding.Mesh`` with axes ``("data", "model")``; the batch is
sharded over "data", parameters are replicated over "data" and — when the
model axis is >1 — tensor-sharded over "model" (attention heads / MLP hidden).
All collectives (gradient psum from jit's partitioner, all-gathers for
tensor-sharded matmuls) are inserted by XLA from these shardings.

Beyond the reference, ``fsdp=True`` additionally shards every large
parameter (and, by propagation, its AdamW moments) over the "data" axis —
ZeRO-3 semantics expressed purely as NamedShardings: XLA all-gathers each
weight where it is used and reduce-scatters its gradient, no wrapper class.
Useful when optimizer state dominates HBM (e.g. large-model finetunes).

The reference's ``find_unused_parameters`` DDP workaround has no equivalent
here: frozen params are masked in the optimizer (train/optim.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
REPLICA_AXIS = "replica"  # outer pure-DP axis across pod slices (DCN)


def make_mesh(
    num_data: int = -1,
    num_model: int = 1,
    num_replica: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh; num_data=-1 uses all remaining chips.

    ``num_replica > 1`` adds an outer "replica" axis for multi-slice
    training: slices are connected over DCN (slow) while chips within a
    slice ride ICI (fast), so only pure data parallelism — one gradient
    all-reduce per step — crosses the slice boundary; tensor-parallel
    all-gathers and FSDP weight gathers stay on the intra-slice axes.
    On real multi-slice hardware the device grid is ordered so each
    mesh row is one slice (via ``mesh_utils.create_hybrid_device_mesh``);
    on virtual/CPU devices a plain reshape stands in.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if num_data == -1:
        per_replica = n // num_replica
        if n % num_replica or per_replica % num_model:
            msg = (
                f"{n} devices not divisible into {num_replica} replicas "
                f"x model axis {num_model}."
            )
            raise ValueError(msg)
        num_data = per_replica // num_model
    need = num_replica * num_data * num_model
    if n < need:
        msg = (
            f"mesh ({num_replica} replica x {num_data} data x {num_model} "
            f"model) needs {need} devices but only {n} are available "
            f"({[str(d) for d in devices.ravel()]}). On a single-chip or "
            "CPU host, force virtual devices via "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N and "
            'jax.config.update("jax_platforms", "cpu") before backend init.'
        )
        raise ValueError(msg)
    if num_replica == 1:
        devices = devices[:need].reshape(num_data, num_model)
        return Mesh(devices, (DATA_AXIS, MODEL_AXIS))
    flat = devices.ravel()[:need]
    if len({getattr(d, "slice_index", 0) for d in flat}) == num_replica:
        # real multi-slice topology: let JAX order the grid so the replica
        # axis maps onto DCN and (data, model) stay within each slice
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, num_data, num_model),
            (num_replica, 1, 1),
            devices=flat,
        ).reshape(num_replica, num_data, num_model)
    else:
        grid = flat.reshape(num_replica, num_data, num_model)
    return Mesh(grid, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh):
    """Mesh axes the batch dim is sharded over (replica-major when present)."""
    if REPLICA_AXIS in mesh.axis_names:
        return (REPLICA_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def num_batch_shards(mesh: Mesh) -> int:
    """Total data-parallel ways (replica slices x intra-slice data axis)."""
    n = mesh.shape[DATA_AXIS]
    if REPLICA_AXIS in mesh.axis_names:
        n *= mesh.shape[REPLICA_AXIS]
    return n


# --------------------------------------------------------------------------
# parameter partition rules (tensor parallelism over the "model" axis)
# --------------------------------------------------------------------------
def _param_spec(path: tuple, value, tp: bool) -> P:
    """PartitionSpec for one parameter by its tree path.

    TP layout (Megatron-style column/row split per block):
      qkv / fc1 kernels: split output features -> P(None, "model")
      qkv / fc1 biases:  split with their kernel -> P("model")
      out / fc2 kernels: split input features  -> P("model", None)
    Everything else (norms, embeds, biases of row-split layers) replicated.
    """
    if not tp:
        return P()
    keys = [str(getattr(k, "key", k)) for k in path]
    joined = "/".join(keys)
    if value.ndim < 2:
        if joined.endswith(("qkv/bias", "fc1/bias", "to_kv/bias")):
            return P(MODEL_AXIS)
        return P()
    if joined.endswith("qkv/kernel") or joined.endswith("fc1/kernel"):
        return P(None, MODEL_AXIS)
    if joined.endswith("out/kernel") or joined.endswith("fc2/kernel"):
        return P(MODEL_AXIS, None)
    if "to_kv/kernel" in joined:
        return P(None, MODEL_AXIS)
    return P()


# parameters smaller than this stay replicated under fsdp: sharding tiny
# tensors (norm scales, biases) buys nothing and forces sub-lane layouts
FSDP_MIN_SIZE = 2**16


def _with_fsdp(spec: P, value, num_data: int, min_size: int) -> P:
    """Add a "data"-axis shard on the largest free dim (ZeRO-3 weights).

    A dim already taken by TP is skipped; the dim must divide evenly so
    shapes stay static.
    """
    if value.ndim < 2 or value.size < min_size:
        return spec
    dims = list(spec) + [None] * (value.ndim - len(spec))
    free = [
        (value.shape[i], i)
        for i in range(value.ndim)
        if dims[i] is None and value.shape[i] % num_data == 0
    ]
    if not free:
        return spec
    _, best = max(free)
    dims[best] = DATA_AXIS
    return P(*dims)


def param_shardings(
    mesh: Mesh,
    params,
    tensor_parallel: bool | None = None,
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
):
    """NamedSharding pytree for the params (TP iff the model axis is >1)."""
    if tensor_parallel is None:
        tensor_parallel = mesh.shape[MODEL_AXIS] > 1
    num_data = mesh.shape[DATA_AXIS]

    def one(path, v):
        spec = _param_spec(path, v, tensor_parallel)
        if fsdp and num_data > 1:
            spec = _with_fsdp(spec, v, num_data, fsdp_min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_shardings(mesh: Mesh, batch):
    """Shard every batch leaf over the data axes (leading dim)."""
    axes = batch_axes(mesh)
    return jax.tree.map(
        lambda v: NamedSharding(mesh, P(axes, *(None,) * (v.ndim - 1))),
        batch,
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(
    mesh: Mesh,
    params,
    tensor_parallel: bool | None = None,
    fsdp: bool = False,
    fsdp_min_size: int = FSDP_MIN_SIZE,
):
    return jax.device_put(
        params,
        param_shardings(mesh, params, tensor_parallel, fsdp=fsdp,
                        fsdp_min_size=fsdp_min_size),
    )


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_shardings(mesh, batch))
