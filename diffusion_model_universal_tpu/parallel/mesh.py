"""Device mesh construction + sharding rules.

The TPU-native replacement for the reference's distributed stack
(`scripts/train.py:48-67` NCCL process-group setup,
`trainers/ddpm_trainer.py:129-136` DDP wrap,
`datasets/dataset_utils.py:138-157` DistributedSampler): a
`jax.sharding.Mesh` over all devices with named axes, NamedShardings for
batch (data-parallel) and parameter (FSDP-style) placement, and XLA
collectives inserted by the compiler. There is no backend code to write —
ICI/DCN collectives are emitted by XLA from the sharding annotations.

Axes:
    "data"    — batch axis (DP). The reference implements exactly this one
                strategy (SURVEY.md §2.8).
    "spatial" — image-height axis (SP): the image-domain analogue of
                sequence/context parallelism. Activations are sharded over
                H via logical-axis constraints in the UNet; XLA inserts the
                halo exchanges (collective-permutes) that 3×3 convs need at
                shard edges. Useful when images are large enough that one
                image's activations dominate HBM (e.g. big-image sampling).
    "model"   — parameter/tensor axis. The reference has no TP/FSDP; we
                expose the axis so large configs can shard parameters
                (FSDP-style sharding of the largest weight dimension) AND
                shard activation channels (true tensor parallelism via the
                "embed" logical axis) — a capability superset that costs
                nothing at mesh size 1.

Tensor/spatial parallelism is driven by *logical axis rules*
(:data:`LOGICAL_AXIS_RULES`): the UNet annotates activations with logical
names ("batch", "height", "embed"); under :func:`activation_sharding_scope`
those resolve to mesh axes and XLA's SPMD partitioner inserts the
collectives. With no scope active the annotations are no-ops, so the
single-chip path compiles to the identical program.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"

# logical activation axis → mesh axis. "width" is deliberately unmapped
# (one sharded spatial dim is enough; two would square the halo traffic).
LOGICAL_AXIS_RULES = (
    ("batch", DATA_AXIS),
    ("height", SPATIAL_AXIS),
    ("embed", MODEL_AXIS),
)


def make_mesh(devices: Optional[Sequence[Any]] = None,
              data_parallel: Optional[int] = None,
              model_parallel: int = 1,
              spatial_parallel: int = 1) -> Mesh:
    """Build a 3-D ("data", "spatial", "model") mesh over the devices.

    Defaults to all devices on the data axis — the DP layout matching the
    reference's one-process-per-GPU DDP (`scripts/train.py:225-232`).
    ``model_parallel``/``spatial_parallel`` carve devices off for tensor /
    spatial parallelism (see module docstring).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // (model_parallel * spatial_parallel)
    if data_parallel * model_parallel * spatial_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{spatial_parallel}x{model_parallel} "
            f"!= {n} devices")
    arr = np.asarray(devices).reshape(
        data_parallel, spatial_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS))


def local_devices(limit: Optional[int] = None):
    """``jax.devices()``, optionally restricted to the first ``limit``
    (the ``--num_devices`` CLI contract shared by train/generate/serve)."""
    devices = jax.devices()
    return devices[:limit] if limit else devices


def uses_activation_sharding(mesh: Mesh) -> bool:
    """True when the mesh actually shards activations (TP/SP axes > 1)."""
    return (mesh.shape.get(MODEL_AXIS, 1) > 1
            or mesh.shape.get(SPATIAL_AXIS, 1) > 1)


@contextlib.contextmanager
def _rules_scope(mesh: Mesh):
    """Resolve the model's logical activation annotations against
    ``mesh``: flax ``logical_axis_rules`` + the concrete mesh for
    spec-form ``with_sharding_constraint``."""
    import flax.linen as nn
    with jax.sharding.set_mesh(mesh):
        with nn.logical_axis_rules(LOGICAL_AXIS_RULES):
            yield


def sampling_scope(mesh: Optional[Mesh]):
    """Scope that distributes the jitted samplers over ``mesh``.

    Samplers take (params, key) — there is no host batch to shard, so
    unlike the train step the batch axis must come from the UNet's
    "batch" logical annotation. Active whenever the mesh has more than
    one device: pure-DP sample generation (the 50k-image benchmark
    harness) parallelizes over "data" exactly like the reference's
    per-rank generation loop would, and TP/SP axes apply as in training.

    Callers are rank-0-gated code paths (sample grids, the benchmark
    harness, the generate CLI — reference gates them on rank 0,
    `ddpm_trainer.py:792-848`). Under multi-host the scope therefore
    uses the PROCESS-LOCAL submesh: a single process launching a
    global-mesh computation would hang waiting for hosts that never
    dispatch it.
    """
    if mesh is not None and jax.process_count() > 1:
        mesh = mesh.local_mesh
    if mesh is None or mesh.size <= 1:
        return contextlib.nullcontext()
    return _rules_scope(mesh)


def activation_sharding_scope(mesh: Mesh):
    """Scope for the jitted train/eval steps when
    :func:`uses_activation_sharding` (TP/SP axes > 1) — a no-op
    otherwise. Wrap BOTH trace and dispatch in it."""
    if not uses_activation_sharding(mesh):
        return contextlib.nullcontext()
    return _rules_scope(mesh)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis — the pjit
    equivalent of DistributedSampler + DDP gradient all-reduce."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_replicated(mesh: Optional[Mesh], tree: Any) -> Any:
    """Place every leaf of ``tree`` replicated on the (process-local)
    mesh — the required input placement for :func:`sampling_scope`.

    A jit launched under the sampling mesh with inputs still committed
    to one device (a PRNGKey or params created OUTSIDE the scope) makes
    GSPMD choose partial output shardings (e.g. a [2,1,1,1,4] tile for a
    batch-2 image over an 8-way data axis) that JAX cannot map back to
    NamedShardings — a compile-time ``ValueError`` whenever the batch
    does not divide the data axis. Replicating the inputs up front keeps
    every sharding mesh-formed; for already-placed leaves device_put is
    a no-op. Mirrors :func:`sampling_scope`'s local-submesh rule.
    """
    if mesh is not None and jax.process_count() > 1:
        mesh = mesh.local_mesh
    if mesh is None or mesh.size <= 1:
        return tree
    return jax.device_put(tree, NamedSharding(mesh, P()))


def param_sharding(mesh: Mesh, params: Any,
                   min_size_to_shard: int = 2 ** 16) -> Any:
    """FSDP-style parameter sharding tree.

    Each array large enough to matter is sharded along its largest dimension
    that divides the "model" axis size; everything else is replicated. With
    ``model_parallel == 1`` every leaf is replicated — identical semantics
    to the reference's DDP replication.
    """
    axis_size = mesh.shape[MODEL_AXIS]

    def shard_one(p):
        if axis_size == 1 or p.size < min_size_to_shard:
            return NamedSharding(mesh, P())
        dims = list(p.shape)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if dims[i] % axis_size == 0:
                spec = [None] * len(dims)
                spec[i] = MODEL_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(shard_one, params)


def opt_state_sharding(opt_state: Any, params: Any, p_shard: Any,
                       mesh: Mesh) -> Any:
    """Sharding tree for an Optax state: moment subtrees that mirror the
    param tree (Adam mu/nu) inherit the param shardings; every other leaf
    (step counts, EMA scalars) is replicated."""
    repl = NamedSharding(mesh, P())
    p_struct = jax.tree_util.tree_structure(params)

    def matches(x: Any) -> bool:
        try:
            return jax.tree_util.tree_structure(x) == p_struct
        except Exception:
            return False

    return jax.tree_util.tree_map(
        lambda sub: p_shard if matches(sub)
        else jax.tree_util.tree_map(lambda _: repl, sub),
        opt_state, is_leaf=matches)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with batch-axis sharding."""
    return jax.device_put(batch, batch_sharding(mesh))


def is_main_process() -> bool:
    """rank==0 gating equivalent (reference gates logging/ckpt on rank 0,
    `trainers/ddpm_trainer.py:866-867`)."""
    return jax.process_index() == 0
