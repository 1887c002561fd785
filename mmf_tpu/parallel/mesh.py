"""Device-mesh construction and sharding rules.

This replaces the reference's entire process-spawn + DDP/NCCL stack
(mmf_cli/run.py:100-130, trainers/core/device.py:75-113): one process per
host, a global ``Mesh`` with ``data`` and ``model`` axes, GSPMD shardings
on batch/params/optimizer pytrees, and XLA-inserted collectives over ICI.

Default layout (capability parity with MMF, which is data-parallel only):
  - batch: sharded along ``data``
  - params: replicated
  - optimizer state: replicated, or sharded along ``data`` when
    ``optimizer.enable_state_sharding`` (the ZeRO analog of fairscale OSS,
    reference utils/build.py:432-450)
The ``model`` axis exists from day one so tensor-parallel shardings can be
annotated on supporting modules without restructuring.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_GLOBAL_MESH: Optional[Mesh] = None


def build_mesh(config=None, devices=None) -> Mesh:
    """Build the global device mesh from ``distributed.mesh`` config."""
    global _GLOBAL_MESH
    if devices is None:
        devices = jax.devices()
    n = len(devices)

    data_size, model_size = -1, 1
    if config is not None:
        mesh_cfg = config.get("distributed", {}).get("mesh", {}) or {}
        data_size = mesh_cfg.get("data", -1)
        model_size = mesh_cfg.get("model", 1)
    if model_size in (-1, None):
        model_size = 1
    if data_size in (-1, None):
        data_size = n // model_size
    assert data_size * model_size == n, (
        f"mesh {data_size}x{model_size} != {n} devices"
    )
    mesh = Mesh(
        np.asarray(devices).reshape(data_size, model_size), ("data", "model")
    )
    _GLOBAL_MESH = mesh
    return mesh


def get_mesh() -> Mesh:
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = build_mesh()
    return _GLOBAL_MESH


def set_mesh(mesh: Mesh):
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def batch_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Leading batch axis split across the data axis."""
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or get_mesh()
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Optional[Mesh] = None) -> Any:
    """Place a host-local batch pytree onto the mesh, sharded along data.

    Single-process: a plain device_put with a sharding. Multi-host: each
    process contributes its local shard via
    ``make_array_from_process_local_data``.
    """
    mesh = mesh or get_mesh()
    sharding = batch_sharding(mesh)

    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)

    def place(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(place, batch)


def shard_params(params: Any, mesh: Optional[Mesh] = None) -> Any:
    """Replicate model parameters across the mesh."""
    mesh = mesh or get_mesh()
    return jax.device_put(params, replicated_sharding(mesh))


def opt_state_sharding_tree(opt_state: Any, enable_state_sharding: bool,
                            mesh: Optional[Mesh] = None) -> Any:
    """Sharding pytree for optimizer state: ZeRO-style along ``data`` when
    enabled (first axis of each moment tensor, if divisible), else
    replicated."""
    mesh = mesh or get_mesh()
    repl = replicated_sharding(mesh)
    if not enable_state_sharding:
        return jax.tree_util.tree_map(lambda _: repl, opt_state)

    dp = mesh.shape["data"]
    sharded = NamedSharding(mesh, P("data"))

    def rule(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] % dp == 0 \
                and leaf.shape[0] >= dp:
            return sharded
        return repl

    return jax.tree_util.tree_map(rule, opt_state)


def local_batch_to_global(batch_size: int) -> int:
    return batch_size * jax.process_count()


# ---------------------------------------------------------------------------
# tensor parallelism: Megatron-style sharding rules over the 'model' axis
# ---------------------------------------------------------------------------
# Column-parallel kernels (output dim sharded): attention q/k/v, FFN up.
# Row-parallel kernels (input dim sharded): attention output, FFN down.
# Embedding tables shard the vocab dim. GSPMD propagates activation
# shardings from these and inserts the all-reduces after row-parallel
# matmuls — annotations are hints, semantics stay exact at any mesh shape.
_COLUMN_PARALLEL = ("query", "key", "value", "intermediate_dense")
_ROW_PARALLEL = ("output_dense",)
_VOCAB_PARALLEL = ("word_embeddings", "decoder")
# Expert parallelism: stacked expert weights [E, d, f] / [E, f, d] in
# modules/moe.py shard their expert axis; GSPMD inserts the dispatch/
# combine all-to-alls. Router weights stay replicated.
_EXPERT_PARALLEL = ("moe_ffn",)


def _path_names(path) -> tuple:
    names = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "name", None)
        if key is not None:
            names.append(str(key))
    return tuple(names)


def param_sharding_tree(params: Any, mesh: Optional[Mesh] = None) -> Any:
    """Per-leaf NamedSharding pytree for tensor-parallel parameter
    placement. With a size-1 ``model`` axis every rule degenerates to
    replicated, so the data-parallel default is unchanged."""
    mesh = mesh or get_mesh()
    tp = mesh.shape.get("model", 1)
    repl = replicated_sharding(mesh)

    def rule(path, leaf):
        if tp == 1 or not hasattr(leaf, "shape"):
            return repl
        names = _path_names(path)
        if not names:
            return repl
        leaf_name = names[-1]
        module = names[-2] if len(names) >= 2 else ""
        if leaf_name == "kernel" and leaf.ndim == 2:
            if module in _COLUMN_PARALLEL and leaf.shape[1] % tp == 0:
                return NamedSharding(mesh, P(None, "model"))
            if module in _ROW_PARALLEL and leaf.shape[0] % tp == 0:
                return NamedSharding(mesh, P("model", None))
        if leaf_name == "bias" and module in _COLUMN_PARALLEL \
                and leaf.ndim == 1 and leaf.shape[0] % tp == 0:
            return NamedSharding(mesh, P("model"))
        if leaf_name == "embedding" and module in _VOCAB_PARALLEL \
                and leaf.ndim == 2 and leaf.shape[0] % tp == 0:
            return NamedSharding(mesh, P("model", None))
        if leaf_name in ("wi", "wo") and leaf.ndim == 3 \
                and any(m in _EXPERT_PARALLEL for m in names) \
                and leaf.shape[0] % tp == 0:
            return NamedSharding(mesh, P("model", None, None))
        return repl

    return jax.tree_util.tree_map_with_path(rule, params)


def place_params(params: Any, mesh: Optional[Mesh] = None) -> Any:
    """Put parameters on the mesh under the tensor-parallel rules
    (replicated when the model axis is 1)."""
    mesh = mesh or get_mesh()
    return jax.device_put(params, param_sharding_tree(params, mesh))
