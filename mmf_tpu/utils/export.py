"""Ahead-of-time model export — the TPU-native analog of TorchScript.

The reference makes its flagship models TorchScript-able (scriptability
helper mmf/utils/torchscript.py:9-14; parity tests compile
`torch.jit.script(model)` and compare outputs). On JAX the deployment
artifact is an exported StableHLO module: `jax.export` serializes a
jitted forward — shapes, dtypes, shardings and all — into bytes that a
serving binary (or a later JAX process) can reload and call without the
Python model code. These helpers wrap that flow with the framework's
(variables, batch) calling convention.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
from jax import export as jax_export


def getattr_scriptable(
    dictionary: Dict[str, Any], key: str, default: Optional[Any] = None
) -> Optional[Any]:
    """Dict get that mirrors the reference helper
    (mmf/utils/torchscript.py:9-14); kept so ported model code that used
    ``getattr_torchscriptable`` has a drop-in name."""
    if key in dictionary:
        return dictionary[key]
    return default


def export_forward(fn: Callable, *example_args, platforms=None) -> bytes:
    """Serialize ``jit(fn)`` traced at ``example_args`` to portable bytes.

    ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` to produce an artifact loadable on either.
    """
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jitted, **kwargs)(*example_args)
    return exported.serialize()


def load_exported(blob: bytes) -> Callable:
    """Rehydrate an exported forward; the result is callable on arrays of
    the traced shapes/dtypes (and jittable/composable like any JAX fn)."""
    exported = jax_export.deserialize(blob)
    return exported.call


def _split_static(batch):
    """Partition a batch pytree into array leaves (traced) and static
    metadata like ``dataset_name``/``dataset_type`` strings (baked into
    the artifact) — SampleLists carry both kinds of field."""
    import numpy as np

    arrays, statics = {}, {}
    for k, v in batch.items():
        if isinstance(v, dict):
            sub_a, sub_s = _split_static(v)
            if sub_a:
                arrays[k] = sub_a
            if sub_s:
                statics[k] = sub_s
        elif isinstance(v, (jax.Array, np.ndarray)) or hasattr(v, "dtype"):
            arrays[k] = v
        else:
            statics[k] = v
    return arrays, statics


def _merge(arrays, statics):
    out = dict(arrays)
    for k, v in statics.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def export_model_forward(model, variables, example_batch, platforms=None,
                         **apply_kwargs) -> bytes:
    """Export a flax model's ``apply``: variables and the batch's array
    fields stay inputs (served weights can be swapped without re-export);
    non-array batch metadata is baked in as static."""
    batch = dict(example_batch)
    array_batch, static_batch = _split_static(batch)

    def forward(vars_, arrays):
        return model.apply(vars_, _merge(arrays, static_batch),
                           **apply_kwargs)

    return export_forward(forward, variables, array_batch,
                          platforms=platforms)
