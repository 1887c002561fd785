"""General utilities (parity with mmf/utils/general.py, JAX-flavored)."""

from __future__ import annotations

import collections.abc
import logging
import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def get_mmf_root() -> str:
    from mmf_tpu import __file__ as pkg_file

    return os.path.dirname(os.path.abspath(pkg_file))


def get_repo_root() -> str:
    return os.path.dirname(get_mmf_root())


def get_batch_size(config=None) -> int:
    """Global batch -> per-process batch division (reference general.py:284-308).

    With JAX SPMD there is one process per host; each host feeds
    global_batch / num_processes examples, sharded across its local devices
    by `make_array_from_process_local_data`.
    """
    from mmf_tpu.config.configuration import get_global_config
    import jax

    if config is None:
        config = get_global_config()
    batch_size = config.training.batch_size
    batch_size_per_device = config.training.get("batch_size_per_device", None)

    world_size = jax.process_count()
    n_devices = jax.device_count()

    if batch_size_per_device is not None:
        logger.info(
            f"batch_size_per_device: {batch_size_per_device}; global batch "
            f"= {batch_size_per_device * n_devices}"
        )
        return batch_size_per_device * (n_devices // world_size)

    if batch_size % world_size != 0:
        raise RuntimeError(
            "Batch size {} must be divisible by number of processes {}".format(
                batch_size, world_size
            )
        )
    return batch_size // world_size


def get_max_updates(config_max_updates, config_max_epochs, train_loader,
                    update_frequency):
    """Epoch <-> update conversion (reference general.py:337-368)."""
    if config_max_updates is None and config_max_epochs is None:
        raise ValueError("Neither max_updates nor max_epochs is specified.")

    if config_max_updates is not None and config_max_epochs is not None:
        logger.warning(
            "Both max_updates and max_epochs are specified. "
            f"Favoring max_epochs: {config_max_epochs}"
        )

    if config_max_epochs is not None:
        assert (
            hasattr(train_loader, "__len__") and len(train_loader) != 0
        ), "max_epochs can't be used with IterableDatasets"
        # one loader batch == one optimizer update here: update_frequency
        # splits the batch into microbatches INSIDE the jitted step
        # (train_state.py _split_microbatches), unlike the reference where
        # uf loader batches accumulate into one update (general.py:337-368)
        # — so epochs convert to updates WITHOUT dividing by uf
        del update_frequency
        max_updates = int(len(train_loader) * config_max_epochs)
        max_epochs = config_max_epochs
    else:
        max_updates = config_max_updates
        if hasattr(train_loader, "__len__") and len(train_loader) != 0:
            max_epochs = max_updates / len(train_loader)
        else:
            max_epochs = float("inf")

    return max_updates, max_epochs


def clip_gradients_config(config) -> Optional[float]:
    """Extract the max grad norm the jitted step should clip to
    (reference general.py:33-60 did the torch clipping imperatively; in JAX
    the clip is an optax transform inside the update)."""
    training = config.training
    if not training.get("clip_gradients", False):
        return None
    max_grad_l2_norm = training.get("max_grad_l2_norm", None)
    if max_grad_l2_norm is None:
        return None
    return float(max_grad_l2_norm)


def extract_loss(report_or_losses, loss_divisor: int = 1):
    """Sum all losses and divide by accumulation count
    (reference general.py:370-380)."""
    import jax.numpy as jnp

    losses = (
        report_or_losses["losses"]
        if isinstance(report_or_losses, collections.abc.Mapping)
        and "losses" in report_or_losses
        else report_or_losses
    )
    loss = sum(jnp.mean(v) for v in losses.values())
    return loss / loss_divisor


def get_current_device():
    import jax

    return jax.devices()[0]


def retry_n(n: int, fn: Callable, *args, log_tries: bool = False, **kwargs) -> Any:
    """Retry a flaky op n times (reference general.py:428-446)."""
    attempts = 0
    while attempts < n:
        try:
            return fn(*args, **kwargs)
        except Exception:
            attempts += 1
            if log_tries:
                logger.info(
                    f"{fn.__name__} failed: attempt {attempts}/{n}"
                )
            if attempts == n:
                raise
            time.sleep(min(2 ** attempts, 30))


def scalarize_dict_values(d: Dict[str, Any]) -> Dict[str, Any]:
    """Reduce any non-scalar array values to their mean
    (reference general.py:468-480)."""
    out = {}
    for key, val in d.items():
        arr = np.asarray(val)
        out[key] = float(arr.mean()) if arr.ndim > 0 else float(arr)
    return out


def get_sizes_list(dim: int, chunks: int):
    split_size = (dim + chunks - 1) // chunks
    sizes_list = [split_size] * chunks
    sizes_list[-1] = split_size - (split_size * chunks - dim)
    assert sizes_list[-1] > 0
    return sizes_list


def get_chunks(x, sizes):
    out = []
    begin = 0
    for s in sizes:
        y = x[:, begin : begin + s]
        out.append(y)
        begin += s
    return out


def updir(d: str, n: int) -> str:
    """Get the n-th parent directory."""
    dir_ = d
    for _ in range(n):
        dir_ = os.path.dirname(dir_)
    return dir_


def get_absolute_path(paths):
    from mmf_tpu.config.configuration import get_mmf_env

    if isinstance(paths, str):
        if os.path.isabs(paths):
            return paths
        possible_paths = [paths]
        data_dir = get_mmf_env(key="data_dir")
        if data_dir:
            possible_paths.append(os.path.join(data_dir, paths))
        possible_paths.append(os.path.join(get_repo_root(), paths))
        for p in possible_paths:
            if os.path.exists(p):
                return p
        return os.path.join(data_dir, paths) if data_dir else paths
    elif isinstance(paths, collections.abc.Iterable):
        return [get_absolute_path(p) for p in paths]
    else:
        raise TypeError("Paths passed to dataset should either be string or list")


def foldl(fn, xs, init):
    acc = init
    for x in xs:
        acc = fn(acc, x)
    return acc
