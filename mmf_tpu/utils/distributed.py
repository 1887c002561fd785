"""Distributed primitives over JAX processes + XLA collectives.

Keeps the reference's API surface (mmf/utils/distributed.py) so trainer
code stays backend-agnostic: is_main / get_rank / get_world_size /
synchronize / broadcast_scalar / gather_tensor / reduce_dict / object
codecs. Implementation notes:
  - "rank"/"world size" are PROCESS (host) granularity; device-level
    parallelism lives inside jit via GSPMD, so most reference collectives
    collapse to multihost_utils calls or no-ops in single-process runs.
  - Inside-jit collectives (psum/all_gather over the mesh) do not live
    here; they are emitted by XLA from shardings.
"""

from __future__ import annotations

import logging
import os
import pickle
import warnings
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

MAX_SIZE_LIMIT = 65533
BYTE_SIZE = 256


def _jax():
    import jax

    return jax


def is_dist_initialized() -> bool:
    return get_world_size() > 1


def get_rank() -> int:
    try:
        return _jax().process_index()
    except Exception:
        return 0


def get_world_size() -> int:
    try:
        return _jax().process_count()
    except Exception:
        return 1


def is_main(local: bool = False) -> bool:
    return get_rank() == 0


def is_xla() -> bool:
    """Kept for API parity: true when running on TPU."""
    try:
        return _jax().devices()[0].platform == "tpu"
    except Exception:
        return False


def synchronize(message: str = "sync-workers"):
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(message)


def broadcast_scalar(scalar, src: int = 0, device=None):
    """Broadcast a host scalar from process 0 (used for dataset-choice sync
    in multi-dataset training, reference distributed.py:145-157)."""
    if get_world_size() == 1:
        return scalar
    from jax.experimental import multihost_utils

    arr = np.asarray([scalar])
    out = multihost_utils.broadcast_one_to_all(arr)
    return out.item()


def broadcast_tensor(tensor, src: int = 0):
    if get_world_size() == 1:
        return tensor
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(np.asarray(tensor))


def gather_tensor(tensor) -> np.ndarray:
    """All-gather host arrays across processes with a new leading axis
    (reference distributed.py:167-216)."""
    arr = np.asarray(tensor)
    if get_world_size() == 1:
        return arr[None]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(arr)
    return gathered


def gather_tensor_along_batch(tensor) -> np.ndarray:
    """Concatenate along batch across processes."""
    arr = np.asarray(tensor)
    if get_world_size() == 1:
        return arr
    g = gather_tensor(arr)
    return g.reshape((-1,) + arr.shape[1:])


def reduce_dict(dictionary: Dict[str, Any]) -> Dict[str, Any]:
    """Mean-reduce scalar dict values across processes
    (reference distributed.py:219-242). Values produced by the jitted SPMD
    step are already globally reduced, so in the common path this is a
    numpy passthrough."""
    world_size = get_world_size()
    if world_size < 2:
        return {k: np.asarray(v) for k, v in dictionary.items()}
    from jax.experimental import multihost_utils

    keys = sorted(dictionary.keys())
    values = np.asarray([float(np.mean(dictionary[k])) for k in keys])
    summed = multihost_utils.process_allgather(values).sum(axis=0)
    return {k: summed[i] / world_size for i, k in enumerate(keys)}


# ---------------------------------------------------------------------------
# object <-> byte-tensor codec (reference distributed.py:245-274): used to
# ship strings (OCR tokens, answers) through fixed-shape arrays so they can
# ride SampleList batches.
# ---------------------------------------------------------------------------
def object_to_byte_tensor(obj: Any, max_size: int = 4094) -> np.ndarray:
    assert max_size <= MAX_SIZE_LIMIT
    byte_arr = pickle.dumps(obj)
    obj_size = len(byte_arr)
    if obj_size > max_size:
        raise Exception(
            f"objects too large: object size {obj_size}, max size {max_size}"
        )
    byte_tensor = np.zeros(max_size, dtype=np.uint8)
    byte_tensor[:obj_size] = np.frombuffer(byte_arr, dtype=np.uint8)
    byte_tensor = np.concatenate(
        [
            np.asarray(
                [obj_size // BYTE_SIZE, obj_size % BYTE_SIZE], dtype=np.uint8
            ),
            byte_tensor,
        ]
    )
    return byte_tensor


def byte_tensor_to_object(byte_tensor: np.ndarray, max_size: int = 4094) -> Any:
    assert byte_tensor.ndim == 1 and byte_tensor.shape[0] <= max_size + 2
    byte_tensor = np.asarray(byte_tensor, dtype=np.uint8)
    obj_size = int(byte_tensor[0]) * BYTE_SIZE + int(byte_tensor[1])
    byte_arr = byte_tensor[2 : 2 + obj_size].tobytes()
    return pickle.loads(byte_arr)


# ---------------------------------------------------------------------------
# init (reference distributed.py:277-390)
# ---------------------------------------------------------------------------
def infer_init_method(config):
    """SLURM / env-var autodetection for multi-host rendezvous."""
    if config["distributed"].get("init_method", None) is not None:
        return
    if all(
        key in os.environ
        for key in ["MASTER_ADDR", "MASTER_PORT", "WORLD_SIZE", "RANK"]
    ):
        config["distributed"]["init_method"] = "env://"
        config["distributed"]["world_size"] = int(os.environ["WORLD_SIZE"])
        config["distributed"]["rank"] = int(os.environ["RANK"])
        return
    node_list = os.environ.get(
        "SLURM_STEP_NODELIST", os.environ.get("SLURM_JOB_NODELIST")
    )
    if node_list is not None:
        try:
            import subprocess

            hostnames = subprocess.check_output(
                ["scontrol", "show", "hostnames", node_list]
            )
            host = hostnames.split()[0].decode("utf-8")
            port = config["distributed"].get("port", -1)
            config["distributed"]["init_method"] = f"tcp://{host}:{port}"
            nnodes = int(os.environ.get("SLURM_NNODES", 1))
            config["distributed"]["world_size"] = nnodes
            config["distributed"]["rank"] = int(
                os.environ.get("SLURM_NODEID", 0)
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            pass


def distributed_init(config):
    """Initialize multi-host JAX. Single host: no-op (SPMD inside jit
    handles local devices; no process spawn needed, unlike the reference)."""
    import jax

    init_method = config["distributed"].get("init_method", None)
    world_size = config["distributed"].get("world_size", 1) or 1
    if init_method is None or world_size <= 1:
        return 0

    coordinator = init_method.replace("tcp://", "").replace("env://", "")
    if not coordinator and "MASTER_ADDR" in os.environ:
        coordinator = (
            f"{os.environ['MASTER_ADDR']}:{os.environ['MASTER_PORT']}"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator or None,
        num_processes=world_size,
        process_id=config["distributed"].get("rank", 0),
    )
    logger.info(
        f"Initialized host {get_rank()} of {get_world_size()} "
        f"({jax.local_device_count()} local / {jax.device_count()} global devices)"
    )
    if is_main():
        logger.info(f"Initialized coordinator: {coordinator}")
    return get_rank()


def suppress_output(is_main_proc: bool):
    """Mute print/warnings on non-main processes
    (reference distributed.py:393-430)."""
    if is_main_proc:
        return
    import builtins

    builtin_print = builtins.print

    def print_(*args, **kwargs):
        if kwargs.pop("force", False):
            builtin_print(*args, **kwargs)

    builtins.print = print_

    builtin_warn = warnings.warn

    def warn(*args, **kwargs):
        if kwargs.pop("force", False):
            builtin_warn(*args, **kwargs)

    warnings.warn = warn
