"""Checkpointing with MMF semantics on orbax
(parity with mmf/utils/checkpoint.py).

Layout under ``env.save_dir`` (same names as the reference, each entry an
orbax directory instead of a torch file):
  - ``models/model_<update>.ckpt``   interval snapshots (max_to_keep GC)
  - ``current.ckpt``                 rolling latest (resume target)
  - ``best.ckpt``                    best-on-validation
  - ``<model>_final.pth``            final params-only export
  - ``config.yaml``                  resolved config snapshot

Checkpoint contents mirror the reference dict (checkpoint.py:543-568):
variables (params + extra collections), optimizer state, counters
(current_iteration/num_updates/current_epoch/best_*), the full resolved
config, and git metadata. Resume precedence: resume -> resume_file ->
resume_zoo -> resume_best (checkpoint.py:218-261);
``pretrained_state_mapping`` implements partial-prefix param copy
(checkpoint.py:412-421), with ``format_state_key`` model hooks.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
import subprocess
from typing import Any, Dict, Optional

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.utils.distributed import is_main, synchronize

logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _torch_to_numpy_tree(obj):
    """Convert any torch tensors in a nested checkpoint to numpy arrays."""
    try:
        import torch
    except ImportError:  # pragma: no cover - torch is baked into this image
        return obj
    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _torch_to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_torch_to_numpy_tree(v) for v in obj)
    return obj


def _restore_any(path: str):
    """Restore a checkpoint in either the native (orbax) or the PyTorch
    format.

    Zoo archives ship torch ``.pth``/``.ckpt`` files (the reference
    torch.loads them, checkpoint.py:300-310); they are detected by zip
    magic (torch>=1.6 serialization) with a pickle fallback, and returned
    as a numpy tree so the torch->flax converter can consume them."""
    import zipfile

    if os.path.isfile(path):
        if zipfile.is_zipfile(path):
            import torch

            raw = torch.load(path, map_location="cpu", weights_only=False)
            return _torch_to_numpy_tree(raw)
        try:
            return _checkpointer().restore(path)
        except Exception:
            import torch

            raw = torch.load(path, map_location="cpu", weights_only=False)
            return _torch_to_numpy_tree(raw)
    return _checkpointer().restore(path)


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}." if prefix or True else k))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat: Dict[str, Any]) -> Any:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value
    return tree


def get_git_info() -> Dict[str, str]:
    """Best-effort git metadata for reproducibility
    (reference checkpoint.py:476-496)."""
    info = {}
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        def run(args):
            return subprocess.check_output(
                args, cwd=here, stderr=subprocess.DEVNULL
            ).decode("utf-8").strip()

        info["git/branch"] = run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
        info["git/commit_hash"] = run(["git", "rev-parse", "HEAD"])
        info["git/commit_message"] = run(["git", "log", "-1", "--format=%s"])
    except Exception:
        pass
    return info


class Checkpoint:
    def __init__(self, trainer):
        self.trainer = trainer
        self.config = trainer.config
        self.save_dir = self.config["env"]["save_dir"]
        self.model_name = self.config["model"]

        self.ckpt_foldername = self.save_dir
        self.device = None

        self.ckpt_prefix = ""
        model = getattr(trainer, "model", None)
        if hasattr(model, "get_ckpt_name"):
            self.ckpt_prefix = model.get_ckpt_name() + "_"

        self.pth_filepath = os.path.join(
            self.ckpt_foldername,
            self.ckpt_prefix + self.model_name + "_final.pth",
        )
        self.models_foldername = os.path.join(self.ckpt_foldername, "models")
        if is_main():
            os.makedirs(self.models_foldername, exist_ok=True)
        synchronize()
        self.max_to_keep = self.config["checkpoint"].get("max_to_keep", -1)
        self.saved_iterations = []
        # async_save: disk writes happen on a single background thread so
        # the train loop only pays the device->host gather. Ordering is
        # preserved (one worker); loads/finalize wait for pending writes.
        self._async = self.config["checkpoint"].get("async_save", False)
        self._writer = None
        self._pending = None
        if self._async:
            from concurrent.futures import ThreadPoolExecutor

            self._writer = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer"
            )
        self.save_config()

    def wait_pending(self):
        """Block until the in-flight async write (if any) is durable."""
        if self._pending is not None:
            self._pending.result()
            self._pending = None

    def save_config(self):
        if not is_main():
            return
        cfg_file = os.path.join(self.ckpt_foldername, "config.yaml")
        with open(cfg_file, "w") as f:
            f.write(omega.to_yaml(self.config))

    # ------------------------------------------------------------------
    # load / resume
    # ------------------------------------------------------------------
    def load_state_dict(self):
        self.wait_pending()
        ckpt_config = self.config["checkpoint"]
        suffix = "current.ckpt"
        reverse_suffix = "best.ckpt"
        ckpt_filepath = os.path.join(self.ckpt_foldername, suffix)

        if ckpt_config.get("resume_best", False):
            ckpt_filepath = os.path.join(self.ckpt_foldername, reverse_suffix)

        loaded = False
        if ckpt_config.get("resume", False) and os.path.exists(ckpt_filepath):
            self._load(ckpt_filepath)
            loaded = True

        if not loaded and ckpt_config.get("resume_file", None):
            resume_file = ckpt_config["resume_file"]
            if os.path.exists(resume_file):
                self._load(
                    resume_file,
                    load_pretrained=ckpt_config.get("resume_pretrained", False),
                )
                loaded = True
            else:
                # may be a zoo key
                self._load_from_zoo(resume_file, ckpt_config)
                loaded = True

        if not loaded and ckpt_config.get("resume_zoo", None):
            self._load_from_zoo(ckpt_config["resume_zoo"], ckpt_config)
            loaded = True

    def _load(self, path: str, load_pretrained: bool = False):
        logger.info(f"Loading checkpoint from {path}")
        ckpt = _restore_any(path)
        ckpt = self._adapt_torch_ckpt(ckpt)
        self._load_into_trainer(ckpt, load_pretrained=load_pretrained)
        logger.info("Checkpoint loaded.")

    def _adapt_torch_ckpt(self, ckpt):
        """Map a torch-format checkpoint (flat ``model`` state_dict, the
        reference's layout checkpoint.py:543-568) onto the native layout by
        running the torch->flax converter against the live model's param
        template. Native checkpoints (with ``variables``) pass through."""
        if not isinstance(ckpt, dict) or "variables" in ckpt:
            return ckpt
        sd = ckpt.get("model")
        if not isinstance(sd, dict):
            # model-only checkpoint: the dict itself is the state_dict
            if all(hasattr(v, "shape") for v in ckpt.values()):
                sd, ckpt = ckpt, {}
            else:
                return ckpt
        from mmf_tpu.utils.checkpoint_updater import (
            MODEL_KEY_MAPS,
            convert_torch_state_dict,
        )

        variables = self.trainer.get_variables()
        model = getattr(self.trainer, "model", None)
        model_name = self.config.get("model", None)
        format_fn = getattr(type(model), "format_state_key", None) if model \
            else None
        converted, stats = convert_torch_state_dict(
            {k: np.asarray(v) for k, v in sd.items()},
            variables["params"],
            key_map=MODEL_KEY_MAPS.get(model_name),
            format_state_key=format_fn,
        )
        logger.info(
            f"Adapted torch checkpoint for model '{model_name}': "
            f"{stats['matched']} matched / {stats['missed']} missed / "
            f"{stats['shape_mismatch']} shape mismatches"
        )
        new_ckpt = {"variables": dict(variables, params=converted)}
        counts = {
            k: ckpt[k]
            for k in (
                "current_iteration",
                "num_updates",
                "current_epoch",
                "best_iteration",
                "best_update",
                "best_metric_value",
            )
            if k in ckpt
        }
        if counts:
            new_ckpt["counts"] = counts
        return new_ckpt

    def _load_from_zoo(self, zoo_key: str, ckpt_config):
        from mmf_tpu.utils.download import download_pretrained_model

        folder = download_pretrained_model(zoo_key)
        ckpts = sorted(
            glob.glob(os.path.join(folder, "*.ckpt"))
            + glob.glob(os.path.join(folder, "*.pth"))
        )
        assert ckpts, f"No checkpoints found in zoo folder {folder}"
        self._load(
            ckpts[0],
            load_pretrained=ckpt_config.get("resume_pretrained", True),
        )

    def _load_into_trainer(self, ckpt: Dict[str, Any], load_pretrained=False):
        reset_config = self.config["checkpoint"].get("reset", {}) or {}
        reset_all = reset_config.get("all", False)
        reset_optimizer = reset_config.get("optimizer", False) or reset_all
        reset_counts = reset_config.get("counts", False) or reset_all

        if load_pretrained:
            mapping = self.config["checkpoint"].get(
                "pretrained_state_mapping", {}
            ) or {}
            if mapping:
                self._load_pretrained_mapped(ckpt, mapping)
                return

        self.trainer.set_variables(ckpt["variables"])
        if not reset_optimizer and "opt_state" in ckpt:
            try:
                self.trainer.set_opt_state(ckpt["opt_state"])
            except Exception as e:
                logger.warning(f"Could not restore optimizer state: {e}")
        if not reset_counts and "counts" in ckpt:
            counts = ckpt["counts"]
            self.trainer.current_iteration = int(counts.get("current_iteration", 0))
            self.trainer.num_updates = int(counts.get("num_updates", 0))
            self.trainer.current_epoch = int(counts.get("current_epoch", 0))
            registry.register("current_iteration", self.trainer.current_iteration)
            registry.register("num_updates", self.trainer.num_updates)
            registry.register("current_epoch", self.trainer.current_epoch)
            if getattr(self.trainer, "early_stop_callback", None) is not None:
                self.trainer.early_stop_callback.early_stopping.init_from_checkpoint(
                    {
                        "best_iteration": int(counts.get("best_iteration", 0)),
                        "best_update": int(counts.get("best_update", 0)),
                        "best_metric_value": float(
                            counts.get("best_metric_value", 0.0)
                        ),
                    }
                )

    def _load_pretrained_mapped(self, ckpt, mapping: Dict[str, str]):
        """Copy params whose flattened path starts with mapping value into
        paths starting with mapping key (reference checkpoint.py:412-421)."""
        own = _flatten(self.trainer.get_variables())
        incoming = _flatten(ckpt["variables"])
        format_fn = getattr(
            type(self.trainer.model), "format_state_key", lambda k: k
        )
        loaded_keys = 0
        for attr, pretrained_attr in mapping.items():
            for own_key in list(own.keys()):
                # match attr only on dotted-path segment boundaries — a
                # bare substring test would let 'pooler' rewrite
                # 't_pooler'/'v_pooler' and silently load wrong tensors
                dotted = f".{own_key}."
                needle = f".{attr}."
                if needle not in dotted:
                    continue
                candidate = dotted.replace(needle, f".{pretrained_attr}.", 1)
                candidate = candidate[1:-1]
                candidate = format_fn(candidate)
                if candidate in incoming and np.shape(own[own_key]) == np.shape(
                    incoming[candidate]
                ):
                    own[own_key] = incoming[candidate]
                    loaded_keys += 1
        logger.info(f"Pretrained mapping loaded {loaded_keys} tensors")
        self.trainer.set_variables(_unflatten(own))

    # ------------------------------------------------------------------
    # save
    # ------------------------------------------------------------------
    def _gather_state(self, update, iteration) -> Dict[str, Any]:
        counts = {
            "current_iteration": iteration,
            "num_updates": update,
            "current_epoch": getattr(self.trainer, "current_epoch", 0),
        }
        es = getattr(self.trainer, "early_stop_callback", None)
        if es is not None:
            counts["best_iteration"] = es.early_stopping.best_monitored_iteration
            counts["best_update"] = es.early_stopping.best_monitored_update
            counts["best_metric_value"] = float(
                es.early_stopping.best_monitored_value
            )
        state = {
            "variables": jax_device_get(self.trainer.get_variables()),
            "opt_state": jax_device_get(self.trainer.get_opt_state()),
            "counts": counts,
        }
        return state

    def save(self, update, iteration=None, update_best=False):
        if not is_main():
            synchronize("ckpt-save")
            return
        if iteration is None:
            iteration = update

        state = self._gather_state(update, iteration)
        meta = {
            "config": omega.to_yaml(self.config),
            **get_git_info(),
        }

        ckpt_filepath = os.path.join(
            self.models_foldername, f"model_{update}.ckpt"
        )
        current_ckpt_filepath = os.path.join(
            self.ckpt_foldername, "current.ckpt"
        )

        def write_job():
            self._write(ckpt_filepath, state, meta)
            self._copy_dir(ckpt_filepath, current_ckpt_filepath)
            if update_best:
                best = os.path.join(self.ckpt_foldername, "best.ckpt")
                self._copy_dir(ckpt_filepath, best)
            # rotation (reference checkpoint.py:595-598)
            if self.max_to_keep > 0:
                if len(self.saved_iterations) == self.max_to_keep:
                    self.remove(self.saved_iterations.pop(0))
                self.saved_iterations.append(update)

        if self._writer is not None:
            # state is already host numpy (gathered above): safe to write
            # concurrently with the next train steps
            self.wait_pending()
            self._pending = self._writer.submit(write_job)
        else:
            write_job()
        synchronize("ckpt-save")

    def _write(self, path: str, state: Dict[str, Any], meta: Dict[str, str]):
        if os.path.exists(path):
            shutil.rmtree(path)
        _checkpointer().save(path, state)
        with open(os.path.join(path, "mmf_meta.json"), "w") as f:
            json.dump(meta, f)

    @staticmethod
    def _copy_dir(src: str, dst: str):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)

    def remove(self, update):
        ckpt_filepath = os.path.join(
            self.models_foldername, f"model_{update}.ckpt"
        )
        if os.path.exists(ckpt_filepath):
            shutil.rmtree(ckpt_filepath)

    def restore(self):
        """Restore from best.ckpt (end-of-training / early stop)."""
        self.wait_pending()
        synchronize("ckpt-restore")
        logger.info("Restoring checkpoint")
        best_path = os.path.join(self.ckpt_foldername, "best.ckpt")
        if os.path.exists(best_path):
            self._load(best_path)

    def finalize(self):
        self.wait_pending()
        if is_main():
            state = {
                "variables": jax_device_get(self.trainer.get_variables())
            }
            if os.path.exists(self.pth_filepath):
                shutil.rmtree(self.pth_filepath)
            _checkpointer().save(self.pth_filepath, state)
        synchronize("ckpt-finalize")


def jax_device_get(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def load_pretrained_model(model_name_or_path: str, *args, **kwargs):
    """Load a zoo/pretrained checkpoint + its config
    (reference checkpoint.py:155-162)."""
    from mmf_tpu.utils.download import download_pretrained_model

    if os.path.exists(model_name_or_path):
        download_path = model_name_or_path
    else:
        download_path = download_pretrained_model(model_name_or_path)

    configs = glob.glob(os.path.join(download_path, "*.yaml"))
    assert len(configs) >= 1, (
        "Checkpoint folder must contain a config yaml"
    )
    ckpts = sorted(
        glob.glob(os.path.join(download_path, "*.ckpt"))
        + glob.glob(os.path.join(download_path, "*.pth"))
    )
    assert len(ckpts) >= 1, "Checkpoint folder must contain a .ckpt/.pth"
    from mmf_tpu.config.configuration import load_yaml

    config = load_yaml(configs[0])
    ckpt = _restore_any(ckpts[0])
    return {"config": config, "checkpoint": ckpt, "full_config": config}
