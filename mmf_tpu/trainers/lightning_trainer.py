"""Lightning-trainer config adapter.

The reference ships a second trainer backed by PyTorch Lightning
(mmf/trainers/lightning_trainer.py:38-343) whose value is the
``trainer.params`` config surface. There is no Lightning on TPU/JAX — and
the SPMD trainer already covers the functionality — so the ``lightning``
trainer key is a config adapter: every ``trainer.params`` key is either
mapped onto the equivalent ``training.*``/``evaluation.*``/``checkpoint.*``
knob, satisfied by construction on TPU (with an info log), or loudly
rejected with a warning. Nothing is silently ignored; configs written for
the reference's lightning trainer run unchanged
(reference surface: lightning_trainer.py:55-227 + configs/defaults.yaml:182-220).
"""

from __future__ import annotations

import logging

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.trainers.mmf_trainer import MMFTrainer

logger = logging.getLogger("mmf_tpu")

# direct maps: trainer.params key -> (section, key)
PARAM_MAP = {
    "max_steps": ("training", "max_updates"),
    "max_epochs": ("training", "max_epochs"),
    "log_every_n_steps": ("training", "log_interval"),
    "val_check_interval": ("training", "evaluation_interval"),
    "accumulate_grad_batches": ("training", "update_frequency"),
    "limit_val_batches": ("evaluation", "limit_val_batches"),
}

# keys whose PL semantics hold by construction on the SPMD trainer —
# logged at info level so the user can see the translation
SATISFIED = {
    "deterministic": "XLA compilation is deterministic by default",
    "benchmark": "no cudnn autotuning on TPU; XLA picks kernels at compile",
    "enable_progress_bar": "progress logs already use the mmf format",
    "num_sanity_val_steps": "eval loop is jit-checked at compile time",
    "logger": "mmf logging (console/TB/wandb) is always active",
    "replace_sampler_ddp": "per-process sharding is built into the loader",
}

# keys describing hardware topology — superseded by the device mesh
TOPOLOGY = {"gpus", "num_nodes", "devices", "accelerator", "strategy",
            "num_processes", "tpu_cores"}

_HALF_PRECISIONS = {16, "16", "16-mixed", "bf16", "bf16-mixed"}


@registry.register_trainer("lightning")
class LightningTrainer(MMFTrainer):
    def __init__(self, config):
        trainer_params = (config.get("trainer", {}) or {}).get("params", {})
        with omega.open_dict(config):
            self._translate(config, trainer_params)
        logger.info(
            "lightning trainer key: translated trainer.params onto the "
            "SPMD trainer config"
        )
        super().__init__(config)

    @staticmethod
    def _translate(config, trainer_params):
        for key in trainer_params:
            value = trainer_params[key]
            if key in PARAM_MAP:
                if value is None:
                    continue
                section, dst = PARAM_MAP[key]
                config[section][dst] = value
            elif key == "gradient_clip_val":
                if value:
                    config["training"]["clip_gradients"] = True
                    config["training"]["max_grad_l2_norm"] = value
            elif key == "precision":
                if value in _HALF_PRECISIONS:
                    # fp16-autocast-on-CUDA maps to bf16-compute-on-TPU
                    # (f32 params, no loss scaling needed)
                    model = config.get("model")
                    if model and model in config.get("model_config", {}):
                        config["model_config"][model]["dtype"] = "bfloat16"
                    config["training"]["fp16"] = True
                elif value not in (32, "32", "32-true", None):
                    logger.warning(
                        f"trainer.params.precision={value!r} is not "
                        "supported on TPU (use 32 or bf16); running f32"
                    )
            elif key == "enable_checkpointing":
                if not value:
                    # effectively disable interval saves; final/best saves
                    # are governed by checkpoint.* as in the reference
                    config["training"]["checkpoint_interval"] = 2 ** 31
            elif key == "resume_from_checkpoint":
                # takes precedence over config.checkpoint.* (reference
                # defaults.yaml:209-220)
                if value:
                    config["checkpoint"]["resume_file"] = value
            elif key in TOPOLOGY:
                logger.info(
                    f"trainer.params.{key}={value!r}: device topology is "
                    "controlled by the JAX mesh "
                    "(training.tensor_parallel_size / jax.distributed); "
                    "key ignored"
                )
            elif key in SATISFIED:
                logger.info(
                    f"trainer.params.{key}={value!r}: {SATISFIED[key]}"
                )
            elif key == "default_root_dir":
                if value:
                    config["env"]["save_dir"] = value
            else:
                logger.warning(
                    f"trainer.params.{key} has no TPU-trainer equivalent "
                    "and is IGNORED - remove it from the config or use "
                    "the training.* surface"
                )
