"""Lightning-trainer config adapter.

The reference ships a second trainer backed by PyTorch Lightning
(mmf/trainers/lightning_trainer.py:38-343) whose value is the
``trainer.params`` config surface (max_steps, val_check_interval,
accumulate_grad_batches, ...). There is no Lightning on TPU/JAX — and the
SPMD trainer already covers the functionality — so this registers the
``lightning`` trainer key as a config adapter: ``trainer.params`` maps
onto the equivalent ``training.*`` knobs and the run proceeds through the
same jitted loop. Configs written for the reference's lightning trainer
run unchanged.
"""

from __future__ import annotations

import logging

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.trainers.mmf_trainer import MMFTrainer

logger = logging.getLogger("mmf_tpu")

# trainer.params key -> training.* key
PARAM_MAP = {
    "max_steps": "max_updates",
    "max_epochs": "max_epochs",
    "log_every_n_steps": "log_interval",
    "val_check_interval": "evaluation_interval",
    "accumulate_grad_batches": "update_frequency",
    "gradient_clip_val": "max_grad_l2_norm",
}


@registry.register_trainer("lightning")
class LightningTrainer(MMFTrainer):
    def __init__(self, config):
        trainer_params = (config.get("trainer", {}) or {}).get("params", {})
        with omega.open_dict(config):
            for src, dst in PARAM_MAP.items():
                if src in trainer_params and trainer_params[src] is not None:
                    value = trainer_params[src]
                    if src == "gradient_clip_val" and value:
                        config["training"]["clip_gradients"] = True
                    config["training"][dst] = value
            resume_ckpt = trainer_params.get("resume_from_checkpoint", None)
            if resume_ckpt:
                config["checkpoint"]["resume_file"] = resume_ckpt
        logger.info(
            "lightning trainer key: mapped trainer.params onto training.* "
            "and running the SPMD trainer"
        )
        super().__init__(config)
