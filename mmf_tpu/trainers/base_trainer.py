"""Abstract trainer with the canonical load() sequence
(parity with mmf/trainers/base_trainer.py:11-101)."""

from __future__ import annotations

from mmf_tpu.common.registry import registry


@registry.register_trainer("base")
class BaseTrainer:
    def __init__(self, config):
        self.config = config
        self.training_config = self.config["training"]

    def load(self):
        self.run_type = self.config.get("run_type", "train")
        self.configure_device()
        self.configure_seed()
        if self.training_config.get("detect_anomaly", False):
            # the XLA analog of torch.autograd.set_detect_anomaly
            # (reference training_loop.py:29): error out at the op that
            # produced a NaN instead of at the loss check
            import jax

            jax.config.update("jax_debug_nans", True)

        self.load_datasets()
        self.load_model()
        self.load_optimizer()
        self.load_metrics()
        self.configure_callbacks()

    # -- hooks -------------------------------------------------------------
    def configure_device(self):
        raise NotImplementedError

    def configure_seed(self):
        from mmf_tpu.utils.env import set_seed

        seed = self.training_config.get("seed", -1)
        seed = set_seed(seed)
        registry.register("seed", seed)
        self.seed = seed

    def configure_callbacks(self):
        raise NotImplementedError

    def load_datasets(self):
        raise NotImplementedError

    def load_model(self):
        raise NotImplementedError

    def load_optimizer(self):
        raise NotImplementedError

    def load_metrics(self):
        raise NotImplementedError

    def train(self):
        raise NotImplementedError

    def inference(self):
        raise NotImplementedError
