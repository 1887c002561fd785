"""Central registry: the dependency-injection mechanism binding all layers.

TPU-native reimplementation of the reference registry
(mmf/common/registry.py:35-661): a process-global dict of name->class
mappings populated by decorator side effects at import time, plus a
hierarchical ``state`` store used for cross-layer communication (e.g. a
dataset registers ``{dataset}_num_final_outputs`` and the model reads it).

The mapping names are kept identical to the reference so configs and user
plugins carry over unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    """Class-level registry of framework components.

    Mappings (same 18 families as the reference):
    trainer, builder (datasets), model, metric, loss, pooler, fusion,
    optimizer, scheduler, processor, encoder, decoder, transformer_backend,
    transformer_head, test_reporter, iteration_strategy, callback,
    torchmetric (kept for API parity; backed by the same metric registry).
    """

    mapping: Dict[str, Dict[str, Any]] = {
        "trainer_name_mapping": {},
        "builder_name_mapping": {},
        "model_name_mapping": {},
        "metric_name_mapping": {},
        "torchmetric_name_mapping": {},
        "loss_name_mapping": {},
        "pooler_name_mapping": {},
        "fusion_name_mapping": {},
        "optimizer_name_mapping": {},
        "scheduler_name_mapping": {},
        "processor_name_mapping": {},
        "encoder_name_mapping": {},
        "decoder_name_mapping": {},
        "transformer_backend_name_mapping": {},
        "transformer_head_name_mapping": {},
        "test_reporter_mapping": {},
        "iteration_strategy_name_mapping": {},
        "callback_name_mapping": {},
        "state": {},
    }

    # ------------------------------------------------------------------
    # generic machinery
    # ------------------------------------------------------------------
    @classmethod
    def _register_impl(cls, mapping_name: str, name: str, obj: Any = None,
                       base: Optional[type] = None) -> Callable:
        def wrap(to_register):
            if base is not None and isinstance(to_register, type):
                assert issubclass(to_register, base), (
                    f"{to_register.__name__} must inherit {base.__name__}"
                )
            cls.mapping[mapping_name][name] = to_register
            return to_register

        if obj is not None:
            return wrap(obj)
        return wrap

    @classmethod
    def _get_impl(cls, mapping_name: str, name: str) -> Any:
        return cls.mapping[mapping_name].get(name, None)

    # ------------------------------------------------------------------
    # decorators, one per family
    # ------------------------------------------------------------------
    @classmethod
    def register_trainer(cls, name):
        return cls._register_impl("trainer_name_mapping", name)

    @classmethod
    def register_builder(cls, name):
        return cls._register_impl("builder_name_mapping", name)

    @classmethod
    def register_model(cls, name):
        def wrap(model_cls):
            model_cls.model_name = name
            return cls._register_impl("model_name_mapping", name, model_cls)
        return wrap

    @classmethod
    def register_metric(cls, name):
        def wrap(metric_cls):
            metric_cls.name = name
            return cls._register_impl("metric_name_mapping", name, metric_cls)
        return wrap

    @classmethod
    def register_torchmetric(cls, name):
        return cls._register_impl("torchmetric_name_mapping", name)

    @classmethod
    def register_loss(cls, name):
        def wrap(loss_cls):
            loss_cls.name = name
            return cls._register_impl("loss_name_mapping", name, loss_cls)
        return wrap

    @classmethod
    def register_pooler(cls, name):
        return cls._register_impl("pooler_name_mapping", name)

    @classmethod
    def register_fusion(cls, name):
        return cls._register_impl("fusion_name_mapping", name)

    @classmethod
    def register_optimizer(cls, name):
        return cls._register_impl("optimizer_name_mapping", name)

    @classmethod
    def register_scheduler(cls, name):
        return cls._register_impl("scheduler_name_mapping", name)

    @classmethod
    def register_processor(cls, name):
        return cls._register_impl("processor_name_mapping", name)

    @classmethod
    def register_encoder(cls, name):
        return cls._register_impl("encoder_name_mapping", name)

    @classmethod
    def register_decoder(cls, name):
        return cls._register_impl("decoder_name_mapping", name)

    @classmethod
    def register_transformer_backend(cls, name):
        return cls._register_impl("transformer_backend_name_mapping", name)

    @classmethod
    def register_transformer_head(cls, name):
        return cls._register_impl("transformer_head_name_mapping", name)

    @classmethod
    def register_test_reporter(cls, name):
        return cls._register_impl("test_reporter_mapping", name)

    @classmethod
    def register_iteration_strategy(cls, name):
        return cls._register_impl("iteration_strategy_name_mapping", name)

    @classmethod
    def register_callback(cls, name):
        return cls._register_impl("callback_name_mapping", name)

    # ------------------------------------------------------------------
    # getters
    # ------------------------------------------------------------------
    @classmethod
    def get_trainer_class(cls, name):
        return cls._get_impl("trainer_name_mapping", name)

    @classmethod
    def get_builder_class(cls, name):
        return cls._get_impl("builder_name_mapping", name)

    @classmethod
    def get_model_class(cls, name):
        return cls._get_impl("model_name_mapping", name)

    @classmethod
    def get_metric_class(cls, name):
        return cls._get_impl("metric_name_mapping", name)

    @classmethod
    def get_torchmetric_class(cls, name):
        return cls._get_impl("torchmetric_name_mapping", name)

    @classmethod
    def get_loss_class(cls, name):
        return cls._get_impl("loss_name_mapping", name)

    @classmethod
    def get_pool_class(cls, name):
        return cls._get_impl("pooler_name_mapping", name)

    @classmethod
    def get_fusion_class(cls, name):
        return cls._get_impl("fusion_name_mapping", name)

    @classmethod
    def get_optimizer_class(cls, name):
        return cls._get_impl("optimizer_name_mapping", name)

    @classmethod
    def get_scheduler_class(cls, name):
        return cls._get_impl("scheduler_name_mapping", name)

    @classmethod
    def get_processor_class(cls, name):
        return cls._get_impl("processor_name_mapping", name)

    @classmethod
    def get_encoder_class(cls, name):
        return cls._get_impl("encoder_name_mapping", name)

    @classmethod
    def get_decoder_class(cls, name):
        return cls._get_impl("decoder_name_mapping", name)

    @classmethod
    def get_transformer_backend_class(cls, name):
        return cls._get_impl("transformer_backend_name_mapping", name)

    @classmethod
    def get_transformer_head_class(cls, name):
        return cls._get_impl("transformer_head_name_mapping", name)

    @classmethod
    def get_test_reporter_class(cls, name):
        return cls._get_impl("test_reporter_mapping", name)

    @classmethod
    def get_iteration_strategy_class(cls, name):
        return cls._get_impl("iteration_strategy_name_mapping", name)

    @classmethod
    def get_callback_class(cls, name):
        return cls._get_impl("callback_name_mapping", name)

    # convenience listers (used by CLI error messages and tests)
    @classmethod
    def list_models(cls):
        return sorted(cls.mapping["model_name_mapping"].keys())

    @classmethod
    def list_datasets(cls):
        return sorted(cls.mapping["builder_name_mapping"].keys())

    @classmethod
    def list_processors(cls):
        return sorted(cls.mapping["processor_name_mapping"].keys())

    # ------------------------------------------------------------------
    # hierarchical state store (reference registry.py:519-540)
    # ------------------------------------------------------------------
    @classmethod
    def register(cls, name: str, obj: Any) -> None:
        """Register arbitrary state under a dotted path, e.g.
        ``registry.register("vqa2_num_final_outputs", 3129)``."""
        path = name.split(".")
        current = cls.mapping["state"]
        for part in path[:-1]:
            if part not in current:
                current[part] = {}
            current = current[part]
        current[path[-1]] = obj

    @classmethod
    def get(cls, name: str, default: Any = None, no_warning: bool = False) -> Any:
        original_name = name
        path = name.split(".")
        value: Any = cls.mapping["state"]
        for subname in path:
            try:
                value = value[subname]
            except (KeyError, TypeError):
                value = default
                break
        if value is default and not no_warning and "writer" in cls.mapping["state"]:
            cls.mapping["state"]["writer"].warning(
                f"Key {original_name} is not present in registry, returning default"
            )
        return value

    @classmethod
    def unregister(cls, name: str) -> Any:
        return cls.mapping["state"].pop(name, None)


registry = Registry
