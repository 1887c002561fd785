"""MMFTrainer: the default trainer.

Reference counterpart: mmf/trainers/mmf_trainer.py:30-171 + the mixins in
mmf/trainers/core/. The host loop here is thin by design — everything hot
(forward, loss, backward, clip, lr schedule, optimizer, cross-device
reduction, gradient accumulation) lives in ONE jitted SPMD step
(trainers/core/train_state.py); the host only feeds sharded batches,
reads back scalar reports at log intervals, and runs callbacks.

Per-dataset jit cache: loss/metric key names embed dataset_name (string,
static under trace), so steps are compiled once per (dataset, split)."""

from __future__ import annotations

import gc
import logging
from typing import Any, Dict, Optional

import jax
import numpy as np

from mmf_tpu.common.meter import Meter
from mmf_tpu.common.registry import registry
from mmf_tpu.common.report import Report
from mmf_tpu.common.sample import SampleList
from mmf_tpu.modules.metrics import Metrics
from mmf_tpu.parallel import mesh as mesh_lib
from mmf_tpu.trainers.base_trainer import BaseTrainer
from mmf_tpu.trainers.callbacks.checkpoint import CheckpointCallback
from mmf_tpu.trainers.callbacks.early_stopping import EarlyStoppingCallback
from mmf_tpu.trainers.callbacks.logistics import LogisticsCallback
from mmf_tpu.trainers.callbacks.lr_scheduler import LRSchedulerCallback
from mmf_tpu.trainers.core.profiling import TrainerProfilingMixin
from mmf_tpu.trainers.core.torchmetric import StreamingMetrics
from mmf_tpu.trainers.core.train_state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from mmf_tpu.utils.general import get_max_updates

logger = logging.getLogger("mmf_tpu")


@registry.register_trainer("mmf")
class MMFTrainer(TrainerProfilingMixin, BaseTrainer):
    def __init__(self, config):
        super().__init__(config)
        self.num_updates = 0
        self.current_iteration = 0
        self.current_epoch = 0
        self.meter = Meter()
        self.early_stop_callback = None
        self.checkpoint_callback = None
        self.current_lr = None
        self._train_steps: Dict[Any, Any] = {}
        self._step_uf: Dict[Any, int] = {}
        self._eval_steps: Dict[Any, Any] = {}
        self.train_state: Optional[TrainState] = None
        self._nan_window = []

    # ------------------------------------------------------------------
    # load sequence
    # ------------------------------------------------------------------
    def load(self):
        super().load()
        self.on_init_start()
        self.on_init_end()

    def configure_device(self):
        self.device_type = self.training_config.get("device", "tpu")
        self.mesh = mesh_lib.build_mesh(self.config)
        registry.register("current_device", self.device_type)
        logger.info(
            f"Mesh: {dict(self.mesh.shape)} over "
            f"{jax.device_count()} device(s)"
        )
        # Fail early with a clear message instead of a device_put
        # divisibility error deep in the first step: every per-process
        # batch is laid out along the mesh's data axis (shard_batch).
        from mmf_tpu.utils.general import get_batch_size

        per_process_batch = get_batch_size(self.config)
        local_data = self.mesh.shape["data"] // jax.process_count()
        if local_data and per_process_batch % local_data != 0:
            raise RuntimeError(
                f"training.batch_size gives {per_process_batch} samples per "
                f"process, which cannot be split across the mesh's "
                f"{local_data} local data-parallel device(s). Use a batch "
                f"size divisible by {local_data}, or set "
                f"training.batch_size_per_device instead."
            )

    def load_datasets(self):
        logger.info("Loading datasets")
        from mmf_tpu.datasets.multi_datamodule import MultiDataModule

        self.dataset_loader = MultiDataModule(self.config)
        self.train_loader = self.dataset_loader.train_dataloader()
        self.val_loader = self.dataset_loader.val_dataloader()
        self.test_loader = self.dataset_loader.test_dataloader()

    def load_model(self):
        logger.info("Loading model")
        from mmf_tpu.models.base_model import build_model

        # training.fp16 is the reference's CUDA-autocast flag
        # (defaults.yaml:167); the TPU equivalent is bf16 compute with
        # f32 params (no loss scaling needed). An explicit model dtype
        # wins over the flag.
        if self.training_config.get("fp16", False):
            from mmf_tpu.config import omega

            model_key = self.config.get("model", None)
            model_cfg = (self.config.get("model_config", {}) or {}).get(
                model_key, None
            )
            if model_cfg is not None and not model_cfg.get("dtype", None):
                with omega.open_dict(self.config):
                    model_cfg["dtype"] = "bfloat16"
                logger.info(
                    "training.fp16=true: using bf16 compute / f32 params"
                )

        # training-level parallelism knobs inject into the active model
        # config (same pattern as fp16 above) so a user YAML alone turns
        # pipeline / sequence parallelism on for any TransformerConfig
        # model: training.pipeline.{num_stages,num_microbatches} and
        # training.sequence_parallel map to the trunk's pipeline_stages /
        # pipeline_microbatches / sequence_parallel
        # (modules/transformer.py; primitives in parallel/pipeline.py
        # and ops/ring_attention.py).
        pipe_cfg = self.training_config.get("pipeline", {}) or {}
        seq_par = self.training_config.get("sequence_parallel", None)
        if pipe_cfg or seq_par is not None:
            from mmf_tpu.config import omega

            model_key = self.config.get("model", None)
            model_cfg = (self.config.get("model_config", {}) or {}).get(
                model_key, None
            )
            if model_cfg is not None:
                with omega.open_dict(self.config):
                    if pipe_cfg.get("num_stages", 0):
                        model_cfg["pipeline_stages"] = int(
                            pipe_cfg["num_stages"]
                        )
                        model_cfg["pipeline_microbatches"] = int(
                            pipe_cfg.get("num_microbatches", 0) or 0
                        )
                        logger.info(
                            "training.pipeline: trunk will run "
                            f"{model_cfg['pipeline_stages']} pipeline "
                            "stages over the mesh's model axis"
                        )
                    if seq_par is not None:
                        model_cfg["sequence_parallel"] = bool(seq_par)
                        logger.info(
                            "training.sequence_parallel="
                            f"{bool(seq_par)}: self-attention will use "
                            "ring attention over the mesh's model axis"
                        )

        # M4C-family decode_unroll=auto (VERDICT r4 #7): give the model
        # the run's expected decode budget so it can pick the nn.scan
        # unroll factor that minimizes compile + decode time for THIS
        # run shape (models/m4c.py:_resolve_decode_unroll). An explicit
        # int model_config.<m4c>.decode_unroll bypasses all of this.
        model_key = self.config.get("model", None)
        model_cfg = (self.config.get("model_config", {}) or {}).get(
            model_key, None
        )
        if (
            model_key in ("m4c", "m4c_captioner")
            and model_cfg is not None
            and model_cfg.get("decode_unroll", "auto") == "auto"
            and not model_cfg.get("decode_budget_samples", None)
        ):
            from mmf_tpu.config import omega

            budget = self._estimate_decode_budget()
            if budget:
                with omega.open_dict(self.config):
                    model_cfg["decode_budget_samples"] = int(budget)
                logger.info(
                    f"decode_unroll=auto: expecting ~{budget} decoded "
                    "samples this run"
                )

        self.model = build_model(self.config)
        self.losses = self.model.build_losses()
        # rng_impl "rbg" uses the TPU's hardware RngBitGenerator for
        # dropout bits (threefry split/fold_in for key derivation stays
        # safe): measured +24% train-step throughput at VisualBERT shapes
        # (716 -> 888 samples/s/chip; threefry mask generation is
        # VPU-bound and does not hide behind the MXU). Dropout masks are
        # random either way; set training.rng_impl=threefry to restore
        # the jax default stream.
        impl = self.training_config.get("rng_impl", "rbg")
        if impl == "threefry":  # jax's registered name
            impl = "threefry2x32"
        self._rng = jax.random.key(self.seed or 0, impl=impl)

    def _estimate_decode_budget(self) -> int:
        """Expected number of samples greedy-decoded over this run: the
        larger eval split's size, times how many evals the training
        schedule triggers. Coarse on purpose — it only selects among a
        few discrete decode_unroll factors (models/m4c.py)."""
        per_pass = 0
        for loader in (self.val_loader, self.test_loader):
            per_pass = max(
                per_pass, getattr(loader, "_total_length", 0) or 0
            )
        if not per_pass:
            return 0
        evals = 1
        if "train" in (self.run_type or ""):
            mu = self.training_config.get("max_updates", None)
            if not mu:
                epochs = self.training_config.get("max_epochs", None)
                try:
                    mu = int(epochs * len(self.train_loader))
                except (TypeError, ValueError):
                    mu = None
            ei = self.training_config.get("evaluation_interval", None)
            try:
                if mu and ei:
                    # +1: the end-of-training eval
                    evals = max(1, int(mu) // int(ei)) + 1
            except (TypeError, ValueError):
                pass
        return int(per_pass) * evals

    def load_optimizer(self):
        logger.info("Loading optimizer")
        from mmf_tpu.modules.optimizers import build_optimizer_transform
        from mmf_tpu.modules.schedulers import build_scheduler
        from mmf_tpu.utils.general import clip_gradients_config

        schedule_fn = build_scheduler(self.config)
        max_grad_norm = clip_gradients_config(self.config)
        lr_multipliers = None
        if hasattr(self.model, "get_lr_multipliers"):
            lr_multipliers = self.model.get_lr_multipliers(self.config)
        # weight-decay grouping (reference get_optimizer_parameters_for_bert,
        # utils/modeling.py:18-46): BERT-family models exempt bias/LayerNorm
        wd_mask = None
        if hasattr(self.model, "get_weight_decay_mask"):
            wd_mask = self.model.get_weight_decay_mask(self.config)
        self.tx = build_optimizer_transform(
            self.config, schedule_fn=schedule_fn,
            max_grad_norm=max_grad_norm, lr_multipliers=lr_multipliers,
            weight_decay_mask=wd_mask,
        )
        self._schedule_fn = schedule_fn

    def load_metrics(self):
        evaluation = self.config.get("evaluation", {}) or {}
        metrics = evaluation.get("metrics", []) or []
        self.metrics = Metrics(metrics)
        self.metrics_params = self.metrics.required_params
        # streaming "torchmetrics" surface (reference
        # lightning_core/torchmetric.py:14-148); once provided, the regular
        # report-level metrics are ignored, same as the reference warns.
        tm_list = evaluation.get("torchmetrics", []) or []
        self.torchmetrics = StreamingMetrics(tm_list) if tm_list else None
        if self.torchmetrics is not None and metrics:
            logger.warning(
                "evaluation.torchmetrics provided: regular mmf metrics "
                "will be ignored."
            )

    def configure_callbacks(self):
        self.lr_scheduler_callback = LRSchedulerCallback(self.config, self)
        self.checkpoint_callback = CheckpointCallback(self.config, self)
        self.logistics_callback = LogisticsCallback(self.config, self)
        self.early_stop_callback = EarlyStoppingCallback(self.config, self)

        self.callbacks = [
            self.lr_scheduler_callback,
            self.checkpoint_callback,
            self.logistics_callback,
            self.early_stop_callback,
        ]
        # user callbacks from config (reference mmf_trainer.py:66-75)
        for cb_cfg in self.training_config.get("callbacks", []) or []:
            cb_cls = registry.get_callback_class(cb_cfg["type"])
            assert cb_cls is not None, (
                f"The callback {cb_cfg['type']} was not found in registry"
            )
            self.callbacks.append(
                cb_cls(self.config, self, **(cb_cfg.get("params", {}) or {}))
            )

    # callback fan-out (reference core/callback_hook.py)
    def _fire(self, hook: str, **kwargs):
        for cb in getattr(self, "callbacks", []):
            getattr(cb, hook)(**kwargs)

    def on_init_start(self, **kw):
        self._fire("on_init_start", **kw)

    def on_init_end(self, **kw):
        self._fire("on_init_end", **kw)

    # ------------------------------------------------------------------
    # state plumbing (used by Checkpoint)
    # ------------------------------------------------------------------
    def get_variables(self):
        if self.train_state is not None:
            return jax.device_get(self.train_state.variables)
        return self._pending_variables

    def set_variables(self, variables):
        if self.train_state is not None:
            self.train_state = self.train_state.replace(
                variables=jax.device_put(
                    variables, mesh_lib.replicated_sharding(self.mesh)
                )
            )
        else:
            self._pending_variables = variables

    def get_opt_state(self):
        if self.train_state is not None:
            return jax.device_get(self.train_state.opt_state)
        return None

    def set_opt_state(self, opt_state):
        if self.train_state is not None:
            ref = jax.tree_util.tree_structure(self.train_state.opt_state)
            leaves = jax.tree_util.tree_leaves(opt_state)
            restored = jax.tree_util.tree_unflatten(ref, leaves)
            self.train_state = self.train_state.replace(
                opt_state=jax.device_put(
                    restored, mesh_lib.replicated_sharding(self.mesh)
                )
            )
        else:
            self._pending_opt_state = opt_state

    # ------------------------------------------------------------------
    # lazy init + step compilation
    # ------------------------------------------------------------------
    _pending_variables = None
    _pending_opt_state = None

    def _ensure_state(self, batch: SampleList):
        if self.train_state is not None:
            return
        pytree = batch.pytree()
        meta = self._batch_meta(batch)
        init_rng, dropout_rng, self._rng = jax.random.split(self._rng, 3)
        batch_in = dict(pytree)
        batch_in.update(meta)
        if self._pending_variables is not None:
            # resuming: the checkpoint supplies every parameter — don't
            # materialize a full random init only to throw it away
            variables = self._pending_variables
            self._pending_variables = None
        else:
            # jit the init: eager flax init dispatches every RNG/shape op
            # individually, which over a tunneled device (axon) costs a
            # round-trip per op — tens of minutes for a 150-conv ResNet.
            # One compiled executable brings that to seconds; XLA DCEs
            # the traced forward since only the params are outputs.
            init_fn = jax.jit(
                lambda rngs: self.model.init(rngs, batch_in, False)
            )
            variables = init_fn(
                {"params": init_rng, "dropout": dropout_rng}
            )
            variables = jax.device_get(variables)
        # replicated when the mesh's model axis is 1; tensor-parallel
        # kernel shardings otherwise (parallel/mesh.py rules) — unless
        # pipeline or sequence parallelism owns the model axis, in which
        # case TP sharding would just force GSPMD to re-lay params out
        # every step (pipeline stacks stages; ring attention shards the
        # sequence)
        if self._uses_pp_or_sp():
            variables = jax.device_put(
                variables, mesh_lib.replicated_sharding(self.mesh)
            )
        else:
            variables = jax.device_put(
                variables, mesh_lib.param_sharding_tree(variables, self.mesh)
            )
        n_params = sum(
            np.prod(x.shape)
            for x in jax.tree_util.tree_leaves(variables.get("params", {}))
        )
        logger.info(f"Model initialized: {int(n_params):,} parameters")
        # the key handed to TrainState is donated with the state on every
        # step — keep a separate stream for host-side uses (eval sampling)
        # or fold_in on self._rng hits a deleted buffer
        train_rng, self._rng = jax.random.split(self._rng)
        self.train_state = create_train_state(variables, self.tx, train_rng)
        if self._pending_opt_state is not None:
            self.set_opt_state(self._pending_opt_state)
            self._pending_opt_state = None

    @staticmethod
    def _batch_meta(batch: SampleList) -> Dict[str, Any]:
        meta = {}
        if isinstance(batch, SampleList):
            m = batch.meta()
            for key in ("dataset_name", "dataset_type"):
                if key in m:
                    v = m[key]
                    meta[key] = v[0] if isinstance(v, list) else v
        return meta

    def _moe_aux_weight(self) -> float:
        """training.moe_aux_weight — the load-balance aux-loss weight.
        Defaults to 0.01 (the Switch Transformer setting) whenever any
        model_config enables moe_experts, so turning on MoE can never
        silently train without load balancing; 0.0 otherwise."""
        w = self.training_config.get("moe_aux_weight", None)
        if w is not None:
            return float(w)

        def uses_moe(node):
            if isinstance(node, dict) or hasattr(node, "items"):
                for k, v in node.items():
                    if k == "moe_experts" and v and int(v) > 0:
                        return True
                    if uses_moe(v):
                        return True
            return False

        if uses_moe(self.config.get("model_config", {}) or {}):
            logger.info(
                "moe_experts enabled: defaulting training.moe_aux_weight "
                "to 0.01 (set it explicitly to override)"
            )
            return 0.01
        return 0.0

    def _uses_pp_or_sp(self) -> bool:
        """True when any model_config enables pipeline_stages > 1 or
        sequence_parallel — those own the mesh's model axis, so the
        tensor-parallel param-sharding rules must stand down."""

        def scan(node):
            if isinstance(node, dict) or hasattr(node, "items"):
                for k, v in node.items():
                    if k == "pipeline_stages" and v and int(v) > 1:
                        return True
                    if k == "sequence_parallel" and bool(v):
                        return True
                    if scan(v):
                        return True
            return False

        return scan(self.config.get("model_config", {}) or {})

    def _mutable_collections(self):
        if self.train_state is None:
            return ()
        return tuple(
            k for k in self.train_state.variables.keys() if k != "params"
        )

    def _auto_update_frequency(self, batch) -> int:
        """Split the global batch into the largest number of microbatches
        keeping >=32 samples per device per microbatch — the measured MXU
        sweet spot (BENCH_NOTES "Train flag/batch sweep": microbatch 32 +
        scan accumulation beats every larger single microbatch, +5-13%).
        Numerics are identical to the unsplit step (scan accumulation,
        verified in tests); opt-in via training.auto_update_frequency."""
        leaves = jax.tree_util.tree_leaves(batch)
        if not leaves:
            return 1
        b = int(leaves[0].shape[0])
        n_data = 1
        if self.mesh is not None and "data" in self.mesh.shape:
            n_data = int(self.mesh.shape["data"])
        per_dev = max(1, b // max(1, n_data))
        for k in range(max(1, per_dev // 32), 0, -1):
            if b % k == 0 and (b // k) % max(1, n_data) == 0:
                return k
        return 1

    def _get_train_step(self, meta: Dict[str, Any], batch=None):
        key = (meta.get("dataset_name", ""), meta.get("task", ""), "train")
        if key not in self._train_steps:
            uf = self.training_config.get("update_frequency", 1)
            if (
                uf == 1
                and batch is not None
                and self.training_config.get("auto_update_frequency", False)
            ):
                uf = self._auto_update_frequency(batch)
                if uf > 1:
                    logger.info(
                        f"auto_update_frequency: scanning {uf} microbatches "
                        "per update (>=32 samples/device each)"
                    )
            self._step_uf[key] = uf
            report_fields = ()
            if (
                self.training_config.get("evaluate_metrics", False)
                and len(self.metrics.metrics) > 0
            ):
                # carry model scores out of the step so the host can compute
                # train-time metrics (reference training_loop.py:118-123)
                report_fields = ("scores",)
            step = make_train_step(
                self.model.apply,
                self.losses,
                self.tx,
                update_frequency=uf,
                mutable=self._mutable_collections(),
                meta=meta,
                report_fields=report_fields,
                moe_aux_weight=self._moe_aux_weight(),
            )
            self._train_steps[key] = jax.jit(step, donate_argnums=(0,))
        return self._train_steps[key]

    def _get_eval_step(self, meta: Dict[str, Any]):
        key = (meta.get("dataset_name", ""), meta.get("dataset_type", "val"))
        if key not in self._eval_steps:
            step = make_eval_step(
                lambda v, b, train, **kw: self.model.apply(v, b, train, **kw),
                self.losses,
                meta=meta,
            )
            self._eval_steps[key] = jax.jit(step)
        return self._eval_steps[key]

    # ------------------------------------------------------------------
    # training loop (reference core/training_loop.py:21-246)
    # ------------------------------------------------------------------
    def train(self):
        logger.info("===== Model =====")
        logger.info(type(self.model).__name__)

        if "train" in self.run_type:
            self._fire("on_train_start")
            self.training_loop()
            self._fire("on_train_end")

        self.inference()

    @property
    def max_updates(self):
        return getattr(self, "_max_updates", None)

    @property
    def num_snapshot_iterations(self):
        if self.val_loader is None:
            return 0
        try:
            return len(self.val_loader)
        except Exception:
            return 0

    def training_loop(self):
        self._max_updates, self.max_epochs = get_max_updates(
            self.training_config.get("max_updates", None),
            self.training_config.get("max_epochs", None),
            self.train_loader,
            self.training_config.get("update_frequency", 1),
        )
        logger.info("Starting training...")
        log_interval = self.training_config["log_interval"]
        eval_interval = self.training_config["evaluation_interval"]
        exit_on_nan = self.training_config.get("exit_on_nan_losses", True)
        uf = self.training_config.get("update_frequency", 1)
        should_break = False
        self.start_profiler()

        while self.num_updates < self._max_updates and not should_break:
            self.current_epoch += 1
            registry.register("current_epoch", self.current_epoch)
            if self.current_epoch > self.max_epochs + 1:
                break
            self.train_loader.seed_sampler(self.current_epoch)

            pending_report = None
            for batch in self.train_loader:
                self.profile("Batch load time")
                if self.num_updates >= self._max_updates:
                    break
                self._fire("on_update_start")

                meta = self._batch_meta(batch)
                # models with per-step host-side choices (UNITER samples a
                # pretraining task each iteration, reference uniter.py
                # random task sampling) extend the meta — it becomes part
                # of the jit cache key so each choice compiles once
                if hasattr(self.model, "get_step_meta"):
                    meta.update(self.model.get_step_meta() or {})
                self._ensure_state(batch)
                with self.trace("batch_prepare"):
                    device_batch = mesh_lib.shard_batch(
                        batch.pytree(), self.mesh
                    )
                self.profile("Batch prepare time")
                step_fn = self._get_train_step(meta, device_batch)
                # fused forward+backward+update; dispatch is async — device
                # time shows on the XProf timeline, not in this host timer
                with self.trace("train_step"):
                    self.train_state, report = step_fn(
                        self.train_state, device_batch
                    )
                self.profile("Step dispatch time")

                self.num_updates += 1
                step_key = (meta.get("dataset_name", ""),
                            meta.get("task", ""), "train")
                self.current_iteration += self._step_uf.get(step_key, uf)
                registry.register("num_updates", self.num_updates)
                registry.register("current_iteration", self.current_iteration)
                pending_report = (report, meta, batch)

                should_log = self.num_updates % log_interval == 0
                if should_log:
                    self._consume_train_report(*pending_report,
                                               exit_on_nan=exit_on_nan)
                    pending_report = None
                self._fire("on_update_end", meter=self.meter,
                           should_log=should_log)
                self.profile("Finished update")

                if self.num_updates % eval_interval == 0 and \
                        self.val_loader is not None and len(self.val_loader) > 0:
                    stop = self._run_validation()
                    if stop:
                        logger.info("Early stopping activated")
                        should_break = True
                        break
            gc.collect()

        self.stop_profiler()
        logger.info(
            f"Finished training: {self.num_updates}/{self._max_updates} "
            f"updates, {self.current_epoch} epochs"
        )

    def _consume_train_report(self, report, meta, batch, exit_on_nan=True):
        """Device->host sync point: pull scalars, feed the meter, NaN guard
        (reference _check_nan_losses, training_loop.py:173-191). When
        ``training.evaluate_metrics`` is on, scores ride along in the report
        and train-time metrics are computed here at each log interval
        (reference training_loop.py:118-123)."""
        losses = {k: np.asarray(v) for k, v in report["losses"].items()}
        nan_flag = bool(np.asarray(report["nan_flag"]))
        if nan_flag and exit_on_nan:
            keys = ", ".join(losses.keys())
            raise RuntimeError(
                f"NaN occurred in the following loss(es): {keys}; exiting "
                "the training"
            )
        if "scores" in report:
            output = {
                "losses": losses,
                "scores": np.asarray(report["scores"]),
            }
            host_report = Report(batch, output).to_numpy()
            host_report["dataset_name"] = meta.get("dataset_name", "unknown")
            host_report["dataset_type"] = "train"
            host_report.metrics = self.metrics(host_report, host_report)
        else:
            host_report = Report.__new__(Report)
            dict.__init__(host_report)
            host_report["losses"] = losses
            host_report.batch_size = batch.get_batch_size()
        self.meter.update_from_report(host_report)

    def _run_validation(self) -> bool:
        self._fire("on_validation_start")
        report, meter = self.evaluation_loop("val")
        # fan the hook out to EVERY callback (user callbacks included —
        # reference callback_hook.py); early stopping's return value is
        # the stop decision
        stop = False
        for cb in getattr(self, "callbacks", []):
            result = cb.on_validation_end(meter=meter)
            if cb is self.early_stop_callback:
                stop = bool(result)
        return stop

    # ------------------------------------------------------------------
    # evaluation (reference core/evaluation_loop.py:18-177)
    # ------------------------------------------------------------------
    def _resolve_eval_limit(self, loader):
        """PL-style ``evaluation.limit_val_batches`` (also reachable via
        ``trainer.params.limit_val_batches`` through the lightning
        adapter): int = batch count, float < 1.0 = fraction of the
        loader, 0 = skip evaluation entirely."""
        limit = (self.config.get("evaluation", {}) or {}).get(
            "limit_val_batches", None
        )
        if limit is None or isinstance(limit, bool):
            return None
        if isinstance(limit, float):
            if limit >= 1.0:
                return None
            try:
                total = len(loader)
            except TypeError:
                logger.warning(
                    "evaluation.limit_val_batches is a fraction but the "
                    "loader has no length; running the full split"
                )
                return None
            return max(1, int(total * limit))
        return max(0, int(limit))

    def evaluation_loop(self, dataset_type: str, use_tqdm: bool = False,
                        single_batch: bool = False):
        """Accumulates reports on HOST numpy — the reference's
        ``evaluation.use_cpu`` (evaluation_loop.py:24,55,100) is always-on
        here by design: keeping logits out of HBM during long eval sweeps
        costs one device->host copy per batch and frees the chip."""
        loader = getattr(self, f"{dataset_type}_loader")
        meter = Meter()
        combined_report = None
        max_batches = self._resolve_eval_limit(loader)
        if max_batches == 0:
            loader = []
        n_batches = 0
        torchmetrics = getattr(self, "torchmetrics", None)
        if torchmetrics is not None:
            torchmetrics.reset()
        # set-level metrics over formatted predictions (reference
        # evaluation_loop.py:75-91: prediction_report accumulation)
        need_predictions = "__prediction_report__" in (
            self.metrics_params or []
        )
        predictions = []
        pred_dataset = None

        for batch in loader:
            meta = self._batch_meta(batch)
            meta["dataset_type"] = dataset_type
            self._ensure_state(batch)
            device_batch = mesh_lib.shard_batch(batch.pytree(), self.mesh)
            eval_fn = self._get_eval_step(meta)
            self._eval_batch_counter = getattr(
                self, "_eval_batch_counter", 0
            ) + 1
            sample_rng = jax.random.fold_in(
                self._rng, self._eval_batch_counter
            )
            output = eval_fn(
                self.train_state.variables, device_batch, sample_rng
            )

            output = jax.device_get(output)
            output["losses"] = {
                k: np.asarray(v) for k, v in output["losses"].items()
            }
            report = Report(batch, output)
            report = report.to_numpy()
            true_bs = getattr(batch, "_true_batch_size", None)
            if true_bs is not None:
                report.trim_to_batch_size(true_bs)
            if need_predictions:
                ds = getattr(loader, "current_dataset", None)
                if ds is not None and hasattr(ds, "format_for_prediction"):
                    pred_dataset = ds
                    predictions.extend(ds.format_for_prediction(report))
            meter.update_from_report(report)
            if torchmetrics is not None:
                torchmetrics.update(report, report)

            moved_report = report
            if combined_report is None:
                combined_report = moved_report
            elif torchmetrics is not None and not need_predictions:
                # streaming metrics consumed this batch already — skip the
                # O(num_samples) field accumulation, keep loss bookkeeping
                combined_report.accumulate_tensor_fields_and_loss(
                    moved_report, set()
                )
                combined_report.batch_size += moved_report.batch_size
            else:
                combined_report.accumulate_tensor_fields_and_loss(
                    moved_report, self.metrics_params
                )
                combined_report.batch_size += moved_report.batch_size
            n_batches += 1
            if single_batch or (
                max_batches is not None and n_batches >= max_batches
            ):
                break

        if combined_report is not None and torchmetrics is not None:
            # streaming metrics replace report-level ones; keys follow the
            # reference's `<type>_<key>` format
            # (loop_callback_with_torchmetrics.py:112)
            scalars = torchmetrics.get_scalar_dict()
            combined_report["dataset_name"] = meta.get("dataset_name", "unknown")
            combined_report["dataset_type"] = dataset_type
            combined_report.metrics = {
                f"{dataset_type}_{k}": np.float32(v) for k, v in scalars.items()
            }
            if need_predictions:
                # set-level prediction metrics (e.g. detection mAP) were
                # accumulated every batch — compute them too instead of
                # silently discarding the configured metric
                if pred_dataset is not None and hasattr(
                    pred_dataset, "on_prediction_end"
                ):
                    predictions = pred_dataset.on_prediction_end(predictions)
                combined_report["__prediction_report__"] = predictions
                combined_report.metrics.update(
                    self.metrics(combined_report, combined_report)
                )
            meter.update_from_report(combined_report, should_update_loss=False)
        elif combined_report is not None and len(self.metrics.metrics) > 0:
            combined_report["dataset_name"] = meta.get("dataset_name", "unknown")
            combined_report["dataset_type"] = dataset_type
            if need_predictions:
                if pred_dataset is not None and hasattr(
                    pred_dataset, "on_prediction_end"
                ):
                    predictions = pred_dataset.on_prediction_end(predictions)
                combined_report["__prediction_report__"] = predictions
            combined_report.metrics = self.metrics(combined_report, combined_report)
            meter.update_from_report(combined_report, should_update_loss=False)

        return combined_report, meter

    def prediction_loop(self, dataset_type: str):
        """Generate a prediction report (reference evaluation_loop.py:112-142)."""
        logger.info(f"Starting {dataset_type} inference predictions")
        self._fire("on_prediction_start")
        reporter = self.dataset_loader.get_test_reporter(dataset_type)
        loader = getattr(self, f"{dataset_type}_loader")

        while reporter.next_dataset():
            for batch in loader:
                meta = self._batch_meta(batch)
                meta["dataset_type"] = dataset_type
                self._ensure_state(batch)
                device_batch = mesh_lib.shard_batch(batch.pytree(), self.mesh)
                eval_fn = self._get_eval_step(meta)
                self._eval_batch_counter = getattr(
                    self, "_eval_batch_counter", 0
                ) + 1
                sample_rng = jax.random.fold_in(
                    self._rng, self._eval_batch_counter
                )
                output = jax.device_get(
                    eval_fn(
                        self.train_state.variables, device_batch, sample_rng
                    )
                )
                report = Report(batch, output).to_numpy()
                true_bs = getattr(batch, "_true_batch_size", None)
                if true_bs is not None:
                    report.trim_to_batch_size(true_bs)
                reporter.add_to_report(report, self.model)
        # the final next_dataset() call (returning False) flushed the last
        # dataset's report already
        self._fire("on_prediction_end")

    def inference(self):
        dataset_type = []
        if "val" in self.run_type:
            dataset_type.append("val")
        if any(rt in self.run_type for rt in ["inference", "test", "predict"]):
            dataset_type.append("test")

        for dtype in dataset_type:
            loader = getattr(self, f"{dtype}_loader", None)
            if loader is None or len(loader) == 0:
                continue
            if self.config.get("evaluation", {}).get("predict", False):
                self.prediction_loop(dtype)
            else:
                logger.info(f"Starting inference on {dtype} set")
                report, meter = self.evaluation_loop(dtype)
                if report is not None:
                    self._fire("on_test_end", report=report, meter=meter)


def build_trainer(config) -> BaseTrainer:
    """(reference utils/build.py:56-71)"""
    trainer_type = config["training"]["trainer"]
    trainer_cls = registry.get_trainer_class(trainer_type)
    trainer_obj = trainer_cls(config)
    return trainer_obj
