"""mmf_run: the training/inference CLI.

Parity with mmf_cli/run.py — same invocation:
  mmf_run config=<yaml> model=<name> dataset=<name> [key=value ...]

Differences by design: NO process spawn. JAX SPMD uses one process per
host; local devices parallelize inside jit via GSPMD, multi-host
rendezvous comes from ``jax.distributed.initialize``
(distributed.init_method). This deletes the reference's
torch.multiprocessing/xmp.spawn machinery (run.py:100-130) entirely.
"""

from __future__ import annotations

import logging
import random
import typing

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.flags import flags

logger = logging.getLogger("mmf_tpu")


def main(configuration, init_distributed: bool = False, predict: bool = False):
    from mmf_tpu.trainers.mmf_trainer import build_trainer
    from mmf_tpu.utils.distributed import (
        distributed_init,
        get_rank,
        is_main,
        suppress_output,
    )
    from mmf_tpu.utils.env import (
        set_seed,
        setup_compilation_cache,
        setup_imports,
        setup_run_folder,
    )
    from mmf_tpu.utils.logger import setup_logger

    setup_imports()
    config = configuration.get_config()

    if init_distributed:
        distributed_init(config)

    # per-process seed offset (reference run.py:36)
    from mmf_tpu.config import omega

    seed = config["training"]["seed"]
    with omega.open_dict(config):
        config["training"]["seed"] = set_seed(
            seed if seed in (-1, None) else seed + get_rank()
        )
    registry.register("seed", config["training"]["seed"])
    registry.register("config", config)

    setup_compilation_cache(config)
    save_dir, log_dir, _ = setup_run_folder(config)
    setup_logger(output=log_dir, color=config["training"]["colored_logs"],
                 disable=config["training"]["should_not_log"])
    suppress_output(is_main())
    configuration.pretty_print()

    trainer = build_trainer(config)
    trainer.load()
    if predict:
        trainer.inference()
    else:
        trainer.train()
    return trainer


def run(opts: typing.Optional[typing.List[str]] = None, predict: bool = False):
    from mmf_tpu.config.configuration import Configuration
    from mmf_tpu.utils.distributed import infer_init_method
    from mmf_tpu.utils.env import setup_imports

    setup_imports()

    if opts is None:
        parser = flags.get_parser()
        args = parser.parse_args()
    else:
        args = argparse_namespace(opts)

    configuration = Configuration(args)
    config = configuration.get_config()

    if config["distributed"].get("init_method", None) is None:
        infer_init_method(config)

    needs_dist = (
        config["distributed"].get("init_method", None) is not None
        and (config["distributed"].get("world_size", 1) or 1) > 1
    )
    return main(configuration, init_distributed=needs_dist, predict=predict)


def argparse_namespace(opts):
    import argparse

    return argparse.Namespace(config_override=None, local_rank=None, opts=opts)


if __name__ == "__main__":
    run()
