"""mmf_serve: production batched-inference HTTP server.

Beyond reference parity (the reference stops at the mmf_interactive
REPL, mmf_cli/interactive.py:19-60): serves a checkpointed model behind
/v1/predict with dynamic micro-batching and bucket-padded jit batches.

  mmf_serve checkpoint=save/model_final.ckpt port=8080 \
            max_batch_size=32 max_wait_ms=5 quant=int8

Flags (key=value):
  checkpoint      (required) MMF checkpoint path (or zoo key)
  host            bind address          [127.0.0.1]
  port            TCP port              [8080]
  max_batch_size  largest device batch  [32]
  max_wait_ms     batching window       [5]
  quant           serving precision: none|int8 (sets MMF_TPU_QUANT)
  compilation_cache_dir  persistent XLA cache: warm restarts reload
                         compiled bucket executables instead of
                         recompiling (minutes -> seconds)

Bucket executables compile lazily (first request at each bucket size);
use ServingEngine.warmup(example) from the library API to precompile.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import List, Optional

logger = logging.getLogger("mmf_tpu")

_DEFAULTS = {
    "checkpoint": None,
    "host": "127.0.0.1",
    "port": "8080",
    "max_batch_size": "32",
    "max_wait_ms": "5",
    "quant": "none",
    "compilation_cache_dir": "",
}


def parse_opts(opts: List[str]) -> dict:
    cfg = dict(_DEFAULTS)
    for opt in opts:
        if "=" not in opt:
            raise SystemExit(f"mmf_serve: expected key=value, got {opt!r}")
        k, v = opt.split("=", 1)
        if k not in cfg:
            raise SystemExit(
                f"mmf_serve: unknown flag {k!r} "
                f"(known: {', '.join(sorted(cfg))})"
            )
        cfg[k] = v
    if not cfg["checkpoint"]:
        raise SystemExit("mmf_serve: checkpoint=<path> is required")
    return cfg


def build_server(cfg: dict):
    """Construct (but don't start) the ServingServer from parsed flags."""
    if cfg["quant"] and cfg["quant"] != "none":
        os.environ["MMF_TPU_QUANT"] = cfg["quant"]

    from mmf_tpu.serving.engine import ServingEngine
    from mmf_tpu.serving.server import ServingServer
    from mmf_tpu.utils.env import setup_compilation_cache, setup_imports

    setup_imports()
    if cfg.get("compilation_cache_dir"):
        setup_compilation_cache(cache_dir=cfg["compilation_cache_dir"])
    engine = ServingEngine.from_checkpoint(
        cfg["checkpoint"], max_batch_size=int(cfg["max_batch_size"])
    )
    return ServingServer(
        engine,
        host=cfg["host"],
        port=int(cfg["port"]),
        max_wait_ms=float(cfg["max_wait_ms"]),
    )


def serve(opts: Optional[List[str]] = None):
    logging.basicConfig(level=logging.INFO)
    cfg = parse_opts(sys.argv[1:] if opts is None else opts)
    server = build_server(cfg)
    logger.info(
        "mmf_serve: listening on http://%s:%d (buckets %s)",
        cfg["host"], server.port, list(server.engine.buckets),
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("mmf_serve: shutting down")
        server.shutdown()


if __name__ == "__main__":
    serve()
