"""TPU-native serving stack: dynamic micro-batching over a fixed-shape
jitted forward, behind a production HTTP surface.

The reference stops at ``mmf_interactive`` (a REPL over
mmf/utils/inference.py:15-76); serving at scale is left to the user.
On TPU, serving well requires exactly the machinery a REPL hides:
requests must be aggregated into fixed-shape batches (XLA compiles per
shape), padded to a small set of bucket sizes (bounded compile count),
and pipelined so the chip never idles between requests. This package is
that machinery:

- :class:`~mmf_tpu.serving.batcher.MicroBatcher` — request queue +
  batching loop (max batch / max wait), futures back to callers.
- :class:`~mmf_tpu.serving.engine.ServingEngine` — stacks request
  samples into bucket-padded device batches, drives the jitted forward,
  trims and splits the outputs.
- :mod:`~mmf_tpu.serving.server` — threaded HTTP server exposing
  /v1/predict, /healthz and /v1/stats.

CLI: ``mmf_serve checkpoint=<path> port=8080``.
"""

from mmf_tpu.serving.batcher import MicroBatcher
from mmf_tpu.serving.engine import ServingEngine

__all__ = ["MicroBatcher", "ServingEngine"]
