"""Hyperparameter sweep library (parity with mmf/tools/sweeps/lib):
fairseq-style grid/random sweeps launched over SLURM or locally."""

from tools.sweeps.lib.sweep import (  # noqa: F401
    get_args,
    has_failed,
    has_finished,
    has_started,
    hyperparam,
    main,
    run_state,
    snapshot_code,
)
