"""Real 2-process jax.distributed coverage (VERDICT r1 item 6).

Every other test runs single-process (the 8-device mesh lives inside one
process); this spawns two actual CPU processes through
``distributed_init`` and exercises the cross-process primitives the
multi-host story depends on: broadcast_scalar, gather_tensor_along_batch,
reduce_dict, TestReporter report assembly, and disjoint per-process
loader shards (reference surface: mmf/utils/distributed.py:332-390)."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]

sys.path.insert(0, %(repo)r)
os.chdir(%(repo)r)
from mmf_tpu.config import omega
from mmf_tpu.utils import distributed as dist

config = omega.create({
    "distributed": {
        "init_method": f"tcp://127.0.0.1:{port}",
        "world_size": 2,
        "rank": rank,
    }
})
got_rank = dist.distributed_init(config)
assert got_rank == rank, (got_rank, rank)
assert dist.get_world_size() == 2
assert dist.is_main() == (rank == 0)

import numpy as np

# host-scalar broadcast from process 0 (dataset-choice sync path)
chosen = dist.broadcast_scalar(17 if rank == 0 else -1, src=0)

# cross-process batch gather (TestReporter field assembly path)
local = np.full((2, 3), float(rank), np.float32)
gathered = dist.gather_tensor_along_batch(local)

# scalar dict mean-reduce (Meter path)
reduced = dist.reduce_dict({"loss": np.asarray(float(rank + 1))})

# per-process loader shards must be disjoint and same-length
from mmf_tpu.datasets.loader import EpochSampler
sampler = EpochSampler(10, shuffle=True, seed=5, num_replicas=2, rank=rank)
indices = list(sampler)

# cross-process report assembly through the real TestReporter gather
from mmf_tpu.common.report import Report
from mmf_tpu.common.sample import SampleList
batch = SampleList([{"question_id": np.asarray(rank * 2 + i)}
                    for i in range(2)])
report = Report(batch, {"scores": np.eye(2, dtype=np.float32)})

with open(out_path, "w") as f:
    json.dump({
        "rank": rank,
        "chosen": int(chosen),
        "gathered": np.asarray(gathered).tolist(),
        "reduced_loss": float(reduced["loss"]),
        "indices": indices,
        "question_ids": dist.gather_tensor_along_batch(
            np.asarray(report["question_id"])).tolist(),
    }, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER % {"repo": REPO})
    port = _free_port()

    procs = []
    outs = []
    for rank in range(2):
        out = tmp_path / f"out_{rank}.json"
        outs.append(out)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)  # no virtual devices: 1 device/proc
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker_py), str(rank), str(port),
                 str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log}"

    results = [json.loads(o.read_text()) for o in outs]
    by_rank = {r["rank"]: r for r in results}
    assert set(by_rank) == {0, 1}

    for r in results:
        # rank0's scalar won on every process
        assert r["chosen"] == 17
        # both ranks see the same gathered tensor: rank0's rows then rank1's
        g = r["gathered"]
        assert g == [[0.0] * 3] * 2 + [[1.0] * 3] * 2
        # mean of losses 1.0 and 2.0
        assert r["reduced_loss"] == pytest.approx(1.5)
        # both ranks assembled all four question ids
        assert sorted(r["question_ids"]) == [0, 1, 2, 3]

    # loader shards: equal length, disjoint, covering the dataset
    i0, i1 = by_rank[0]["indices"], by_rank[1]["indices"]
    assert len(i0) == len(i1) == 5
    assert set(i0).isdisjoint(set(i1))
    assert set(i0) | set(i1) == set(range(10))
