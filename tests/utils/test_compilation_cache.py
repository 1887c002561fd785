"""Persistent XLA compilation cache (env.compilation_cache_dir):
executables must be written on first compile and the config knob must
flow from the defaults schema. Runs in a subprocess because the cache
config must be set before executables are built, and we don't want to
mutate the test session's global jax config."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PROBE = r"""
import sys
sys.path.insert(0, sys.argv[2])
import jax, jax.numpy as jnp
from mmf_tpu.utils.env import setup_compilation_cache

cache_dir = sys.argv[1]
got = setup_compilation_cache(cache_dir=cache_dir)
assert got == cache_dir
x = jnp.arange(128.0).reshape(8, 16)
y = jax.jit(lambda a: (a @ a.T).sum())(x)
assert float(y) == float((x @ x.T).sum())
import os
entries = os.listdir(cache_dir)
assert entries, "no cache entries written"
print("entries:", len(entries))
"""


def test_compilation_cache_writes_entries(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    cache = str(tmp_path / "xla_cache")
    proc = subprocess.run(
        [sys.executable, "-c", PROBE, cache, REPO],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "entries:" in proc.stdout


def test_compilation_cache_noop_when_unset():
    from mmf_tpu.utils.env import setup_compilation_cache

    assert setup_compilation_cache(config={"env": {}}) is None
    assert setup_compilation_cache(config=None) is None


def test_defaults_schema_has_cache_knob():
    from mmf_tpu.config.configuration import Configuration

    cfg = Configuration([]).get_config()
    assert "compilation_cache_dir" in cfg["env"]
