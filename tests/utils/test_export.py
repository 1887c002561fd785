"""AOT export round-trip — the TorchScript-parity surface
(reference tests compile torch.jit.script(model) and compare outputs;
here the artifact is a serialized StableHLO module)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.env import setup_imports
from mmf_tpu.utils.export import (
    export_forward,
    export_model_forward,
    getattr_scriptable,
    load_exported,
)

setup_imports()


def test_getattr_scriptable():
    d = {"a": 1}
    assert getattr_scriptable(d, "a") == 1
    assert getattr_scriptable(d, "b") is None
    assert getattr_scriptable(d, "b", 7) == 7


def test_export_roundtrip_plain_fn():
    def f(x, y):
        return jnp.tanh(x) @ y

    x = jnp.ones((4, 8), jnp.float32)
    y = jnp.ones((8, 2), jnp.float32)
    blob = export_forward(f, x, y)
    assert isinstance(blob, (bytes, bytearray))
    g = load_exported(bytes(blob))
    np.testing.assert_allclose(np.asarray(g(x, y)), np.asarray(f(x, y)),
                               rtol=1e-6)


def test_export_visual_bert_forward_matches():
    """Serialize a small VisualBERT classification forward and assert the
    reloaded module reproduces the live logits exactly."""
    from tests.models.test_visual_bert import _batch, _small_config

    cls = registry.get_model_class("visual_bert")
    model = cls(config=_small_config())
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)

    live = model.apply(variables, batch, False)["scores"]

    blob = export_model_forward(model, variables, batch, train=False)
    from mmf_tpu.utils.export import _split_static

    array_batch, _ = _split_static(batch)
    served = load_exported(blob)(variables, array_batch)["scores"]
    np.testing.assert_allclose(np.asarray(served), np.asarray(live),
                               rtol=1e-6, atol=1e-6)
