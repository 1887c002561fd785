"""Shared helpers for gradient-parity tests against the torch reference.

Gradient dicts are converted through the SAME rename/transpose maps as
the weights (conversion is linear: pure rename + transpose), so a torch
``p.grad`` tree can be compared leaf-exact in flax layout.
"""

import numpy as np


def grad_dict_np(module):
    """named_parameters -> numpy grads; None (unused params) -> zeros."""
    return {
        k: (
            p.grad.detach().numpy()
            if p.grad is not None
            else np.zeros(p.shape, np.float32)
        )
        for k, p in module.named_parameters()
    }


def rel_err(a, b, floor=1e-8):
    """Max-abs error relative to the reference leaf's scale, with a floor:
    leaves whose true gradient is analytically ~zero (e.g. attention key
    bias — softmax is shift-invariant along keys, so its gradient is pure
    f32 cancellation noise on BOTH frameworks) must not be compared
    noise-to-noise; the floor ties them to the global gradient scale."""
    denom = max(float(np.max(np.abs(b))), floor)
    return float(np.max(np.abs(a - b))) / denom


def global_scale(flat_ref):
    return max(
        float(np.max(np.abs(np.asarray(v)))) for v in flat_ref.values()
    )


def assert_grad_trees_match(ours_tree, ref_tree, tol=5e-4, min_leaves=1):
    """Compare two flax-layout gradient pytrees leaf by leaf."""
    import jax

    flat_ours = jax.tree_util.tree_flatten_with_path(ours_tree)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_tree)[0])
    floor = 1e-3 * global_scale(flat_ref)
    checked = 0
    for path, ours in flat_ours:
        theirs = np.asarray(flat_ref[path])
        err = rel_err(np.asarray(ours), theirs, floor=floor)
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        assert err < tol, f"gradient mismatch at {name}: rel {err:.2e}"
        checked += 1
    assert checked >= min_leaves
    return checked
