import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.modules.losses import Losses, MMFLoss


def _sl(targets, **extra):
    d = {"targets": targets, "dataset_name": "vqa2", "dataset_type": "train"}
    d.update(extra)
    return d


def test_logit_bce_matches_torch_formula():
    # golden value computed from the BCE-with-logits formula
    scores = jnp.asarray([[0.5, -1.0], [2.0, 0.0]])
    targets = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    loss_fn = MMFLoss("logit_bce")
    out = loss_fn(_sl(targets), {"scores": scores})
    key = "train/vqa2/logit_bce"
    assert key in out
    # manual: mean(elementwise bce) * n_classes
    import math

    def bce(x, t):
        return max(x, 0) - x * t + math.log1p(math.exp(-abs(x)))

    manual = np.mean(
        [bce(0.5, 1), bce(-1.0, 0), bce(2.0, 0), bce(0.0, 1)]
    ) * 2
    np.testing.assert_allclose(float(out[key]), manual, rtol=1e-5)


def test_cross_entropy_ignore_index():
    scores = jnp.asarray([[2.0, 1.0], [0.5, 0.5], [1.0, 3.0]])
    targets = jnp.asarray([0, -100, 1])
    loss_fn = MMFLoss("cross_entropy")
    out = list(loss_fn(_sl(targets), {"scores": scores}).values())[0]
    lp = np.log(np.exp([2.0, 1.0]) / np.exp([2.0, 1.0]).sum())
    lp2 = np.log(np.exp([1.0, 3.0]) / np.exp([1.0, 3.0]).sum())
    manual = -(lp[0] + lp2[1]) / 2
    np.testing.assert_allclose(float(out), manual, rtol=1e-5)


def test_m4c_decoding_bce_with_mask():
    B, T, V = 2, 3, 4
    scores = jnp.zeros((B, T, V))
    targets = jnp.ones((B, T, V)) * 0.5
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    loss_fn = MMFLoss("m4c_decoding_bce_with_mask")
    out = list(
        loss_fn(_sl(targets, train_loss_mask=mask), {"scores": scores}).values()
    )[0]
    # bce(0, 0.5) = log(2) per element; masked sum = 3 steps * 4 vocab
    manual = np.log(2) * 3 * 4 / 3
    np.testing.assert_allclose(float(out), manual, rtol=1e-5)


def test_label_smoothing_matches_plain_ce_at_zero():
    scores = jnp.asarray([[2.0, 1.0, 0.5], [0.1, 3.0, 0.2]])
    targets = jnp.asarray([0, 1])
    ls = MMFLoss({"type": "label_smoothing_cross_entropy",
                  "params": {"label_smoothing": 1e-9}})
    ce = MMFLoss("cross_entropy")
    v1 = float(list(ls(_sl(targets), {"scores": scores}).values())[0])
    v2 = float(list(ce(_sl(targets), {"scores": scores}).values())[0])
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_multi_loss_weighting():
    scores = jnp.asarray([[0.5, -1.0]])
    targets = jnp.asarray([[1.0, 0.0]])
    multi = MMFLoss(
        {
            "type": "multi",
            "params": [
                {"type": "logit_bce", "weight": 0.25},
                {"type": "mse", "weight": 0.5},
            ],
        }
    )
    single_bce = MMFLoss("logit_bce")
    single_mse = MMFLoss("mse")
    out = float(list(multi(_sl(targets), {"scores": scores}).values())[0])
    b = float(list(single_bce(_sl(targets), {"scores": scores}).values())[0])
    m = float(list(single_mse(_sl(targets), {"scores": scores}).values())[0])
    np.testing.assert_allclose(out, 0.25 * b + 0.5 * m, rtol=1e-6)


def test_bce_kl_returns_two_keys():
    scores = jnp.asarray([[0.5, -1.0]])
    targets = jnp.asarray([[1.0, 0.0]])
    loss_fn = MMFLoss({"type": "bce_kl", "params": {"weight_softmax": 0.1}})
    out = loss_fn(_sl(targets), {"scores": scores})
    assert set(out.keys()) == {"train/vqa2/bce_kl/kl", "train/vqa2/bce_kl/bce"}


def test_in_batch_hinge_zero_when_diag_dominates():
    emb = jnp.eye(4) * 10.0
    loss_fn = MMFLoss({"type": "in_batch_hinge", "params": {"margin": 0.2}})
    out = float(
        list(loss_fn(_sl(emb), {"scores": emb, "targets": emb}).values())[0]
    )
    assert out == 0.0


def test_contrastive_loss_perfect_alignment_low():
    emb = np.eye(4, 8).astype(np.float32) * 5
    out_fn = MMFLoss("contrastive_loss")
    model_out = {
        "embedding_1": jnp.asarray(emb),
        "embedding_2": jnp.asarray(emb),
        "temperature": jnp.asarray(1.0),
    }
    loss = float(list(out_fn(_sl(jnp.zeros((4, 1))), model_out).values())[0])
    assert loss < 0.01


def test_losses_container_no_targets_warns():
    container = Losses([{"type": "logit_bce"}])
    with pytest.warns(UserWarning):
        out = container({"dataset_name": "x", "dataset_type": "train"}, {})
    assert out == {}


def test_ms_loss_runs():
    fused = jnp.asarray(np.random.RandomState(0).randn(6, 8).astype(np.float32))
    targets = jnp.asarray([0, 0, 1, 1, 2, 2])
    loss_fn = MMFLoss("ms_loss")
    v = float(list(loss_fn(_sl(targets), {"fused_embedding": fused}).values())[0])
    assert np.isfinite(v) and v >= 0


def test_caption_cross_entropy_with_lengths():
    B, T, V = 2, 4, 5
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, V, (B, T)))
    sl = _sl(targets, caption_len=jnp.asarray([4, 3]))
    v = float(
        list(MMFLoss("caption_cross_entropy")(sl, {"scores": scores}).values())[0]
    )
    assert np.isfinite(v)
