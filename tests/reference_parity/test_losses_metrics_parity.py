"""Loss and metric golden parity: identical numpy inputs through the
reference torch implementations and our JAX implementations must agree
(reference mmf/modules/losses.py, mmf/modules/metrics.py)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

RTOL = 1e-5
ATOL = 1e-6


class _AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.modules.losses as ref_losses
    import mmf.modules.metrics as ref_metrics

    yield {"losses": ref_losses, "metrics": ref_metrics}
    shims.uninstall()


def _ours(loss_key, params=None):
    from mmf_tpu.common.registry import registry

    cls = registry.get_loss_class(loss_key)
    return cls(**params) if params else cls()


def _torchify(d):
    import torch

    return _AttrDict(
        {k: torch.from_numpy(v) if isinstance(v, np.ndarray) else v
         for k, v in d.items()}
    )


def _compare(ref_loss, our_loss, sample, output):
    import torch

    with torch.no_grad():
        t_val = ref_loss(_torchify(sample), _torchify(output))
    j_val = our_loss(sample, output)
    np.testing.assert_allclose(
        np.asarray(j_val, np.float32), float(t_val), rtol=RTOL, atol=ATOL
    )


def test_logit_bce(ref):
    rng = np.random.RandomState(0)
    sample = {"targets": rng.rand(4, 7).astype(np.float32)}
    output = {"scores": rng.randn(4, 7).astype(np.float32)}
    _compare(ref["losses"].LogitBinaryCrossEntropy(), _ours("logit_bce"),
             sample, output)


def test_triple_logit_bce_3d(ref):
    rng = np.random.RandomState(1)
    sample = {"targets": rng.rand(4, 7).astype(np.float32)}
    output = {"scores": rng.randn(4, 3, 7).astype(np.float32)}
    _compare(ref["losses"].TripleLogitBinaryCrossEntropy(),
             _ours("triple_logit_bce"), sample, output)


def test_cross_entropy(ref):
    rng = np.random.RandomState(2)
    sample = {"targets": rng.randint(0, 7, (5,))}
    output = {"scores": rng.randn(5, 7).astype(np.float32)}
    _compare(ref["losses"].CrossEntropyLoss(), _ours("cross_entropy"),
             sample, output)


def test_soft_label_cross_entropy(ref):
    rng = np.random.RandomState(3)
    t = rng.rand(5, 7).astype(np.float32)
    t /= t.sum(1, keepdims=True)
    sample = {"targets": t}
    output = {"scores": rng.randn(5, 7).astype(np.float32)}
    _compare(ref["losses"].SoftLabelCrossEntropyLoss(),
             _ours("soft_label_cross_entropy"), sample, output)


def test_label_smoothing_cross_entropy(ref):
    rng = np.random.RandomState(4)
    sample = {"targets": rng.randint(0, 7, (5,))}
    output = {"scores": rng.randn(5, 7).astype(np.float32)}
    _compare(ref["losses"].LabelSmoothingCrossEntropyLoss(label_smoothing=0.1),
             _ours("label_smoothing_cross_entropy",
                   {"label_smoothing": 0.1}),
             sample, output)


def test_in_batch_hinge(ref):
    rng = np.random.RandomState(5)
    sample = {}
    output = {"scores": rng.randn(4, 8).astype(np.float32),
              "targets": rng.randn(4, 8).astype(np.float32)}
    _compare(ref["losses"].InBatchHinge(margin=0.2, hard=False),
             _ours("in_batch_hinge", {"margin": 0.2, "hard": False}),
             sample, output)
    _compare(ref["losses"].InBatchHinge(margin=0.2, hard=True),
             _ours("in_batch_hinge", {"margin": 0.2, "hard": True}),
             sample, output)


def test_in_batch_hinge_multi_gt(ref):
    rng = np.random.RandomState(6)
    sample = {}
    output = {"scores": rng.randn(3, 8).astype(np.float32),
              "targets": rng.randn(9, 8).astype(np.float32)}
    _compare(ref["losses"].InBatchHinge(margin=0.1),
             _ours("in_batch_hinge", {"margin": 0.1}), sample, output)


def test_contrastive_loss(ref):
    rng = np.random.RandomState(7)

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    sample = {}
    output = {
        "embedding_1": norm(rng.randn(4, 8).astype(np.float32)),
        "embedding_2": norm(rng.randn(4, 8).astype(np.float32)),
        "temperature": np.asarray(0.07, np.float32),
    }
    _compare(ref["losses"].ContrastiveLoss(), _ours("contrastive_loss"),
             sample, output)


def test_m4c_decoding_bce_with_mask(ref):
    rng = np.random.RandomState(8)
    sample = {
        "targets": (rng.rand(3, 5, 9) > 0.8).astype(np.float32),
        "train_loss_mask": (rng.rand(3, 5) > 0.3).astype(np.float32),
    }
    output = {"scores": rng.randn(3, 5, 9).astype(np.float32)}
    _compare(ref["losses"].M4CDecodingBCEWithMaskLoss(),
             _ours("m4c_decoding_bce_with_mask"), sample, output)


def test_mse_and_cos_emb(ref):
    rng = np.random.RandomState(9)
    sample = {"targets": rng.randn(4, 6).astype(np.float32)}
    output = {"scores": rng.randn(4, 6).astype(np.float32)}
    _compare(ref["losses"].MSELoss(), _ours("mse"), sample, output)
    _compare(ref["losses"].CosineEmbeddingLoss(), _ours("cos_emb_loss"),
             sample, output)


# --------------------------- metrics ---------------------------------------
def _compare_metric(ref_metric, our_key, sample, output, **kw):
    from mmf_tpu.common.registry import registry

    import torch

    with torch.no_grad():
        t_val = ref_metric.calculate(_torchify(sample), _torchify(output))
    ours = registry.get_metric_class(our_key)(**kw)
    j_val = ours.calculate(sample, output)
    np.testing.assert_allclose(
        np.asarray(j_val, np.float32), float(t_val), rtol=1e-5, atol=1e-6
    )


def test_accuracy_metric(ref):
    rng = np.random.RandomState(10)
    sample = {"targets": rng.randint(0, 5, (16,))}
    output = {"scores": rng.randn(16, 5).astype(np.float32)}
    _compare_metric(ref["metrics"].Accuracy(), "accuracy", sample, output)


def test_vqa_accuracy_metric(ref):
    rng = np.random.RandomState(11)
    sample = {"targets": rng.rand(16, 5).astype(np.float32)}
    output = {"scores": rng.randn(16, 5).astype(np.float32)}
    _compare_metric(ref["metrics"].VQAAccuracy(), "vqa_accuracy", sample,
                    output)


def test_binary_f1_and_roc_auc(ref):
    rng = np.random.RandomState(12)
    sample = {"targets": rng.randint(0, 2, (32,))}
    output = {"scores": rng.randn(32, 2).astype(np.float32)}
    _compare_metric(ref["metrics"].BinaryF1(), "binary_f1", sample, output)
    _compare_metric(ref["metrics"].ROC_AUC(), "roc_auc", sample, output)


def test_recall_at_k(ref):
    # exactly 100 options: the reference's score_to_ranks only ranks the
    # top-100 (VisDial's option count), so parity holds on its intended
    # domain
    rng = np.random.RandomState(13)
    scores = rng.randn(10, 100).astype(np.float32)
    targets = np.zeros((10, 100), np.float32)
    targets[np.arange(10), rng.randint(0, 100, 10)] = 1.0
    sample = {"targets": targets}
    output = {"scores": scores}
    _compare_metric(ref["metrics"].RecallAt5(), "r@5", sample, output)
    _compare_metric(ref["metrics"].RecallAt10(), "r@10", sample, output)
    _compare_metric(ref["metrics"].MeanRank(), "mean_r", sample, output)
    _compare_metric(ref["metrics"].MeanReciprocalRank(), "mean_rr", sample,
                    output)
