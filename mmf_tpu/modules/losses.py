"""Loss library: pure-jnp losses with the reference's registry keys and
namespacing semantics (mmf/modules/losses.py).

Every loss is a callable ``loss(sample_list, model_output) -> scalar | dict``
operating on dict pytrees inside jit. ``Losses``/``MMFLoss`` reproduce the
``<type>/<dataset>/<loss>`` key contract (losses.py:132-222) that the Meter,
logs, and tests depend on.

Dynamic-shape torch idioms (masked_select loops in ms_loss/refiner losses)
are re-expressed as fixed-shape masked reductions — the TPU-correct form.
"""

from __future__ import annotations

import collections.abc
import warnings
from typing import Any, Dict, List, Union

import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry

EPS = 1.0e-16


def sigmoid_bce_with_logits(scores, targets):
    """Elementwise binary cross entropy on logits (stable form)."""
    return jnp.maximum(scores, 0) - scores * targets + jnp.log1p(
        jnp.exp(-jnp.abs(scores))
    )


def _kl_div_rowsum(log_x, y):
    """sum_j y * (log y - log x), treating y==0 terms as 0
    (reference losses.py:383-391)."""
    log_y = jnp.log(jnp.where(y == 0, 1.0, y))
    res = y * (log_y - log_x)
    return jnp.sum(res, axis=1, keepdims=True)


def _normalized_targets(targets):
    tar_sum = jnp.sum(targets, axis=1, keepdims=True)
    tar_sum = jnp.where(tar_sum == 0, 1.0e-6, tar_sum)
    return targets / tar_sum, tar_sum


# ---------------------------------------------------------------------------
# containers
# ---------------------------------------------------------------------------
class Losses:
    """Instantiates and applies the list of losses from model config
    (reference losses.py:52-129)."""

    def __init__(self, loss_list: List[Union[str, Dict[str, Any]]]):
        self.losses = [MMFLoss(loss) for loss in loss_list]
        config = registry.get("config", no_warning=True)
        self._evaluation_predict = False
        if config:
            self._evaluation_predict = (
                config.get("evaluation", {}).get("predict", False)
            )

    def __call__(self, sample_list, model_output) -> Dict[str, jax.Array]:
        output: Dict[str, jax.Array] = {}
        if "targets" not in sample_list:
            if not self._evaluation_predict:
                warnings.warn(
                    "Sample list has no field 'targets', are you sure that "
                    "your ImDB has labels? you may have wanted to run with "
                    "evaluation.predict=true"
                )
            return output
        for loss in self.losses:
            output.update(loss(sample_list, model_output))
        return output


class MMFLoss:
    """Wraps a loss so its result is a dict keyed
    ``<dataset_type>/<dataset_name>/<loss_name>`` (losses.py:132-222)."""

    def __init__(self, params=None):
        if params is None:
            params = {}
        is_mapping = isinstance(params, collections.abc.Mapping)
        if is_mapping:
            if "type" not in params:
                raise ValueError(
                    "Parameters to loss must have 'type' field to "
                    "specify type of loss to instantiate"
                )
            loss_name = params["type"]
        else:
            assert isinstance(params, str), (
                "loss must be a string or dictionary with 'type' key"
            )
            loss_name = params

        self.name = loss_name
        loss_class = registry.get_loss_class(loss_name)
        if loss_class is None:
            raise ValueError(
                f"No loss named {loss_name} is registered to registry"
            )
        if loss_name.startswith("multi"):
            assert is_mapping
            self.loss_criterion = loss_class(params)
        else:
            loss_params = params.get("params", {}) if is_mapping else {}
            self.loss_criterion = loss_class(**loss_params)

    def __call__(self, sample_list, model_output) -> Dict[str, jax.Array]:
        loss_dict = {}
        datasets = getattr(self.loss_criterion, "datasets", None)
        dataset_name = _get_meta(sample_list, "dataset_name")
        dataset_type = _get_meta(sample_list, "dataset_type")
        if isinstance(datasets, list) and dataset_name not in datasets:
            return loss_dict

        loss_result = self.loss_criterion(sample_list, model_output)
        if not isinstance(loss_result, collections.abc.Mapping):
            loss_result = {"": loss_result}
        for child_name, child_result in loss_result.items():
            key = f"{dataset_type}/{dataset_name}/{self.name}"
            key = f"{key}/{child_name}" if child_name else key
            loss_dict[key] = jnp.asarray(child_result, jnp.float32)
        return loss_dict


def _get_meta(sample_list, key):
    try:
        val = sample_list[key]
    except (KeyError, TypeError):
        val = None
    if val is None:
        return {"dataset_name": "unknown", "dataset_type": "train"}[key] \
            if key in ("dataset_name", "dataset_type") else None
    if isinstance(val, list):
        return val[0]
    return val


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------
@registry.register_loss("logit_bce")
class LogitBinaryCrossEntropy:
    """Mean BCE-with-logits scaled by num classes (losses.py:225)."""

    def __call__(self, sample_list, model_output):
        scores = model_output["scores"]
        targets = sample_list["targets"]
        loss = jnp.mean(sigmoid_bce_with_logits(scores, targets))
        return loss * targets.shape[1]


@registry.register_loss("triple_logit_bce")
class TripleLogitBinaryCrossEntropy:
    """Three-branch fusion BCE (losses.py:254)."""

    def __call__(self, sample_list, model_output):
        scores = model_output["scores"]
        targets = sample_list["targets"]
        if scores.ndim == 3:
            loss = (
                jnp.mean(sigmoid_bce_with_logits(scores[:, 0], targets))
                + jnp.mean(sigmoid_bce_with_logits(scores[:, 1], targets))
                + jnp.mean(sigmoid_bce_with_logits(scores[:, 2], targets))
            )
        else:
            loss = jnp.mean(sigmoid_bce_with_logits(scores, targets))
        return loss * targets.shape[-1]


@registry.register_loss("bce")
class BinaryCrossEntropyLoss:
    def __call__(self, sample_list, model_output):
        scores = model_output["scores"]
        targets = sample_list["targets"]
        scores = jnp.clip(scores, EPS, 1.0 - EPS)
        loss = -jnp.mean(
            targets * jnp.log(scores) + (1.0 - targets) * jnp.log(1.0 - scores)
        )
        return loss * targets.shape[1]


@registry.register_loss("caption_cross_entropy")
class CaptionCrossEntropyLoss:
    """Per-token CE masked to each caption's decode length
    (losses.py:317; pack_padded_sequence -> fixed-shape mask)."""

    def __call__(self, sample_list, model_output):
        scores = model_output["scores"]  # [B, T, V]
        targets = sample_list["targets"]  # [B, T] int
        B, T = targets.shape[:2]
        if "caption_len" in sample_list:
            decode_lengths = sample_list["caption_len"] - 1
        else:
            decode_lengths = jnp.full((B,), T, jnp.int32)
        pos = jnp.arange(T)[None, :]
        mask = (pos < decode_lengths[:, None]).astype(jnp.float32)
        logprobs = jax.nn.log_softmax(scores, axis=-1)
        tok_ll = jnp.take_along_axis(
            logprobs, targets[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        loss = -jnp.sum(tok_ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss


@registry.register_loss("nll_loss")
class NLLLoss:
    """Negative log likelihood over argmax targets (losses.py:356)."""

    def __call__(self, sample_list, model_output):
        scores = model_output["scores"]  # log-probs
        targets = sample_list["targets"]
        idx = jnp.argmax(targets, axis=1)
        picked = jnp.take_along_axis(scores, idx[:, None], axis=1)[:, 0]
        loss = -jnp.mean(picked)
        return loss * targets.shape[1]


@registry.register_loss("multi")
class MultiLoss:
    """Weighted combination of child losses (losses.py:392)."""

    def __init__(self, params):
        self.losses = []
        self.losses_weights = []
        self.loss_names = []
        for loss_params in params["params"]:
            self.loss_names.append(loss_params["type"])
            self.losses.append(MMFLoss(loss_params))
            self.losses_weights.append(loss_params.get("weight", 1.0))

    def __call__(self, sample_list, model_output):
        loss = 0
        for idx, loss_fn in enumerate(self.losses):
            value = loss_fn(sample_list, model_output)
            loss += self.losses_weights[idx] * list(value.values())[0]
        return loss


@registry.register_loss("attention_supervision")
class AttentionSupervisionLoss:
    """Weighted BCE between attention maps and supervision
    (losses.py:449)."""

    def __call__(self, sample_list, model_output):
        attentions = model_output["attentions"]
        supervision = sample_list["info"]["attention_supervision"].astype(
            jnp.float32
        )
        att = jnp.clip(attentions[0], EPS, 1.0 - EPS)
        bce = -(supervision * jnp.log(att) + (1 - supervision) * jnp.log(1 - att))
        # torch BCE with weight: mean over weighted elements
        loss = jnp.mean(bce * supervision)
        return loss * supervision.shape[1]


@registry.register_loss("weighted_softmax")
class WeightedSoftmaxLoss:
    def __call__(self, sample_list, model_output):
        pred, targets = model_output["scores"], sample_list["targets"]
        tar, tar_sum = _normalized_targets(targets)
        res = jax.nn.log_softmax(pred, axis=1)
        loss = _kl_div_rowsum(res, tar) * tar_sum
        return jnp.sum(loss) / loss.shape[0]


@registry.register_loss("softmax_kldiv")
class SoftmaxKlDivLoss:
    def __call__(self, sample_list, model_output):
        pred, targets = model_output["scores"], sample_list["targets"]
        tar, _ = _normalized_targets(targets)
        res = jax.nn.log_softmax(pred, axis=1)
        loss = _kl_div_rowsum(res, tar)
        return jnp.sum(loss) / loss.shape[0]


@registry.register_loss("wrong")
class WrongLoss:
    """Historical behavior kept for parity (losses.py:526)."""

    def __call__(self, sample_list, model_output):
        pred, targets = model_output["scores"], sample_list["targets"]
        tar, _ = _normalized_targets(targets)
        res = jax.nn.log_softmax(pred, axis=1)
        # F.kl_div(reduction="mean") averages over ALL elements
        kl = jnp.where(tar == 0, 0.0, tar * (jnp.log(jnp.where(tar == 0, 1.0, tar)) - res))
        loss = jnp.mean(kl) * targets.shape[1]
        return loss


@registry.register_loss("bce_kl_combined")
class CombinedLoss:
    def __init__(self, weight_softmax):
        self.weight_softmax = weight_softmax

    def __call__(self, sample_list, model_output):
        pred, targets = model_output["scores"], sample_list["targets"]
        tar, _ = _normalized_targets(targets)
        res = jax.nn.log_softmax(pred, axis=1)
        loss1 = jnp.sum(_kl_div_rowsum(res, tar)) / pred.shape[0]
        loss2 = jnp.mean(sigmoid_bce_with_logits(pred, targets)) * targets.shape[1]
        return self.weight_softmax * loss1 + loss2


@registry.register_loss("bce_kl")
class BCEAndKLLoss:
    """Returns both component losses as a dict (losses.py:840)."""

    def __init__(self, weight_softmax):
        self.weight_softmax = weight_softmax

    def __call__(self, sample_list, model_output):
        pred, targets = model_output["scores"], sample_list["targets"]
        tar, _ = _normalized_targets(targets)
        res = jax.nn.log_softmax(pred, axis=1)
        loss1 = jnp.sum(_kl_div_rowsum(res, tar)) / pred.shape[0]
        loss2 = jnp.mean(sigmoid_bce_with_logits(pred, targets)) * targets.shape[1]
        return {"kl": self.weight_softmax * loss1, "bce": loss2}


@registry.register_loss("m4c_decoding_bce_with_mask")
class M4CDecodingBCEWithMaskLoss:
    """BCE over decode steps masked by train_loss_mask (losses.py:575)."""

    def __call__(self, sample_list, model_output):
        scores = model_output["scores"]  # [B, T, V]
        targets = sample_list["targets"]
        loss_mask = sample_list["train_loss_mask"]  # [B, T]
        assert scores.ndim == 3 and loss_mask.ndim == 2
        losses = sigmoid_bce_with_logits(scores, targets)
        losses = losses * loss_mask[..., None]
        count = jnp.maximum(jnp.sum(loss_mask), 1.0)
        return jnp.sum(losses) / count


@registry.register_loss("cross_entropy")
class CrossEntropyLoss:
    def __init__(self, **params):
        self.ignore_index = params.get("ignore_index", -100)

    def __call__(self, sample_list, model_output):
        scores = model_output["scores"]
        targets = sample_list["targets"].astype(jnp.int32)
        logprobs = jax.nn.log_softmax(scores, axis=-1)
        valid = targets != self.ignore_index
        safe_targets = jnp.where(valid, targets, 0)
        picked = jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[
            ..., 0
        ]
        picked = jnp.where(valid, picked, 0.0)
        return -jnp.sum(picked) / jnp.maximum(jnp.sum(valid), 1)


@registry.register_loss("soft_label_cross_entropy")
class SoftLabelCrossEntropyLoss:
    """CE against soft targets with ignore_index masking (losses.py:605)."""

    def __init__(self, ignore_index=-100, reduction="mean",
                 normalize_targets=True):
        assert reduction in ("mean", "sum")
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.normalize_targets = normalize_targets
        self.eps = float(jnp.finfo(jnp.float32).eps)

    def compute_loss(self, targets, scores):
        if targets.ndim == 1:
            mask = (targets != self.ignore_index).astype(jnp.float32)[:, None]
            one_hot = jax.nn.one_hot(
                jnp.where(targets == self.ignore_index, 0, targets).astype(
                    jnp.int32
                ),
                scores.shape[1],
            )
            targets = one_hot
        else:
            mask = (jnp.sum(targets, -1, keepdims=True) != 0).astype(jnp.float32)
        targets = targets.astype(jnp.float32) * mask
        if self.normalize_targets:
            targets = targets / (self.eps + jnp.sum(targets, 1, keepdims=True))
        per_sample = -jnp.sum(targets * jax.nn.log_softmax(scores, -1), -1)
        loss = jnp.sum(per_sample)
        if self.reduction == "mean":
            denom = jnp.maximum(jnp.sum(jnp.sum(mask, -1) > 0), 1)
            loss = loss / denom
        return loss

    def __call__(self, sample_list, model_output):
        return self.compute_loss(sample_list["targets"], model_output["scores"])


@registry.register_loss("label_smoothing_cross_entropy")
class LabelSmoothingCrossEntropyLoss(SoftLabelCrossEntropyLoss):
    """Smoothed one-hot: 1-ls for the true class, ls/(C-1) elsewhere
    (losses.py:669)."""

    def __init__(self, label_smoothing=0.1, reduction="mean",
                 ignore_index=-100):
        assert 0 <= label_smoothing < 1
        super().__init__(ignore_index, reduction, False)
        self.label_smoothing = label_smoothing

    def smooth_targets(self, targets, n_classes):
        if targets.ndim == 1:
            targets = targets[:, None]
        mask = targets != self.ignore_index
        smoothing_value = self.label_smoothing / (n_classes - 1)
        one_hot = jnp.full((targets.shape[0], n_classes), smoothing_value)
        idx = (targets * mask).astype(jnp.int32)[:, 0]
        one_hot = one_hot.at[jnp.arange(targets.shape[0]), idx].set(
            1 - self.label_smoothing
        )
        return one_hot * mask.astype(jnp.float32)

    def __call__(self, sample_list, model_output):
        scores = model_output["scores"]
        one_hot = self.smooth_targets(sample_list["targets"], scores.shape[1])
        return self.compute_loss(one_hot, scores)


@registry.register_loss("in_batch_hinge")
class InBatchHinge:
    """VSE++-style bidirectional hinge over an in-batch similarity matrix
    (losses.py:707)."""

    def __init__(self, margin: float = 0.0, hard: bool = False):
        self.margin = margin
        self.hard = hard

    def _compute_loss(self, correlations):
        diagonal = jnp.diag(correlations)[:, None]
        d1 = jnp.broadcast_to(diagonal, correlations.shape)
        d2 = jnp.broadcast_to(diagonal.T, correlations.shape)
        cost_s = jnp.clip(self.margin + correlations - d1, 0, None)
        cost_im = jnp.clip(self.margin + correlations - d2, 0, None)
        mask = 1 - jnp.eye(correlations.shape[0])
        cost_s = cost_s * mask
        cost_im = cost_im * mask
        if self.hard:
            cost_s = jnp.max(cost_s, axis=1)
            cost_im = jnp.max(cost_im, axis=0)
        return jnp.sum(cost_s) + jnp.sum(cost_im)

    def __call__(self, sample_list, model_output):
        image_embeddings = model_output["scores"]
        text_embeddings = model_output["targets"]
        if image_embeddings.shape[0] == text_embeddings.shape[0]:
            correlations = image_embeddings @ text_embeddings.T
            return self._compute_loss(correlations)
        assert text_embeddings.shape[0] % image_embeddings.shape[0] == 0
        batch_size, dim_size = image_embeddings.shape
        factor = text_embeddings.shape[0] // image_embeddings.shape[0]
        text_embeddings = text_embeddings.reshape(batch_size, factor, dim_size)
        correlations = jnp.einsum(
            "bd,fcd->fbc", image_embeddings,
            jnp.transpose(text_embeddings, (1, 0, 2)),
        )
        loss = 0.0
        for i in range(factor):
            loss += self._compute_loss(correlations[i])
        return loss


@registry.register_loss("contrastive_loss")
class ContrastiveLoss:
    """Symmetric InfoNCE (losses.py:765). Under SPMD jit the batch seen here
    is already global (GSPMD shards it), so the reference's cross-GPU gather
    is the identity; pass ``axis_name`` when used inside shard_map."""

    def __init__(self, axis_name=None):
        self.axis_name = axis_name

    def __call__(self, sample_list, model_output):
        emb1 = model_output["embedding_1"]
        emb2 = model_output["embedding_2"]
        assert emb1.shape[0] == emb2.shape[0]
        temperature = model_output["temperature"]

        if self.axis_name is not None:
            emb1_all = jax.lax.all_gather(emb1, self.axis_name, tiled=True)
            emb2_all = jax.lax.all_gather(emb2, self.axis_name, tiled=True)
            offset = jax.lax.axis_index(self.axis_name) * emb1.shape[0]
        else:
            emb1_all, emb2_all, offset = emb1, emb2, 0

        logits_1 = emb1 @ emb2_all.T / temperature
        logits_2 = emb2 @ emb1_all.T / temperature
        labels = offset + jnp.arange(emb1.shape[0])

        def ce(logits):
            lp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], 1))

        return (ce(logits_1) + ce(logits_2)) / 2


@registry.register_loss("mse")
class MSELoss:
    def __call__(self, sample_list, model_output):
        return jnp.mean(
            (model_output["scores"] - sample_list["targets"]) ** 2
        )


@registry.register_loss("cos_emb_loss")
class CosineEmbeddingLoss:
    """torch CosineEmbeddingLoss with y=1: mean(1 - cos_sim)."""

    def __call__(self, sample_list, model_output):
        s = model_output["scores"]
        t = sample_list["targets"]
        sim = jnp.sum(s * t, -1) / (
            jnp.linalg.norm(s, axis=-1) * jnp.linalg.norm(t, axis=-1) + EPS
        )
        return jnp.mean(1.0 - sim)


def _calc_ms_loss_masked(pairs, mask, base, param, multiplier):
    """log(1 + sum_masked exp(m*p*(pair-base))) / p with fixed shapes."""
    e = jnp.exp(multiplier * param * (pairs - base)) * mask
    return (1.0 / param) * jnp.log1p(jnp.sum(e))


@registry.register_loss("refiner_ms")
class RefinerMSLoss:
    """Multi-similarity loss between decoder outputs and their targets
    (losses.py:882), vectorized with masks instead of masked_select."""

    def __init__(self, alpha=50, beta=2, base=0.5, margin=0.1, epsilon=1e-16):
        self.alpha = alpha
        self.beta = beta
        self.base = base
        self.margin = margin
        self.epsilon = epsilon

    def __call__(self, sample_list, model_output):
        targets = sample_list["targets"]
        inputs = model_output["scores"]
        n = inputs.shape[0]
        sim_mat = inputs @ targets.T
        pos = jnp.diag(sim_mat)  # [n]
        neq = jnp.abs(sim_mat - pos[:, None]) > self.epsilon
        neg_mask = neq & (sim_mat + self.margin > pos[:, None])
        has_neg = jnp.any(neg_mask, axis=1)

        def per_row(i):
            pos_loss = (1.0 / self.beta) * jnp.log1p(
                jnp.exp(-self.beta * (pos[i] - self.base))
            )
            neg_loss = _calc_ms_loss_masked(
                sim_mat[i], neg_mask[i].astype(jnp.float32), self.base,
                self.alpha, 1,
            )
            return jnp.where(has_neg[i], pos_loss + neg_loss, 0.0)

        losses = jax.vmap(per_row)(jnp.arange(n))
        return jnp.sum(losses) / n


@registry.register_loss("ms_loss")
class MSLoss:
    """Multi-similarity loss over fused embeddings (losses.py:950),
    masked fixed-shape formulation with hard mining."""

    def __init__(self, alpha=50, beta=2, margin=0.5, hard_mining=True,
                 is_multilabel=False):
        self.alpha = alpha
        self.beta = beta
        self.margin = margin
        self.hard_mining = hard_mining
        self.is_multilabel = is_multilabel

    def __call__(self, sample_list, model_output):
        fused = model_output["fused_embedding"]
        inputs = fused / (jnp.linalg.norm(fused, axis=-1, keepdims=True) + EPS)
        targets = sample_list["targets"]
        n = inputs.shape[0]
        sim_mat = inputs @ inputs.T

        if self.is_multilabel:
            t = targets.astype(jnp.float32)
            same = (t @ t.T) > 0
            diff = (t @ t.T) < 1e-5
        else:
            same = targets[:, None] == targets[None, :]
            diff = ~same

        pos_mask = same & (sim_mat < 1 - 1e-5)  # exclude self-similarity
        neg_mask = diff

        BIG = 1e9
        # hard mining bounds: min positive sim / max negative sim per row
        pos_min = jnp.min(jnp.where(pos_mask, sim_mat, BIG), axis=1)
        neg_max = jnp.max(jnp.where(neg_mask, sim_mat, -BIG), axis=1)
        if self.hard_mining:
            neg_keep = neg_mask & (sim_mat + 0.1 > pos_min[:, None])
            pos_keep = pos_mask & (sim_mat - 0.1 < neg_max[:, None])
        else:
            neg_keep, pos_keep = neg_mask, pos_mask

        has_both = jnp.any(pos_mask, 1) & jnp.any(neg_mask, 1)

        pos_e = jnp.exp(-self.beta * (sim_mat - self.margin)) * pos_keep
        neg_e = jnp.exp(self.alpha * (sim_mat - self.margin)) * neg_keep
        pos_loss = (1.0 / self.beta) * jnp.log1p(jnp.sum(pos_e, axis=1))
        neg_loss = (1.0 / self.alpha) * jnp.log1p(jnp.sum(neg_e, axis=1))
        losses = jnp.where(has_both, pos_loss + neg_loss, 0.0)
        return jnp.sum(losses) / n


@registry.register_loss("refiner_contrastive_loss")
class RefinerContrastiveLoss:
    """Contrastive reconstruction loss (losses.py:1049), masked form."""

    def __init__(self, sim_thresh=0.1, epsilon=1e-16):
        self.similarity_threshold = sim_thresh
        self.epsilon = epsilon

    def __call__(self, sample_list, model_output):
        targets = sample_list["targets"]
        inputs = model_output["scores"]
        n = inputs.shape[0]
        inputs = inputs / (jnp.linalg.norm(inputs, axis=-1, keepdims=True) + EPS)
        targets = targets / (
            jnp.linalg.norm(targets, axis=-1, keepdims=True) + EPS
        )
        sim_mat = inputs @ targets.T
        pos = jnp.diag(sim_mat)
        neg_mask = (
            (sim_mat > (pos[:, None] - self.similarity_threshold))
            & (jnp.abs(sim_mat - pos[:, None]) > self.epsilon)
        ).astype(jnp.float32)
        counts = jnp.sum(neg_mask, axis=1)
        sums = jnp.sum(
            (self.similarity_threshold + sim_mat - pos[:, None]) * neg_mask,
            axis=1,
        )
        per_row = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
        return jnp.sum(per_row) / n
