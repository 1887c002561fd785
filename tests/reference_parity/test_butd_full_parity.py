"""Full-model BUTD golden parity vs the torch reference
(mmf/models/butd.py:9-179) with converted weights at tiny dims:

- teacher-forced scores (reference prepare_data butd.py:54-79: text
  present + greedy inference => teacher forcing, also in eval), compared
  on the region the reference computes (t < caption_len-1 per sample);
- the greedy rollout (no text): argmax feedback chain through the
  top-down attention LSTM -> masked attention pooling -> language LSTM,
  which must match step-for-step for the whole unroll.

Weight-norm handling: torch `weight_norm(Linear)` (dim=0, per-row) maps
onto flax WeightNorm with feature_axes=-1 (fa_image/fa_hidden), dim=None
onto a scalar scale (attention transform); the reference's weight-normed
LanguageDecoder.fc is a plain Dense here, so its effective weight
g * v / ||v|| is materialized during conversion.
"""

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.checkpoint_updater import (
    _flatten_flax,
    _unflatten_flax,
    convert_torch_lstm_weights,
)
from mmf_tpu.utils.env import setup_imports

setup_imports()

ATOL = 2e-5
V, B, K, IMG_DIM = 11, 2, 3, 10
EMB, HID, ATT = 5, 7, 8
MAX_LEN = 6

MODEL_CFG = {
    "embedding_dim": EMB,
    "classifier": {
        "type": "language_decoder",
        "params": {"dropout": 0.0, "hidden_dim": HID,
                   "feature_dim": IMG_DIM, "fc_bias_init": 0},
    },
    "image_feature_embeddings": [{
        "modal_combine": {
            "type": "top_down_attention_lstm",
            "params": {"dropout": 0.0, "hidden_dim": HID,
                       "attention_dim": ATT},
        },
        "normalization": "softmax",
        "transform": {"type": "linear", "params": {"out_dim": 1}},
    }],
    "image_feature_dim": IMG_DIM,
    "image_feature_encodings": [{"type": "default", "params": {}}],
    "inference": {"type": "greedy", "params": {}},
}


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import torch
    from omegaconf import OmegaConf
    from mmf.common.registry import registry as ref_registry
    import mmf.models.butd as ref_butd

    ref_registry.register(
        "config", OmegaConf.create({"model": "butd", "datasets": "coco"})
    )

    class FakeVocab:
        SOS_INDEX = 1
        EOS_INDEX = 2

        def get_size(self):
            return V

        def get_embedding(self, cls, embedding_dim):
            torch.manual_seed(3)
            return cls(V, embedding_dim)

    class FakeCaptionProcessor:
        vocab = FakeVocab()
        max_length = MAX_LEN

    ref_registry.register("coco_text_processor", FakeCaptionProcessor())
    yield ref_butd
    shims.uninstall()


def _build_ref(ref):
    from omegaconf import OmegaConf

    m = ref.BUTD(
        OmegaConf.create(dict(MODEL_CFG, model_data_dir="/tmp",
                              losses=[{"type": "caption_cross_entropy"}]))
    )
    m.build()
    return m.eval()


def _batch(with_text):
    rng = np.random.RandomState(4)
    batch = {
        "image_feature_0": rng.randn(B, K, IMG_DIM).astype(np.float32),
        "image_info_0": {"max_features": np.array([3, 2], np.int64)},
        "answers": rng.randint(0, V, (B, 5, MAX_LEN)).astype(np.int64),
    }
    if with_text:
        # caption lens descending so the reference's length-sort is a no-op
        # (it reorders sample_list in place, butd.py:63-68)
        batch["caption_len"] = np.array([MAX_LEN, 4], np.int64)
        text = rng.randint(3, V, (B, MAX_LEN)).astype(np.int64)
        text[:, 0] = 1  # SOS
        batch["text"] = text
    return batch


def _ref_sample_list(batch):
    import torch
    from mmf.common.sample import SampleList

    sl = SampleList()
    sl.image_feature_0 = torch.from_numpy(batch["image_feature_0"])
    info = SampleList()
    info.max_features = torch.from_numpy(batch["image_info_0"]["max_features"])
    sl.image_info_0 = info
    sl.answers = torch.from_numpy(batch["answers"])
    if "text" in batch:
        sl.text = torch.from_numpy(batch["text"])
        sl.caption_len = torch.from_numpy(batch["caption_len"])
    sl.dataset_name = "coco"
    sl.dataset_type = "val"
    return sl


def _convert(sd, jparams):
    flat = dict(_flatten_flax(jparams))

    def put(path, value):
        key = tuple(path.split("/"))
        if key not in flat:
            # flax WeightNorm registers its scale under a single name
            # component containing slashes ("Dense_0/kernel/scale") —
            # try progressively merging trailing components.
            parts = path.split("/")
            for i in range(len(parts) - 1, 0, -1):
                cand = tuple(parts[:i]) + ("/".join(parts[i:]),)
                if cand in flat:
                    key = cand
                    break
        assert key in flat, f"no such flax param: {path}"
        assert flat[key].shape == np.shape(value), (
            f"{path}: {flat[key].shape} vs {np.shape(value)}"
        )
        flat[key] = np.asarray(value, np.float32)

    def put_lstm(jprefix, tprefix):
        cell = convert_torch_lstm_weights(
            sd[f"{tprefix}.weight_ih"], sd[f"{tprefix}.weight_hh"],
            sd[f"{tprefix}.bias_ih"], sd[f"{tprefix}.bias_hh"],
        )
        for name, leaves in cell.items():
            for leaf, val in leaves.items():
                put(f"{jprefix}/{name}/{leaf}", val)

    put("word_embedding/embedding", sd["word_embedding.weight"])

    att = "image_feature_embeddings_list.0.0.image_attention_model.module"
    tdl = f"{att}.combination_layer.module"
    put_lstm("step/top_down_attention/top_down_lstm", f"{tdl}.top_down_lstm")
    # fa_image / fa_hidden: torch weight_norm dim=0 (per-row g) -> flax
    # WeightNorm feature_axes=-1. The wrapped Dense registers as a sibling
    # (Dense_0/Dense_1) with the scale under the wrapper's name.
    put("step/top_down_attention/Dense_0/kernel",
        np.ascontiguousarray(sd[f"{tdl}.fa_image.weight_v"].T))
    put("step/top_down_attention/Dense_0/bias", sd[f"{tdl}.fa_image.bias"])
    put("step/top_down_attention/fa_image/Dense_0/kernel/scale",
        sd[f"{tdl}.fa_image.weight_g"].reshape(-1))
    put("step/top_down_attention/Dense_1/kernel",
        np.ascontiguousarray(sd[f"{tdl}.fa_hidden.weight_v"].T))
    put("step/top_down_attention/Dense_1/bias", sd[f"{tdl}.fa_hidden.bias"])
    put("step/top_down_attention/fa_hidden/Dense_1/kernel/scale",
        sd[f"{tdl}.fa_hidden.weight_g"].reshape(-1))
    # attention transform: weight_norm(Linear, dim=None) -> scalar scale
    put("step/Dense_0/kernel",
        np.ascontiguousarray(sd[f"{att}.transform.module.lc.weight_v"].T))
    put("step/Dense_0/bias", sd[f"{att}.transform.module.lc.bias"])
    put("step/attn_transform/Dense_0/kernel/scale",
        np.float32(sd[f"{att}.transform.module.lc.weight_g"].reshape(())))

    lm = "classifier.module"
    put_lstm("step/language_decoder/language_lstm", f"{lm}.language_lstm")
    # fc: weight-normed on BOTH sides since round 5 (same optimization
    # coordinates as the reference's weight_norm(Linear), dim=0)
    put("step/language_decoder/Dense_0/kernel",
        np.ascontiguousarray(sd[f"{lm}.fc.weight_v"].T))
    put("step/language_decoder/Dense_0/bias", sd[f"{lm}.fc.bias"])
    put("step/language_decoder/fc/Dense_0/kernel/scale",
        sd[f"{lm}.fc.weight_g"].reshape(-1))

    return _unflatten_flax(flat)


def _ours(batch, ref_model):
    import jax

    cfg = dict(MODEL_CFG, datasets="coco", text_vocab_size=V,
               max_length=MAX_LEN)
    model = registry.get_model_class("butd")(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = _convert(sd, variables["params"])
    return np.asarray(
        model.apply({"params": params}, batch, False)["scores"]
    )


def test_butd_teacher_forced_parity(ref):
    import torch

    torch.manual_seed(31)
    tm = _build_ref(ref)
    batch = _batch(with_text=True)
    with torch.no_grad():
        t_scores = tm(_ref_sample_list(batch))["scores"].numpy()
    j_scores = _ours(batch, tm)
    assert t_scores.shape == (B, MAX_LEN, V)
    assert j_scores.shape == (B, MAX_LEN, V)
    # compare where the reference computed logits: t < caption_len - 1
    for i, clen in enumerate(batch["caption_len"]):
        np.testing.assert_allclose(
            j_scores[i, : clen - 1], t_scores[i, : clen - 1], atol=ATOL,
            err_msg=f"sample {i}",
        )


def test_butd_greedy_rollout_parity(ref):
    import torch

    torch.manual_seed(32)
    tm = _build_ref(ref)
    batch = _batch(with_text=False)
    with torch.no_grad():
        t_scores = tm(_ref_sample_list(batch))["scores"].numpy()
    j_scores = _ours(batch, tm)
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)
    # the argmax chains (the greedy captions) must agree exactly
    np.testing.assert_array_equal(
        j_scores.argmax(-1), t_scores.argmax(-1)
    )


def test_butd_trajectory_parity(ref):
    """6 full AdamW updates through BUTD's teacher-forced LSTM stack
    (TopDownAttentionLSTM + LanguageDecoder — the only recurrent
    backward among the parity models) under caption_cross_entropy: the
    per-step loss sequence must match the reference loop. A loss-
    sequence match across updates pins the whole backward — any gradient
    error feeds the next step's loss.

    Two documented parametrization artifacts are modeled, not hidden:
    torch LSTMs carry DUPLICATED biases (b_ih + b_hh, each receiving the
    full preactivation gradient, so the combined bias moves twice per
    step), while flax's OptimizedLSTMCell has one -- our side scales the
    LSTM-bias updates by 2 to land on the same trajectory. wd=0 and no
    clipping (the duplicated biases also inflate torch's global grad
    norm; decay grouping and clipping are pinned by the other
    trajectory tests)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from mmf.modules.losses import CaptionCrossEntropyLoss as RefCCE
    from mmf_tpu.modules.losses import CaptionCrossEntropyLoss

    torch.manual_seed(31)
    tm = _build_ref(ref)
    tm.train()
    batch = _batch(with_text=True)
    # teacher-forced targets: next-token ids, padded to scores' T dim
    targets = np.concatenate(
        [batch["text"][:, 1:], np.zeros((B, 1), np.int64)], axis=1
    )

    LR, EPS, WARMUP, TOTAL = 5e-3, 1e-8, 2, 6

    sd0 = {
        k: v.detach().numpy().copy() for k, v in tm.state_dict().items()
    }

    # ---- torch reference loop ----
    topt = torch.optim.AdamW(
        tm.parameters(), lr=LR, eps=EPS, weight_decay=0.0
    )

    def lr_lambda(step):
        if step < WARMUP:
            return step / max(1, WARMUP)
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARMUP))

    tsched = torch.optim.lr_scheduler.LambdaLR(topt, lr_lambda)
    ref_loss = RefCCE()
    t_losses = []
    for _ in range(TOTAL):
        topt.zero_grad()
        sl = _ref_sample_list(batch)
        sl.targets = torch.from_numpy(targets)
        out = tm(sl)
        loss = ref_loss(sl, out)
        loss.backward()
        topt.step()
        tsched.step()
        t_losses.append(float(loss.detach()))

    # ---- ours ----
    from mmf_tpu.modules.optimizers import build_optimizer_transform
    from mmf_tpu.modules.schedulers import build_scheduler

    config = {
        "optimizer": {"type": "adam_w",
                      "params": {"lr": LR, "eps": EPS,
                                 "weight_decay": 0.0}},
        "scheduler": {"type": "warmup_linear",
                      "params": {"num_warmup_steps": WARMUP,
                                 "num_training_steps": TOTAL}},
        "training": {"max_updates": TOTAL, "lr_scheduler": True},
    }
    lstm_bias_x2 = {
        f"step/{mod}/{gate}/bias": 2.0
        for mod in ("top_down_attention/top_down_lstm",
                    "language_decoder/language_lstm")
        for gate in ("hi", "hf", "hg", "ho")
    }
    tx = build_optimizer_transform(
        config, schedule_fn=build_scheduler(config),
        lr_multipliers=lstm_bias_x2,
    )

    cfg = dict(MODEL_CFG, datasets="coco", text_vocab_size=V,
               max_length=MAX_LEN)
    model = registry.get_model_class("butd")(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    params = _convert(sd0, variables["params"])

    jloss = CaptionCrossEntropyLoss()
    jbatch = {k: v for k, v in batch.items()}
    jbatch["targets"] = jnp.asarray(targets)
    jbatch["caption_len"] = jnp.asarray(batch["caption_len"])

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, batch, True)
            return jloss(jbatch, out)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    opt_state = tx.init(params)
    j_losses = []
    for _ in range(TOTAL):
        params, opt_state, loss = step(params, opt_state)
        j_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(j_losses), np.asarray(t_losses), rtol=2e-4,
        err_msg=f"trajectories diverged:\n jax  {j_losses}\n torch {t_losses}",
    )
