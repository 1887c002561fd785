"""Full-model ViLT golden parity vs the torch reference
(mmf/models/vilt.py:117-283) with converted weights at tiny dims:
classification task through the whole assembly — BERT text embeddings
plus the DOUBLE modality-type embedding (reference vilt.py:108-113),
ViT patch embedding + its type embedding, [text; image] concat, the
pre-LN ViT encoder over the joint sequence with a concat attention
mask, and the registered mlp head.

HF config loading is stubbed with local tiny configs
(``random_init: true`` everywhere) so the test runs offline.
"""

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.checkpoint_updater import (
    HF_VIT_KEY_MAP,
    _flatten_flax,
    _unflatten_flax,
    convert_torch_state_dict,
)
from mmf_tpu.utils.env import setup_imports

setup_imports()

ATOL = 2e-5
B, T = 2, 5
H, HEADS, LAYERS, INTER = 24, 4, 2, 48
V, MAX_POS = 40, 32
IMG, PATCH = 32, 8           # 16 patches + cls = 17 image tokens
NUM_LABELS = 7

MODEL_CFG = {
    "hidden_size": H,
    "num_hidden_layers": LAYERS,
    "num_attention_heads": HEADS,
    "heads": {
        "test": [{
            "type": "mlp", "loss": "test_mlp", "freeze": False,
            "in_dim": H, "hidden_size": H, "num_labels": NUM_LABELS,
            "pooler_name": "bert_pooler", "num_layers": 1,
            "hidden_dropout_prob": 0.0, "layer_norm_eps": 1e-12,
            "hidden_act": "gelu",
        }],
    },
    "losses": {"test_mlp": "logit_bce"},
    "image_encoder": {
        "type": "vit",
        "params": {
            "random_init": True,
            "pretrained_model_name": "google/vit-base-patch16-224",
            "do_pooling": False,
            "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0,
            "add_pooling_layer": False,
            "do_patch_embeddings": False,
            "image_size": [IMG, IMG],
            "patch_size": PATCH,
            "num_channels": 3,
            "hidden_size": H,
            "num_hidden_layers": LAYERS,
            "num_attention_heads": HEADS,
            "intermediate_size": INTER,
            "mlp_dim": INTER,
            "layer_norm_eps": 1e-12,
        },
    },
    "text_embeddings": {
        "random_init": True,
        "bert_model_name": "bert-base-uncased",
        "hidden_size": H,
        "max_position_embeddings": MAX_POS,
        "vocab_size": V,
    },
}


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    from transformers import BertConfig, ViTConfig
    import mmf.modules.vit as ref_vit_mod
    from mmf.modules import encoders as ref_encoders
    import mmf.models.vilt as ref_vilt

    real_vit_from_pretrained = ref_vit_mod.vit.ViTConfig.from_pretrained

    def stub_vit_config(*a, **kw):
        return ViTConfig(
            hidden_size=H, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=INTER,
            image_size=IMG, patch_size=PATCH, num_channels=3,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-12,
        )

    ref_vit_mod.vit.ViTConfig.from_pretrained = staticmethod(
        stub_vit_config
    )

    real_build_cfg = ref_encoders.TransformerEncoder._build_encoder_config

    def stub_bert_config(self, config):
        return BertConfig(
            vocab_size=V, hidden_size=H, num_hidden_layers=1,
            num_attention_heads=HEADS, intermediate_size=INTER,
            max_position_embeddings=MAX_POS, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-12,
        )

    ref_encoders.TransformerEncoder._build_encoder_config = stub_bert_config
    yield ref_vilt
    ref_vit_mod.vit.ViTConfig.from_pretrained = real_vit_from_pretrained
    ref_encoders.TransformerEncoder._build_encoder_config = real_build_cfg
    shims.uninstall()


def _build_ref(ref):
    from omegaconf import OmegaConf

    m = ref.ViLT(OmegaConf.create(MODEL_CFG))
    m.build()
    m.init_losses()
    return m.eval()


def _batch():
    rng = np.random.RandomState(8)
    mask = np.ones((B, T), np.int64)
    mask[1, 3:] = 0
    return {
        "input_ids": rng.randint(0, V, (B, T)).astype(np.int64),
        "input_mask": mask,
        "segment_ids": np.zeros((B, T), np.int64),
        "image": rng.randn(B, 3, IMG, IMG).astype(np.float32),
        "targets": rng.rand(B, NUM_LABELS).astype(np.float32),
        "dataset_name": "test",
        "dataset_type": "train",
    }


def _ref_sample_list(batch):
    import torch
    from mmf.common.sample import SampleList

    sl = SampleList()
    for k in ("input_ids", "input_mask", "segment_ids"):
        setattr(sl, k, torch.from_numpy(batch[k]))
    sl.image = torch.from_numpy(batch["image"])
    sl.targets = torch.from_numpy(batch["targets"])
    sl.dataset_name = "test"
    sl.dataset_type = "train"
    return sl


def _convert(sd, jparams):
    flat = dict(_flatten_flax(jparams))
    out = dict(flat)

    def put(path, value):
        key = tuple(path.split("/"))
        assert key in flat, f"no such flax param: {path}"
        assert flat[key].shape == np.shape(value), (
            f"{path}: {flat[key].shape} vs {np.shape(value)}"
        )
        out[key] = np.asarray(value, np.float32)

    # text embeddings (BertEmbeddings analog + the SECOND type table)
    tt = "text_embeddings/text_embeddings"
    put(f"{tt}/word_embeddings/embedding",
        sd["text_embeddings.text_embeddings.word_embeddings.weight"])
    put(f"{tt}/position_embeddings/embedding",
        sd["text_embeddings.text_embeddings.position_embeddings.weight"])
    put(f"{tt}/token_type_embeddings/embedding",
        sd["text_embeddings.text_embeddings.token_type_embeddings.weight"])
    put(f"{tt}/layer_norm/scale",
        sd["text_embeddings.text_embeddings.LayerNorm.weight"])
    put(f"{tt}/layer_norm/bias",
        sd["text_embeddings.text_embeddings.LayerNorm.bias"])
    put("text_embeddings/token_type_embeddings/embedding",
        sd["text_embeddings.token_type_embeddings.weight"])

    # image patch embedding + its type table
    ie = "image_embeddings/embedding"
    put(f"{ie}/cls_token", sd["image_embeddings.embedding.cls_token"])
    put(f"{ie}/position_embeddings",
        sd["image_embeddings.embedding.position_embeddings"])
    put(f"{ie}/projection/kernel",
        sd["image_embeddings.embedding.patch_embeddings.projection.weight"
           ].transpose(2, 3, 1, 0))
    put(f"{ie}/projection/bias",
        sd["image_embeddings.embedding.patch_embeddings.projection.bias"])
    put("image_embeddings/token_type_embeddings/embedding",
        sd["image_embeddings.token_type_embeddings.weight"])

    # ViT encoder over the joint sequence: reuse the HF key map on the
    # "encoder.module." subtree (its own patch embeddings are unused
    # because do_patch_embeddings=false)
    enc_sd = {
        k[len("encoder.module."):]: v for k, v in sd.items()
        if k.startswith("encoder.module.")
        and not k.startswith("encoder.module.embeddings.")
        and not k.startswith("encoder.module.pooler.")
    }
    enc_tree = _unflatten_flax(
        {k[1:]: v for k, v in flat.items() if k[0] == "encoder"}
    )
    converted_enc, stats = convert_torch_state_dict(
        enc_sd, enc_tree, key_map=HF_VIT_KEY_MAP
    )
    assert stats["missed"] == 0 and stats["shape_mismatch"] == 0, stats
    for k, v in _flatten_flax(converted_enc).items():
        out[("encoder",) + k] = v

    return out


def _head_paths(flat):
    return sorted({k for k in flat if "pooler" in k or "decoder" in k
                   or "transform" in k})


def _convert_full(sd, jparams):
    """Full torch->flax conversion (trunk via _convert + the mlp head).
    Linear rename+transpose only, hence equally valid for grad dicts."""
    out = _convert(sd, jparams)

    # mlp head: torch Sequential(Dropout, TransformWithInDim, Linear)
    flat = dict(_flatten_flax(jparams))
    head_keys = [k for k in sd if k.startswith("heads_dict.")
                 or ".pooler." in k and not k.startswith("encoder.")]
    prefix = None
    for k in sd:
        if k.endswith("pooler.dense.weight") and not k.startswith(
            "encoder."
        ) and not k.startswith("text_embeddings"):
            prefix = k[: -len("pooler.dense.weight")]
            break
    assert prefix is not None, sorted(sd)[:40]
    jhead = None
    for k in flat:
        if k[-2:] == ("dense", "kernel") and "pooler" in k and \
                k[0] not in ("encoder", "text_embeddings"):
            jhead = k[:-3]
            break
    assert jhead is not None, _head_paths(flat)
    jp = "/".join(jhead)

    def put(path, value):
        key = tuple(path.split("/"))
        assert key in flat, f"no such flax param: {path}"
        assert flat[key].shape == np.shape(value), (
            f"{path}: {flat[key].shape} vs {np.shape(value)}"
        )
        out[key] = np.asarray(value, np.float32)

    put(f"{jp}/pooler/dense/kernel",
        np.ascontiguousarray(sd[f"{prefix}pooler.dense.weight"].T))
    put(f"{jp}/pooler/dense/bias", sd[f"{prefix}pooler.dense.bias"])
    put(f"{jp}/transform_dense_0/kernel", np.ascontiguousarray(
        sd[f"{prefix}classifier.1.dense.weight"].T))
    put(f"{jp}/transform_dense_0/bias",
        sd[f"{prefix}classifier.1.dense.bias"])
    put(f"{jp}/transform_ln_0/scale",
        sd[f"{prefix}classifier.1.LayerNorm.weight"])
    put(f"{jp}/transform_ln_0/bias",
        sd[f"{prefix}classifier.1.LayerNorm.bias"])
    put(f"{jp}/decoder/kernel", np.ascontiguousarray(
        sd[f"{prefix}classifier.2.weight"].T))
    put(f"{jp}/decoder/bias", sd[f"{prefix}classifier.2.bias"])

    return _unflatten_flax(out)


def _ours(batch, ref_model):
    import jax

    model = registry.get_model_class("vilt")(config=dict(MODEL_CFG))
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = _convert_full(sd, variables["params"])
    return model.apply({"params": params}, batch, False)


def test_vilt_full_classification_parity(ref):
    import torch

    torch.manual_seed(41)
    tm = _build_ref(ref)
    batch = _batch()
    with torch.no_grad():
        t_out = tm(_ref_sample_list(batch))
    t_scores = t_out["scores"].numpy()
    j_out = _ours(batch, tm)
    assert t_scores.shape == (B, NUM_LABELS)
    np.testing.assert_allclose(
        np.asarray(j_out["scores"]), t_scores, atol=ATOL
    )


def test_vilt_full_gradient_parity(ref):
    """torch loss.backward() vs jax.grad through the WHOLE ViLT assembly
    (BERT text embeddings + double type embedding, ViT patch embedding,
    joint pre-LN encoder, mlp head) under logit_bce: every converted
    gradient leaf must match within f32 backward tolerance."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from mmf_tpu.modules.losses import LogitBinaryCrossEntropy
    from tests.reference_parity.grad_utils import (
        assert_grad_trees_match,
        grad_dict_np,
    )

    torch.manual_seed(41)
    tm = _build_ref(ref)
    batch = _batch()

    t_out = tm(_ref_sample_list(batch))
    # reference losses.py:225 LogitBinaryCrossEntropy on the mlp head
    t_loss = F.binary_cross_entropy_with_logits(
        t_out["scores"], torch.from_numpy(batch["targets"]),
        reduction="mean",
    ) * NUM_LABELS
    t_loss.backward()

    model = registry.get_model_class("vilt")(config=dict(MODEL_CFG))
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = _convert_full(sd, variables["params"])

    loss_fn = LogitBinaryCrossEntropy()

    def jax_loss(p):
        out = model.apply({"params": p}, batch, False)
        return loss_fn(
            {"targets": jnp.asarray(batch["targets"])},
            {"scores": out["scores"]},
        )

    j_loss, g = jax.value_and_grad(jax_loss)(params)
    np.testing.assert_allclose(
        float(j_loss), float(t_loss.detach()), rtol=1e-5
    )

    # convert the torch grad dict through the SAME rename/transpose map
    # as the weights; leaves the map does not cover keep OUR grad values
    # in the baseline tree, so they compare trivially equal — coverage of
    # every output-affecting leaf is already proven by the forward test
    g_converted = _convert_full(grad_dict_np(tm), g)
    assert_grad_trees_match(g, g_converted, min_leaves=40)


def test_vilt_trajectory_parity(ref):
    """8 full AdamW + warmup_linear + global-norm-clip updates through
    the WHOLE ViLT assembly must produce the reference's per-step loss
    sequence (fourth family with trajectory parity). Both sides apply
    the bias/LayerNorm weight-decay exemption MODEL-WIDE — matching our
    shipped ``ViLT.get_weight_decay_mask`` (the reference bert-groups
    only text_embeddings + heads and decays the ViT encoder's bias/LN in
    plain groups, vilt.py:187-195; that deviation is documented in
    models/vilt.py and excluded here so the test pins the training
    dynamics of the backward, not the wd-scoping choice)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch
    import torch.nn.functional as F

    from mmf_tpu.modules.losses import LogitBinaryCrossEntropy
    from mmf_tpu.modules.optimizers import build_optimizer_transform
    from mmf_tpu.modules.schedulers import build_scheduler
    from mmf_tpu.utils.modeling import bert_no_decay_mask

    torch.manual_seed(41)
    tm = _build_ref(ref)
    batch = _batch()

    LR, EPS, WD, CLIP, WARMUP, TOTAL = 5e-4, 1e-8, 0.01, 0.25, 3, 8

    # ---- torch reference loop (bert grouping over the whole model) ----
    import mmf.utils.modeling as ref_modeling

    groups = ref_modeling.get_bert_configured_parameters(
        tm, weight_decay=WD
    )
    topt = torch.optim.AdamW(groups, lr=LR, eps=EPS)

    def lr_lambda(step):  # reference warmup_linear semantics
        if step < WARMUP:
            return step / max(1, WARMUP)
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARMUP))

    tsched = torch.optim.lr_scheduler.LambdaLR(topt, lr_lambda)
    t_targets = torch.from_numpy(batch["targets"])
    t_losses = []
    for _ in range(TOTAL):
        topt.zero_grad()
        t_out = tm(_ref_sample_list(batch))
        loss = F.binary_cross_entropy_with_logits(
            t_out["scores"], t_targets, reduction="mean"
        ) * NUM_LABELS
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        topt.step()
        tsched.step()
        t_losses.append(float(loss.detach()))

    # ---- our optax chain, built exactly as MMFTrainer.load_optimizer ----
    config = {
        "optimizer": {"type": "adam_w",
                      "params": {"lr": LR, "eps": EPS, "weight_decay": WD}},
        "scheduler": {"type": "warmup_linear",
                      "params": {"num_warmup_steps": WARMUP,
                                 "num_training_steps": TOTAL}},
        "training": {"max_updates": TOTAL, "lr_scheduler": True},
    }
    tx = build_optimizer_transform(
        config,
        schedule_fn=build_scheduler(config),
        max_grad_norm=CLIP,
        weight_decay_mask=bert_no_decay_mask(),
    )

    model = registry.get_model_class("vilt")(config=dict(MODEL_CFG))
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    # convert from the PRE-training torch snapshot taken above? No —
    # _build_ref weights are untouched until the torch loop ran, so
    # convert from a state_dict captured BEFORE the loop. Rebuild:
    torch.manual_seed(41)
    tm0 = _build_ref(ref)
    sd0 = {k: v.detach().numpy() for k, v in tm0.state_dict().items()}
    params = _convert_full(sd0, variables["params"])

    loss_fn = LogitBinaryCrossEntropy()

    @jax.jit
    def step(params, opt_state):
        def jax_loss(p):
            out = model.apply({"params": p}, batch, False)
            return loss_fn(
                {"targets": jnp.asarray(batch["targets"])},
                {"scores": out["scores"]},
            )

        loss, grads = jax.value_and_grad(jax_loss)(params)
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

    # end-state params close too (catches compensating errors in losses)
    sd_final = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    reconverted = _convert_full(
        sd_final, jax.tree_util.tree_map(np.asarray, params)
    )
    flat_ours = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(reconverted)[0])
    for path, ours in flat_ours:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        parts = name.rsplit("/", 2)
        if name.endswith("/bias") and "key" in parts[-2]:
            # attention key biases are inert under softmax
            # shift-invariance (see test_training_dynamics_parity)
            continue
        ref_leaf = np.asarray(flat_ref[path])
        denom = max(float(np.max(np.abs(ref_leaf))), 1e-8)
        err = float(np.max(np.abs(np.asarray(ours) - ref_leaf))) / denom
        assert err < 1e-3, f"post-training weight mismatch {name}: {err:.2e}"
