"""Full-model MMFTransformer golden parity vs the torch reference
(mmf/models/mmf_transformer.py + transformers/backends/huggingface.py)
with converted weights at tiny dims: per-modality embeddings (text token
table shared with the trunk; non-text Linear+INNER LayerNorm projection,
backends/huggingface.py:78-86), per-modality position/segment/outer-LN,
concat into the BERT trunk, mlp head over the joint sequence.

HF loading is stubbed (tiny BertConfig + random-init BertModelJit) so
the test runs offline.
"""

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.checkpoint_updater import (
    HF_BERT_KEY_MAP,
    _flatten_flax,
    _unflatten_flax,
    convert_torch_state_dict,
)
from mmf_tpu.utils.env import setup_imports

setup_imports()

ATOL = 2e-5
B, T, R = 2, 5, 3
H, HEADS, LAYERS, INTER = 24, 4, 2, 48
V, IMG_DIM = 40, 16
NUM_LABELS = 7

MODEL_CFG = {
    "transformer_base": "bert-base-uncased",
    "training_head_type": "classification",
    "num_labels": NUM_LABELS,
    "hidden_size": H,
    "num_hidden_layers": LAYERS,
    "num_attention_heads": HEADS,
    "intermediate_size": INTER,
    "vocab_size": V,
    "hidden_dropout_prob": 0.0,
    "attention_probs_dropout_prob": 0.0,
    "backend": {"type": "huggingface", "freeze": False},
    "random_initialize": True,
    "tie_weight_to_encoder": None,
    "token_noise_std": 0.01,
    "token_noise_mean": 0.0,
    "heads": [{
        "type": "mlp", "in_dim": H, "hidden_size": H,
        "num_labels": NUM_LABELS, "num_layers": 1, "pooler_name":
        "bert_pooler", "hidden_dropout_prob": 0.0,
        "layer_norm_eps": 1e-12, "hidden_act": "gelu",
    }],
    "modalities": [
        {"type": "text", "key": "text", "position_dim": 16,
         "embedding_dim": H, "segment_id": 0},
        {"type": "image", "key": "image", "embedding_dim": IMG_DIM,
         "position_dim": R, "segment_id": 1},
    ],
}


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    from transformers import BertConfig
    import mmf.models.transformers.backends.huggingface as hf_backend
    import mmf.models.mmf_transformer as ref_mmft

    tiny = dict(
        vocab_size=V, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=16, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12,
    )

    real_autoconfig = hf_backend.AutoConfig.from_pretrained
    real_jit_from_pretrained = hf_backend.BertModelJit.from_pretrained
    real_replace_with_jit = hf_backend.replace_with_jit

    # the reference's scriptable-JIT monkey-patching targets an older
    # transformers BertSelfAttention API; parity only needs the math
    hf_backend.replace_with_jit = lambda *a, **kw: None
    hf_backend.AutoConfig.from_pretrained = staticmethod(
        lambda *a, **kw: BertConfig(**tiny)
    )
    hf_backend.BertModelJit.from_pretrained = classmethod(
        lambda cls, *a, config=None, **kw: cls(config or BertConfig(**tiny))
    )
    yield ref_mmft
    hf_backend.AutoConfig.from_pretrained = real_autoconfig
    hf_backend.BertModelJit.from_pretrained = real_jit_from_pretrained
    hf_backend.replace_with_jit = real_replace_with_jit
    shims.uninstall()


def _build_ref(ref):
    from omegaconf import OmegaConf

    m = ref.MMFTransformer(OmegaConf.create(MODEL_CFG))
    m.build()
    return m.eval()


def _batch():
    rng = np.random.RandomState(9)
    mask = np.ones((B, T), np.int64)
    mask[1, 3:] = 0
    return {
        "input_ids": rng.randint(0, V, (B, T)).astype(np.int64),
        "input_mask": mask,
        "image_feature_0": rng.randn(B, R, IMG_DIM).astype(np.float32),
        "targets": rng.rand(B, NUM_LABELS).astype(np.float32),
        "dataset_name": "test",
        "dataset_type": "train",
    }


def _ref_sample_list(batch):
    import torch
    from mmf.common.sample import SampleList

    sl = SampleList()
    sl.input_ids = torch.from_numpy(batch["input_ids"])
    sl.input_mask = torch.from_numpy(batch["input_mask"])
    sl.image_feature_0 = torch.from_numpy(batch["image_feature_0"])
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

    emb = "backend.embeddings"
    put("token_embeddings_0/embedding", sd[f"{emb}.token_embeddings.0.weight"])
    put("token_proj_1/kernel",
        np.ascontiguousarray(sd[f"{emb}.token_embeddings.1.0.weight"].T))
    put("token_proj_1/bias", sd[f"{emb}.token_embeddings.1.0.bias"])
    put("token_proj_ln_1/scale", sd[f"{emb}.token_embeddings.1.1.weight"])
    put("token_proj_ln_1/bias", sd[f"{emb}.token_embeddings.1.1.bias"])
    for i in (0, 1):
        # reference init_weights overwrites every modality's position
        # table with the FULL bert table (backends/huggingface.py:109);
        # only the first seq_len rows are ever read — slice to our size
        jkey = (f"pos_embeddings_{i}", "embedding")
        rows = flat[jkey].shape[0]
        put(f"pos_embeddings_{i}/embedding",
            sd[f"{emb}.pos_embeddings.{i}.weight"][:rows])
        put(f"layer_norm_{i}/scale", sd[f"{emb}.layer_norms.{i}.weight"])
        put(f"layer_norm_{i}/bias", sd[f"{emb}.layer_norms.{i}.bias"])
    # ours sizes the type table len(modalities)+1; torch len(modalities)
    tt = sd[f"{emb}.token_type_embeddings.weight"]
    ours_tt = np.asarray(flat[("token_type_embeddings", "embedding")]).copy()
    ours_tt[: tt.shape[0]] = tt
    out[("token_type_embeddings", "embedding")] = ours_tt

    # BERT trunk layers through the generic HF-BERT key map
    enc_sd = {
        k[len("backend.transformer."):]: v for k, v in sd.items()
        if k.startswith("backend.transformer.encoder.")
    }
    enc_tree = _unflatten_flax(
        {k: v for k, v in flat.items() if k[0] == "encoder"}
    )
    converted_enc, stats = convert_torch_state_dict(
        enc_sd, enc_tree, key_map=HF_BERT_KEY_MAP)
    assert stats["missed"] == 0 and stats["shape_mismatch"] == 0, stats
    for k, v in _flatten_flax(converted_enc).items():
        out[k] = v

    # mlp head: torch heads.0.{pooler,classifier}
    prefix = "heads.0."
    jhead = None
    for k in flat:
        if k[-2:] == ("dense", "kernel") and "pooler" in k and \
                k[0] != "encoder":
            jhead = "/".join(k[:-3])
            break
    assert jhead is not None, sorted(flat)[:30]
    put(f"{jhead}/pooler/dense/kernel",
        np.ascontiguousarray(sd[f"{prefix}pooler.dense.weight"].T))
    put(f"{jhead}/pooler/dense/bias", sd[f"{prefix}pooler.dense.bias"])
    put(f"{jhead}/transform_dense_0/kernel", np.ascontiguousarray(
        sd[f"{prefix}classifier.1.dense.weight"].T))
    put(f"{jhead}/transform_dense_0/bias",
        sd[f"{prefix}classifier.1.dense.bias"])
    put(f"{jhead}/transform_ln_0/scale",
        sd[f"{prefix}classifier.1.LayerNorm.weight"])
    put(f"{jhead}/transform_ln_0/bias",
        sd[f"{prefix}classifier.1.LayerNorm.bias"])
    put(f"{jhead}/decoder/kernel", np.ascontiguousarray(
        sd[f"{prefix}classifier.2.weight"].T))
    put(f"{jhead}/decoder/bias", sd[f"{prefix}classifier.2.bias"])

    return _unflatten_flax(out)


def test_mmft_full_classification_parity(ref):
    import torch
    import jax

    torch.manual_seed(51)
    tm = _build_ref(ref)
    batch = _batch()
    with torch.no_grad():
        t_out = tm(_ref_sample_list(batch))
    t_scores = t_out["scores"].numpy()

    model = registry.get_model_class("mmf_transformer")(
        config=dict(MODEL_CFG)
    )
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = _convert(sd, variables["params"])
    j_out = model.apply({"params": params}, batch, False)

    assert t_scores.shape == (B, NUM_LABELS)
    np.testing.assert_allclose(
        np.asarray(j_out["scores"]), t_scores, atol=ATOL
    )


def test_mmft_full_gradient_parity(ref):
    """torch loss.backward() vs jax.grad through the WHOLE MMFTransformer
    assembly (per-modality embeddings incl. shared text token table,
    image Linear+LN projection, BERT trunk, mlp head) under logit_bce."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from mmf_tpu.modules.losses import LogitBinaryCrossEntropy
    from tests.reference_parity.grad_utils import (
        assert_grad_trees_match,
        grad_dict_np,
    )

    torch.manual_seed(51)
    tm = _build_ref(ref)
    batch = _batch()

    t_out = tm(_ref_sample_list(batch))
    # reference losses.py:225 LogitBinaryCrossEntropy on the mlp head
    t_loss = F.binary_cross_entropy_with_logits(
        t_out["scores"], torch.from_numpy(batch["targets"]),
        reduction="mean",
    ) * NUM_LABELS
    t_loss.backward()

    model = registry.get_model_class("mmf_transformer")(
        config=dict(MODEL_CFG)
    )
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = _convert(sd, variables["params"])

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
    gsd = grad_dict_np(tm)
    # the text modality's token table AND outer LayerNorm are the trunk
    # embeddings' own modules (shared, backends/huggingface.py:106-108);
    # named_parameters dedups shared tensors, exposing each grad only
    # under the trunk name
    for tied, shared in (
        ("backend.embeddings.token_embeddings.0.weight",
         "backend.transformer.embeddings.word_embeddings.weight"),
        ("backend.embeddings.layer_norms.0.weight",
         "backend.transformer.embeddings.LayerNorm.weight"),
        ("backend.embeddings.layer_norms.0.bias",
         "backend.transformer.embeddings.LayerNorm.bias"),
    ):
        if tied not in gsd:
            gsd[tied] = gsd[shared]
    g_converted = _convert(gsd, g)
    assert_grad_trees_match(g, g_converted, min_leaves=40)


def test_mmft_trajectory_parity(ref):
    """8 full AdamW + warmup_linear + global-norm-clip updates through
    the WHOLE MMFTransformer assembly — including the tied text token
    table / outer LayerNorm (one shared tensor on both sides) — must
    produce the reference's per-step loss sequence (fifth family with
    trajectory parity)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch
    import torch.nn.functional as F

    import mmf.utils.modeling as ref_modeling
    from mmf_tpu.modules.losses import LogitBinaryCrossEntropy
    from mmf_tpu.modules.optimizers import build_optimizer_transform
    from mmf_tpu.modules.schedulers import build_scheduler
    from mmf_tpu.utils.modeling import bert_no_decay_mask

    torch.manual_seed(51)
    tm = _build_ref(ref)
    batch = _batch()

    LR, EPS, WD, CLIP, WARMUP, TOTAL = 5e-4, 1e-8, 0.01, 0.25, 3, 8

    # snapshot initial weights BEFORE the torch loop mutates in place
    sd0 = {
        k: v.detach().numpy().copy() for k, v in tm.state_dict().items()
    }

    # ---- torch reference loop ----
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

    model = registry.get_model_class("mmf_transformer")(
        config=dict(MODEL_CFG)
    )
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    params = _convert(sd0, variables["params"])

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
    reconverted = _convert(
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
