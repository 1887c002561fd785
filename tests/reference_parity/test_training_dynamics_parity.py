"""Training-dynamics parity against the PyTorch reference at
/root/reference — the SURVEY §6 gate beyond forward logits: gradients and
multi-step optimizer trajectories must match too, or converted models
would eval identically yet train differently.

Covers:
  - gradient parity: converted weights, identical batch, f32, dropout
    off — torch ``loss.backward()`` grads vs ``jax.grad`` for the
    VisualBERT fusion trunk (+classifier, logit_bce) and the M4C MMT
    (prefix-LM mask, m4c_decoding_bce_with_mask). Torch grad dicts are
    converted through the SAME rename/transpose map as the weights
    (``convert_torch_state_dict`` is linear), so the comparison is
    leaf-exact in flax layout.
  - trajectory parity: 8 full updates of AdamW + linear-warmup schedule
    + global-norm clip + BERT weight-decay grouping (reference
    mmf/utils/modeling.py:18-46 via torch param groups; ours via
    ``bert_no_decay_mask`` feeding optax.adamw's mask) asserting the
    per-step loss sequence matches the reference loop
    (mmf/trainers/core/training_loop.py:193-234 semantics).
"""

import os

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import (
    HF_BERT_KEY_MAP,
    convert_torch_state_dict,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.models.m4c as ref_m4c
    import mmf.models.mmbt as ref_mmbt
    import mmf.models.vilbert as ref_vilbert
    import mmf.models.visual_bert as ref_visual_bert
    import mmf.utils.modeling as ref_modeling

    yield {
        "m4c": ref_m4c,
        "mmbt": ref_mmbt,
        "vilbert": ref_vilbert,
        "visual_bert": ref_visual_bert,
        "modeling": ref_modeling,
    }
    shims.uninstall()


def _state_dict_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _grad_dict_np(module):
    return {
        k: (p.grad.detach().numpy() if p.grad is not None
            else np.zeros(p.shape, np.float32))
        for k, p in module.named_parameters()
    }


def _tiny_visual_bert(ref):
    """Shared tiny VisualBERT trunk + linear classifier on both sides,
    weights converted torch -> flax. Returns everything both tests need."""
    import jax
    import torch
    from transformers import BertConfig

    from mmf_tpu.models.visual_bert import VisualBertBase
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(7)
    bert_config = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tmodel = ref["visual_bert"].VisualBERTBase(
        bert_config, visual_embedding_dim=8
    )
    tcls = torch.nn.Linear(32, 3)

    cfg = TransformerConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = VisualBertBase(cfg, visual_embedding_dim=8)

    B, S, R = 2, 6, 4
    rng = np.random.RandomState(3)
    batch = {
        "input_ids": rng.randint(0, 120, (B, S)),
        "token_type_ids": np.zeros((B, S), np.int64),
        "visual": rng.randn(B, R, 8).astype(np.float32),
        "visual_type": np.ones((B, R), np.int64),
        "mask": np.ones((B, S + R), np.float32),
        "targets": rng.randint(0, 2, (B, 3)).astype(np.float32),
    }
    batch["mask"][1, S - 1] = 0
    batch["mask"][1, -1] = 0

    params = jmodel.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["mask"],
        batch["token_type_ids"], batch["visual"], batch["visual_type"],
    )["params"]
    converted, stats = convert_torch_state_dict(
        _state_dict_np(tmodel), params, key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0 and stats["matched"] == 43

    jcls = {
        "kernel": tcls.weight.detach().numpy().T.copy(),
        "bias": tcls.bias.detach().numpy().copy(),
    }
    return tmodel, tcls, jmodel, converted, jcls, batch


def _torch_logit_bce(scores, targets):
    import torch.nn.functional as F

    # reference losses.py:225 LogitBinaryCrossEntropy
    return F.binary_cross_entropy_with_logits(
        scores, targets, reduction="mean"
    ) * targets.size(1)


def _jax_visual_bert_loss(jmodel, trunk_params, cls_params, batch):
    import jax.numpy as jnp

    from mmf_tpu.modules.losses import LogitBinaryCrossEntropy

    _, pooled = jmodel.apply(
        {"params": trunk_params}, batch["input_ids"], batch["mask"],
        batch["token_type_ids"], batch["visual"], batch["visual_type"],
    )
    scores = pooled @ cls_params["kernel"] + cls_params["bias"]
    return LogitBinaryCrossEntropy()(
        {"targets": jnp.asarray(batch["targets"])}, {"scores": scores}
    )


def _rel_err(a, b, floor=1e-8):
    """Max-abs error relative to the reference leaf's scale, with a floor:
    leaves whose true gradient is analytically ~zero (e.g. attention key
    bias — softmax is shift-invariant along keys, so its gradient is pure
    f32 cancellation noise on BOTH frameworks) must not be compared
    noise-to-noise; the floor ties them to the global gradient scale."""
    denom = max(float(np.max(np.abs(b))), floor)
    return float(np.max(np.abs(a - b))) / denom


def _global_scale(flat_ref):
    return max(
        float(np.max(np.abs(np.asarray(v)))) for v in flat_ref.values()
    )


def test_visual_bert_gradient_parity(ref):
    """torch loss.backward() vs jax.grad on the full fusion trunk +
    classifier under logit_bce: every converted gradient leaf must match
    within f32 backward tolerance."""
    import jax
    import torch

    tmodel, tcls, jmodel, converted, jcls, batch = _tiny_visual_bert(ref)

    _, pooled, _ = tmodel(
        torch.from_numpy(batch["input_ids"]),
        torch.from_numpy(batch["mask"]),
        torch.from_numpy(batch["token_type_ids"]),
        torch.from_numpy(batch["visual"]),
        torch.from_numpy(batch["visual_type"]),
    )
    t_scores = tcls(pooled)
    t_loss = _torch_logit_bce(t_scores, torch.from_numpy(batch["targets"]))
    t_loss.backward()

    j_loss, (g_trunk, g_cls) = jax.value_and_grad(
        _jax_visual_bert_loss, argnums=(1, 2)
    )(jmodel, converted, jcls, batch)

    np.testing.assert_allclose(
        float(j_loss), float(t_loss.detach()), rtol=1e-5
    )

    # convert the torch grad dict through the SAME map as the weights —
    # conversion is pure rename+transpose, hence valid for grads
    g_converted, gstats = convert_torch_state_dict(
        _grad_dict_np(tmodel), g_trunk, key_map=HF_BERT_KEY_MAP
    )
    assert gstats["matched"] == 43 and gstats["shape_mismatch"] == 0

    flat_ours = jax.tree_util.tree_flatten_with_path(g_trunk)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(g_converted)[0])
    assert len(flat_ours) == 43
    floor = 1e-3 * _global_scale(flat_ref)
    for path, ours in flat_ours:
        theirs = np.asarray(flat_ref[path])
        err = _rel_err(np.asarray(ours), theirs, floor=floor)
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        assert err < 5e-4, f"gradient mismatch at {name}: rel {err:.2e}"

    np.testing.assert_allclose(
        np.asarray(g_cls["kernel"]), tcls.weight.grad.numpy().T,
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(g_cls["bias"]), tcls.bias.grad.numpy(),
        rtol=1e-4, atol=1e-7,
    )


def test_m4c_mmt_gradient_parity(ref):
    """Gradients through the M4C MMT joint transformer (prefix-LM causal
    decode span) under m4c_decoding_bce_with_mask."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from transformers import BertConfig

    from mmf_tpu.models.m4c import MMT
    from mmf_tpu.modules.losses import M4CDecodingBCEWithMaskLoss
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(11)
    H = 32
    bert_config = BertConfig(
        vocab_size=30, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tmodel = ref["m4c"].MMT(bert_config)
    cfg = TransformerConfig(
        vocab_size=30, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = MMT(cfg)

    B, T_TXT, T_OBJ, T_OCR, T_DEC, N_ANS, V = 2, 5, 4, 3, 6, 11, 14
    rng = np.random.RandomState(5)
    inputs = {
        "txt_emb": rng.randn(B, T_TXT, H).astype(np.float32),
        "obj_emb": rng.randn(B, T_OBJ, H).astype(np.float32),
        "ocr_emb": rng.randn(B, T_OCR, H).astype(np.float32),
        "fixed_ans_emb": rng.randn(N_ANS, H).astype(np.float32),
        "prev_inds": rng.randint(0, N_ANS + T_OCR, (B, T_DEC)),
        "txt_mask": np.ones((B, T_TXT), np.float32),
        "obj_mask": np.ones((B, T_OBJ), np.float32),
        "ocr_mask": np.ones((B, T_OCR), np.float32),
    }
    inputs["txt_mask"][1, -1] = 0
    proj_w = rng.randn(V, H).astype(np.float32) * 0.1
    targets = rng.randint(0, 2, (B, T_DEC, V)).astype(np.float32)
    loss_mask = np.ones((B, T_DEC), np.float32)
    loss_mask[0, -2:] = 0  # masked tail decode steps

    t_in = {k: torch.from_numpy(v) for k, v in inputs.items()}
    t_out = tmodel(
        t_in["txt_emb"], t_in["txt_mask"], t_in["obj_emb"],
        t_in["obj_mask"], t_in["ocr_emb"], t_in["ocr_mask"],
        t_in["fixed_ans_emb"], t_in["prev_inds"],
    )
    t_scores = t_out["mmt_dec_output"] @ torch.from_numpy(proj_w).T
    # reference losses.py:575 M4CDecodingBCEWithMaskLoss
    t_losses = F.binary_cross_entropy_with_logits(
        t_scores, torch.from_numpy(targets), reduction="none"
    ) * torch.from_numpy(loss_mask).unsqueeze(-1)
    t_loss = t_losses.sum() / torch.from_numpy(loss_mask).sum()
    t_loss.backward()

    params = jmodel.init(
        jax.random.PRNGKey(0), inputs["txt_emb"], inputs["txt_mask"],
        inputs["obj_emb"], inputs["obj_mask"], inputs["ocr_emb"],
        inputs["ocr_mask"], inputs["fixed_ans_emb"], inputs["prev_inds"],
    )["params"]
    converted, stats = convert_torch_state_dict(
        _state_dict_np(tmodel), params, key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0

    loss_fn = M4CDecodingBCEWithMaskLoss()

    def jax_loss(p):
        out = jmodel.apply(
            {"params": p}, inputs["txt_emb"], inputs["txt_mask"],
            inputs["obj_emb"], inputs["obj_mask"], inputs["ocr_emb"],
            inputs["ocr_mask"], inputs["fixed_ans_emb"],
            inputs["prev_inds"],
        )
        scores = out["mmt_dec_output"] @ proj_w.T
        return loss_fn(
            {"targets": jnp.asarray(targets),
             "train_loss_mask": jnp.asarray(loss_mask)},
            {"scores": scores},
        )

    j_loss, g = jax.value_and_grad(jax_loss)(converted)
    np.testing.assert_allclose(
        float(j_loss), float(t_loss.detach()), rtol=1e-5
    )

    g_converted, gstats = convert_torch_state_dict(
        _grad_dict_np(tmodel), g, key_map=HF_BERT_KEY_MAP
    )
    assert gstats["matched"] == stats["matched"]
    flat_ours = jax.tree_util.tree_flatten_with_path(g)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(g_converted)[0])
    floor = 1e-3 * _global_scale(flat_ref)
    checked = 0
    for path, ours in flat_ours:
        theirs = np.asarray(flat_ref[path])
        err = _rel_err(np.asarray(ours), theirs, floor=floor)
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        assert err < 5e-4, f"gradient mismatch at {name}: rel {err:.2e}"
        checked += 1
    assert checked >= 40


def test_visual_bert_trajectory_parity(ref):
    """8 full optimizer updates — AdamW + linear warmup + global-norm
    clip + BERT weight-decay grouping — must produce the reference's
    per-step loss sequence (training_loop.py:193-234 update semantics)."""
    import jax
    import torch

    from mmf_tpu.modules.optimizers import build_optimizer_transform
    from mmf_tpu.modules.schedulers import build_scheduler
    from mmf_tpu.utils.modeling import bert_no_decay_mask

    tmodel, tcls, jmodel, converted, jcls, batch = _tiny_visual_bert(ref)

    LR, EPS, WD, CLIP, WARMUP, TOTAL = 5e-4, 1e-8, 0.01, 0.25, 3, 8

    # ---- torch reference loop ----
    container = torch.nn.ModuleDict({"trunk": tmodel, "classifier": tcls})
    groups = ref["modeling"].get_bert_configured_parameters(
        container, weight_decay=WD
    )
    topt = torch.optim.AdamW(groups, lr=LR, eps=EPS)

    def lr_lambda(step):  # reference warmup_linear semantics
        if step < WARMUP:
            return step / max(1, WARMUP)
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARMUP))

    tsched = torch.optim.lr_scheduler.LambdaLR(topt, lr_lambda)
    t_in = [
        torch.from_numpy(batch[k]) for k in
        ("input_ids", "mask", "token_type_ids", "visual", "visual_type")
    ]
    t_targets = torch.from_numpy(batch["targets"])
    t_losses = []
    for _ in range(TOTAL):
        topt.zero_grad()
        _, pooled, _ = tmodel(*t_in)
        loss = _torch_logit_bce(tcls(pooled), t_targets)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(container.parameters(), CLIP)
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
    params = {"trunk": converted, "classifier": jcls}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return _jax_visual_bert_loss(
                jmodel, p["trunk"], p["classifier"], batch
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for _ in range(TOTAL):
        params, opt_state, loss = step(params, opt_state)
        j_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(j_losses), np.asarray(t_losses), rtol=2e-4,
        err_msg=f"trajectories diverged:\n jax  {j_losses}\n torch {t_losses}",
    )

    # end-state params close too (catches compensating errors in losses)
    t_final = _state_dict_np(tmodel)
    j_final = params["trunk"]
    reconverted, _ = convert_torch_state_dict(
        t_final, jax.tree_util.tree_map(np.asarray, j_final),
        key_map=HF_BERT_KEY_MAP,
    )
    flat_ours = jax.tree_util.tree_flatten_with_path(j_final)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(reconverted)[0])
    for path, ours in flat_ours:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name.endswith("key/bias"):
            # softmax is shift-invariant along keys: key bias never
            # affects the model function, its gradient is analytically
            # zero, and Adam amplifies each framework's f32 cancellation
            # noise into lr-scale steps — trajectories of this (inert)
            # parameter are chaotic on BOTH sides. The loss-sequence
            # assertion above already pins the function itself.
            continue
        err = _rel_err(np.asarray(ours), np.asarray(flat_ref[path]))
        assert err < 1e-3, f"post-training weight mismatch {name}: {err:.2e}"


def test_mmbt_trajectory_parity(ref):
    """8 full optimizer updates of the MMBT trunk + linear head under
    cross_entropy — AdamW + linear warmup + global-norm clip + BERT
    weight-decay grouping — must produce the reference's per-step loss
    sequence (second family with trajectory parity beyond visual_bert;
    covers the shared-embedding accumulation path, mmbt.py:67-132)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch
    import torch.nn.functional as F

    from mmf_tpu.modules.optimizers import build_optimizer_transform
    from mmf_tpu.modules.schedulers import build_scheduler
    from mmf_tpu.utils.modeling import bert_no_decay_mask
    from tests.reference_parity.test_golden_parity import (
        _MMBT_INPUT_ORDER,
        MMBT_KEY_MAP,
        _tiny_mmbt,
    )

    tmodel, jmodel, converted, _, inputs = _tiny_mmbt(
        {"mmbt": ref["mmbt"]}
    )

    H, N_LABELS = 24, 2
    torch.manual_seed(46)
    tcls = torch.nn.Linear(H, N_LABELS)
    targets = np.array([1, 0], np.int64)
    jcls = {
        "kernel": tcls.weight.detach().numpy().T.copy(),
        "bias": tcls.bias.detach().numpy().copy(),
    }

    LR, EPS, WD, CLIP, WARMUP, TOTAL = 5e-4, 1e-8, 0.01, 0.25, 3, 8

    # ---- torch reference loop ----
    container = torch.nn.ModuleDict({"trunk": tmodel, "classifier": tcls})
    groups = ref["modeling"].get_bert_configured_parameters(
        container, weight_decay=WD
    )
    topt = torch.optim.AdamW(groups, lr=LR, eps=EPS)

    def lr_lambda(step):  # reference warmup_linear semantics
        if step < WARMUP:
            return step / max(1, WARMUP)
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARMUP))

    tsched = torch.optim.lr_scheduler.LambdaLR(topt, lr_lambda)
    t_in = dict(
        input_modal=torch.from_numpy(inputs["input_modal"]),
        input_ids=torch.from_numpy(inputs["input_ids"]),
        modal_start_tokens=torch.from_numpy(inputs["start_tok"]),
        modal_end_tokens=torch.from_numpy(inputs["end_tok"]),
        attention_mask=torch.from_numpy(inputs["attention_mask"]),
        token_type_ids=torch.from_numpy(inputs["token_type_ids"]),
    )
    t_targets = torch.from_numpy(targets)
    t_losses = []
    for _ in range(TOTAL):
        topt.zero_grad()
        _, pooled = tmodel(**t_in)[:2]
        loss = F.cross_entropy(tcls(pooled), t_targets)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(container.parameters(), CLIP)
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
    params = {"trunk": converted, "classifier": jcls}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, pooled, _ = jmodel.apply(
                {"params": p["trunk"]},
                *(inputs[k] for k in _MMBT_INPUT_ORDER),
            )
            scores = pooled @ p["classifier"]["kernel"] \
                + p["classifier"]["bias"]
            logprobs = jax.nn.log_softmax(scores, axis=-1)
            picked = jnp.take_along_axis(
                logprobs, jnp.asarray(targets)[:, None], axis=-1
            )
            return -picked.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for _ in range(TOTAL):
        params, opt_state, loss = step(params, opt_state)
        j_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(j_losses), np.asarray(t_losses), rtol=2e-4,
        err_msg=f"trajectories diverged:\n jax  {j_losses}\n torch {t_losses}",
    )


def test_vilbert_trajectory_parity(ref):
    """8 full optimizer updates through ViLBERT's interleaved two-stream
    trunk — the co-attention backward (reference vilbert.py:347-475) under
    the 'mul' fusion head (vilbert.py:1319-1322) + logit_bce — AdamW +
    linear warmup + global-norm clip + BERT weight-decay grouping must
    produce the reference's per-step loss sequence (third family with
    trajectory parity, after visual_bert and mmbt)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch
    import torch.nn.functional as F

    from mmf_tpu.modules.losses import LogitBinaryCrossEntropy
    from mmf_tpu.modules.optimizers import build_optimizer_transform
    from mmf_tpu.modules.schedulers import build_scheduler
    from mmf_tpu.utils.modeling import bert_no_decay_mask
    from tests.reference_parity.test_golden_parity import (
        _VILBERT_INPUT_ORDER,
        VILBERT_TRUNK_KEY_MAP,
        _tiny_vilbert,
    )

    tmodel, jmodel, converted, _, inputs = _tiny_vilbert(ref)

    BI, N_LABELS = 24, 3
    torch.manual_seed(44)
    tcls = torch.nn.Linear(BI, N_LABELS)
    rng = np.random.RandomState(44)
    targets = rng.randint(0, 2, (2, N_LABELS)).astype(np.float32)
    # snapshot the head BEFORE the torch loop mutates it in place
    jcls = {
        "kernel": tcls.weight.detach().numpy().T.copy(),
        "bias": tcls.bias.detach().numpy().copy(),
    }

    LR, EPS, WD, CLIP, WARMUP, TOTAL = 5e-4, 1e-8, 0.01, 0.25, 3, 8

    # ---- torch reference loop ----
    container = torch.nn.ModuleDict({"trunk": tmodel, "classifier": tcls})
    groups = ref["modeling"].get_bert_configured_parameters(
        container, weight_decay=WD
    )
    topt = torch.optim.AdamW(groups, lr=LR, eps=EPS)

    def lr_lambda(step):  # reference warmup_linear semantics
        if step < WARMUP:
            return step / max(1, WARMUP)
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARMUP))

    tsched = torch.optim.lr_scheduler.LambdaLR(topt, lr_lambda)
    t_in = [torch.from_numpy(inputs[k]) for k in _VILBERT_INPUT_ORDER]
    t_targets = torch.from_numpy(targets)
    t_losses = []
    for _ in range(TOTAL):
        topt.zero_grad()
        t_out = tmodel(*t_in)
        t_scores = tcls(t_out[2] * t_out[3])
        loss = F.binary_cross_entropy_with_logits(
            t_scores, t_targets, reduction="mean"
        ) * N_LABELS
        loss.backward()
        torch.nn.utils.clip_grad_norm_(container.parameters(), CLIP)
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
    params = {"trunk": converted, "classifier": jcls}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, _, pooled_t, pooled_v = jmodel.apply(
                {"params": p["trunk"]},
                *(inputs[k] for k in _VILBERT_INPUT_ORDER),
            )
            scores = (pooled_t * pooled_v) @ p["classifier"]["kernel"] \
                + p["classifier"]["bias"]
            return LogitBinaryCrossEntropy()(
                {"targets": jnp.asarray(targets)}, {"scores": scores}
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for _ in range(TOTAL):
        params, opt_state, loss = step(params, opt_state)
        j_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(j_losses), np.asarray(t_losses), rtol=2e-4,
        err_msg=f"trajectories diverged:\n jax  {j_losses}\n torch {t_losses}",
    )

    # end-state params close too (catches compensating errors in losses)
    t_final = _state_dict_np(tmodel)
    reconverted, _ = convert_torch_state_dict(
        t_final,
        jax.tree_util.tree_map(np.asarray, params["trunk"]),
        key_map=VILBERT_TRUNK_KEY_MAP,
    )
    flat_ours = jax.tree_util.tree_flatten_with_path(params["trunk"])[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(reconverted)[0])
    for path, ours in flat_ours:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        leaf = name.rsplit("/", 2)
        if name.endswith("/bias") and leaf[-2].startswith("key"):
            # any attention key bias (key, and the co-attention's
            # key1/key2) is inert under softmax shift-invariance (see
            # test_visual_bert_trajectory_parity) — both frameworks'
            # trajectories of these parameters are f32-noise-driven
            continue
        err = _rel_err(np.asarray(ours), np.asarray(flat_ref[path]))
        assert err < 1e-3, f"post-training weight mismatch {name}: {err:.2e}"


def test_m4c_trajectory_parity(ref):
    """8 full AdamW + warmup_linear + global-norm-clip updates through
    the M4C MMT (prefix-LM mask, teacher-forced decode span) + trainable
    score projection under m4c_decoding_bce_with_mask — per-step loss
    sequence must match the reference loop (sixth family with trajectory
    parity: all six BASELINE model families now have it)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch
    import torch.nn.functional as F
    from transformers import BertConfig

    from mmf_tpu.models.m4c import MMT
    from mmf_tpu.modules.losses import M4CDecodingBCEWithMaskLoss
    from mmf_tpu.modules.optimizers import build_optimizer_transform
    from mmf_tpu.modules.schedulers import build_scheduler
    from mmf_tpu.modules.transformer import TransformerConfig
    from mmf_tpu.utils.modeling import bert_no_decay_mask

    torch.manual_seed(11)
    H = 32
    bert_config = BertConfig(
        vocab_size=30, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tmodel = ref["m4c"].MMT(bert_config)
    cfg = TransformerConfig(
        vocab_size=30, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = MMT(cfg)

    B, T_TXT, T_OBJ, T_OCR, T_DEC, N_ANS, V = 2, 5, 4, 3, 6, 11, 14
    rng = np.random.RandomState(5)
    inputs = {
        "txt_emb": rng.randn(B, T_TXT, H).astype(np.float32),
        "obj_emb": rng.randn(B, T_OBJ, H).astype(np.float32),
        "ocr_emb": rng.randn(B, T_OCR, H).astype(np.float32),
        "fixed_ans_emb": rng.randn(N_ANS, H).astype(np.float32),
        "prev_inds": rng.randint(0, N_ANS + T_OCR, (B, T_DEC)),
        "txt_mask": np.ones((B, T_TXT), np.float32),
        "obj_mask": np.ones((B, T_OBJ), np.float32),
        "ocr_mask": np.ones((B, T_OCR), np.float32),
    }
    inputs["txt_mask"][1, -1] = 0
    proj_w = (rng.randn(V, H).astype(np.float32) * 0.1)
    targets = rng.randint(0, 2, (B, T_DEC, V)).astype(np.float32)
    loss_mask = np.ones((B, T_DEC), np.float32)
    loss_mask[0, -2:] = 0

    LR, EPS, WD, CLIP, WARMUP, TOTAL = 5e-4, 1e-8, 0.01, 0.25, 3, 8

    # snapshot initial trunk weights BEFORE the torch loop mutates
    # them in place (state_dict().numpy() is a view, hence .copy())
    sd0 = {
        k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()
    }

    # ---- torch reference loop (trainable projection too) ----
    tproj = torch.nn.Linear(H, V, bias=False)
    with torch.no_grad():
        tproj.weight.copy_(torch.from_numpy(proj_w))
    container = torch.nn.ModuleDict({"trunk": tmodel, "classifier": tproj})
    groups = ref["modeling"].get_bert_configured_parameters(
        container, weight_decay=WD
    )
    topt = torch.optim.AdamW(groups, lr=LR, eps=EPS)

    def lr_lambda(step):  # reference warmup_linear semantics
        if step < WARMUP:
            return step / max(1, WARMUP)
        return max(0.0, (TOTAL - step) / max(1, TOTAL - WARMUP))

    tsched = torch.optim.lr_scheduler.LambdaLR(topt, lr_lambda)
    t_in = {k: torch.from_numpy(v) for k, v in inputs.items()}
    t_targets = torch.from_numpy(targets)
    t_lmask = torch.from_numpy(loss_mask)
    t_losses = []
    for _ in range(TOTAL):
        topt.zero_grad()
        t_out = tmodel(
            t_in["txt_emb"], t_in["txt_mask"], t_in["obj_emb"],
            t_in["obj_mask"], t_in["ocr_emb"], t_in["ocr_mask"],
            t_in["fixed_ans_emb"], t_in["prev_inds"],
        )
        t_scores = tproj(t_out["mmt_dec_output"])
        raw = F.binary_cross_entropy_with_logits(
            t_scores, t_targets, reduction="none"
        ) * t_lmask.unsqueeze(-1)
        loss = raw.sum() / t_lmask.sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(container.parameters(), CLIP)
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

    init_params = jmodel.init(
        jax.random.PRNGKey(0), inputs["txt_emb"], inputs["txt_mask"],
        inputs["obj_emb"], inputs["obj_mask"], inputs["ocr_emb"],
        inputs["ocr_mask"], inputs["fixed_ans_emb"], inputs["prev_inds"],
    )["params"]
    converted, stats = convert_torch_state_dict(
        sd0, init_params, key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0

    loss_fn = M4CDecodingBCEWithMaskLoss()
    params = {"trunk": converted,
              "classifier": {"kernel": proj_w.T.copy()}}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def jax_loss(p):
            out = jmodel.apply(
                {"params": p["trunk"]}, inputs["txt_emb"],
                inputs["txt_mask"], inputs["obj_emb"], inputs["obj_mask"],
                inputs["ocr_emb"], inputs["ocr_mask"],
                inputs["fixed_ans_emb"], inputs["prev_inds"],
            )
            scores = out["mmt_dec_output"] @ p["classifier"]["kernel"]
            return loss_fn(
                {"targets": jnp.asarray(targets),
                 "train_loss_mask": jnp.asarray(loss_mask)},
                {"scores": scores},
            )

        loss, grads = jax.value_and_grad(jax_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses = []
    for _ in range(TOTAL):
        params, opt_state, loss = step(params, opt_state)
        j_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(j_losses), np.asarray(t_losses), rtol=2e-4,
        err_msg=f"trajectories diverged:\n jax  {j_losses}\n torch {t_losses}",
    )

    # end-state params close too (catches compensating errors in losses)
    t_final = _state_dict_np(tmodel)
    reconverted, _ = convert_torch_state_dict(
        t_final,
        jax.tree_util.tree_map(np.asarray, params["trunk"]),
        key_map=HF_BERT_KEY_MAP,
    )
    flat_ours = jax.tree_util.tree_flatten_with_path(params["trunk"])[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(reconverted)[0])
    for path, ours in flat_ours:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        parts = name.rsplit("/", 2)
        if name.endswith("/bias") and "key" in parts[-2]:
            # inert under softmax shift-invariance (see
            # test_visual_bert_trajectory_parity)
            continue
        ref_leaf = np.asarray(flat_ref[path])
        denom = max(float(np.max(np.abs(ref_leaf))), 1e-8)
        err = float(np.max(np.abs(np.asarray(ours) - ref_leaf))) / denom
        assert err < 1e-3, f"post-training weight mismatch {name}: {err:.2e}"
    np.testing.assert_allclose(
        np.asarray(params["classifier"]["kernel"]),
        tproj.weight.detach().numpy().T, rtol=1e-3, atol=1e-6,
    )
