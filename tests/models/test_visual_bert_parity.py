"""Model-level conversion parity: a torch BERT's weights converted into
the VisualBERT trunk must reproduce the torch outputs on the text
positions when every visual token is masked out (the north-star <1e-3
logit-divergence mechanism at the model level, not just the encoder)."""

import numpy as np
import pytest
import torch

from mmf_tpu.utils.checkpoint_updater import (
    HF_BERT_KEY_MAP,
    convert_torch_state_dict,
)
from tests.utils.test_checkpoint_converter import (
    H,
    HEADS,
    INTER,
    MAXPOS,
    TYPES,
    VOCAB,
    TorchMiniBert,
)


def test_converted_bert_inside_visual_bert_matches_torch():
    import jax
    import jax.numpy as jnp

    from mmf_tpu.models.visual_bert import VisualBertBase
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(0)
    tmodel = TorchMiniBert(layers=2).eval()

    cfg = TransformerConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS, type_vocab_size=TYPES,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    trunk = VisualBertBase(cfg, visual_embedding_dim=8)

    B, S, R = 2, 8, 4  # text length 8 + 4 (masked) visual tokens
    rng = np.random.RandomState(0)
    input_ids = rng.randint(0, VOCAB, (B, S))
    token_type_ids = np.zeros((B, S), np.int64)
    visual = rng.randn(B, R, 8).astype(np.float32)
    # text fully attended; every visual token masked out
    attention_mask = np.concatenate(
        [np.ones((B, S)), np.zeros((B, R))], axis=1
    )

    variables = trunk.init(
        jax.random.PRNGKey(0),
        jnp.asarray(input_ids), jnp.asarray(attention_mask),
        jnp.asarray(token_type_ids), jnp.asarray(visual),
        jnp.zeros((B, R), jnp.int32),
    )

    state_dict = {
        k: v.detach().numpy() for k, v in tmodel.state_dict().items()
    }
    new_params, stats = convert_torch_state_dict(
        state_dict, variables["params"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["missed"] == 0, stats

    f_seq, f_pooled = trunk.apply(
        {"params": new_params},
        jnp.asarray(input_ids), jnp.asarray(attention_mask),
        jnp.asarray(token_type_ids), jnp.asarray(visual),
        jnp.zeros((B, R), jnp.int32),
    )
    with torch.no_grad():
        t_seq, t_pooled = tmodel(
            torch.from_numpy(input_ids),
            torch.from_numpy(token_type_ids),
        )

    # text positions of the multimodal trunk == pure-text torch BERT
    np.testing.assert_allclose(
        np.asarray(f_seq)[:, :S], t_seq.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(f_pooled), t_pooled.numpy(), atol=1e-3
    )
