"""Decoders (parity with mmf/modules/decoders.py): BUTD's LanguageDecoder
LSTM head and the VisDial discriminator."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry


class LanguageDecoder(nn.Module):
    """BUTD LSTM language decoder step (reference decoders.py:54-82).

    Called once per decode step with the attended feature; LSTM state is
    threaded explicitly (the reference stashes it in the registry keyed by
    device — a side channel that does not exist under jit).
    """

    in_dim: int
    out_dim: int
    hidden_dim: int = 1024
    dropout: float = 0.5
    fc_bias_init: float = 0.0

    @nn.compact
    def __call__(self, weighted_attn, state: Dict[str, Tuple],
                 deterministic=True):
        (h1, c1) = state["td_hidden"]
        (h2, c2) = state["lm_hidden"]

        lstm = nn.OptimizedLSTMCell(self.hidden_dim, name="language_lstm")
        (c2, h2), _ = lstm((c2, h2), jnp.concatenate([weighted_attn, h1], axis=1))
        predictions = nn.Dense(
            self.out_dim,
            bias_init=nn.initializers.constant(self.fc_bias_init),
            name="fc",
        )(nn.Dropout(self.dropout)(h2, deterministic))
        new_state = dict(state)
        new_state["lm_hidden"] = (h2, c2)
        return predictions, new_state


class VisDialDiscriminator(nn.Module):
    """Discriminative VisDial head: score candidate options by dot product
    with the fused embedding (reference decoders.py:9-53)."""

    emb_out_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, encoder_output, batch, deterministic=True):
        answer_options = batch["answer_options"]        # [B, D, 100, S] ids
        answer_options_len = batch["answer_options_len"]  # [B, D, 100]
        B, D, num_options, S = answer_options.shape

        embed = nn.Embed(
            batch["vocab_size"] if "vocab_size" in batch else 30522,
            self.emb_out_dim, name="embedding",
        )
        emb = embed(answer_options.astype(jnp.int32))  # [B,D,100,S,E]
        # mean over valid tokens
        pos = jnp.arange(S)[None, None, None, :]
        mask = (pos < answer_options_len[..., None]).astype(emb.dtype)
        emb = jnp.sum(emb * mask[..., None], axis=3) / jnp.maximum(
            jnp.sum(mask, axis=3)[..., None], 1.0
        )
        proj = nn.Dense(self.hidden_dim, name="projection_layer")(emb)
        scores = jnp.einsum("bdoh,bdh->bdo", proj, encoder_output)
        return scores.reshape(B * D, num_options)
