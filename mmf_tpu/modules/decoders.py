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
        # weight-normed like the reference (decoders.py:61,
        # weight_norm(nn.Linear), dim=0 -> per-output scale): same
        # OPTIMIZATION coordinates (g, v), so converted checkpoints don't
        # just eval identically, they train identically (a plain Dense
        # matches the forward but follows a different AdamW trajectory)
        fc = nn.WeightNorm(
            nn.Dense(
                self.out_dim,
                bias_init=nn.initializers.constant(self.fc_bias_init),
            ),
            variable_filter={"kernel"},
            feature_axes=-1,
            name="fc",
        )
        predictions = fc(nn.Dropout(self.dropout)(h2, deterministic))
        new_state = dict(state)
        new_state["lm_hidden"] = (h2, c2)
        return predictions, new_state


class VisDialDiscriminator(nn.Module):
    """Discriminative VisDial head (reference decoders.py:8-52): candidate
    options — already embedded by the caller with the SHARED
    question-embedding stack, which is how the reference ties the tables
    (it passes ``text_embeddings[0]`` into the discriminator) — are
    projected and dot-scored against the fused dialog-state embedding."""

    hidden_dim: int

    @nn.compact
    def __call__(self, encoder_output, option_embeddings):
        # option_embeddings: [N, num_options, emb_dim]; encoder: [N, H]
        proj = nn.Dense(self.hidden_dim, name="projection_layer")(
            option_embeddings
        )
        return jnp.einsum("noh,nh->no", proj, encoder_output)
