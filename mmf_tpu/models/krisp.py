"""KRISP: knowledge-graph VQA (parity with mmf/models/krisp.py:782).

VisualBERT-style implicit branch + a symbolic graph network over a
knowledge base, with the reference's composition machinery:
  - ``feed_vb_to_graph`` with feed modes ``feed_vb_hid_to_graph`` /
    ``feed_vb_logit_to_graph`` (krisp.py:166-196): the implicit branch's
    pooled hidden or answer logits are injected as graph node inputs;
  - ``graph_logit_mode`` ``mc4`` (bilinear GraphPtrNet, krisp.py:246-283,
    with the ``noback_vb_to_blinear`` stop-gradient), ``logit_fc``
    (per-node linear) or ``in_graph``;
  - ``output_combine`` ``add`` (with ``missing_ans_inds`` zeroed,
    krisp.py:214-227) or ``concat``;
  - ``zerobias`` -6.58 logit shift (krisp.py:229-231).

The graph module runs graph convolutions over a fixed adjacency matrix
(dense jnp matmuls — the TPU-correct formulation of the reference's
torch-geometric sparse ops). KB files come from
``config.graph_module.kb_path``; absent files raise a clear error.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.models.visual_bert import VisualBERT


class GraphConvLayer(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, node_feats, adjacency):
        # symmetric-normalized dense graph convolution
        deg = jnp.sum(adjacency, axis=-1, keepdims=True)
        norm = adjacency / jnp.maximum(deg, 1.0)
        agg = jnp.einsum("nm,bmd->bnd", norm, node_feats) \
            if node_feats.ndim == 3 else norm @ node_feats
        return nn.relu(nn.Dense(self.out_dim, name="lin")(agg))


class GraphNetworkModule(nn.Module):
    """(reference krisp.py graph network)"""

    node_hid_dim: int = 128
    num_gcn_layers: int = 2

    @nn.compact
    def __call__(self, node_inputs, adjacency):
        x = node_inputs
        for i in range(self.num_gcn_layers):
            x = GraphConvLayer(self.node_hid_dim, name=f"gcn_{i}")(
                x, adjacency
            )
        return x


class GraphPtrNet(nn.Module):
    """Bilinear pointer scores between the implicit-branch hidden and the
    answer-node hiddens (reference krisp.py:246-283, Eq. 4 of the M4C
    pointer network)."""

    hidden_size: int

    @nn.compact
    def __call__(self, bl_hidden, graph_hidden):
        bl = nn.Dense(self.hidden_size, name="bl_w")(bl_hidden)
        gh = nn.Dense(self.hidden_size, name="graph_w")(graph_hidden)
        scores = jnp.einsum("bd,bnd->bn", bl, gh)
        return scores / jnp.sqrt(jnp.float32(self.hidden_size))


@registry.register_model("krisp")
class KRISP(BaseModel):

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        mmf/models/krisp.py:666-667: get_optimizer_parameters_for_bert /
        get_bert_configured_parameters)."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/krisp/defaults.yaml"

    def _load_adjacency(self):
        gm = self.config.get("graph_module", {}) or {}
        kb_path = gm.get("kb_path", None)
        if kb_path and os.path.exists(kb_path):
            return np.load(kb_path).astype(np.float32)
        num_nodes = gm.get("num_nodes", None)
        if num_nodes is None:
            raise RuntimeError(
                "KRISP requires a knowledge-base adjacency matrix: set "
                "model_config.krisp.graph_module.kb_path to an .npy file "
                "(or num_nodes for a learned-identity fallback)"
            )
        return np.eye(num_nodes, dtype=np.float32)

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        c = self.config
        gm = c.get("graph_module", {}) or {}
        vb_out = VisualBERT(
            config=c.get("visual_bert", c),
            name="visual_bert",
        )(sample_list, train)
        vb_logits = vb_out["scores"]
        vb_hidden = vb_out.get("pooled_output", None)
        num_labels = vb_logits.shape[-1]
        B = vb_logits.shape[0]

        adjacency = jnp.asarray(self._load_adjacency())
        num_nodes = adjacency.shape[0]

        # node inputs: question-grounded concept activations, optionally
        # augmented with the implicit branch's state
        # (reference krisp.py:166-196)
        node_inputs = sample_list.get("graph_node_inputs", None)
        if node_inputs is None:
            node_inputs = jnp.zeros((B, num_nodes, 1), jnp.float32)
        if c.get("feed_vb_to_graph", False) and vb_hidden is not None:
            mode = c.get("feed_mode", "feed_vb_hid_to_graph")
            if mode == "feed_vb_hid_to_graph":
                proj = nn.Dense(
                    gm.get("node_in_dim", node_inputs.shape[-1]),
                    name="vb_hid_to_node",
                )(vb_hidden)
                node_inputs = node_inputs + proj[:, None, :]
            elif mode == "feed_vb_logit_to_graph":
                # answer logits land on their answer nodes (first
                # num_labels nodes unless an index map is configured);
                # clamp to num_nodes — OOB scatters are silently dropped
                ans_inds = gm.get("ans_node_inds", None)
                if ans_inds is not None:
                    idx = jnp.asarray(ans_inds, jnp.int32)
                    vals = vb_logits[:, : idx.shape[0]]
                else:
                    n = min(num_labels, num_nodes)
                    idx = jnp.arange(n)
                    vals = vb_logits[:, :n]
                inject = jnp.zeros((B, num_nodes), jnp.float32)
                inject = inject.at[:, idx].set(vals)
                node_inputs = node_inputs + inject[..., None]

        graph_out = GraphNetworkModule(
            gm.get("node_hid_dim", 128), gm.get("num_gcn_layers", 2),
            name="graph_module",
        )(node_inputs, adjacency)  # [B, N, H]

        # answer-node subsample: which graph nodes correspond to answers
        ans_inds = gm.get("ans_node_inds", None)
        idx = (jnp.asarray(ans_inds, jnp.int32) if ans_inds is not None
               else jnp.arange(min(num_labels, num_nodes)))
        ans_nodes = graph_out[:, idx]  # [B, A, H]

        mode = c.get("graph_logit_mode", "logit_fc")
        if mode == "mc4":
            if vb_hidden is None:
                raise ValueError(
                    "graph_logit_mode=mc4 needs the implicit branch's "
                    "pooled hidden; use a VisualBERT classification head "
                    "(pretraining heads do not expose pooled_output)"
                )
            bl = vb_hidden
            if c.get("noback_vb_to_blinear", True):
                bl = jax.lax.stop_gradient(bl)
            graph_logits = GraphPtrNet(
                gm.get("ptr_hidden_size", bl.shape[-1]), name="graph_ptr_net"
            )(bl, ans_nodes)
        elif mode == "in_graph":
            graph_logits = ans_nodes[..., 0]
        else:  # logit_fc
            graph_logits = nn.Dense(1, name="graph_logit_fc")(
                ans_nodes
            )[..., 0]

        if graph_logits.shape[-1] < num_labels:
            graph_logits = jnp.pad(
                graph_logits,
                ((0, 0), (0, num_labels - graph_logits.shape[-1])),
            )

        combine = c.get("output_combine", "add")
        if combine == "concat":
            logits = jnp.concatenate([vb_logits, graph_logits], axis=1)
        else:  # add — zero answers with no graph node
            missing = c.get("missing_ans_inds", None)
            if missing:
                mask = jnp.ones((num_labels,), jnp.float32).at[
                    jnp.asarray(missing, jnp.int32)
                ].set(0.0)
                graph_logits = graph_logits * mask[None, :]
            logits = vb_logits + graph_logits[:, :num_labels]

        if c.get("zerobias", False):
            logits = logits - 6.58  # (reference krisp.py:229-231)
        return {"scores": logits}
