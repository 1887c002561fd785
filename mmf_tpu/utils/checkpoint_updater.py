"""Checkpoint conversion utilities.

Two jobs (parity with mmf/utils/checkpoint_updater.py plus the north-star
PyTorch->JAX weight converter):

1. ``is_model_only_checkpoint`` / pretrained-state-mapping helpers for our
   own orbax checkpoints;
2. ``convert_torch_state_dict`` — maps a torch state_dict (e.g. the
   reference zoo's .ckpt/.pth files, or HF bert-base-uncased) onto a flax
   param pytree by name translation + transposition rules:
     - Linear weight [out,in]  -> Dense kernel [in,out] (transpose)
     - Embedding weight        -> Embed embedding (as-is)
     - LayerNorm weight/bias   -> scale/bias
     - Conv weight [O,I,H,W]   -> [H,W,I,O]
   Model-specific key renames go through each model's
   ``format_state_key`` hook plus a per-model map.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def is_model_only_checkpoint(ckpt: Dict[str, Any]) -> bool:
    """(reference checkpoint_updater.py:21)"""
    return "variables" in ckpt and "opt_state" not in ckpt or (
        "model" in ckpt and "optimizer" not in ckpt
    )


def get_pretrained_state_mapping_checkpoint(checkpoint, model, mapping):
    """(reference checkpoint_updater.py:62): filter a checkpoint down to
    keys covered by the pretrained_state_mapping."""
    out = {}
    for own_attr, pretrained_attr in mapping.items():
        for key, value in checkpoint.items():
            if key.startswith(pretrained_attr):
                out[key.replace(pretrained_attr, own_attr, 1)] = value
    return out


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------
def _flatten_flax(tree, prefix=()):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten_flax(v, prefix + (k,)))
    else:
        flat[prefix] = tree
    return flat


def _unflatten_flax(flat):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        cur = tree
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = v
    return tree


def _torch_key_to_flax_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """Translate a torch dotted key into (flax path, kind). kind in
    {kernel, bias, embedding, scale, conv, other}."""
    parts = key.split(".")
    leaf = parts[-1]
    body = parts[:-1]
    # LayerNorm
    body_l = [p.lower() for p in body]
    if body and ("layernorm" in body_l[-1] or "layer_norm" in body_l[-1]
                 or body[-1] == "LayerNorm"):
        kind = "scale" if leaf == "weight" else "bias"
        return tuple(body), kind
    # (Frozen)BatchNorm keeps torch leaf names verbatim in our modules
    # (bottleneck.py FrozenBatchNorm2d: weight/bias/running_mean/running_var)
    if body and re.fullmatch(r"bn\d*|.*batch_?norm\d*", body_l[-1]):
        return tuple(body + [leaf]), "other"
    if leaf == "weight":
        return tuple(body), "kernel"
    if leaf == "bias":
        return tuple(body), "bias"
    return tuple(body + [leaf]), "other"


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    flax_params: Dict[str, Any],
    key_map: Optional[Dict[str, str]] = None,
    format_state_key=None,
) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Best-effort name-matched conversion of a torch state_dict onto an
    existing flax param tree (shapes must match after transposition).

    key_map: regex -> replacement applied to torch keys first.
    Returns (new_params, stats)."""
    key_map = key_map or {}
    flat = _flatten_flax(flax_params)
    # index flax leaves by normalized name for fuzzy matching
    norm_index = {}
    for path in flat:
        norm = tuple(p.lower().replace("_", "") for p in path)
        norm_index[norm] = path

    stats = {"matched": 0, "missed": 0, "shape_mismatch": 0}
    new_flat = dict(flat)

    for tkey, tval in state_dict.items():
        arr = np.asarray(tval)
        key = tkey
        for pattern, repl in key_map.items():
            key = re.sub(pattern, repl, key)
        if format_state_key is not None:
            key = format_state_key(key)
        path, kind = _torch_key_to_flax_path(key)

        candidates = []
        if kind == "kernel":
            candidates = [path + ("kernel",), path + ("embedding",),
                          path + ("scale",)]
        elif kind == "bias":
            candidates = [path + ("bias",)]
        elif kind in ("scale",):
            candidates = [path + ("scale",)]
        else:
            candidates = [path]

        target = None
        for cand in candidates:
            norm = tuple(p.lower().replace("_", "") for p in cand)
            if norm in norm_index:
                target = norm_index[norm]
                break
        if target is None:
            stats["missed"] += 1
            continue

        expected = np.shape(flat[target])
        converted = arr
        if target[-1] == "kernel":
            if arr.ndim == 2:
                converted = arr.T
            elif arr.ndim == 4:  # conv OIHW -> HWIO
                converted = arr.transpose(2, 3, 1, 0)
        if np.shape(converted) != expected:
            if np.shape(arr) == expected:
                converted = arr
            else:
                stats["shape_mismatch"] += 1
                continue
        new_flat[target] = converted.astype(np.asarray(flat[target]).dtype)
        stats["matched"] += 1

    logger.info(
        f"torch->flax conversion: {stats['matched']} matched, "
        f"{stats['missed']} missed, {stats['shape_mismatch']} shape mismatches"
    )
    return _unflatten_flax(new_flat), stats


# canonical rename maps for the flagship models (HF BERT -> our trunk)
HF_BERT_KEY_MAP = {
    r"^bert\.": "",
    r"embeddings\.word_embeddings": "embeddings.word_embeddings",
    r"embeddings\.LayerNorm": "embeddings.layer_norm",
    r"encoder\.layer\.(\d+)\.attention\.self\.query":
        r"encoder.layer_\1.attention.query",
    r"encoder\.layer\.(\d+)\.attention\.self\.key":
        r"encoder.layer_\1.attention.key",
    r"encoder\.layer\.(\d+)\.attention\.self\.value":
        r"encoder.layer_\1.attention.value",
    r"encoder\.layer\.(\d+)\.attention\.output\.dense":
        r"encoder.layer_\1.attention.output_dense",
    r"encoder\.layer\.(\d+)\.attention\.output\.LayerNorm":
        r"encoder.layer_\1.attention.output_layer_norm",
    r"encoder\.layer\.(\d+)\.intermediate\.dense":
        r"encoder.layer_\1.ffn.intermediate_dense",
    r"encoder\.layer\.(\d+)\.output\.dense":
        r"encoder.layer_\1.ffn.output_dense",
    r"encoder\.layer\.(\d+)\.output\.LayerNorm":
        r"encoder.layer_\1.ffn.output_layer_norm",
    r"pooler\.dense": "pooler.dense",
}


# HF ViT -> our pre-LN ViTModel (modules/vit.py)
HF_VIT_KEY_MAP = {
    r"^vit\.": "",
    r"embeddings\.patch_embeddings\.projection": "embeddings.projection",
    r"encoder\.layer\.(\d+)\.layernorm_before": r"encoder.layer_\1.layernorm_before",
    r"encoder\.layer\.(\d+)\.layernorm_after": r"encoder.layer_\1.layernorm_after",
    r"encoder\.layer\.(\d+)\.attention\.attention\.query":
        r"encoder.layer_\1.attention_query",
    r"encoder\.layer\.(\d+)\.attention\.attention\.key":
        r"encoder.layer_\1.attention_key",
    r"encoder\.layer\.(\d+)\.attention\.attention\.value":
        r"encoder.layer_\1.attention_value",
    # older HF versions nest self-attention one level less
    r"encoder\.layer\.(\d+)\.attention\.self\.query":
        r"encoder.layer_\1.attention_query",
    r"encoder\.layer\.(\d+)\.attention\.self\.key":
        r"encoder.layer_\1.attention_key",
    r"encoder\.layer\.(\d+)\.attention\.self\.value":
        r"encoder.layer_\1.attention_value",
    r"encoder\.layer\.(\d+)\.attention\.output\.dense":
        r"encoder.layer_\1.attention_output_dense",
    r"encoder\.layer\.(\d+)\.intermediate\.dense":
        r"encoder.layer_\1.intermediate_dense",
    r"encoder\.layer\.(\d+)\.output\.dense": r"encoder.layer_\1.output_dense",
    r"^layernorm\.": "layernorm.",
    r"^pooler\.dense": "pooler.dense",
}


# timm-style ViT (the reference's vendored ALBEF VisionTransformer,
# mmf/models/albef/vit.py:522-667) -> our pre-LN ViTModel. Fused qkv
# weights must be split with ``split_timm_qkv`` before conversion.
TIMM_VIT_KEY_MAP = {
    r"patch_embed\.proj": "embeddings.projection",
    r"^(vit\.)?cls_token$": r"\1embeddings.cls_token",
    r"^(vit\.)?pos_embed$": r"\1embeddings.position_embeddings",
    r"blocks\.(\d+)\.norm1": r"encoder.layer_\1.layernorm_before",
    r"blocks\.(\d+)\.norm2": r"encoder.layer_\1.layernorm_after",
    r"blocks\.(\d+)\.attn\.q": r"encoder.layer_\1.attention_query",
    r"blocks\.(\d+)\.attn\.k": r"encoder.layer_\1.attention_key",
    r"blocks\.(\d+)\.attn\.v": r"encoder.layer_\1.attention_value",
    r"blocks\.(\d+)\.attn\.proj": r"encoder.layer_\1.attention_output_dense",
    r"blocks\.(\d+)\.mlp\.fc1": r"encoder.layer_\1.intermediate_dense",
    r"blocks\.(\d+)\.mlp\.fc2": r"encoder.layer_\1.output_dense",
    r"^(vit\.)?norm\.": r"\1layernorm.",
}


def split_timm_qkv(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Split timm's fused ``attn.qkv.{weight,bias}`` ([3D, D] rows stacked
    q,k,v — mmf/models/albef/vit.py:434) into separate q/k/v entries so
    the name-matched converter can place them."""
    out = {}
    for key, val in state_dict.items():
        if ".attn.qkv." in key:
            arr = np.asarray(val)
            q, k, v = np.split(arr, 3, axis=0)
            for name, part in (("q", q), ("k", k), ("v", v)):
                out[key.replace(".attn.qkv.", f".attn.{name}.")] = part
        else:
            out[key] = val
    return out


def convert_torch_lstm_weights(
    weight_ih: np.ndarray,
    weight_hh: np.ndarray,
    bias_ih: Optional[np.ndarray] = None,
    bias_hh: Optional[np.ndarray] = None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Torch LSTM layer weights -> flax (Optimized)LSTMCell params.

    Torch packs gates as [i, f, g, o] rows of [4H, E]/[4H, H] and adds
    bias_ih + bias_hh; flax keeps one Dense per gate — input Denses
    (ii/if/ig/io) without bias, hidden Denses (hi/hf/hg/ho) carrying the
    summed bias."""
    H = weight_hh.shape[1]
    gates = ("i", "f", "g", "o")
    out: Dict[str, Dict[str, np.ndarray]] = {}
    bias = None
    if bias_ih is not None or bias_hh is not None:
        bias = (bias_ih if bias_ih is not None else 0) + (
            bias_hh if bias_hh is not None else 0
        )
    for idx, gate in enumerate(gates):
        rows = slice(idx * H, (idx + 1) * H)
        out[f"i{gate}"] = {"kernel": np.ascontiguousarray(weight_ih[rows].T)}
        hcell = {"kernel": np.ascontiguousarray(weight_hh[rows].T)}
        if bias is not None:
            hcell["bias"] = np.ascontiguousarray(bias[rows])
        out[f"h{gate}"] = hcell
    return out


def convert_torch_gru_weights(
    weight_ih: np.ndarray,
    weight_hh: np.ndarray,
    bias_ih: Optional[np.ndarray] = None,
    bias_hh: Optional[np.ndarray] = None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Torch GRU layer weights -> flax GRUCell params.

    Torch packs gates as [r, z, n] rows of [3H, E]/[3H, H]; both
    formulations compute n = tanh(W_in x + b_in + r * (W_hn h + b_hn)), so
    r/z input biases fold to b_ir+b_hr while the n-gate biases stay
    separate (flax ``in``/``hn`` both carry a bias; ``hr``/``hz`` have
    none)."""
    H = weight_hh.shape[1]
    gates = ("r", "z", "n")
    z = np.zeros((3 * H,), weight_ih.dtype)
    bias_ih = z if bias_ih is None else bias_ih
    bias_hh = z if bias_hh is None else bias_hh
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for idx, gate in enumerate(gates):
        rows = slice(idx * H, (idx + 1) * H)
        i_name = "in" if gate == "n" else f"i{gate}"
        i_bias = (bias_ih[rows] if gate == "n"
                  else bias_ih[rows] + bias_hh[rows])
        out[i_name] = {
            "kernel": np.ascontiguousarray(weight_ih[rows].T),
            "bias": np.ascontiguousarray(i_bias),
        }
        hcell = {"kernel": np.ascontiguousarray(weight_hh[rows].T)}
        if gate == "n":
            hcell["bias"] = np.ascontiguousarray(bias_hh[rows])
        out[f"h{gate}"] = hcell
    return out


# ViLBERT zoo checkpoints (trunk under "bert."): two-stream layer names
# onto our flax tree (models/vilbert.py). Patterns are unanchored so the
# same map works under wrapper prefixes.
VILBERT_KEY_MAP = {
    # pretraining ITM head (reference vilbert.py:865 bi_seq_relationship
    # lives under cls.)
    r"cls\.bi_seq_relationship": "bi_seq_relationship",
    r"bert\.encoder\.layer\.(\d+)\.attention\.self\.": r"bert.layer_\1.",
    r"bert\.encoder\.layer\.(\d+)\.attention\.output\.dense":
        r"bert.layer_\1.attention_output_dense",
    r"bert\.encoder\.layer\.(\d+)\.attention\.output\.LayerNorm":
        r"bert.layer_\1.attention_ln",
    r"bert\.encoder\.layer\.(\d+)\.intermediate\.dense":
        r"bert.layer_\1.intermediate_dense",
    r"bert\.encoder\.layer\.(\d+)\.output\.dense":
        r"bert.layer_\1.output_dense",
    r"bert\.encoder\.layer\.(\d+)\.output\.LayerNorm":
        r"bert.layer_\1.output_ln",
    r"bert\.encoder\.v_layer\.(\d+)\.attention\.self\.":
        r"bert.v_layer_\1.attention_self.",
    r"bert\.encoder\.v_layer\.(\d+)\.attention\.output\.dense":
        r"bert.v_layer_\1.attention_output_dense",
    r"bert\.encoder\.v_layer\.(\d+)\.attention\.output\.LayerNorm":
        r"bert.v_layer_\1.attention_ln",
    r"bert\.encoder\.v_layer\.(\d+)\.intermediate\.dense":
        r"bert.v_layer_\1.intermediate_dense",
    r"bert\.encoder\.v_layer\.(\d+)\.output\.dense":
        r"bert.v_layer_\1.output_dense",
    r"bert\.encoder\.v_layer\.(\d+)\.output\.LayerNorm":
        r"bert.v_layer_\1.output_ln",
    r"bert\.encoder\.c_layer\.(\d+)\.biattention\.": r"bert.c_layer_\1.",
    r"bert\.encoder\.c_layer\.(\d+)\.biOutput\.dense1":
        r"bert.c_layer_\1.biout_dense1",
    r"bert\.encoder\.c_layer\.(\d+)\.biOutput\.LayerNorm1":
        r"bert.c_layer_\1.biout_ln1",
    r"bert\.encoder\.c_layer\.(\d+)\.biOutput\.dense2":
        r"bert.c_layer_\1.biout_dense2",
    r"bert\.encoder\.c_layer\.(\d+)\.biOutput\.LayerNorm2":
        r"bert.c_layer_\1.biout_ln2",
    r"bert\.encoder\.c_layer\.(\d+)\.v_intermediate\.dense":
        r"bert.c_layer_\1.v_intermediate",
    r"bert\.encoder\.c_layer\.(\d+)\.v_output\.dense":
        r"bert.c_layer_\1.v_output",
    r"bert\.encoder\.c_layer\.(\d+)\.v_output\.LayerNorm":
        r"bert.c_layer_\1.v_output_ln",
    r"bert\.encoder\.c_layer\.(\d+)\.t_intermediate\.dense":
        r"bert.c_layer_\1.t_intermediate",
    r"bert\.encoder\.c_layer\.(\d+)\.t_output\.dense":
        r"bert.c_layer_\1.t_output",
    r"bert\.encoder\.c_layer\.(\d+)\.t_output\.LayerNorm":
        r"bert.c_layer_\1.t_output_ln",
    r"bert\.v_embeddings\.image_embeddings": "bert.v_image_embeddings",
    r"bert\.v_embeddings\.image_location_embeddings":
        "bert.v_location_embeddings",
    r"bert\.v_embeddings\.LayerNorm": "bert.v_embeddings_ln",
    r"bert\.embeddings\.LayerNorm": "bert.embeddings.layer_norm",
    r"bert\.t_pooler\.dense": "bert.t_pooler",
    r"bert\.v_pooler\.dense": "bert.v_pooler",
}


# MMBT zoo checkpoints (MMBTModel: shared-embedding multimodal BERT)
MMBT_KEY_MAP = {
    r"transformer\.embeddings\.word_embeddings": "word_embeddings",
    r"transformer\.embeddings\.position_embeddings": "position_embeddings",
    r"transformer\.embeddings\.token_type_embeddings":
        "token_type_embeddings",
    r"transformer\.embeddings\.LayerNorm": "embeddings_layer_norm",
    r"transformer\.encoder": "encoder",
    r"transformer\.pooler\.dense": "pooler.dense",
    r"modal_encoder\.proj_embeddings": "proj_embeddings",
    r"modal_encoder\.word_embeddings": "word_embeddings",
    r"modal_encoder\.position_embeddings": "position_embeddings",
    r"modal_encoder\.token_type_embeddings": "token_type_embeddings",
    r"modal_encoder\.LayerNorm": "embeddings_layer_norm",
}


# per-model maps the convert CLI layers on top of the HF-BERT base map
VISUAL_BERT_KEY_MAP = {
    # NSP head: torch key cls.seq_relationship -> top-level module here
    r"cls\.seq_relationship": "seq_relationship",
}

MODEL_KEY_MAPS: Dict[str, Dict[str, str]] = {
    "visual_bert": VISUAL_BERT_KEY_MAP,
    "vilbert": VILBERT_KEY_MAP,
    "mmbt": MMBT_KEY_MAP,
    "vilt": HF_VIT_KEY_MAP,
    # visual_bert / m4c / uniter / lxmert trunks are covered by the
    # unanchored HF-BERT patterns + fuzzy matching
}
