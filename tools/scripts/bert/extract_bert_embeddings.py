"""Extract per-text BERT embeddings to npy files
(parity with tools/scripts/bert/extract_bert_embeddings.py; the reference
runs a CUDA HF BertModel — here the in-repo flax encoder runs jitted on
the attached accelerator, with weights converted from a local HF
checkpoint when provided).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))


class BertFeatExtractor:
    def __init__(self, vocab_file: str, checkpoint: str = None,
                 max_seq_length: int = 64):
        import jax

        from mmf_tpu.datasets.processors.bert_processors import BertTokenizer
        from mmf_tpu.modules.transformer import (
            TransformerConfig,
            TransformerModel,
        )

        self.processor = BertTokenizer(
            {"max_seq_length": max_seq_length,
             "tokenizer_config": {"type": "bert-base-uncased",
                                  "vocab_file": vocab_file}}
        )
        self.model = TransformerModel(
            TransformerConfig(
                vocab_size=self.processor.get_vocab_size()
            )
        )
        ex = self._encode("hello world")
        self.variables = self.model.init(
            jax.random.PRNGKey(0),
            input_ids=ex["input_ids"][None],
            attention_mask=ex["input_mask"][None],
            token_type_ids=ex["segment_ids"][None],
        )
        if checkpoint:
            from mmf_tpu.utils.checkpoint import load_pretrained_model

            loaded = load_pretrained_model(checkpoint)
            self.variables = loaded["checkpoint"]["variables"]
        self._apply = jax.jit(
            lambda v, ids, seg, mask: self.model.apply(
                v, input_ids=ids, attention_mask=mask, token_type_ids=seg
            )
        )

    def _encode(self, text: str):
        return self.processor({"text": text})

    def get_bert_embedding(self, text: str) -> np.ndarray:
        enc = self._encode(text)
        sequence, _ = self._apply(
            self.variables,
            enc["input_ids"][None],
            enc["segment_ids"][None],
            enc["input_mask"][None],
        )
        # masked mean over real tokens
        mask = np.asarray(enc["input_mask"], np.float32)[None, :, None]
        seq = np.asarray(sequence, np.float32)
        return (seq * mask).sum(axis=1)[0] / max(mask.sum(), 1.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_file", required=True,
                        help="One text per line")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--vocab_file", required=True,
                        help="Local BERT vocab (offline tokenizer)")
    parser.add_argument("--checkpoint", default=None,
                        help="Converted BERT weights (optional)")
    parser.add_argument("--max_seq_length", type=int, default=64)
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    extractor = BertFeatExtractor(
        args.vocab_file, args.checkpoint, args.max_seq_length
    )
    with open(args.input_file) as f:
        texts = [line.strip() for line in f if line.strip()]
    embeddings = np.stack(
        [extractor.get_bert_embedding(t) for t in texts]
    )
    out = os.path.join(args.out_dir, "bert_embeddings.npy")
    np.save(out, embeddings)
    print(f"{embeddings.shape} -> {out}")


if __name__ == "__main__":
    main()
