"""BERT-family tokenizer processors
(parity with mmf/datasets/processors/bert_processors.py).

All wrap HF AutoTokenizer on host and emit fixed-shape numpy arrays:
input_ids, input_mask, segment_ids, lm_label_ids (+ tokens). Registered:
masked_token, bert_tokenizer, multi_sentence_bert_tokenizer,
masked_roberta_tokenizer, roberta_tokenizer,
multi_sentence_roberta_tokenizer, vilt_text_tokenizer,
uniter_text_tokenizer, vinvl_text_tokenizer.
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict, List, Optional, Union

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.processors.processors import BaseProcessor


@registry.register_processor("masked_token")
class MaskedTokenProcessor(BaseProcessor):
    """Tokenize + BERT MLM 80/10/10 masking
    (reference bert_processors.py:18-175)."""

    _CLS_TOKEN = "[CLS]"
    _SEP_TOKEN = "[SEP]"
    _MASK_TOKEN = "[MASK]"
    _PAD_TOKEN_ID = 0

    def __init__(self, config, *args, **kwargs):
        tokenizer_config = config.get("tokenizer_config", {})
        self._tokenizer = self._build_tokenizer(tokenizer_config)
        self._max_seq_length = config.get("max_seq_length", 128)
        self._probability = config.get("mask_probability", 0.15)

    def _build_tokenizer(self, tokenizer_config):
        params = dict(tokenizer_config.get("params", {}) or {})
        # local vocab file support (offline environments; also the pattern
        # the reference's own tests use with a checked-in vocab.txt)
        vocab_file = params.pop("vocab_file", None) or tokenizer_config.get(
            "vocab_file", None
        )
        if vocab_file is not None and os.path.exists(vocab_file):
            from transformers import BertTokenizerFast

            return BertTokenizerFast(vocab_file=vocab_file, **params)
        from transformers import AutoTokenizer

        name = tokenizer_config.get("type", "bert-base-uncased")
        try:
            return AutoTokenizer.from_pretrained(
                name, local_files_only=True, **params
            )
        except OSError:
            return AutoTokenizer.from_pretrained(name, **params)

    def get_vocab_size(self) -> int:
        return len(self._tokenizer)

    def tokenize(self, tokens: Union[str, List[str]]) -> List[str]:
        return self._tokenizer.tokenize(tokens)

    def _convert_tokens_to_ids(self, tokens):
        return self._tokenizer.convert_tokens_to_ids(tokens)

    def _random_word(self, tokens: List[str], probability: float = 0.15):
        labels = []
        for idx, token in enumerate(tokens):
            prob = random.random()
            if prob < probability:
                prob /= probability
                if prob < 0.8:
                    tokens[idx] = self._MASK_TOKEN
                elif prob < 0.9:
                    tokens[idx] = self._tokenizer.convert_ids_to_tokens(
                        int(np.random.randint(self.get_vocab_size()))
                    )
                # 10% keep
                labels.append(self._convert_tokens_to_ids(token))
            else:
                labels.append(-1)
        return tokens, labels

    def _truncate_seq_pair(self, tokens_a, tokens_b, max_length):
        if tokens_b is None:
            tokens_b = []
            max_length -= 2
        else:
            max_length -= 3
        assert max_length >= 0, (
            "Max length should be minimum 2 in case of single sentence and "
            "3 in case of two sentences."
        )
        while True:
            total_length = len(tokens_a) + len(tokens_b)
            if total_length <= max_length:
                break
            if len(tokens_a) > len(tokens_b):
                tokens_a.pop()
            else:
                tokens_b.pop()

    def _convert_to_indices(self, tokens_a, tokens_b=None,
                            probability: float = 0.15) -> Dict[str, Any]:
        tokens_a, label_a = self._random_word(tokens_a, probability=probability)
        tokens = [self._CLS_TOKEN] + tokens_a + [self._SEP_TOKEN]
        segment_ids = [0] * len(tokens)
        lm_label_ids = [-1] + label_a + [-1]

        if tokens_b is not None:
            tokens_b, label_b = self._random_word(
                tokens_b, probability=probability
            )
            assert len(tokens_b) > 0
            tokens += tokens_b + [self._SEP_TOKEN]
            segment_ids += [1] * len(tokens_b) + [1]
            lm_label_ids += label_b + [-1]

        input_ids = self._convert_tokens_to_ids(tokens)
        input_mask = [1] * len(input_ids)
        while len(input_ids) < self._max_seq_length:
            input_ids.append(self._PAD_TOKEN_ID)
            input_mask.append(0)
            segment_ids.append(0)
            lm_label_ids.append(-1)

        return {
            "input_ids": np.asarray(input_ids, np.int64),
            "input_mask": np.asarray(input_mask, np.int64),
            "segment_ids": np.asarray(segment_ids, np.int64),
            "lm_label_ids": np.asarray(lm_label_ids, np.int64),
            "tokens": tokens,
        }

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        text_a = item["text_a"]
        text_b = item.get("text_b", None)
        tokens_a = self.tokenize(text_a)
        tokens_b = None
        if text_b:
            tokens_b = self.tokenize(text_b)
        self._truncate_seq_pair(tokens_a, tokens_b, self._max_seq_length)
        output = self._convert_to_indices(
            tokens_a, tokens_b, probability=self._probability
        )
        # ITM target rides along with the masked pair
        # (reference bert_processors.py:171-173)
        output["is_correct"] = np.int64(item.get("is_correct", True))
        return output


@registry.register_processor("bert_tokenizer")
class BertTokenizer(MaskedTokenProcessor):
    """Plain tokenization, no masking (mask prob 0)
    (reference bert_processors.py:178-211)."""

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)
        self._probability = config.get("mask_probability", 0)

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        if "text" in item:
            text_a = item["text"]
        elif "text_a" in item:
            text_a = item["text_a"]
        else:
            text_a = " ".join(item["tokens"])
        if isinstance(text_a, list):
            text_a = " ".join(text_a)
        tokens_a = self.tokenize(text_a)

        tokens_b = None
        if "text_b" in item and item["text_b"]:
            tokens_b = self.tokenize(item["text_b"])
        self._truncate_seq_pair(tokens_a, tokens_b, self._max_seq_length)
        output = self._convert_to_indices(
            tokens_a, tokens_b, probability=self._probability
        )
        output["text"] = output["tokens"]
        return output


@registry.register_processor("multi_sentence_bert_tokenizer")
class MultiSentenceBertTokenizer(BaseProcessor):
    """Tokenize each sentence in a list; stacks outputs
    (reference bert_processors.py:212-247)."""

    def __init__(self, config, *args, **kwargs):
        self.fusion = config.get("fusion", "concat")
        self.tokenizer = BertTokenizer(config, *args, **kwargs)

    def __call__(self, item: Dict[str, Any]) -> Dict[str, Any]:
        texts = item["text"]
        if not isinstance(texts, list):
            texts = [texts]
        processed = []
        for idx, text in enumerate(texts):
            sample = Sample()
            out = self.tokenizer({"text": text})
            sample.update(out)
            sample.segment_ids = np.full_like(sample.input_ids, idx)
            processed.append(sample)
        keys = ["input_ids", "input_mask", "segment_ids", "lm_label_ids"]
        result = Sample()
        for key in keys:
            stacked = np.stack([p[key] for p in processed])
            result[key] = (
                stacked.reshape(-1) if self.fusion == "concat" else stacked
            )
        result["text"] = [p["tokens"] for p in processed]
        return result


class _RobertaMixin:
    _CLS_TOKEN = "<s>"
    _SEP_TOKEN = "</s>"
    _MASK_TOKEN = "<mask>"
    _PAD_TOKEN_ID = 1

    def _build_tokenizer(self, tokenizer_config):
        params = dict(tokenizer_config.get("params", {}) or {})
        # offline support mirrors the BERT path: local vocab/merges files
        # first, then cached weights, then the network
        vocab_file = params.pop("vocab_file", None) or tokenizer_config.get(
            "vocab_file", None
        )
        merges_file = params.pop("merges_file", None) or tokenizer_config.get(
            "merges_file", None
        )
        if vocab_file is not None and os.path.exists(vocab_file) and \
                merges_file is not None and os.path.exists(merges_file):
            from transformers import RobertaTokenizerFast

            return RobertaTokenizerFast(
                vocab_file=vocab_file, merges_file=merges_file, **params
            )
        from transformers import AutoTokenizer

        name = tokenizer_config.get("type", "roberta-base")
        try:
            return AutoTokenizer.from_pretrained(
                name, local_files_only=True, **params
            )
        except OSError:
            return AutoTokenizer.from_pretrained(name, **params)


@registry.register_processor("masked_roberta_tokenizer")
class MaskedRobertaTokenizer(_RobertaMixin, MaskedTokenProcessor):
    """(reference bert_processors.py:248-318) — roberta has no segment ids
    and encodes pairs as ``<s> A </s> </s> B </s>`` (double separator,
    the format pretrained RoBERTa checkpoints expect)."""

    def _convert_to_indices(self, tokens_a, tokens_b=None, probability=0.15):
        tokens_a, label_a = self._random_word(
            tokens_a, probability=probability
        )
        tokens = [self._CLS_TOKEN] + tokens_a + [self._SEP_TOKEN]
        lm_label_ids = [-1] + label_a + [-1]
        if tokens_b:
            tokens_b, label_b = self._random_word(
                tokens_b, probability=probability
            )
            assert len(tokens_b) > 0
            tokens += [self._SEP_TOKEN] + tokens_b + [self._SEP_TOKEN]
            lm_label_ids += [-1] + label_b + [-1]

        input_ids = self._convert_tokens_to_ids(tokens)
        input_mask = [1] * len(input_ids)
        segment_ids = [0] * len(input_ids)
        while len(input_ids) < self._max_seq_length:
            input_ids.append(self._PAD_TOKEN_ID)
            input_mask.append(0)
            segment_ids.append(0)
            lm_label_ids.append(-1)

        return {
            "input_ids": np.asarray(input_ids, np.int64),
            "input_mask": np.asarray(input_mask, np.int64),
            "segment_ids": np.asarray(segment_ids, np.int64),
            "lm_label_ids": np.asarray(lm_label_ids, np.int64),
            "tokens": tokens,
        }


@registry.register_processor("roberta_tokenizer")
class RobertaTokenizer(_RobertaMixin, BertTokenizer):
    """(reference bert_processors.py:319-344) — shares the masked
    tokenizer's double-separator pair encoding with mask prob 0."""

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)
        self._probability = config.get("mask_probability", 0)

    def _convert_to_indices(self, tokens_a, tokens_b=None, probability=0.0):
        return MaskedRobertaTokenizer._convert_to_indices(
            self, tokens_a, tokens_b, probability
        )


@registry.register_processor("multi_sentence_roberta_tokenizer")
class MultiSentenceRobertaTokenizer(MultiSentenceBertTokenizer):
    """(reference bert_processors.py:345-360)"""

    def __init__(self, config, *args, **kwargs):
        self.fusion = config.get("fusion", "concat")
        self.tokenizer = RobertaTokenizer(config, *args, **kwargs)


@registry.register_processor("vilt_text_tokenizer")
class VILTTextTokenizer(MaskedTokenProcessor):
    """(reference bert_processors.py:409-433)"""

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)
        self._probability = config.get("mask_probability", 0)

    def __call__(self, item):
        if "text" in item:
            text_a = item["text"]
        else:
            text_a = " ".join(item["tokens"])
        tokens_a = self.tokenize(text_a)
        self._truncate_seq_pair(tokens_a, None, self._max_seq_length)
        output = self._convert_to_indices(
            tokens_a, None, probability=self._probability
        )
        output["text"] = output["tokens"]
        return output


@registry.register_processor("uniter_text_tokenizer")
class UNITERTextTokenizer(MaskedTokenProcessor):
    """(reference bert_processors.py:434-523): emits both masked and
    unmasked ids (input_ids_masked) for conditional task sampling."""

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)
        self._probability = config.get("mask_probability", 0)

    def __call__(self, item):
        if "text" in item:
            text_a = item["text"]
        else:
            text_a = " ".join(item["tokens"])
        tokens_a = self.tokenize(text_a)
        self._truncate_seq_pair(tokens_a, None, self._max_seq_length)
        masked = self._convert_to_indices(
            list(tokens_a), None, probability=self._probability
        )
        unmasked = self._convert_to_indices(list(tokens_a), None,
                                            probability=0.0)
        output = dict(unmasked)
        output["input_ids_masked"] = masked["input_ids"]
        output["lm_label_ids"] = masked["lm_label_ids"]
        output["text"] = output["tokens"]
        return output


@registry.register_processor("vinvl_text_tokenizer")
class VinVLTextTokenizer(MaskedTokenProcessor):
    """(reference bert_processors.py:524-653): caption + OD-tag pair
    tokenization keeping BOTH the masked and the original id sequences
    (the VinVL model uses ``input_ids_masked`` for MLM and ``input_ids``
    elsewhere), plus contrastive corruption: with probability
    ``corrupt_probability`` the caption (or the tag string) is swapped for
    a random draw, emitting ``*_corrupt`` inputs and a 3-way
    ``contrastive_label`` (0=match, 1=caption swapped, 2=tags swapped)."""

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)
        self._max_seq_length = config.get("max_seq_length", 70)
        self._probability = config.get("mask_probability", 0)
        self._corrupt_prob = config.get("corrupt_probability", 0)
        self._corrupt_caption_prob = config.get(
            "corrupt_caption_probability", 0
        )

    def _pair_output(self, item):
        text_a = item.get("text", item.get("text_a", ""))
        text_b = item.get("text_b", None)
        if isinstance(text_a, list):
            text_a = " ".join(text_a)
        tokens_a = self.tokenize(text_a)
        tokens_b = self.tokenize(text_b) if text_b else None
        self._truncate_seq_pair(tokens_a, tokens_b, self._max_seq_length)
        output = self._convert_to_indices(
            list(tokens_a),
            list(tokens_b) if tokens_b is not None else None,
            probability=self._probability,
        )
        # keep the masked ids under their own key and restore the
        # original (unmasked) sequence under input_ids
        output["input_ids_masked"] = output["input_ids"]
        output["tokens_masked"] = output["tokens"]
        plain = [self._CLS_TOKEN] + tokens_a + [self._SEP_TOKEN]
        if tokens_b:
            plain += tokens_b + [self._SEP_TOKEN]
        ids = self._convert_tokens_to_ids(plain)
        ids += [self._PAD_TOKEN_ID] * (self._max_seq_length - len(ids))
        output["input_ids"] = np.asarray(ids, np.int64)
        output["text"] = output["tokens_masked"]
        return output

    def _contrastive_output(self, item):
        required = ("random_captions", "random_labels", "text_b")
        for key in required:
            assert key in item, (
                f"'{key}' is required for VinVL contrastive corruption; "
                "set corrupt_probability to 0 to disable"
            )
        p_match = 1 - self._corrupt_prob
        p_caption = self._corrupt_prob * self._corrupt_caption_prob
        p_label = self._corrupt_prob * (1 - self._corrupt_caption_prob)
        label = int(np.random.choice(3, p=[p_match, p_caption, p_label]))
        corrupt_item = dict(item)
        if label == 1:
            corrupt_item["text"] = random.choice(item["random_captions"])
        elif label == 2:
            corrupt_item["text_b"] = random.choice(item["random_labels"])
        return label, self._pair_output(corrupt_item)

    def __call__(self, item):
        output = self._pair_output(item)
        if self._corrupt_prob > 0:
            label, corrupt = self._contrastive_output(item)
            output["input_ids_corrupt"] = corrupt["input_ids"]
            output["segment_ids_corrupt"] = corrupt["segment_ids"]
            output["input_mask_corrupt"] = corrupt["input_mask"]
            output["contrastive_label"] = np.int64(label)
            # the reference's model side reads the plural key
            # (vinvl.py:468) while its processor emits the singular
            # (bert_processors.py:555) — emit both so the standard
            # pipeline actually works end to end
            output["contrastive_labels"] = np.int64(label)
        return output
