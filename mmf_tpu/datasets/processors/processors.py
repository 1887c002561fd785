"""Core processors (parity with mmf/datasets/processors/processors.py).

Host-side preprocessing emitting fixed-shape numpy arrays — the contract
that keeps the device feed jit-friendly. All registered keys from the
reference are provided: vocab, glove, fasttext, vqa_answer,
graph_vqa_answer, multi_hot_answer_from_vocab, soft_copy_answer,
simple_word, simple_sentence, bbox, caption, evalai_answer, phoc, copy,
m4c_answer, m4c_caption, masked_region, transformer_bbox,
multi_class_from_file, detr_image_and_target.
"""

from __future__ import annotations

import collections
import logging
import os
import random
import warnings
from collections import Counter, defaultdict
from itertools import islice, product
from typing import Any, Dict, List, Optional, Union

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.utils.text import VocabDict, tokenize, word_tokenize

logger = logging.getLogger(__name__)


class BaseProcessor:
    """(reference processors.py:102-127)"""

    def __init__(self, *args, config=None, **kwargs):
        return

    def __call__(self, item, *args, **kwargs):
        return item


class Processor:
    """Type+params dispatch wrapper with attribute passthrough
    (reference processors.py:130-177)."""

    def __init__(self, config, *args, **kwargs):
        if "type" not in config:
            raise AttributeError(
                "Processor config needs a 'type' key naming a registered processor"
            )
        processor_class = registry.get_processor_class(config["type"])
        if processor_class is None:
            raise ValueError(
                f"Unknown processor type {config['type']!r}: nothing is "
                f"registered under that key"
            )
        params = {}
        if "params" not in config:
            logger.warning(
                f"Processor '{config['type']}' configured without a "
                "'params' block; instantiating with defaults"
            )
        else:
            params = config["params"]
        self.processor = processor_class(params, *args, **kwargs)
        self._dir_representation = dir(self)

    def __call__(self, item, *args, **kwargs):
        return self.processor(item, *args, **kwargs)

    def __getattr__(self, name):
        # reached only when normal attribute lookup fails: delegate to
        # the wrapped processor instance
        wrapped = self.__dict__.get("processor")
        if wrapped is not None and hasattr(wrapped, name):
            return getattr(wrapped, name)
        raise AttributeError(
            f"Neither the wrapper nor the wrapped processor has {name!r}"
        )


class BatchProcessor(BaseProcessor):
    """(reference processors.py:180-205)"""

    def __init__(self, config, *args, **kwargs):
        from mmf_tpu.config.configuration import get_mmf_env

        extra_params = {"data_dir": get_mmf_env(key="data_dir")}
        processors_dict = (config or {}).get("processors", {})
        self.processors = {}
        for key, cfg in (processors_dict or {}).items():
            if cfg is None:
                continue
            self.processors[key] = Processor(cfg, **extra_params)

    def __call__(self, item):
        return item


@registry.register_processor("vocab")
class VocabProcessor(BaseProcessor):
    """Words -> padded index arrays via a Vocab
    (reference processors.py:207-342)."""

    MAX_LENGTH_DEFAULT = 50
    PAD_TOKEN = "<pad>"
    PAD_INDEX = 0

    def __init__(self, config, *args, **kwargs):
        if not config.get("vocab"):
            raise AttributeError(
                "VocabProcessor needs a 'vocab' block in its config"
            )
        from mmf_tpu.utils.vocab import Vocab

        self.vocab = Vocab(*args, **config["vocab"], **kwargs)
        self._init_extras(config, *args, **kwargs)

    def _init_extras(self, config, *args, **kwargs):
        self.preprocessor = None
        if "max_length" in config:
            self.max_length = config["max_length"]
        else:
            warnings.warn(
                f"VocabProcessor: max_length not configured; padding "
                f"to the default of {self.MAX_LENGTH_DEFAULT} tokens"
            )
            self.max_length = self.MAX_LENGTH_DEFAULT
        if "preprocessor" in config:
            self.preprocessor = Processor(config["preprocessor"], *args, **kwargs)

    def __call__(self, item):
        indices = None
        if not isinstance(item, dict):
            raise TypeError(
                "VocabProcessor input must be a dict carrying 'text' "
                "or 'tokens'"
            )
        if "tokens" in item:
            tokens = item["tokens"]
            indices = self._map_strings_to_indices(item["tokens"])
        elif "text" in item:
            if self.preprocessor is None:
                raise AssertionError(
                    "Raw 'text' input needs a configured preprocessor "
                    "to tokenize it first"
                )
            tokens = self.preprocessor({"text": item["text"]})["text"]
            indices = self._map_strings_to_indices(tokens)
        else:
            raise AssertionError(
                "VocabProcessor input carries neither 'text' nor 'tokens'"
            )
        tokens, length = self._pad_tokens(tokens)
        return {"text": indices, "tokens": tokens, "length": length}

    def _pad_tokens(self, tokens):
        padded_tokens = [self.PAD_TOKEN] * self.max_length
        token_length = min(len(tokens), self.max_length)
        padded_tokens[:token_length] = tokens[:token_length]
        return padded_tokens, np.int64(token_length)

    def get_pad_index(self):
        return self.vocab.get_pad_index()

    def get_vocab_size(self):
        return self.vocab.get_size()

    def _map_strings_to_indices(self, tokens):
        length = min(len(tokens), self.max_length)
        tokens = tokens[:length]
        output = np.full(self.max_length, self.vocab.get_pad_index(), np.int64)
        for idx, token in enumerate(tokens):
            output[idx] = self.vocab.stoi.get(
                token, self.vocab.get_unk_index()
            )
        return output


@registry.register_processor("glove")
class GloVeProcessor(VocabProcessor):
    """Returns GloVe vectors directly instead of indices
    (reference processors.py:356-404)."""

    def __init__(self, config, *args, **kwargs):
        if not config.get("vocab"):
            raise AttributeError(
                "GloVeProcessor needs a 'vocab' block in its config"
            )
        vocab_processor_config = dict(config)
        vocab_processor_config["vocab"] = dict(config["vocab"])
        vocab_processor_config["vocab"]["type"] = "intersected"
        if "vocab_file" not in vocab_processor_config["vocab"]:
            warnings.warn(
                "GloVeProcessor: no vocab_file given; falling back to "
                "the full pretrained GloVe vocabulary"
            )
            vocab_processor_config["vocab"]["type"] = "pretrained"
        super().__init__(vocab_processor_config, *args, **kwargs)

    def __call__(self, item):
        indices = super().__call__(item)["text"]
        embeddings = np.zeros(
            (len(indices), self.vocab.get_vectors().shape[1]), np.float32
        )
        for idx, index in enumerate(indices):
            embeddings[idx] = self.vocab.get_vectors()[int(index)]
        return {"text": embeddings}


@registry.register_processor("fasttext")
class FastTextProcessor(VocabProcessor):
    """FastText sentence vectors (reference processors.py:407-532).
    Requires the fasttext model file in the cache (no egress)."""

    def __init__(self, config, *args, **kwargs):
        self._init_extras(config)
        self.config = config
        self._download_initially = config.get("download_initially", False)
        self._already_downloaded = False
        self._is_model_loaded = False
        self.model_file = config.get("model_file", None)

    def _load_fasttext_model(self, model_file):
        if self._is_model_loaded:
            return
        import fasttext

        if not os.path.exists(model_file):
            raise RuntimeError(
                f"fasttext model {model_file} not present; pre-populate the "
                "cache (no network egress in this environment)"
            )
        self.model = fasttext.load_model(model_file)
        self._is_model_loaded = True

    def _map_strings_to_indices(self, tokens):
        length = min(len(tokens), self.max_length)
        tokens = tokens[:length]
        output = np.full(
            (self.max_length, self.model.get_dimension()), 0, np.float32
        )
        for idx, token in enumerate(tokens):
            output[idx] = self.model.get_word_vector(token)
        return output

    def __call__(self, item):
        from mmf_tpu.config.configuration import get_mmf_cache_dir

        model_file = self.model_file or os.path.join(
            get_mmf_cache_dir(), "wiki.en.bin"
        )
        self._load_fasttext_model(model_file)
        return super().__call__(item)


@registry.register_processor("vqa_answer")
class VQAAnswerProcessor(BaseProcessor):
    """Soft VQA-accuracy answer scores (reference processors.py:535-719)."""

    DEFAULT_NUM_ANSWERS = 10

    def __init__(self, config, *args, **kwargs):
        if "vocab_file" not in config:
            raise AttributeError(
                "Answer processors need 'vocab_file' in their config"
            )
        self.answer_vocab = VocabDict(
            config["vocab_file"], kwargs.get("data_dir", None)
        )
        self.PAD_IDX = self.answer_vocab.word2idx("<pad>")
        self.BOS_IDX = self.answer_vocab.word2idx("<s>")
        self.EOS_IDX = self.answer_vocab.word2idx("</s>")
        self.UNK_IDX = self.answer_vocab.UNK_INDEX
        if self.EOS_IDX == self.UNK_IDX:
            self.EOS_IDX = len(self.answer_vocab)

        self.preprocessor = None
        if "preprocessor" in config:
            self.preprocessor = Processor(config["preprocessor"])
        self.num_answers = config.get("num_answers", self.DEFAULT_NUM_ANSWERS)

    def __call__(self, item):
        tokens = []
        if not isinstance(item, dict):
            raise TypeError("Answer processor input must be a dict")
        if "answer_tokens" in item:
            tokens = item["answer_tokens"]
        elif "answers" in item and item["answers"] is not None:
            if self.preprocessor is None:
                raise AssertionError(
                    "Raw 'answers' need a configured preprocessor; pass "
                    "'answer_tokens' to skip preprocessing"
                )
            tokens = [
                self.preprocessor({"text": answer})["text"]
                for answer in item["answers"]
            ]
        else:
            raise AssertionError(
                "Answer processor input carries neither 'answers' nor "
                "'answer_tokens'"
            )
        if len(tokens) != 0:
            tokens = self._increase_to_ten(tokens)
        answers_indices = np.full(
            self.DEFAULT_NUM_ANSWERS, self.answer_vocab.get_unk_index(),
            np.int64,
        )
        for idx, token in enumerate(tokens):
            answers_indices[idx] = self.answer_vocab.word2idx(token)
        answers_scores = self.compute_answers_scores(answers_indices)
        return {
            "answers": tokens,
            "answers_indices": answers_indices,
            "answers_scores": answers_scores,
        }

    def get_vocab_size(self):
        return self.answer_vocab.num_vocab

    def get_true_vocab_size(self):
        return self.answer_vocab.num_vocab

    def word2idx(self, word):
        return self.answer_vocab.word2idx(word)

    def idx2word(self, idx):
        return self.answer_vocab.idx2word(idx)

    def compute_answers_scores(self, answers_indices):
        """Soft VQA-accuracy target per vocab index (the contract of
        reference processors.py:686-713, in closed form).

        The VQA metric averages, over the 10 annotators, the leave-one-
        out accuracy min(1, matches_among_other_9 / 3). With c = count
        of a candidate among the 10 answers, each of the c annotators
        who gave it sees c-1 matches and each of the 10-c others sees
        c, so the average collapses to a function of c alone."""
        scores = np.zeros(self.get_vocab_size(), np.float32)
        indices = [int(i) for i in answers_indices]
        n = len(indices)
        for answer, c in Counter(indices).items():
            if answer == self.answer_vocab.UNK_INDEX:
                continue
            held_in = min(1.0, (c - 1) / 3.0)
            held_out = min(1.0, c / 3.0)
            scores[answer] = (c * held_in + (n - c) * held_out) / n
        return scores

    def _increase_to_ten(self, tokens):
        while len(tokens) < self.DEFAULT_NUM_ANSWERS:
            tokens += tokens[: self.DEFAULT_NUM_ANSWERS - len(tokens)]
        return tokens


@registry.register_processor("graph_vqa_answer")
class GraphVQAAnswerProcessor(VQAAnswerProcessor):
    """VQAAnswerProcessor + concept vocab for graph models
    (reference processors.py:722-945)."""

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)
        self.concept_vocab = None
        if "concept_vocab_file" in config:
            self.concept_vocab = VocabDict(
                config["concept_vocab_file"], kwargs.get("data_dir", None)
            )


@registry.register_processor("multi_hot_answer_from_vocab")
class MultiHotAnswerFromVocabProcessor(VQAAnswerProcessor):
    """Multi-hot target instead of soft scores (reference processors.py:948)."""

    def compute_answers_scores(self, answers_indices):
        scores = np.zeros(self.get_vocab_size(), np.float32)
        scores[np.asarray(answers_indices, np.int64)] = 1
        scores[self.answer_vocab.UNK_INDEX] = 0
        return scores


@registry.register_processor("soft_copy_answer")
class SoftCopyAnswerProcessor(VQAAnswerProcessor):
    """Adds dynamic OCR-copy answer space (reference processors.py:960-1051)."""

    DEFAULT_MAX_LENGTH = 50

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)
        self.use_soft_copy = True
        if "max_length" in config:
            self.max_length = config["max_length"]
        else:
            self.max_length = self.DEFAULT_MAX_LENGTH
            warnings.warn(
                "SoftCopyAnswerProcessor: max_length not configured; "
                f"using {self.DEFAULT_MAX_LENGTH} copy slots"
            )
        self.context_preprocessor = None
        if "context_preprocessor" in config:
            self.context_preprocessor = Processor(config["context_preprocessor"])

    def get_vocab_size(self):
        return self.answer_vocab.num_vocab + self.max_length

    def get_true_vocab_size(self):
        return self.answer_vocab.num_vocab

    def __call__(self, item):
        answers = item["answers"]
        scores = super().__call__({"answers": answers})

        indices = scores["answers_indices"]
        answers = scores["answers"]
        scores = scores["answers_scores"]

        tokens_scores = np.zeros(self.max_length, np.float32)
        tokens = item["tokens"]
        length = min(len(tokens), self.max_length)

        if self.context_preprocessor is not None:
            tokens = [
                self.context_preprocessor({"text": token})["text"]
                for token in tokens
            ]
        # each OCR copy slot earns the soft VQA accuracy of its token
        # string — same closed form as compute_answers_scores
        n = len(answers)
        counts = Counter(answers)
        for slot, token in enumerate(tokens[:length]):
            c = counts[token]
            if c == 0:
                continue
            held_in = min(1.0, (c - 1) / 3.0)
            held_out = min(1.0, c / 3.0)
            tokens_scores[slot] = (c * held_in + (n - c) * held_out) / n

        # scores are already vocab+copy sized (compute_answers_scores uses
        # the overridden get_vocab_size); fill the copy span
        scores[-len(tokens_scores):] = tokens_scores
        return {
            "answers": answers,
            "answers_indices": indices,
            "answers_scores": scores,
        }


@registry.register_processor("simple_word")
class SimpleWordProcessor(BaseProcessor):
    """(reference processors.py:1054-1069)"""

    def __init__(self, *args, **kwargs):
        self.tokenizer = word_tokenize

    def __call__(self, item, *args, **kwargs):
        return {"text": self.tokenizer(item["text"], *args, **kwargs)}


@registry.register_processor("simple_sentence")
class SimpleSentenceProcessor(BaseProcessor):
    """(reference processors.py:1072-1087)"""

    def __init__(self, *args, **kwargs):
        self.tokenizer = tokenize

    def __call__(self, item, *args, **kwargs):
        return {"text": self.tokenizer(item["text"], *args, **kwargs)}


@registry.register_processor("bbox")
class BBoxProcessor(VocabProcessor):
    """imdb bbox -> padded normalized array (reference processors.py:1090)."""

    def __init__(self, config, *args, **kwargs):
        self.max_length = config.get("max_length", 50)

    def __call__(self, item):
        info = item["info"]
        if self.lmdb_loader is not None:  # pragma: no cover
            info.update(self.lmdb_loader(item))
        bbox = np.zeros((self.max_length, 4), np.float32)
        n = min(len(info["bbox"]), self.max_length)
        bbox[:n] = np.asarray(info["bbox"], np.float32)[:n]
        return {"bbox": bbox}

    lmdb_loader = None


@registry.register_processor("caption")
class CaptionProcessor(BaseProcessor):
    """De-tokenize caption indices into a sentence
    (reference processors.py:1142-1171)."""

    def __init__(self, config, *args, **kwargs):
        if not config.get("vocab"):
            raise AttributeError(
                "VocabProcessor needs a 'vocab' block in its config"
            )
        from mmf_tpu.utils.vocab import Vocab

        self.vocab = Vocab(*args, **config["vocab"], **kwargs)

    def __call__(self, item):
        for idx, v in enumerate(item):
            if v == self.vocab.EOS_INDEX:
                item = item[:idx]
                break
        tokens = [
            self.vocab.get_itos()[int(w)]
            for w in item
            if w
            not in {
                self.vocab.SOS_INDEX, self.vocab.EOS_INDEX,
                self.vocab.PAD_INDEX,
            }
        ]
        caption = " ".join(tokens)
        return {"tokens": tokens, "caption": caption}


@registry.register_processor("evalai_answer")
class EvalAIAnswerProcessor(BaseProcessor):
    """(reference processors.py:1174-1382) — EvalAI normalization rules live
    in utils.m4c_evaluators; this registered processor wraps them."""

    def __init__(self, *args, **kwargs):
        from mmf_tpu.utils.m4c_evaluators import (
            EvalAIAnswerProcessor as _Impl,
        )

        self._impl = _Impl()

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._impl, name)

    def __call__(self, item):
        return self._impl(item)


@registry.register_processor("phoc")
class PhocProcessor(VocabProcessor):
    """Compute PHOC features for OCR tokens (reference processors.py:1385)."""

    def __init__(self, config, *args, **kwargs):
        from mmf_tpu.utils.phoc.build_phoc import build_phoc

        self._build_phoc = build_phoc
        self.config = config
        self._init_extras(config)

    def _map_strings_to_indices(self, tokens):
        from mmf_tpu.utils.phoc.build_phoc import build_phoc_batch

        length = min(len(tokens), self.max_length)
        tokens = tokens[:length]
        phoc_dim = 604
        output = np.zeros((self.max_length, phoc_dim), np.float32)
        if tokens:
            output[:length] = build_phoc_batch(list(tokens))
        return output


@registry.register_processor("copy")
class CopyProcessor(BaseProcessor):
    """Copy a tensor padded to max_length (reference processors.py:1413)."""

    def __init__(self, config, *args, **kwargs):
        self.max_length = config["max_length"]

    def __call__(self, item):
        blob = item["blob"]
        final_blob = np.zeros((self.max_length,) + blob.shape[1:], blob.dtype)
        final_blob[: len(blob)] = blob[: self.max_length]
        return {"blob": final_blob}


@registry.register_processor("m4c_answer")
class M4CAnswerProcessor(BaseProcessor):
    """Fixed-vocab + OCR-copy decoding targets for M4C
    (reference processors.py:1430-1607)."""

    def __init__(self, config, *args, **kwargs):
        self.answer_vocab = VocabDict(
            config["vocab_file"], kwargs.get("data_dir", None)
        )
        self.PAD_IDX = self.answer_vocab.word2idx("<pad>")
        self.BOS_IDX = self.answer_vocab.word2idx("<s>")
        self.EOS_IDX = self.answer_vocab.word2idx("</s>")
        self.UNK_IDX = self.answer_vocab.UNK_INDEX
        assert self.PAD_IDX != self.answer_vocab.UNK_INDEX
        assert self.BOS_IDX != self.answer_vocab.UNK_INDEX
        assert self.EOS_IDX != self.answer_vocab.UNK_INDEX
        assert self.PAD_IDX == 0

        self.answer_preprocessor = Processor(config["preprocessor"])
        assert self.answer_preprocessor is not None
        self.num_answers = config["num_answers"]
        self.max_length = config["max_length"]
        self.max_copy_steps = config["max_copy_steps"]
        assert self.max_copy_steps >= 1
        self.match_answer_to_unk = False

    def tokenize(self, sentence):
        return sentence.split()

    def match_answer_to_vocab_ocr_seq(self, answer, vocab2idx_dict,
                                      ocr2inds_dict, max_match_num=20):
        """Every way to spell ``answer`` as a sequence of decoder indices,
        where each word may come from the fixed vocab (index < num_vocab)
        or be copied from any OCR token slot (num_vocab + slot). Returns
        the first ``max_match_num`` sequences in prefix-major order, or
        [] when some word is spellable neither way (contract of
        reference processors.py:1464-1505)."""
        num_vocab = len(vocab2idx_dict)
        per_word = []
        for word in self.tokenize(answer):
            choices = []
            if word in vocab2idx_dict:
                choices.append(vocab2idx_dict[word])
            choices += [num_vocab + slot for slot in ocr2inds_dict[word]]
            if not choices:
                if not self.match_answer_to_unk:
                    return []
                choices.append(vocab2idx_dict.get("<unk>"))
            per_word.append(choices)
        if not per_word:
            return []
        # itertools.product enumerates prefix-major, which makes islice
        # equivalent to the stage-wise truncation the torch code does
        return list(islice(product(*per_word), max_match_num))

    def get_vocab_size(self):
        return self.answer_vocab.num_vocab + self.max_length

    def get_true_vocab_size(self):
        return self.answer_vocab.num_vocab

    def compute_answer_scores(self, answers):
        """answer string -> soft VQA accuracy, closed form over the
        answer multiset (see VQAAnswerProcessor.compute_answers_scores
        for the derivation)."""
        n = len(answers)
        scores = {}
        for answer, c in Counter(answers).items():
            held_in = min(1.0, (c - 1) / 3.0)
            held_out = min(1.0, c / 3.0)
            scores[answer] = (c * held_in + (n - c) * held_out) / n
        return scores

    def __call__(self, item):
        answers = item["answers"]
        if not answers:
            return {
                "sampled_idx_seq": None,
                "train_prev_inds": np.zeros(self.max_copy_steps, np.int64),
            }
        answers = [
            self.answer_preprocessor({"text": a})["text"] for a in answers
        ]
        assert len(answers) == self.num_answers
        answer_score = self.compute_answer_scores(answers)

        # OCR token string -> the copy slots it occupies (may repeat)
        ocr_slots = defaultdict(list)
        for slot, token in enumerate(item["tokens"]):
            ocr_slots[token].append(slot)

        # step-0 targets: every spelling's first index earns the soft
        # accuracy of its answer (max over answers sharing a first index)
        scores = np.zeros(
            (self.max_copy_steps, self.get_vocab_size()), np.float32
        )
        candidate_seqs = []
        for answer in answers:
            seqs = self.match_answer_to_vocab_ocr_seq(
                answer, self.answer_vocab.word2idx_dict, ocr_slots
            )
            candidate_seqs += seqs
            for seq in seqs:
                scores[0, seq[0]] = max(
                    scores[0, seq[0]], answer_score[answer]
                )

        # teacher forcing targets from ONE uniformly sampled spelling:
        # BOS then the sequence shifted right; the step after the last
        # in-range index targets EOS
        train_prev_inds = np.zeros(self.max_copy_steps, np.int64)
        train_loss_mask = np.zeros(self.max_copy_steps, np.float32)
        sampled = ()
        if candidate_seqs:
            sampled = candidate_seqs[np.random.choice(len(candidate_seqs))]
            steps = min(1 + len(sampled), self.max_copy_steps)
            train_loss_mask[:steps] = 1.0
            train_prev_inds[0] = self.BOS_IDX
            train_prev_inds[1:steps] = sampled[: steps - 1]
            for t in range(1, steps):
                target = sampled[t] if t < len(sampled) else self.EOS_IDX
                scores[t, target] = 1.0

        return {
            "answers": answers,
            "answers_scores": scores,
            "sampled_idx_seq": sampled,
            "train_prev_inds": train_prev_inds,
            "train_loss_mask": train_loss_mask,
        }


@registry.register_processor("m4c_caption")
class M4CCaptionProcessor(M4CAnswerProcessor):
    """(reference processors.py:1610-1634)"""

    def __init__(self, config, *args, **kwargs):
        super().__init__(config, *args, **kwargs)
        import re

        self.SENTENCE_SPLIT_REGEX = re.compile(r"(\W+)")
        self.match_answer_to_unk = True

    def tokenize(self, sentence):
        sentence = sentence.lower()
        sentence = (
            sentence.replace(",", "").replace("?", "").replace(".", "")
            .replace("'s", " 's")
        )
        tokens = self.SENTENCE_SPLIT_REGEX.split(sentence)
        return [t.strip() for t in tokens if len(t.strip()) > 0]

    def compute_answer_scores(self, answers):
        return {a: 1.0 for a in answers}


@registry.register_processor("masked_region")
class MaskedRegionProcessor(BaseProcessor):
    """Mask regions for masked-region pretraining
    (reference processors.py:1637-1663)."""

    def __init__(self, config, *args, **kwargs):
        self.mask_prob = config.get("mask_probability", 0.15)
        self.mask_region_prob = config.get("mask_region_probability", 0.9)

    def __call__(self, item):
        image_labels = []
        image_feature = np.array(item, copy=True)
        for i in range(image_feature.shape[0]):
            prob = random.random()
            if prob < self.mask_prob:
                prob /= self.mask_prob
                if prob < self.mask_region_prob:
                    image_feature[i] = 0
                image_labels.append(1)
            else:
                image_labels.append(-1)
        item = image_feature
        return image_feature, np.asarray(image_labels, np.int64)


@registry.register_processor("transformer_bbox")
class TransformerBboxProcessor(BaseProcessor):
    """Normalize bbox + area features (reference processors.py:1666-1700)."""

    def __init__(self, config, *args, **kwargs):
        self.bbox_key = config.get("bbox_key", "bbox")
        self.image_width_key = config.get("image_width_key", "image_width")
        self.image_height_key = config.get("image_height_key", "image_height")

    def __call__(self, item):
        # the item IS the info dict (image_info_0). Returns a SHALLOW COPY
        # with bbox replaced by [x1,y1,x2,y2,area] normalized — with
        # fast_read the FeaturesDatabase hands out one cached dict per
        # image shared by every question; mutating it in place would
        # re-normalize already-normalized coords on each reuse
        image_w = float(item[self.image_width_key])
        image_h = float(item[self.image_height_key])
        bbox = np.asarray(item[self.bbox_key], np.float32)
        image_location = np.zeros((bbox.shape[0], 5), np.float32)
        image_location[:, :4] = bbox[:, :4]
        image_location[:, 4] = (
            (image_location[:, 3] - image_location[:, 1])
            * (image_location[:, 2] - image_location[:, 0])
            / (image_w * image_h)
        )
        image_location[:, 0] /= image_w
        image_location[:, 1] /= image_h
        image_location[:, 2] /= image_w
        image_location[:, 3] /= image_h
        out = dict(item)
        out["bbox"] = image_location
        return out


@registry.register_processor("multi_class_from_file")
class MultiClassFromFile(BaseProcessor):
    """Label string -> class index from a classes file
    (reference processors.py:1703-1724)."""

    def __init__(self, config, *args, **kwargs):
        self.label_vocab = VocabDict(
            config["vocab_file"], kwargs.get("data_dir", None)
        )

    def __call__(self, item):
        label = item["label"] if isinstance(item, dict) else item
        # Remove UNK by subtracting 1 from output (reference behavior)
        index = self.label_vocab.word2idx(label) - 1
        assert index != -1, f"{label} is not present in vocab file"
        return {"class_index": np.int64(index)}


@registry.register_processor("detr_image_and_target")
class DETRImageAndTargetProcessor(BaseProcessor):
    """DETR-style train-time image/target transforms
    (reference processors.py:1727-1777), built on the detection transforms."""

    def __init__(self, config, *args, **kwargs):
        from mmf_tpu.datasets.processors import detection_transforms as T

        train_image_sizes = list(
            config.get(
                "train_image_sizes",
                [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800],
            )
        )
        self.training_transform = T.Compose(
            [
                T.RandomHorizontalFlip(),
                T.RandomResize(train_image_sizes, max_size=1333),
                T.ToTensor(),
                T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
            ]
        )
        self.inference_transform = T.Compose(
            [
                T.RandomResize([config.get("test_image_size", 800)],
                               max_size=1333),
                T.ToTensor(),
                T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
            ]
        )

    def __call__(self, item):
        dataset_type = item["dataset_type"]
        img = item["img"]
        target = item["target"]
        if dataset_type == "train":
            img, target = self.training_transform(img, target)
        else:
            img, target = self.inference_transform(img, target)
        return {"img": img, "target": target}
