"""Text utilities: tokenization, vocab dictionaries, caption decoders.

Parity with mmf/utils/text.py. The BUTD caption decoders (beam search /
nucleus sampling) are re-expressed for JAX: fixed-shape, host-driven loops
over jitted per-step model calls.
"""

from __future__ import annotations

import os
import re
from collections import Counter
from itertools import chain
from typing import List, Optional

import numpy as np

from mmf_tpu.common.registry import registry

SENTENCE_SPLIT_REGEX = re.compile(r"(\W+)")


def generate_ngrams(tokens: List[str], n: int = 1):
    shifted_tokens = (tokens[i:] for i in range(n))
    tuple_ngrams = zip(*shifted_tokens)
    return (" ".join(i) for i in tuple_ngrams)


def generate_ngrams_range(tokens: List[str], ngram_range=(1, 3)):
    assert len(ngram_range) == 2, (
        "'ngram_range' should be a tuple of two elements which is "
        "range of numbers"
    )
    return chain(*(generate_ngrams(tokens, i) for i in range(*ngram_range)))


def tokenize(sentence: str, regex=SENTENCE_SPLIT_REGEX, keep=None,
             remove=None) -> List[str]:
    if keep is None:
        keep = ["'s"]
    if remove is None:
        remove = [",", "?"]
    sentence = sentence.lower()
    for token in keep:
        sentence = sentence.replace(token, " " + token)
    for token in remove:
        sentence = sentence.replace(token, "")
    tokens = regex.split(sentence)
    return [t.strip() for t in tokens if len(t.strip()) > 0]


def word_tokenize(word: str, remove=None) -> str:
    if remove is None:
        remove = [",", "?"]
    word = word.lower()
    for item in remove:
        word = word.replace(item, "")
    word = word.replace("'s", " 's")
    return word.strip()


def load_str_list(fname: str) -> List[str]:
    with open(fname) as f:
        return [line.strip() for line in f.readlines()]


class VocabDict:
    UNK_TOKEN = "<unk>"
    PAD_TOKEN = "<pad>"
    START_TOKEN = "<s>"
    END_TOKEN = "</s>"

    PAD_INDEX = 0
    SOS_INDEX = 1
    EOS_INDEX = 2
    UNK_INDEX = 3

    def __init__(self, vocab_file: Optional[str] = None, data_dir=None,
                 word_list: Optional[List[str]] = None):
        if word_list is not None:
            self.word_list = list(word_list)
            self._build()
            return
        if not os.path.exists(vocab_file) and data_dir is not None:
            from mmf_tpu.utils.general import get_absolute_path

            vocab_file = get_absolute_path(os.path.join(data_dir, vocab_file))
        if not os.path.exists(vocab_file):
            raise RuntimeError(
                f"no vocab file at {vocab_file}"
            )
        self.word_list = load_str_list(vocab_file)
        self._build()

    def _build(self):
        if self.UNK_TOKEN not in self.word_list:
            self.word_list = [self.UNK_TOKEN] + self.word_list
        self.word2idx_dict = {w: i for i, w in enumerate(self.word_list)}
        self.stoi = self.word2idx_dict
        self.itos = self.word_list
        self.num_vocab = len(self.word_list)
        self.UNK_INDEX = self.word2idx_dict.get(self.UNK_TOKEN, None)
        self.PAD_INDEX = self.word2idx_dict.get(self.PAD_TOKEN, None)

    def idx2word(self, n_w: int) -> str:
        return self.word_list[n_w]

    def __len__(self): return len(self.word_list)

    def get_size(self) -> int:
        return len(self.word_list)

    def get_unk_index(self): return self.UNK_INDEX

    def get_unk_token(self): return self.UNK_TOKEN

    def word2idx(self, w: str) -> int:
        if w in self.word2idx_dict:
            return self.word2idx_dict[w]
        if self.UNK_INDEX is not None:
            return self.UNK_INDEX
        raise ValueError(
            f"word {w} not in dictionary (while dictionary does not "
            "contain <unk>)"
        )

    def tokenize_and_index(self, sentence: str) -> List[int]:
        return [self.word2idx(w) for w in tokenize(sentence)]


class VocabFromText(VocabDict):
    DEFAULT_TOKENS = [
        VocabDict.PAD_TOKEN,
        VocabDict.UNK_TOKEN,
        VocabDict.START_TOKEN,
        VocabDict.END_TOKEN,
    ]

    def __init__(self, sentences, min_count=1, regex=SENTENCE_SPLIT_REGEX,
                 keep=None, remove=None, only_unk_extra=False):
        if keep is None:
            keep = []
        if remove is None:
            remove = []
        token_counter = Counter()
        for sentence in sentences:
            token_counter.update(
                tokenize(sentence, regex=regex, keep=keep, remove=remove)
            )
        token_list = [t for t, c in token_counter.items() if c >= min_count]
        extras = [self.UNK_TOKEN] if only_unk_extra else self.DEFAULT_TOKENS
        self.word_list = extras + token_list
        self._build()


# ---------------------------------------------------------------------------
# caption decoders (BUTD). Host-driven: the model exposes a per-step
# callable; beams live as numpy state on host, steps run jitted on device.
# ---------------------------------------------------------------------------
class TextDecoder:
    """Base class for text decoding strategies (reference text.py:220)."""

    def __init__(self, vocab):
        self._vocab = vocab
        self._vocab_size = vocab.get_size()

    def init_batch(self, sample_list):
        raise NotImplementedError

    def decode(self, t, data, scores):
        raise NotImplementedError


@registry.register_decoder("beam_search")
class BeamSearch(TextDecoder):
    """Classic beam search (reference text.py:274). numpy host state."""

    def __init__(self, vocab, config):
        super().__init__(vocab)
        self._decode_size = config["inference"]["params"]["beam_length"]

    def init_batch(self, sample_list):
        self.seqs = np.full(
            (self._decode_size, 1), self._vocab.SOS_INDEX, dtype=np.int64
        )
        self.top_k_scores = np.zeros((self._decode_size, 1), np.float32)
        self.complete_seqs = []
        self.complete_seqs_scores = []
        return sample_list

    def decode(self, t, data, scores):
        """scores: [beams, vocab] raw logits for this step (the reference
        applies log_softmax itself, text.py:296). Returns
        (finished, data, remaining_beams)."""
        scores = np.asarray(scores, np.float64)
        scores = scores - np.log(
            np.sum(np.exp(scores - scores.max(-1, keepdims=True)), -1,
                   keepdims=True)
        ) - scores.max(-1, keepdims=True)
        scores = scores.astype(np.float32) + self.top_k_scores  # [beams, V]
        k = self.seqs.shape[0]
        if t == 0:
            flat = scores[0]
        else:
            flat = scores.reshape(-1)
        top_idx = np.argsort(-flat)[:k]
        self.top_k_scores = flat[top_idx][:, None]
        prev_beam = top_idx // self._vocab_size if t > 0 else np.zeros(k, np.int64)
        next_word = top_idx % self._vocab_size

        self.seqs = np.concatenate(
            [self.seqs[prev_beam], next_word[:, None]], axis=1
        )

        incomplete = next_word != self._vocab.EOS_INDEX
        complete_idx = np.where(~incomplete)[0]
        for ci in complete_idx:
            self.complete_seqs.append(self.seqs[ci].tolist())
            self.complete_seqs_scores.append(float(self.top_k_scores[ci, 0]))

        keep = np.where(incomplete)[0]
        self.seqs = self.seqs[keep]
        self.top_k_scores = self.top_k_scores[keep]
        finished = len(keep) == 0
        return finished, data, keep

    def get_result(self):
        if len(self.complete_seqs_scores) == 0:
            if len(self.seqs) > 0:
                return np.asarray([self.seqs[0].tolist()])
            return np.zeros((1, 1), np.int64)
        best = int(np.argmax(self.complete_seqs_scores))
        return np.asarray([self.complete_seqs[best]])


@registry.register_decoder("nucleus_sampling")
class NucleusSampling(TextDecoder):
    """Top-p sampling decoder (reference text.py:389). Single beam."""

    def __init__(self, vocab, config):
        super().__init__(vocab)
        self._threshold = config["inference"]["params"]["sum_threshold"]
        self._rng = np.random.default_rng(0)
        self.seq = []

    def init_batch(self, sample_list):
        self.seq = []
        return sample_list

    def decode(self, t, data, scores):
        probs = np.exp(np.asarray(scores[0], np.float64))
        probs = probs / probs.sum()
        order = np.argsort(-probs)
        cum = np.cumsum(probs[order])
        cutoff = int(np.searchsorted(cum, self._threshold)) + 1
        cand = order[:cutoff]
        cand_p = probs[cand] / probs[cand].sum()
        next_word = int(self._rng.choice(cand, p=cand_p))
        self.seq.append(next_word)
        finished = next_word == self._vocab.EOS_INDEX
        return finished, data, np.asarray([0] if not finished else [])

    def get_result(self): return np.asarray([self.seq])
