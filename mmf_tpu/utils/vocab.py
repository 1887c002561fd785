"""Vocabulary abstractions (parity with mmf/utils/vocab.py).

``Vocab`` dispatches by type: random (vocab file + random embeddings),
custom (vocab file + embedding file), intersected (vocab ∩ GloVe vectors),
pretrained (full pretrained vocab), extracted (precomputed per-id
embeddings), model (fasttext). Embedding-vector sources that require
downloads are loaded from the data dir when present and raise a clear
error otherwise (this environment has no network egress).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

from mmf_tpu.utils.text import VocabDict

logger = logging.getLogger(__name__)

EMBEDDING_NAME_CLASS_MAPPING = {"glove": "GloVe", "fasttext": "FastText"}


class BaseVocab:
    PAD_TOKEN = "<pad>"
    SOS_TOKEN = "<s>"
    EOS_TOKEN = "</s>"
    UNK_TOKEN = "<unk>"

    PAD_INDEX = 0
    SOS_INDEX = 1
    EOS_INDEX = 2
    UNK_INDEX = 3

    def __init__(self, vocab_file=None, embedding_dim=300, data_dir=None,
                 *args, **kwargs):
        """Base vocab supporting a word list + random-normal embedding matrix
        (reference vocab.py:76-211)."""
        self.type = "base"
        self.word_dict = {}
        self.itos = {}

        self.itos[self.PAD_INDEX] = self.PAD_TOKEN
        self.itos[self.SOS_INDEX] = self.SOS_TOKEN
        self.itos[self.EOS_INDEX] = self.EOS_TOKEN
        self.itos[self.UNK_INDEX] = self.UNK_TOKEN
        self.word_dict[self.SOS_TOKEN] = self.SOS_INDEX
        self.word_dict[self.EOS_TOKEN] = self.EOS_INDEX
        self.word_dict[self.PAD_TOKEN] = self.PAD_INDEX
        self.word_dict[self.UNK_TOKEN] = self.UNK_INDEX

        index = len(self.itos)
        self.total_predefined = len(self.itos)

        if vocab_file is not None:
            if not os.path.isabs(vocab_file) and data_dir is not None:
                vocab_file = os.path.join(data_dir, vocab_file)
            if not os.path.exists(vocab_file):
                raise RuntimeError(f"Vocab not found at {vocab_file}")
            with open(vocab_file) as f:
                for line in f:
                    self.itos[index] = line.strip()
                    self.word_dict[line.strip()] = index
                    index += 1

        self.word_dict[self.UNK_TOKEN] = self.UNK_INDEX
        self.stoi = self.word_dict
        self.vectors = np.random.randn(self.get_size(), embedding_dim).astype(
            np.float32
        )

    def get_itos(self): return self.itos

    def get_stoi(self): return self.stoi

    def get_size(self): return len(self.itos)

    def get_pad_index(self): return self.PAD_INDEX

    def get_pad_token(self): return self.PAD_TOKEN

    def get_start_index(self): return self.SOS_INDEX

    def get_start_token(self): return self.SOS_TOKEN

    def get_end_index(self): return self.EOS_INDEX

    def get_end_token(self): return self.EOS_TOKEN

    def get_unk_index(self): return self.UNK_INDEX

    def get_unk_token(self): return self.UNK_TOKEN

    def get_vectors(self): return self.vectors

    def get_embedding_params(self):
        """Returns (vocab_size, embedding_dim, init_vectors) for flax Embed
        initialization (replaces torch nn.Embedding construction)."""
        return self.get_size(), self.vectors.shape[1], self.vectors


class CustomVocab(BaseVocab):
    def __init__(self, vocab_file, embedding_file, data_dir=None, *args,
                 **kwargs):
        """Vocab file + custom npy embedding file (reference vocab.py:212)."""
        super().__init__(vocab_file, data_dir=data_dir)
        self.type = "custom"
        if not os.path.isabs(embedding_file) and data_dir is not None:
            embedding_file = os.path.join(data_dir, embedding_file)
        if not os.path.exists(embedding_file):
            raise RuntimeError(f"no embedding file at {embedding_file}")
        embedding_vectors = np.load(embedding_file)
        self.vectors = np.zeros(
            (self.get_size(), embedding_vectors.shape[1]), np.float32
        )
        for i in range(4, self.get_size()):
            self.vectors[i] = embedding_vectors[i - 4]


class IntersectedVocab(BaseVocab):
    def __init__(self, vocab_file, embedding_name, data_dir=None, *args,
                 **kwargs):
        """Vocab ∩ GloVe vectors (reference vocab.py:254). Requires the
        GloVe vectors file in the data dir (no download egress here)."""
        super().__init__(vocab_file, data_dir=data_dir)
        self.type = "intersected"
        name_parts = embedding_name.split(".")
        vector_file = os.path.join(
            data_dir or ".", "vectors", f"{embedding_name}.txt"
        )
        if not os.path.exists(vector_file):
            raise RuntimeError(
                f"Pretrained vectors for {embedding_name} not found at "
                f"{vector_file}; pre-populate the cache (no network egress)."
            )
        dim = int(name_parts[-1].replace("d", "")) if name_parts else 300
        vecs = {}
        with open(vector_file) as f:
            for line in f:
                parts = line.rstrip().split(" ")
                vecs[parts[0]] = np.asarray(
                    [float(x) for x in parts[1:]], np.float32
                )
        dim = len(next(iter(vecs.values())))
        self.vectors = np.zeros((self.get_size(), dim), np.float32)
        for i in range(4, self.get_size()):
            word = self.itos[i]
            if word in vecs:
                self.vectors[i] = vecs[word]


class PretrainedVocab(BaseVocab):
    def __init__(self, embedding_name, data_dir=None, *args, **kwargs):
        """Full pretrained-embedding vocabulary (reference vocab.py:325)."""
        self.type = "pretrained"
        vector_file = os.path.join(
            data_dir or ".", "vectors", f"{embedding_name}.txt"
        )
        if not os.path.exists(vector_file):
            raise RuntimeError(
                f"Pretrained vectors {embedding_name} not found at "
                f"{vector_file}"
            )
        self.word_dict = {}
        self.itos = {}
        self.itos[self.PAD_INDEX] = self.PAD_TOKEN
        self.itos[self.SOS_INDEX] = self.SOS_TOKEN
        self.itos[self.EOS_INDEX] = self.EOS_TOKEN
        self.itos[self.UNK_INDEX] = self.UNK_TOKEN
        for tok, idx in [
            (self.PAD_TOKEN, self.PAD_INDEX), (self.SOS_TOKEN, self.SOS_INDEX),
            (self.EOS_TOKEN, self.EOS_INDEX), (self.UNK_TOKEN, self.UNK_INDEX),
        ]:
            self.word_dict[tok] = idx
        vectors = []
        index = len(self.itos)
        with open(vector_file) as f:
            for line in f:
                parts = line.rstrip().split(" ")
                self.itos[index] = parts[0]
                self.word_dict[parts[0]] = index
                vectors.append(
                    np.asarray([float(x) for x in parts[1:]], np.float32)
                )
                index += 1
        dim = len(vectors[0])
        self.vectors = np.concatenate(
            [np.random.randn(4, dim).astype(np.float32), np.stack(vectors)]
        )
        self.stoi = self.word_dict
        self.total_predefined = 4


class ModelVocab(BaseVocab):
    def __init__(self, name, model_file, *args, **kwargs):
        """FastText-model-backed vocab (reference vocab.py:390)."""
        super(BaseVocab, self).__init__()
        self.type = "model"
        if not os.path.exists(model_file):
            raise RuntimeError(
                f"no fasttext model at {model_file}"
            )
        try:
            import fasttext

            self.model = fasttext.load_model(model_file)
        except ImportError as e:
            raise ImportError(
                "fasttext package required for ModelVocab"
            ) from e
        self.stoi = None

    def get_embedding_params(self):
        raise RuntimeError("ModelVocab doesn't provide an embedding table")


class ExtractedVocab(BaseVocab):
    def __init__(self, base_path, emb_dim, *args, **kwargs):
        """Precomputed per-id embeddings (reference vocab.py:430)."""
        super(BaseVocab, self).__init__()
        self.type = "extracted"
        self.emb_dim = emb_dim
        self.base_path = base_path

    def get_dim(self): return self.emb_dim


class Vocab:
    """Dispatcher (reference vocab.py:20-75)."""

    def __init__(self, *args, **params):
        # type key -> (implementation, required params)
        kinds = {
            "random": (BaseVocab, ("vocab_file",)),
            "custom": (CustomVocab, ("vocab_file", "embedding_file")),
            "pretrained": (PretrainedVocab, ()),
            "intersected": (IntersectedVocab,
                            ("vocab_file", "embedding_name")),
            "extracted": (ExtractedVocab, ("base_path", "emb_dim")),
            "model": (ModelVocab, ("name", "model_file")),
        }
        vocab_type = params.get("type", "pretrained")
        if vocab_type not in kinds:
            raise ValueError(f"Unknown vocab type: {vocab_type}")
        impl, required = kinds[vocab_type]
        missing = [key for key in required if params.get(key) is None]
        if missing:
            raise ValueError(
                f"Vocab type '{vocab_type}' requires {missing} in params"
            )
        self.vocab = impl(*args, **params)

    def __call__(self, *args, **kwargs):
        return self.vocab(*args, **kwargs)

    def __getattr__(self, name):
        # reached only when normal lookup fails: delegate to the
        # concrete vocab implementation
        inner = self.__dict__.get("vocab")
        if inner is not None and hasattr(inner, name):
            return getattr(inner, name)
        raise AttributeError(
            f"{type(inner).__name__ if inner else 'Vocab'} has no "
            f"attribute {name!r}"
        )
