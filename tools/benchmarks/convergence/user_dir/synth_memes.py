"""Deterministic synthetic Hateful-Memes-style dataset for the
end-to-end convergence demonstration (env.user_dir plugin).

Each sample carries a raw image and a token sequence; the binary label
is a function (``task`` config knob, default AND) of an image bit
(bright vs dark field) and a text bit (which marker token appears).
Under AND no single modality can score above 75% accuracy — a model
reaching ~100% val accuracy must actually fuse the two streams, which
is the core claim MMBT-grid (reference mmf/models/mmbt.py) makes —
while each modality still carries first-order gradient signal so a
from-scratch model can climb off initialization (XOR, also available,
has zero unimodal signal and from-scratch transformers plateau on it;
measured, see the task comment below). Train and val draw from disjoint
index ranges of the same generative process, so an improving val metric
demonstrates generalization, not accidental index leakage.

Everything is derived from per-(split, idx) numpy RandomState seeds:
two runs of the CLI see byte-identical data.
"""

import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.common.sample import Sample
from mmf_tpu.datasets.base_dataset import BaseDataset
from mmf_tpu.datasets.base_dataset_builder import BaseDatasetBuilder

_SPLIT_BASE = {"train": 0, "val": 1_000_000, "test": 2_000_000}
_SPLIT_LEN = {"train": 512, "val": 128, "test": 128}

_CLS, _SEP = 101, 102
_TOK_A, _TOK_B = 2000, 3000  # text-bit marker tokens
_SEQ_LEN = 24
_IMG_HW = 128  # enough pixels for the resnet grid; keeps tunnel upload light


class SynthMemes(BaseDataset):
    def __init__(self, config, dataset_type="train"):
        super().__init__("synth_memes", config, dataset_type)
        # num_samples: int (all splits) or per-split mapping. The TPU
        # demo sets train: 12800 = max_updates * batch_size, so every
        # update sees FRESH samples (single pass) — a falling train loss
        # then demonstrates the learned fusion rule generalizes, not
        # memorization of a small fixed set.
        ns = self.config.get("num_samples", None)
        if ns is not None and not isinstance(ns, int):
            ns = ns.get(dataset_type, None)
        self._len = int(ns) if ns is not None else _SPLIT_LEN[dataset_type]
        # splits are disjoint only while each stays inside its 1e6-index
        # stride (_SPLIT_BASE); fail loudly instead of leaking val->train
        assert self._len <= 1_000_000, (
            f"num_samples.{dataset_type}={self._len} exceeds the 1e6 "
            "inter-split index stride; splits would overlap"
        )
        self._base = _SPLIT_BASE[dataset_type]
        # label rule over (bit_img, bit_txt):
        #   and  (default): label = bit_img & bit_txt. Best UNIMODAL
        #         accuracy is 75% (picking the majority within each
        #         unimodal bucket), so val accuracy ~1.0 demonstrates
        #         real cross-modal fusion — while each modality still
        #         carries first-order gradient signal, so a from-scratch
        #         model can actually climb.
        #   xor:  label = bit_img ^ bit_txt. Fusion ceiling is stricter
        #         (50% unimodal) but NEITHER modality has any marginal
        #         correlation with the label, i.e. zero first-order
        #         gradient signal: from-scratch transformers sit on the
        #         symmetric plateau (measured: BERT-base 400 updates and
        #         4L/256H 1200 updates both end at val roc_auc ~0.5).
        #   text / image: unimodal diagnostics (label = one bit).
        self._task = str(self.config.get("task", "and"))
        assert self._task in ("and", "xor", "text", "image"), self._task

    def __len__(self):
        return self._len

    def load_item(self, idx):
        gidx = self._base + idx
        rng = np.random.RandomState(977 + gidx)
        bit_img = int(rng.randint(0, 2))
        bit_txt = int(rng.randint(0, 2))
        if self._task == "and":
            label = bit_img & bit_txt
        elif self._task == "xor":
            label = bit_img ^ bit_txt
        elif self._task == "text":
            label = bit_txt
        else:  # image
            label = bit_img

        img = rng.normal(
            0.8 if bit_img else -0.8, 0.3, size=(3, _IMG_HW, _IMG_HW)
        ).astype(np.float32)

        n_fill = int(rng.randint(4, _SEQ_LEN - 3))
        filler = rng.randint(1000, 1999, size=n_fill)
        ids = np.zeros((_SEQ_LEN,), np.int64)
        ids[0] = _CLS
        ids[1] = _TOK_A if bit_txt else _TOK_B
        ids[2 : 2 + n_fill] = filler
        ids[2 + n_fill] = _SEP
        mask = np.zeros((_SEQ_LEN,), np.int64)
        mask[: 3 + n_fill] = 1

        s = Sample()
        s["id"] = np.int64(gidx)
        s["image"] = img
        s["input_ids"] = ids
        s["input_mask"] = mask
        s["segment_ids"] = np.zeros((_SEQ_LEN,), np.int64)
        s["targets"] = np.int64(label)
        return s

    def format_for_prediction(self, report):
        scores = np.asarray(report["scores"])
        ids = np.asarray(report["id"]).reshape(-1)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        return [
            {"id": int(i), "proba": float(p[1]), "label": int(p.argmax())}
            for i, p in zip(ids.tolist(), probs)
        ]


@registry.register_builder("synth_memes")
class SynthMemesBuilder(BaseDatasetBuilder):
    def __init__(self):
        super().__init__("synth_memes")

    @classmethod
    def config_path(cls):
        return None

    def build(self, config, dataset_type="train", *a, **kw):
        return

    def load(self, config, dataset_type="train", *a, **kw):
        return SynthMemes(config, dataset_type)
