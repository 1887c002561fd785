"""Build a vocabulary file from text corpora.

Shared implementation behind the per-dataset extract_vocabulary tools
(reference tools/scripts/{gqa,visual_dialog}/extract_vocabulary.py):
tokenize every text, count, threshold by min frequency, write one word
per line (Vocab adds <pad>/<s>/</s>/<unk> at load time).
"""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter
from typing import Iterable, List


def _tokenize(text: str) -> List[str]:
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from mmf_tpu.utils.text import tokenize

    return tokenize(text)


class ExtractVocabulary:
    def __init__(self, args=None):
        self.args = args or self.get_args()

    def get_args(self):
        parser = argparse.ArgumentParser()
        parser.add_argument("--input_files", nargs="+", required=True,
                            help="Input json/jsonl/txt files with text")
        parser.add_argument("--out_dir", type=str, required=True)
        parser.add_argument("--min_freq", type=int, default=0)
        parser.add_argument("--vocab_file_name", type=str,
                            default="vocabulary.txt")
        parser.add_argument("--text_key", type=str, default="question",
                            help="Field holding the text in json entries")
        return parser.parse_args()

    def get_text(self) -> Iterable[str]:
        key = self.args.text_key
        for path in self.args.input_files:
            if path.endswith(".jsonl"):
                with open(path) as f:
                    for line in f:
                        yield json.loads(line).get(key, "")
            elif path.endswith(".json"):
                data = json.load(open(path))
                entries = data.values() if isinstance(data, dict) else data
                for item in entries:
                    if isinstance(item, dict):
                        yield item.get(key, "")
            else:
                with open(path) as f:
                    yield from (line.strip() for line in f)

    def extract(self):
        os.makedirs(self.args.out_dir, exist_ok=True)
        word_count = Counter()
        lengths = []
        for text in self.get_text():
            words = _tokenize(text)
            lengths.append(len(words))
            word_count.update(words)

        vocabulary = sorted(
            w for w, c in word_count.items() if c >= self.args.min_freq
        )
        out = os.path.join(self.args.out_dir, self.args.vocab_file_name)
        with open(out, "w") as f:
            f.writelines(w + "\n" for w in vocabulary)
        print(f"{len(vocabulary)} words -> {out}")
        if lengths:
            print(f"min text len={min(lengths)} max text len={max(lengths)}")


if __name__ == "__main__":
    ExtractVocabulary().extract()
