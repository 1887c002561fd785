"""Answer-vocab preprocessing utilities
(parity with mmf/utils/process_answers.py): build the top-k answer
vocabulary from VQA-style annotations."""

from __future__ import annotations

import argparse
import json
from collections import Counter

from mmf_tpu.utils.text import word_tokenize


def get_top_answers(annotations, k=3000, min_freq=0):
    """annotations: list of dicts with 'answers' (list of str)."""
    counter = Counter()
    for ann in annotations:
        for answer in ann.get("answers", []):
            counter[word_tokenize(answer)] += 1
    answers = [a for a, c in counter.most_common() if c > min_freq]
    return answers[:k]


def build_answer_vocab(annotation_files, out_file, k=3000, min_freq=0):
    annotations = []
    for path in annotation_files:
        with open(path) as f:
            data = json.load(f)
        annotations.extend(data.get("annotations", data.get("data", data)))
    answers = get_top_answers(annotations, k, min_freq)
    with open(out_file, "w") as f:
        f.write("\n".join(answers))
    return answers


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--annotations", nargs="+", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--k", type=int, default=3000)
    parser.add_argument("--min_freq", type=int, default=0)
    args = parser.parse_args()
    build_answer_vocab(args.annotations, args.out, args.k, args.min_freq)
