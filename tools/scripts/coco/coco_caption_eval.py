"""COCO caption evaluation: BLEU-1..4, ROUGE-L, CIDEr.

Parity with tools/scripts/coco/coco_caption_eval.py in the reference,
which shells into pycocoevalcap (Java + external repo). Those metrics are
plain n-gram math, so they are implemented here directly; METEOR and
SPICE need external resources (wordnet jar / parser) and raise with that
explanation if requested.

Usage:
  python coco_caption_eval.py --annotation_file instances.json \
      --results_file predictions.json   # [{"image_id": ..., "caption": ...}]
"""

from __future__ import annotations

import argparse
import json
import math
import re
from collections import Counter, defaultdict
from typing import Dict, List

_PUNCT = re.compile(r"[^a-z0-9 ]+")


def ptb_tokenize(caption: str) -> List[str]:
    return _PUNCT.sub(" ", caption.lower()).split()


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(
        tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


def bleu(gts: Dict, res: Dict, max_n: int = 4) -> List[float]:
    """Corpus BLEU-1..max_n with brevity penalty (Papineni et al.)."""
    clipped = [0] * max_n
    totals = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for img_id, hyps in res.items():
        hyp = ptb_tokenize(hyps[0])
        refs = [ptb_tokenize(r) for r in gts[img_id]]
        hyp_len += len(hyp)
        ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            hyp_ng = _ngrams(hyp, n)
            max_ref = Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            clipped[n - 1] += sum(
                min(c, max_ref[ng]) for ng, c in hyp_ng.items()
            )
            totals[n - 1] += max(sum(hyp_ng.values()), 0)
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    scores = []
    log_sum = 0.0
    for n in range(max_n):
        p = clipped[n] / totals[n] if totals[n] else 0.0
        log_sum += math.log(max(p, 1e-12))
        scores.append(bp * math.exp(log_sum / (n + 1)))
    return scores


def _lcs(a: List[str], b: List[str]) -> int:
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(gts: Dict, res: Dict, beta: float = 1.2) -> float:
    scores = []
    for img_id, hyps in res.items():
        hyp = ptb_tokenize(hyps[0])
        best = 0.0
        for ref in gts[img_id]:
            r = ptb_tokenize(ref)
            lcs = _lcs(hyp, r)
            if lcs == 0:
                continue
            prec = lcs / len(hyp)
            rec = lcs / len(r)
            best = max(
                best,
                (1 + beta**2) * prec * rec / (rec + beta**2 * prec),
            )
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


def cider(gts: Dict, res: Dict, n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D (Vedantam et al.): tf-idf weighted n-gram cosine consensus
    with length gaussian penalty."""
    # document frequencies over reference sets
    df = [Counter() for _ in range(n)]
    for refs in gts.values():
        seen = [set() for _ in range(n)]
        for ref in refs:
            toks = ptb_tokenize(ref)
            for k in range(n):
                seen[k].update(_ngrams(toks, k + 1))
        for k in range(n):
            df[k].update(seen[k])
    log_num_imgs = math.log(max(len(gts), 1))

    def tfidf_vec(tokens):
        vecs, norms = [], []
        for k in range(n):
            counts = _ngrams(tokens, k + 1)
            total = max(sum(counts.values()), 1)
            vec = {}
            for ng, c in counts.items():
                idf = log_num_imgs - math.log(max(df[k][ng], 1))
                vec[ng] = (c / total) * idf
            vecs.append(vec)
            norms.append(math.sqrt(sum(v * v for v in vec.values())))
        return vecs, norms

    scores = []
    for img_id, hyps in res.items():
        hyp_toks = ptb_tokenize(hyps[0])
        hvecs, hnorms = tfidf_vec(hyp_toks)
        per_ref = []
        for ref in gts[img_id]:
            ref_toks = ptb_tokenize(ref)
            rvecs, rnorms = tfidf_vec(ref_toks)
            sim = 0.0
            for k in range(n):
                dot = sum(
                    min(hvecs[k][ng], rvecs[k].get(ng, 0.0)) * rvecs[k].get(ng, 0.0)
                    for ng in hvecs[k]
                )
                denom = hnorms[k] * rnorms[k]
                s = dot / denom if denom > 0 else 0.0
                delta = len(hyp_toks) - len(ref_toks)
                s *= math.exp(-(delta**2) / (2 * sigma**2))
                sim += s
            per_ref.append(10.0 * sim / n)
        scores.append(sum(per_ref) / max(len(per_ref), 1))
    return sum(scores) / max(len(scores), 1)


class COCOEvalCap:
    def __init__(self, gts: Dict, res: Dict):
        self.gts = gts
        self.res = res
        self.eval: Dict[str, float] = {}

    def evaluate(self, metrics=("bleu", "rouge_l", "cider")):
        for m in metrics:
            if m == "bleu":
                for i, s in enumerate(bleu(self.gts, self.res), 1):
                    self.eval[f"Bleu_{i}"] = s
            elif m == "rouge_l":
                self.eval["ROUGE_L"] = rouge_l(self.gts, self.res)
            elif m == "cider":
                self.eval["CIDEr"] = cider(self.gts, self.res)
            elif m in ("meteor", "spice"):
                raise NotImplementedError(
                    f"{m} needs external resources (wordnet/parser) that "
                    "are not bundled; bleu/rouge_l/cider are in-repo"
                )
        return self.eval


def _load(annotation_file: str, results_file: str):
    anns = json.load(open(annotation_file))
    gts = defaultdict(list)
    for ann in anns["annotations"]:
        gts[ann["image_id"]].append(ann["caption"])
    res = defaultdict(list)
    for r in json.load(open(results_file)):
        res[r["image_id"]].append(r["caption"])
    res = {k: v for k, v in res.items() if k in gts}
    return dict(gts), res


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--annotation_file", required=True)
    parser.add_argument("--results_file", required=True)
    args = parser.parse_args()
    gts, res = _load(args.annotation_file, args.results_file)
    scores = COCOEvalCap(gts, res).evaluate()
    for k, v in scores.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
