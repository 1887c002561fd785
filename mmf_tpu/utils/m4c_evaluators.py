"""Answer-string evaluators for the M4C task family
(parity with mmf/utils/m4c_evaluators.py).

The normalization tables (contractions, number words, articles, punctuation
handling) follow the official VQA/EvalAI evaluation spec
(visualqa.org/evaluation.html) — they must match exactly for reported
accuracies to be comparable. ANLS uses an in-repo Levenshtein (the
`editdistance` package is not available here); TextCaps BLEU-4 uses NLTK's
corpus BLEU rather than pycocoevalcap (unavailable; PTB tokenization is
approximated by simple whitespace/punct tokenization — noted deviation).
"""

from __future__ import annotations

import re
from typing import Dict, List


_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't",
    "couldve": "could've", "couldnt": "couldn't",
    "couldn'tve": "couldn't've", "couldnt've": "couldn't've",
    "didnt": "didn't", "doesnt": "doesn't", "dont": "don't",
    "hadnt": "hadn't", "hadnt've": "hadn't've", "hadn'tve": "hadn't've",
    "hasnt": "hasn't", "havent": "haven't", "hed": "he'd",
    "hed've": "he'd've", "he'dve": "he'd've", "hes": "he's",
    "howd": "how'd", "howll": "how'll", "hows": "how's",
    "Id've": "I'd've", "I'dve": "I'd've", "Im": "I'm", "Ive": "I've",
    "isnt": "isn't", "itd": "it'd", "itd've": "it'd've",
    "it'dve": "it'd've", "itll": "it'll", "let's": "let's",
    "maam": "ma'am", "mightnt": "mightn't", "mightnt've": "mightn't've",
    "mightn'tve": "mightn't've", "mightve": "might've",
    "mustnt": "mustn't", "mustve": "must've", "neednt": "needn't",
    "notve": "not've", "oclock": "o'clock", "oughtnt": "oughtn't",
    "ow's'at": "'ow's'at", "'ows'at": "'ow's'at", "'ow'sat": "'ow's'at",
    "shant": "shan't", "shed've": "she'd've", "she'dve": "she'd've",
    "she's": "she's", "shouldve": "should've", "shouldnt": "shouldn't",
    "shouldnt've": "shouldn't've", "shouldn'tve": "shouldn't've",
    "somebody'd": "somebodyd", "somebodyd've": "somebody'd've",
    "somebody'dve": "somebody'd've", "somebodyll": "somebody'll",
    "somebodys": "somebody's", "someoned": "someone'd",
    "someoned've": "someone'd've", "someone'dve": "someone'd've",
    "someonell": "someone'll", "someones": "someone's",
    "somethingd": "something'd", "somethingd've": "something'd've",
    "something'dve": "something'd've", "somethingll": "something'll",
    "thats": "that's", "thered": "there'd", "thered've": "there'd've",
    "there'dve": "there'd've", "therere": "there're", "theres": "there's",
    "theyd": "they'd", "theyd've": "they'd've", "they'dve": "they'd've",
    "theyll": "they'll", "theyre": "they're", "theyve": "they've",
    "twas": "'twas", "wasnt": "wasn't", "wed've": "we'd've",
    "we'dve": "we'd've", "weve": "we've", "werent": "weren't",
    "whatll": "what'll", "whatre": "what're", "whats": "what's",
    "whatve": "what've", "whens": "when's", "whered": "where'd",
    "wheres": "where's", "whereve": "where've", "whod": "who'd",
    "whod've": "who'd've", "who'dve": "who'd've", "wholl": "who'll",
    "whos": "who's", "whove": "who've", "whyll": "why'll",
    "whyre": "why're", "whys": "why's", "wont": "won't",
    "wouldve": "would've", "wouldnt": "wouldn't",
    "wouldnt've": "wouldn't've", "wouldn'tve": "wouldn't've",
    "yall": "y'all", "yall'll": "y'all'll", "y'allll": "y'all'll",
    "yall'd've": "y'all'd've", "y'alld've": "y'all'd've",
    "y'all'dve": "y'all'd've", "youd": "you'd", "youd've": "you'd've",
    "you'dve": "you'd've", "youll": "you'll", "youre": "you're",
    "youve": "you've",
}

_NUMBER_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}

_ARTICLES = ("a", "an", "the")
_PERIOD_STRIP = re.compile(r"(?!<=\d)(\.)(?!\d)")
_COMMA_STRIP = re.compile(r"(?<=\d)(\,)+(?=\d)")
_PUNCTUATIONS = [
    ";", r"/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\", "_",
    "-", ">", "<", "@", "`", ",", "?", "!",
]


class EvalAIAnswerProcessor:
    """Normalizes an answer string per the EvalAI/VQA evaluation spec."""

    CONTRACTIONS = _CONTRACTIONS
    NUMBER_MAP = _NUMBER_MAP
    ARTICLES = list(_ARTICLES)
    PERIOD_STRIP = _PERIOD_STRIP
    COMMA_STRIP = _COMMA_STRIP
    PUNCTUATIONS = _PUNCTUATIONS

    def __init__(self, *args, **kwargs):
        pass

    def word_tokenize(self, word: str) -> str:
        word = word.lower()
        word = word.replace(",", "").replace("?", "").replace("'s", " 's")
        return word.strip()

    def process_punctuation(self, in_text: str) -> str:
        out_text = in_text
        for p in self.PUNCTUATIONS:
            if (p + " " in in_text or " " + p in in_text) or (
                re.search(self.COMMA_STRIP, in_text) is not None
            ):
                out_text = out_text.replace(p, "")
            else:
                out_text = out_text.replace(p, " ")
        out_text = self.PERIOD_STRIP.sub("", out_text, re.UNICODE)
        return out_text

    def process_digit_article(self, in_text: str) -> str:
        out_text = []
        for word in in_text.lower().split():
            word = self.NUMBER_MAP.get(word, word)
            if word not in self.ARTICLES:
                out_text.append(word)
        for i, word in enumerate(out_text):
            if word in self.CONTRACTIONS:
                out_text[i] = self.CONTRACTIONS[word]
        return " ".join(out_text)

    def __call__(self, item: str) -> str:
        item = self.word_tokenize(item)
        item = item.replace("\n", " ").replace("\t", " ").strip()
        item = self.process_punctuation(item)
        item = self.process_digit_article(item)
        return item


def levenshtein(s1: str, s2: str) -> int:
    """Edit distance (replaces the editdistance package): C kernel via
    ctypes with a python fallback (utils/native/editdist)."""
    from mmf_tpu.utils.native.editdist import edit_distance

    return edit_distance(s1, s2)


class TextVQAAccuracyEvaluator:
    """Soft-voted accuracy over 10 human answers."""

    def __init__(self):
        self.answer_processor = EvalAIAnswerProcessor()

    def _compute_answer_scores(self, raw_answers: List[str]) -> Dict[str, float]:
        answers = [self.answer_processor(a) for a in raw_answers]
        assert len(answers) == 10
        gt_answers = list(enumerate(answers))
        unique_answer_scores = {}
        for unique_answer in set(answers):
            accs = []
            for gt_answer in gt_answers:
                other = [item for item in gt_answers if item != gt_answer]
                matching = [item for item in other if item[1] == unique_answer]
                accs.append(min(1, float(len(matching)) / 3))
            unique_answer_scores[unique_answer] = sum(accs) / len(accs)
        return unique_answer_scores

    def eval_pred_list(self, pred_list) -> float:
        pred_scores = []
        for entry in pred_list:
            pred_answer = self.answer_processor(entry["pred_answer"])
            scores = self._compute_answer_scores(entry["gt_answers"])
            pred_scores.append(scores.get(pred_answer, 0.0))
        return sum(pred_scores) / max(len(pred_scores), 1)


class STVQAAccuracyEvaluator:
    def __init__(self):
        self.answer_processor = EvalAIAnswerProcessor()

    def eval_pred_list(self, pred_list) -> float:
        pred_scores = []
        for entry in pred_list:
            pred_answer = self.answer_processor(entry["pred_answer"])
            gts = [self.answer_processor(a) for a in entry["gt_answers"]]
            pred_scores.append(1.0 if pred_answer in gts else 0.0)
        return sum(pred_scores) / max(len(pred_scores), 1)


class STVQAANLSEvaluator:
    """Average Normalized Levenshtein Similarity."""

    def get_anls(self, s1: str, s2: str) -> float:
        s1 = s1.lower().strip()
        s2 = s2.lower().strip()
        if max(len(s1), len(s2)) == 0:
            return 0.0
        iou = 1 - levenshtein(s1, s2) / max(len(s1), len(s2))
        return iou if iou >= 0.5 else 0.0

    def eval_pred_list(self, pred_list) -> float:
        from mmf_tpu.utils.native.editdist import anls_best

        pred_scores = [
            anls_best(
                e["pred_answer"].lower().strip(),
                [gt.lower().strip() for gt in e["gt_answers"]],
            )
            for e in pred_list
        ]
        return sum(pred_scores) / max(len(pred_scores), 1)


class TextCapsBleu4Evaluator:
    """BLEU-4 via NLTK corpus BLEU (pycocoevalcap's PTB tokenizer is not
    available in this environment; simple lowercase word tokenization is
    used instead)."""

    def __init__(self):
        import nltk.translate.bleu_score as bleu_score

        self._bleu = bleu_score

    @staticmethod
    def _tok(s: str) -> List[str]:
        return re.findall(r"\w+|[^\w\s]", s.lower())

    def eval_pred_list(self, pred_list) -> float:
        refs = [[self._tok(a) for a in e["gt_answers"]] for e in pred_list]
        hyps = [self._tok(e["pred_answer"]) for e in pred_list]
        return float(self._bleu.corpus_bleu(refs, hyps))
