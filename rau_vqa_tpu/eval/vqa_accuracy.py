"""Official VQA accuracy, computed locally.

The reference never computes the paper's headline metric itself: it writes
OE/MC result JSONs (Ours_SS/...lua:1171-1186) for the remote VQA
evaluation server, and its only local check is exact-match against the
pre-digested 'comprehend' map (metrics.fast_val_accuracy).  This module
implements the evaluation-server metric natively so a user holding the
official annotations can score a submission offline:

    Acc(ans) = mean over the 10 human answers g_i of
                 min(1, #{j != i : g_j == ans} / 3)

with the official answer normalization applied when the 10 humans
disagree: punctuation stripping (space-aware: a mark that abuts a space is
deleted, otherwise it becomes a space; digit-grouping commas deleted;
periods deleted unless followed by a digit), lowercasing, number words ->
digits ('none'/'zero'->'0' ... 'ten'->'10'), article removal (a/an/the),
and canonical re-apostrophization of contractions ("dont" -> "don't").
Per-question-type and per-answer-type breakdowns follow the same
convention (types read from the annotation rows).

Conventions match the public VQA evaluation code's observable behavior,
including its quirks: normalization is SKIPPED for a question when all 10
humans gave the identical string; the period rule strips '.' wherever it
is not followed by a digit ('1.' -> '1', 'a.m.' -> 'am', but '1.5' keeps
its dot); leave-one-out removes duplicate rater ROWS only when every
field (answer/confidence/id) matches.  Scores are percentages rounded to
``precision`` decimals.
"""

from __future__ import annotations

import json
import re
from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

_PUNCT = [";", "/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\",
          "_", "-", ">", "<", "@", "`", ",", "?", "!"]
# a ',' between digits marks digit grouping: '1,000' -> '1000'
_COMMA_BETWEEN_DIGITS = re.compile(r"(\d)(,)(\d)")
# strip periods except decimal points: '.' survives only before a digit
_PERIOD = re.compile(r"\.(?!\d)")

_NUMBER_WORDS = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
_ARTICLES = frozenset({"a", "an", "the"})

# apostrophe-dropped spellings -> canonical contraction
_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't",
    "couldve": "could've", "couldnt": "couldn't",
    "couldn'tve": "couldn't've", "couldnt've": "couldn't've",
    "didnt": "didn't", "doesnt": "doesn't", "dont": "don't",
    "hadnt": "hadn't", "hadnt've": "hadn't've", "hadn'tve": "hadn't've",
    "hasnt": "hasn't", "havent": "haven't", "hed": "he'd",
    "hed've": "he'd've", "he'dve": "he'd've", "hes": "he's",
    "howd": "how'd", "howll": "how'll", "hows": "how's",
    # NOTE: the official table spells the first-person entries capitalized
    # ("Im", "Ive", "Id've", "I'dve") — dead keys that can never fire after
    # its own lowercasing.  Matching observable behavior means NOT mapping
    # "im"/"ive"/"id've"/"i'dve", so they are deliberately absent here.
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


def process_punctuation(text: str) -> str:
    """Space-aware punctuation strip: a mark adjacent to a space (or in a
    string containing digit-grouping commas) is deleted outright; an
    embedded mark becomes a space ('black/white' -> 'black white').  Then
    non-decimal periods are removed."""
    out = text
    grouped_digits = _COMMA_BETWEEN_DIGITS.search(text) is not None
    for p in _PUNCT:
        if (p + " ") in text or (" " + p) in text or grouped_digits:
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    return _PERIOD.sub("", out)


def process_digit_article(text: str) -> str:
    """Lowercase, map number words to digits, drop articles, and restore
    canonical apostrophes in contractions."""
    words = []
    for w in text.lower().split():
        w = _NUMBER_WORDS.get(w, w)
        if w not in _ARTICLES:
            words.append(w)
    return " ".join(_CONTRACTIONS.get(w, w) for w in words)


def normalize_answer(text: str) -> str:
    """Full normalization pipeline (whitespace flatten -> punctuation ->
    digits/articles/contractions)."""
    text = text.replace("\n", " ").replace("\t", " ").strip()
    return process_digit_article(process_punctuation(text))


def _consensus_accuracy(res_ans: str, gt_rows: Sequence[Dict]) -> float:
    """min(1, matches/3) averaged leave-one-out over the rater rows."""
    accs = []
    for row in gt_rows:
        # leave-one-out by row VALUE: every row equal to the held-out one
        # (all fields) drops — the official code's `item != gtAnsDatum`
        others = [r for r in gt_rows if r != row]
        matches = sum(1 for r in others if r["answer"] == res_ans)
        accs.append(min(1.0, matches / 3.0))
    return sum(accs) / len(accs)


class VQAAccuracyScorer:
    """Digest official annotations ONCE, then score many submissions.

    The trainer's eval sweep scores nHop+2 hop outputs per epoch over the
    same split; per-question GT normalization is the dominant cost and
    depends only on the annotations, so it happens here in the
    constructor.  Result-answer normalization is memoized per raw string
    (submissions draw from a ~1000-answer vocabulary).

    Measured at val2014 scale (121,512 questions, 2026-08-18): digest
    ~6 s once, then ~0.33 s per hop — ~3.3 s for a full 10-output sweep,
    negligible against the device sweep itself."""

    def __init__(self, annotations: Dict, *, precision: int = 2):
        from collections import Counter

        ann_rows = annotations.get("annotations") \
            if isinstance(annotations, dict) else annotations
        self.precision = precision
        # qid -> (digested answer strings, their Counter, duplicate full
        #         rows (or None), normalize-res flag, qtype, atype)
        self._gt: Dict[int, Tuple[List[str], Dict[str, int],
                                  Optional[List[Dict]], bool, str, str]] = {}
        for a in ann_rows:
            rows = [dict(r) for r in a["answers"]]
            # the official convention: normalize only when raters
            # DISAGREE, gated on the RAW rater strings (the official code
            # never whitespace-strips GT answers — only the submission
            # answer gets the \n/\t flatten)
            disagree = len({str(r["answer"]) for r in rows}) > 1
            if disagree:
                for r in rows:
                    r["answer"] = process_digit_article(
                        process_punctuation(str(r["answer"])))
            answers = [str(r["answer"]) for r in rows]
            # leave-one-out removes rows by full-dict equality; keep the
            # exact-loop fallback only when duplicate FULL rows exist
            # (real annotations carry distinct answer_ids, so the O(n)
            # Counter path applies)
            has_dup = any(rows.count(r) > 1 for r in rows)
            self._gt[int(a["question_id"])] = (
                answers, Counter(answers), rows if has_dup else None,
                disagree, a.get("question_type", "unknown"),
                a.get("answer_type", "unknown"))
        self._norm_memo: Dict[str, str] = {}

    def _norm_res(self, raw: str) -> str:
        out = self._norm_memo.get(raw)
        if out is None:
            out = self._norm_memo[raw] = normalize_answer(raw)
        return out

    def score(self, results: Iterable[Dict], *,
              question_ids: Optional[Sequence[int]] = None) -> Dict:
        """Score submission rows: iterable of {'question_id', 'answer'}
        (the OE submission format the framework writes).  Scores every
        row whose qid is annotated — pass ``question_ids`` to restrict
        (e.g. a val subset).  Returns {'overall', 'per_question_type',
        'per_answer_type', 'n', 'missing'} with percentages rounded to
        ``precision`` decimals; 'missing' counts result rows without
        annotations (they are excluded, like scoring a partial split)."""
        want = set(int(q) for q in question_ids) \
            if question_ids is not None else None
        per_q: List[float] = []
        by_qtype: Dict[str, List[float]] = defaultdict(list)
        by_atype: Dict[str, List[float]] = defaultdict(list)
        missing = 0
        for row in results:
            qid = int(row["question_id"])
            if want is not None and qid not in want:
                continue
            gt = self._gt.get(qid)
            if gt is None:
                missing += 1
                continue
            answers, cnt, dup_rows, disagree, qtype, atype = gt
            raw = str(row["answer"])
            res_ans = self._norm_res(raw) if disagree else \
                raw.replace("\n", " ").replace("\t", " ").strip()
            if dup_rows is not None:
                acc = _consensus_accuracy(res_ans, dup_rows)
            else:
                # O(raters): held-out row i leaves cnt[res] matches minus
                # itself when it matches
                c = cnt.get(res_ans, 0)
                n = len(answers)
                acc = sum(min(1.0, (c - (a == res_ans)) / 3.0)
                          for a in answers) / n
            per_q.append(acc)
            by_qtype[qtype].append(acc)
            by_atype[atype].append(acc)

        if not per_q:
            raise ValueError("vqa accuracy: no scored questions (empty "
                             "results, or no qid overlaps the annotations)")

        def pct(vals: List[float]) -> float:
            return round(100.0 * sum(vals) / len(vals), self.precision)

        return {
            "overall": pct(per_q),
            "per_question_type": {k: pct(v)
                                  for k, v in sorted(by_qtype.items())},
            "per_answer_type": {k: pct(v)
                                for k, v in sorted(by_atype.items())},
            "n": len(per_q),
            "missing": missing,
        }


def evaluate(results: Iterable[Dict], annotations: Dict, *,
             precision: int = 2,
             question_ids: Optional[Sequence[int]] = None) -> Dict:
    """One-shot convenience wrapper: see :class:`VQAAccuracyScorer`."""
    return VQAAccuracyScorer(annotations, precision=precision).score(
        results, question_ids=question_ids)


def evaluate_files(results_json: str, annotations_json: str, *,
                   precision: int = 2) -> Dict:
    """File-path convenience wrapper over :func:`evaluate`."""
    with open(results_json) as f:
        results = json.load(f)
    with open(annotations_json) as f:
        annotations = json.load(f)
    return evaluate(results, annotations, precision=precision)
