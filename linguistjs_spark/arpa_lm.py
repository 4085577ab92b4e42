"""ARPA n-gram language model: pure-python loader + KenLM-compatible scorer.

The perplexity hook (``perplexity.try_import_kenlm``) had only ever run
through the real ``kenlm`` package, which this container lacks — so, as
with fastText before round 4 (see fasttext_bin.py), the FILE format path
was unproven. This module implements the public ARPA text format (the
SRILM/KenLM interchange format: ``\\data\\`` header with per-order counts,
``\\N-grams:`` sections of ``log10prob<TAB>w1 .. wN[<TAB>backoff]``) and
KenLM's scoring semantics:

- ``score(sentence, bos=True, eos=True)``: sum over words (plus ``</s>``)
  of log10 p(w | context), with Katz-style backoff — if the full n-gram
  is absent, add the context's backoff weight and recurse on the
  shortened context; missing contexts back off with weight 0.
- OOV words score as ``<unk>`` (KenLM models always carry it).
- ``perplexity(sentence) = 10 ** (-score / (len(words) + 1))`` — the +1 is
  ``</s>``, matching ``kenlm.Model.perplexity`` exactly.

A parity test against the real package runs when ``kenlm`` is installed
(tests/test_arpa_lm.py); without it, scoring is pinned against hand-
computable fixtures and against the repo's own byte-level ``export_arpa``
artifact. No kenlm code was read or reproduced — the format is public
(https://cmusphinx.github.io/wiki/arpaformat/) and the backoff equation
is textbook Katz.
"""

from __future__ import annotations

import math
import re

_NGRAM_HDR = re.compile(r"^ngram (\d+)=(\d+)$")
_SECTION = re.compile(r"^\\(\d+)-grams:$")


class ArpaModel:
    """An ARPA model of any order, loaded fully into python dicts.

    Memory stance: this loader is the *driver-side / small-model* path —
    a quality-filter reference LM is a few hundred MB of text at most and
    ships to executors once inside the scoring UDF closure (same stance
    as the 512 KiB fitted table in perplexity.py). Terabyte-scale LMs are
    what the real ``kenlm`` mmap path is for; the hook prefers it
    whenever the package exists.
    """

    def __init__(self, order: int, probs: dict, backoffs: dict):
        self.order = order
        self._probs = probs        # tuple[str, ...] -> log10 prob
        self._backoffs = backoffs  # tuple[str, ...] -> log10 backoff weight
        if ("<unk>",) not in probs:
            raise ValueError("ARPA model has no <unk> unigram")

    # -- construction -------------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "ArpaModel":
        declared: dict[int, int] = {}
        probs: dict[tuple, float] = {}
        backoffs: dict[tuple, float] = {}
        section = 0  # 0 = outside any \N-grams: block
        with open(path, encoding="utf-8") as f:
            it = iter(f)
            for line in it:
                if line.strip() == "\\data\\":
                    break
            else:
                raise ValueError(f"{path}: no \\data\\ header — not ARPA")
            for raw in it:
                line = raw.strip()
                if not line:
                    continue
                m = _NGRAM_HDR.match(line)
                if m:
                    declared[int(m.group(1))] = int(m.group(2))
                    continue
                m = _SECTION.match(line)
                if m:
                    section = int(m.group(1))
                    if section not in declared:
                        raise ValueError(
                            f"{path}: \\{section}-grams: not declared in header"
                        )
                    continue
                if line == "\\end\\":
                    section = -1
                    continue
                if section <= 0:
                    raise ValueError(f"{path}: data line outside a section: {line!r}")
                parts = line.split("\t") if "\t" in line else line.split()
                if "\t" in line:
                    # canonical form: prob<TAB>words[<TAB>backoff]
                    words = tuple(parts[1].split())
                    prob = float(parts[0])
                    backoff = float(parts[2]) if len(parts) > 2 else None
                else:
                    # space-separated fallback (some emitters): prob w1..wN [bo]
                    if len(parts) == section + 2:
                        prob, words, backoff = (
                            float(parts[0]), tuple(parts[1:-1]), float(parts[-1])
                        )
                    else:
                        prob, words, backoff = (
                            float(parts[0]), tuple(parts[1:]), None
                        )
                if len(words) != section:
                    raise ValueError(
                        f"{path}: {len(words)}-gram in \\{section}-grams: {line!r}"
                    )
                probs[words] = prob
                if backoff is not None and backoff != 0.0:
                    backoffs[words] = backoff
        if not declared:
            raise ValueError(f"{path}: empty \\data\\ header")
        return cls(max(declared), probs, backoffs)

    # -- scoring ------------------------------------------------------------

    def _logprob(self, context: tuple, word: str) -> float:
        """log10 p(word | context) with Katz backoff; context already
        truncated to at most order-1 words."""
        ngram = context + (word,)
        p = self._probs.get(ngram)
        if p is not None:
            return p
        if not context:
            # unigram miss -> <unk>
            return self._probs[("<unk>",)]
        bo = self._backoffs.get(context, 0.0)
        return bo + self._logprob(context[1:], word)

    def score_tokens(self, tokens, bos: bool = True, eos: bool = True) -> float:
        """Sum of log10 conditional probs over tokens (+ </s> if eos).
        ``<s>`` conditions but is never predicted, exactly as in KenLM."""
        vocab_mapped = [t if (t,) in self._probs else "<unk>" for t in tokens]
        history: tuple = ("<s>",) if bos else ()
        total = 0.0
        targets = vocab_mapped + (["</s>"] if eos else [])
        for w in targets:
            context = history[-(self.order - 1):] if self.order > 1 else ()
            total += self._logprob(context, w)
            history = history + (w,)
        return total

    def score(self, sentence: str, bos: bool = True, eos: bool = True) -> float:
        return self.score_tokens((sentence or "").split(), bos=bos, eos=eos)

    def perplexity(self, sentence: str) -> float:
        """10 ** (-score / (n_words + 1)); the +1 counts </s> — this is
        kenlm.Model.perplexity's normalization verbatim."""
        words = (sentence or "").split()
        n = len(words) + 1
        return 10.0 ** (-self.score(sentence) / n)
