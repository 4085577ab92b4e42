"""PCRE -> Python ``re`` conversion.

Functional analog of the reference's PCRE->JS converter
(/root/reference/src/helpers/convert-pcre.ts:2-35): heuristic regexes in the
pinned metadata snapshot are written in PCRE (upstream heuristics.yml uses
Ruby/PCRE syntax); the host regex engine understands neither possessive
quantifiers, atomic groups, nor free-spacing mode in the same way, so we
normalise them before compilation.

Conversion steps (mirroring convert-pcre.ts semantics):
  - inline flag declarations ``(?i)`` / ``?i:`` are collected into Python flags
  - possessive quantifiers ``*+``/``++`` -> greedy (``convert-pcre.ts:15``)
  - atomic groups ``(?>`` -> non-capturing ``(?:`` (``convert-pcre.ts:16``)
  - ``\\A``/``\\Z`` -> ``^``/``$`` without MULTILINE; otherwise MULTILINE is
    added by default (``convert-pcre.ts:17-25``) because upstream heuristic
    patterns are written to match at line starts
  - free-spacing ``x`` flag -> whitespace/comments stripped
    (``convert-pcre.ts:27-32``)

All conversion happens once at driver side; compiled patterns are shipped to
executors inside broadcast state (never recompiled per row, unlike the
reference's per-file ``pcre()`` call at src/index.ts:357).
"""

from __future__ import annotations

import re
from functools import lru_cache

_FLAG_MAP = {
    "i": re.IGNORECASE,
    "m": re.MULTILINE,
    "s": re.DOTALL,
    "x": 0,  # handled by stripping whitespace, like convert-pcre.ts:27-32
}


def _dequadratic(pat: str) -> str:
    """Neutralize multiline backtracking bombs, existence-equivalently.

    Under MULTILINE, ``^\\s*X`` tried at every line start of a long
    newline run greedily consumes the entire remaining run and backtracks
    — O(lines × length) ≈ quadratic; a single whitespace-heavy crawl page
    pins a core for minutes (the reference has the same bomb in JS).

    Rewrites (match-existence equivalence argued below, and empirically
    checked pattern-by-pattern in tests/test_pcre_dequadratic.py):

    - ``^\\s*`` -> ``^[^\\S\\n]*``: if the original matches by consuming
      whitespace across newlines down to line j, then ``^`` anchors at
      line j directly and the intra-line form matches there too (the
      continuation never starts with a whitespace consumer in the
      snapshot); conversely intra-line matches are original matches.
    - whole-pattern ``^[^#]+:-`` -> ``(?:^[^#\\n]+:-)|(?:^[^#\\n]*\\n:-)``:
      a cross-line match implies the line directly before the ``:-`` is
      '#'-free (second branch), or the same-line prefix is non-empty and
      '#'-free (first branch); the branches imply the original with the
      ``\\n`` or the prefix supplying the required >=1 character.
    """
    if pat == r"^[^#]+:-":
        return r"(?:^[^#\n]+:-)|(?:^[^#\n]*\n:-)"
    if pat == r"^[^#]*:-":
        # with * the cross-line prefix is optional, so the ':-' line's own
        # '#'-free prefix always witnesses the match — pure line-local form
        return r"^[^#\n]*:-"
    pat = pat.replace(r"(?:^|\n)\s*", r"(?:^|\n)[^\S\n]*")
    return pat.replace(r"^\s*", r"^[^\S\n]*")


def convert_pcre(pattern: str, dequadratic: bool = True) -> tuple[str, int]:
    """Convert a PCRE pattern string to (python_pattern, flags)."""
    final = pattern
    flags: set[str] = set()

    # Collect inline flag declarations: (?i) (?-i) (?im) and (?i: ... ) openers
    for m in list(re.finditer(r"\(\?(-)?([a-z]+)\)", final)):
        neg, fl = m.group(1), m.group(2)
        if all(ch in _FLAG_MAP for ch in fl):
            final = final.replace(m.group(0), "", 1)
            for ch in fl:
                if neg:
                    flags.discard(ch)
                else:
                    flags.add(ch)
    for m in list(re.finditer(r"\(\?(-)?([a-z]):", final)):
        neg, fl = m.group(1), m.group(2)
        if fl in _FLAG_MAP:
            final = final.replace(m.group(0), "(?:", 1)
            if neg:
                flags.discard(fl)
            else:
                flags.add(fl)

    # Possessive quantifiers -> greedy; atomic groups -> non-capturing
    final = re.sub(r"([*+]){2}", r"\1", final)
    final = final.replace("(?>", "(?:")

    # Start/end-of-file markers vs default multiline (convert-pcre.ts:17-25)
    if re.search(r"\\[AZ]", final):
        final = final.replace(r"\A", "^").replace(r"\Z", "$")
        flags.discard("m")
    else:
        flags.add("m")

    # Free-spacing mode
    if "x" in flags:
        flags.discard("x")
        final = re.sub(r"#.+", "", final)
        final = re.sub(r"^\s+|\s+$|\n", "", final, flags=re.MULTILINE)
        final = re.sub(r"\s+", " ", final)

    if dequadratic and "m" in flags:
        final = _dequadratic(final)

    py_flags = 0
    for ch in flags:
        py_flags |= _FLAG_MAP.get(ch, 0)
    return final, py_flags


@lru_cache(maxsize=4096)
def compile_pcre(pattern: str) -> re.Pattern:
    """Compile a PCRE pattern to a Python regex (cached)."""
    py_pat, py_flags = convert_pcre(pattern)
    return re.compile(py_pat, py_flags)
