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
    pat = pat.replace(r"^\s*", r"^[^\S\n]*")
    # A bare UNANCHORED leading \s* (upstream's GAP rule for .g) is
    # existence-irrelevant under search(): the empty-whitespace case
    # witnesses every match position, so stripping it changes nothing —
    # while keeping it makes search() consume the whole run at every start
    # offset of a whitespace flood (O(n^2), ~27s on a 50KB newline page).
    # Lazy \s*? is stripped identically (same zero-width argument).
    return re.sub(r"^\\s\*\??(?![*+?{])", "", pat)


def _first_consumed_can_be_ws(tokens) -> bool:
    """True if a regex token sequence can CONSUME a whitespace character as
    its first matched character (zero-width tokens are skipped; optional
    tokens fall through to their successor)."""
    import re._constants as C

    def tok_can_be_ws(op, av) -> bool:
        if op is C.LITERAL:
            return chr(av).isspace()
        if op is C.NOT_LITERAL:
            return True  # matches almost anything, incl. some whitespace
        if op is C.ANY:
            return False  # '.' without DOTALL skips \n but matches ' '... be strict:
        if op is C.IN:
            return _class_can_be_ws(av)
        if op is C.BRANCH:
            return any(_first_consumed_can_be_ws(b) for b in av[1])
        if op is C.SUBPATTERN:
            return _first_consumed_can_be_ws(av[3])
        if op in (C.MAX_REPEAT, C.MIN_REPEAT):
            return _first_consumed_can_be_ws(av[2])
        return False

    def tok_can_be_empty(op, av) -> bool:
        if op is C.AT:
            return True
        if op in (C.MAX_REPEAT, C.MIN_REPEAT):
            return av[0] == 0
        if op in (C.ASSERT, C.ASSERT_NOT):
            return True
        if op is C.SUBPATTERN:
            return all(tok_can_be_empty(o, a) for o, a in av[3])
        if op is C.BRANCH:
            return any(
                all(tok_can_be_empty(o, a) for o, a in b) for b in av[1]
            )
        return False

    for op, av in tokens:
        if op is C.ANY:
            # '.' matches ' ' and '\t' (everything but \n): whitespace-capable
            return True
        if tok_can_be_ws(op, av):
            return True
        if not tok_can_be_empty(op, av):
            return False
    return False


def _class_can_be_ws(items) -> bool:
    import re._constants as C

    ws = [ord(c) for c in " \t\r\n\f\x0b"]
    negate = any(op is C.NEGATE for op, _ in items)
    hit = False
    for op, av in items:
        if op is C.LITERAL and av in ws:
            hit = True
        elif op is C.RANGE and any(av[0] <= w <= av[1] for w in ws):
            hit = True
        elif op is C.CATEGORY and av in (
            C.CATEGORY_SPACE, C.CATEGORY_NOT_WORD, C.CATEGORY_NOT_DIGIT
        ):
            hit = True
    if negate:
        # negated class matches whitespace unless every ws char is excluded —
        # conservatively report whitespace-capable unless the class lists \s
        excluded = {av for op, av in items if op is C.LITERAL}
        cat_space = any(
            op is C.CATEGORY and av is C.CATEGORY_SPACE for op, av in items
        )
        return not (cat_space or all(w in excluded for w in ws))
    return hit


def assert_dequadratic_safe(pattern: str, flags: int) -> None:
    """Structural guarantee behind _dequadratic's ``^\\s*`` rewrite
    (ADVICE r01): the match-existence-equivalence argument requires that
    nothing FOLLOWING the rewritten prefix can consume a whitespace
    character first — otherwise a cross-line match could have no intra-line
    witness. Enforced on the regex PARSE TREE (not a probe corpus), so a
    heuristics.json refresh that violates the invariant fails loudly at
    driver compile time rather than silently changing match semantics."""
    import re._constants as C
    import re._parser as sre_parse

    try:
        parsed = sre_parse.parse(pattern, flags)
    except re.error:
        return  # compile will raise the real error

    def walk(tokens) -> None:
        seq = list(tokens)
        for i, (op, av) in enumerate(seq):
            # recurse into structures
            if op is C.SUBPATTERN:
                walk(av[3])
            elif op is C.BRANCH:
                for b in av[1]:
                    walk(b)
            elif op in (C.MAX_REPEAT, C.MIN_REPEAT):
                walk(av[2])
            elif op in (C.ASSERT, C.ASSERT_NOT):
                walk(av[1])
            # detect the rewritten prefix: AT_BEGINNING/newline then [^\S\n]*
            is_anchor = op is C.AT or (
                op is C.IN and any(
                    o is C.LITERAL and a == ord("\n") for o, a in av
                ) if op is C.IN else False
            ) or (op is C.LITERAL and av == ord("\n"))
            if not is_anchor or i + 1 >= len(seq):
                continue
            nop, nav = seq[i + 1]
            if nop not in (C.MAX_REPEAT, C.MIN_REPEAT) or nav[0] != 0:
                continue
            body = list(nav[2])
            if len(body) != 1 or body[0][0] is not C.IN:
                continue
            if not _class_can_be_ws(body[0][1]):
                continue
            # found "<line-anchor><ws-ish>*" — check the continuation
            if _first_consumed_can_be_ws(seq[i + 2:]):
                raise ValueError(
                    "unsafe _dequadratic rewrite: continuation after the "
                    f"line-anchored whitespace run can itself consume "
                    f"whitespace in pattern {pattern!r} — the intra-line "
                    "rewrite is not match-existence-equivalent here; adjust "
                    "pcre._dequadratic for this pattern"
                )

    walk(parsed)


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

    py_flags = 0
    for ch in flags:
        py_flags |= _FLAG_MAP.get(ch, 0)

    if dequadratic and "m" in flags:
        rewritten = _dequadratic(final)
        if rewritten != final:
            assert_dequadratic_safe(rewritten, py_flags)
        final = rewritten

    return final, py_flags


@lru_cache(maxsize=4096)
def compile_pcre(pattern: str) -> re.Pattern:
    """Compile a PCRE pattern to a Python regex (cached)."""
    py_pat, py_flags = convert_pcre(pattern)
    return re.compile(py_pat, py_flags)
