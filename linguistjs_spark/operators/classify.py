"""Classification kernel: the C1-C9 cascade as one vectorized pandas UDF.

Spark-first design (SURVEY.md §2.3/§2.9): the cheap signals (filename map,
extension map with complex-ext priority) are resolved via vectorized pandas
dict lookups against broadcast metadata; only the genuinely regex-heavy
slow paths — shebang/modeline matching (C2/C3) and heuristic disambiguation
(C8) — fall back to the shared oracle functions, and only on the small row
subsets that actually need them (rows whose first line starts with ``#!`` or
carries a modeline, rows whose extension has a disambiguation group). On web
corpora those subsets are a tiny fraction of rows, so the kernel stays
Arrow-batch-vectorized in the hot path with zero per-row Python for the
common case.

All compiled-regex/broadcast state lives in per-executor lazy singletons
(initialised once per python worker, SURVEY.md §4 item 4).

Reference parity: identical row semantics to oracle.classify + oracle.narrow,
which mirror /root/reference/src/index.ts:181-373; the parity pytest compares
the two paths row-for-row.
"""

from __future__ import annotations

import warnings

import pandas as pd

# Series.str.contains warns when a heuristic regex has capture groups; we
# only want the boolean, so the warning is noise (fires per Arrow batch).
# A module-level filterwarnings is not enough (pytest resets filters per
# test), so the kernel routes all regex matching through _contains below.
warnings.filterwarnings(
    "ignore", message="This pattern is interpreted as a regular expression"
)


def _contains(series: "pd.Series", pat: str) -> "pd.Series":
    """Boolean regex match with the pandas capture-group warning silenced."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)
        return series.str.contains(pat, regex=True, na=False)
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from ..config import QualityFilterConfig
from ..metadata import Metadata, load_metadata
from .. import oracle

CLASSIFY_SCHEMA = StructType(
    [
        StructField("lang", StringType(), True),
        StructField("alternatives", ArrayType(StringType()), False),
        StructField("definite", BooleanType(), False),
        StructField("from_shebang", BooleanType(), False),
    ]
)


class _KernelState:
    """Per-executor singleton: precompiled lookup tables derived from the
    metadata snapshot + config (collapse/dedupe applied once at init, not
    per row — analog of the reference compiling vendor regexes once at
    src/index.ts:71, and a fix of its per-file heuristic recompile quirk at
    src/index.ts:357)."""

    def __init__(self, cfg: QualityFilterConfig) -> None:
        self.cfg = cfg
        self.md = load_metadata()
        md = self.md

        def collapse(langs: list[str]) -> list[str]:
            out: list[str] = []
            for l in langs:
                final = l
                if not cfg.child_languages and md.languages.get(l, {}).get("group"):
                    final = md.languages[l]["group"]
                if final not in out:
                    out.append(final)
            return out

        ignored = {l.lower() for l in cfg.ignored_languages}

        def keep_lang(l: str) -> bool:
            return l.lower() not in ignored

        self.filename_map = {
            name: collapse([l for l in langs if keep_lang(l)])
            for name, langs in md.filename_map.items()
        }
        self.ext_map = {
            ext: collapse([l for l in langs if keep_lang(l)])
            for ext, langs in md.ext_map.items()
        }
        self.heuristic_exts = frozenset(
            e for d in md.disambiguations for e in d["extensions"]
        )
        # lowered, ignored-language-filtered language view for the oracle calls
        self.lang_data = {
            k: v for k, v in md.languages.items() if keep_lang(k)
        }
        # (ext, candidates) -> applicable rule program, cached: candidates are
        # constant per ext/filename key so applicability folds at driver time
        self._rule_programs: dict[tuple, list] = {}

    def rule_program(self, ext: str, cands: tuple) -> list:
        """Pre-filtered heuristic program for (ext, candidates): a list of
        groups, each a list of (lang, patterns) rules whose language (or its
        group parent) is among the candidates — mirrors src/index.ts:319-362
        including the later-group-overwrites quirk."""
        key = (ext, cands)
        prog = self._rule_programs.get(key)
        if prog is None:
            cset = set(cands)
            prog = []
            for dis in self.md.disambiguations:
                if ext not in dis["extensions"]:
                    continue
                rules = []
                for rule in dis["rules"]:
                    lang = rule["language"]
                    group = self.md.languages.get(lang, {}).get("group")
                    if lang in cset or (group and group in cset):
                        rules.append((lang, rule))
                if rules:
                    prog.append(rules)
            self._rule_programs[key] = prog
        return prog

    def needs_heuristics(self, ext: str, cands: tuple) -> bool:
        """True when running the rule program could change the outcome.

        A single-candidate row is NOT automatically safe to short-circuit:
        a rule's language may be a CHILD of the candidate (matched via its
        group, src/index.ts:331-336) and the reference assigns the rule's
        raw language — e.g. ext .pod collapses to ['Raku'] but its rule
        yields 'Pod 6'. Skip only when every applicable rule's language
        equals the single candidate (then any match is a no-op)."""
        key = ("_needs", ext, cands)
        hit = self._rule_programs.get(key)
        if hit is None:
            prog = self.rule_program(ext, cands)
            if not prog:
                hit = False
            elif len(cands) > 1:
                hit = True
            else:
                hit = any(
                    lang != cands[0] for group in prog for lang, _ in group
                )
            self._rule_programs[key] = hit
        return hit

    def classify_slow(self, path: str, text: str | None) -> tuple[list[str], bool, bool]:
        return oracle.classify(self.md, self.cfg, path, text, overrides=[])

    def narrow_slow(
        self, path, text, cands, definite, from_shebang
    ) -> tuple[str | None, list[str]]:
        lang, alts, _ = oracle.narrow(
            self.md, self.cfg, path, text, cands, definite, from_shebang, html=None
        )
        return lang, alts


_STATE: dict[tuple, _KernelState] = {}


def _state(cfg: QualityFilterConfig) -> _KernelState:
    key = (cfg,)
    st = _STATE.get(key)
    if st is None:
        st = _KernelState(cfg)
        _STATE[key] = st
    return st


# Batch-level implementation, shared by the pandas UDF and unit tests.
def classify_batch(
    path: pd.Series, text: pd.Series, cfg: QualityFilterConfig
) -> pd.DataFrame:
    st = _state(cfg)
    md = st.md
    n = len(path)

    low = path.str.lower()
    base = low.str.rsplit("/", n=1).str[-1]
    # first line: cheap columnar slice, analog of read-file.ts:7-18
    first_line = text.fillna("").str.split("\n", n=1).str[0]

    has_shebang = (
        first_line.str.match(r"#!", na=False) if cfg.check_shebang else pd.Series(False, index=path.index)
    )
    has_modeline = (
        first_line.str.contains(oracle.MODELINE_GATE_PAT, regex=True, na=False)
        if cfg.check_modeline
        else pd.Series(False, index=path.index)
    )
    firstline_mask = (~cfg.quick) & (has_shebang | has_modeline) & text.notna()

    # C4: filename map (vectorized dict lookup)
    fname_langs = base.map(st.filename_map)

    # C5: extension map — suffix keys at 1 and 2 dots (all snapshot exts have
    # <=2 dots; complex-ext priority == "2-dot suffix hit wins")
    s1 = low.str.extract(r"(\.[^/.]+)$", expand=False)
    s2 = low.str.extract(r"((?:\.[^/.]+){2})$", expand=False)
    ext1_langs = s1.map(st.ext_map)
    ext2_langs = s2.map(st.ext_map)

    out_cands: list[list] = [None] * n
    out_definite = [False] * n
    out_shebang = [False] * n

    path_l = path.tolist()
    text_l = text.tolist()
    fname_l = fname_langs.tolist()
    e1_l = ext1_langs.tolist()
    e2_l = ext2_langs.tolist()
    fm_l = firstline_mask.tolist()

    for i in range(n):
        if fm_l[i]:
            # C2/C3 slow path: shebang/modeline rows only. oracle.classify
            # runs the whole C1-C7 cascade, so its result is authoritative
            # even when the first-line markers match no language
            # (src/index.ts:264-273 fall-through included).
            cands, definite, fsb = st.classify_slow(path_l[i], text_l[i])
            out_cands[i], out_definite[i], out_shebang[i] = cands, definite, fsb
            continue
        fl = fname_l[i]
        if isinstance(fl, list):
            out_cands[i] = fl
            continue
        cl = e2_l[i] if isinstance(e2_l[i], list) else e1_l[i]
        out_cands[i] = cl if isinstance(cl, list) else [None]

    # C8/C9 narrowing. Heuristic rows are bucketed by (ext, candidates) —
    # both constant per suffix/filename key — so rule applicability folds
    # once per bucket and pattern matching runs vectorized per bucket
    # (Series.str.contains with driver-compiled regexes). Only shebang rows
    # (ext gate bypassed, src/index.ts:322) take the per-row oracle path.
    # extname semantics matching oracle.extname wherever the result could be
    # a heuristic ext: final .ext of the basename, '' for leading-dot names
    ext_series = base.str.extract(r"(?<=[^/])(\.[^./]+)$", expand=False).fillna("")
    ext_l = ext_series.tolist()

    langs: list = [None] * n
    alts: list = [[]] * n
    buckets: dict[tuple, list[int]] = {}
    for i in range(n):
        cands = out_cands[i]
        if out_definite[i]:
            langs[i] = cands[0]
            continue
        if st.cfg.check_heuristics and out_shebang[i]:
            langs[i], alts[i] = st.narrow_slow(
                path_l[i], text_l[i], cands, False, True
            )
            continue
        if (
            st.cfg.check_heuristics
            and ext_l[i] in st.heuristic_exts
            and text_l[i] is not None
            and st.needs_heuristics(ext_l[i], tuple(cands))
        ):
            buckets.setdefault((ext_l[i], tuple(cands)), []).append(i)
            continue
        # No rule program can change the answer (none applicable, or every
        # applicable rule's language == the single candidate): first
        # candidate wins without a regex pass — and the pipeline ships no
        # text for these rows (content_needing_exts uses the same test).
        langs[i] = cands[0]
        alts[i] = list(cands[1:])

    for (ext, cands), idxs in buckets.items():
        prog = st.rule_program(ext, cands)
        default_lang = cands[0]
        default_alts = list(cands[1:])
        if not prog:
            for i in idxs:
                langs[i] = default_lang
                alts[i] = default_alts
            continue
        texts = pd.Series([text_l[i] for i in idxs])
        m = len(idxs)
        res: list = [None] * m
        honest = st.cfg.honest_heuristics

        def _or_mask(patterns):
            matched = None
            for pat in patterns:
                mm = _contains(texts, pat)
                matched = mm if matched is None else (matched | mm)
            return matched

        for group in prog:
            undecided = [True] * m
            grp_res: list = [None] * m
            for lang, rule in group:
                if not any(undecided):
                    break
                if honest:
                    matched = None
                    for grp_pats in rule["and_groups"]:
                        gm = _or_mask(grp_pats)
                        matched = gm if matched is None else (matched & gm)
                    for pat in rule["negatives"]:
                        nm = ~_contains(texts, pat)
                        matched = nm if matched is None else (matched & nm)
                    if matched is None:  # pattern-free rule
                        for j in range(m):
                            if undecided[j]:
                                grp_res[j] = lang
                                undecided[j] = False
                        continue
                else:
                    if not rule["patterns"]:
                        for j in range(m):
                            if undecided[j]:
                                grp_res[j] = lang
                                undecided[j] = False
                        continue
                    matched = _or_mask(rule["patterns"])
                mt = matched.tolist()
                for j in range(m):
                    if undecided[j] and mt[j]:
                        grp_res[j] = lang
                        undecided[j] = False
            for j in range(m):
                if grp_res[j] is not None:
                    res[j] = grp_res[j]  # later group overwrites (quirk)
        for j, i in enumerate(idxs):
            if res[j] is not None:
                langs[i] = res[j]
                alts[i] = []
            else:
                langs[i] = default_lang
                alts[i] = default_alts

    return pd.DataFrame(
        {
            "lang": pd.Series(langs, dtype=object),
            "alternatives": pd.Series(alts, dtype=object),
            "definite": out_definite,
            "from_shebang": out_shebang,
        }
    )


def content_needing_exts(cfg: QualityFilterConfig) -> list[str]:
    """Extensions whose rows can actually consume text in the kernel: the
    bucket path only runs for multi-candidate rows with a non-empty rule
    program, so the pipeline can null out the text column for every other
    row before the Arrow transfer (the UDF's only other text consumers —
    shebang/modeline rows — are gated separately on the first line).

    Candidate sets per bucket ext come from three places, all enumerable at
    driver time: the ext map itself, filename-map hits (bucketed by the
    basename's final ext), and complex 2-dot suffix hits (bucketed by the
    final 1-dot ext)."""
    import re

    st = _state(cfg)
    out: set[str] = set()

    def consider(ext: str, cands: list) -> None:
        if ext in st.heuristic_exts and st.needs_heuristics(ext, tuple(cands)):
            out.add(ext)

    for ext, cands in st.ext_map.items():
        if ext.count(".") >= 2:
            consider("." + ext.rsplit(".", 1)[1], cands)
        else:
            consider(ext, cands)
    for name, cands in st.filename_map.items():
        m = re.search(r"(?<=[^/])(\.[^./]+)$", name)
        if m:
            consider(m.group(1), cands)
    return sorted(out)


def make_classify_udf(cfg: QualityFilterConfig):
    """Returns a pandas UDF (path, text) -> struct(lang, alternatives,
    definite, from_shebang).

    Marked non-deterministic AS AN OPTIMIZER BARRIER (the kernel is in fact
    pure): predicate pushdown substitutes deterministic project aliases into
    filter conditions, so a downstream `filter(keep)` would otherwise inline
    the whole UDF expression into the Filter and ExtractPythonUDFs would
    then plan TWO ArrowEvalPython stages (one for the filter, one for the
    output projection) — re-running the most expensive kernel per row. The
    flag pins the UDF in its single projection; filters stay above it and
    reference plain attributes (tests/test_plans.py::test_entry_rollup_is_
    single_pass asserts the resulting plan shape)."""

    @F.pandas_udf(CLASSIFY_SCHEMA)
    def classify_udf(path: pd.Series, text: pd.Series) -> pd.DataFrame:
        return classify_batch(path, text, cfg)

    return classify_udf.asNondeterministic()
