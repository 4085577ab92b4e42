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

import pandas as pd
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
        first_line.str.contains(r"-\*-|(?:syntax|filetype|ft)\s*=", regex=True, na=False)
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

    # C8/C9 narrowing: heuristics only where the ext gate (or shebang bypass)
    # makes them reachable; plain default-first-candidate elsewhere.
    langs: list = [None] * n
    alts: list = [[]] * n
    for i in range(n):
        cands = out_cands[i]
        if out_definite[i]:
            langs[i] = cands[0]
            continue
        ext = oracle.extname(path_l[i]).lower()
        if st.cfg.check_heuristics and (
            out_shebang[i] or ext in st.heuristic_exts
        ):
            langs[i], alts[i] = st.narrow_slow(
                path_l[i], text_l[i], cands, False, out_shebang[i]
            )
        else:
            langs[i] = cands[0]
            alts[i] = list(cands[1:])

    return pd.DataFrame(
        {
            "lang": pd.Series(langs, dtype=object),
            "alternatives": pd.Series(alts, dtype=object),
            "definite": out_definite,
            "from_shebang": out_shebang,
        }
    )


def make_classify_udf(cfg: QualityFilterConfig):
    """Returns a pandas UDF (path, text) -> struct(lang, alternatives,
    definite, from_shebang)."""

    @F.pandas_udf(CLASSIFY_SCHEMA)
    def classify_udf(path: pd.Series, text: pd.Series) -> pd.DataFrame:
        return classify_batch(path, text, cfg)

    return classify_udf
