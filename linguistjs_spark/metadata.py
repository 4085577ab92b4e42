"""Pinned metadata snapshot loader.

Analog of the reference's metadata load + offline mode
(/root/reference/src/index.ts:37-43, src/helpers/load-data.ts:8-33): instead of
fetching languages.yml / vendor.yml / documentation.yml / heuristics.yml /
generated.rb from the network at runtime, we commit a pruned snapshot as JSON
under ``linguistjs_spark/data/`` and load it once on the driver. Executors see
it only through broadcast state — no executor network or filesystem I/O.

Everything order-sensitive in the reference (languages.yml key order drives
candidate ordering, src/index.ts:275-300; heuristic rule order drives
first-match-wins, src/index.ts:359) is preserved via JSON object order.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from functools import lru_cache

from .pcre import compile_pcre

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _load_json(name: str) -> dict:
    """Load a snapshot file. importlib.resources (not a bare open on a
    __file__-relative path) so the package also works imported from the
    spark-submit --py-files zip, where data/ is inside the archive."""
    try:
        from importlib import resources

        ref = resources.files(__package__) / "data" / name
        return json.loads(ref.read_text(encoding="utf-8"))
    except (FileNotFoundError, ModuleNotFoundError, TypeError):
        with open(os.path.join(_DATA_DIR, name), "r", encoding="utf-8") as fh:
            return json.load(fh)


def glob_to_regex(glob: str) -> str:
    """Convert a gitignore-style glob to an anchored regex over a rel path.

    Mirrors the matching semantics the reference gets from the ``ignore`` npm
    package (src/index.ts:62-63): a pattern without ``/`` matches at any depth;
    a trailing ``/`` matches a directory prefix; ``**`` crosses slashes,
    ``*``/``?`` do not.
    """
    g = glob.strip()
    dir_only = g.endswith("/")
    if dir_only:
        g = g[:-1]
    anchored = "/" in g.rstrip("/")
    if g.startswith("/"):
        g = g[1:]
        anchored = True

    out = []
    i = 0
    while i < len(g):
        c = g[i]
        if c == "*":
            if g[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c in ".+()[]{}^$\\|":
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    body = "".join(out)
    # "(^|/)" not "(^|.*/)": every consumer applies these with search
    # semantics (rlike / re.search), where the two are existence-equivalent
    # — and the ".*/" branch re-consumed the whole path from every start
    # position (O(len^2): one 100KB url cost ~6s per glob in both engines)
    prefix = "^" if anchored else "(^|/)"
    # gitignore: a matching directory name also ignores everything beneath it
    return f"{prefix}{body}(/.*)?$"


@dataclass
class Metadata:
    """All broadcastable rule state, pre-compiled once on the driver."""

    languages: dict[str, dict]                      # name -> meta, ordered
    lang_order: dict[str, int]                      # name -> position
    alias_to_lang: dict[str, str]                   # lowercase alias -> name
    group_of: dict[str, str]                        # child -> group parent
    filename_map: dict[str, list[str]]              # lowercase filename -> langs
    ext_map: dict[str, list[str]]                   # lowercase ext -> langs
    interpreter_langs: list[tuple[str, re.Pattern, str]]  # (interp, rx, lang)
    modeline_langs: list[tuple[re.Pattern, str]]    # (name/alias matcher, lang)
    disambiguations: list[dict]                     # compiled heuristic groups
    vendor_res: list[re.Pattern]
    documentation_res: list[re.Pattern]
    generated_res: list[re.Pattern]
    binary_exts: frozenset[str]
    default_ignore_res: list[re.Pattern]
    # Pre-joined alternations for native Spark rlike (JVM-side regex)
    vendor_alt: str = ""
    documentation_alt: str = ""
    generated_alt: str = ""
    binary_ext_alt: str = ""

    @property
    def max_ext_dots(self) -> int:
        return max((e.count(".") for e in self.ext_map), default=1)


def _lang_matcher(name: str) -> re.Pattern:
    """Reference langMatcher (src/index.ts:248): \\b<escaped>(?![\\w#+*]|-\\*-)."""
    escaped = re.sub(r"\W", lambda m: "\\" + m.group(0), name.lower())
    return re.compile(r"\b" + escaped + r"(?![\w#+*]|-\*-)")


def _build(child_exclusive: bool = False) -> Metadata:
    langs = _load_json("languages.json")["languages"]
    filters = _load_json("filters.json")
    heur = _load_json("heuristics.json")

    lang_order = {name: i for i, name in enumerate(langs)}
    alias_to_lang: dict[str, str] = {}
    group_of: dict[str, str] = {}
    filename_map: dict[str, list[str]] = {}
    ext_map: dict[str, list[str]] = {}
    interpreter_langs: list[tuple[str, re.Pattern, str]] = []
    modeline_langs: list[tuple[re.Pattern, str]] = []

    for name, meta in langs.items():
        for alias in meta.get("aliases", []):
            alias_to_lang.setdefault(alias.lower(), name)
        if meta.get("group"):
            group_of[name] = meta["group"]
        for fn in meta.get("filenames", []):
            filename_map.setdefault(fn.lower(), []).append(name)
        for ext in meta.get("extensions", []):
            ext_map.setdefault(ext.lower(), []).append(name)
        for interp in meta.get("interpreters", []):
            # reference: firstLine.match(`\b${interpreter}\b`), src/index.ts:251
            interpreter_langs.append(
                (interp, re.compile(r"\b" + re.escape(interp) + r"\b"), name)
            )
        matchers = [_lang_matcher(name)]
        matchers += [_lang_matcher(a) for a in meta.get("aliases", [])]
        for mrx in matchers:
            modeline_langs.append((mrx, name))

    disambiguations = []
    named = heur["named_patterns"]
    for group in heur["disambiguations"]:
        rules = []
        for rule in group["rules"]:
            def _expand(sub) -> tuple[list[str], list[str]]:
                pos: list[str] = []
                neg: list[str] = []

                def _norm(p, into):
                    into.extend([p] if isinstance(p, str) else list(p))

                if sub.get("pattern"):
                    _norm(sub["pattern"], pos)
                if sub.get("named_pattern"):
                    _norm(named[sub["named_pattern"]], pos)
                if sub.get("negative_pattern"):
                    _norm(sub["negative_pattern"], neg)
                return pos, neg

            own_pos, own_neg = _expand(rule)
            and_groups = [own_pos] if own_pos else []
            negatives = list(own_neg)
            flat = list(own_pos)
            for sub in rule.get("and", []):
                sub_pos, sub_neg = _expand(sub)
                if sub_pos:
                    and_groups.append(sub_pos)
                    flat.extend(sub_pos)
                negatives.extend(sub_neg)
            rules.append(
                {
                    "language": rule["language"],
                    # reference-compat form: pattern + named_pattern + and[]
                    # flattened into one OR list, negative_pattern IGNORED —
                    # mirroring src/index.ts:338-348 exactly (the reference
                    # declares negative_pattern in schema.ts:26 but never
                    # reads it; SURVEY.md §2.2 C8 records this delta)
                    "patterns": [compile_pcre(p) for p in flat],
                    # honest form (config.honest_heuristics): every AND group
                    # must match (OR within a group), no negative may match —
                    # upstream github-linguist semantics
                    "and_groups": [
                        [compile_pcre(p) for p in g] for g in and_groups
                    ],
                    "negatives": [compile_pcre(p) for p in negatives],
                }
            )
        disambiguations.append(
            {"extensions": [e.lower() for e in group["extensions"]], "rules": rules}
        )

    def _compile_ci(pats: list[str]) -> list[re.Pattern]:
        # reference compiles all vendor paths with the 'i' flag, src/index.ts:71
        return [re.compile(p, re.IGNORECASE) for p in pats]

    def _alt(pats: list[str]) -> str:
        # one (?i) alternation for JVM-side rlike; non-capturing wrap
        return "(?i)(" + "|".join("(?:%s)" % p for p in pats) + ")"

    binary_exts = frozenset(e.lower() for e in filters["binary_extensions"])
    default_ignore_res = _compile_ci(
        [glob_to_regex(g) for g in filters["default_ignore_globs"]]
    )

    return Metadata(
        languages=langs,
        lang_order=lang_order,
        alias_to_lang=alias_to_lang,
        group_of=group_of,
        filename_map=filename_map,
        ext_map=ext_map,
        interpreter_langs=interpreter_langs,
        modeline_langs=modeline_langs,
        disambiguations=disambiguations,
        vendor_res=_compile_ci(filters["vendor"]),
        documentation_res=_compile_ci(filters["documentation"]),
        generated_res=_compile_ci(filters["generated"]),
        binary_exts=binary_exts,
        default_ignore_res=default_ignore_res,
        vendor_alt=_alt(filters["vendor"]),
        documentation_alt=_alt(filters["documentation"]),
        generated_alt=_alt(filters["generated"]),
        # no ".*" prefix: rlike is an unanchored search, so the prefix is
        # existence-redundant — and under Java's per-start-position retry it
        # made the scan O(len^2) per url (a 50KB adversarial url cost ~60s;
        # the "\." start means the engine only attempts at dots)
        binary_ext_alt="(?i)\\.(" + "|".join(sorted(binary_exts)) + ")$",
    )


@lru_cache(maxsize=1)
def load_metadata() -> Metadata:
    return _build()


@lru_cache(maxsize=1)
def load_scrub_config() -> dict:
    return _load_json("scrub.json")


@lru_cache(maxsize=1)
def load_langid_config() -> dict:
    return _load_json("langid.json")
