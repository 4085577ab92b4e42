#!/usr/bin/env python
"""Round-3 widening, batch 5: resurrect dead rules + remaining priority
groups (VERDICT r02 item 4 follow-through).

Batch 3 shipped `.pm`/`.t` groups whose Raku rules were DEAD — Raku never
claimed those extensions, and classify gates rules to the candidate set
(linguistjs_spark/operators/classify.py rule_program). This batch makes
Raku/Turing real candidates, adds the upstream `.pl` Raku rule, and fills
the remaining recallable upstream groups: `.cp` (Component Pascal/C++),
`.g` (GAP/G-code), `.tst` (GAP/Scilab). `.ch` (xBase) and `.ts` (XML's
Qt-translation rule, dead for the same candidacy reason) ride along.

Provenance matches widen_heuristics3.py: every language entry re-encodes
PUBLIC github-linguist languages.yml facts; heuristic patterns are
upstream's where recalled exactly, otherwise conservative derivations
marked in-line. Reference consumes the same datasets at runtime
(/root/reference/src/index.ts:38-41).

Run:  python scripts/widen_heuristics5.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

NEW_LANGS: dict[str, dict] = {
    "Component Pascal": {"type": "programming", "color": "#B0CE4E",
                         "extensions": [".cp", ".cps"]},
}

EXT_ADD: dict[str, list[str]] = {
    "Raku": [".pl", ".pm", ".t", ".rakutest"],
    "Turing": [".t"],
    "xBase": [".ch"],       # single-candidate: no group needed
    "C++": [".cp"],
    "G-code": [".g"],
    "GAP": [".g", ".tst"],
    "Scilab": [".tst"],
    "XML": [".ts"],         # Qt translation files; makes the existing
                            # .ts group's XML rule a live candidate
}

_RAKU = r"^\s*(?:use\s+v6\b|\bmodule\b|\bmy\s+class\b)"

# full-group replacements (existing keys whose rule sets change)
REPLACE_GROUPS: list[dict] = [
    {"extensions": [".pl"], "rules": [
        {"language": "Prolog", "pattern": r"^[^#]*:-"},
        {"language": "Perl", "named_pattern": "perl"},
        {"language": "Raku", "pattern": _RAKU},
    ]},
    {"extensions": [".t"], "rules": [
        {"language": "Perl", "named_pattern": "perl"},
        {"language": "Raku", "pattern": _RAKU},
        {"language": "Turing",
         "pattern": r"^\s*%[ \t]+|^\s*var\s+\w+(\s*:\s*\w+)?\s*:=\s*\w+"},
    ]},
]

NEW_GROUPS: list[dict] = [
    {"extensions": [".cp"], "rules": [
        {"language": "Component Pascal",
         "pattern": r"^\s*(?i:MODULE|DEFINITION)\b"},
        {"language": "C++", "named_pattern": "cpp"},
    ]},
    {"extensions": [".g"], "rules": [
        {"language": "GAP",
         "pattern": r"\s*(Declare|BindGlobal|KeyDependentOperation)"},
        {"language": "G-code", "pattern": r"^[MG][0-9]+(?:\r?\n|\r)"},
    ]},
    {"extensions": [".tst"], "rules": [
        {"language": "GAP", "pattern": r"gap> "},
        {"language": "Scilab"},  # derived: explicit pattern-free fallback
    ]},
]


def load() -> tuple[dict, dict]:
    with open(os.path.join(DATA, "languages.json")) as f:
        langs = json.load(f)
    with open(os.path.join(DATA, "heuristics.json")) as f:
        heur = json.load(f)
    return langs, heur


def merged() -> tuple[dict, dict, list[str]]:
    langs, heur = load()
    cur = langs["languages"]
    skipped: list[str] = []
    for name in sorted(NEW_LANGS):
        if name in cur:
            skipped.append(name)
            continue
        cur[name] = NEW_LANGS[name]
    for name, exts in EXT_ADD.items():
        meta = cur[name]
        for e in exts:
            if e not in meta.setdefault("extensions", []):
                meta["extensions"].append(e)
    langs["languages"] = {k: cur[k] for k in sorted(cur)}

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}
    for g in REPLACE_GROUPS:
        if tuple(g["extensions"]) not in by_key:
            skipped.append("missing-replace:" + ",".join(g["extensions"]))
        by_key[tuple(g["extensions"])] = g
    for g in NEW_GROUPS:
        key = tuple(g["extensions"])
        if key in by_key:
            skipped.append("group:" + ",".join(key))
        by_key[key] = g
    heur["disambiguations"] = [by_key[k] for k in sorted(by_key)]
    return langs, heur, skipped


def validate(langs: dict, heur: dict) -> list[str]:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from linguistjs_spark.pcre import compile_pcre

    problems: list[str] = []
    cur = langs["languages"]
    ext_map: dict[str, list[str]] = {}
    for name, meta in cur.items():
        for e in meta.get("extensions", []):
            ext_map.setdefault(e.lower(), []).append(name)

    named = heur["named_patterns"]
    grouped: set[str] = set()
    for g in heur["disambiguations"]:
        grouped.update(g["extensions"])
        raw = {c for e in g["extensions"] for c in ext_map.get(e, [])}
        cands = raw | {cur[c].get("group") for c in raw if c in cur}
        for rule in g["rules"]:
            lang = rule["language"]
            if lang not in cur:
                problems.append(f"rule language not in snapshot: {lang}")
                continue
            if lang not in cands and cur[lang].get("group") not in cands:
                problems.append(
                    f"DEAD rule: {lang} not a candidate for {g['extensions']}"
                )
            pats = []
            for key in ("pattern", "negative_pattern"):
                v = rule.get(key)
                if v:
                    pats.extend([v] if isinstance(v, str) else v)
            if rule.get("named_pattern"):
                v = named[rule["named_pattern"]]
                pats.extend([v] if isinstance(v, str) else v)
            for p in pats:
                try:
                    compile_pcre(p)
                except Exception as exc:  # noqa: BLE001
                    problems.append(f"pattern fails to compile: {p!r}: {exc}")
    touched = set(NEW_LANGS) | set(EXT_ADD)
    for ext, cands in sorted(ext_map.items()):
        if len(cands) > 1 and ext not in grouped and touched & set(cands) \
                and ext not in {".cgi", ".fcgi"}:
            problems.append(f"contested ext without group: {ext} -> {cands}")
    return problems


if __name__ == "__main__":
    langs, heur, skipped = merged()
    problems = validate(langs, heur)
    for p in problems:
        print(p)
    if skipped:
        print(f"notes: {skipped}")
    print(
        f"{len(langs['languages'])} languages, "
        f"{len(heur['disambiguations'])} disambiguation groups after merge"
    )
    if problems:
        sys.exit(1)
    if "--write" in sys.argv:
        with open(os.path.join(DATA, "languages.json"), "w") as f:
            json.dump(langs, f, indent=1, sort_keys=False)
            f.write("\n")
        with open(os.path.join(DATA, "heuristics.json"), "w") as f:
            json.dump(heur, f, indent=1, sort_keys=False)
            f.write("\n")
        print("written")
