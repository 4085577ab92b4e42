#!/usr/bin/env python
"""Round-3 widening, batch 12: enrich the `.inc` disambiguation group to
upstream membership. github-linguist's languages.yml lists `.inc` under
Assembly, Pascal, POV-Ray SDL, BitBake, SourcePawn, and NASL alongside
PHP/SQL (all already in this snapshot; their `.inc` claims were pruned
in earlier batches because the group lacked rules for them). `.inc` is a
hot extension in web-hosted code, so falling to first-candidate there is
a real misclassification source.

All six discriminators are DERIVED conservative patterns (marked inline)
keyed on constructs unique to each language — NASM macro/section
directives, Pascal `{$...}` compiler directives, POV-Ray `#declare`,
BitBake assignments, SourcePawn include-guard idioms, NASL `script_*`
calls — appended AFTER the existing PHP/SQL rules so prior
classifications are unchanged unless the doc matches nothing today.

Run:  python scripts/widen_langs12.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

EXT_APPEND: dict[str, list[str]] = {
    "Pascal": [".inc"],
    "POV-Ray SDL": [".inc"],
    "BitBake": [".inc"],
    "SourcePawn": [".inc"],
    "NASL": [".inc"],
    # Assembly already claims .inc (no rule until now)
}

APPEND_RULES: dict[str, list[dict]] = {
    ".inc": [
        # DERIVED: NASM macro/section directives
        {"language": "Assembly",
         "pattern": r"(?m)^\s*(%macro\s+\w|section\s+\.(text|data|bss)\b)"},
        # DERIVED: Pascal {$...} compiler directives
        {"language": "Pascal",
         "pattern": r"(?im)^\s*\{\$(i|ifdef|ifndef|mode|define)\b"},
        # DERIVED: POV-Ray scene-description declarations
        {"language": "POV-Ray SDL",
         "pattern": r"(?m)^\s*#(declare|local|macro)\s"},
        # DERIVED: BitBake variable assignments / inherit
        {"language": "BitBake",
         "pattern": r"(?m)^\s*(SRC_URI|DEPENDS|RDEPENDS|LICENSE)\s*\+?=|"
                    r"(?m)^inherit\s+\w"},
        # DERIVED: SourcePawn include-guard / declaration idioms
        {"language": "SourcePawn",
         "pattern": r"(?m)^\s*(#if\s+defined\s+_\w+_included|#endinput\b|"
                    r"(stock|native|forward)\s+\w)"},
        # DERIVED: NASL plugin boilerplate
        {"language": "NASL",
         "pattern": r"(?m)^\s*script_(name|id|version|oid)\s*\("},
    ],
}


def merged() -> tuple[dict, dict]:
    with open(os.path.join(DATA, "languages.json")) as f:
        langs = json.load(f)
    with open(os.path.join(DATA, "heuristics.json")) as f:
        heur = json.load(f)
    cur = langs["languages"]
    for name, exts in EXT_APPEND.items():
        have = set(cur[name].get("extensions", []))
        cur[name].setdefault("extensions", []).extend(
            e for e in exts if e not in have
        )
    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}
    for ext, rules in APPEND_RULES.items():
        target = next(g for g in by_key.values() if ext in g["extensions"])
        have = {r["language"] for r in target["rules"]}
        for r in rules:
            if r["language"] not in have:
                target["rules"].append(r)
    heur["disambiguations"] = [by_key[k] for k in sorted(by_key)]
    return langs, heur


def main() -> None:
    langs, heur = merged()
    sys.path.insert(0, os.path.dirname(__file__))
    import widen_langs9 as w9

    w9.NEW_LANGS = {}
    w9.EXT_APPEND = EXT_APPEND
    problems = w9.validate(langs, heur)
    for p in problems:
        print(p)
    print(
        f"{len(langs['languages'])} languages, "
        f"{len(heur['disambiguations'])} groups; .inc rules: "
        f"{[r['language'] for g in heur['disambiguations'] if '.inc' in g['extensions'] for r in g['rules']]}"
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


if __name__ == "__main__":
    main()
