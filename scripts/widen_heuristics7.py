#!/usr/bin/env python
"""Round-3 widening, batch 7: 7 more disambiguation groups toward
upstream github-linguist's ~150 (VERDICT r02 item 4, "what's missing" #1).

Earlier batches left `.b`, `.j`, `.moo`, `.nu`, `.scm`, `.ttl` with a
single snapshot claimant each, so the upstream contest on those
extensions was invisible to the validator. This batch adds the second
public claimant for each (Brainfuck `.b`, Objective-J `.j`, Moocode
`.moo`, Nu `.nu`, Tree-sitter Query `.scm`, Tera Term macro `.ttl`,
Mask + Unity3D Asset `.mask`) and the content-disambiguation group.

Provenance matches widen_heuristics3/5/6: every language entry re-encodes
PUBLIC github-linguist languages.yml facts (pruned to the claims needed
here); heuristic patterns are upstream's where recalled exactly, otherwise
conservative DERIVED discriminators marked in-line. The reference consumes
the same public datasets at runtime (/root/reference/src/index.ts:38-41).
Groups whose discriminators could not be recalled or derived with
confidence (`.lean` Lean 4, `.lp`, `.pic`, `.gsc`, `.app`) are omitted
rather than invented — same stance as batches 4/6.

Run:  python scripts/widen_heuristics7.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

NEW_LANGS: dict[str, dict] = {
    "Objective-J": {"type": "programming", "color": "#ff0c5a",
                    "aliases": ["obj-j", "objectivej", "objj"],
                    "extensions": [".j", ".sj"]},
    "Moocode": {"type": "programming", "aliases": ["moo"],
                "extensions": [".moo"]},
    "Nu": {"type": "programming", "color": "#c9df40", "aliases": ["nush"],
           "extensions": [".nu"], "filenames": ["Nukefile"]},
    "Tree-sitter Query": {"type": "programming", "color": "#8ea64c",
                          "aliases": ["tsq"], "extensions": [".scm"]},
    "Tera Term macro": {"type": "programming", "color": "#2acca8",
                        "aliases": ["ttl"], "extensions": [".ttl"]},
    "Mask": {"type": "markup", "color": "#f97732", "extensions": [".mask"]},
}

EXT_ADD: dict[str, list[str]] = {
    # upstream Brainfuck claims .b alongside .bf
    "Brainfuck": [".b"],
    # the snapshot's existing Nu entry was pruned to filenames only;
    # upstream Nu claims .nu (the contested half of the Nushell group)
    "Nu": [".nu"],
    # upstream Unity3D Asset claims .mask (serialized avatar masks) —
    # the snapshot carries its other extensions already
    "Unity3D Asset": [".mask"],
}

NEW_GROUPS: list[dict] = [
    {"extensions": [".b"], "rules": [
        # upstream Brainfuck discriminator (same as the .bf group)
        {"language": "Brainfuck", "pattern": r"(>\+>|>\+<)"},
        # upstream: Limbo modules open with `implement Name;`
        {"language": "Limbo", "pattern": r"^implement[ \t]"},
    ]},
    {"extensions": [".j"], "rules": [
        # DERIVED: Objective-J @-directives (superset of Objective-C's,
        # plus @import which is distinctive in .j files)
        {"language": "Objective-J",
         "pattern": r"@(?:implementation|interface|protocol|import|end)\b"},
        # DERIVED: Jasmin assembler directives at line start
        {"language": "Jasmin",
         "pattern": r"^\s*\.(?:class|super|method|field|limit)\b"},
    ]},
    {"extensions": [".moo"], "rules": [
        # upstream-shaped: Mercury module declaration (same discriminator
        # the .m group uses)
        {"language": "Mercury", "pattern": r"^\s*:-\s*module\b"},
        {"language": "Moocode"},
    ]},
    {"extensions": [".nu"], "rules": [
        # DERIVED: Nushell top-level command/def forms; Nu (Lisp-like)
        # scripts open with parens or semicolon comments instead
        {"language": "Nushell",
         "pattern": r"^\s*(?:def\s|export\s+(?:def|use|env)\b|use\s|"
                    r"source-env\s|let-env\s|let\s+\$?\w+\s*=)"},
        {"language": "Nu"},
    ]},
    {"extensions": [".scm"], "rules": [
        # DERIVED: tree-sitter query predicate syntax `(#eq? ...)` —
        # `(#` never opens a form in Scheme (vectors are `#(`)
        {"language": "Tree-sitter Query",
         "pattern": r"\(#(?:eq|not-eq|match|not-match|any-of|not-any-of|"
                    r"is|is-not|set)\??"},
        {"language": "Scheme"},
    ]},
    {"extensions": [".ttl"], "rules": [
        # upstream-shaped: Turtle/SPARQL prologue declarations
        {"language": "Turtle",
         "pattern": r"^\s*@(?:base|prefix)\b|^\s*(?:PREFIX|BASE)\s+[\w<]"},
        # DERIVED: Tera Term macro command verbs at line start
        {"language": "Tera Term macro",
         "pattern": r"(?i)^\s*(?:connect|sendln|wait(?:ln|recv)?|pause|"
                    r"messagebox|logopen|username|hostname)\b"},
    ]},
    {"extensions": [".mask"], "rules": [
        # upstream-shaped: every serialized Unity asset carries the
        # unity3d.com YAML tag header
        {"language": "Unity3D Asset", "pattern": r"tag:unity3d\.com"},
        {"language": "Mask"},
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

    def rule_pats(rule: dict) -> list[str]:
        pats = []
        for key in ("pattern", "negative_pattern"):
            v = rule.get(key)
            if v:
                pats.extend([v] if isinstance(v, str) else v)
        if rule.get("named_pattern"):
            v = named[rule["named_pattern"]]
            pats.extend([v] if isinstance(v, str) else v)
        for sub in rule.get("and", []):
            pats.extend(rule_pats(sub))
        return pats

    for g in heur["disambiguations"]:
        grouped.update(g["extensions"])
        raw = {c for e in g["extensions"] for c in ext_map.get(e, [])}
        cands = raw | {
            grp for grp in (cur[c].get("group") for c in raw if c in cur)
            if grp
        }
        for rule in g["rules"]:
            lang = rule["language"]
            if lang not in cur:
                problems.append(f"rule language not in snapshot: {lang}")
                continue
            if lang not in cands and cur[lang].get("group") not in cands:
                problems.append(
                    f"DEAD rule: {lang} not a candidate for {g['extensions']}"
                )
            for p in rule_pats(rule):
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
