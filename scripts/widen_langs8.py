#!/usr/bin/env python
"""Round-3 widening, batch 8: ~35 long-tail languages toward upstream
github-linguist's ~700 (VERDICT r02 "what's missing" #2), plus the two
disambiguation groups they create (`.mo` Motoko/Modelica, `.rsc`
RouterOS Script/Rascal), an Apex rule in the existing `.cls` group, and
an NCL fallback rule in the existing `.ncl` group.

Provenance matches widen_snapshot/widen_langs4: every entry re-encodes
PUBLIC github-linguist languages.yml facts (pruned to the claims needed
here — multi-ext languages keep only their flagship extensions so no
unintended contests appear); heuristic patterns are upstream's where
recalled exactly, otherwise conservative DERIVED discriminators marked
in-line. Languages whose metadata could not be recalled with confidence
(Adblock Filter List, SELinux Policy, XPages, Python console, Quake,
Parrot, Kickstart, Nasal, Rez, Terra) are omitted rather than invented.

Run:  python scripts/widen_langs8.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

NEW_LANGS: dict[str, dict] = {
    "F*": {"type": "programming", "color": "#572e30", "aliases": ["fstar"],
           "extensions": [".fst", ".fsti"]},
    "HAProxy": {"type": "data", "aliases": ["haproxy.cfg"],
                "filenames": ["haproxy.cfg"]},
    "HOCON": {"type": "data", "extensions": [".hocon"]},
    "Just": {"type": "programming", "aliases": ["justfile"],
             "filenames": ["justfile", "Justfile", ".justfile"]},
    "Kaitai Struct": {"type": "programming", "color": "#773b37",
                      "aliases": ["ksy"], "extensions": [".ksy"]},
    "Latte": {"type": "markup", "color": "#f2a542", "extensions": [".latte"]},
    "MDX": {"type": "markup", "color": "#fcb32c", "extensions": [".mdx"]},
    "Motoko": {"type": "programming", "color": "#fbb03b",
               "extensions": [".mo"]},
    "Ninja": {"type": "data", "extensions": [".ninja"]},
    "Promela": {"type": "programming", "color": "#de0000",
                "extensions": [".pml"]},
    "RMarkdown": {"type": "prose", "color": "#198ce7",
                  "extensions": [".rmd", ".qmd"]},
    "Tact": {"type": "programming", "color": "#48b5ff",
             "extensions": [".tact"]},
    "Talon": {"type": "programming", "color": "#333333",
              "extensions": [".talon"]},
    "Toit": {"type": "programming", "color": "#c2c9fb",
             "extensions": [".toit"]},
    "VCL": {"type": "programming", "color": "#148AA8",
            "extensions": [".vcl"]},
    "Gemini": {"type": "prose", "color": "#ff6900",
               "aliases": ["gemtext"], "extensions": [".gmi"]},
    "Gradle Kotlin DSL": {"type": "data", "group": "Gradle",
                          "filenames": ["build.gradle.kts",
                                        "settings.gradle.kts"]},
    "Ink": {"type": "programming", "extensions": [".ink"]},
    "Mirah": {"type": "programming", "color": "#c7a938",
              "aliases": ["mirah"], "extensions": [".mirah", ".duby"]},
    "Muse": {"type": "prose", "aliases": ["amusewiki", "emacs muse"],
             "extensions": [".muse"]},
    "Myghty": {"type": "programming", "extensions": [".myt"]},
    "Oberon": {"type": "programming", "extensions": [".ob2"]},
    "Polar": {"type": "programming", "color": "#ae81ff",
              "extensions": [".polar"]},
    "Pyret": {"type": "programming", "color": "#ee1e10",
              "extensions": [".arr"]},
    "Redcode": {"type": "programming", "extensions": [".cw"]},
    "Riot": {"type": "markup", "color": "#A71E49",
             "extensions": [".riot"]},
    "RouterOS Script": {"type": "programming", "aliases": ["routeros"],
                        "extensions": [".rsc"]},
    "Scaml": {"type": "markup", "group": "HTML", "extensions": [".scaml"]},
    "Scenic": {"type": "programming", "color": "#fdc700",
               "extensions": [".scenic"]},
    "Singularity": {"type": "programming", "color": "#64E6AD",
                    "filenames": ["Singularity"]},
    "TL-Verilog": {"type": "programming", "color": "#C40023",
                   "extensions": [".tlv"]},
    "mIRC Script": {"type": "programming", "color": "#3d57c3",
                    "extensions": [".mrc"]},
    "Xojo": {"type": "programming", "color": "#81bd41",
             "extensions": [".xojo_code", ".xojo_window", ".xojo_menu"]},
    # upstream Apex also claims .trigger, pruned here: the snapshot's
    # Shell entry already owns .trigger and upstream has no content
    # discriminator for that pair to re-encode
    "Apex": {"type": "programming", "color": "#1797c0",
             "extensions": [".cls", ".apex"]},
    "NCL": {"type": "programming", "color": "#28431f",
            "extensions": [".ncl"]},
}

NEW_GROUPS: list[dict] = [
    {"extensions": [".mo"], "rules": [
        # DERIVED: Motoko's actor/actor-class forms are unique to it;
        # Modelica keeps everything else (its model/package keywords
        # overlap too much with comments to pattern on safely)
        {"language": "Motoko", "pattern": r"\bactor\b"},
        {"language": "Modelica"},
    ]},
    {"extensions": [".rsc"], "rules": [
        # DERIVED: RouterOS scripts address config paths from line start
        {"language": "RouterOS Script",
         "pattern": r"(?m)^/(?:interface|ip|system|tool|queue|user|"
                    r"certificate|routing)\b"},
        # DERIVED: Rascal compilation units open with module/import
        {"language": "Rascal",
         "pattern": r"^\s*(?:module|import|start\s+syntax)\s"},
    ]},
]

# rules appended to EXISTING groups (language, after-merge the group's
# rule list keeps upstream-ish order: specific patterns before fallbacks)
APPEND_RULES: dict[str, list[dict]] = {
    ".cls": [
        # DERIVED: Apex class headers carry sharing/access modifiers no
        # other .cls claimant uses
        {"language": "Apex",
         "pattern": r"(?i)^\s*(?:public|global|private)\s+"
                    r"(?:(?:virtual|abstract|with\s+sharing|"
                    r"without\s+sharing)\s+)*class\s"},
    ],
    ".ncl": [
        # NCL scripts: load/begin or typed declarations; fallback position
        # (after XML/Text) mirrors upstream's ordering
        {"language": "NCL"},
    ],
}


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
    langs["languages"] = {k: cur[k] for k in sorted(cur)}

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}
    for g in NEW_GROUPS:
        key = tuple(g["extensions"])
        if key in by_key:
            skipped.append("group:" + ",".join(key))
        by_key[key] = g
    for ext, rules in APPEND_RULES.items():
        target = next(g for g in by_key.values() if ext in g["extensions"])
        have = {r["language"] for r in target["rules"]}
        for r in rules:
            if r["language"] in have:
                skipped.append("rule:" + r["language"])
                continue
            if "pattern" in r:
                # patterned rules go before the first pattern-less fallback
                idx = next(
                    (i for i, x in enumerate(target["rules"])
                     if "pattern" not in x and "named_pattern" not in x
                     and "and" not in x),
                    len(target["rules"]),
                )
                target["rules"].insert(idx, r)
            else:
                target["rules"].append(r)
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
    touched = set(NEW_LANGS)
    for ext, cands in sorted(ext_map.items()):
        if len(cands) > 1 and ext not in grouped and touched & set(cands) \
                and ext not in {".cgi", ".fcgi"}:
            problems.append(f"contested ext without group: {ext} -> {cands}")
    # group parents referenced by new entries must exist (C7 collapse)
    for name in NEW_LANGS:
        grp = cur.get(name, {}).get("group")
        if grp and grp not in cur:
            problems.append(f"group parent missing: {name} -> {grp}")
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
