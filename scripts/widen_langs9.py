#!/usr/bin/env python
"""Round-3 widening, batch 9: ~30 long-tail languages toward upstream
github-linguist's ~700 (VERDICT r02 "what's missing" #2), plus the
disambiguation groups the new claimants create (`.sch` Eagle/KiCad
Schematic/XML, `.brd` Eagle/KiCad Legacy Layout, `.cue` Cue Sheet/CUE)
and an E rule appended to the existing `.e` (Eiffel/Euphoria) group.

Provenance matches widen_snapshot/widen_langs4/8: every entry re-encodes
PUBLIC github-linguist languages.yml facts (pruned to the claims needed
here); heuristic patterns are upstream's where recalled exactly,
otherwise conservative DERIVED discriminators marked in-line. Languages
whose metadata could not be recalled with confidence (WebAssembly
Interface Type's category, Vim Help File's contested `.txt`, NMODL's
four-way `.mod` contest, Genero, Adblock Filter List, SELinux Policy)
stay omitted rather than invented.

Run:  python scripts/widen_langs9.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

NEW_LANGS: dict[str, dict] = {
    "Altium Designer": {"type": "data", "aliases": ["altium"],
                        "extensions": [".outjob", ".pcbdoc", ".prjpcb",
                                       ".schdoc"]},
    "Answer Set Programming": {"type": "programming", "color": "#A9CC29",
                               "extensions": [".lp"]},
    "Ant Build System": {"type": "data", "filenames": ["ant.xml",
                                                       "build.xml"]},
    "Berry": {"type": "programming", "aliases": ["be"],
              "extensions": [".be"]},
    "BQN": {"type": "programming", "color": "#2b7067",
            "extensions": [".bqn"], "interpreters": ["bqn", "cbqn"]},
    "C-ObjDump": {"type": "data", "extensions": [".c-objdump"]},
    "C2hs Haskell": {"type": "programming", "group": "Haskell",
                     "aliases": ["c2hs"], "extensions": [".chs"]},
    "Checksums": {"type": "data", "aliases": ["checksum", "hash",
                                              "hashes", "sum", "sums"],
                  "filenames": ["MD5SUMS", "SHA1SUMS", "SHA256SUMS",
                                "SHA256SUMS.txt", "SHA512SUMS", "checksums.txt",
                                "cksums", "md5sum.txt"]},
    "COLLADA": {"type": "data", "extensions": [".dae"]},
    "Clarion": {"type": "programming", "color": "#db901e",
                "extensions": [".clw"]},
    "Cpp-ObjDump": {"type": "data", "aliases": ["c++-objdump"],
                    "extensions": [".cppobjdump", ".c++-objdump",
                                   ".cpp-objdump", ".cxx-objdump"]},
    "Cue Sheet": {"type": "data", "extensions": [".cue"]},
    "curl Config": {"type": "data", "aliases": ["curlrc"],
                    "filenames": [".curlrc", "_curlrc"]},
    "D-ObjDump": {"type": "data", "extensions": [".d-objdump"]},
    "DIGITAL Command Language": {"type": "programming", "aliases": ["dcl"],
                                 "extensions": [".com"]},
    "Desktop": {"type": "data", "extensions": [".desktop", ".desktop.in",
                                               ".service"]},
    "E": {"type": "programming", "color": "#ccce35",
          "extensions": [".e"], "interpreters": ["rune"]},
    "Eagle": {"type": "data", "extensions": [".sch", ".brd"]},
    "FIGlet Font": {"type": "data", "aliases": ["FIGfont"],
                    "extensions": [".flf"]},
    "Fancy": {"type": "programming", "color": "#7b9db4",
              "extensions": [".fy", ".fancypack"],
              "filenames": ["Fakefile"], "interpreters": ["fancy"]},
    "GDB": {"type": "programming", "extensions": [".gdb"],
            "filenames": [".gdbinit", "gdbinit"]},
    "GSC": {"type": "programming", "color": "#FF6800",
            "extensions": [".gsc", ".gsh"]},
    "Git Revision List": {"type": "data",
                          "filenames": [".git-blame-ignore-revs"]},
    "Glyph Bitmap Distribution Format": {"type": "data", "aliases": ["bdf"],
                                         "extensions": [".bdf"]},
    "Grain": {"type": "programming", "color": "#fabd2f",
              "extensions": [".gr"]},
    "NPM Config": {"type": "data", "aliases": ["npmrc"],
                   "filenames": [".npmrc"]},
    "OMNeT++ MSG": {"type": "programming", "aliases": ["omnetpp-msg"],
                    "extensions": [".msg"]},
    "OMNeT++ NED": {"type": "programming", "aliases": ["omnetpp-ned"],
                    "extensions": [".ned"]},
    "OpenRC runscript": {"type": "programming", "group": "Shell",
                         "aliases": ["openrc"],
                         "interpreters": ["openrc-run"]},
    # upstream Pic also claims .pic, pruned here: the binary-extensions
    # list the reference consumes (src/index.ts:161) contains "pic", so
    # the reference never classifies those files — .chem is the only
    # reachable claim
    "Pic": {"type": "markup", "group": "Roff", "extensions": [".chem"]},
    "SSH Config": {"type": "data", "aliases": ["sshconfig", "sshdconfig"],
                   "filenames": ["ssh_config", "sshd_config"]},
    "Sail": {"type": "programming", "extensions": [".sail"]},
    "TextGrid": {"type": "data", "aliases": ["praat-textgrid"],
                 "extensions": [".textgrid"]},
    "X Font Directory Index": {"type": "data",
                               "filenames": ["encodings.dir", "fonts.alias",
                                             "fonts.dir", "fonts.scale"]},
}

# extensions appended to EXISTING languages (upstream claims them too and
# the new group below disambiguates)
EXT_APPEND: dict[str, list[str]] = {
    "KiCad Schematic": [".sch"],
}

NEW_GROUPS: list[dict] = [
    {"extensions": [".sch"], "rules": [
        # DERIVED: Eagle schematics are XML with an <eagle> document root;
        # rule order gives Eagle priority since its files also carry the
        # generic <?xml prolog the XML fallback keys on
        {"language": "Eagle", "pattern": r"(?i)<eagle\b"},
        # DERIVED: legacy KiCad schematics open with an EESchema banner,
        # s-expression ones with (kicad_sch
        {"language": "KiCad Schematic",
         "pattern": r"(?m)^EESchema Schematic|\(kicad_sch\b"},
        {"language": "XML", "pattern": r"(?i)^\s*<\?xml"},
    ]},
    {"extensions": [".brd"], "rules": [
        # DERIVED: same <eagle> root discriminator as .sch
        {"language": "Eagle", "pattern": r"(?i)<eagle\b"},
        {"language": "KiCad Legacy Layout"},
    ]},
    {"extensions": [".cue"], "rules": [
        # DERIVED: cue sheets are a flat command list — uppercase keywords
        # at line start; CUE-the-language never starts a line that way
        {"language": "Cue Sheet",
         "pattern": r"(?m)^(?:CATALOG|CDTEXTFILE|FILE|FLAGS|INDEX|ISRC|"
                    r"PERFORMER|POSTGAP|PREGAP|REM|SONGWRITER|TITLE|TRACK)\b"},
        {"language": "CUE"},
    ]},
]

APPEND_RULES: dict[str, list[dict]] = {
    ".e": [
        # DERIVED: E's define/when/:= forms appear in no Eiffel or
        # Euphoria source; inserted before the existing patterned rules'
        # fallback position by the merge logic
        {"language": "E",
         "pattern": r"(?m)^\s*def\s+\w+\s*:=|\bwhen\s*\(.*\)\s*->"},
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
    for name, exts in EXT_APPEND.items():
        have = set(cur[name].get("extensions", []))
        cur[name].setdefault("extensions", []).extend(
            e for e in exts if e not in have
        )
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
    touched = set(NEW_LANGS) | set(EXT_APPEND)
    for ext, cands in sorted(ext_map.items()):
        if len(cands) > 1 and ext not in grouped and touched & set(cands) \
                and ext not in {".cgi", ".fcgi"}:
            problems.append(f"contested ext without group: {ext} -> {cands}")
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
