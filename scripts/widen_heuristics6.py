#!/usr/bin/env python
"""Round-3 widening, batch 6: ~24 more disambiguation groups toward
upstream github-linguist's ~150 (VERDICT r02 item 4, "what's missing" #1).

Targets the highest-traffic contested extensions still missing content
disambiguation: `.json`/`.yaml`/`.yml` (OpenAPI/MiniYAML), man pages
(`.1`-`.9`/`.man`/`.mdoc` Roff vs Roff Manpage), `.s` (Motorola 68K vs
Unix Assembly), `.bas`, `.m4`, `.plist`, `.plt`, `.qs`, `.res`, `.srt`,
`.asy`, `.bf`, `.bs`, `.builds`, `.csl`, `.mc`, `.frm`, `.ms`, `.tag`,
`.sw`, `.tsp`, `.typ`, `.rno`, `.vhost`.

Provenance matches widen_heuristics3/5: every language entry re-encodes
PUBLIC github-linguist languages.yml facts (pruned to the claims needed
here); heuristic patterns are upstream's where recalled exactly, otherwise
conservative DERIVED discriminators marked in-line. The reference consumes
the same public datasets at runtime (/root/reference/src/index.ts:38-41).
Languages whose disambiguation pattern could not be recalled or derived
with confidence (QuickBASIC, B4X, Lean 4, Formatted) are omitted rather
than invented — same stance as batch 4.

Run:  python scripts/widen_heuristics6.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

NEW_LANGS: dict[str, dict] = {
    "Motorola 68K Assembly": {"type": "programming", "group": "Assembly",
                              "color": "#005daa", "aliases": ["m68k"],
                              "extensions": [".s", ".x68"]},
    "M4Sugar": {"type": "programming", "group": "M4",
                "aliases": ["autoconf"], "extensions": [".m4"],
                "filenames": ["configure.ac"]},
    "XML Property List": {"type": "data", "group": "XML",
                          "extensions": [".plist", ".stTheme",
                                         ".tmCommand", ".tmLanguage",
                                         ".tmPreferences", ".tmSnippet",
                                         ".tmTheme"]},
    "Qt Script": {"type": "programming", "color": "#00b841",
                  "extensions": [".qs"]},
    "SRecode Template": {"type": "markup", "color": "#348a34",
                         "extensions": [".srt"]},
    "OASv2-json": {"type": "data", "group": "JSON",
                   "extensions": [".json"]},
    "OASv3-json": {"type": "data", "group": "JSON",
                   "extensions": [".json"]},
    "OASv2-yaml": {"type": "data", "group": "YAML",
                   "extensions": [".yaml", ".yml"]},
    "OASv3-yaml": {"type": "data", "group": "YAML",
                   "extensions": [".yaml", ".yml"]},
    "MiniYAML": {"type": "data", "color": "#ff1111",
                 "extensions": [".yaml", ".yml"]},
    "LTspice Symbol": {"type": "data", "extensions": [".asy"]},
    "Beef": {"type": "programming", "color": "#a52f4e",
             "extensions": [".bf"]},
    "HyPhy": {"type": "programming", "extensions": [".bf"]},
    "Bikeshed": {"type": "markup", "extensions": [".bs"]},
    "BrighterScript": {"type": "programming", "color": "#66AABB",
                       "extensions": [".bs"]},
    "Bluespec BH": {"type": "programming", "group": "Bluespec",
                    "aliases": ["bluespec classic"], "extensions": [".bs"]},
    "Win32 Message File": {"type": "data", "extensions": [".mc"]},
    "Sway": {"type": "programming", "color": "#00F58C",
             "extensions": [".sw"]},
    "TypeSpec": {"type": "programming", "color": "#4A3665",
                 "extensions": [".tsp"]},
    "TSPLIB data": {"type": "data", "extensions": [".tsp"]},
    "Roff Manpage": {"type": "markup", "group": "Roff", "color": "#ecdebe",
                     "extensions": [".1", ".1in", ".1m", ".1x", ".2", ".3",
                                    ".3in", ".3m", ".3p", ".3pm", ".3qt",
                                    ".3x", ".4", ".5", ".6", ".7", ".8",
                                    ".9", ".man", ".mdoc"]},
    "ApacheConf": {"type": "data", "color": "#d12127",
                   "aliases": ["aconf", "apache"],
                   "extensions": [".apacheconf", ".vhost"],
                   "filenames": [".htaccess"]},
}

EXT_ADD: dict[str, list[str]] = {
    "FreeBASIC": [".bas"],  # snapshot already carries this (upstream) name
    "VBA": [".bas", ".frm"],
    "Gnuplot": [".plt"],
    "ReScript": [".res"],
    "Kusto": [".csl"],
    "M4": [".mc"],
    "Text": [".builds"],
    "MAXScript": [".ms"],
    # upstream Roff claims .ms (troff -ms macros) alongside the man-page
    # suffixes; without it the .ms group's Roff rule is candidate-gated dead
    "Roff": [".rno", ".ms"],
    "Nginx": [".vhost"],
    "XML": [".typ"],
    # upstream SQL claims .inc (snapshot omission surfaced by the fixed
    # dead-rule validator: the .inc group's SQL rule was candidate-gated)
    "SQL": [".inc"],
}

# upstream vb-module discriminator (VBA/VB6 module headers)
NEW_NAMED: dict[str, str] = {
    "vb-module": r"(?i)^\s*Attribute\s+VB_Name\s+=\s",
}

NEW_GROUPS: list[dict] = [
    # repair of an earlier batch's group (surfaced by the fixed dead-rule
    # validator): upstream's .pod fallback is Pod, not Perl — Perl does not
    # claim .pod, so the old fallback rule never fired and .pod fell to
    # first-candidate by accident of candidate order
    {"extensions": [".pod"], "rules": [
        {"language": "Pod 6",
         "pattern": r"^[ \t]*=(comment|begin pod|begin para|item\d+)"},
        {"language": "Pod"},
    ]},
    {"extensions": [".bas"], "rules": [
        # upstream FreeBasic preprocessor-directive discriminator
        {"language": "FreeBASIC",
         "pattern": r"(?i)^[ \t]*#(?:define|endif|endmacro|ifdef|ifndef|"
                    r"include|lang|macro)(?:$|\s)"},
        # upstream: classic line-numbered BASIC
        {"language": "BASIC", "pattern": r"\A\s*\d"},
        {"language": "VBA", "named_pattern": "vb-module"},
    ]},
    {"extensions": [".s"], "rules": [
        # DERIVED: 68k-unique mnemonics/directives (moveq #, dc.b/w/l,
        # movea, size-suffixed move with # immediate)
        {"language": "Motorola 68K Assembly",
         "pattern": r"(?i)^\s*(?:moveq(?:\.l)?\s+#|move\.[bwl]\s+"
                    r"|dc\.[bwl]\s|movea\.[wl]\s)"},
        {"language": "Unix Assembly"},  # fallback
    ]},
    {"extensions": [".m4"], "rules": [
        # upstream autoconf-macro discriminator
        {"language": "M4Sugar", "pattern": r"AC_DEFUN|AC_PREREQ|AC_INIT"},
        {"language": "M4"},
    ]},
    {"extensions": [".plt"], "rules": [
        {"language": "Prolog", "pattern": r"^\s*:-"},
        {"language": "Gnuplot"},
    ]},
    {"extensions": [".plist"], "rules": [
        {"language": "XML Property List", "pattern": r"\A<\?xml"},
        {"language": "OpenStep Property List"},
    ]},
    {"extensions": [".qs"], "rules": [
        {"language": "Q#", "pattern": r"^\s*namespace\s*[\w.]+\s*\{"},
        # upstream: any dotted qualified name (matches nearly any real
        # Qt Script; empty/trivial files fall to first-candidate).
        # Search-equivalent linear rewrite of upstream's (\w+\.)+\w+ —
        # a text contains a (\w+\.)+\w+ match iff it contains \w\.\w.
        {"language": "Qt Script", "pattern": r"\w\.\w"},
    ]},
    {"extensions": [".res"], "rules": [
        # DERIVED: ReScript top-level binding forms
        {"language": "ReScript",
         "pattern": r"^\s*(?:let|module|type|external|open)\s+\w"},
        {"language": "XML"},
    ]},
    {"extensions": [".srt"], "rules": [
        # DERIVED: SRecode templates open with Emacs-style ;; comments
        {"language": "SRecode Template", "pattern": r"\A\s*;;"},
        {"language": "SubRip Text"},
    ]},
    {"extensions": [".json"], "rules": [
        # DERIVED from the OpenAPI spec's required version keys
        {"language": "OASv2-json", "pattern": r"\"swagger\"\s*:\s*\"2"},
        {"language": "OASv3-json", "pattern": r"\"openapi\"\s*:\s*\"3"},
        {"language": "JSON"},
    ]},
    {"extensions": [".yaml", ".yml"], "rules": [
        # DERIVED from the OpenAPI spec's required version keys
        {"language": "OASv2-yaml",
         "pattern": r"^[\"']?swagger[\"']?\s*:\s*[\"']?2"},
        {"language": "OASv3-yaml",
         "pattern": r"^[\"']?openapi[\"']?\s*:\s*[\"']?3"},
        # DERIVED: OpenRA MiniYAML is tab-indented (invalid in real YAML)
        {"language": "MiniYAML", "pattern": r"^\t+\S[^:\r\n]*:(?:$|\s)"},
        {"language": "YAML"},
    ]},
    {"extensions": [".asy"], "rules": [
        # upstream LTspice header discriminator
        {"language": "LTspice Symbol", "pattern": r"^SymbolType[ \t]"},
        {"language": "Asymptote"},
    ]},
    {"extensions": [".bf"], "rules": [
        # DERIVED: Beef uses C#-style using of System/Beefy namespaces
        {"language": "Beef",
         "pattern": r"(?i)^\s*using\s+(?:System|Beefy)(?:\.\w+)*\s*;"},
        # DERIVED: HyPhy batch-language builtins
        {"language": "HyPhy",
         "pattern": r"\b(?:fprintf\s*\(|ExecuteAFile|LikelihoodFunction|"
                    r"DataSetFilter)\b"},
        # upstream Brainfuck discriminator
        {"language": "Brainfuck", "pattern": r"(>\+>|>\+<)"},
    ]},
    {"extensions": [".bs"], "rules": [
        # DERIVED: Bikeshed specs open with a <pre class=metadata> block
        {"language": "Bikeshed",
         "pattern": r"(?i)<pre\s+class\s*=\s*[\"']?metadata\b"},
        # DERIVED: Bluespec BH (Haskell-syntax) package header
        {"language": "Bluespec BH",
         "pattern": r"^package\s+[A-Za-z_][\w']*(?:\s*\(|\s+where\b)"},
        {"language": "BrighterScript"},
    ]},
    {"extensions": [".builds"], "rules": [
        {"language": "XML", "pattern": r"(?i)^\s*<(?:\?xml|Project)"},
        {"language": "Text"},
    ]},
    {"extensions": [".csl"], "rules": [
        {"language": "XML", "pattern": r"(?i)^\s*<\?xml"},
        {"language": "Kusto"},
    ]},
    {"extensions": [".mc"], "rules": [
        # DERIVED: Win32 message-compiler key=value headers
        {"language": "Win32 Message File",
         "pattern": r"(?i)^\s*(?:MessageId|SymbolicName|Severity|"
                    r"LanguageNames|FacilityNames)\s*="},
        # DERIVED: m4 builtins / GNU m4 dnl comments
        {"language": "M4", "pattern": r"^\s*(?:dnl|m4_define|changequote)\b"},
        {"language": "Monkey C"},
    ]},
    {"extensions": [".frm"], "rules": [
        # DERIVED: MSForms (VBA) Begin blocks carry a GUID; VB6 forms
        # use Begin VB.<class>
        {"language": "VBA",
         "pattern": r"^\s*Begin\s+\{[0-9A-Fa-f-]+\}"},
        {"language": "Visual Basic 6.0",
         "pattern": r"^\s*Begin\s+VB\."},
    ]},
    {"extensions": [".ms"], "rules": [
        # upstream-shaped: troff request at line start
        {"language": "Roff", "pattern": r"^[.'][A-Za-z]{2}(?:\s|$)"},
        # DERIVED: gas directives / label at line start, no C comments
        {"language": "Unix Assembly",
         "and": [
             {"negative_pattern": r"/\*"},
             {"pattern": r"^\s*\.(?:include\s|globa?l\s)"},
         ]},
        {"language": "MAXScript"},
    ]},
    {"extensions": [".sw"], "rules": [
        # DERIVED: Sway program-kind header
        {"language": "Sway",
         "pattern": r"^\s*(?:contract|script|predicate|library)\b"},
        {"language": "XML"},
    ]},
    {"extensions": [".tsp"], "rules": [
        # DERIVED: TypeSpec top-level keywords
        {"language": "TypeSpec",
         "pattern": r"^\s*(?:import|using|namespace|model|op|interface)\s"},
        # DERIVED: TSPLIB required header keys
        {"language": "TSPLIB data",
         "pattern": r"^\s*(?:NAME|TYPE|COMMENT|DIMENSION)\s*:"},
    ]},
    {"extensions": [".typ"], "rules": [
        {"language": "XML", "pattern": r"^\s*<\?xml"},
        {"language": "Typst"},
    ]},
    {"extensions": [".rno"], "rules": [
        # upstream-shaped RUNOFF control-word / form-feed discriminator
        {"language": "RUNOFF", "pattern": r"(?i)^\.!|^\f|\.end lit"},
        # upstream: troff comment
        {"language": "Roff", "pattern": r"^\.\\\""},
    ]},
    {"extensions": [".vhost"], "rules": [
        # DERIVED: nginx block syntax vs Apache section tags
        {"language": "Nginx",
         "pattern": r"^\s*(?:server|upstream|location|http)\s*\{"},
        {"language": "ApacheConf",
         "pattern": r"(?i)^\s*<(?:VirtualHost|Directory|IfModule)\b"},
    ]},
    # man pages: Roff Manpage when man/mdoc title macros present
    {"extensions": [".1", ".1in", ".1m", ".1x", ".2", ".3", ".3in", ".3m",
                    ".3p", ".3pm", ".3qt", ".3x", ".4", ".5", ".6", ".7",
                    ".8", ".9", ".man", ".mdoc"], "rules": [
        # DERIVED: .TH/.Dt title macros open virtually every man/mdoc page
        {"language": "Roff Manpage",
         "pattern": r"^[.'][ \t]*(?:TH[ \t]|Dt[ \t]|SH[ \t])"},
        {"language": "Roff"},
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

    for name, pat in NEW_NAMED.items():
        if name in heur["named_patterns"]:
            skipped.append("named:" + name)
        heur["named_patterns"][name] = pat

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
        # drop the None of group-less candidates: a literal None in the set
        # made `cur[lang].get("group") not in cands` vacuously False for
        # every group-less rule language, masking dead rules
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
