#!/usr/bin/env python
"""Second widening batch for data/languages.json (round 2).

Same provenance rules as widen_snapshot.py: every entry is a re-encoding of
PUBLIC github-linguist languages.yml facts (name, type, group, aliases,
extensions, filenames, interpreters), written from knowledge of that public
dataset — the same data the reference downloads at runtime
(/root/reference/src/helpers/load-data.ts:13). Colors only where
confidently known. Extensions contested upstream are PRUNED here rather
than added without their disambiguation group (e.g. Mercury keeps only
.moo because .m needs the MATLAB/Objective-C group; RenderScript keeps
only .rsh because .rs belongs to Rust) — validate() enforces that stance
against the merged snapshot.

Run:  python scripts/widen_snapshot2.py [--write]
"""

from __future__ import annotations

import json
import os

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

BATCH2: dict[str, dict] = {
    "4D": {"type": "programming", "extensions": [".4dm"]},
    "AMPL": {"type": "programming", "color": "#E6EFBB",
             "extensions": [".ampl"]},  # .mod pruned (contested upstream)
    "AspectJ": {"type": "programming", "color": "#a957b0",
                "extensions": [".aj"]},
    "Astro": {"type": "markup", "color": "#ff5a03",
              "aliases": ["astro component"], "extensions": [".astro"]},
    "Boo": {"type": "programming", "color": "#d4bec1",
            "extensions": [".boo"]},
    "Cadence": {"type": "programming", "color": "#00ef8b",
                "extensions": [".cdc"]},
    "Circom": {"type": "programming", "color": "#707575",
               "extensions": [".circom"]},
    "Cirru": {"type": "programming", "color": "#ccccff",
              "extensions": [".cirru"]},
    "Csound": {"type": "programming", "aliases": ["csound-orc"],
               "extensions": [".orc", ".udo"]},
    "Csound Document": {"type": "programming", "aliases": ["csound-csd"],
                        "extensions": [".csd"]},
    "Csound Score": {"type": "programming", "aliases": ["csound-sco"],
                     "extensions": [".sco"]},
    "DM": {"type": "programming", "color": "#447265", "aliases": ["byond"],
           "extensions": [".dm"]},
    "FLUX": {"type": "programming", "color": "#88ccff",
             "extensions": [".flux"]},  # .fx pruned (HLSL holds it)
    "GAP": {"type": "programming",
            "extensions": [".gap", ".gi"]},  # .gd pruned (GDScript), .tst pruned
    "Glyph": {"type": "programming", "color": "#c1ac7f",
              "extensions": [".glf"]},
    "Ioke": {"type": "programming", "color": "#078193",
             "extensions": [".ik"], "interpreters": ["ioke"]},
    "Jolie": {"type": "programming", "color": "#843179",
              "extensions": [".ol", ".iol"], "interpreters": ["jolie"]},
    "KDL": {"type": "data", "extensions": [".kdl"]},
    "KRL": {"type": "programming", "color": "#28430A",
            "extensions": [".krl"]},
    "KiCad Layout": {"type": "data", "aliases": ["pcbnew"],
                     "extensions": [".kicad_pcb", ".kicad_mod"]},
    "LOLCODE": {"type": "programming", "color": "#cc9900",
                "extensions": [".lol"]},
    "LabVIEW": {"type": "programming", "color": "#fede06",
                "extensions": [".lvproj", ".lvclass", ".lvlib"]},
    "Mathematica": {"type": "programming", "color": "#dd1100",
                    "aliases": ["mma", "wolfram", "wolfram language",
                                "wolfram lang", "wl"],
                    "extensions": [".wl", ".wls", ".nb", ".cdf"]},
    # .m pruned: needs the MATLAB/Objective-C/Mercury group
    "Mercury": {"type": "programming", "color": "#ff2b2b",
                "extensions": [".moo"], "interpreters": ["mmi"]},
    "Mojo": {"type": "programming", "color": "#ff4c1f",
             "extensions": [".mojo"]},
    "Move": {"type": "programming", "color": "#4a137a",
             "extensions": [".move"]},
    "Opal": {"type": "programming", "color": "#f7ede0",
             "extensions": [".opal"]},
    "Pod": {"type": "prose", "extensions": [".pod"],
            "interpreters": ["perl"]},
    "PogoScript": {"type": "programming", "color": "#d80074",
                   "extensions": [".pogo"]},
    "Pure Data": {"type": "data", "extensions": [".pd"]},
    "REXX": {"type": "programming", "color": "#d90e09",
             "aliases": ["arexx"], "extensions": [".rexx", ".pprx", ".rex"],
             "interpreters": ["regina", "rexx"]},
    "Red": {"type": "programming", "color": "#f50000",
            "aliases": ["red/system"], "extensions": [".red", ".reds"]},
    "Ren'Py": {"type": "programming", "color": "#ff7f7f",
               "aliases": ["renpy"], "extensions": [".rpy"]},
    # .rs pruned: Rust holds it (upstream disambiguates)
    "RenderScript": {"type": "programming", "extensions": [".rsh"]},
    "Ring": {"type": "programming", "color": "#2D54CB",
             "extensions": [".ring"]},
    "Self": {"type": "programming", "color": "#0579aa",
             "extensions": [".self"]},
    "ShaderLab": {"type": "programming", "color": "#222c37",
                  "extensions": [".shader"]},
    "Shen": {"type": "programming", "color": "#120F14",
             "extensions": [".shen"]},
    "Smali": {"type": "programming", "extensions": [".smali"]},
    # .t pruned: Perl holds it (upstream disambiguates Perl/Turing/Terra)
    "Turing": {"type": "programming", "color": "#cf142b",
               "extensions": [".tu"]},
    "Uno": {"type": "programming", "color": "#9933cc",
            "extensions": [".uno"]},
    "X10": {"type": "programming", "color": "#4B6BEF", "aliases": ["xten"],
            "extensions": [".x10"]},
    "Zimpl": {"type": "programming", "color": "#d67711",
              "extensions": [".zimpl", ".zmpl", ".zpl"]},
    "wisp": {"type": "programming", "color": "#7582D1",
             "extensions": [".wisp"]},
}


# Disambiguation groups for extensions batch 2 newly contests — upstream
# heuristics.yml shapes (first match wins; pattern-free rule = fallback).
NEW_HEURISTICS = [
    {"extensions": [".rpy"], "rules": [
        {"language": "Python",
         "pattern": "^(import|from|class|def)[ \\t]"},
        {"language": "Ren'Py"},
    ]},
    {"extensions": [".shader"], "rules": [
        {"language": "ShaderLab", "pattern": "^[ \\t]*Shader[ \\t]+\""},
        {"language": "GLSL",
         "pattern": "^[ \\t]*#(?:version|extension|pragma)\\b"},
        {"language": "GLSL"},
    ]},
]


def merged() -> tuple[dict, list[str]]:
    cur = json.load(open(os.path.join(DATA, "languages.json")))
    langs = dict(cur["languages"])
    skipped = []
    for name, meta in BATCH2.items():
        if name in langs:  # idempotent re-run / already-covered name
            skipped.append(name)
            continue
        langs[name] = meta
    cur["languages"] = {k: langs[k] for k in sorted(langs)}
    return cur, skipped


# Pre-batch-2 contested exts with no group: upstream linguist also leaves
# these to the shebang/alphabetical path (.cgi/.fcgi are interpreter-
# decided); new batch-2 additions must not grow this set.
BASELINE_CONTESTED = {".cgi", ".fcgi", ".ncl", ".pluginspec"}


def merged_heuristics() -> dict:
    heur = json.load(open(os.path.join(DATA, "heuristics.json")))
    have = {tuple(d["extensions"]) for d in heur["disambiguations"]}
    for grp in NEW_HEURISTICS:
        if tuple(grp["extensions"]) in have:
            continue
        heur["disambiguations"].append(grp)
    heur["disambiguations"].sort(key=lambda d: d["extensions"][0])
    return heur


def validate(cur: dict, heur: dict) -> list[str]:
    ext_map: dict[str, list[str]] = {}
    for name, meta in cur["languages"].items():
        for e in meta.get("extensions", []):
            ext_map.setdefault(e.lower(), []).append(name)
    grouped = {e for d in heur["disambiguations"] for e in d["extensions"]}
    problems = []
    for ext, cands in sorted(ext_map.items()):
        if len(cands) > 1 and ext not in grouped \
                and ext not in BASELINE_CONTESTED:
            problems.append(
                f"contested ext without heuristic group: {ext} -> {cands}")
    return problems


if __name__ == "__main__":
    import sys

    cur, skipped = merged()
    heur = merged_heuristics()
    problems = validate(cur, heur)
    for p in problems:
        print(p)
    if skipped:
        print(f"already present (skipped): {skipped}")
    print(f"{len(cur['languages'])} languages, "
          f"{len(heur['disambiguations'])} disambiguation groups after "
          f"batch-2 merge (+{len(BATCH2) - len(skipped)})")
    if problems:
        sys.exit(1)
    if "--write" in sys.argv:
        with open(os.path.join(DATA, "languages.json"), "w") as fh:
            json.dump(cur, fh, indent=1)
            fh.write("\n")
        with open(os.path.join(DATA, "heuristics.json"), "w") as fh:
            json.dump(heur, fh, indent=1)
            fh.write("\n")
        print("wrote languages.json + heuristics.json")
