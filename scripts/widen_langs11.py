#!/usr/bin/env python
"""Round-3 widening, batch 11: the remaining upstream languages this
sweep could source with confidence from PUBLIC github-linguist
languages.yml/heuristics.yml facts (the same dataset the reference
downloads at runtime, /root/reference/src/helpers/load-data.ts:13),
plus the disambiguation-group memberships they unlock:

- `.mod` gains upstream's NMODL rule and the Linux Kernel Module
  fallback (upstream's trailing multi-language fallback is
  [Linux Kernel Module, AMPL]; AMPL's .mod claim stays PRUNED here as
  batch-2 already records, so the fallback is encoded single-language).
- `.r` gains Rez. Upstream lists Rez's rule last, where its
  `#include "Types.r"` form is shadowed by R's `^\\s*#` comment rule;
  we hoist it above R with a strictly NARROWER pattern (DERIVED order,
  upstream patterns) so the rule is not dead.
- `.t` gains Terra (DERIVED conservative discriminator: `terra`
  definitions / terralib require, which no Perl/Raku/Turing source
  matches at line start).
- `.txt` gains Adblock Filter List and Vim Help File ahead of the Text
  fallback (upstream discriminators: the `[Adblock ...]` header line
  and the `*tag.txt*` help-tag line).
- `.ncl` gains Nickel ahead of the NCL fallback (DERIVED: `let x =` /
  `fun x =>` bindings are Nickel syntax, never NCAR NCL).
- `.nas` becomes a NEW group: upstream Assembly also claims .nas, so
  Nasal needs a discriminator (DERIVED: Nasal's `var x =` bindings).
- Fortran's free-form extensions (.f90/.f95/.f03/.f08) move to the
  upstream "Fortran Free Form" language; the fixed-form group shrinks
  to [.f, .for] (Forth vs Fortran), matching upstream ownership where
  free-form extensions are uncontested.
- go.work moves from Go Module to upstream's "Go Workspace".
- Pickle lands with .pickle only (.pkl PRUNED — Pkl holds it, same
  stance as batch-2's Mercury/RenderScript prunes).

Colors only where confidently known; contested extensions outside
these groups stay pruned per the repo-wide provenance stance.

Run:  python scripts/widen_langs11.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

NEW_LANGS: dict[str, dict] = {
    "Fortran Free Form": {"type": "programming", "color": "#4d41b1",
                          "extensions": [".f90", ".f95", ".f03", ".f08"]},
    "NMODL": {"type": "programming", "color": "#00356B",
              "extensions": [".mod"]},
    "Linux Kernel Module": {"type": "data", "extensions": [".mod"]},
    "Rez": {"type": "programming", "color": "#FFDAB3",
            "extensions": [".r"]},
    "Terra": {"type": "programming", "color": "#00004c",
              "extensions": [".t"]},
    "Vim Help File": {"type": "prose", "color": "#199f4b",
                      "aliases": ["help", "vimhelp"],
                      "extensions": [".txt"]},
    "Adblock Filter List": {"type": "data", "color": "#800000",
                            "aliases": ["ad block filters", "adblock"],
                            "extensions": [".txt"]},
    "Nickel": {"type": "programming", "extensions": [".ncl"]},
    "Nasal": {"type": "programming", "color": "#1d2c4e",
              "extensions": [".nas"]},
    "iCalendar": {"type": "data", "aliases": ["ical"],
                  "extensions": [".ics"]},
    "Pip Requirements": {"type": "data", "color": "#FFD343",
                         "filenames": ["requirements.txt",
                                       "constraints.txt"]},
    "robots.txt": {"type": "data", "aliases": ["robots", "robots txt"],
                   "filenames": ["robots.txt"]},
    "Dune": {"type": "data",
             "filenames": ["dune", "dune-project", "dune-workspace"]},
    "CAP CDS": {"type": "programming", "color": "#0092d1",
                "aliases": ["cds"], "extensions": [".cds"]},
    "CIL": {"type": "programming", "extensions": [".cil"]},
    "ISPC": {"type": "programming", "color": "#2D68B1",
             "extensions": [".ispc"]},
    "D2": {"type": "markup", "color": "#526ee8", "aliases": ["d2lang"],
           "extensions": [".d2"]},
    "Genero 4gl": {"type": "programming", "color": "#63408e",
                   "extensions": [".4gl"]},
    "Genero per": {"type": "markup", "color": "#d8df39",
                   "extensions": [".per"]},
    "CameLIGO": {"type": "programming", "color": "#3be133",
                 "extensions": [".mligo"]},
    "Omgrofl": {"type": "programming", "color": "#cabbff",
                "extensions": [".omgrofl"]},
    "Simple File Verification": {"type": "data", "color": "#C9BFED",
                                 "aliases": ["sfv"],
                                 "extensions": [".sfv"]},
    "NumPy": {"type": "programming", "color": "#9C8AF9",
              "group": "Python",
              "extensions": [".numpy", ".numpyw", ".numsc"]},
    "Parrot": {"type": "programming", "color": "#f3ca0a",
               "extensions": [".parrot"]},
    "YASnippet": {"type": "markup", "color": "#32AB90",
                  "aliases": ["snippet", "yas"],
                  "extensions": [".yasnippet"]},
    "edn": {"type": "data", "extensions": [".edn"]},
    "Go Workspace": {"type": "data", "color": "#00ADD8",
                     "filenames": ["go.work"]},
    "Hare": {"type": "programming", "color": "#9d7424",
             "extensions": [".ha"]},
    # .pkl PRUNED (Pkl holds it upstream-contested; binary pickles are
    # content-sniffed out anyway)
    "Pickle": {"type": "data", "extensions": [".pickle"]},
    "Slang": {"type": "programming", "extensions": [".slang"]},
    "Module Management System": {
        "type": "programming",
        "filenames": ["descrip.mmk", "descrip.mms"],
        "extensions": [".mms", ".mmk"]},
    "NetLinx+ERB": {"type": "programming", "color": "#747faa",
                    "extensions": [".axs.erb", ".axi.erb"]},
}

EXT_APPEND: dict[str, list[str]] = {}

# extensions/filenames that MOVE to a new upstream owner
EXT_REMOVE: dict[str, list[str]] = {
    "Fortran": [".f90", ".f95", ".f03", ".f08"],
}
FILENAME_REMOVE: dict[str, list[str]] = {
    "Go Module": ["go.work"],
}

NEW_GROUPS: list[dict] = [
    {"extensions": [".nas"], "rules": [
        # DERIVED: Nasal's `var name =` bindings open FlightGear scripts;
        # no assembler source starts a line that way
        {"language": "Nasal",
         "pattern": r"(?m)^\s*var\s+[\w.]+\s*="},
        {"language": "Assembly"},
    ]},
]

APPEND_RULES: dict[str, list[dict]] = {
    ".mod": [
        # upstream's NMODL discriminator: NEURON/INITIAL/UNITS block opener
        {"language": "NMODL",
         "pattern": r"\b(?:NEURON|INITIAL|UNITS)\s+\{"},
        # upstream trailing fallback [Linux Kernel Module, AMPL];
        # AMPL's .mod claim is pruned (batch 2), so single-language here
        {"language": "Linux Kernel Module"},
    ],
    ".r": [
        # upstream patterns; hoisted above R (see module docstring)
        {"language": "Rez",
         "pattern": r"(#include\s+[\"<](Types\.r|Carbon/Carbon\.r)[\">])"
                    r"|((resource|data|type)\s+'[A-Za-z_ ]{4}'\s*(\(|\{))"},
    ],
    ".t": [
        # DERIVED: terra definitions / terralib require
        {"language": "Terra",
         "pattern": r"(?m)^\s*(terra\s+[\w.]+\s*(\(|::)|local\s+terra\b"
                    r"|require\(\s*[\"']terralib[\"']\s*\))"},
    ],
    ".txt": [
        # upstream: adblock list header on the first line
        {"language": "Adblock Filter List",
         "pattern": r"\A\s*\[Adblock"},
        # upstream: vim help-tag line (*subject.txt*)
        {"language": "Vim Help File",
         "pattern": r"(?m)^\*[\w.-]+\.txt\*"},
    ],
    ".ncl": [
        # DERIVED: Nickel let/fun bindings, never NCAR NCL syntax
        {"language": "Nickel",
         "pattern": r"(?m)^\s*(let\s+[\w'-]+\s*=\s|fun\s+[\w'-]+\s*=>)"},
    ],
}

# group whose extension list itself changes (rekey)
GROUP_REKEY: dict[tuple, list[str]] = {
    (".f", ".for", ".f90", ".f95"): [".f", ".for"],
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
    for name, exts in EXT_REMOVE.items():
        cur[name]["extensions"] = [
            e for e in cur[name]["extensions"] if e not in exts
        ]
    for name, fns in FILENAME_REMOVE.items():
        cur[name]["filenames"] = [
            f for f in cur[name].get("filenames", []) if f not in fns
        ]
    langs["languages"] = {k: cur[k] for k in sorted(cur)}

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}
    for old, new in GROUP_REKEY.items():
        g = by_key.pop(old)
        g["extensions"] = new
        by_key[tuple(new)] = g
    for g in NEW_GROUPS:
        key = tuple(g["extensions"])
        if key in by_key:
            skipped.append("group:" + ",".join(key))
            continue
        by_key[key] = g
    for ext, rules in APPEND_RULES.items():
        target = next(g for g in by_key.values() if ext in g["extensions"])
        have = {r["language"] for r in target["rules"]}
        for r in rules:
            if r["language"] in have:
                skipped.append("rule:" + r["language"])
                continue
            if "pattern" in r:
                if ext == ".r":
                    # hoist above the R comment rule (see docstring)
                    idx = next(i for i, x in enumerate(target["rules"])
                               if x["language"] == "R")
                else:
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


def main() -> None:
    langs, heur, skipped = merged()
    sys.path.insert(0, os.path.dirname(__file__))
    import widen_langs9 as w9

    w9.NEW_LANGS = NEW_LANGS
    w9.EXT_APPEND = {**EXT_APPEND,
                     **{k: [] for k in EXT_REMOVE},
                     "Nasal": [".nas"], "Assembly": []}
    problems = w9.validate(langs, heur)
    for p in problems:
        print(p)
    print(
        f"{len(langs['languages'])} languages, "
        f"{len(heur['disambiguations'])} disambiguation groups after merge; "
        f"skipped={skipped}"
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
