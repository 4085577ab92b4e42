#!/usr/bin/env python
"""Round-3 widening, batch 10: close the last two upstream co-claim gaps
found by a systematic sweep of github-linguist disambiguation groups whose
member languages the snapshot ALREADY carries — `.m` (Mathematica claims
it upstream alongside the six existing claimants) and `.frag` (upstream
disambiguates GLSL vs JavaScript; the snapshot gave it to JavaScript
alone). All other swept groups (.asc .cs .md .q .ts .sc .r .php .pro
.gml .ms .p .properties .rno .s .sql .st .x .h .f .for .v .pl) were
already fully claimed and grouped.

Provenance: PUBLIC github-linguist languages.yml/heuristics.yml facts;
the Mathematica `\\(\\*` block-comment discriminator is upstream's, the
GLSL rule is a conservative DERIVED discriminator (marked in-line).

Run:  python scripts/widen_heuristics10.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")


def main() -> None:
    with open(os.path.join(DATA, "languages.json")) as f:
        langs = json.load(f)
    with open(os.path.join(DATA, "heuristics.json")) as f:
        heur = json.load(f)
    cur = langs["languages"]

    for name, ext in (("Mathematica", ".m"), ("GLSL", ".frag")):
        have = cur[name].setdefault("extensions", [])
        if ext not in have:
            have.append(ext)

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}

    m_group = by_key[(".m",)]
    if "Mathematica" not in {r["language"] for r in m_group["rules"]}:
        # upstream's discriminator: a (* ... *) block comment opens — no
        # other .m claimant's syntax can start one. Inserted before MATLAB
        # (whose bare ^% comment rule would otherwise never be reached for
        # Mathematica packages that lead with %-free comments), matching
        # upstream rule order.
        idx = next(
            i for i, r in enumerate(m_group["rules"])
            if r["language"] == "MATLAB"
        )
        m_group["rules"].insert(
            idx, {"language": "Mathematica", "pattern": r"\(\*"}
        )

    if (".frag",) not in by_key:
        by_key[(".frag",)] = {
            "extensions": [".frag"],
            "rules": [
                # DERIVED: GLSL fragment shaders open with preprocessor
                # directives, precision qualifiers, interface-qualified
                # globals, or a void main() — none legal at a JS line start
                {"language": "GLSL",
                 "pattern": r"(?m)^\s*(?:#(?:version|extension|pragma|"
                            r"ifdef|define)\b|precision\s+(?:low|medium|"
                            r"high)p\b|(?:uniform|varying|attribute|in|"
                            r"out|layout)\s.*;|void\s+main\s*\(\s*\))"},
                {"language": "JavaScript"},
            ],
        }
    heur["disambiguations"] = [by_key[k] for k in sorted(by_key)]

    # reuse batch-9's validator for dead-rule/compile/contested checks
    sys.path.insert(0, os.path.dirname(__file__))
    from widen_langs9 import validate

    problems = validate(langs, heur)
    for p in problems:
        print(p)
    print(
        f"{len(cur)} languages, "
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


if __name__ == "__main__":
    main()
