#!/usr/bin/env python
"""Round-4 widening, batch 13: the three remaining upstream disambiguation
groups whose claimants can be stated with confidence — `.lean` (Lean vs
Lean 4, added upstream with the Lean 4 language), `.nr` (Roff vs Noir,
added upstream with the Noir language), and `.workflow` (XML Automator
documents vs HCL GitHub-Actions-v1 workflow files; XML already claims the
extension in this snapshot).

A fresh sweep of the remaining upstream heuristics.yml delta found the
other candidate groups to be either (a) single-rule groups over a
single-claimant extension — behavioral no-ops under the reference's
rule-gated-to-candidates semantics (src/index.ts:331-336), e.g. `.bi`
(FreeBasic) and `.ch` (xBase), or (b) groups whose second claimant or
rule text this author cannot reconstruct with confidence (e.g. `.mojo`
vs XML, `.csc`, `.fx`) — inventing those would trade honest breadth for
a fabricated rule, so they are deliberately left out and documented here.

Provenance: PUBLIC github-linguist languages.yml/heuristics.yml facts.
The `.lean` import-case split and the `.nr` leading-dot Roff rule are
upstream's discriminators; the `.workflow` HCL rule is a conservative
DERIVED discriminator (marked in-line) since only the XML `<?xml` side
is remembered verbatim.

Run:  python scripts/widen_heuristics13.py [--write]
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

    # -- new languages ----------------------------------------------------
    if "Lean 4" not in cur:
        # upstream: programming, .lean shared with Lean (Lean 3); .hlean
        # stays Lean-only
        cur["Lean 4"] = {"type": "programming", "extensions": [".lean"]}
    if "Noir" not in cur:
        cur["Noir"] = {"type": "programming", "extensions": [".nr"]}

    # -- new extension co-claims ------------------------------------------
    # upstream Roff's extension list includes .nr (numbered roff register
    # files predate Noir); HCL claimed .workflow for GitHub Actions v1.
    for lang, ext in (("Roff", ".nr"), ("HCL", ".workflow")):
        have = cur[lang].setdefault("extensions", [])
        if ext not in have:
            have.append(ext)

    # -- new disambiguation groups ----------------------------------------
    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}

    if (".lean",) not in by_key:
        by_key[(".lean",)] = {
            "extensions": [".lean"],
            "rules": [
                # upstream: Lean 3 modules are lowercase dotted
                # (`import data.nat.basic`), Lean 4 / Mathlib modules are
                # capitalized (`import Mathlib.Tactic`)
                {"language": "Lean", "pattern": r"^import [a-z]"},
                {"language": "Lean 4", "pattern": r"^import [A-Z]"},
            ],
        }

    if (".nr",) not in by_key:
        by_key[(".nr",)] = {
            "extensions": [".nr"],
            "rules": [
                # upstream: any line opening with a roff request/comment dot
                # wins for Roff; everything else is Noir (default rule)
                {"language": "Roff", "pattern": r"^\."},
                {"language": "Noir"},
            ],
        }

    if (".workflow",) not in by_key:
        by_key[(".workflow",)] = {
            "extensions": [".workflow"],
            "rules": [
                {"language": "XML", "pattern": r"^\s*<\?xml"},
                # DERIVED: GitHub Actions v1 .workflow files are HCL blocks
                # headed `workflow "name" {` / `action "name" {`; no other
                # claimant's syntax opens that way. No unconditional
                # fallback — unmatched content defaults to the first
                # extension candidate (C9), as upstream falls through too.
                {"language": "HCL", "pattern": r"^\s*(?:workflow|action)\s+\x22"},
            ],
        }

    heur["disambiguations"] = sorted(
        by_key.values(), key=lambda g: g["extensions"][0]
    )

    if "--write" in sys.argv:
        with open(os.path.join(DATA, "languages.json"), "w") as f:
            json.dump(langs, f, indent=1, ensure_ascii=False)
            f.write("\n")
        with open(os.path.join(DATA, "heuristics.json"), "w") as f:
            json.dump(heur, f, indent=1, ensure_ascii=False)
            f.write("\n")
        print("written:", len(cur), "languages,",
              len(heur["disambiguations"]), "groups")
    else:
        print("dry run:", len(cur), "languages,",
              len(heur["disambiguations"]), "groups (pass --write)")


if __name__ == "__main__":
    main()
