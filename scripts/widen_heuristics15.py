#!/usr/bin/env python
"""Round-4 widening, batch 15: the `.fx` and `.nb` disambiguation groups.

Both groups exist in upstream github-linguist heuristics.yml and were
listed by the batch-13 sweep as left out pending confident reconstruction.
What CAN be stated confidently is the claimant sets, which is the
load-bearing public fact (languages.yml extension membership):

* `.fx` — FLUX (the dataflow shader language) co-claims HLSL's effect-file
  extension. Discriminator: FLUX sources declare `func name(...)` at top
  level; no HLSL effect file does (HLSL functions carry return types and
  `technique`/`pass` blocks). Rule shape mirrors upstream: one FLUX
  pattern rule, then a bare HLSL fallback — behaviorally RIGHT for this
  extension because the overwhelming majority of `.fx` files are HLSL and
  C9's alphabetical default would otherwise pick FLUX. The FLUX pattern
  below is DERIVED (remembered shape, not guaranteed verbatim).
* `.nb` — Mathematica notebooks vs Text (Nota Bene documents; upstream
  Text's extension list carries `.nb`, already true in this snapshot).
  Discriminator (DERIVED): every Wolfram notebook begins with a
  `(* ... *)` comment block and contains a `Notebook[` expression; Wolfram
  package-format `.nb` files likewise open with `(*` comments. Prose hits
  neither, so the bare Text fallback catches it — again behaviorally
  necessary because C9 would alphabetically default to Mathematica.

Provenance: PUBLIC github-linguist languages.yml/heuristics.yml facts;
rules marked DERIVED where the upstream text is not remembered verbatim.

Run:  python scripts/widen_heuristics15.py [--write]
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

    # -- extension co-claims (the snapshot already carries FLUX/.flux,
    # HLSL/.fx, Mathematica, and Text/.nb) -------------------------------
    for lang, ext in (("FLUX", ".fx"), ("Mathematica", ".nb")):
        have = cur[lang].setdefault("extensions", [])
        if ext not in have:
            have.append(ext)

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}
    if (".fx",) not in by_key:
        by_key[(".fx",)] = {
            "extensions": [".fx"],
            "rules": [
                # DERIVED: FLUX top-level func declaration (module doc)
                {"language": "FLUX", "pattern": r"\bfunc\s+[^\s(]+\s*\("},
                {"language": "HLSL"},
            ],
        }
    if (".nb",) not in by_key:
        by_key[(".nb",)] = {
            "extensions": [".nb"],
            "rules": [
                # DERIVED: Wolfram comment block / Notebook expression
                {"language": "Mathematica",
                 "pattern": r"^\s*\(\*|\bNotebook\["},
                {"language": "Text"},
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
