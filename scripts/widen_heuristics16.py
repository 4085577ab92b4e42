#!/usr/bin/env python
"""Round-4 widening, batch 16: new rule branches in EXISTING groups.

Widening need not mean new groups — upstream's `.pm` and `.gs` groups
carry claimants this snapshot lacks, and both can be stated honestly:

* `.pm` + X PixMap: XPM2/XPM3 image files use `.pm` historically (the
  snapshot already carries X PixMap/.xpm); upstream's discriminator is
  the XPM header comment itself — `^\\s*\\/\\* XPM \\*\\/` —
  verbatim-remembered (it is the file format's mandated first line).
  Appended after Perl/Raku, matching upstream's rule order.
* `.gs` + GLSL: geometry shaders use `.gs` (the snapshot's GLSL already
  claims the sibling `.fshader`/`.vsh`/... extension family). The
  discriminator is DERIVED from the same GLSL signal family the `.fs`
  group uses (`#version`/`precision`/`uniform`/`varying`, plus `layout`
  which geometry shaders always declare). Appended last so the two
  pinned existing branches (Genie, Gosu) keep their exact behavior.

C9 fallback: .pm is unchanged (Perl stays first); .gs now defaults to
GLSL for unmatched content — "GLSL" precedes "Genie" in ASCII order,
matching upstream languages.yml's ASCII sort, and is the majority
language for the extension.

Provenance: PUBLIC github-linguist languages.yml/heuristics.yml facts.

Run:  python scripts/widen_heuristics16.py [--write]
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

    for lang, ext in (("X PixMap", ".pm"), ("GLSL", ".gs")):
        have = cur[lang].setdefault("extensions", [])
        if ext not in have:
            have.append(ext)

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}

    pm = by_key[(".pm",)]
    if not any(r["language"] == "X PixMap" for r in pm["rules"]):
        pm["rules"].append(
            # verbatim: the XPM format's mandated header comment
            {"language": "X PixMap", "pattern": r"^\s*\/\* XPM \*\/"}
        )

    gs = by_key[(".gs",)]
    if not any(r["language"] == "GLSL" for r in gs["rules"]):
        gs["rules"].append(
            # DERIVED: the .fs group's GLSL signal family + layout()
            {"language": "GLSL",
             "pattern": r"^\s*(?:#version|precision|uniform|varying|layout)"}
        )

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
