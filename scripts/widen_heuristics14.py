#!/usr/bin/env python
"""Round-4 widening, batch 14: the `.mojo` disambiguation group.

Upstream github-linguist added the Mojo language (extensions `.mojo` and
`.🔥`) in 2023; `.mojo` was already claimed by XML (Mojolicious-era XML
intention documents), so upstream carries a `.mojo` disambiguation — the
batch-13 sweep listed it among the groups left out pending confident
reconstruction. This batch lands it with the two discriminators that can
be stated honestly:

* XML side: the canonical ``^\\s*<?xml`` prolog rule (verbatim-remembered —
  the same rule text upstream uses for every XML co-claim group in this
  snapshot: .workflow, .plist, .rs, ...).
* Mojo side: a DERIVED keyword gate over Mojo's top-level forms
  (``alias/def/from/fn/import/struct/trait``) — conservative: every Mojo
  sample in the public manual opens with one of these; no XML document
  starts a line with them followed by whitespace-bound code.

Unmatched content falls through to C9 (first candidate in snapshot
ordering = Mojo, alphabetically before XML — matching upstream's behavior
for a file with neither signal).

Provenance: PUBLIC github-linguist languages.yml/heuristics.yml facts;
rule marked DERIVED where the upstream text is not remembered verbatim.

Run:  python scripts/widen_heuristics14.py [--write]
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

    # upstream: programming, .mojo + the U+1F525 flame alias extension
    # (the snapshot already carried Mojo/.mojo from an earlier batch; the
    # flame alias and the XML co-claim are what batch 14 adds)
    if "Mojo" not in cur:
        cur["Mojo"] = {"type": "programming", "extensions": [".mojo"]}
    mojo_exts = cur["Mojo"].setdefault("extensions", [])
    if ".\U0001F525" not in mojo_exts:
        mojo_exts.append(".\U0001F525")

    # upstream XML's extension list includes .mojo (the reason the group
    # exists at all)
    xml_exts = cur["XML"].setdefault("extensions", [])
    if ".mojo" not in xml_exts:
        xml_exts.append(".mojo")

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}
    if (".mojo",) not in by_key:
        by_key[(".mojo",)] = {
            "extensions": [".mojo"],
            "rules": [
                # DERIVED: Mojo top-level keyword gate (see module doc)
                {
                    "language": "Mojo",
                    "pattern": r"^\s*(?:alias|def|from|fn|import|struct|trait)\s",
                },
                {"language": "XML", "pattern": r"^\s*<\?xml"},
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
