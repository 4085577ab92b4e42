#!/usr/bin/env python
"""Round-4 widening, batch 17: Visual Basic 6.0's remaining single-claimant
extensions.

Upstream's Visual Basic 6.0 entry claims `.bas .cls .ctl .Dsr .frm .vba`*;
this snapshot carries the contested `.cls`/`.frm` (heuristic groups) but
not the VB6-only designer extensions `.ctl` (UserControl) and `.dsr`
(Data Environment / Designer file). Both are single-claimant pure ext-map
hits — no disambiguation needed.

Deliberately NOT added: `.bas` membership for VB6. Upstream's `.bas`
group disambiguates FreeBASIC/BASIC/VBA/VB6, and the VBA-vs-VB6
discriminator (both are `Attribute VB_Name` modules) is not remembered
with confidence; claiming the extension without its rule would make VB6
an unreachable-but-advertised candidate and silently change the
alternatives list. Documented here per the batch-13 honesty stance.

*upstream also lists `.vba`, which this snapshot already routes through
the `.vba` VBA/Vim Script group.

Provenance: PUBLIC github-linguist languages.yml facts.

Run:  python scripts/widen_langs17.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")


def main() -> None:
    with open(os.path.join(DATA, "languages.json")) as f:
        langs = json.load(f)
    cur = langs["languages"]

    have = cur["Visual Basic 6.0"].setdefault("extensions", [])
    for ext in (".ctl", ".dsr"):
        if ext not in have:
            have.append(ext)

    if "--write" in sys.argv:
        with open(os.path.join(DATA, "languages.json"), "w") as f:
            json.dump(langs, f, indent=1, ensure_ascii=False)
            f.write("\n")
        print("written:", len(cur), "languages")
    else:
        print("dry run:", len(cur), "languages (pass --write)")


if __name__ == "__main__":
    main()
