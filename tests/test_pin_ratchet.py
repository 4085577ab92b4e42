"""Pin-discipline ratchet (VERDICT r03 item 10).

Round 3 grew the snapshot in 12 batches, each landing with cascade_wide /
cascade_heuristics pin rows in the same commit. This test codifies that
discipline so it survives author turnover: the committed baseline
(``tests/data/pin_ratchet_baseline.json``) freezes exactly which snapshot
extensions and disambiguation groups are allowed to lack pins TODAY.

- Growing the snapshot (new languages/extensions/groups) without adding
  pins makes the unpinned set GROW past the baseline -> fail, with the
  offending names in the message. The fix is to add pin rows (preferred)
  or deliberately edit the baseline file in the same commit, where a
  reviewer sees it.
- Pinning a legacy entry shrinks the set -> the test demands the baseline
  be shrunk too, so the ratchet only ever tightens.

No Spark session needed; pure set algebra over the committed JSON + the
driver entry fixtures, so it runs in milliseconds at the front of CI.
"""

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load():
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as E

    langs = json.loads(
        (REPO / "linguistjs_spark/data/languages.json").read_text()
    )["languages"]
    heur = json.loads(
        (REPO / "linguistjs_spark/data/heuristics.json").read_text()
    )["disambiguations"]
    baseline = json.loads(
        (REPO / "tests/data/pin_ratchet_baseline.json").read_text()
    )
    return E, langs, heur, baseline


def test_new_extensions_require_wide_pins():
    E, langs, _, baseline = _load()
    snapshot_exts = {
        e.lower() for spec in langs.values() for e in spec.get("extensions", [])
    }
    wide_pins = {e for e, _ in E._WIDE_EXT_LANGS}
    unpinned = snapshot_exts - wide_pins
    frozen = set(baseline["unpinned_extensions"])

    grew = sorted(unpinned - frozen)
    assert not grew, (
        "snapshot extensions added WITHOUT cascade_wide pins: "
        f"{grew} — add (ext, lang) rows to _WIDE_EXT_LANGS in "
        "__spark_entry__.py in the same commit (or, deliberately, to "
        "tests/data/pin_ratchet_baseline.json)"
    )
    stale = sorted(frozen - unpinned)
    assert not stale, (
        f"ratchet can tighten: {stale} are now pinned (or dropped from the "
        "snapshot) — remove them from tests/data/pin_ratchet_baseline.json "
        "so the ratchet holds at the new level"
    )


def test_new_heuristic_groups_require_content_pins():
    E, _, heur, baseline = _load()
    pinned_exts = {e for e, _, _ in E._HEUR_CASES}
    # groups are keyed by their lexicographically-smallest extension — a
    # stable identity that survives reordering within the JSON list
    unpinned_groups = sorted(
        min(g["extensions"])
        for g in heur
        if not (set(g["extensions"]) & pinned_exts)
    )
    frozen = baseline["legacy_unpinned_groups"]

    grew = sorted(set(unpinned_groups) - set(frozen))
    assert not grew, (
        "disambiguation groups added WITHOUT _HEUR_CASES content pins: "
        f"{grew} — every new group needs one (ext, content, expected_lang) "
        "case per rule branch in the same commit"
    )
    stale = sorted(set(frozen) - set(unpinned_groups))
    assert not stale, (
        f"ratchet can tighten: legacy groups {stale} are now pinned — "
        "remove them from tests/data/pin_ratchet_baseline.json"
    )


def test_wide_pins_stay_inside_snapshot():
    """Anti-drift guard in the other direction: every pinned extension must
    still exist in the snapshot (a language rename/removal that orphans a
    pin would otherwise silently test nothing)."""
    E, langs, _, _ = _load()
    snapshot_exts = {
        e.lower() for spec in langs.values() for e in spec.get("extensions", [])
    }
    orphans = sorted({e for e, _ in E._WIDE_EXT_LANGS} - snapshot_exts)
    assert not orphans, f"cascade_wide pins orphaned by snapshot edits: {orphans}"


def test_heuristic_pins_stay_inside_groups():
    E, _, heur, _ = _load()
    group_exts = {e for g in heur for e in g["extensions"]}
    orphans = sorted({e for e, _, _ in E._HEUR_CASES} - group_exts)
    assert not orphans, (
        f"_HEUR_CASES pins reference extensions outside every "
        f"disambiguation group: {orphans}"
    )
