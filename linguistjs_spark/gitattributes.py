"""Driver-side parsers for gitattributes / gitignore override config.

Analog of /root/reference/src/helpers/parse-gitattributes.ts:21-53 and
parse-gitignore.ts:1-9: config text is parsed ONCE on the driver into the
OverrideRule table / glob list consumed by the pipeline — the reference's
per-folder walk-time parsing collapses into config ingestion because a pages
table has no nested directories to walk.

Semantics mirrored exactly:
  - attr true  == present without '-' prefix and without '=false'
  - attr false == '-' prefix or '=false' suffix
  - binary: 'binary' or '-text' => true; '-binary' or 'text' => false
  - language: LAST 'linguist-language=X' wins (parse-gitattributes.ts:49)
  - '#' comments stripped; globs are folder-relative via folder_root
"""

from __future__ import annotations

import re

from .oracle import OverrideRule


def _norm_join(folder_root: str, glob: str) -> str:
    if not folder_root or folder_root == ".":
        return glob
    return folder_root.rstrip("/") + "/" + glob


def parse_gitattributes(content: str, folder_root: str = ".") -> list[OverrideRule]:
    out: list[OverrideRule] = []
    for raw_line in content.split("\n"):
        line = re.sub(r"#.*", "", raw_line).strip()
        if not line:
            continue
        parts = re.split(r"\s+", line)
        glob, attr_parts = parts[0], parts[1:]

        def is_true(s: str) -> bool:
            return not s.startswith("-") and not s.endswith("=false")

        def parts_for(key: str) -> list[str]:
            return [p for p in attr_parts if key in p]

        def bool_or_null(key: str) -> bool | None:
            true_parts = [p for p in parts_for(key) if is_true(p)]
            false_parts = [p for p in parts_for(key) if not is_true(p)]
            if true_parts:
                return True
            if false_parts:
                return False
            return None

        # binary: 'binary'/'-text' => true, '-binary'/'text' => false
        # (parse-gitattributes.ts:45)
        bin_true = [p for p in parts_for("binary") if is_true(p)] + [
            p for p in parts_for("text") if not is_true(p) and "linguist" not in p
        ]
        bin_false = [p for p in parts_for("binary") if not is_true(p)] + [
            p for p in parts_for("text") if is_true(p) and "linguist" not in p
        ]
        binary = True if bin_true else False if bin_false else None

        lang_parts = [p for p in parts_for("linguist-language") if is_true(p)]
        language = lang_parts[-1].split("=", 1)[1] if lang_parts else None

        out.append(
            OverrideRule(
                glob=_norm_join(folder_root, glob),
                generated=bool_or_null("linguist-generated"),
                vendored=bool_or_null("linguist-vendored"),
                documentation=bool_or_null("linguist-documentation"),
                detectable=bool_or_null("linguist-detectable"),
                binary=binary,
                language=language,
            )
        )
    return out


def parse_gitignore(content: str) -> list[str]:
    """Gitignore text -> glob list (parse-gitignore.ts:1-9: strips comments
    and blank lines; negations are not supported by the reference's usage)."""
    globs: list[str] = []
    for raw_line in content.split("\n"):
        line = re.sub(r"#.*", "", raw_line).strip()
        if line:
            globs.append(line)
    return globs
