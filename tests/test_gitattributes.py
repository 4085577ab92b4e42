"""gitattributes/gitignore parsing — mirrors the reference's sample file
(/root/reference/test/samples/.gitattributes) and parse-gitattributes.ts
semantics."""

from linguistjs_spark.config import REFERENCE_PARITY_CONFIG as CFG
from linguistjs_spark.gitattributes import parse_gitattributes, parse_gitignore
from linguistjs_spark.oracle import analyse_document

SAMPLE = """
# comment line
file.txt linguist-language=JS
vendored linguist-vendored
package-lock.json linguist-generated=false
detected.json linguist-detectable
images/* binary
notes/*.bin -binary text
multi linguist-language=Ruby linguist-language=Python
neg -linguist-vendored -linguist-documentation
"""


def test_parse_sample():
    rules = {r.glob: r for r in parse_gitattributes(SAMPLE)}
    assert rules["file.txt"].language == "JS"
    assert rules["vendored"].vendored is True
    assert rules["package-lock.json"].generated is False
    assert rules["detected.json"].detectable is True
    assert rules["images/*"].binary is True
    assert rules["notes/*.bin"].binary is False
    # last linguist-language wins (parse-gitattributes.ts:49)
    assert rules["multi"].language == "Python"
    assert rules["neg"].vendored is False and rules["neg"].documentation is False


def test_folder_relative_globs():
    rules = parse_gitattributes("*.js linguist-vendored", folder_root="sub/dir")
    assert rules[0].glob == "sub/dir/*.js"
    r = analyse_document(
        "https://x/sub/dir/app.js", "var x;", cfg=CFG, overrides=rules
    )
    assert not r.keep and r.keep_reason == "vendored"
    r = analyse_document("https://x/other/app.js", "var x;", cfg=CFG, overrides=rules)
    assert r.keep


def test_parsed_rules_drive_oracle():
    rules = parse_gitattributes(SAMPLE)
    r = analyse_document("https://x/file.txt", "hello", cfg=CFG, overrides=rules)
    assert r.lang == "JavaScript" and r.definite
    r = analyse_document("https://x/images/a", "x", cfg=CFG, overrides=rules)
    assert not r.keep and r.keep_reason == "binary-ext"


def test_parse_gitignore():
    globs = parse_gitignore("# c\n\n.gitignore\nbuild/\n*.tmp  # trailing\n")
    assert globs == [".gitignore", "build/", "*.tmp"]
