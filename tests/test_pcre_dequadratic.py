"""The de-quadratic pattern rewrites must be match-existence-equivalent to
the originals on realistic inputs, and fast on adversarial ones."""

import re
import time

import pytest

from linguistjs_spark.metadata import load_metadata
from linguistjs_spark.pcre import convert_pcre
from linguistjs_spark.sources.pages import SEED_CASES


def _all_raw_patterns():
    import json

    from linguistjs_spark.metadata import _load_json

    h = _load_json("heuristics.json")
    out = []
    for d in h["disambiguations"]:
        for r in d["rules"]:
            for key in ("pattern", "negative_pattern"):
                v = r.get(key)
                if isinstance(v, str):
                    out.append(v)
                elif isinstance(v, list):
                    out.extend(v)
            for sub in r.get("and", []) or []:
                for key in ("pattern", "negative_pattern"):
                    v = sub.get(key)
                    if isinstance(v, str):
                        out.append(v)
                    elif isinstance(v, list):
                        out.extend(v)
            np = r.get("named_pattern")
            if np:
                v = h["named_patterns"][np]
                out.extend([v] if isinstance(v, str) else v)
    return sorted(set(out))


# equivalence corpus: every fixture text + structured probes around the
# rewrite's edge cases (leading blank lines, whitespace mixes, '#' rows,
# ':-' at line starts/ends/file start)
_PROBES = [
    "", "\n", "\n\n", "  \n  x", "\t\nimport a", ":-", "x:-", "\n:-",
    "#x\n:-", "x\n:-", "#\n:-", "a#b:-", "  :- y", "\n\n\n:-",
    "  \n\t\n namespace x {", "% comment\nfunction y =", "template <t>",
    "\r\n@interface", "  \r\n  #include <vector>", "use constant FOO;",
    "\n  \n*EXPORT =", "a\n\nb\n\n:-", "# only comments\n# more",
    " \t\v\f\r\nmodule X", "SELECT 1", "\nCREATE TABLE t", "x = 1;\n" * 50,
]


@pytest.mark.parametrize("raw", _all_raw_patterns())
def test_rewrite_is_existence_equivalent(raw):
    p_new, f_new = convert_pcre(raw, dequadratic=True)
    p_old, f_old = convert_pcre(raw, dequadratic=False)
    r_new = re.compile(p_new, f_new)
    r_old = re.compile(p_old, f_old)
    corpus = list(_PROBES) + [t for _, t in SEED_CASES]
    for text in corpus:
        assert bool(r_new.search(text)) == bool(r_old.search(text)), (
            raw, text[:60],
        )


def test_all_heuristic_patterns_fast_on_adversarial_input():
    md = load_metadata()
    adversarial = [
        "\n" * 50000, " " * 50000, ("\n " * 25000), "a" * 50000,
        ("import " * 7000) + "!", ("x = 1;\n" * 7000), ("#\n" * 25000),
    ]
    pats = []
    for d in md.disambiguations:
        for r in d["rules"]:
            for grp in r.get("and_groups", []) or []:
                pats.extend(grp)
            pats.extend(r.get("negatives", []) or [])
    assert pats
    for text in adversarial:
        for pat in pats:
            t0 = time.perf_counter()
            pat.search(text)
            assert time.perf_counter() - t0 < 0.1, (
                pat.pattern[:70], text[:20],
            )


def test_scrub_patterns_fast_on_adversarial_input():
    """The PII patterns must stay near-linear on pathological inputs: the
    unbounded email local-part once cost O(n^2) rescans on digit runs
    (240s for one 200KB page); the RFC-5321-bounded {0,63} form is O(64)
    per failed position. Python re timings proxy the Java engine (both
    backtracking NFAs with the same pattern)."""
    import re as _re
    import time as _time

    from linguistjs_spark.metadata import load_scrub_config

    adversarial = [
        "9" * 200000, "99." * 60000, "1.2.3." * 30000,
        ("a" * 100000) + "@" + ("b" * 90000), "a@" + "b" * 150000,
        ("9" * 100 + "@") * 1500,
    ]
    for rule in load_scrub_config()["pii_rules"]:
        pat = _re.compile(rule["pattern"])
        for text in adversarial:
            t0 = _time.perf_counter()
            pat.sub(rule["replacement"], text)
            assert _time.perf_counter() - t0 < 1.0, (
                rule["replacement"], text[:20],
            )


def test_url_filter_patterns_fast_on_adversarial_urls():
    """Vendor/documentation/generated URL regexes must stay fast on
    pathological paths (they run as one big Java rlike over every url):
    the upstream '([^\\s]*)import\\.css$' form was O(n^2) — its optional
    prefix group is existence-redundant and has been dropped."""
    import json
    import re as _re
    import time as _time

    from linguistjs_spark.metadata import _load_json

    f = _load_json("filters.json")
    adversarial = [
        "/bootstrap" + "." * 50000 + ".js", "/" * 50000 + "x.js",
        "/x" + "-min" * 20000 + ".js", "/jquery" + "a" * 50000 + ".js",
        "/" + "a" * 100000 + ".txt", "/" + "x" * 50000 + "import.css",
    ]
    pats = [
        p
        for key in ("vendor", "documentation", "generated")
        for p in f[key]
        if isinstance(p, str)
    ]
    assert pats
    for url in adversarial:
        for p in pats:
            rx = _re.compile(p, _re.IGNORECASE)
            t0 = _time.perf_counter()
            rx.search(url)
            assert _time.perf_counter() - t0 < 0.1, (p[:70], url[:25])


def test_glob_regexes_fast_and_equivalent():
    """glob_to_regex must emit '(^|/)' not '(^|.*/)' — search-equivalent,
    but the '.*/' branch cost O(len^2) per url (~6s for one 100KB path per
    glob, applied to EVERY row)."""
    import re as _re
    import time as _time

    from linguistjs_spark.metadata import glob_to_regex

    cases = [
        (".git/", "/deep/.git/config", True),
        (".git/", "/.git/HEAD", True),
        (".git/", "/not-git/x", False),
        ("*.min.js", "/a/b/lib.min.js", True),
        ("build/", "/x/build/out.o", True),
        ("/anchored.txt", "/anchored.txt", True),
        ("/anchored.txt", "/sub/anchored.txt", False),
    ]
    for glob, path, want in cases:
        rx = _re.compile(glob_to_regex(glob))
        assert bool(rx.search(path.lstrip("/"))) == want or bool(
            rx.search(path)
        ) == want, (glob, path)
    long_url = "/" + "b" * 100000 + ".txt"
    rx = _re.compile(glob_to_regex(".git/"), _re.IGNORECASE)
    t0 = _time.perf_counter()
    rx.search(long_url)
    assert _time.perf_counter() - t0 < 0.05


import pytest


@pytest.mark.parametrize("pat,unsafe", [
    (r"^\s*\nfoo", True),          # continuation starts with \n
    (r"^\s*\s+bar", True),         # continuation starts with \s
    (r"^\s* x", True),             # literal-space continuation
    (r"^\s*(import|module)\s", False),
    (r"^\s*[a-z]+", False),
    (r"^\s*(?:[ \t]|x)y", True),   # branch with a ws-capable first alternative
    (r"^\s*[^#]+:-", True),        # negated class matches whitespace
])
def test_dequadratic_structural_guard(pat, unsafe):
    """ADVICE r01: the ^\\s* intra-line rewrite must fail LOUDLY when a
    snapshot refresh introduces a pattern whose continuation can consume
    whitespace (the equivalence argument breaks there) — checked on the
    regex parse tree, not a probe corpus."""
    from linguistjs_spark.pcre import convert_pcre

    if unsafe:
        with pytest.raises(ValueError, match="unsafe _dequadratic"):
            convert_pcre(pat)
    else:
        convert_pcre(pat)


def test_snapshot_patterns_pass_structural_guard():
    # every heuristic pattern in the committed snapshot compiles through the
    # guard (load_metadata would raise otherwise)
    from linguistjs_spark.metadata import _build

    md = _build()
    assert md.disambiguations
