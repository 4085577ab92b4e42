"""robots.txt disallow parsing + URL filtering for crawl compliance.

Completes the crawl-compliance tier next to the robots-META filter
(operators/extract.py:noindex_col): ``noindex`` honors the per-page meta
tag; this module honors the per-DOMAIN ``robots.txt`` Disallow rules —
the first filter a Common-Crawl-style pipeline applies, before any
content rule (reference analogue: LinguistJS's checkAttribute/ignored-
path gating happens before classification, /root/reference/src/index.ts:
149-193 — exclusion rules resolve before content is ever read).

Parsing semantics (RFC 9309 subset, deterministic, documented honestly):

* Lines are split on CRLF / bare CR / bare LF; ``#`` starts a comment
  (stripped to end of line); surrounding ASCII blanks — and a leading
  UTF-8 BOM — are trimmed.
* A *group* is introduced by one or more consecutive ``User-agent:``
  lines (blank/comment-only lines between them do NOT split the run; any
  other directive does — the next ``User-agent`` line after a directive
  starts a new group, per RFC 9309 §2.1).
* Only groups whose user-agent run contains ``*`` apply (we filter for
  the generic crawler; per-product tokens are out of scope).
* ``Disallow:`` lines in an applicable group contribute their value as a
  PATH-PREFIX rule, in file order. An empty value (``Disallow:``) means
  allow-all and contributes nothing.
* ``Allow:`` rules are collected alongside Disallow
  (``robots_group_rules_col``); the DEFAULT matching mode still ignores
  them — the conservative direction for a compliance filter (we may
  drop pages the site re-allowed, never the reverse) — while
  ``allow_precedence=True`` applies full RFC 9309 §2.2.2 longest-match
  semantics (specificity = raw rule character length (octet length for the ASCII rules real robots files carry), Allow wins ties — the
  priority scheme of Google's open-sourced parser). Other directives
  (``Crawl-delay``, ``Sitemap``, …) act only as group terminators for
  subsequent User-agent runs.
* Matching (RFC 9309 §2.2.3): a rule with no ``*`` and no trailing
  ``$`` blocks iff it is a byte PREFIX of the page's path (the fast
  path — one startswith, no regex). A rule containing ``*`` (any char
  sequence) or ending in ``$`` (end-of-path anchor) is translated to an
  anchored regex — every other regex metachar in the rule is escaped,
  so only the two RFC operators are live. The path includes the query
  string per §2.2.2; the fragment is already gone (operators/url_ops.py
  strips it during canonicalization). URLs are single-line by contract
  (real crawl URLs never carry raw newlines), which keeps the trailing
  ``$`` anchor engine-portable (Java/RE2/Python disagree only about
  ``$`` before a final newline).

Both stages are native column algebra:

* ``robots_group_rules_col`` — ONE ``F.aggregate`` fold over the
  split lines with a 3-field struct state ``(star, ruled, rules)``
  collecting (pfx, allow) rule structs; ``robots_disallow_rules_col``
  is its Disallow projection. Whole-stage-codegen JVM execution, no
  UDF, no shuffle; robots.txt bodies are KiB-sized so the per-row fold
  is trivially bounded.
* ``filter_robots_disallowed`` — rules table joined on domain
  (broadcast by default: one row per crawled domain at ~10^7-10^8
  domains can exceed broadcast limits, so ``broadcast_rules=False``
  degrades to a shuffle join on the domain key — the corpus shuffles
  ONCE on a short key, never on text), then one ``F.exists``
  prefix probe per page. html/text columns pass through untouched.

The DuckDB oracle cannot restate the fold (DuckDB 1.0's ``list_reduce``
loses accumulated nested-list state across iterations — verified), so
``__spark_entry__._robots_rules_oracle_sql`` restates the SAME semantics
as a window-function state machine: ``run_id`` = count of directive
lines before each line, a UA run's ``star`` = bool_or(arg='*'), each
Disallow line governed by the latest preceding UA run. The equivalence
of fold and window forms is exactly what the driver's hash check pins;
``parse_robots_disallow`` below is the imperative Python twin both are
tested against (tests/test_robots.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .url_ops import _TAIL_PAT, domain_col

# ASCII-blank trim (explicit class, never \s — Java/Python/RE2 disagree
# on \s membership, ADVICE r01) applied AFTER comment stripping. The
# leading class also eats a UTF-8 BOM: BOM-prefixed robots.txt files are
# common in the wild, and an unstripped BOM glues to 'User-agent' and
# silently parses the whole file to zero rules (round-5 review finding).
_TRIM = "^[\ufeff \t\r]+|[ \t\r]+$"
# RFC 9309 line terminators: CRLF, bare CR, bare LF (a CR-only body must
# not collapse to one garbage line — round-5 review finding)
_LINE_SPLIT = r"\r\n|\r|\n"
_UA_PAT = r"^user-agent[ \t]*:"
_DIS_PAT = r"^disallow[ \t]*:"
_ALW_PAT = r"^allow[ \t]*:"


def _clean_line(raw: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(raw, r"#.*$", ""), _TRIM, "")


def _directive_arg(line: Column) -> Column:
    """Value after the first ':' with blanks trimmed ('' if no colon)."""
    return F.regexp_replace(F.regexp_replace(line, r"^[^:]*:", ""), _TRIM, "")


def robots_group_rules_col(txt: Column) -> Column:
    """``array<struct<pfx:string, allow:boolean>>`` — every Disallow AND
    Allow rule of the user-agent-``*`` groups of one robots.txt body, in
    file order (see module docstring for the exact group semantics). One
    native fold; NULL text -> empty array. Feed to
    ``robots_blocked_precedence_col`` for full RFC longest-match
    semantics, or strip to the Disallow subset for the conservative
    default."""
    lines = F.split(F.coalesce(txt, F.lit("")), _LINE_SPLIT)
    empty = F.array().cast("array<struct<pfx:string,allow:boolean>>")
    init = F.struct(
        F.lit(False).alias("star"),
        # ruled=True so the file's FIRST user-agent line starts a fresh
        # run instead of merging with the (nonexistent) previous one
        F.lit(True).alias("ruled"),
        empty.alias("rules"),
    )

    def step(st: Column, raw: Column) -> Column:
        line = _clean_line(raw)
        low = F.lower(line)
        is_ua = low.rlike(_UA_PAT)
        is_dis = low.rlike(_DIS_PAT)
        is_alw = low.rlike(_ALW_PAT)
        arg = _directive_arg(line)
        star = st.getField("star")
        ruled = st.getField("ruled")
        rules = st.getField("rules")
        new_star = F.when(
            is_ua,
            F.when(ruled, arg == "*").otherwise(star | (arg == "*")),
        ).otherwise(star)
        new_ruled = F.when(is_ua, F.lit(False)).otherwise(
            F.when(line == "", ruled).otherwise(F.lit(True)))
        new_rules = F.when(
            (is_dis | is_alw) & star & (arg != ""),
            F.array_append(
                rules,
                F.struct(arg.alias("pfx"), is_alw.alias("allow"))),
        ).otherwise(rules)
        return F.struct(
            new_star.alias("star"),
            new_ruled.alias("ruled"),
            new_rules.alias("rules"),
        )

    return F.aggregate(lines, init, step, lambda st: st.getField("rules"))


def robots_disallow_rules_col(txt: Column) -> Column:
    """``array<string>`` of just the Disallow path rules for user-agent
    ``*``, in file order (the conservative default's input — Allow rules
    dropped, see module docstring)."""
    return F.transform(
        F.filter(robots_group_rules_col(txt), lambda r: ~r.getField("allow")),
        lambda r: r.getField("pfx"),
    )


# RFC 9309 §2.2.3 wildcard translation: escape every regex metachar
# except '*', collapse '*'-runs to '.*', turn a rule-final escaped '$'
# back into the end anchor. The same three regexp_replace steps are
# restated verbatim in the DuckDB oracle and in the Python twin below.
_RULE_ESC_PAT = r"([.^$+?(){}\[\]|\\])"


def _rule_regex_col(rule: Column) -> Column:
    esc = F.regexp_replace(rule, _RULE_ESC_PAT, r"\\$1")
    esc = F.regexp_replace(esc, r"\*+", ".*")
    # Java replacement syntax: a bare '$' is a group ref, so the literal
    # anchor must be written '\$' (DuckDB/RE2 replacement takes '$' raw —
    # the two translations still emit the same STRING)
    return F.regexp_replace(esc, r"\\\$$", r"\$")


def _rule_is_wild(rule: Column) -> Column:
    return rule.contains("*") | rule.endswith("$")


def rule_match_col(path: Column, rule: Column) -> Column:
    """True iff one Disallow rule matches a path: startswith fast path
    for literal rules, anchored dynamic regex only for rules that
    actually use '*' or a trailing '$' (regex compile cost is paid per
    wildcard rule only)."""
    return F.when(
        _rule_is_wild(rule),
        F.regexp_like(path, F.concat(F.lit("^"), _rule_regex_col(rule))),
    ).otherwise(path.startswith(rule))


def robots_blocked_precedence_col(path: Column, rules: Column) -> Column:
    """Full RFC 9309 §2.2.2 precedence over a
    ``array<struct<pfx,allow>>`` rules column: among ALL matching rules
    the most specific wins — specificity = character length of the raw rule
    text, Allow winning ties (the priority scheme of Google's
    open-sourced robots.txt parser, which counts octets — identical for
    the ASCII rules real robots files carry). Blocked iff the winning
    rule is a Disallow; no matching rule means allowed. One native fold
    over the (small) rules array, wildcard rules still pay regex cost
    only for themselves."""
    init = F.struct(
        F.lit(-1).alias("a"),  # best matching Allow length
        F.lit(-1).alias("d"),  # best matching Disallow length
    )

    def step(st: Column, r: Column) -> Column:
        hit = rule_match_col(path, r.getField("pfx"))
        ln = F.length(r.getField("pfx"))
        a = st.getField("a")
        d = st.getField("d")
        return F.struct(
            F.when(hit & r.getField("allow") & (ln > a), ln)
            .otherwise(a).alias("a"),
            F.when(hit & ~r.getField("allow") & (ln > d), ln)
            .otherwise(d).alias("d"),
        )

    best = F.aggregate(rules, init, step)
    return best.getField("d") > best.getField("a")


def robots_rules_table(
    robots: DataFrame, url_col: str = "url", text_col: str = "robots_txt"
) -> DataFrame:
    """(domain, rules array<string>) — Disallow rules only, one row per
    robots.txt document. ``url`` may be the robots.txt URL or any
    same-host URL (only the host is read)."""
    return robots.select(
        domain_col(F.col(url_col)).alias("domain"),
        robots_disallow_rules_col(F.col(text_col)).alias("rules"),
    )


def robots_group_rules_table(
    robots: DataFrame, url_col: str = "url", text_col: str = "robots_txt"
) -> DataFrame:
    """(domain, rules array<struct<pfx,allow>>) — the full rule set for
    RFC precedence matching."""
    return robots.select(
        domain_col(F.col(url_col)).alias("domain"),
        robots_group_rules_col(F.col(text_col)).alias("rules"),
    )


def url_path_col(url: Column) -> Column:
    """Path + query (fragment already stripped here), '/' for a bare
    host — the robots matching target per RFC 9309 §2.2.2. A URL with an
    empty path but a query ('https://h?q=1') matches as '/?q=1', so
    'Disallow: /' covers it (round-5 review finding)."""
    tail = F.regexp_replace(
        F.regexp_replace(url, r"#.*$", ""), _TAIL_PAT, "")
    return (
        F.when(tail == "", F.lit("/"))
        .when(tail.startswith("?"), F.concat(F.lit("/"), tail))
        .otherwise(tail)
    )


def with_robots_blocked(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    robots_url_col: str = "url",
    robots_text_col: str = "robots_txt",
    flag_col: str = "robots_blocked",
    broadcast_rules: bool = True,
    allow_precedence: bool = False,
) -> DataFrame:
    """Add ``flag_col`` (boolean). Default: True iff some applicable
    Disallow rule matches the page's path — Allow rules ignored, the
    conservative (drop-side-safe) stance. ``allow_precedence=True``
    switches to full RFC 9309 §2.2.2 longest-match semantics (Allow can
    re-admit a page a broader Disallow covers; ties go to Allow). Pages
    on domains with no robots.txt row (or a rule-less one) are never
    blocked either way.

    Scale: rules ride a broadcast join on ``domain`` by default; at
    crawl-wide domain counts pass ``broadcast_rules=False`` for a shuffle
    join on the short domain key (text/html columns still cross the wire
    exactly once, as part of the page row they started in)."""
    if allow_precedence:
        rules = robots_group_rules_table(
            robots, robots_url_col, robots_text_col)
        empty = F.array().cast("array<struct<pfx:string,allow:boolean>>")
    else:
        rules = robots_rules_table(robots, robots_url_col, robots_text_col)
        empty = F.array().cast("array<string>")
    # collapse duplicate robots rows per domain (recrawled robots files
    # are routine; without this the left join fans every surviving page
    # out once per duplicate row — round-5 review finding). Union of all
    # captures' rules: order across captures is not defined, which is
    # harmless because neither matcher is order-sensitive (exists / max
    # fold) — and strictly conservative for the any-match default.
    rules = rules.groupBy("domain").agg(
        F.flatten(F.collect_list("rules")).alias("rules"))
    if broadcast_rules:
        rules = F.broadcast(rules)
    path = url_path_col(F.col(url_col))
    joined = pages.withColumn("_robots_path", path).join(
        rules, domain_col(F.col(url_col)) == rules["domain"], "left")
    rules_arr = F.coalesce(rules["rules"], empty)
    if allow_precedence:
        blocked = robots_blocked_precedence_col(
            F.col("_robots_path"), rules_arr)
    else:
        blocked = F.exists(
            rules_arr,
            lambda r: rule_match_col(F.col("_robots_path"), r),
        )
    return (
        joined.withColumn(flag_col, blocked)
        .drop(rules["domain"]).drop(rules["rules"]).drop("_robots_path")
    )


def filter_robots_disallowed(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    robots_url_col: str = "url",
    robots_text_col: str = "robots_txt",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Drop pages a generic crawler may not fetch (the crawl-compliance
    gate a web pipeline runs FIRST, before noindex/content rules)."""
    flagged = with_robots_blocked(
        pages, robots, url_col, robots_url_col, robots_text_col,
        "_robots_blocked", broadcast_rules)
    return flagged.filter(~F.col("_robots_blocked")).drop("_robots_blocked")


def robots_sitemaps_col(txt: Column) -> Column:
    """``array<string>`` of Sitemap URLs from one robots.txt body, in
    file order. Per RFC 9309 §2.3 / sitemaps.org, ``Sitemap:`` is NOT
    group-scoped — it applies wherever it appears — so this is a plain
    filter+transform over the split lines, no state machine. Empty
    values are dropped; NULL text -> empty array."""
    lines = F.split(F.coalesce(txt, F.lit("")), _LINE_SPLIT)
    cleaned = F.transform(lines, _clean_line)
    hits = F.filter(cleaned, lambda l: F.lower(l).rlike(r"^sitemap[ \t]*:"))
    return F.filter(F.transform(hits, _directive_arg), lambda a: a != "")


# XML entity decode for sitemap <loc> values: the five predefined XML
# entities, &amp; LAST so '&amp;lt;' decodes to the literal '&lt;' (same
# ordering discipline as operators/extract.py step 6).
_XML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&amp;", "&")]
_SM_TRIM = r"^[ \t\r\n]+|[ \t\r\n]+$"


def sitemap_locs_col(xml: Column) -> Column:
    """``array<string>`` of ``<loc>`` URLs from one sitemap or
    sitemapindex body, in document order — the crawl-frontier step after
    ``robots_sitemaps_col``. ONE regexp_extract_all scan (case-insensitive
    tag match, explicit ASCII whitespace trim — never ``\\s``), then
    literal entity decode per loc; empties dropped; NULL -> empty array.
    No real XML parser on purpose: crawl sitemaps are routinely malformed,
    and the <loc> scan is the part that survives tag soup."""
    raw = F.regexp_extract_all(
        F.coalesce(xml, F.lit("")), F.lit(r"(?i)<loc>([^<]*)</loc>"), 1)

    def decode(u: Column) -> Column:
        out = F.regexp_replace(u, _SM_TRIM, "")
        for ent, ch in _XML_ENTITIES:
            out = F.replace(out, F.lit(ent), F.lit(ch))
        return out

    return F.filter(F.transform(raw, decode), lambda u: u != "")


# ---------------------------------------------------------------------------
# pure-Python twin (oracle/test reference, same spec — imperative form)
# ---------------------------------------------------------------------------

import re as _re

_UA_RE = _re.compile(r"^user-agent[ \t]*:")
_DIS_RE = _re.compile(r"^disallow[ \t]*:")


_ALW_RE = _re.compile(r"^allow[ \t]*:")


def parse_robots_group(txt: str | None) -> list[tuple[str, bool]]:
    """Imperative twin of ``robots_group_rules_col``: (pfx, allow)
    pairs in file order (pinned in tests/test_robots.py)."""
    star, ruled, rules = False, True, []
    for raw in _re.split(_LINE_SPLIT, txt or ""):
        line = _re.sub(_TRIM, "", _re.sub(r"#.*$", "", raw))
        low = line.lower()
        arg = _re.sub(_TRIM, "", _re.sub(r"^[^:]*:", "", line))
        if _UA_RE.match(low):
            star = (arg == "*") if ruled else (star or arg == "*")
            ruled = False
            continue
        if line == "":
            continue
        if star and arg != "":
            if _DIS_RE.match(low):
                rules.append((arg, False))
            elif _ALW_RE.match(low):
                rules.append((arg, True))
        ruled = True
    return rules


def parse_robots_disallow(txt: str | None) -> list[str]:
    """Imperative twin of ``robots_disallow_rules_col``."""
    return [p for p, allow in parse_robots_group(txt) if not allow]


def _rule_to_regex(rule: str) -> str:
    esc = _re.sub(r"([.^$+?(){}\[\]|\\])", r"\\\1", rule)
    esc = _re.sub(r"\*+", ".*", esc)
    return _re.sub(r"\\\$$", "$", esc)


def _rule_hits(url_path: str, rule: str) -> bool:
    if "*" in rule or rule.endswith("$"):
        return _re.match("^" + _rule_to_regex(rule), url_path) is not None
    return url_path.startswith(rule)


def robots_blocked(url_path: str, rules: list[str]) -> bool:
    return any(_rule_hits(url_path, r) for r in rules)


def robots_blocked_precedence(
    url_path: str, rules: list[tuple[str, bool]]
) -> bool:
    """Imperative twin of ``robots_blocked_precedence_col``."""
    best_a, best_d = -1, -1
    for pfx, allow in rules:
        if _rule_hits(url_path, pfx):
            if allow:
                best_a = max(best_a, len(pfx))
            else:
                best_d = max(best_d, len(pfx))
    return best_d > best_a


def parse_sitemap_locs(xml: str | None) -> list[str]:
    """Imperative twin of ``sitemap_locs_col``."""
    out = []
    for m in _re.findall(r"(?i)<loc>([^<]*)</loc>", xml or ""):
        u = _re.sub(_SM_TRIM, "", m)
        for ent, ch in _XML_ENTITIES:
            u = u.replace(ent, ch)
        if u:
            out.append(u)
    return out


_SM_RE = _re.compile(r"^sitemap[ \t]*:")


def parse_robots_sitemaps(txt: str | None) -> list[str]:
    """Imperative twin of ``robots_sitemaps_col``."""
    out = []
    for raw in _re.split(_LINE_SPLIT, txt or ""):
        line = _re.sub(_TRIM, "", _re.sub(r"#.*$", "", raw))
        if _SM_RE.match(line.lower()):
            arg = _re.sub(_TRIM, "", _re.sub(r"^[^:]*:", "", line))
            if arg:
                out.append(arg)
    return out


# Crawl-delay extraction: not in RFC 9309, but honored by Bing/Yandex and
# ubiquitous in real robots files; the politeness tier consumes it
# (url_ops.politeness_schedule_with_delays). Semantics: the FIRST
# Crawl-delay line with a positive decimal value inside a user-agent-*
# group wins (later values and values in non-star groups are ignored;
# 0 and non-numeric values are invalid — a zero delay means "no limit",
# which is the same as absent). Like every other non-UA directive it
# terminates a user-agent run (the generic `ruled` logic).
_CD_PAT = r"^crawl-delay[ \t]*:"
_CD_NUM_PAT = r"^[0-9]+(\.[0-9]+)?$"


def robots_crawl_delay_col(txt: Column) -> Column:
    """Crawl-delay seconds (double) for the generic crawler, NULL when no
    star group carries a valid positive value. Same one-fold shape as
    ``robots_group_rules_col`` with scalar (star, ruled, delay) state."""
    lines = F.split(F.coalesce(txt, F.lit("")), _LINE_SPLIT)
    init = F.struct(
        F.lit(False).alias("star"),
        F.lit(True).alias("ruled"),
        F.lit(None).cast("double").alias("delay"),
    )

    def step(st: Column, raw: Column) -> Column:
        line = _clean_line(raw)
        low = F.lower(line)
        is_ua = low.rlike(_UA_PAT)
        is_cd = low.rlike(_CD_PAT)
        arg = _directive_arg(line)
        star = st.getField("star")
        ruled = st.getField("ruled")
        delay = st.getField("delay")
        new_star = F.when(
            is_ua,
            F.when(ruled, arg == "*").otherwise(star | (arg == "*")),
        ).otherwise(star)
        new_ruled = F.when(is_ua, F.lit(False)).otherwise(
            F.when(line == "", ruled).otherwise(F.lit(True)))
        valid = is_cd & star & arg.rlike(_CD_NUM_PAT) \
            & (arg.cast("double") > 0)
        new_delay = F.coalesce(delay, F.when(valid, arg.cast("double")))
        return F.struct(
            new_star.alias("star"),
            new_ruled.alias("ruled"),
            new_delay.alias("delay"),
        )

    return F.aggregate(lines, init, step, lambda st: st.getField("delay"))


def parse_crawl_delay(txt: str | None) -> float | None:
    """Imperative twin of ``robots_crawl_delay_col``."""
    star, ruled, delay = False, True, None
    for raw in _re.split(_LINE_SPLIT, txt or ""):
        line = _re.sub(_TRIM, "", _re.sub(r"#.*$", "", raw))
        low = line.lower()
        arg = _re.sub(_TRIM, "", _re.sub(r"^[^:]*:", "", line))
        if _UA_RE.match(low):
            star = (arg == "*") if ruled else (star or arg == "*")
            ruled = False
            continue
        if line == "":
            continue
        if (delay is None and star and _re.match(_CD_PAT, low)
                and _re.match(_CD_NUM_PAT, arg) and float(arg) > 0):
            delay = float(arg)
        ruled = True
    return delay
