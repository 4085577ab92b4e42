"""jusText-style boilerplate-paragraph classification for web pages.

A paragraph-granular quality gate in the spirit of jusText (Pomikalek
2011, "Removing Boilerplate and Duplicate Content from Web Corpora" --
public algorithm; default thresholds below are the published ones).  Where
LinguistJS drops whole *files* via vendored/generated globs
(/root/reference/src/index.ts:149-193), a web-text corpus additionally
needs to drop boilerplate *within* a kept page -- navigation bars, link
farms, footers -- before any downstream quality/dedup stage sees the text.

Spec (deterministic; simplified vs the DOM-based original, every delta
documented):

1. segmentation: decode html (utf-8 cast), drop script/style/comment
   blocks (the extract.py passes), normalize raw ``[\\r\\n]`` to spaces
   (the original segments on DOM blocks only, never raw newlines), then
   replace every block-level tag with ``\\n`` and split.  Fragments still
   carry their inline tags (``<a>`` in particular).  Anchors that span a
   block boundary are cut by the segmentation (regex approximation of the
   DOM walk; deterministic).
2. per-fragment features, all computed on the *tag-stripped, entity-
   decoded, space-normalized* text (``ptext``):
   - ``plen``  = char length of ptext
   - ``llen``  = char length of the concatenated anchor (``<a>...</a>``)
     inner texts, stripped the same way; ``link_density = llen / plen``
   - words = ptext split on spaces; stopword matching strips leading and
     trailing non-alphanumerics and lowercases (the original tokenizes on
     the DOM text; this is the same up to punctuation handling);
     ``stop_density = stopword_words / words``
3. context-free label (jusText order of tests, jusText defaults):
   - copyright mark (``©`` or the literal ``&copy;``) -> ``bad``
   - ``link_density > 0.2``                                 -> ``bad``
   - ``plen < 70``: ``bad`` if the fragment had any anchor text else
     ``short``
   - ``stop_density >= 0.32``: ``good`` if ``plen > 200`` else
     ``near-good``
   - ``stop_density >= 0.30``                               -> ``near-good``
   - otherwise                                              -> ``bad``
   Empty fragments (ptext == '') are removed before labeling, so context
   adjacency skips them (the original ignores empty DOM blocks too).
4. context-sensitive revise (simplified vs the original's multi-pass
   header handling): for each ``short``/``near-good`` fragment, let
   ``prev``/``nxt`` be the nearest context-free ``good``/``bad`` label
   scanning outward (``bad`` past either document edge).  Then
   ``near-good`` -> ``good`` iff prev or nxt is ``good``;
   ``short``     -> ``good`` iff prev and nxt are both ``good``;
   else ``bad``.  ``good``/``bad`` are final.
5. ``content`` = the final-``good`` ptexts joined by ``\\n`` -- the
   boilerplate-stripped page text.

Scale posture: one projection, zero shuffles, zero Python -- the whole
chain is native column algebra (regexp passes + higher-order functions),
so at 10^12 documents it is scan-bound exactly like extract.py.  The
context pass is an in-array fold; array concatenation makes it
O(max_frags^2) column ops per row worst case, so fragments are capped at
``max_frags`` (default 512 -- a real page rarely has >10^2 block
fragments; the cap bounds adversarial pages and is a documented knob).

The pure-Python twin (`classify_fragments` / `content_text`) is pinned
against the Spark chain in tests/test_boilerplate.py and generates the
DuckDB oracle rows for the ``boilerplate_stats`` driver query (same
twin-VALUES pattern as html_extract).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .extract import _ENTITY_PASSES

# ---------------------------------------------------------------------------
# spec constants (single source of truth for Spark chain + Python twin)
# ---------------------------------------------------------------------------

# jusText published defaults.
MAX_LINK_DENSITY = 0.2
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32
MAX_FRAGS = 512

# English function-word stoplist (public-knowledge closed-class words; the
# original ships per-language lists of the same kind).  Sorted, lowercase.
STOPWORDS_EN = sorted({
    "a", "about", "after", "all", "also", "an", "and", "any", "are", "as",
    "at", "be", "because", "been", "before", "but", "by", "can", "could",
    "did", "do", "does", "for", "from", "had", "has", "have", "he", "her",
    "here", "him", "his", "how", "i", "if", "in", "into", "is", "it",
    "its", "just", "may", "more", "most", "my", "no", "not", "now", "of",
    "on", "one", "only", "or", "other", "our", "out", "over", "she", "so",
    "some", "such", "than", "that", "the", "their", "them", "then",
    "there", "these", "they", "this", "to", "under", "up", "was", "we",
    "were", "what", "when", "where", "which", "while", "who", "will",
    "with", "would", "you", "your",
})

# block-level tags -> fragment boundaries (same list as extract.py's
# newline pass, same (?![a-zA-Z0-9]) guard rationale).
_BLOCK_TAGS = (
    "p|div|br|li|h[1-6]|tr|td|th|table|ul|ol|blockquote|pre|section|"
    "article|header|footer|nav|hr|title"
)

# pre-segmentation passes over the whole document (order matters).
_PRE_PASSES = [
    (r"(?is)<script(?![a-zA-Z0-9])[^>]*>.*?</script[ \t\r\n\f\x0b]*>", ""),
    (r"(?is)<style(?![a-zA-Z0-9])[^>]*>.*?</style[ \t\r\n\f\x0b]*>", ""),
    (r"(?s)<!--.*?-->", ""),
    (r"[\r\n]+", " "),
    (r"(?i)</?(?:" + _BLOCK_TAGS + r")(?![a-zA-Z0-9])[^>]*>", "\n"),
]

# anchor inner-html extraction (group 1); newlines are already gone so no
# DOTALL needed.  Non-greedy: nested anchors are cut at the first close
# (malformed html; deterministic in both engines).
_ANCHOR_PAT = r"(?i)<a(?![a-zA-Z0-9])[^>]*>(.*?)</a[ \t\f\x0b]*>"

# fragment text cleanup: strip remaining tags, decode entities
# (extract.py order, &amp; last), collapse ASCII whitespace, trim.
_TAG_PAT = r"<[^>]*>"
_WS_PAT = r"[ \t\f\x0b]+"
# word -> stopword-lookup key: strip non-alphanumeric edges (lowercasing
# is applied separately).
_EDGE_PUNCT_PAT = r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$"

_GOOD, _BAD, _SHORT, _NEAR = "good", "bad", "short", "near-good"


# ---------------------------------------------------------------------------
# Spark column chain
# ---------------------------------------------------------------------------

def _clean_col(s: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-normalize a fragment."""
    s = F.regexp_replace(s, _TAG_PAT, " ")
    for lit, rep in _ENTITY_PASSES:
        s = F.replace(s, F.lit(lit), F.lit(rep))
    s = F.regexp_replace(s, _WS_PAT, " ")
    return F.trim(s)


def _stop_count_col(ptext: Column) -> Column:
    stop_arr = F.lit(STOPWORDS_EN)
    words = F.filter(F.split(ptext, "[ ]"), lambda w: w != F.lit(""))
    keyed = F.transform(
        words,
        lambda w: F.lower(F.regexp_replace(w, _EDGE_PUNCT_PAT, "")),
    )
    n_words = F.size(words)
    n_stop = F.size(F.filter(keyed, lambda k: F.array_contains(stop_arr, k)))
    return F.struct(n_words.alias("n_words"), n_stop.alias("n_stop"))


def fragment_structs_col(html: Column, max_frags: int = MAX_FRAGS) -> Column:
    """array<struct{ptext, plen, llen, n_words, n_stop, label}> of the
    page's non-empty fragments with context-free labels, in order."""
    s = F.coalesce(html.cast("string"), F.lit(""))
    for pat, rep in _PRE_PASSES:
        s = F.regexp_replace(s, pat, rep)
    frags = F.slice(F.split(s, "\n"), 1, max_frags)

    def _featurize(frag: Column) -> Column:
        anchors = F.array_join(
            F.regexp_extract_all(frag, F.lit(_ANCHOR_PAT), F.lit(1)), " "
        )
        ptext = _clean_col(frag)
        ltext = _clean_col(anchors)
        plen = F.length(ptext)
        llen = F.length(ltext)
        wc = _stop_count_col(ptext)
        n_words = wc["n_words"]
        n_stop = wc["n_stop"]
        link_density = F.when(
            plen > 0, llen.cast("double") / plen.cast("double")
        ).otherwise(F.lit(0.0))
        stop_density = F.when(
            n_words > 0, n_stop.cast("double") / n_words.cast("double")
        ).otherwise(F.lit(0.0))
        label = (
            F.when(
                ptext.contains("©") | ptext.contains("&copy;"),
                F.lit(_BAD),
            )
            .when(link_density > F.lit(MAX_LINK_DENSITY), F.lit(_BAD))
            .when(
                plen < F.lit(LENGTH_LOW),
                F.when(llen > 0, F.lit(_BAD)).otherwise(F.lit(_SHORT)),
            )
            .when(
                stop_density >= F.lit(STOPWORDS_HIGH),
                F.when(plen > F.lit(LENGTH_HIGH), F.lit(_GOOD)).otherwise(
                    F.lit(_NEAR)
                ),
            )
            .when(stop_density >= F.lit(STOPWORDS_LOW), F.lit(_NEAR))
            .otherwise(F.lit(_BAD))
        )
        return F.struct(
            ptext.alias("ptext"),
            plen.alias("plen"),
            llen.alias("llen"),
            n_words.alias("n_words"),
            n_stop.alias("n_stop"),
            label.alias("label"),
        )

    structs = F.transform(frags, _featurize)
    return F.filter(structs, lambda x: x["ptext"] != F.lit(""))


def _nearest_fold_col(labels: Column) -> Column:
    """Forward scan: element i = the nearest PRECEDING context-free
    good/bad label ('bad' when there is none).  In-array fold -- zero
    shuffle; O(n^2) array-concat bounded by the max_frags cap."""
    init = F.struct(
        F.array().cast("array<string>").alias("prev"),
        F.lit(_BAD).alias("last"),
    )

    def _step(acc: Column, x: Column) -> Column:
        return F.struct(
            F.concat(acc["prev"], F.array(acc["last"])).alias("prev"),
            F.when(
                (x == F.lit(_GOOD)) | (x == F.lit(_BAD)), x
            ).otherwise(acc["last"]).alias("last"),
        )

    return F.aggregate(labels, init, _step, lambda acc: acc["prev"])


def final_labels_col(labels: Column, prev: Column, nxt: Column) -> Column:
    """array<string> of final (context-revised) labels.  ``labels`` is the
    context-free label array; ``prev``/``nxt`` are the nearest-good/bad
    arrays from :func:`_nearest_fold_col`.  They MUST be materialized
    column references (not inline fold expressions): the revise lambda
    references each twice, and an inline fold would be re-evaluated per
    reference (the fold is O(n^2) already -- see with_boilerplate)."""

    def _revise(x: Column, i: Column) -> Column:
        p = F.element_at(prev, i + 1)
        n = F.element_at(nxt, i + 1)
        return (
            F.when((x == F.lit(_GOOD)) | (x == F.lit(_BAD)), x)
            .when(
                x == F.lit(_NEAR),
                F.when(
                    (p == F.lit(_GOOD)) | (n == F.lit(_GOOD)), F.lit(_GOOD)
                ).otherwise(F.lit(_BAD)),
            )
            .otherwise(  # short
                F.when(
                    (p == F.lit(_GOOD)) & (n == F.lit(_GOOD)), F.lit(_GOOD)
                ).otherwise(F.lit(_BAD))
            )
        )

    return F.transform(labels, _revise)


def with_boilerplate(
    df: DataFrame,
    html_col: str = "html",
    prefix: str = "bp_",
    max_frags: int = MAX_FRAGS,
) -> DataFrame:
    """Attach boilerplate columns: ``{prefix}labels`` (final labels),
    ``{prefix}texts`` (fragment ptexts), ``{prefix}content`` (good
    fragments joined by newline), ``{prefix}n_frags``, ``{prefix}n_good``.
    One projection; no shuffle, no Python.  The context-free label array
    and the two nearest-neighbour fold arrays are materialized as interim
    columns so each O(n^2) fold evaluates once per row per direction --
    Catalyst's CollapseProject keeps non-cheap multiply-referenced
    aliases in their own Project instead of re-inlining them."""
    structs = fragment_structs_col(F.col(html_col), max_frags=max_frags)
    df = df.withColumn(prefix + "structs", structs)
    raw = F.transform(F.col(prefix + "structs"), lambda x: x["label"])
    df = df.withColumn(prefix + "raw_labels", raw)
    df = df.withColumn(
        prefix + "prev", _nearest_fold_col(F.col(prefix + "raw_labels"))
    ).withColumn(
        prefix + "nxt",
        F.reverse(_nearest_fold_col(F.reverse(F.col(prefix + "raw_labels")))),
    )
    df = df.withColumn(
        prefix + "labels",
        final_labels_col(
            F.col(prefix + "raw_labels"),
            F.col(prefix + "prev"),
            F.col(prefix + "nxt"),
        ),
    ).drop(prefix + "raw_labels", prefix + "prev", prefix + "nxt")
    texts = F.transform(F.col(prefix + "structs"), lambda x: x["ptext"])
    zipped = F.zip_with(
        texts,
        F.col(prefix + "labels"),
        lambda t, l: F.when(l == F.lit(_GOOD), t),
    )
    content = F.array_join(F.filter(zipped, lambda t: t.isNotNull()), "\n")
    return (
        df.withColumn(prefix + "texts", texts)
        .withColumn(prefix + "content", content)
        .withColumn(prefix + "n_frags", F.size(F.col(prefix + "labels")))
        .withColumn(
            prefix + "n_good",
            F.size(
                F.filter(
                    F.col(prefix + "labels"), lambda l: l == F.lit(_GOOD)
                )
            ),
        )
        .drop(prefix + "structs")
    )


# ---------------------------------------------------------------------------
# pure-Python twin (pinned byte-for-byte in pytest; generates the oracle)
# ---------------------------------------------------------------------------

_PRE_COMPILED = [(re.compile(p, re.ASCII), r) for p, r in _PRE_PASSES]
_ANCHOR_RX = re.compile(_ANCHOR_PAT, re.ASCII)
_TAG_RX = re.compile(_TAG_PAT, re.ASCII)
_WS_RX = re.compile(_WS_PAT, re.ASCII)
_EDGE_RX = re.compile(_EDGE_PUNCT_PAT, re.ASCII)
_STOP_SET = set(STOPWORDS_EN)


def _clean(s: str) -> str:
    s = _TAG_RX.sub(" ", s)
    for lit, rep in _ENTITY_PASSES:
        s = s.replace(lit, rep)
    return _WS_RX.sub(" ", s).strip(" ")


def _ctx_free_label(ptext: str, llen: int) -> str:
    words = [w for w in ptext.split(" ") if w]
    n_words = len(words)
    n_stop = sum(1 for w in words if _EDGE_RX.sub("", w).lower() in _STOP_SET)
    plen = len(ptext)
    link_density = (llen / plen) if plen > 0 else 0.0
    stop_density = (n_stop / n_words) if n_words > 0 else 0.0
    if "©" in ptext or "&copy;" in ptext:
        return _BAD
    if link_density > MAX_LINK_DENSITY:
        return _BAD
    if plen < LENGTH_LOW:
        return _BAD if llen > 0 else _SHORT
    if stop_density >= STOPWORDS_HIGH:
        return _GOOD if plen > LENGTH_HIGH else _NEAR
    if stop_density >= STOPWORDS_LOW:
        return _NEAR
    return _BAD


def classify_fragments(
    html: str | bytes, max_frags: int = MAX_FRAGS
) -> list[tuple[str, str]]:
    """Python twin of the Spark chain: ordered (final_label, ptext) pairs
    for the page's non-empty fragments."""
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    for rx, rep in _PRE_COMPILED:
        s = rx.sub(rep, s)
    frags = s.split("\n")[:max_frags]
    items = []
    for frag in frags:
        anchors = " ".join(_ANCHOR_RX.findall(frag))
        ptext = _clean(frag)
        if ptext == "":
            continue
        items.append((ptext, _ctx_free_label(ptext, len(_clean(anchors)))))

    labels = [lab for _, lab in items]
    n = len(labels)
    prev, last = [], _BAD
    for lab in labels:
        prev.append(last)
        if lab in (_GOOD, _BAD):
            last = lab
    nxt, last = [_BAD] * n, _BAD
    for i in range(n - 1, -1, -1):
        nxt[i] = last
        if labels[i] in (_GOOD, _BAD):
            last = labels[i]

    out = []
    for i, (ptext, lab) in enumerate(items):
        if lab in (_GOOD, _BAD):
            final = lab
        elif lab == _NEAR:
            final = _GOOD if _GOOD in (prev[i], nxt[i]) else _BAD
        else:  # short
            final = _GOOD if (prev[i] == _GOOD and nxt[i] == _GOOD) else _BAD
        out.append((final, ptext))
    return out


def content_text(html: str | bytes, max_frags: int = MAX_FRAGS) -> str:
    """Python twin of the ``{prefix}content`` column."""
    return "\n".join(
        t for lab, t in classify_fragments(html, max_frags) if lab == _GOOD
    )


# ---------------------------------------------------------------------------
# deterministic link-rich page synthesis (query fixture + tests share it):
# nav + heading + stopword-rich body + short teaser (+ second body on even
# ids) + link/copyright footer, so every label class and both context-pass
# outcomes (short between goods -> good; short before footer -> bad) occur.
# ---------------------------------------------------------------------------

_NAV = (
    '<div class="nav"><a href="/">Home</a> <a href="/tags">Tags</a> '
    '<a href="/about">About us</a> <a href="/contact">Contact</a></div>'
)
_BODY_PREFIX = (
    "It is the case that the results of the scan were good for all of "
    "them, and they said that this was what you have to do when the data "
    "is not there for you to see in the report. "
)
_BODY2 = (
    "After that they said there would be more of the same, and most of "
    "them were sure that this was how it would be for all of us from now "
    "on, because the data was there for everyone to see and to use when "
    "they would need it the most."
)
_TEASER = "Read it now."
_FOOTER = (
    '<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms of '
    "use</a> &copy; 2026 Example</footer>"
)


def synth_linked_html_col(doc_id: Column, text: Column) -> Column:
    body2 = F.when(
        doc_id % 2 == 0, F.lit("<p>" + _BODY2 + "</p>")
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<html><body>" + _NAV + "<h1>Doc "),
        doc_id.cast("string"),
        F.lit("</h1><p>" + _BODY_PREFIX),
        F.substring(text, 1, 80),
        F.lit("</p><p>" + _TEASER + "</p>"),
        body2,
        F.lit(_FOOTER + "</body></html>"),
    )


def synth_linked_html(doc_id: int, text: str) -> str:
    """Python twin of :func:`synth_linked_html_col`."""
    body2 = "<p>" + _BODY2 + "</p>" if doc_id % 2 == 0 else ""
    return (
        "<html><body>" + _NAV + "<h1>Doc " + str(doc_id) + "</h1>"
        + "<p>" + _BODY_PREFIX + text[:80] + "</p>"
        + "<p>" + _TEASER + "</p>" + body2
        + _FOOTER + "</body></html>"
    )
