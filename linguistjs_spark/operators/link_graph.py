"""Link-graph operators: outlink extraction, domain edges, PageRank.

The web-pipeline quality prior the reference has no analog for: real
Common-Crawl curation pipelines extract the hyperlink graph from raw html
and use link-based centrality (PageRank, Brin & Page 1998) as a
domain-level quality signal alongside content rules. Recast for this
engine's pages table (SURVEY.md recasts path-tree operators as URL/domain
operators):

* ``extract_outlinks`` — one native scan: ``regexp_extract_all`` over the
  decoded html pulls every ``href="..."`` target, exploded to
  ``(url, outlink)`` rows. No Python, no join; the html blob never
  survives past the projection.
* ``domain_edges`` — collapse links to the weighted domain graph
  ``(src, dst, w)`` with one map-side-combined groupBy (same Zipf-skew
  stance as ``url_ops.domain_rollup``: partial aggregation collapses hot
  domains per-partition before the exchange).
* ``domain_pagerank`` — fixed-iteration weighted PageRank in pure
  DataFrame algebra (the iterative pattern of ``dedup.near_dup_clusters``):
  per iteration one (src)-keyed join to propagate rank/out-weight along
  edges and one (dst)-keyed groupBy to sum contributions. Dangling mass
  is redistributed uniformly (rank stays a probability distribution).
  The two scalars the driver holds (node count, per-iteration dangling
  mass) are 1-row broadcast aggregates — nothing proportional to the
  graph ever reaches the driver. Lineage is truncated with
  localCheckpoint every other iteration so a deep iteration count cannot
  blow up the plan. At 10^12 pages the domain graph is ~10^8 nodes: every
  step here is a keyed shuffle on domains, the standard distributed
  PageRank shape.

Oracle: the driver query restates the fixture's edge arithmetic and the
unrolled iterations as DuckDB CTEs (``__spark_entry__._domain_pagerank
_oracle_sql``); parity is float-robust because each rank is a sum over a
bounded in-neighborhood re-rounded to 6 significant digits by the
driver's canonicalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .url_ops import domain_col

# href extraction: attribute-quoted targets only (both quote styles);
# conservative RE2-safe pattern. (The driver oracle restates the link
# ARITHMETIC of its fixture rather than re-running this regex; the
# noindex oracle is the one that pins regexes cross-engine verbatim.)
HREF_PAT = r"""href\s*=\s*["']([^"']+)["']"""


def outlinks_col(html_text: Column) -> Column:
    """Array of href targets in the (decoded) html string."""
    return F.regexp_extract_all(html_text, F.lit(HREF_PAT), 1)


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``(url, outlink)`` — one row per href occurrence (multiplicity
    preserved; the edge weight downstream is the link count)."""
    # cast, not decode: cast is the lenient binary->string conversion
    # (replacement chars for invalid bytes) — real crawl html is not
    # guaranteed UTF-8 and the scan must never fail on a bad page
    return pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            outlinks_col(F.col(html_col).cast("string"))
        ).alias("outlink"),
    )


# anchor extraction: href + inner text captured by ONE pattern; two
# regexp_extract_all calls with different group indexes stay aligned
# because the match set is identical (RE2-safe).
ANCHOR_PAT = r"""<a\s[^>]*href\s*=\s*["']([^"']+)["'][^>]*>([^<]*)</a>"""


def extract_anchors(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``(url, outlink, anchor)`` — one row per ``<a href>`` element with
    its (tag-free) inner text. Same one-scan shape as extract_outlinks;
    anchors with markup inside the element are skipped by the conservative
    ``[^<]*`` body (documented precision-over-recall stance: at corpus
    scale the lost anchors are the markup-heavy minority)."""
    html = F.col(html_col).cast("string")  # lenient, see extract_outlinks
    hrefs = F.regexp_extract_all(html, F.lit(ANCHOR_PAT), 1)
    texts = F.regexp_extract_all(html, F.lit(ANCHOR_PAT), 2)
    return pages.select(
        F.col(url_col).alias("url"),
        F.explode(F.arrays_zip(hrefs.alias("outlink"), texts.alias("anchor")))
        .alias("_a"),
    ).select("url", F.col("_a.outlink").alias("outlink"),
             F.col("_a.anchor").alias("anchor"))


def anchor_text_stats(anchors: DataFrame) -> DataFrame:
    """Per TARGET domain: how the web describes it — ``(domain,
    n_anchors, n_src_domains, total_anchor_chars)``. The inbound
    anchor-text profile is the classic query-independent relevance signal
    (the other half of the link-graph prior next to PageRank). One
    map-side-combined groupBy on the target domain; the distinct-source
    count is an exact count_distinct over the (already tiny) domain pair
    space — swap for approx_count_distinct at 10^12 rows."""
    a = anchors.select(
        domain_col(F.col("url")).alias("src"),
        domain_col(F.col("outlink")).alias("domain"),
        F.col("anchor"),
    ).filter((F.col("src") != "") & (F.col("domain") != ""))
    return a.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_anchors"),
        F.count_distinct("src").cast("long").alias("n_src_domains"),
        F.sum(F.length("anchor")).cast("long").alias("total_anchor_chars"),
    )


def domain_edges(links: DataFrame) -> DataFrame:
    """Weighted domain graph from ``(url, outlink)`` rows: ``(src, dst,
    w)``; intra-domain self-links and non-URL-shaped hrefs (relative
    links — '' domain) are dropped."""
    e = links.select(
        domain_col(F.col("url")).alias("src"),
        domain_col(F.col("outlink")).alias("dst"),
    )
    return (
        e.filter((F.col("src") != "") & (F.col("dst") != "")
                 & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )


def pagerank_graph(edges: DataFrame):
    """Shared iteration inputs: ``(nodes, n_df, deg, norm)`` — the node
    set, its 1-row broadcast count, out-weights, and the once-normalized
    edge shares."""
    nodes = (
        edges.select(F.col("src").alias("domain"))
        .union(edges.select(F.col("dst").alias("domain")))
        .distinct()
    )
    n_df = F.broadcast(nodes.agg(F.count("*").alias("_n")))
    deg = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    # normalize ONCE outside the loop: each iteration then needs a single
    # (src) join + (dst) groupBy, not a re-join against the degree table
    norm = edges.join(deg, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("share")
    )
    return nodes, n_df, deg, norm


def pagerank_init(nodes: DataFrame, n_df: DataFrame) -> DataFrame:
    return nodes.crossJoin(n_df).select(
        "domain", (F.lit(1.0) / F.col("_n")).alias("rank")
    )


def pagerank_step(
    nodes: DataFrame, n_df: DataFrame, deg: DataFrame, norm: DataFrame,
    ranks: DataFrame, damping: float,
) -> DataFrame:
    """One weighted-PageRank update with uniform dangling redistribution:
    rank'(d) = (1-c)/N + c * (sum_in share * rank + dangling/N)."""
    contrib = (
        norm.join(ranks.withColumnRenamed("domain", "src"), "src")
        .groupBy(F.col("dst").alias("domain"))
        .agg(F.sum(F.col("rank") * F.col("share")).alias("contrib"))
    )
    dang = F.broadcast(
        ranks.join(deg, ranks.domain == deg.src, "left_anti")
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
    )
    return (
        nodes.join(contrib, "domain", "left")
        .crossJoin(n_df)
        .crossJoin(dang)
        .select(
            "domain",
            (
                (1.0 - damping) / F.col("_n")
                + damping * (F.coalesce(F.col("contrib"), F.lit(0.0))
                             + F.col("_dang") / F.col("_n"))
            ).alias("rank"),
        )
    )


def domain_pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """``(domain, rank)`` after ``iters`` weighted-PageRank iterations;
    ranks sum to 1 every iteration. For a restartable long run use
    ``streaming.resume.resumable_pagerank`` (per-iteration checkpoints)."""
    nodes, n_df, deg, norm = pagerank_graph(edges)
    ranks = pagerank_init(nodes, n_df)
    for i in range(iters):
        ranks = pagerank_step(nodes, n_df, deg, norm, ranks, damping)
        if (i + 1) % 2 == 0 and i + 1 < iters:
            # truncate lineage like dedup.near_dup_clusters — a deep
            # iteration count must not compound the plan
            ranks = ranks.localCheckpoint()
    return ranks
