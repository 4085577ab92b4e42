"""Synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Deterministic (seeded) generator for the graft input shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json input_hint). Seed rows reproduce every reference unit/golden
case (/root/reference/test/unit.js:29-87, test/expected.json); bulk rows cycle
those patterns with varying lengths plus web-text rows (multiple natural
languages, PII, toxicity, near-duplicate clusters) to exercise the graft
stages.

Also provides ``pages_from_documents`` which derives a pages-shaped DataFrame
from the driver's documents.parquet deterministically with pure column
expressions (no RNG) — used by bench.py and the DuckDB-oracle queries.
"""

from __future__ import annotations

import datetime as _dt
import random

from ..oracle import OverrideRule

_EPOCH = _dt.datetime(2026, 1, 1)

# (path, text) seed cases — one per reference unit/golden case (FIXTURES.md §1)
SEED_CASES: list[tuple[str, str]] = [
    ("x.js", "var x = 1;"),
    ("x.cpp", "int x;"),
    ("x.c", "int x;"),
    ("x.R", "x <- 1"),
    (".m", ""),
    ("Dockerfile", "FROM node"),
    ("CMakeLists.txt", "project(x)"),
    ("tsconfig.json", "{}"),
    ("index.tsx", "<App/>"),
    ("file.antlers.php", "{{ x }}"),
    ("file.other.php", "<?php?>"),
    ("node_js", "#!/usr/bin/env node"),
    ("rake_ruby", "#!/usr/bin/env rake"),
    ("sh_shell", "#!/bin/sh"),
    ("emacs_cpp", "# -*- mode:c++ -*-"),
    ("emacs_cs", "# -*- c# -*-"),
    ("vim_sh", "# vim: filetype=sh"),
    ("vim_ruby", "# vim: syntax = ruby"),
    ("XCompose", "# for Emacs: -*- coding: utf-8 -*-"),
    ("c-sharp.cs", "namespace example {} // empty"),
    ("smalltalk.cs", "!interface methodsFor: instance"),
    ("eclipse.ecl", "var:-val"),
    ("ecl.ecl", "var:=val"),
    ("frege.fr", "import package"),
    ("forth.fr", "new-device 1"),
    ("raku", "#!/usr/bin/env perl6\n module"),
    ("gradlew", "#!/bin/sh"),
    ("decl.d.ts", "declare var x;"),
    ("deps/file.c", "int x;"),
    ("node_modules/file.js", "var x;"),
    ("file.Feature.cs", "// gen"),
    ("package-lock.json", "{}"),
    ("Pipfile.lock", "{}"),
    ("README.md", "# readme"),
    ("docs/demo.js", "var x;"),
    ("samples/head.h", "#pragma once"),
    ("unknown", "Unknown"),
    ("alternatives.asc", "Alternatives"),
    ("al.al", ""),
    ("Pipfile", ""),
    (
        "loc.c",
        "// full line comment\n"
        "int main() {\n"
        "\n"
        "    int x = 1; /* inline\n"
        "    block comment */\n"
        "    # another comment\n"
        "    -- and another\n"
        "    return x;\n"
        "}\n",
    ),
    (
        "scrub_pii.html.txt",
        "contact me: a.b@example.com +1 (555) 013-7777 or at 10.0.0.1 "
        "ssn 123-45-6789 card 4111 1111 1111 1111",
    ),
    ("lowq_boiler.txt", "click here buy now\n" * 50),
]

# Web-text snippets per natural language for the langid/quality stages
_WEB_SNIPPETS = {
    "en": "the quick brown fox jumps over the lazy dog and this is a sentence "
          "that was written for the purpose of testing with all the usual words ",
    "es": "los rapidos zorros saltan sobre el perro que duerme y esta es una "
          "frase que fue escrita para probar con las palabras de siempre pero ",
    "de": "der schnelle braune fuchs springt über den faulen hund und das ist "
          "ein satz der für den test mit den üblichen wörtern geschrieben wurde ",
    "fr": "les renards rapides sautent par dessus le chien paresseux et ceci "
          "est une phrase qui fut écrite pour tester avec les mots habituels ",
    "ru": "быстрая коричневая лиса прыгает через ленивую собаку и это "
          "предложение было написано для проверки с обычными словами ",
    "zh": "敏捷的棕色狐狸跳过懒狗这是一个为了测试而写的句子包含了常用的词汇",
}

# Override table seed (FIXTURES.md §2, mirrors test/samples/.gitattributes)
SEED_OVERRIDES: list[OverrideRule] = [
    OverrideRule(glob="file.txt", language="JS"),
    OverrideRule(glob="vendored", vendored=True),
    OverrideRule(glob="package-lock.json", generated=False),
    OverrideRule(glob="detected.json", detectable=True),
]

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_pages(n_bulk: int = 500, seed: int = 42) -> list[tuple]:
    """Deterministic list of pages rows: seed cases + n_bulk cycled rows."""
    rng = random.Random(seed)
    rows: list[tuple] = []

    def add(path: str, text: str, html: bytes | None = None, lang: str = ""):
        i = len(rows)
        rows.append(
            (
                f"https://crawl.example/{path}",
                _EPOCH + _dt.timedelta(seconds=i),
                html if html is not None else text.encode("utf-8"),
                text,
                lang,
            )
        )

    for path, text in SEED_CASES:
        add(path, text)
    # override-table exercising rows (FIXTURES.md §2)
    add("file.txt", "forced javascript")
    add("vendored", "var x;")
    add("detected.json", "{}")
    # binary rows: by extension, and by content sniff (NUL byte in html)
    add("image.png", "", html=b"\x89PNG\x00\x1a")
    add("sniffme", "binary-ish", html=b"PK\x03\x04\x00\x00binary")

    langs = list(_WEB_SNIPPETS)
    exts = [".html.txt", ".txt", ".md", ".js", ".py", ".php", ".cs", ".fr", ""]
    for i in range(n_bulk):
        lang = langs[i % len(langs)]
        snippet = _WEB_SNIPPETS[lang]
        reps = 1 + (i * 7) % 40
        text = (snippet * reps).strip()
        if i % 17 == 0:
            text += " reach me at user%d@mail.example or 192.168.0.%d" % (i, i % 256)
        if i % 23 == 0:
            text = "\n".join(["click here buy now"] * 30)  # low-quality dup lines
        if i % 29 == 0:
            text += " shit " * 3
        ext = exts[i % len(exts)]
        host = f"site{i % 13}.example"
        path = f"pages/{i // 10}/doc{i}{ext}"
        rows.append(
            (
                f"https://{host}/{path}",
                _EPOCH + _dt.timedelta(seconds=10000 + i),
                text.encode("utf-8"),
                text,
                lang,
            )
        )
    # a small near-duplicate cluster for dedup operators
    base = _WEB_SNIPPETS["en"] * 8
    for j in range(6):
        mutated = base[: len(base) - j * 3] + (" extra%d" % j if j % 2 else "")
        rows.append(
            (
                f"https://dup.example/cluster/{j}.txt",
                _EPOCH + _dt.timedelta(seconds=20000 + j),
                mutated.encode("utf-8"),
                mutated,
                "en",
            )
        )
    rng.shuffle(rows)  # deterministic shuffle: crawl-order skew analog
    return rows


def pages_df(spark, n_bulk: int = 500, seed: int = 42, num_partitions: int = 8):
    """Fixture pages table as a Spark DataFrame."""
    return spark.createDataFrame(
        generate_pages(n_bulk, seed), schema=PAGES_SCHEMA
    ).repartition(num_partitions)


def pages_from_documents(spark, sf_dir: str):
    """Derive a pages-shaped DataFrame from the driver's documents.parquet,
    deterministically, with pure column expressions (no RNG).

    url gets a path pattern cycled by doc_id so every cascade stage is
    exercised; html is the utf-8 bytes of text; warc_ts is epoch + doc_id sec.
    """
    from pyspark.sql import functions as F

    exts = ["txt", "html.txt", "md", "js", "py", "cs", "fr", "php", "ecl", "asc"]
    ext_expr = F.element_at(
        F.array(*[F.lit(e) for e in exts]),
        (F.col("doc_id") % len(exts) + 1).cast("int"),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example/p/"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit("/doc"),
            F.col("doc_id").cast("string"),
            F.lit("."),
            ext_expr,
        ).alias("url"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
