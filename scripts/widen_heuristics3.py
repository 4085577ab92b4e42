#!/usr/bin/env python
"""Round-3 widening: heuristic disambiguation groups (VERDICT r02 item 4).

Adds ~35 disambiguation groups toward upstream github-linguist's ~150
(the reference consumes them at runtime, /root/reference/src/index.ts:41,
schema src/schema.ts:22-37), plus the languages/extensions those groups
need. Provenance rules match widen_snapshot.py / widen_snapshot2.py: every
language entry is a re-encoding of PUBLIC github-linguist languages.yml
facts; every heuristic rule is written from knowledge of the public
heuristics.yml dataset — patterns are upstream's where recalled exactly,
otherwise conservative derivations marked with a trailing comment in this
file (the committed snapshot is the contract; parity tests pin OUR
semantics, and deviations from upstream are breadth-of-recall, not bugs).

Two upstream constructs are intentionally not carried over (documented in
COVERAGE.md): multi-language fallthrough rules (`language:` as a LIST,
e.g. .mod's [Linux Kernel Module, AMPL]) fall back to first-candidate
instead, and groups whose patterns we could not recall with confidence are
omitted entirely rather than invented.

Run:  python scripts/widen_heuristics3.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

# --- new language entries (public languages.yml facts) ----------------------

NEW_LANGS: dict[str, dict] = {
    "AngelScript": {"type": "programming", "color": "#C7D7DC",
                    "extensions": [".as", ".angelscript"]},
    "CWeb": {"type": "programming", "color": "#00007a", "extensions": [".w"]},
    "DTrace": {"type": "programming", "aliases": ["dtrace-script"],
               "extensions": [".d"]},
    "DirectX 3D File": {"type": "data", "color": "#aace60",
                        "extensions": [".x"]},
    "Ecmarkup": {"type": "markup", "color": "#eb8131",
                 "extensions": [".html"]},
    "Filterscript": {"type": "programming", "extensions": [".fs"]},
    "Game Maker Language": {"type": "programming", "color": "#71b417",
                            "extensions": [".gml"]},
    "Genie": {"type": "programming", "color": "#fb855d",
              "extensions": [".gs"]},
    "Gerber Image": {"type": "data", "color": "#d20b00",
                     "aliases": ["rs-274x"],
                     "extensions": [".gbr", ".sol", ".gbl", ".gbo",
                                    ".gbp", ".gbs", ".gko", ".gtl"]},
    "Graph Modeling Language": {"type": "data", "extensions": [".gml"]},
    "IDL": {"type": "programming", "color": "#a3522f",
            "extensions": [".pro", ".dlm"]},
    "Lex": {"type": "programming", "color": "#DBCA00",
            "aliases": ["flex"], "extensions": [".l", ".lex"]},
    "Limbo": {"type": "programming", "extensions": [".b", ".m"]},
    "Logos": {"type": "programming", "extensions": [".x", ".xm", ".xi"]},
    "LoomScript": {"type": "programming", "extensions": [".ls"]},
    "M": {"type": "programming", "aliases": ["mumps"],
          "extensions": [".mumps", ".m"]},
    "MUF": {"type": "programming", "group": "Forth", "extensions": [".muf", ".m"]},
    "Modula-2": {"type": "programming", "color": "#10253f",
                 "extensions": [".mod"]},
    "NL": {"type": "data", "extensions": [".nl"]},
    "NewLisp": {"type": "programming", "color": "#87AED7",
                "extensions": [".nl", ".lisp", ".lsp"]},
    "Object Data Instance Notation": {"type": "data",
                                      "extensions": [".odin"]},
    "ObjectScript": {"type": "programming", "color": "#424893",
                     "extensions": [".cls"]},
    "PicoLisp": {"type": "programming", "color": "#6067af",
                 "extensions": [".l"]},
    "q": {"type": "programming", "color": "#0040cd", "extensions": [".q"]},
    "QMake": {"type": "programming", "extensions": [".pro", ".pri"]},
    "RPC": {"type": "programming", "aliases": ["rpcgen", "oncrpc", "xdr"],
            "extensions": [".x"]},
    "Rebol": {"type": "programming", "color": "#358a5b",
              "extensions": [".reb", ".r", ".r2", ".r3", ".rebol"]},
    "SQLPL": {"type": "programming", "color": "#e8274b",
              "extensions": [".sql", ".db2"]},
    "Slice": {"type": "programming", "color": "#003fa2",
              "extensions": [".ice"]},
    "StringTemplate": {"type": "markup", "color": "#3fb34f",
                       "extensions": [".st"]},
    "TSQL": {"type": "programming", "color": "#e38c00",
             "extensions": [".sql"]},
    "Visual Basic 6.0": {"type": "programming", "color": "#2c6353",
                         "aliases": ["vb6", "vb 6", "visual basic 6"],
                         "extensions": [".cls", ".frm"]},
    "World of Warcraft Addon Data": {"type": "data", "color": "#f7e43f",
                                     "extensions": [".toc"]},
}

# --- extension additions to EXISTING languages (re-adding exts the earlier
#     batches pruned pending their disambiguation group) ---------------------

EXT_ADD: dict[str, list[str]] = {
    "AMPL": [".mod"],
    "GAP": [".gd"],
    "Gosu": [".gs"],
    "HiveQL": [".q"],
    "Linker Script": [".x"],
    "OpenEdge ABL": [".cls", ".w"],
    "PLSQL": [".sql"],
    "PLpgSQL": [".sql"],
    "Standard ML": [".ml"],
    "C++": [".re"],
    "Common Lisp": [".l"],
    "Erlang": [".es"],
    "Euphoria": [".e", ".ex"],
    "Forth": [".fs"],
    "GLSL": [".fs"],
    "Gnuplot": [".p"],
    "Makefile": [".d"],
    "Mercury": [".m"],
    "Pascal": [".pp"],
    "Prolog": [".pro"],
    "Roff": [".l", ".n"],
    "SuperCollider": [".sc"],
    "TeX": [".cls"],
    "TypeScript": [".tsx"],
    "XML": [".tsx"],
    "Yacc": [".yy"],
}

# --- new disambiguation groups (upstream heuristics.yml order) --------------

NEW_GROUPS: list[dict] = [
    {"extensions": [".as"], "rules": [
        {"language": "ActionScript",
         "pattern": r"^\s*(package\s+[a-z0-9_\.]+|import\s+[a-zA-Z0-9_\.]+;|class\s+[A-Za-z0-9_]+\s+extends\s+[A-Za-z0-9_]+)"},
        # derived: AngelScript's distinctive funcdef/shared keywords
        {"language": "AngelScript",
         "pattern": r"^\s*(#include\s+\x22|shared\s+abstract\s+class\s|funcdef\s|mixin\s+class\s)"},
    ]},
    {"extensions": [".cls"], "rules": [
        {"language": "ObjectScript", "pattern": r"^Class\s"},
        # derived: ABL's UIB analyzer block / DEFINE statements
        {"language": "OpenEdge ABL",
         "pattern": r"(&ANALYZE-SUSPEND _UIB-CODE-BLOCK|^\s*(?i:define)\s+(?i:input|output|variable|temp-table)\b)"},
        # derived: LaTeX class-file preamble commands
        {"language": "TeX",
         "pattern": r"\\(NeedsTeXFormat|ProvidesClass|LoadClass|documentclass)\b"},
        {"language": "Visual Basic 6.0",
         "pattern": r"^VERSION\s+\d+\.\d+\s+CLASS"},
    ]},
    {"extensions": [".d"], "rules": [
        {"language": "D",
         "pattern": r"^module\s+[\w.]*\s*;|import\s+[\w\s,.:]{0,256};|\b\w+\s+\w+\s*\(.*\)(?:\(.*\))?\s*\{[^}]*\}|unittest\s*(?:\(.*\))?\s*\{[^}]*\}"},
        {"language": "DTrace",
         "pattern": r"^#!\s*/usr/sbin/dtrace\s+-s|#pragma\s+D\s+(?:option|attributes|depends_on)\s|^:\S+:\S+:\S+(?:\s|\n)"},
        # derived: upstream's last alternative uses [\w\s\/\\.]+ whose \s
        # lets the class span newline runs -> catastrophic backtracking on
        # adversarial input (the dequadratic gate measured 60+s on \n*50k).
        # Makefile rule lines are single-line, so the derivation bounds the
        # filename classes to [ \t] horizontal whitespace, and shrinks
        # \w+\. to \w\. (extra word chars are absorbed by the preceding
        # class, so existence of a match is unchanged) so each backtrack of
        # the class run checks O(1) chars instead of re-scanning \w+ for a
        # dot — linear on "a"*50k where the wide form is quadratic.
        {"language": "Makefile",
         "pattern": r"([\/\\].*:\s+.*\s\\$|: \\$|^[ %]:|^[\w \t\/\\.]+\w\.\w+[ \t]*:[ \t]+[\w \t\/\\.]+\w\.\w+)"},
    ]},
    {"extensions": [".e"], "rules": [
        # derived: Eiffel's class-file keywords vs Euphoria's declarations
        {"language": "Eiffel",
         "pattern": r"^(note|indexing|deferred\s+class|class|feature)\b"},
        {"language": "Euphoria",
         "pattern": r"^\s*namespace\s|^\s*(?:public\s+)?include\s|^\s*(?:(?:public|export|global)\s+)?(?:atom|constant|enum|function|integer|object|procedure|sequence|type)\s"},
    ]},
    {"extensions": [".es"], "rules": [
        {"language": "Erlang", "pattern": r"^\s*(?:%%|main\s*\(.*?\)\s*->)"},
        {"language": "JavaScript",
         "pattern": r"\/\/|(\x22|')use strict\1|export\s+default\s|\/\*(?:.|[\r\n])*?\*\/"},
    ]},
    {"extensions": [".ex"], "rules": [
        {"language": "Elixir",
         "pattern": r"^\s*@moduledoc\s|^\s*(?:cond|import|quote|unless)\s|^\s*def(?:exception|impl|macro|module|protocol)[(\s]"},
        {"language": "Euphoria",
         "pattern": r"^\s*namespace\s|^\s*(?:public\s+)?include\s|^\s*(?:(?:public|export|global)\s+)?(?:atom|constant|enum|function|integer|object|procedure|sequence|type)\s"},
    ]},
    {"extensions": [".fs"], "rules": [
        {"language": "Forth", "pattern": r"^(?:: |also |new-device|previous )"},
        {"language": "F#",
         "pattern": r"^\s*(?:#light|import|let|module|namespace|open|type)"},
        {"language": "GLSL",
         "pattern": r"^\s*(?:#version|precision|uniform|varying|vec[234])"},
        {"language": "Filterscript",
         "pattern": r"#include|#pragma\s+(?:rs|version)|__attribute__"},
    ]},
    {"extensions": [".gd"], "rules": [
        {"language": "GAP",
         "pattern": r"(?:Declare|BindGlobal|KeyDependentOperation)"},
        {"language": "GDScript",
         "pattern": r"(?:extends|var|const|enum|func|class|signal|tool|yield|assert|onready)"},
    ]},
    {"extensions": [".gml"], "rules": [
        {"language": "XML", "pattern": r"(?i:^\s*(?:<\?xml|xmlns))"},
        {"language": "Graph Modeling Language",
         "pattern": r"(?i:^\s*(?:graph|node)\s+\[$)"},
        # fallback: Game Maker Language (first candidate)
    ]},
    {"extensions": [".gs"], "rules": [
        {"language": "Genie", "pattern": r"^\[indent=[0-9]+\]"},
        {"language": "Gosu", "pattern": r"^uses (?:java|gw)\."},
    ]},
    {"extensions": [".html"], "rules": [
        {"language": "Ecmarkup",
         "pattern": r"<emu-(?:alg|annex|biblio|clause|eqn|example|figure|gann|gmod|gprose|grammar|intro|not-ref|note|nt|prodref|production|rhs|table|t|xref)(?:$|\s|>)"},
        {"language": "HTML", "pattern": r"<!DOCTYPE html|<html"},
    ]},
    {"extensions": [".ice"], "rules": [
        {"language": "JSON", "pattern": r"\A\s*[{\[]"},
        {"language": "Slice", "pattern": r"\bmodule\s+[A-Za-z_]"},  # derived
    ]},
    {"extensions": [".l"], "rules": [
        {"language": "Common Lisp", "pattern": r"\(def(?:un|macro)\s"},
        {"language": "Lex", "pattern": r"^(%[%{}]|<.*>)"},  # derived
        {"language": "Roff", "pattern": r"^\.[A-Za-z]{2}(\s|$)"},
        {"language": "PicoLisp",
         "pattern": r"^\((?:de|class|rel|code|data|must)\s"},
    ]},
    {"extensions": [".lisp", ".lsp"], "rules": [
        {"language": "Common Lisp",
         "pattern": r"^\s*\((?i:defun|in-package|defpackage)\s"},
        {"language": "NewLisp", "pattern": r"^\s*\(define\s"},
    ]},
    {"extensions": [".ls"], "rules": [
        {"language": "LoomScript",
         "pattern": r"^\s*package\s*[\w\.\/\*\s]*\s*\{"},
        # fallback: LiveScript (first candidate)
    ]},
    {"extensions": [".ml"], "rules": [
        {"language": "OCaml",
         "pattern": r"(?:^\s*module)|let rec |match\s+(?:\S+\s)+with"},
        {"language": "Standard ML",
         "pattern": r"=> |case\s+(?:\S+\s)+of"},
    ]},
    {"extensions": [".mod"], "rules": [
        {"language": "XML", "pattern": r"<!ENTITY "},
        {"language": "Modula-2",
         "pattern": r"^\s*(?i:MODULE|END)\s+[\w\.]+;"},
        # upstream's [Linux Kernel Module, AMPL] list-rule intentionally
        # dropped: fallback = first candidate (see module docstring)
    ]},
    {"extensions": [".n"], "rules": [
        {"language": "Roff", "pattern": r"^[.']"},
        {"language": "Nemerle", "pattern": r"^(?:module|namespace|using)\s"},
    ]},
    {"extensions": [".ncl"], "rules": [
        {"language": "XML", "pattern": r"^\s*<\?xml\s+version"},
        {"language": "Text", "pattern": r"THE_TITLE"},
    ]},
    {"extensions": [".nl"], "rules": [
        {"language": "NL", "pattern": r"^(?:b|g)[0-9]+ "},
        # derived: our case-sensitive candidate sort puts NL before NewLisp
        # (upstream's case-insensitive sort is the reverse), so NewLisp
        # needs an explicit rule to win its own files
        {"language": "NewLisp", "pattern": r"^\s*\(define\s"},
    ]},
    {"extensions": [".odin"], "rules": [
        {"language": "Object Data Instance Notation",
         "pattern": r"(?:^|<)[^\S\n]*[A-Za-z0-9_]+\s*=\s*<"},
        {"language": "Odin",
         "pattern": r"package\s+\w+|\b(?:im|ex)port\s*\x22[\w:./]+\x22|\b\w+\s*::\s*(?:proc|struct)\s*\(|^\s*//\s"},
    ]},
    {"extensions": [".p"], "rules": [
        # derived: gnuplot's plotting/terminal commands
        {"language": "Gnuplot",
         "pattern": r"^\s*(?:plot|splot|fit)\b|^\s*set\s+(?:term|terminal|out|output|xlabel|ylabel|title|samples)\b"},
        {"language": "OpenEdge ABL",
         "pattern": r"(?i:^\s*(?:define|def)\s+(?:input|output|variable|temp-table)\b|&ANALYZE-SUSPEND)"},  # derived
    ]},
    {"extensions": [".pluginspec"], "rules": [
        {"language": "XML", "pattern": r"(?i:^\s*<\?xml\s+version)"},
        # fallback: Ruby (first candidate)
    ]},
    {"extensions": [".pp"], "rules": [
        {"language": "Pascal", "pattern": r"^\s*end[.;]"},
        {"language": "Puppet", "pattern": r"(?:^[^\S\n]+|^[^\S\n]*\n)\w+\s+=>\s"},
    ]},
    {"extensions": [".pro"], "rules": [
        {"language": "Prolog", "pattern": r"^[^\[#\n]+:-|^[^\[#\n]*\n:-"},
        {"language": "INI", "pattern": r"last_client="},
        {"language": "QMake", "pattern": r"HEADERS|SOURCES"},
        {"language": "IDL", "pattern": r"^\s*function[ \w,]+$"},
    ]},
    {"extensions": [".q"], "rules": [
        {"language": "q",
         "pattern": r"((?<![\w.])(?i:[A-Z.][\w.]*:\{)|^\\(?:cd?|d|l|p|ts?)\s)"},
        {"language": "HiveQL",
         "pattern": r"(?i:SELECT\s+[\w*,]+\s+FROM|(?:CREATE|ALTER|DROP)\s+(?:DATABASE|SCHEMA|TABLE))"},
    ]},
    {"extensions": [".r"], "rules": [
        {"language": "Rebol", "pattern": r"(?i:\bRebol\b)"},
        {"language": "R", "pattern": r"<-|^\s*#"},
    ]},
    {"extensions": [".re"], "rules": [
        {"language": "C++",
         "pattern": r"^\s*#(?:(?:if|ifdef|define|pragma)\s+\w|\s*include\s+<[^>]+>)"},
        {"language": "Reason",
         "pattern": r"^\s*module\s+type\s|^\s*(?:include|open)\s+\w+\s*;\s*$|\blet\s+\w+\s*:\s*[^=]+="},
    ]},
    {"extensions": [".sc"], "rules": [
        {"language": "SuperCollider",
         "pattern": r"\^(?:this|super)\.|^\s*~\w+\s*=\.|^SynthDef\b"},
        {"language": "Scala",
         "pattern": r"^\s*import (?:scala|java)\.|^\s*val\s+\w+\s*=|^\s*class\b"},
    ]},
    {"extensions": [".sol"], "rules": [
        {"language": "Gerber Image",
         "pattern": r"^[DGMT][0-9]{2}\*(?:\r?\n|\r)"},
        {"language": "Solidity",
         "pattern": r"\bpragma\s+solidity\b|\b(?:abstract\s+)?contract\s+[a-zA-Z$_][\w$]*(?:\s+is\s+[^{]*)?\s*\{"},
    ]},
    {"extensions": [".st"], "rules": [
        {"language": "StringTemplate",
         "pattern": r"\$\w+[($]|(.)!\s*.+?\s*!\1|<!\s*.+?\s*!>|\[!\s*.+?\s*!\]|\{!\s*.+?\s*!\}"},
        {"language": "Smalltalk",
         "pattern": r"\A\s*[\[{(^\x22'\w#]|[a-zA-Z_]\w*\s*:=\s*[a-zA-Z_]\w*"},
    ]},
    {"extensions": [".toc"], "rules": [
        {"language": "World of Warcraft Addon Data",
         "pattern": r"^## |@no-lib-strip@"},
        {"language": "TeX",
         "pattern": r"^\\(?:contentsline|defcounter|beamer|boolfalse)"},
    ]},
    {"extensions": [".tsx"], "rules": [
        {"language": "TypeScript",
         "pattern": r"^\s*(?:import.+(?:from\s+|require\()['\x22]react|\/\/\/\s*<reference\s)"},
        {"language": "XML", "pattern": r"(?i:^\s*<\?xml\s+version)"},
    ]},
    {"extensions": [".w"], "rules": [
        {"language": "OpenEdge ABL",
         "pattern": r"&ANALYZE-SUSPEND _UIB-CODE-BLOCK"},
        {"language": "CWeb", "pattern": r"^@(?:<|\w+\.)"},
    ]},
    {"extensions": [".x"], "rules": [
        {"language": "DirectX 3D File", "pattern": r"^xof 030[23]txt\b"},
        {"language": "RPC",
         "pattern": r"\b(?:program|version)\s+\w+\s*\{|\bunion\s+\w+\s+switch\s*\("},
        {"language": "Logos", "pattern": r"^%(?:end|ctor|hook|group)\b"},
        {"language": "Linker Script",
         "pattern": r"OUTPUT_ARCH\(|OUTPUT_FORMAT\(|SECTIONS"},
    ]},
    {"extensions": [".yy"], "rules": [
        {"language": "JSON", "pattern": r"\A\s*[{\[]"},
        # fallback: Yacc (first candidate after JSON... candidates sorted)
    ]},
]

# --- rule extensions for EXISTING groups (replace by ext key) ----------------

REPLACE_GROUPS: list[dict] = [
    # .m widened from [Objective-C, MATLAB] to the upstream 6-way split
    # (Mathematica omitted: pattern not recalled with confidence)
    {"extensions": [".m"], "rules": [
        {"language": "Objective-C", "named_pattern": "objectivec"},
        {"language": "Mercury", "pattern": r":- module"},
        {"language": "MUF", "pattern": r"^: "},
        {"language": "M", "pattern": r"^\s*;"},
        {"language": "MATLAB", "pattern": r"^\s*%"},
        {"language": "Limbo",
         "pattern": r"^\w+\s*:\s*(?:module|adt|fn\s*\(|con\s+)"},
    ]},
    # .sql widened from the single SQL rule to the dialect split; patterns
    # are derived dialect markers (upstream's exact regexes not recalled)
    {"extensions": [".sql"], "rules": [
        {"language": "TSQL",
         "pattern": r"(?i:^\s*GO\b|BEGIN\s+(?:TRY|CATCH)\b|WAITFOR\s+DELAY)"},
        {"language": "PLpgSQL",
         "pattern": r"(?i:\$\$|LANGUAGE\s+'?plpgsql'?|SECURITY\s+(?:DEFINER|INVOKER)|RETURNS\s+TRIGGER)"},
        {"language": "SQLPL",
         "pattern": r"(?i:(?:BEGIN|DECLARE)\s+ATOMIC|SIGNAL\s+SQLSTATE|MODE\s+DB2SQL)"},
        {"language": "PLSQL",
         "pattern": r"(?i:PRAGMA\s+EXCEPTION_INIT\b|\bDBMS_\w+\.|\bNVL2?\s*\(|EXCEPTION\s+WHEN\b)"},
        {"language": "SQL", "pattern": r"(?i:SELECT\b|INSERT\s+INTO|CREATE\s+TABLE)"},
    ]},
]


def load() -> tuple[dict, dict]:
    with open(os.path.join(DATA, "languages.json")) as f:
        langs = json.load(f)
    with open(os.path.join(DATA, "heuristics.json")) as f:
        heur = json.load(f)
    return langs, heur


def merged() -> tuple[dict, dict, list[str]]:
    langs, heur = load()
    cur = langs["languages"]
    skipped: list[str] = []
    for name in sorted(NEW_LANGS):
        if name in cur:
            skipped.append(name)
            continue
        cur[name] = NEW_LANGS[name]
    for name, exts in EXT_ADD.items():
        meta = cur[name]
        for e in exts:
            if e not in meta.setdefault("extensions", []):
                meta["extensions"].append(e)
    langs["languages"] = {k: cur[k] for k in sorted(cur)}

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}
    for g in REPLACE_GROUPS:
        by_key[tuple(g["extensions"])] = g
    for g in NEW_GROUPS:
        key = tuple(g["extensions"])
        if key in by_key:
            # batch-3 owns these keys (none existed before this script ran)
            # — overwrite so pattern fixes in this file propagate on re-run
            # instead of being silently skipped
            skipped.append("group:" + ",".join(key))
        by_key[key] = g
    heur["disambiguations"] = [by_key[k] for k in sorted(by_key)]
    return langs, heur, skipped


def validate(langs: dict, heur: dict) -> list[str]:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from linguistjs_spark.pcre import compile_pcre

    problems: list[str] = []
    cur = langs["languages"]
    ext_map: dict[str, list[str]] = {}
    for name, meta in cur.items():
        for e in meta.get("extensions", []):
            ext_map.setdefault(e.lower(), []).append(name)

    named = heur["named_patterns"]
    batch_keys = {tuple(g["extensions"]) for g in NEW_GROUPS} | {
        tuple(g["extensions"]) for g in REPLACE_GROUPS
    }
    grouped = set()
    for g in heur["disambiguations"]:
        grouped.update(g["extensions"])
        # candidates with kernel collapse applied (a child language is a
        # candidate when its group parent claims the ext, and vice versa)
        raw = {c for e in g["extensions"] for c in ext_map.get(e, [])}
        cands = raw | {cur[c].get("group") for c in raw if c in cur}
        for rule in g["rules"]:
            lang = rule["language"]
            if lang not in cur:
                if tuple(g["extensions"]) in batch_keys:
                    problems.append(f"rule language not in snapshot: {lang}")
                continue
            group_parent = cur[lang].get("group")
            if (
                tuple(g["extensions"]) in batch_keys
                and lang not in cands
                and group_parent not in cands
            ):
                problems.append(
                    f"rule language {lang} not a candidate for {g['extensions']}"
                )
            pats = []
            for key in ("pattern", "negative_pattern"):
                v = rule.get(key)
                if v:
                    pats.extend([v] if isinstance(v, str) else v)
            if rule.get("named_pattern"):
                v = named[rule["named_pattern"]]
                pats.extend([v] if isinstance(v, str) else v)
            for p in pats:
                try:
                    compile_pcre(p)
                except Exception as exc:  # noqa: BLE001
                    problems.append(f"pattern fails to compile: {p!r}: {exc}")
    for ext, cands in sorted(ext_map.items()):
        if len(cands) > 1 and ext not in grouped and ext not in {
            ".cgi", ".fcgi",  # upstream has no group either: shebang decides
        }:
            problems.append(f"contested ext without group: {ext} -> {cands}")
    return problems


if __name__ == "__main__":
    langs, heur, skipped = merged()
    problems = validate(langs, heur)
    for p in problems:
        print(p)
    if skipped:
        print(f"already present (skipped): {skipped}")
    print(
        f"{len(langs['languages'])} languages, "
        f"{len(heur['disambiguations'])} disambiguation groups after merge"
    )
    if problems:
        sys.exit(1)
    if "--write" in sys.argv:
        with open(os.path.join(DATA, "languages.json"), "w") as f:
            json.dump(langs, f, indent=1, sort_keys=False)
            f.write("\n")
        with open(os.path.join(DATA, "heuristics.json"), "w") as f:
            json.dump(heur, f, indent=1, sort_keys=False)
            f.write("\n")
        print("written")
