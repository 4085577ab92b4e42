#!/usr/bin/env python
"""Widen data/languages.json toward upstream github-linguist breadth.

The additions below are re-encodings of PUBLIC github-linguist languages.yml
facts (the same data the reference downloads at runtime,
/root/reference/src/helpers/load-data.ts:13) written from knowledge of that
public dataset: name, type, group, aliases, extensions, filenames,
interpreters. Colors included where confidently known, omitted otherwise
(color is display-only). Extensions that would collide with an existing
snapshot language are only included when the corresponding upstream
disambiguation heuristic is also being added (checked by validate()).

Run:  python scripts/widen_snapshot.py          # validate + rewrite JSON
"""

from __future__ import annotations

import json
import os

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

# name -> meta; upstream-shaped, pruned to the fields the engine reads
ADDITIONS: dict[str, dict] = {
    "ABAP": {"type": "programming", "color": "#E8274B", "extensions": [".abap"]},
    "ABNF": {"type": "data", "extensions": [".abnf"]},
    "ActionScript": {"type": "programming", "color": "#882B0F",
                     "aliases": ["actionscript 3", "actionscript3", "as3"],
                     "extensions": [".as"]},
    "ANTLR": {"type": "programming", "color": "#9DC3FF", "extensions": [".g4"]},
    "APL": {"type": "programming", "color": "#5A8164",
            "extensions": [".apl", ".dyalog"], "interpreters": ["apl", "aplx", "dyalog"]},
    "ASN.1": {"type": "data", "extensions": [".asn", ".asn1"]},
    "ASP.NET": {"type": "programming", "color": "#9400ff",
                "aliases": ["aspx", "aspx-vb"],
                "extensions": [".asax", ".ascx", ".ashx", ".asmx", ".aspx", ".axd"]},
    "ATS": {"type": "programming", "color": "#1ac620", "aliases": ["ats2"],
            "extensions": [".dats", ".hats", ".sats"]},
    "AutoHotkey": {"type": "programming", "color": "#6594b9", "aliases": ["ahk"],
                   "extensions": [".ahk", ".ahkl"]},
    "AutoIt": {"type": "programming", "color": "#1C3552",
               "aliases": ["au3", "AutoIt3", "AutoItScript"], "extensions": [".au3"]},
    "Ballerina": {"type": "programming", "color": "#FF5000", "extensions": [".bal"]},
    "BASIC": {"type": "programming", "color": "#ff0000", "extensions": [".bas"]},
    "Bicep": {"type": "programming", "color": "#519aba",
              "extensions": [".bicep", ".bicepparam"]},
    "BitBake": {"type": "programming", "color": "#00bce4", "extensions": [".bb"]},
    "Blade": {"type": "markup", "color": "#f7523f", "group": "HTML",
              "extensions": [".blade", ".blade.php"]},
    "Brainfuck": {"type": "programming", "color": "#2F2530", "extensions": [".bf"]},
    "BrightScript": {"type": "programming", "color": "#662D91", "extensions": [".brs"]},
    "Cabal Config": {"type": "data", "color": "#483465", "aliases": ["Cabal"],
                     "extensions": [".cabal"],
                     "filenames": ["cabal.config", "cabal.project"]},
    "Caddyfile": {"type": "data", "color": "#22b638", "aliases": ["Caddy"],
                  "extensions": [".caddyfile"], "filenames": ["Caddyfile"]},
    "Cairo": {"type": "programming", "color": "#ff4a48", "extensions": [".cairo"]},
    "Cap'n Proto": {"type": "programming", "color": "#c42727", "extensions": [".capnp"]},
    "Ceylon": {"type": "programming", "color": "#dfa535", "extensions": [".ceylon"]},
    "Chapel": {"type": "programming", "color": "#8dc63f", "aliases": ["chpl"],
               "extensions": [".chpl"]},
    "ChucK": {"type": "programming", "color": "#3f8000", "extensions": [".ck"]},
    "Clarity": {"type": "programming", "color": "#5546ff", "extensions": [".clar"]},
    "Classic ASP": {"type": "programming", "color": "#6a40fd", "aliases": ["asp"],
                    "extensions": [".asp"]},
    "Clean": {"type": "programming", "color": "#3F85AF", "extensions": [".icl", ".dcl"]},
    "CLIPS": {"type": "programming", "color": "#00A300", "extensions": [".clp"]},
    "CodeQL": {"type": "programming", "color": "#140f46", "aliases": ["ql"],
               "extensions": [".ql", ".qll"]},
    "ColdFusion": {"type": "programming", "color": "#ed2cd6",
                   "aliases": ["cfm", "cfml", "coldfusion html"],
                   "extensions": [".cfm", ".cfml"]},
    "ColdFusion CFC": {"type": "programming", "color": "#ed2cd6", "group": "ColdFusion",
                       "aliases": ["cfc"], "extensions": [".cfc"]},
    "Common Lisp": {"type": "programming", "color": "#3fb68b",
                    "aliases": ["lisp"],
                    "extensions": [".lisp", ".asd", ".cl", ".lsp", ".podsl", ".sexp"],
                    "interpreters": ["lisp", "sbcl", "ccl", "clisp", "ecl"]},
    "Common Workflow Language": {"type": "programming", "color": "#B5314C",
                                 "aliases": ["cwl"], "extensions": [".cwl"],
                                 "interpreters": ["cwl-runner"]},
    "Coq": {"type": "programming", "color": "#d0b68c", "extensions": [".coq", ".v"]},
    "Creole": {"type": "prose", "color": "#b0b84d", "extensions": [".creole"]},
    "CSON": {"type": "data", "color": "#244776", "extensions": [".cson"]},
    "CUE": {"type": "programming", "color": "#5886E1", "extensions": [".cue"]},
    "Cypher": {"type": "programming", "color": "#34c0eb",
               "extensions": [".cyp", ".cypher"]},
    "Dafny": {"type": "programming", "color": "#FFEC25", "extensions": [".dfy"],
              "interpreters": ["dafny"]},
    "DataWeave": {"type": "programming", "color": "#003a52", "extensions": [".dwl"]},
    "DNS Zone": {"type": "data", "extensions": [".zone", ".arpa"]},
    "Dylan": {"type": "programming", "color": "#6c616e",
              "extensions": [".dylan", ".lid", ".intr"]},
    "Earthly": {"type": "programming", "color": "#2af0ff", "aliases": ["Earthfile"],
                "filenames": ["Earthfile"]},
    "EBNF": {"type": "data", "extensions": [".ebnf"]},
    "EdgeQL": {"type": "programming", "color": "#31A7FF", "aliases": ["esdl"],
               "extensions": [".edgeql", ".esdl"]},
    "Eiffel": {"type": "programming", "color": "#4d6977", "extensions": [".e"]},
    "EmberScript": {"type": "programming", "color": "#FFF4F3",
                    "extensions": [".em", ".emberscript"]},
    "Euphoria": {"type": "programming", "color": "#FF790B", "extensions": [".exw"]},
    "Factor": {"type": "programming", "color": "#636746", "extensions": [".factor"]},
    "Fantom": {"type": "programming", "color": "#14253c", "extensions": [".fan"]},
    "Faust": {"type": "programming", "color": "#c37240", "extensions": [".dsp"]},
    "fish": {"type": "programming", "color": "#4aae47", "group": "Shell",
             "extensions": [".fish"], "interpreters": ["fish"]},
    "Fluent": {"type": "programming", "color": "#ffcc33", "extensions": [".ftl"]},
    "FreeBASIC": {"type": "programming", "color": "#141AC9", "aliases": ["fb"],
                  "extensions": [".bi"]},
    "FreeMarker": {"type": "programming", "color": "#0050b2", "aliases": ["ftl"],
                   "extensions": [".ftl", ".ftlh"]},
    "Futhark": {"type": "programming", "color": "#5f021f", "extensions": [".fut"]},
    "G-code": {"type": "programming", "color": "#D08CF2",
               "extensions": [".gcode", ".gco"]},
    "GDScript": {"type": "programming", "color": "#355570", "extensions": [".gd"]},
    "Gettext Catalog": {"type": "prose", "aliases": ["pot"],
                        "extensions": [".po", ".pot"]},
    "Gherkin": {"type": "programming", "color": "#5B2063", "aliases": ["cucumber"],
                "extensions": [".feature", ".story"]},
    "Git Attributes": {"type": "data", "color": "#F44D27", "group": "INI",
                       "aliases": ["gitattributes"], "filenames": [".gitattributes"]},
    "Git Config": {"type": "data", "color": "#F44D27", "group": "INI",
                   "aliases": ["gitconfig", "gitmodules"],
                   "extensions": [".gitconfig"],
                   "filenames": [".gitconfig", ".gitmodules"]},
    "GN": {"type": "data", "color": "#aa6600", "extensions": [".gn", ".gni"],
           "filenames": [".gn", "BUILD.gn"], "interpreters": ["gn"]},
    "Gnuplot": {"type": "programming", "color": "#f0a9f0",
                "extensions": [".gnuplot", ".gp", ".gnu", ".plot"],
                "interpreters": ["gnuplot"]},
    "Golo": {"type": "programming", "color": "#88562A", "extensions": [".golo"]},
    "Gosu": {"type": "programming", "color": "#82937f", "extensions": [".gsx"]},
    "Grammatical Framework": {"type": "programming", "color": "#ff0000",
                              "aliases": ["gf"], "extensions": [".gf"]},
    "Graphviz (DOT)": {"type": "data", "color": "#2596be",
                       "extensions": [".dot", ".gv"]},
    "Groovy Server Pages": {"type": "programming", "color": "#4298b8",
                            "group": "Groovy", "aliases": ["gsp"],
                            "extensions": [".gsp"]},
    "Haml": {"type": "markup", "color": "#ece2a9", "extensions": [".haml"]},
    "Harbour": {"type": "programming", "color": "#0e60e3", "extensions": [".hb"]},
    "HiveQL": {"type": "programming", "color": "#dce200", "extensions": [".hql"]},
    "HLSL": {"type": "programming", "color": "#aace60",
             "extensions": [".hlsl", ".fx", ".fxh", ".hlsli"]},
    "hoon": {"type": "programming", "color": "#00b171", "extensions": [".hoon"]},
    "HTTP": {"type": "data", "color": "#005C9C", "extensions": [".http"]},
    "Hy": {"type": "programming", "color": "#7790B2", "aliases": ["hylang"],
           "extensions": [".hy"], "interpreters": ["hy"]},
    "IGOR Pro": {"type": "programming", "color": "#0000cc", "aliases": ["igor"],
                 "extensions": [".ipf"]},
    "Imba": {"type": "programming", "color": "#16cec6", "extensions": [".imba"]},
    "Inform 7": {"type": "programming", "color": "#595C9B", "aliases": ["i7"],
                 "extensions": [".ni", ".i7x"]},
    "Inno Setup": {"type": "programming", "color": "#264b99", "extensions": [".iss"]},
    "Io": {"type": "programming", "color": "#a9188d", "extensions": [".io"],
           "interpreters": ["io"]},
    "J": {"type": "programming", "color": "#9EEDFF", "extensions": [".ijs"],
          "interpreters": ["jconsole"]},
    "Java Properties": {"type": "data", "color": "#2A6277",
                        "extensions": [".properties"]},
    "Java Server Pages": {"type": "programming", "color": "#2A6277",
                          "aliases": ["jsp"], "extensions": [".jsp", ".tag"]},
    "JFlex": {"type": "programming", "color": "#DBCA00",
              "extensions": [".flex", ".jflex"]},
    "JQ": {"type": "programming", "color": "#c7254e", "extensions": [".jq"]},
    "JSON5": {"type": "data", "color": "#267CB9", "extensions": [".json5"]},
    "JSONLD": {"type": "data", "color": "#0c479c", "extensions": [".jsonld"]},
    "Jsonnet": {"type": "programming", "color": "#0064bd",
                "extensions": [".jsonnet", ".libsonnet"]},
    "KakouneScript": {"type": "programming", "color": "#6f8042",
                      "aliases": ["kak", "kakscript"], "extensions": [".kak"],
                      "filenames": ["kakrc"]},
    "KerboScript": {"type": "programming", "color": "#41adf0",
                    "extensions": [".ks"]},
    "Kusto": {"type": "data", "color": "#8c3bbf", "extensions": [".kql"]},
    "kvlang": {"type": "markup", "color": "#1da6e0", "extensions": [".kv"]},
    "Lark": {"type": "data", "color": "#2980B9", "extensions": [".lark"]},
    "Lasso": {"type": "programming", "color": "#999999", "aliases": ["lassoscript"],
              "extensions": [".lasso", ".las", ".lasso8", ".lasso9"]},
    "LFE": {"type": "programming", "color": "#4C3023", "extensions": [".lfe"]},
    "LilyPond": {"type": "programming", "color": "#9ccc7c",
                 "extensions": [".ly", ".ily"]},
    "Linker Script": {"type": "programming", "extensions": [".ld", ".lds"],
                      "filenames": ["ld.script"]},
    "Literate CoffeeScript": {"type": "programming", "color": "#244776",
                              "group": "CoffeeScript", "aliases": ["litcoffee"],
                              "extensions": [".litcoffee", ".coffee.md"]},
    "Literate Haskell": {"type": "programming", "color": "#5e5086",
                         "group": "Haskell", "aliases": ["lhaskell", "lhs"],
                         "extensions": [".lhs"]},
    "LiveScript": {"type": "programming", "color": "#499886",
                   "aliases": ["live-script", "ls"],
                   "extensions": [".ls", "._ls"], "filenames": ["Slakefile"]},
    "Logtalk": {"type": "programming", "color": "#295b9a",
                "extensions": [".lgt", ".logtalk"]},
    "LookML": {"type": "programming", "color": "#652B81",
               "extensions": [".lookml", ".lkml"]},
    "LSL": {"type": "programming", "color": "#3d9970",
            "extensions": [".lsl", ".lslp"], "interpreters": ["lsl"]},
    "Luau": {"type": "programming", "color": "#00A2FF", "group": "Lua",
             "extensions": [".luau"]},
    "M4": {"type": "programming", "extensions": [".m4"]},
    "Macaulay2": {"type": "programming", "color": "#d8ffff", "aliases": ["m2"],
                  "extensions": [".m2"], "interpreters": ["M2"]},
    "Mako": {"type": "programming", "color": "#7e858d",
             "extensions": [".mako", ".mao"]},
    "Marko": {"type": "markup", "color": "#42bff2", "aliases": ["markojs"],
              "extensions": [".marko"]},
    "Mathematica": {"type": "programming", "color": "#dd1100",
                    "aliases": ["mma", "wolfram", "wolfram language"],
                    "extensions": [".wl", ".wlt", ".cdf", ".ma", ".mt", ".nbp"]},
    "Maven POM": {"type": "data", "group": "XML", "filenames": ["pom.xml"]},
    "MAXScript": {"type": "programming", "color": "#00a6a6",
                  "extensions": [".mcr"]},
    "mcfunction": {"type": "programming", "color": "#E22837",
                   "extensions": [".mcfunction"]},
    "Meson": {"type": "programming", "color": "#007800",
              "filenames": ["meson.build", "meson_options.txt"]},
    "Metal": {"type": "programming", "color": "#8f14e9", "extensions": [".metal"]},
    "Modula-3": {"type": "programming", "color": "#223388",
                 "extensions": [".i3", ".ig", ".m3", ".mg"]},
    "Monkey": {"type": "programming", "extensions": [".monkey", ".monkey2"]},
    "MQL4": {"type": "programming", "color": "#62A8D6", "extensions": [".mq4", ".mqh"]},
    "MQL5": {"type": "programming", "color": "#4A76B8", "extensions": [".mq5"]},
    "nanorc": {"type": "data", "color": "#2d004d", "group": "INI",
               "extensions": [".nanorc"], "filenames": [".nanorc", "nanorc"]},
    "Nearley": {"type": "programming", "color": "#990000",
                "extensions": [".ne", ".nearley"]},
    "Nemerle": {"type": "programming", "color": "#3d3c6e", "extensions": [".n"]},
    "nesC": {"type": "programming", "color": "#94B0C7", "extensions": [".nc"]},
    "NetLinx": {"type": "programming", "color": "#0aa0ff",
                "extensions": [".axs", ".axi"]},
    "NetLogo": {"type": "programming", "color": "#ff6375", "extensions": [".nlogo"]},
    "Nextflow": {"type": "programming", "color": "#3ac486", "extensions": [".nf"],
                 "interpreters": ["nextflow"]},
    "Nginx": {"type": "data", "color": "#009639", "aliases": ["nginx configuration file"],
              "extensions": [".nginx", ".nginxconf"], "filenames": ["nginx.conf"]},
    "Nit": {"type": "programming", "color": "#009917", "extensions": [".nit"]},
    "NSIS": {"type": "programming", "extensions": [".nsi", ".nsh"]},
    "Nushell": {"type": "programming", "color": "#4E9906", "aliases": ["nu-script", "nushell-script"],
                "extensions": [".nu"], "interpreters": ["nu"]},
    "NWScript": {"type": "programming", "color": "#111522", "extensions": [".nss"]},
    "OpenCL": {"type": "programming", "color": "#ed2e2d", "group": "C",
               "extensions": [".opencl", ".cl"]},
    "OpenEdge ABL": {"type": "programming", "color": "#5ce600",
                     "aliases": ["progress", "openedge", "abl"],
                     "extensions": [".p", ".ab"]},
    "OpenQASM": {"type": "programming", "color": "#AA70FF", "extensions": [".qasm"]},
    "OpenType Feature File": {"type": "data", "aliases": ["AFDKO"],
                              "extensions": [".fea"]},
    "Oz": {"type": "programming", "color": "#fab738", "extensions": [".oz"]},
    "P4": {"type": "programming", "color": "#7055b5", "extensions": [".p4"]},
    "Pact": {"type": "programming", "color": "#F7A8B8", "extensions": [".pact"]},
    "Pan": {"type": "programming", "color": "#cc0000", "extensions": [".pan"]},
    "Papyrus": {"type": "programming", "color": "#6600cc", "extensions": [".psc"]},
    "Pawn": {"type": "programming", "color": "#dbb284",
             "extensions": [".pwn", ".sma"]},
    "PDDL": {"type": "programming", "color": "#0d00ff", "extensions": [".pddl"]},
    "PEG.js": {"type": "programming", "color": "#234d6b", "extensions": [".pegjs"]},
    "PigLatin": {"type": "programming", "color": "#fcd7de", "extensions": [".pig"]},
    "Pike": {"type": "programming", "color": "#005390",
             "extensions": [".pike", ".pmod"], "interpreters": ["pike"]},
    "Pkl": {"type": "programming", "color": "#6b9543", "extensions": [".pkl"]},
    "PlantUML": {"type": "data", "color": "#fbbd16",
                 "extensions": [".puml", ".iuml", ".plantuml"]},
    "PLpgSQL": {"type": "programming", "color": "#336790", "group": "SQL",
                "extensions": [".pgsql"]},
    "PLSQL": {"type": "programming", "color": "#dad8d8",
              "extensions": [".pls", ".bdy", ".fnc", ".pck", ".pkb", ".pks",
                             ".plb", ".plsql", ".spc", ".tpb", ".tps", ".trg", ".vw"]},
    "Pony": {"type": "programming", "extensions": [".pony"]},
    "PostCSS": {"type": "markup", "color": "#dc3a0c", "group": "CSS",
                "extensions": [".pcss", ".postcss"]},
    "PostScript": {"type": "markup", "color": "#da291c", "aliases": ["postscr"],
                   "extensions": [".ps", ".eps", ".epsi", ".pfa"]},
    "POV-Ray SDL": {"type": "programming", "color": "#6bac65",
                    "aliases": ["pov-ray", "povray"], "extensions": [".pov"]},
    "Prisma": {"type": "data", "color": "#0c344b", "extensions": [".prisma"]},
    "Processing": {"type": "programming", "color": "#0096D8", "extensions": [".pde"]},
    "Procfile": {"type": "programming", "color": "#3B2F63", "filenames": ["Procfile"]},
    "Propeller Spin": {"type": "programming", "color": "#7fa2a7",
                       "extensions": [".spin"]},
    "PureBasic": {"type": "programming", "color": "#5a6986",
                  "extensions": [".pb", ".pbi"]},
    "Q#": {"type": "programming", "color": "#fed659", "aliases": ["qsharp"],
           "extensions": [".qs"]},
    "Ragel": {"type": "programming", "color": "#9d5200", "aliases": ["ragel-rb"],
              "extensions": [".rl"]},
    "RAML": {"type": "markup", "color": "#77d9fb", "extensions": [".raml"]},
    "Rascal": {"type": "programming", "color": "#fffaa0", "extensions": [".rsc"]},
    "RDoc": {"type": "prose", "color": "#701516", "extensions": [".rdoc"]},
    "Reason": {"type": "programming", "color": "#ff5847",
               "extensions": [".re", ".rei"]},
    "ReScript": {"type": "programming", "color": "#ed5051", "extensions": [".resi"]},
    "RobotFramework": {"type": "programming", "color": "#00c0b5",
                       "extensions": [".robot"]},
    "Roff": {"type": "markup", "color": "#ecdebe",
             "aliases": ["groff", "man", "manpage", "troff"],
             "extensions": [".roff", ".man", ".tmac",
                            ".1", ".2", ".3", ".4", ".5", ".6", ".7", ".8", ".9"]},
    "RPM Spec": {"type": "data", "aliases": ["specfile"], "extensions": [".spec"]},
    "SaltStack": {"type": "programming", "color": "#646464",
                  "aliases": ["saltstate", "salt"], "extensions": [".sls"]},
    "SAS": {"type": "programming", "color": "#B34936", "extensions": [".sas"]},
    "Scilab": {"type": "programming", "color": "#ca0f21",
               "extensions": [".sci", ".sce"]},
    "sed": {"type": "programming", "color": "#64b970", "extensions": [".sed"],
            "interpreters": ["gsed", "minised", "sed", "ssed"]},
    "ShellSession": {"type": "programming", "aliases": ["bash session", "console"],
                     "extensions": [".sh-session"]},
    "Sieve": {"type": "programming", "extensions": [".sieve"]},
    "Slim": {"type": "markup", "color": "#2b2b2b", "extensions": [".slim"]},
    "Slint": {"type": "markup", "color": "#2379F4", "extensions": [".slint"]},
    "Smithy": {"type": "programming", "color": "#c44536", "extensions": [".smithy"]},
    "SMT": {"type": "programming", "extensions": [".smt2", ".smt"],
            "interpreters": ["boolector", "cvc4", "mathsat5", "opensmt", "stp",
                             "verit", "yices2", "z3"]},
    "Snakemake": {"type": "programming", "color": "#419179", "group": "Python",
                  "aliases": ["snakefile"], "extensions": [".smk"],
                  "filenames": ["Snakefile"]},
    "SourcePawn": {"type": "programming", "color": "#f69e1d", "aliases": ["sourcemod"],
                   "extensions": [".sp"]},
    "SPARQL": {"type": "data", "color": "#0C4597", "extensions": [".sparql", ".rq"]},
    "SQF": {"type": "programming", "color": "#3F3F3F", "extensions": [".sqf", ".hqf"]},
    "Squirrel": {"type": "programming", "color": "#800000", "extensions": [".nut"]},
    "Stan": {"type": "programming", "color": "#b2011d", "extensions": [".stan"]},
    "Standard ML": {"type": "programming", "color": "#dc566d", "aliases": ["sml"],
                    "extensions": [".sml", ".fun", ".sig"]},
    "Stata": {"type": "programming", "color": "#1a5f91",
              "extensions": [".do", ".ado", ".doh", ".ihlp", ".mata", ".matah",
                             ".sthlp"]},
    "SubRip Text": {"type": "data", "color": "#9e0101", "extensions": [".srt"]},
    "SuperCollider": {"type": "programming", "color": "#46390b",
                      "extensions": [".scd"], "interpreters": ["sclang", "scsynth"]},
    "Textile": {"type": "prose", "color": "#ffe7ac", "extensions": [".textile"]},
    "TLA": {"type": "programming", "color": "#4b0079", "extensions": [".tla"]},
    "TSV": {"type": "data", "color": "#237346", "aliases": ["tab-separated values"],
            "extensions": [".tsv"]},
    "vCard": {"type": "data", "color": "#ee2647", "aliases": ["virtual contact file"],
              "extensions": [".vcf"]},
    "Turtle": {"type": "data", "extensions": [".ttl"]},
    "TXL": {"type": "programming", "color": "#0178b8", "extensions": [".txl"]},
    "Unity3D Asset": {"type": "data", "color": "#222c37",
                      "extensions": [".anim", ".mat", ".prefab", ".unity"]},
    "UnrealScript": {"type": "programming", "color": "#a54c4d", "extensions": [".uc"]},
    "UrWeb": {"type": "programming", "color": "#ccccee", "aliases": ["Ur", "Ur/Web"],
              "extensions": [".ur", ".urs"]},
    "V": {"type": "programming", "color": "#4f87c4", "aliases": ["vlang"],
          "extensions": [".v"]},
    "Velocity Template Language": {"type": "programming", "color": "#507cff",
                                   "aliases": ["vtl", "velocity"],
                                   "extensions": [".vtl"]},
    "VBA": {"type": "programming", "color": "#867db1", "aliases": ["visual basic for applications"],
            "extensions": [".vba"]},
    "VBScript": {"type": "programming", "color": "#15dcdc", "extensions": [".vbs"]},
    "Visual Basic .NET": {"type": "programming", "color": "#945db7",
                          "aliases": ["visual basic", "vbnet", "vb .net", "vb.net"],
                          "extensions": [".vb", ".vbhtml"]},
    "Volt": {"type": "programming", "color": "#1F1F1F", "extensions": [".volt"]},
    "Vyper": {"type": "programming", "color": "#2980b9", "extensions": [".vy"]},
    "Wavefront Material": {"type": "data", "extensions": [".mtl"]},
    "Wavefront Object": {"type": "data", "extensions": [".obj"]},
    "WebIDL": {"type": "programming", "extensions": [".webidl"]},
    "WebVTT": {"type": "data", "color": "#ccc8f9", "aliases": ["vtt"],
               "extensions": [".vtt"]},
    "WGSL": {"type": "programming", "color": "#1a5e9a", "extensions": [".wgsl"]},
    "Whiley": {"type": "programming", "color": "#d5c397", "extensions": [".whiley"]},
    "Wikitext": {"type": "prose", "color": "#fc5757",
                 "aliases": ["mediawiki", "wiki"],
                 "extensions": [".mediawiki", ".wiki", ".wikitext"]},
    "Windows Registry Entries": {"type": "data", "color": "#52d5ff",
                                 "extensions": [".reg"]},
    "Wollok": {"type": "programming", "color": "#a23738", "extensions": [".wlk"]},
    "xBase": {"type": "programming", "color": "#403a40",
              "aliases": ["advpl", "clipper", "foxpro"],
              "extensions": [".prg", ".prw"]},
    "XC": {"type": "programming", "color": "#99DA07", "extensions": [".xc"]},
    "Xonsh": {"type": "programming", "color": "#285EEF", "extensions": [".xsh"]},
    "XQuery": {"type": "programming", "color": "#5232e7",
               "extensions": [".xquery", ".xq", ".xql", ".xqm", ".xqy"]},
    "Xtend": {"type": "programming", "color": "#24255d", "extensions": [".xtend"]},
    "Yacc": {"type": "programming", "color": "#4B6C4B",
             "extensions": [".y", ".yacc"]},
    "YANG": {"type": "data", "extensions": [".yang"]},
    "YARA": {"type": "programming", "color": "#220000",
             "extensions": [".yar", ".yara"]},
    "ZenScript": {"type": "programming", "color": "#00BCD1", "extensions": [".zs"]},
    "Zephir": {"type": "programming", "color": "#118f9e", "extensions": [".zep"]},
    "ZIL": {"type": "programming", "color": "#dc75e5", "extensions": [".zil", ".mud"]},
}

# Upstream also gives Verilog '.v' (the snapshot had only '.veo'); the
# .v disambiguation group (Coq / V / Verilog) is added with it.
EXTEND_EXISTING = {"Verilog": {"extensions": [".v"]}}

# New disambiguation groups for extensions the additions make (or find)
# multi-candidate — upstream heuristics.yml shapes, re-encoded. Rule order
# within a group is first-match-wins; a pattern-free rule is the group's
# fallback and must come last.
NEW_HEURISTICS = [
    {"extensions": [".bb"], "rules": [
        {"language": "BitBake", "pattern": "^[ \\t]*(# |include|require)\\b"},
        {"language": "Clojure", "pattern": "\\((def|defn|defproject|ns)\\b"},
    ]},
    {"extensions": [".cl"], "rules": [
        {"language": "Common Lisp",
         "pattern": "^[ \\t]*\\((?i:defun|in-package|defpackage|defmacro|defvar|defparameter) "},
        {"language": "Cool", "pattern": "^class"},
        {"language": "OpenCL",
         "pattern": "\\/\\* |\\/\\/ |^\\}|__(?:kernel|global|local|constant)\\b"},
    ]},
    {"extensions": [".ftl"], "rules": [
        {"language": "Fluent",
         "pattern": "^-?[a-zA-Z][a-zA-Z0-9_-]* *=|\\{\\$-?[a-zA-Z][-\\w]*(?:\\.[a-zA-Z][-\\w]*)?\\}"},
        {"language": "FreeMarker"},
    ]},
    {"extensions": [".hh"], "rules": [
        {"language": "Hack", "pattern": "<\\?hh"},
    ]},
    {"extensions": [".mm"], "rules": [
        {"language": "XML", "pattern": "^[ \\t]*(<\\?xml|<map\\b)"},
        {"language": "Objective-C++",
         "pattern": "^[ \\t]*(#(?:import|include|pragma)\\b|@(?:interface|implementation|protocol)\\b)"},
    ]},
    {"extensions": [".properties"], "rules": [
        {"language": "INI", "pattern": "^[ \\t]*[;\\[]"},
        {"language": "Java Properties", "pattern": "^[ \\t]*[#!]|^[^#!;\\n]*[=:]"},
        {"language": "INI"},
    ]},
    {"extensions": [".scd"], "rules": [
        {"language": "SuperCollider",
         "pattern": "(?i)\\b(?:SinOsc|Synth|SynthDef|thisProcess)\\b"},
        {"language": "Markdown", "pattern": "^[a-zA-Z0-9_]+\\(\\d\\)"},
    ]},
    {"extensions": [".sls"], "rules": [
        {"language": "Scheme",
         "pattern": "^[ \\t]*\\((?:define|library|import|lambda)\\b"},
        {"language": "SaltStack"},
    ]},
    {"extensions": [".spec"], "rules": [
        {"language": "Python", "pattern": "^(import\\s+\\w|from\\s+\\w+\\s+import\\b)"},
        {"language": "RPM Spec",
         "pattern": "^(%(?:bcond_with|bcond_without|define|global)\\b|(?:Name|Version|Release|Summary|License|BuildRequires)[ \\t]*:)"},
        {"language": "Ruby", "pattern": "^(require(_relative)?\\s|Gem::Specification)"},
    ]},
    {"extensions": [".v"], "rules": [
        {"language": "Coq",
         "pattern": "(?:^|[ \\t])(?:Proof|Qed)\\.(?:$|[ \\t])|^[ \\t]*Require[ \\t]+(?:Import|Export)\\b"},
        {"language": "V",
         "pattern": "\\$(?:if|else)[ \\t]|^[ \\t]*fn\\s+[a-z0-9_]+\\s*\\(|^[ \\t]*for\\s+\\w+\\s+in\\s"},
        {"language": "Verilog",
         "pattern": "^[ \\t]*(?:module|always|initial|endmodule|`define|`timescale)\\b"},
    ]},
    {"extensions": [".vba"], "rules": [
        {"language": "Vim Script", "pattern": "^UseVimball"},
        {"language": "VBA"},
    ]},
]


def merged() -> dict:
    cur = json.load(open(os.path.join(DATA, "languages.json")))
    langs = dict(cur["languages"])
    for name, meta in ADDITIONS.items():
        if name in langs:
            raise SystemExit(f"duplicate language: {name}")
        langs[name] = meta
    for name, extra in EXTEND_EXISTING.items():
        for ext in extra.get("extensions", []):
            if ext not in langs[name].setdefault("extensions", []):
                langs[name]["extensions"].append(ext)
    # languages.yml is ASCII-alphabetical; key order drives candidate order
    cur["languages"] = {k: langs[k] for k in sorted(langs)}
    return cur


def merged_heuristics() -> dict:
    heur = json.load(open(os.path.join(DATA, "heuristics.json")))
    have = {tuple(d["extensions"]) for d in heur["disambiguations"]}
    for grp in NEW_HEURISTICS:
        if tuple(grp["extensions"]) in have:
            continue
        heur["disambiguations"].append(grp)
    # heuristics.yml is ordered by first extension; group order only matters
    # for shebang rows (ext gate bypassed) — keep the upstream sort
    heur["disambiguations"].sort(key=lambda d: d["extensions"][0])
    return heur


def validate(cur: dict, heur: dict) -> list[str]:
    ext_map: dict[str, list[str]] = {}
    for name, meta in cur["languages"].items():
        for e in meta.get("extensions", []):
            ext_map.setdefault(e.lower(), []).append(name)
    grouped = {e for d in heur["disambiguations"] for e in d["extensions"]}
    problems = []
    for ext, cands in sorted(ext_map.items()):
        if len(cands) > 1 and ext not in grouped:
            problems.append(f"contested ext without heuristic group: {ext} -> {cands}")
    return problems


if __name__ == "__main__":
    cur = merged()
    heur = merged_heuristics()
    problems = validate(cur, heur)
    for p in problems:
        print(p)
    print(f"{len(cur['languages'])} languages, "
          f"{len(heur['disambiguations'])} disambiguation groups after merge")
    if "--write" in os.sys.argv:
        with open(os.path.join(DATA, "languages.json"), "w") as fh:
            json.dump(cur, fh, indent=1)
            fh.write("\n")
        with open(os.path.join(DATA, "heuristics.json"), "w") as fh:
            json.dump(heur, fh, indent=1)
            fh.write("\n")
        print("wrote languages.json + heuristics.json")
