#!/usr/bin/env python
"""Round-3 widening, batch 4: long-tail languages (VERDICT r02 item 5).

Pushes the snapshot from 440 toward upstream github-linguist's ~700
languages (the reference loads the full set at runtime,
/root/reference/src/index.ts:38). Provenance matches the earlier widen
scripts: every entry re-encodes PUBLIC github-linguist languages.yml facts
(name, type, extensions, filenames, interpreters).

Selection rule for this batch: languages whose extensions are UNIQUE in
the merged snapshot (or filename/interpreter-only languages), PLUS four
contested extensions that arrive WITH their upstream disambiguation group
(.al AL/Perl, .dsp Faust/MSDevStudio, .i SWIG/Assembly, .star
STAR/Starlark — NEW_GROUPS below). Any other collision is a validation
ERROR, not a merge: first-candidate fallback semantics nobody asked for.
Languages whose upstream disambiguation pattern we could not recall with
confidence (Nasal vs Assembly on .nas) are omitted rather than invented,
matching the batch-3 stance. EXT_REMOVE aligns one pre-existing mapping
with upstream: .xaml belongs to XAML alone, not XML.

Run:  python scripts/widen_langs4.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "linguistjs_spark", "data")

P = "programming"
D = "data"
M = "markup"
PR = "prose"

# name -> entry; public languages.yml facts, unique-ext / filename-only
NEW_LANGS: dict[str, dict] = {
    "1C Enterprise": {"type": P, "color": "#814CCC",
                      "extensions": [".bsl", ".os"]},
    "2-Dimensional Array": {"type": D, "extensions": [".2da"]},
    "ABAP CDS": {"type": P, "color": "#555e25", "extensions": [".asddls"]},
    "AIDL": {"type": P, "color": "#34EB6B", "extensions": [".aidl"]},
    "AL": {"type": P, "color": "#3AA2B5", "extensions": [".al"]},
    "Adobe Font Metrics": {"type": D, "color": "#fa0f00",
                           "extensions": [".afm"]},
    "Alloy": {"type": P, "color": "#64C800", "extensions": [".als"]},
    "Alpine Abuild": {"type": P, "color": "#0D597F",
                      "filenames": ["APKBUILD"]},
    "API Blueprint": {"type": M, "color": "#2ACCA8",
                      "extensions": [".apib"]},
    "Apollo Guidance Computer": {"type": P, "color": "#0B3D91",
                                 "extensions": [".agc"]},
    "AppleScript": {"type": P, "color": "#101F1F", "aliases": ["osascript"],
                    "extensions": [".applescript", ".scpt"],
                    "interpreters": ["osascript"]},
    "Arc": {"type": P, "color": "#aa2afe", "extensions": [".arc"]},
    "Asymptote": {"type": P, "color": "#ff0000", "extensions": [".asy"]},
    "Augeas": {"type": P, "color": "#9CC134", "extensions": [".aug"]},
    "Avro IDL": {"type": D, "color": "#0040FF", "extensions": [".avdl"]},
    "Befunge": {"type": P, "extensions": [".befunge"]},
    "BibTeX": {"type": M, "color": "#778899", "group": "TeX",
               "extensions": [".bib", ".bibtex"]},
    "Bison": {"type": P, "color": "#6A463F", "group": "Yacc",
              "extensions": [".bison"]},
    "Bluespec": {"type": P, "color": "#12223c", "extensions": [".bsv"]},
    "Boogie": {"type": P, "color": "#c80fa0", "extensions": [".bpl"]},
    "Browserslist": {"type": D, "color": "#ffd539",
                     "filenames": [".browserslistrc", "browserslist"]},
    "CODEOWNERS": {"type": D, "filenames": ["CODEOWNERS"]},
    "CartoCSS": {"type": P, "aliases": ["Carto"], "extensions": [".mss"]},
    "Click": {"type": P, "color": "#E4E6F3", "extensions": [".click"]},
    "Closure Templates": {"type": M, "color": "#0d948f",
                          "aliases": ["soy"], "extensions": [".soy"]},
    "Cloud Firestore Security Rules": {"type": D, "color": "#FFA000",
                                       "filenames": ["firestore.rules"]},
    "CoNLL-U": {"type": D, "aliases": ["CoNLL"],
                "extensions": [".conllu", ".conll"]},
    # .cl is contested (Common Lisp / OpenCL) and its EXISTING group
    # already carries a Cool rule that was dead until now
    "Cool": {"type": P, "extensions": [".cl"]},
    "Curry": {"type": P, "color": "#531242", "extensions": [".curry"]},
    "Cycript": {"type": P, "extensions": [".cy"]},
    "DenizenScript": {"type": P, "color": "#FBEE96",
                      "extensions": [".dsc"]},
    "Dircolors": {"type": D, "filenames": [".dircolors", "DIR_COLORS"]},
    "Dogescript": {"type": P, "color": "#cca760", "extensions": [".djs"]},
    # filename-only: the .env EXTENSION stays with Shell (pre-existing
    # mapping; a literal ".env" file hits the filename map first anyway)
    "Dotenv": {"type": D, "color": "#e5d559",
               "filenames": [".env", ".env.example", ".env.local",
                             ".env.development", ".env.production",
                             ".env.test"]},
    "E-mail": {"type": D, "aliases": ["eml"],
               "extensions": [".eml", ".mbox"]},
    "Easybuild": {"type": D, "color": "#069406", "extensions": [".eb"]},
    "Ecere Projects": {"type": D, "color": "#913960",
                       "extensions": [".epj"]},
    "Edje Data Collection": {"type": D, "extensions": [".edc"]},
    "EditorConfig": {"type": D, "color": "#fff1f2", "group": "INI",
                     "filenames": [".editorconfig"]},
    "Elvish": {"type": P, "color": "#55BB55", "extensions": [".elv"],
               "interpreters": ["elvish"]},
    "Gemfile.lock": {"type": D, "color": "#701516",
                     "filenames": ["Gemfile.lock"]},
    "GEDCOM": {"type": D, "color": "#003058", "extensions": [".ged"]},
    "Genshi": {"type": P, "color": "#951531", "extensions": [".kid"]},
    "Gentoo Ebuild": {"type": P, "color": "#9400ff", "group": "Shell",
                      "extensions": [".ebuild"]},
    "Gentoo Eclass": {"type": P, "color": "#9400ff", "group": "Shell",
                      "extensions": [".eclass"]},
    "Glimmer JS": {"type": P, "color": "#F5835F", "extensions": [".gjs"]},
    "Glimmer TS": {"type": P, "color": "#3178c6", "extensions": [".gts"]},
    "Go Checksums": {"type": D, "color": "#00ADD8",
                     "filenames": ["go.sum", "go.work.sum"]},
    "Go Module": {"type": D, "color": "#00ADD8",
                  "filenames": ["go.mod", "go.work"]},
    "Godot Resource": {"type": D, "color": "#355570",
                       "extensions": [".tres", ".tscn"]},
    "Grace": {"type": P, "color": "#615f8b", "extensions": [".grace"]},
    "HTML+ECR": {"type": M, "color": "#2e1052", "aliases": ["ecr"],
                 "group": "HTML", "extensions": [".ecr"]},
    "HTML+EEX": {"type": M, "color": "#6e4a7e",
                 "aliases": ["eex", "heex", "leex"], "group": "HTML",
                 "extensions": [".eex", ".html.heex", ".html.leex"]},
    "HTML+ERB": {"type": M, "color": "#701516", "aliases": ["erb"],
                 "group": "HTML", "extensions": [".erb", ".html.erb"]},
    "HTML+PHP": {"type": M, "color": "#4f5d95", "group": "HTML",
                 "extensions": [".phtml"]},
    "HTML+Razor": {"type": M, "color": "#512be4", "aliases": ["razor"],
                   "group": "HTML", "extensions": [".cshtml", ".razor"]},
    "HXML": {"type": D, "color": "#f68712", "extensions": [".hxml"]},
    "HolyC": {"type": P, "color": "#ffefaf", "extensions": [".hc"]},
    "Hosts File": {"type": D, "color": "#308888",
                   "filenames": ["hosts", "HOSTS"]},
    "ImageJ Macro": {"type": P, "color": "#99AAFF",
                     "extensions": [".ijm"]},
    "Ignore List": {"type": D, "color": "#000000",
                    "aliases": ["gitignore"],
                    "filenames": [".gitignore", ".dockerignore",
                                  ".npmignore", ".eslintignore"]},
    "JAR Manifest": {"type": D, "color": "#b07219",
                     "filenames": ["MANIFEST.MF"]},
    "JCL": {"type": P, "color": "#d90e09", "extensions": [".jcl"]},
    "Jasmin": {"type": P, "color": "#d03600", "extensions": [".j"]},
    "Java Template Engine": {"type": M, "color": "#2A6277",
                             "aliases": ["jte"], "extensions": [".jte"]},
    "Jest Snapshot": {"type": D, "color": "#15c213",
                      "extensions": [".snap"]},
    "JetBrains MPS": {"type": P, "color": "#21D789", "aliases": ["mps"],
                      "extensions": [".mps"]},
    "Jison": {"type": P, "color": "#56b3cb", "group": "Yacc",
              "extensions": [".jison"]},
    "Jison Lex": {"type": P, "color": "#56b3cb", "group": "Lex",
                  "extensions": [".jisonlex"]},
    "KiCad Legacy Layout": {"type": D, "extensions": [".brd"]},
    "KiCad Schematic": {"type": D, "color": "#2f4aab",
                        "extensions": [".kicad_sch", ".kicad_sym"]},
    "Kit": {"type": M, "extensions": [".kit"]},
    "LiveCode Script": {"type": P, "color": "#0c5ba5",
                        "extensions": [".livecodescript"]},
    "Literate Agda": {"type": P, "color": "#315665", "group": "Agda",
                      "extensions": [".lagda"]},
    "MLIR": {"type": P, "color": "#5EC8DB", "extensions": [".mlir"]},
    "Max": {"type": P, "color": "#c4a79c",
            "aliases": ["max/msp", "maxmsp"],
            "extensions": [".maxpat", ".maxhelp", ".maxproj"]},
    "Microsoft Developer Studio Project": {"type": D,
                                           "extensions": [".dsp"]},
    "Microsoft Visual Studio Solution": {"type": D,
                                         "extensions": [".sln"]},
    "Mint": {"type": P, "color": "#02b046", "extensions": [".mint"]},
    "Modelica": {"type": P, "color": "#de1d31", "extensions": [".mo"]},
    "Monkey C": {"type": P, "color": "#8D6747", "extensions": [".mc"]},
    "NASL": {"type": P, "extensions": [".nasl"]},
    "NEON": {"type": D, "aliases": ["nette object notation"],
             "extensions": [".neon"]},
    # Nasal omitted: .nas is contested with Assembly and the upstream
    # disambiguation pattern was not recalled with confidence.
    # Nu: .nu stays with Nushell (pre-existing); filename + interpreter
    # still classify real Nu projects.
    "Nu": {"type": P, "color": "#c9df40", "aliases": ["nush"],
           "filenames": ["Nukefile"], "interpreters": ["nush"]},
    "ObjDump": {"type": D, "extensions": [".objdump"]},
    "OpenStep Property List": {"type": D,
                               "extensions": [".plist", ".glyphs"]},
    "Opa": {"type": P, "extensions": [".opa"]},
    "Ox": {"type": P, "extensions": [".ox", ".oxh", ".oxo"]},
    "Oxygene": {"type": P, "color": "#cdd0e3",
                "extensions": [".oxygene"]},
    "Parrot Assembly": {"type": P, "aliases": ["pasm"],
                        "extensions": [".pasm"]},
    "Parrot Internal Representation": {"type": P, "aliases": ["pir"],
                                       "extensions": [".pir"]},
    "Pep8": {"type": P, "color": "#C76F5B", "extensions": [".pep"]},
    "Portugol": {"type": P, "color": "#f8bd00", "extensions": [".por"]},
    "PowerBuilder": {"type": P, "color": "#8f0f8d",
                     "extensions": [".pbt", ".sra", ".sru"]},
    # .psc stays with Papyrus (pre-existing); .praat is unique
    "Praat": {"type": P, "color": "#c8506d", "extensions": [".praat"]},
    "RBS": {"type": D, "color": "#701516", "group": "Ruby",
            "extensions": [".rbs"]},
    "RON": {"type": D, "color": "#a62c00", "extensions": [".ron"]},
    "RPGLE": {"type": P, "color": "#2BDE21", "aliases": ["ile rpg"],
              "extensions": [".rpgle", ".sqlrpgle"]},
    "RUNOFF": {"type": M, "color": "#665a4e",
               "extensions": [".rnh", ".rno"]},
    "Readline Config": {"type": D, "aliases": ["inputrc"],
                        "filenames": [".inputrc", "inputrc"]},
    "Redirect Rules": {"type": D, "aliases": ["redirects"],
                       "filenames": ["_redirects"]},
    "Regular Expression": {"type": D, "color": "#009a00",
                           "aliases": ["regex", "regexp"],
                           "extensions": [".regexp", ".regex"]},
    "Rich Text Format": {"type": M, "extensions": [".rtf"]},
    "Roc": {"type": P, "color": "#7c38f5", "extensions": [".roc"]},
    "Rouge": {"type": P, "color": "#cc0088", "extensions": [".rg"]},
    "STAR": {"type": D, "extensions": [".star"]},
    "STL": {"type": D, "color": "#373b5e", "aliases": ["stereolithography"],
            "extensions": [".stl"]},
    "STON": {"type": D, "group": "Smalltalk", "extensions": [".ston"]},
    "SWIG": {"type": P, "extensions": [".i"]},
    "ShellCheck Config": {"type": D, "color": "#cecfcb",
                          "filenames": [".shellcheckrc"]},
    "Slash": {"type": P, "color": "#007eff", "extensions": [".sl"]},
    "SmPL": {"type": P, "color": "#c94949", "aliases": ["coccinelle"],
             "extensions": [".cocci"]},
    "Soong": {"type": D, "filenames": ["Android.bp"]},
    "Spline Font Database": {"type": D, "extensions": [".sfd"]},
    "SugarSS": {"type": M, "color": "#2fcc9f", "group": "CSS",
                "extensions": [".sss"]},
    "Sweave": {"type": P, "color": "#198ce7", "group": "R",
               "extensions": [".rnw"]},
    "TI Program": {"type": P, "color": "#A0AA87", "extensions": [".8xp"]},
    "Tcsh": {"type": P, "group": "Shell",
             "extensions": [".tcsh", ".csh"],
             "interpreters": ["tcsh", "csh"]},
    "Tea": {"type": M, "extensions": [".tea"]},
    "Texinfo": {"type": PR,
                "extensions": [".texinfo", ".texi", ".txi"],
                "interpreters": ["makeinfo"]},
    "TextMate Properties": {"type": D, "color": "#df66e4",
                            "filenames": [".tm_properties"]},
    "Type Language": {"type": D, "aliases": ["tl"],
                      "extensions": [".tl"]},
    "Unified Parallel C": {"type": P, "color": "#4e3617", "group": "C",
                           "extensions": [".upc"]},
    "Unix Assembly": {"type": P, "group": "Assembly",
                      "aliases": ["gas", "gnu asm", "unix asm"],
                      "extensions": [".s", ".ms"]},
    "Valve Data Format": {"type": D, "color": "#f26025",
                          "aliases": ["keyvalues", "vdf"],
                          "extensions": [".vdf"]},
    "Vim Snippet": {"type": M, "color": "#199f4b",
                    "aliases": ["snipmate", "ultisnips"],
                    "extensions": [".snip", ".snippet", ".snippets"]},
    "Web Ontology Language": {"type": D, "color": "#5b70bd",
                              "extensions": [".owl"]},
    "Wget Config": {"type": D, "aliases": ["wgetrc"],
                    "filenames": [".wgetrc"]},
    "Witcher Script": {"type": P, "color": "#ff0000",
                       "extensions": [".ws"]},
    "X BitMap": {"type": D, "aliases": ["xbm"], "group": "C",
                 "extensions": [".xbm"]},
    "X PixMap": {"type": D, "aliases": ["xpm"], "group": "C",
                 "extensions": [".xpm"]},
    "XAML": {"type": D, "color": "#0060ac", "extensions": [".xaml"]},
    "XProc": {"type": P, "extensions": [".xpl", ".xproc"]},
    "XS": {"type": P, "extensions": [".xs"]},
    "Yul": {"type": P, "color": "#794932", "extensions": [".yul"]},
    "ZAP": {"type": P, "color": "#0d665e", "extensions": [".zap"]},
    "Zeek": {"type": P, "aliases": ["bro"],
             "extensions": [".zeek", ".bro"]},
    "eC": {"type": P, "color": "#913960", "extensions": [".ec", ".eh"]},
    "mupad": {"type": P, "color": "#244963", "extensions": [".mu"]},
    "ooc": {"type": P, "color": "#b0b77e", "extensions": [".ooc"]},
}

# extension removals from EXISTING languages, to match upstream ownership
EXT_REMOVE: dict[str, list[str]] = {
    "XML": [".xaml"],  # upstream: .xaml belongs to XAML alone
}

# disambiguation groups for this batch's contested extensions (written
# from knowledge of the public heuristics.yml dataset; derivations marked)
NEW_GROUPS: list[dict] = [
    {"extensions": [".al"], "rules": [
        {"language": "AL",
         "pattern": r"\b(?i:(CODEUNIT|PAGE|PAGEEXTENSION|PAGECUSTOMIZATION"
                    r"|DOTNET|ENUM|ENUMEXTENSION|QUERY|REPORT|TABLE"
                    r"|TABLEEXTENSION|XMLPORT))\b"},
        {"language": "Perl"},  # upstream's explicit pattern-free fallback
    ]},
    {"extensions": [".dsp"], "rules": [
        {"language": "Faust",
         "pattern": r"\bprocess\s*[(=]|\b(library|import)\s*\(\s*\x22"
                    r"|\bdeclare\s+(name|version|author)\s+\x22"},
        {"language": "Microsoft Developer Studio Project",
         "pattern": r"# Microsoft Developer Studio"},
    ]},
    {"extensions": [".i"], "rules": [
        # derived ORDER: upstream lists an m68k-assembly pattern first;
        # SWIG directives (%module, %{ ... %}) never appear in assembly,
        # so testing SWIG first with a pattern-free Assembly fallback
        # preserves upstream outcomes without the long m68k alternation.
        {"language": "SWIG",
         "pattern": r"^[ \t]*%[a-z_]+\b|^%[{}]$"},
        {"language": "Assembly"},
    ]},
    {"extensions": [".star"], "rules": [
        {"language": "STAR", "pattern": r"^loop_\s*$"},
        {"language": "Starlark"},  # upstream's pattern-free fallback
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
    skipped = []
    for name in sorted(NEW_LANGS):
        if name in cur:
            skipped.append(name)
        cur[name] = NEW_LANGS[name]
    for name, exts in EXT_REMOVE.items():
        meta = cur[name]
        meta["extensions"] = [
            e for e in meta.get("extensions", []) if e not in exts
        ]
    langs["languages"] = {k: cur[k] for k in sorted(cur)}

    by_key = {tuple(g["extensions"]): g for g in heur["disambiguations"]}
    for g in NEW_GROUPS:
        key = tuple(g["extensions"])
        if key in by_key:
            skipped.append("group:" + ",".join(key))
        by_key[key] = g
    heur["disambiguations"] = [by_key[k] for k in sorted(by_key)]
    return langs, heur, skipped


def validate(langs: dict, heur: dict) -> list[str]:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from linguistjs_spark.pcre import compile_pcre

    problems = []
    cur = langs["languages"]
    ext_map: dict[str, list[str]] = {}
    for name, meta in cur.items():
        if "type" not in meta:
            problems.append(f"{name}: missing type")
        if not meta.get("extensions") and not meta.get("filenames"):
            problems.append(f"{name}: no extensions or filenames")
        for e in meta.get("extensions", []):
            if not e.startswith("."):
                problems.append(f"{name}: bad extension {e!r}")
            ext_map.setdefault(e, []).append(name)
        g = meta.get("group")
        if g and g not in cur:
            problems.append(f"{name}: group {g!r} not a language")

    grouped: set[str] = set()
    for g in heur["disambiguations"]:
        grouped.update(g["extensions"])
        for rule in g["rules"]:
            if rule["language"] not in cur:
                problems.append(
                    f"rule language not in snapshot: {rule['language']}"
                )
            pat = rule.get("pattern")
            if pat:
                try:
                    compile_pcre(pat)
                except Exception as exc:  # noqa: BLE001
                    problems.append(
                        f"pattern fails to compile: {pat!r}: {exc}"
                    )
    batch = set(NEW_LANGS)
    for e, names in sorted(ext_map.items()):
        if len(names) > 1 and batch & set(names) and e not in grouped:
            problems.append(
                f"batch-4 extension collision without group: "
                f"{e} -> {sorted(names)}"
            )
    return problems


if __name__ == "__main__":
    langs, heur, skipped = merged()
    problems = validate(langs, heur)
    for p in problems:
        print(p)
    if skipped:
        print(f"already present (overwritten): {skipped}")
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
