#!/usr/bin/env python3
"""Port the reference's per-spider section-marker tables to JSON config.

Dev tool only (never shipped in the Spark library). Reads
/root/reference/scrc/preprocessors/extractors/spider_specific/
section_splitting_functions.py, AST-extracts each spider function's
`all_section_markers` dict literal (Language.X -> Section.Y -> [regex]),
OR-joins each section's list exactly like the reference's
prepare_section_markers (section_splitting_functions.py:733-747,
including the NFC normalization), and writes
src/main/resources/graft/markers.json as
{spider: {lang: {section: "joined|regex"}}}.

The marker strings are reference DATA (not code) ported for parity,
same as the golden test fixtures.
"""
import ast
import json
import sys
import unicodedata

SRC = "/root/reference/scrc/preprocessors/extractors/spider_specific/section_splitting_functions.py"
OUT = "/root/repo/src/main/resources/graft/markers.json"

LANGS = {"DE": "de", "FR": "fr", "IT": "it", "EN": "en"}
SECTIONS = {"HEADER": "header", "TOPIC": "topic", "FACTS": "facts",
            "CONSIDERATIONS": "considerations", "RULINGS": "rulings",
            "FOOTER": "footer", "FULL_TEXT": "full_text"}


def attr_name(node):
    if isinstance(node, ast.Attribute):
        return node.attr
    return None


def extract_markers(fn):
    """Find `all_section_markers = {...}` in fn body; return
    {lang: {section: [patterns]}} or None."""
    for stmt in ast.walk(fn):
        if not isinstance(stmt, ast.Assign):
            continue
        tgts = [t.id for t in stmt.targets if isinstance(t, ast.Name)]
        if "all_section_markers" not in tgts:
            continue
        if not isinstance(stmt.value, ast.Dict):
            return ("skip", "assignment is not a dict literal")
        out = {}
        for lk, lv in zip(stmt.value.keys, stmt.value.values):
            lang = attr_name(lk)
            if lang not in LANGS:
                return ("skip", f"unexpected language key {ast.dump(lk)[:60]}")
            if not isinstance(lv, ast.Dict):
                return ("skip", "language value is not a dict literal")
            secs = {}
            for sk, sv in zip(lv.keys, lv.values):
                sec = attr_name(sk)
                if sec not in SECTIONS:
                    return ("skip", f"unexpected section key {ast.dump(sk)[:60]}")
                pats = []
                if isinstance(sv, (ast.List, ast.Tuple)):
                    for el in sv.elts:
                        if isinstance(el, ast.Constant) and isinstance(el.value, str):
                            pats.append(el.value)
                        else:
                            return ("skip", f"non-constant pattern in {sec}")
                elif isinstance(sv, ast.Constant) and isinstance(sv.value, str):
                    pats.append(sv.value)
                else:
                    return ("skip", f"section {sec} value not a list")
                secs[SECTIONS[sec]] = pats
            out[LANGS[lang]] = secs
        return ("ok", out)
    return ("skip", "no all_section_markers assignment")


def main():
    tree = ast.parse(open(SRC).read())
    spiders = {}
    skipped = []
    helpers = {"XX_SPIDER", "valid_namespace", "prepare_section_markers",
               "associate_sections", "update_section"}
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef) or node.name in helpers:
            continue
        status, val = extract_markers(node)
        if status == "ok":
            # join + NFC exactly like prepare_section_markers
            joined = {lang: {sec: unicodedata.normalize("NFC", "|".join(pats))
                             for sec, pats in secs.items() if pats}
                      for lang, secs in val.items()}
            spiders[node.name] = joined  # duplicate defs: last wins, like Python
        else:
            skipped.append((node.name, val))
    json.dump(spiders, open(OUT, "w"), ensure_ascii=False, indent=1, sort_keys=True)
    print(f"wrote {len(spiders)} spiders to {OUT}")
    for name, why in skipped:
        print(f"SKIPPED {name}: {why}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
