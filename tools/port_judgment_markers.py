#!/usr/bin/env python3
"""Port the reference's judgment outcome marker tables to JSON config.

Dev tool only. AST-extracts the module-level `all_judgment_markers`
dict from judgment_extracting_functions.py:66-121 (Language ->
Judgment -> [marker]), OR-joins each outcome's list exactly like
prepare_judgment_markers (judgment_extracting_functions.py:336-342 —
no NFC there, join only), and writes
src/main/resources/graft/judgment_markers.json as
{lang: {outcome: "joined|markers"}}.

The marker strings are reference DATA ported for parity. Quirks are
ported verbatim (e.g. the FR partial-approval list's missing comma
that implicitly concatenates two markers into one dead pattern) so
behavior matches the reference exactly.
"""
import ast
import json
import sys

SRC = "/root/reference/scrc/preprocessors/extractors/spider_specific/judgment_extracting_functions.py"
OUT = "/root/repo/src/main/resources/graft/judgment_markers.json"

LANGS = {"DE": "de", "FR": "fr", "IT": "it", "EN": "en"}
OUTCOMES = {"APPROVAL": "approval", "PARTIAL_APPROVAL": "partial_approval",
            "DISMISSAL": "dismissal", "PARTIAL_DISMISSAL": "partial_dismissal",
            "INADMISSIBLE": "inadmissible", "WRITE_OFF": "write_off",
            "UNIFICATION": "unification"}


def main():
    tree = ast.parse(open(SRC).read())
    table = None
    for node in tree.body:  # module level only — skip UR_Gerichte's local override
        if isinstance(node, ast.Assign) and any(
                isinstance(t, ast.Name) and t.id == "all_judgment_markers"
                for t in node.targets):
            table = node.value
    assert isinstance(table, ast.Dict), "all_judgment_markers not found"
    out = {}
    for lk, lv in zip(table.keys, table.values):
        lang = LANGS[lk.attr]
        assert isinstance(lv, ast.Dict)
        secs = {}
        for ok, ov in zip(lv.keys, lv.values):
            outcome = OUTCOMES[ok.attr]
            pats = []
            for el in ov.elts:
                assert isinstance(el, ast.Constant) and isinstance(el.value, str), \
                    f"non-constant marker in {lang}.{outcome}"
                pats.append(el.value)
            secs[outcome] = "|".join(pats)
        out[lang] = secs
    json.dump(out, open(OUT, "w"), ensure_ascii=False, indent=1, sort_keys=True)
    print(f"wrote {sum(len(v) for v in out.values())} outcome tables "
          f"for {sorted(out)} to {OUT}")


if __name__ == "__main__":
    sys.exit(main())
