#!/usr/bin/env python3
"""Port the reference's citation regex bank to a bundled resource.

Dev tool only. Reads citation_extraction/citation_regexes.json
(ruling/BGE, ruling/Bger and law regex lists per language, each rule a
{regex, example} pair) and writes
src/main/resources/graft/citation_regexes.json flattened to
{"ruling/BGE/de": {"0": {"regex": ..., "example": ...}, ...}, ...} —
numeric string keys keep order through the engine's minimal
object-of-objects JSON parser.
"""
import json

SRC = "/root/reference/citation_extraction/citation_extraction/citation_regexes.json"
OUT = "/root/repo/src/main/resources/graft/citation_regexes.json"


def flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = {str(i): {"regex": r["regex"], "example": r["example"]}
                        for i, r in enumerate(v)}
    return out


src = json.load(open(SRC))
out = flatten(src)
json.dump(out, open(OUT, "w"), ensure_ascii=False, indent=1, sort_keys=True)
print(f"wrote {sum(len(v) for v in out.values())} regexes in {len(out)} categories")
