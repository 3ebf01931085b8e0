#!/usr/bin/env python3
"""Port the reference's per-spider cleaning regexes to a bundled resource.

Dev tool only. Reads spider_specific/cleaning_regexes.json (15 spiders,
ordered regex->replacement lists with {namespace} templates) and writes
src/main/resources/graft/cleaning_regexes.json re-keyed as
{spider: {"<index>": {"pattern": ..., "replacement": ...}}} — numeric
string keys keep the application order through the engine's minimal
object-of-objects JSON parser (descriptions dropped; they are comments).
"""
import json

SRC = "/root/reference/scrc/preprocessors/extractors/spider_specific/cleaning_regexes.json"
OUT = "/root/repo/src/main/resources/graft/cleaning_regexes.json"

src = json.load(open(SRC))
out = {spider: {str(i): {"pattern": r["pattern"], "replacement": r["replacement"]}
                for i, r in enumerate(rules)}
       for spider, rules in src.items()}
json.dump(out, open(OUT, "w"), ensure_ascii=False, indent=1, sort_keys=True)
print(f"wrote {sum(len(v) for v in out.values())} rules for {len(out)} spiders")
