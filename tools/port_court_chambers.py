#!/usr/bin/env python3
"""Port the reference's court/chamber hierarchy to JSON config.

Dev tool only (never shipped in the Spark library). Reads
/root/reference/legal_info/court_chambers.json (canton -> gerichte ->
kammern with de/fr/it display names) and writes the condensed lookup
the lower-court extractor needs (lower_court_extracting_functions.py:
78-114 resolves canton text -> canton short, court text -> court short,
chamber text -> chamber short over exactly these name triples) to
src/main/resources/graft/court_chambers.json as nested string-leaf
objects (the shape graft's MiniJson reader accepts):
{canton_short: {"de":.., "fr":.., "it":..,
                "courts": {court_short: {"de":.., "fr":.., "it":..,
                           "chambers": {chamber_short: {"de":..,"fr":..,"it":..}}}}}}.

Chambers lacking a full de/fr/it name triple are dropped, mirroring the
reference's `{'de','fr','it'} <= current_court_data.keys()` guard.
The names are reference DATA (not code) ported for parity.
"""
import json

SRC = "/root/reference/legal_info/court_chambers.json"
OUT = "/root/repo/src/main/resources/graft/court_chambers.json"

src = json.load(open(SRC))
out = {}
for canton_short, canton in src.items():
    courts = {}
    for court_short, court in canton.get("gerichte", {}).items():
        chambers = {}
        for ch_short, ch in court.get("kammern", {}).items():
            if {"de", "fr", "it"} <= ch.keys():
                chambers[ch_short] = {"de": ch["de"], "fr": ch["fr"], "it": ch["it"]}
        courts[court_short] = {
            "de": court.get("de", ""), "fr": court.get("fr", ""), "it": court.get("it", ""),
            "chambers": chambers,
        }
    out[canton_short] = {
        "de": canton.get("de", ""), "fr": canton.get("fr", ""), "it": canton.get("it", ""),
        "courts": courts,
    }

with open(OUT, "w") as f:
    json.dump(out, f, ensure_ascii=False, separators=(",", ":"))
print(f"{len(out)} cantons, "
      f"{sum(len(c['courts']) for c in out.values())} courts, "
      f"{sum(len(ct['chambers']) for c in out.values() for ct in c['courts'].values())} chambers")
