#!/usr/bin/env python3
"""Assemble BENCH_durability_probe.json from the per-corpus probe logs."""
import json
import sys

LOGS = sys.argv[1:] or [
    "/tmp/art_dur_sf01.log",
    "/tmp/art_dur_sf10.log",
    "/tmp/art_dur_sf10org.log",
]

runs = []
for p in LOGS:
    with open(p) as f:
        for line in reversed(f.read().splitlines()):
            line = line.strip()
            if line.startswith('{"metric":"durability_probe"'):
                runs.append(json.loads(line))
                break
        else:
            print(f"WARN: no probe JSON in {p}", file=sys.stderr)

note = (
    "bootstrap 50% + five 10% days; retirement asserted {current, rollback} "
    "after every day; day-5 output row-equals the monolithic pipeline; "
    "torn-commit simulation (version meta deleted after the index append) "
    "self-heals on retry with the day AND the next day monolithic-equal. "
    "Three corpora: sf0.1 (5k organic), sf10 (all-duplicate 500k - flat-"
    "state worst case: version bytes flat, index growth ~KB/day because "
    "only novel content lands), and NEW sf10organic (novel-content 500k, "
    "tools/make_sf10_organic.py): day walls flat across five days while "
    "the append-only index grows in proportion to each day's ~50k novel "
    "documents and version dirs stay survivor-metadata-sized - the "
    "index-growth-tracks-novelty claim measured at 500k rows instead of "
    "argued from the sf0.1 shape."
)

out = {"metric": "durability_probe", "days": 5, "note": note, "runs": runs}
with open("/root/repo/BENCH_durability_probe.json", "w") as f:
    json.dump(out, f)
    f.write("\n")
print(f"assembled {len(runs)} runs")
for r in runs:
    print(" ", r.get("sf"), "walls", r.get("day_walls"),
          "ix_bytes", r.get("index_bytes_by_day"),
          "v_bytes", r.get("version_bytes_by_day"))
