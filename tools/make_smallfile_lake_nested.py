#!/usr/bin/env python3
"""Generate the NESTED-layout million-small-file lake for the
compaction watermark probe (VERDICT r8 task 1).

Same record shape and ~1M-file scale as make_smallfile_lake.py, but
laid out over the reference flusher's own default nesting
(`year=%Y/month=%m/day=%d`, reference flushers/local_lake.py:55-60)
instead of date=/hour=. This is the layout where a first-level-only
watermark is year-granular (a December delta re-lists the whole year);
the full-relative-path watermark must keep the delta cost at seconds.

Layout: benchdata/smallfiles_nested/year=YYYY/month=MM/day=DD/ev-N.json
  3 years x 12 months x 28 days = 1008 day dirs x 994 files
  = 1,001,952 files, ~130 B each.

Dev tooling only (driver-side python); the engine never depends on this.

Usage: python3 tools/make_smallfile_lake_nested.py [files_per_day]
"""
import json
import multiprocessing as mp
import os
import sys
import time

ROOT = "/root/repo/benchdata/smallfiles_nested"
PER_DAY = int(sys.argv[1]) if len(sys.argv) > 1 else 994
YEARS = [2022, 2023, 2024]


def write_day(job):
    yi, year, month, day = job
    d = f"{ROOT}/year={year}/month={month:02d}/day={day:02d}"
    os.makedirs(d, exist_ok=True)
    base = ((yi * 12 + month) * 31 + day) * 86400
    n = 0
    for i in range(PER_DAY):
        rec = {
            "ts": base + i,
            "host": f"h{(yi * 372 + month * 31 + day + i) % 512:03d}",
            "event": "tick" if i % 3 else "flush",
            "seq": i,
            "payload": f"p{year}{month:02d}{day:02d}{i:04d}",
        }
        with open(f"{d}/ev-{i:05d}.json", "w") as f:
            f.write(json.dumps(rec, separators=(",", ":")) + "\n")
        n += 1
    return n


def main():
    if os.path.exists(ROOT):
        print(f"{ROOT} already exists; remove it to regenerate", file=sys.stderr)
        sys.exit(1)
    t0 = time.time()
    jobs = [(yi, y, m, d)
            for yi, y in enumerate(YEARS)
            for m in range(1, 13) for d in range(1, 29)]
    with mp.Pool(min(24, os.cpu_count() or 8)) as pool:
        total = sum(pool.imap_unordered(write_day, jobs, chunksize=4))
    print(f"wrote {total} files under {ROOT} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
