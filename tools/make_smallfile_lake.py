#!/usr/bin/env python3
"""Generate the million-small-file lake for the compaction scale probe
(VERDICT r6 task 1).

The reference's headline claim is "consolidate millions of small files"
(reference README.md:10); the engine's largest measured compaction before
this probe was 20k files (SURVEY section 9.1). This builds a
realistically-shaped worst case: ~1M tiny JSON event files spread over a
nested date=/hour= tree — the layout a fleet of per-host log shippers
leaves behind, and the canonical driver-side listing stress for Spark
(InMemoryFileIndex holds one FileStatus per file).

Layout: benchdata/smallfiles/date=YYYY-MM-DD/hour=HH/ev-NNNNN.json
  250 days x 24 hours x 167 files = 1,002,000 files, ~130 B each
  (~130 MB of payload carried by a million inodes).

Dev tooling only (driver-side python); the engine never depends on this.

Usage: python3 tools/make_smallfile_lake.py [n_days] [files_per_hour]
"""
import json
import multiprocessing as mp
import os
import sys
import time

ROOT = "/root/repo/benchdata/smallfiles"
DAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 250
PER_HOUR = int(sys.argv[2]) if len(sys.argv) > 2 else 167
BASE_DAY = 19000  # days since epoch (2022-01-08); only the SHAPE matters


def write_hour(job):
    import datetime
    day_idx, hour = job
    day = BASE_DAY + day_idx
    # real calendar date: the mapping day ordinal -> directory must be
    # injective or colliding (date, hour) dirs silently overwrite each
    # other's files and the lake comes up short
    date = (datetime.date(1970, 1, 1) + datetime.timedelta(days=day)).isoformat()
    d = f"{ROOT}/date={date}/hour={hour:02d}"
    os.makedirs(d, exist_ok=True)
    n = 0
    for i in range(PER_HOUR):
        rec = {
            "ts": day * 86400 + hour * 3600 + i,
            "host": f"h{(day_idx * 24 + hour + i) % 512:03d}",
            "event": "tick" if i % 3 else "flush",
            "seq": i,
            "payload": f"p{day_idx:03d}{hour:02d}{i:04d}",
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
    jobs = [(d, h) for d in range(DAYS) for h in range(24)]
    with mp.Pool(min(24, os.cpu_count() or 8)) as pool:
        total = sum(pool.imap_unordered(write_hour, jobs, chunksize=16))
    print(f"wrote {total} files under {ROOT} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
