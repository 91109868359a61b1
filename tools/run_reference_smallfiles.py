#!/usr/bin/env python3
"""Head-to-head: the REFERENCE collector over the million-small-file
lake (companion to BENCH_smallfile_probe.json / SURVEY section 9.1).

Drives lakeflush's LocalLakeCollector (single-core, sequential append —
its real architecture) over the same 1,002,000-file tree that
graft.CompactProbe compacts in 58.7 s, with the same 8 MiB bundle
target, and reports wall, files/s, bundles and bytes out.

The watchdog dependency (flusher-only; not shipped in this container)
is stubbed: the collector path under measurement never touches it.
Dev tooling only. Usage: python3 tools/run_reference_smallfiles.py
"""
import json
import os
import shutil
import sys
import time
import types

# stub the flusher-only watchdog dependency before importing the package
wd = types.ModuleType("watchdog")
wd.__path__ = []  # mark as package so submodule imports resolve
obs = types.ModuleType("watchdog.observers")
obs.Observer = type("Observer", (), {})
ev = types.ModuleType("watchdog.events")
ev.FileSystemEventHandler = type("FileSystemEventHandler", (), {})
ev.FileSystemEvent = type("FileSystemEvent", (), {})
wd.observers = obs
wd.events = ev
sys.modules["watchdog"] = wd
sys.modules["watchdog.observers"] = obs
sys.modules["watchdog.events"] = ev

sys.path.insert(0, "/root/reference")
from lakeflush.collectors import LocalLakeCollector  # noqa: E402

SRC = "/root/repo/benchdata/smallfiles"
OUT = "/root/repo/benchdata/ref_smallfiles_out"


def main():
    n_in = sum(len(fs) for _, _, fs in os.walk(SRC))
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    c = LocalLakeCollector(
        root_dir=SRC,
        filepath=OUT,
        filename="bundle",
        max_size_mb=8,
        max_time_mins=120,  # effectively size-only rotation, like the probe
        batch_size=1000,
    )
    t0 = time.time()
    c.start()
    wall = time.time() - t0
    outs = [f for f in os.listdir(OUT)]
    bundles = [f for f in outs if "collected" in f]
    total = sum(os.path.getsize(os.path.join(OUT, f)) for f in outs)
    res = {
        "metric": "reference_smallfile_collect",
        "n_files": n_in,
        "wall_sec": round(wall, 1),
        "files_per_sec": round(n_in / wall),
        "bundles_collected": len(bundles),
        "out_files_total": len(outs),
        "bytes_out": total,
        "cores": 1,
    }
    with open("/root/repo/BENCH_smallfile_reference.json", "w") as f:
        json.dump(res, f)
        f.write("\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
