#!/usr/bin/env python3
"""Validate Bench's dual-axis sentinel normalization under DELIBERATE
load (ADVICE r17: "validate with loadgen that per-axis sentinel
inflation tracks suite inflation before trusting min() across axes").

Three captures of the same query subset on unchanged code: quiet, under
tools/loadgen.sh cpu, and under tools/loadgen.sh io. For each, the
artifact records the suite's inflation vs quiet alongside each
sentinel axis's inflation vs its ref, plus the normalized value — the
claim under test is (a) the loaded axis inflates WITH the suite, (b)
the un-loaded axis does not produce a spurious deep discount, and
(c) the r18 floor keeps value_norm at or above the quiet truth.

Settle-gating is disabled for the loaded runs (the load is the point);
the settled:false flags ride the artifact as always.

Usage: python3 tools/run_loadgen_probe.py [only_regex] [out.json]
Dev tooling only.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = "/root/repo"


def settle(max_wait=300.0, target=4.0):
    t0 = time.time()
    while os.getloadavg()[0] > target and time.time() - t0 < max_wait:
        time.sleep(5)
    return os.getloadavg()[0]


def run_bench(only, extra_env):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_ONLY=only, SPARK_GRAFT_ITERS="2",
               SPARK_GRAFT_RESET_ITERS="0", **extra_env)
    with tempfile.TemporaryDirectory() as cwd:
        subprocess.run(["bash", f"{REPO}/tools/run_main.sh", "graft.Bench"],
                       cwd=cwd, env=env, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(os.path.join(cwd, "BENCH_LOCAL.json")) as f:
            return json.loads(f.read())


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else "^q0"
    out = sys.argv[2] if len(sys.argv) > 2 else f"{REPO}/BENCH_loadgen_probe.json"
    rows = {}
    for regime, mode in (("quiet", None), ("cpu_loaded", "cpu"),
                         ("io_loaded", "io")):
        print(f"== {regime}", flush=True)
        gen = None
        extra = {}
        if mode is None:
            settle()
        else:
            # the load IS the condition under test — do not settle into it
            extra = {"SPARK_GRAFT_SETTLE_LOAD": "0"}
            gen = subprocess.Popen(["bash", f"{REPO}/tools/loadgen.sh",
                                    mode, "600"])
            time.sleep(10)  # let the window establish before the JVM starts
        try:
            full = run_bench(only, extra)
        finally:
            if gen is not None:
                gen.terminate()
                gen.wait()
                # let the window drain before the next regime
                settle()
        s = full["sentinel"]
        rows[regime] = {
            "value": full["value"], "value_norm": full["value_norm"],
            "iter_walls": full["iter_walls"],
            "cpu_trace": s.get("trace_warm"),
            "norm_warm": s.get("norm_warm"),
            "floored": s.get("floored"), "axis_disagree": s.get("axis_disagree"),
            "cpu_ref": s.get("ref"), "io_ref": s.get("io_ref"),
            "settled_iters": full["load"].get("settled_iters"),
        }
        print(f"   value {full['value']:.2f} norm {full['value_norm']:.2f}",
              flush=True)

    q = rows["quiet"]
    def infl(r):
        return round(r["value"] / q["value"], 2)
    artifact = {
        "metric": "loadgen_axis_validation", "only": only,
        "suite_inflation": {k: infl(v) for k, v in rows.items()},
        "claim": "loaded axis inflates with the suite; unloaded axis does "
                 "not spuriously deep-discount; floor keeps value_norm >= "
                 "quiet truth on settled iterations",
        "rows": rows,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["suite_inflation"], indent=1))


if __name__ == "__main__":
    main()
