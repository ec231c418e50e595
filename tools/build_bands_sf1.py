#!/usr/bin/env python3
"""Build BANDS_sf1.json — coarse timing bands for the sf1 (10x bench
scale) tier (VERDICT r17 #6): the r17 sweep proved the tier's
CORRECTNESS at sf1; this pins its TIMINGS so the next scale regression
flags automatically instead of via ad-hoc probes.

Input: one or more logs of `[bench] <entry> cold=... warm=... cpu_warm=...`
lines from `SPARK_GRAFT_SF_DIR=<sf1 dir> runMain graft.Bench <entries>`
runs (entry-arg mode prints the lines and does NOT clobber BENCH.json).
Bands are deliberately coarse (hi = max reading * 1.5 + 0.4/0.15 abs
slack, lo = min * 0.5): the sf1 tier runs in shared multi-entry JVMs,
not the suite harness, so per-reading variance is higher than the
sf0.1 suite basis and the band's job is catching 2x+ scale
regressions, not 20% drift.

Usage: python3 tools/build_bands_sf1.py <out.json> <log> [<log> ...]
"""
import json, re, sys


def main():
    out_path, logs = sys.argv[1], sys.argv[2:]
    pat = re.compile(r"\[bench\] (\S+) cold=\S+ warm=([\d.]+) cpu_cold=\S+ "
                     r"cpu_warm=([\d.]+)")
    readings = {}
    for lf in logs:
        for line in open(lf):
            m = pat.search(line)
            if m:
                readings.setdefault(m.group(1), []).append(
                    (float(m.group(2)), float(m.group(3))))
    entries = {}
    for k, rs in sorted(readings.items()):
        walls = [w for w, _ in rs]
        cpus = [c for _, c in rs]
        entries[k] = {
            "wall": [round(min(walls) * 0.5, 2),
                     round(max(walls) * 1.5 + 0.15, 2)],
            "cpu": [round(min(cpus) * 0.5, 2),
                    round(max(cpus) * 1.5 + 0.4, 2)],
            "basis": f"sf1 tier, {len(rs)} multi-entry-JVM readings",
        }
    json.dump({
        "sf": "sf1",
        "policy": ("coarse +-50% bands over sf1 tier readings "
                   "(multi-entry JVM, not the suite harness); purpose is "
                   "flagging 2x+ scale regressions, compare warm/cpu_warm "
                   "vs hi"),
        "entries": entries,
    }, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: {len(entries)} entries")


if __name__ == "__main__":
    main()
