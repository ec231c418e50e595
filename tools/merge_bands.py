#!/usr/bin/env python3
"""Surgically update BANDS.json: re-band ONLY the named entries from
fresh suite runs + isolated probes (build_bands.py policy), leave every
other entry untouched, and refresh `calib_sec` from the fresh runs'
suite-start calibration readings.

Rationale: the full rebuild (build_bands.py) needs the original ~14 run
files, which are session-scratch; re-running it from 2-3 fresh runs
would silently narrow every established band's basis. New/changed
entries, though, have no valid band at all — those are banded from
fresh data under the same formulas.

Usage:
  python3 tools/merge_bands.py <bands.json> <probes.log> \
      <entry1,entry2,...> <run.json> [<run.json> ...]
"""
import json, re, sys

BAND_LOAD_CUT = 12.0


def main():
    bands_path, probes_path, only, runs = (
        sys.argv[1], sys.argv[2], set(sys.argv[3].split(",")), sys.argv[4:])
    out = json.load(open(bands_path))
    assert out.get("sf") == "sf0.1"

    suite, calibs = {}, []
    for rf in runs:
        j = json.load(open(rf))
        assert str(j["sf"]).endswith("0.1"), f"{rf} is not a sf0.1 run"
        if j.get("calib", {}).get("start"):
            calibs.append(j["calib"]["start"])
        for k, d in j["detail"].items():
            if d["warm"] >= 0:
                suite.setdefault(k, []).append(
                    (d["warm"], d["cpu_warm"], d["load_warm"]))

    probes = {}
    pat = re.compile(r"\[bench\] (\S+) cold=\S+ warm=([\d.]+) cpu_cold=\S+ "
                     r"cpu_warm=([\d.]+)")
    for line in open(probes_path):
        m = pat.search(line)
        if m:
            probes.setdefault(m.group(1), []).append(
                (float(m.group(2)), float(m.group(3))))

    for k in sorted(only):
        rs = suite.get(k, [])
        low = [r for r in rs if r[2] < BAND_LOAD_CUT]
        pw = [w for w, _ in probes.get(k, [])]
        assert low or pw, f"{k}: no readings at all"
        if low:
            # probe walls are NOT pooled into the wall band (r18 policy
            # fix, same as build_bands.py: a probe pays index builds /
            # JVM startup the suite amortizes, so pooling inflates the
            # ceiling); probes stay recorded as probe_wall/probe_cpu
            cpus = [c for _, c, _ in low]
            walls = [w for w, _, _ in low]
            pad = 1.30 if len(low) >= 2 else 1.45
            cpu_hi = max(cpus) * pad + 0.4
            wall_hi = max(walls) * (1.30 if len(walls) >= 2 else 1.45) + 0.15
            cpu_lo, wall_lo = min(cpus) * 0.6, min(walls) * 0.6
            basis = (f"merge: suite({len(low)} @load<{BAND_LOAD_CUT:g})"
                     + (f"+probe({len(pw)}: recorded, not pooled)" if pw else ""))
        else:
            # probe-only: walls are suite-comparable, probe CPU is not
            # (isolated JVM charges all JIT to one entry) — the CPU hi
            # from probe cpu is therefore generous by construction and
            # marked as such; first suite runs should re-merge.
            # Upper bounds derive from max(), not min(): a band built
            # from min() fails on its own basis data whenever probe
            # readings spread more than the pad (ADVICE r10).
            pc = [c for _, c in probes[k]]
            wall_hi = max(pw) * 1.35 + 0.15
            cpu_hi = max(pc) * 1.35 + 0.4
            cpu_lo, wall_lo = min(pc) * 0.3, min(pw) * 0.6
            basis = f"merge: probe-only({len(pw)}); cpu hi from probe cpu (generous)"
        e = {"wall": [round(wall_lo, 2), round(wall_hi, 2)],
             "cpu": [round(cpu_lo, 2), round(cpu_hi, 2)],
             "basis": basis}
        if pw:
            e["probe_wall"] = [round(min(pw), 2), round(max(pw), 2)]
            pc = [c for _, c in probes[k]]
            e["probe_cpu"] = [round(min(pc), 2), round(max(pc), 2)]
        old = out["entries"].get(k)
        out["entries"][k] = e
        print(f"{k}: {old and old['wall']}→{e['wall']} wall, "
              f"{old and old['cpu']}→{e['cpu']} cpu ({basis})")

    if calibs:
        prev = out.get("calib_sec")
        nom = min([prev] * bool(prev) + calibs) if prev else min(calibs)
        out["calib_sec"] = round(nom, 3)
        print(f"calib_sec: {prev} → {out['calib_sec']} "
              f"(from {len(calibs)} suite-start readings)")

    json.dump(out, open(bands_path, "w"), indent=1)
    print(f"wrote {bands_path}: {len(out['entries'])} entries")


if __name__ == "__main__":
    main()
