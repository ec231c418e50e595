#!/usr/bin/env python3
"""Build BANDS.json (per-entry performance bands) from full-suite bench
runs plus isolated single-entry probes.

Usage: python3 tools/build_bands.py <out> <probes.log> <run.json> [<run.json> ...]

Band policy (suite-context basis — probe CPU is NOT comparable to suite
CPU because an isolated JVM charges all JIT to its one entry; probe WALL
is comparable since JIT runs on spare threads):

- Readings qualify for band-building at load_warm < BAND_LOAD_CUT = 12
  — the same cutoff Bench's case-3 rule treats as contamination
  (1.5 * load_max). A stricter cutoff was tried and rejected: the
  streaming tail runs at self-inflicted load 8-13 in EVERY clean run,
  so filtering at 8 left those entries one atypical low-load reading
  and a band their normal regime overruns (st6/w2 false case-2 flags,
  round-9 run 5).
- cpu_hi  = max qualifying suite cpu_warm, padded (1.30 with >=2
  readings, 1.45 with 1) plus an absolute 0.4 s slack: every reading
  carries ~0.1-0.3 s of granularity noise (process-CPU sampling, GC
  jitter) independent of entry size, so sub-second entries otherwise
  false-flag on noise a multiplicative pad cannot absorb (t5/t9/t10
  case-4 churn, round-9 run 8).
- wall_hi = max over qualifying SUITE warms only, padded the same way
  plus 0.15 s absolute slack. Probe walls are NOT pooled into the wall
  band (r18 policy fix, VERDICT r17 #3): the old rationale ("wall is
  JIT-insensitive so probe walls pool") breaks when the probe pays an
  index build / JVM+Spark startup the suite amortizes — pooled probe
  walls inflated pl_r3's hi to 21.5 s against suite readings of
  2.6-6.0 s, a ceiling that would let a 3x real regression ride
  in_band. Probe walls/CPUs stay recorded as the separate probe_wall /
  probe_cpu fields; the probe-basis FALLBACK (below) still applies
  when an entry has no suite reading at all.
- When an entry has NO qualifying reading, fall back to min over all
  readings * 1.35 — the least-contended reading observed, padded.
- lo bounds are informational (min * 0.6): verdicts only compare hi.

Run files may carry per-entry exclusions via the EXCLUDE map below
(adjudicated-contaminated readings and readings that predate a code
change must not set the band for the new code).
"""
import json, re, sys

LOAD_MAX = 8.0        # exported to BANDS.json: case-3 anchor (contaminated > 1.5x)
BAND_LOAD_CUT = 12.0  # reading qualifies for band-building below this

# (run-file substring, entry) readings to ignore:
#  - bench_r8 (the r8-committed BENCH.json): pl_d3/pl_s5 readings
#    adjudicated as measurement artifacts (VERDICT r8 "what's wrong" 1-2).
#  - r9 runs 1-2 predate the final round-9 cap plumbing (run1: no caps;
#    run2: eager over-cap count, later made lazy; pl_p1/pl_p2 gained the
#    guard only after run2) — every cap-family entry bands from run3+.
CAP_FAMILY = ["pl_d2_minhash_pairs", "pl_d3_dup_clusters",
              "pl_d8_simhash_pairs", "pl_s5_split_leakage_safe",
              "pl_d11_capped_neardup", "pl_p1_corpus_filter",
              "pl_p2_training_chunks"]
EXCLUDE = (
    {("bench_r8", "pl_d3_dup_clusters"),
     ("bench_r8", "pl_s5_split_leakage_safe")} |
    {(run, e) for run in ("bench1", "bench2") for e in CAP_FAMILY}
)


def main():
    out_path, probes_path, runs = sys.argv[1], sys.argv[2], sys.argv[3:]
    suite = {}  # entry -> [(warm, cpu, load)]
    calibs = []  # calibration spin readings (suite-start, uncontended-ish)
    for rf in runs:
        j = json.load(open(rf))
        assert str(j["sf"]).endswith("0.1"), f"{rf} is not a sf0.1 run"
        if j.get("calib", {}).get("start"):
            calibs.append(j["calib"]["start"])
        for k, d in j["detail"].items():
            if any(tag in rf and e == k for tag, e in EXCLUDE):
                continue
            if d["warm"] < 0:
                continue
            suite.setdefault(k, []).append(
                (d["warm"], d["cpu_warm"], d["load_warm"]))
    probes = {}  # entry -> [(warm, cpu)]
    pat = re.compile(r"\[bench\] (\S+) cold=\S+ warm=([\d.]+) cpu_cold=\S+ "
                     r"cpu_warm=([\d.]+)")
    for line in open(probes_path):
        m = pat.search(line)
        if m:
            probes.setdefault(m.group(1), []).append(
                (float(m.group(2)), float(m.group(3))))

    entries = {}
    for k, rs in sorted(suite.items()):
        low = [r for r in rs if r[2] < BAND_LOAD_CUT]
        pw = [w for w, _ in probes.get(k, [])]
        if low:
            cpus = [c for _, c, _ in low]
            walls = [w for w, _, _ in low]
            pad = 1.30 if len(low) >= 2 else 1.45
            cpu_hi = max(cpus) * pad + 0.4
            wall_hi = max(walls) * (1.30 if len(walls) >= 2 else 1.45) + 0.15
            cpu_lo, wall_lo = min(cpus) * 0.6, min(walls) * 0.6
            basis = f"suite({len(low)} @load<{BAND_LOAD_CUT:g})" + (f"+probe({len(pw)}: recorded, not pooled)" if pw else "")
        else:
            cpus = [c for _, c, _ in rs]
            walls = [w for w, _, _ in rs] + pw
            cpu_hi = min(cpus) * 1.35 + 0.4
            wall_hi = min(walls) * 1.35 + 0.15
            cpu_lo, wall_lo = min(cpus) * 0.6, min(walls) * 0.6
            basis = f"no qualifying reading; min-of-{len(rs)} * 1.35"
        e = {"wall": [round(wall_lo, 2), round(wall_hi, 2)],
             "cpu": [round(cpu_lo, 2), round(cpu_hi, 2)],
             "basis": basis}
        if k in probes:
            e["probe_wall"] = [round(min(pw), 2), round(max(pw), 2)]
            pc = [c for _, c in probes[k]]
            e["probe_cpu"] = [round(min(pc), 2), round(max(pc), 2)]
        entries[k] = e

    out = {
        "sf": "sf0.1",
        "load_max": LOAD_MAX,
        # nominal for Bench's environment-calibration spin: min over the
        # contributing runs' suite-start readings (min = cleanest
        # environment observed; the case-5 rule flags >= 1.35x this)
        **({"calib_sec": round(min(calibs), 3)} if calibs else {}),
        "policy": ("suite-context basis; hi = max(low-load SUITE readings) * pad; "
                   "probe walls and CPUs recorded separately, NOT pooled "
                   "(a probe pays index builds / JVM startup the suite "
                   "amortizes, so pooled probe walls inflate ceilings — r18 "
                   "fix; probes only set the band as a fallback when an "
                   "entry has no suite reading); "
                   "verdicts compare warm/cpu_warm against the hi bounds only"),
        "entries": entries,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: {len(entries)} entries")


if __name__ == "__main__":
    main()
