#!/bin/bash
# Clean-calibration bench campaign (VERDICT r17 #1): poll the host with
# graft.CalibProbe (bare-JVM xorshift spin, ~1 s) every few minutes and
# fire the full sf0.1 suite ONLY when the spin reads at/under the pin
# gate (1.1 x BANDS.json calib_sec) — instead of r17's six manual
# full-suite attempts that all landed on contended starts. After the
# first CLEAN-gated suite, run the isolated entry probes in the same
# window; stop after 2 clean suites (or the deadline).
#
# Usage: tools/bench_campaign.sh <clone_dir> <out_dir> <max_seconds>
# Discipline (memory: bench-campaign-discipline): ONE tmux mechanism,
# run from a fresh clone pinned at HEAD, no sbt compile in /root/repo
# while live; graft.Bench writes /root/repo/BENCH.json even from the
# clone -> each suite result is copied to <out_dir>/run_N.json.
set -u
CLONE=$1; OUT=$2; DEADLINE=${3:-12600}
NOMINAL=$(python3 -c "import json;print(json.load(open('/root/repo/BANDS.json'))['calib_sec'])")
GATE=$(python3 -c "print(round(1.1*$NOMINAL, 3))")
CP="$CLONE/target/scala-2.13/classes:/opt/spark/jars/*"
PROBE_ENTRIES="ms_j2_bda_remap st13_stream_hll st15_stream_ann pl_p6_canonical_pick st18_stream_ppr_delta pl_r3_hybrid_rrf_hier st17_stream_ppr pl_g2_ppr_decontam pl_g1_pagerank pl_p5_data_card_tokens"
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$OUT/campaign.log"; }
calib() { java -XX:+UseParallelGC -cp "$CP" graft.CalibProbe 32 2>/dev/null | awk '/calib/{print $2}'; }
under_gate() { python3 -c "import sys; sys.exit(0 if float('$1') <= $2 else 1)"; }

clean=0; n=0; probed=0
log "campaign start: nominal=$NOMINAL gate=$GATE deadline=${DEADLINE}s"
while [ "$clean" -lt 2 ] && [ "$SECONDS" -lt "$DEADLINE" ]; do
  c=$(calib)
  log "calib $c"
  if under_gate "$c" "$GATE"; then
    n=$((n+1))
    log "clean window -> suite run $n"
    (cd "$CLONE" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" > "$OUT/suite_$n.log" 2>&1)
    cp /root/repo/BENCH.json "$OUT/run_$n.json"
    gate=$(python3 -c "import json;print(json.load(open('$OUT/run_$n.json'))['calib']['gate'])")
    start=$(python3 -c "import json;print(round(json.load(open('$OUT/run_$n.json'))['calib']['start'],3))")
    log "suite $n done: gate=$gate start=$start"
    if [ "$gate" = clean ]; then
      clean=$((clean+1))
      if [ "$probed" -eq 0 ]; then
        probed=1
        for e in $PROBE_ENTRIES; do
          c2=$(calib)
          log "probe $e (calib $c2)"
          (cd "$CLONE" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
            sbt -batch "runMain graft.Bench $e" 2>&1 | grep -E '^\[bench\]|^\[info\] \[bench\]' \
            >> "$OUT/probes.log")
        done
        log "probes done"
      fi
    fi
  else
    sleep 150
  fi
done
log "campaign finished: $clean clean suites of $n fired, probed=$probed, elapsed=${SECONDS}s"
