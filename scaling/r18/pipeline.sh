#!/bin/bash
# Round-18 close pipeline. The r17 close died at its third stage on a
# transient c12 write failure because the script was `set -e` chained —
# stages 3–7 never ran and the round shipped NO evidence (r17 verdict
# wrong #1/#2). This version runs EVERY stage regardless of prior
# failures, records a per-stage exit code in stage_rc.txt, and the
# summary fails loudly at the end iff any stage failed.
#
# Protocol (also in BENCHLOG.md): the headline bench (BENCH_FULL.json)
# runs SEPARATELY on an idle host (loadavg 1-min < 2 AND 15-min < 3 at
# start) — BEFORE this pipeline, not minutes after it crushed the host
# (the r17 driver bench read +40% of pure host contamination).
cd /root/repo
R=scaling/r18
mkdir -p $R
: > $R/stage_rc.txt

run_stage () {
  local name="$1"; shift
  echo "[pipeline] stage $name: $(date -u +%H:%M:%SZ) start" | tee -a $R/stage_rc.txt >/dev/null
  "$@"
  local rc=$?
  echo "$name rc=$rc $(date -u +%H:%M:%SZ)" >> $R/stage_rc.txt
  echo "[pipeline] stage $name: rc=$rc"
}

# 0. scale fixtures (deterministic ScaleGen; regenerate only if absent —
#    target/ was cleaned since r17)
gen_scale () {
  local dst="$1" factor="$2" skew="$3"
  if [ -f "target/scale/$dst/lineitem.parquet/_SUCCESS" ]; then
    echo "[pipeline] target/scale/$dst exists - reused"
  else
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 target/scale/$dst $factor $skew" > $R/scalegen_$dst.log 2>&1
  fi
}
run_stage scalegen_sf1     gen_scale sf1 10
run_stage scalegen_sf10    gen_scale sf10 100
run_stage scalegen_sf1skew gen_scale sf1skew 10 skew

# 1. the correctness gate: full Verify at sf0.01 + strict DuckDB compare
run_stage verify  bash -c 'sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_close_r18" > scaling/r18/close_verify.log 2>&1'
run_stage compare bash -c 'python3 tools/compare.py /root/testdata/sf0.01 target/verify_close_r18 --json CORRECTNESS_local_r18.json > scaling/r18/close_compare.log 2>&1'

# 2. post-AQE plan pins on the FULL executed inventory at both scales
run_stage planaudit_sf1  bash -c 'SPARK_GRAFT_SF_DIR=target/scale/sf1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.PlanAudit" > scaling/r18/planaudit_sf1.txt 2>&1'
run_stage planaudit_sf10 bash -c 'SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.PlanAudit" > scaling/r18/planaudit_sf10.txt 2>&1'
run_stage skewaudit      bash -c 'SPARK_GRAFT_SF_DIR=target/scale/sf1skew SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.SkewAudit" > scaling/r18/skewaudit_sf1skew.txt 2>&1'

# 3. bench sweeps (re-run disabled; medians across runs via scaling.py)
for i in 1 2; do
  run_stage bench_sf01_run$i bash -c "SPARK_GRAFT_RERUN_ABOVE=1e9 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/scaling/r18/bench_sf01_run$i.json sbt -batch 'runMain graft.Bench' > scaling/r18/bench_sf01_run$i.log 2>&1"
  run_stage bench_sf1_run$i  bash -c "SPARK_GRAFT_RERUN_ABOVE=1e9 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=target/scale/sf1 SPARK_GRAFT_BENCH_OUT=/root/repo/scaling/r18/bench_sf1_run$i.json sbt -batch 'runMain graft.Bench' > scaling/r18/bench_sf1_run$i.log 2>&1"
done
run_stage bench_sf10_run1 bash -c 'SPARK_DRIVER_MEM=48g SPARK_GRAFT_RERUN_ABOVE=1e9 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_BENCH_OUT=/root/repo/scaling/r18/bench_sf10_run1.json sbt -batch "runMain graft.Bench" > scaling/r18/bench_sf10_run1.log 2>&1'

run_stage exponents bash -c '
  cat scaling/r18/bench_sf01_run1.json scaling/r18/bench_sf01_run2.json > scaling/r18/sf01.jsonl &&
  cat scaling/r18/bench_sf1_run1.json scaling/r18/bench_sf1_run2.json > scaling/r18/sf1.jsonl &&
  cat scaling/r18/bench_sf10_run1.json > scaling/r18/sf10.jsonl &&
  python3 tools/scaling.py scaling/r18/sf01.jsonl scaling/r18/sf1.jsonl 10 > scaling/r18/exponents_sf01_sf1.txt 2>&1 &&
  python3 tools/scaling.py scaling/r18/sf01.jsonl scaling/r18/sf10.jsonl 100 > scaling/r18/exponents_sf01_sf10.txt 2>&1'

# 4. deep fuzz of the skipping-soundness surface
run_stage prop_deep bash -c 'GRAFT_PROP_MIN=120 sbt -batch "testOnly graft.GraftSparkProps" > scaling/r18/prop_deep.log 2>&1'

# summary: fail loudly iff ANY stage failed; PIPELINE_DONE only on all-green
echo "==== stage exit codes ===="
cat $R/stage_rc.txt
if grep -q "rc=[^0]" $R/stage_rc.txt; then
  echo "[pipeline] FAILED stages:"; grep "rc=[^0]" $R/stage_rc.txt
  exit 1
fi
touch $R/PIPELINE_DONE
echo "[pipeline] all stages green"
