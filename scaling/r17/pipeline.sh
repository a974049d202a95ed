#!/bin/bash
# Round-17 close pipeline: full verify+compare -> plan pins at sf1/sf10
# -> skew audit -> 2-run bench sweeps (sf0.1/sf1) + sf10 -> exponents ->
# deep property fuzz -> headline bench. Mirrors r16's pipeline with the
# r17 inventory (230 queries incl. c41/c42). Scale fixtures under
# target/scale are reused (same deterministic ScaleGen over the same
# sf0.1 input; generator unchanged this round).
set -ex
cd /root/repo
R=scaling/r17
mkdir -p $R

# 1. the correctness gate: full Verify at sf0.01 + strict DuckDB compare
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_close_r17" > $R/close_verify.log 2>&1
python3 tools/compare.py /root/testdata/sf0.01 target/verify_close_r17 --json CORRECTNESS_local_r17.json > $R/close_compare.log 2>&1

# 2. post-AQE plan pins on the FULL executed inventory at both scales
SPARK_GRAFT_SF_DIR=target/scale/sf1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.PlanAudit" > $R/planaudit_sf1.txt 2>&1
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.PlanAudit" > $R/planaudit_sf10.txt 2>&1
SPARK_GRAFT_SF_DIR=target/scale/sf1skew SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.SkewAudit" > $R/skewaudit_sf1skew.txt 2>&1

# 3. bench sweeps (re-run disabled; medians across runs via scaling.py)
for i in 1 2; do
  SPARK_GRAFT_RERUN_ABOVE=1e9 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/root/repo/$R/bench_sf01_run$i.json sbt -batch "runMain graft.Bench" > $R/bench_sf01_run$i.log 2>&1
  SPARK_GRAFT_RERUN_ABOVE=1e9 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=target/scale/sf1 SPARK_GRAFT_BENCH_OUT=/root/repo/$R/bench_sf1_run$i.json sbt -batch "runMain graft.Bench" > $R/bench_sf1_run$i.log 2>&1
done
SPARK_DRIVER_MEM=48g SPARK_GRAFT_RERUN_ABOVE=1e9 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=target/scale/sf10 SPARK_GRAFT_BENCH_OUT=/root/repo/$R/bench_sf10_run1.json sbt -batch "runMain graft.Bench" > $R/bench_sf10_run1.log 2>&1

cat $R/bench_sf01_run1.json $R/bench_sf01_run2.json > $R/sf01.jsonl
cat $R/bench_sf1_run1.json $R/bench_sf1_run2.json > $R/sf1.jsonl
cat $R/bench_sf10_run1.json > $R/sf10.jsonl
python3 tools/scaling.py $R/sf01.jsonl $R/sf1.jsonl 10 > $R/exponents_sf01_sf1.txt 2>&1
python3 tools/scaling.py $R/sf01.jsonl $R/sf10.jsonl 100 > $R/exponents_sf01_sf10.txt 2>&1

# 4. deep fuzz of the skipping-soundness surface
GRAFT_PROP_MIN=120 sbt -batch "testOnly graft.GraftSparkProps" > $R/prop_deep.log 2>&1

touch $R/PIPELINE_DONE
# NOTE: the headline bench (BENCH_FULL.json) runs SEPARATELY on an idle
# host per the close protocol (loadavg < 2 before start) — the r16
# verdict's one weak flag was a headline bench started at loadavg 5.7.
