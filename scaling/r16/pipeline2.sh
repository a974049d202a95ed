#!/bin/bash
# Round-16 close pipeline, part 2: the first run's compare flagged the
# (pre-fix) c16 oracle missing the new retain_expired counter and set -e
# stopped the script there. This resumes on the FIXED tree: combined
# full-suite + deep-fuzz test run, fresh verify+compare (rewrites
# CORRECTNESS_local_r16.json), then plan pins, skew audit, bench sweeps,
# exponents, and the headline bench.
set -ex
cd /root/repo
R=scaling/r16

# 0. full suite at deep-fuzz depth (GRAFT_PROP_MIN raises the property
# case count; the rest of the suite is unaffected) — one run serves as
# both the post-change full `sbt test` and the close fuzz
GRAFT_PROP_MIN=120 sbt -batch test > $R/sbt_test_deep.log 2>&1

# 1. fresh correctness gate on the fixed tree
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_close_r16b" > $R/close_verify2.log 2>&1
python3 tools/compare.py /root/testdata/sf0.01 target/verify_close_r16b --json CORRECTNESS_local_r16.json > $R/close_compare2.log 2>&1

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

# 4. headline bench (driver schema, adaptive re-runs, BENCH_FULL.json)
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > $R/bench_final_sf01.log 2>&1

touch $R/PIPELINE_DONE
