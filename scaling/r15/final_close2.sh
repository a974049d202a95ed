#!/bin/bash
set -ex
cd /root/repo
R=scaling/r15
sbt -batch test > $R/sbt_test_final2.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_close_final2_r15" > $R/close_verify_final2.log 2>&1
python3 tools/compare.py /root/testdata/sf0.01 target/verify_close_final2_r15 --json CORRECTNESS_local_r15.json > $R/close_compare_final2.log 2>&1
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > $R/bench_final6_sf01.log 2>&1
touch $R/FINAL2_DONE
