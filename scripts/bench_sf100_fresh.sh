#!/usr/bin/env bash
# sf100 bench, fresh-JVM-per-query methodology.
#
# Why: the round-9 sf100 registry artifact (BENCH_sf100_r9.json, runs=1, one
# 36-query JVM) carried a measured 2-4x JVM-accumulation tax on the q-family
# (q08 144.2 s in-registry vs 35.4 s solo) — allocator/GC state accumulated
# across queries, not plan cost. Running every query in its OWN JVM with
# runs=2 (min recorded) makes each number fresh-JVM by construction: there is
# no prior-query state to accumulate. The per-query records are merged into
# one artifact by scripts/merge_bench.py.
#
# st20 runs FIRST: its solo fresh-JVM datapoint is the round-10 item that
# closes the "memory wall by elimination" argument with a measurement, so it
# is secured before the long tail.
#
# Usage: scripts/bench_sf100_fresh.sh [outdir]   (default /tmp/sf100_r10)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/sf100_r10}"
mkdir -p "$OUT"

QUERIES=(
  st20_stream_semdedup_gate
  q08_group_median q09_quantile_cap q24_clean_pipeline q26_taxi_e2e
  q32_accounting q33_group_winsorize q34_mad_filter
  q36_clean_pipeline_approx q37_group_winsorize_approx q38_mad_filter_approx
  st08_stream_stream_join st11_stream_neardup_gate st12_stream_vector_ingest
  st17_stream_sketch_ingest
  x09_token_count x110_ssjoin_prefix x111_gap_fill x113_edit1_fuzzy_join
  x115_rolling_anomaly x116_skyline x117_grid_radius_join x118_funnel
  x120_webdataset_shards x121_triangle_census x18_ann_ivf x20_dedup_groups
  x33_contamination x41_pq_ann x56_ann_ivf_append x58_bpe_big_vocab
  x61_bucket_compact x62_shuffle_shards x66_exact_substr x74_ccnet_buckets
  x98_pagerank_incremental
)

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# Every bench JVM gets a DEDICATED java.io.tmpdir, wiped after each query:
# staged fixtures + per-run mutable tables are per-JVM garbage once the
# JVM exits, and 36 JVMs' worth of leaked /tmp/graft_* dirs filled the
# disk mid-run on the first attempt (q24 died on ENOSPC). A dedicated
# root also keeps the cleanup from racing any concurrently-running
# sbt/Verify JVM that stages its own fixtures under /tmp.
BENCHTMP=/tmp/graftbench_tmpdir
mkdir -p "$BENCHTMP"

for q in "${QUERIES[@]}"; do
  if [ -s "$OUT/$q.json" ]; then echo "== $q: already recorded, skip"; continue; fi
  echo "== $q  ($(date -u +%H:%M:%S))"
  SPARK_GRAFT_SF_DIR=benchdata/sf100 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=2 \
  SPARK_GRAFT_BENCH_ONLY="$q" \
  SPARK_GRAFT_BENCH_OUT="$OUT/$q.json" \
  SPARK_GRAFT_WARMUP_DIR=/root/testdata/sf0.01 \
  java -Xmx96g $ADD_OPENS \
    -Djava.io.tmpdir="$BENCHTMP" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench > "$OUT/$q.log" 2>&1
  rc=$?
  [ $rc -ne 0 ] && echo "   FAILED rc=$rc (see $OUT/$q.log)"
  rm -rf "$BENCHTMP"/* 2>/dev/null
done
echo "all done $(date -u +%H:%M:%S)"
