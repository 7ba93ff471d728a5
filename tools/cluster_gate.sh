#!/usr/bin/env bash
# Standing multi-JVM oracle gate (r18 VERDICT #4): run the representative
# query subset under local-cluster[2,8,4096] — two REAL executor JVMs,
# 4 GB each — then DuckDB-compare the dumps, so executor-placement
# regressions (per-JVM caches, localCheckpoint durability, driver-
# colocated scratch, witness machinery) can never land silently.
#
# Subset = all 7 lake tiers, all 10 streaming-IVM shapes (plus the two
# fold-dial pipelines, which exercise quiescent-fold chain resume), the
# durable-pagerank dial, and one representative each of LSH dedup, IVF
# serving, MERGE, SCD2, salted agg, and executor-side fixture codecs.
#
# Usage: tools/cluster_gate.sh [sfdir]   (default /root/testdata/sf0.01)
# Success ends with a one-line {"metric":"cluster_gate",...} stamp.
set -euo pipefail

SF="${1:-/root/testdata/sf0.01}"
SUBSET="lake_skipping_scan,lake_zorder_skipping,lake_dfp_join,lake_bloom_dfp_join,lake_bucketed_join,lake_gen_bucketed_join,lake_meta_planned_scan,mv_stream_hourly_revenue,mv_stream_sliding_value,mv_stream_hourly_minmax,mv_stream_join_nation_value,mv_stream_session_counts,mv_stream_kmv_distinct,mv_stream_topk_users,mv_stream_stream_join,mv_stream_attrib_join,mv_stream_attrib_fold,mv_stream_join_ttl,mv_stream_grid_quantiles,graph_pagerank_durable,dedup_lsh_pairs,sim_index_serve_topk,merge_upsert_orders,scd2_order_status,agg_salted_user_value,mm_image_luma_grid"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# same dump-dir keying as tools/check.py (one dir per SF)
OUT="/tmp/graft_verify_$(echo "$SF" | sed 's:^/*::; s:/*$::; s:/:_:g')"

cd "$REPO"
SPARK_HOME="${SPARK_HOME:-/opt/spark}" SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
SPARK_GRAFT_ONLY="$SUBSET" \
  sbt -batch "runMain graft.Verify $SF $OUT"

# shellcheck disable=SC2086
python3 tools/check.py "$SF" --skip-verify ${SUBSET//,/ }

N=$(echo "$SUBSET" | awk -F, '{print NF}')
echo "{\"metric\":\"cluster_gate\",\"master\":\"local-cluster[2,8,4096]\",\"sf\":\"$SF\",\"queries\":$N,\"status\":\"green\"}"
