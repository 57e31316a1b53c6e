#!/usr/bin/env bash
# Manual 3-node local cluster for testing (reference: run_cluster.sh).
# HTTP ports 8081/8084/8085, RPC ports 9898/9899/9900.
set -e
trap 'kill 0' EXIT
for s in A B C; do
  SEMADB_CONFIG=config/server$s.yaml python -m semadb_tpu.main &
done
wait
