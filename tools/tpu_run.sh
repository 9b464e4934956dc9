#!/bin/bash
# Run a python command on the axon TPU with claim-retry.
# The relay releases a dead process's TPU claim with some latency; a process
# that registers during that window fails with "Backend 'axon' is not in the
# list of known backends".  Retry a few times with backoff.
# NOTE: never override PYTHONPATH wholesale - /root/.axon_site must stay on it.
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/.axon_site"
OUT=$(mktemp)
for i in $(seq 1 6); do
  timeout "${TPU_RUN_TIMEOUT:-560}" python "$@" >"$OUT" 2>&1
  rc=$?
  if ! grep -q "Unable to initialize backend 'axon'" "$OUT"; then
    cat "$OUT"; rm -f "$OUT"; exit $rc
  fi
  echo "[tpu_run] axon claim not ready (attempt $i), retrying in 20s..." >&2
  sleep 20
done
cat "$OUT"; rm -f "$OUT"; exit 1
