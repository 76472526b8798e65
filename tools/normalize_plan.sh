#!/usr/bin/env bash
# Normalize a graft.Explain physical-plan dump for cross-scale diffing:
# strip expression ids (#123), plan ids, file paths, sizes/statistics,
# and cardinality hints so only the plan SHAPE remains. AQE's runtime
# join-strategy choice still shows (it legitimately differs with size).
sed -E \
  -e 's/#[0-9]+L?//g' \
  -e 's/plan_id=[0-9]+/plan_id=X/g' \
  -e 's/\[id=[#0-9]+\]/[id=X]/g' \
  -e 's|file:[^],)[:space:]]*|PATH|g' \
  -e 's/Statistics\([^)]*\)/Statistics(X)/g' \
  -e 's/size=[0-9.]+ *[A-Za-z]*B/size=X/g' \
  -e 's/rowCount=[0-9]+/rowCount=X/g' \
  -e 's/Batched: [a-z]+//g' \
  -e 's/[0-9]+\.[0-9]+ *[KMG]i?B/SZ/g' \
  "$@"
