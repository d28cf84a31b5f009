#!/bin/bash
# Alternating same-window paired A/B of two trees, headline-only legs of
# the ROUND-START bench.py (identical file in both trees). Usage:
#   ab_pairs.sh <treeA> <treeB> <outdir> <tagA> <tagB> <npairs>
# Each leg writes <outdir>/ab_<tag>_pair<i>.json (the bench's two JSON
# lines). A cal-kernel sample brackets every leg so window quality is
# recorded even if a contention burst lands mid-run.
set -u
TREEA=$1; TREEB=$2; OUT=$(readlink -f "$3"); TAGA=$4; TAGB=$5; N=$6
mkdir -p "$OUT"
cal() { python - <<'EOF'
import numpy as np, time
rng = np.random.default_rng(0)
a = rng.integers(0, 1 << 40, 3_000_000)
np.unique(np.sort(a))
t0 = time.time(); np.unique(np.sort(a)); print(round(time.time()-t0,3))
EOF
}
leg() { # $1 tree, $2 outfile
  local c0 c1
  c0=$(cal)
  (cd "$1" && SPARK_GRAFT_BENCH_SCALING=0 SPARK_GRAFT_BENCH_LATENCY150K=0 \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     python bench.py 2>"$2.err" | grep -E '^\{' > "$2")
  c1=$(cal)
  echo "{\"cal_before\": $c0, \"cal_after\": $c1}" >> "$2"
  echo "leg $2 cal $c0 -> $c1"
}
for i in $(seq 1 "$N"); do
  leg "$TREEA" "$OUT/ab_${TAGA}_pair${i}.json"
  leg "$TREEB" "$OUT/ab_${TAGB}_pair${i}.json"
done
