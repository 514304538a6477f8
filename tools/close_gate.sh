#!/usr/bin/env bash
# Round-closing gate: proves the oracle pairing is scale-stable and the
# bench artifact is self-contained, every round (VERDICT r11 item 6/8).
#
#   1. full Verify dump + DuckDB selfcheck at sf0.01  (the driver's gate)
#   2. full Verify dump + DuckDB selfcheck at sf0.1   (10x the gate)
#   3. Bench at sf0.1 -> bench_out.json (committed, parseable)
#
# Usage: tools/close_gate.sh   (from the repo root; ~15 min)
# Exit 0 only if every query passes at BOTH scales and the bench JSON
# parses. Record the summary line it prints in BASELINE.md.
set -u
cd "$(dirname "$0")/.."
fail=0

for sf in 0.01 0.1; do
  out=/tmp/graft-gate-sf$sf
  rm -rf "$out"
  echo "== gate: Verify @ sf$sf =="
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" \
    > /tmp/graft-gate-verify-$sf.log 2>&1 \
    || { echo "VERIFY FAILED at sf$sf (see /tmp/graft-gate-verify-$sf.log)"; fail=1; }
  python3 tools/selfcheck.py /root/testdata/sf$sf "$out" \
    | tee /tmp/graft-gate-check-$sf.log | tail -1
  grep -q " 0 fail ==" /tmp/graft-gate-check-$sf.log || fail=1
done

echo "== gate: Bench @ sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -o '{"metric".*}' | tail -1 > bench_out.json
python3 - <<'EOF' || fail=1
import json
d = json.load(open("bench_out.json"))
bad = [q for q, t in d["queries"].items() if t < 0]
assert not bad, f"bench -1 timings: {bad}"
print(f"bench_out.json OK: {len(d['queries'])} queries, "
      f"total {d['value']:.1f} {d['unit']}")
EOF

if [ "$fail" -eq 0 ]; then
  echo "CLOSE-GATE PASS: full oracle board green at sf0.01 AND sf0.1; bench artifact parseable"
else
  echo "CLOSE-GATE FAIL — see /tmp/graft-gate-*.log"
fi

# Artifact hygiene (VERDICT r12 item 5): the recorded gate must match
# HEAD. bench_out.json was just (re)written by THIS run and is expected
# to be committed immediately after — remind, don't fail, on it. Any
# OTHER dirty round artifact (a LEAKCHECK bump, a BASELINE edit left
# over from before the run) means the committed gate and the tree
# disagree — fail until they are committed and the gate is re-run.
if [ "$fail" -eq 0 ]; then
  dirty=$(git status --porcelain -- LEAKCHECK.json BASELINE.md)
  if [ -n "$dirty" ]; then
    echo "CLOSE-GATE DIRTY: stale round artifacts differ from HEAD — commit"
    echo "them and re-run the gate:"
    echo "$dirty"
    fail=1
  elif [ -n "$(git status --porcelain -- bench_out.json)" ]; then
    echo "CLOSE-GATE NOTE: commit the fresh bench_out.json now (the gate"
    echo "line in BASELINE.md should cite it)"
  fi
fi
exit $fail
