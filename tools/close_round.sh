#!/usr/bin/env bash
# The mechanical round-close ritual (r10 verdict item 1: the final
# commit of round 10 skipped the suite AND the SURVEY row — this script
# makes both unskippable):
#
#   tools/close_round.sh [sfDir] [jsonOut]
#
# 1. full `sbt test` — the hard bar; any failure aborts the close
# 2. SURVEY §2 vs registry diff — every SparkEntry.queries name must
#    appear backticked in a §2 row, and every §2 backticked name must
#    exist in the registry
# 3. the sharded correctness gate (tools/run_gate.sh) at the gate SF
#
# Exit 0 = safe to snapshot; any other exit = the round is NOT closeable.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
JSON_OUT="${2:-/tmp/correctness_close.json}"

echo "== [1/3] sbt test =="
sbt -batch test 2>&1 | tail -5 | tee /tmp/close_round_test.log
grep -q "All tests passed" /tmp/close_round_test.log || {
  echo "FAIL: sbt test is not green — fix before closing the round"; exit 1; }

echo "== [2/3] SURVEY §2 vs registry diff =="
CP="target/scala-2.13/classes:$(ls "${SPARK_JARS_DIR:-/opt/spark/jars}"/*.jar | tr '\n' ':')"
java -cp "$CP" graft.Verify --list | sort -u > /tmp/close_registry.txt
awk '/^## §2/,/^## §3/' SURVEY.md | grep "^| [0-9]" | awk -F'|' '{print $4}' \
  | grep -o '`[a-z0-9_]*`' | tr -d '`' | grep -v '^_lsh$' | sort -u > /tmp/close_survey.txt
MISSING_SURVEY=$(comm -23 /tmp/close_registry.txt /tmp/close_survey.txt)
MISSING_REG=$(comm -13 /tmp/close_registry.txt /tmp/close_survey.txt)
if [ -n "$MISSING_SURVEY" ]; then
  echo "FAIL: registry queries with no SURVEY §2 row:"; echo "$MISSING_SURVEY"; exit 1
fi
if [ -n "$MISSING_REG" ]; then
  echo "FAIL: SURVEY §2 names not in the registry:"; echo "$MISSING_REG"; exit 1
fi
echo "OK: $(wc -l < /tmp/close_registry.txt) registry queries all have SURVEY §2 rows"

echo "== [3/3] correctness gate at $SF_DIR =="
tools/run_gate.sh "$SF_DIR" /tmp/verify_close 4 "$JSON_OUT"
python3 - "$JSON_OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
bad = [q for q, v in d.items()
       if not (v.get("hash_match") or (v.get("rows_match") and v.get("err") is None
               and v.get("hash_match") is None))]
fails = [q for q, v in d.items() if not v.get("rows_match")]
print(f"gate: {len(d)} queries, {len(fails)} row-mismatches, "
      f"{sum(1 for v in d.values() if v.get('hash_match'))} hash-pass")
if fails:
    print("FAIL:", fails); sys.exit(1)
EOF
echo "== round is closeable =="
