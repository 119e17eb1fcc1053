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

echo "== [1/4] sbt test =="
sbt -batch test 2>&1 | tail -5 | tee /tmp/close_round_test.log
grep -q "All tests passed" /tmp/close_round_test.log || {
  echo "FAIL: sbt test is not green — fix before closing the round"; exit 1; }

echo "== [2/4] SURVEY §2 vs registry diff =="
CP="target/scala-2.13/classes:$(ls "${SPARK_JARS_DIR:-/opt/spark/jars}"/*.jar | tr '\n' ':')"
java -cp "$CP" graft.Verify --list | sort -u > /tmp/close_registry.txt
# Parse the QUERY column as the second-to-last |-cell (r11 verdict item
# 1a: `awk -F'|' $4` loses every row whose DESCRIPTION contains a `|`,
# e.g. #148's "|∩|/min" — 23 of 327 names failed to extract). Also
# expand the `+ _lsh` twin shorthand (`` `q` + `_lsh` `` means q AND
# q_lsh) instead of discarding the `_lsh` token.
python3 - <<'PYEOF' > /tmp/close_survey.txt
import re
rows, in_s2 = [], False
for line in open("SURVEY.md"):
    if line.startswith("## §2"): in_s2 = True; continue
    if in_s2 and line.startswith("## §3"): break
    if in_s2 and re.match(r"^\| [0-9]", line):
        rows.append(line.rstrip().rstrip("|"))
names = set()
for row in rows:
    qcol = row.rsplit("|", 2)[-2]   # second-to-last cell = query column
    toks = re.findall(r"`([a-z0-9_]+)`", qcol)
    prev = None
    for t in toks:
        if t == "_lsh":
            if prev: names.add(prev + "_lsh")
        else:
            names.add(t); prev = t
print("\n".join(sorted(names)))
PYEOF
MISSING_SURVEY=$(comm -23 /tmp/close_registry.txt /tmp/close_survey.txt)
MISSING_REG=$(comm -13 /tmp/close_registry.txt /tmp/close_survey.txt)
if [ -n "$MISSING_SURVEY" ]; then
  echo "FAIL: registry queries with no SURVEY §2 row:"; echo "$MISSING_SURVEY"; exit 1
fi
if [ -n "$MISSING_REG" ]; then
  echo "FAIL: SURVEY §2 names not in the registry:"; echo "$MISSING_REG"; exit 1
fi
echo "OK: $(wc -l < /tmp/close_registry.txt) registry queries all have SURVEY §2 rows"

echo "== [3/4] correctness gate at $SF_DIR =="
tools/run_gate.sh "$SF_DIR" /tmp/verify_close 4 "$JSON_OUT"
# run_gate.sh emits {"pass": n, "fail": n, "rows_only": n,
# "queries": {name: {"status": "pass"|"rows-only"|"fail", ...}}} —
# read THAT schema (r11 verdict item 1b: the old checker iterated the
# top-level int counters and crashed, and its per-query keys matched
# the driver's rows_match shape, not run_gate's).
python3 - "$JSON_OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
qs = d["queries"]
fails = sorted(q for q, v in qs.items()
               if v.get("status") not in ("pass", "rows-only"))
print(f"gate: {len(qs)} queries, {d['pass']} hash-pass, "
      f"{d['rows_only']} rows-only, {d['fail']} fail")
if fails or d["fail"]:
    print("FAIL:", fails); sys.exit(1)
EOF
echo "== [4/4] bench full-map coverage =="
# r12 verdict item 5: the driver's BENCH_r{N}.json is a stdout tail
# that holds ~25% of the per-query map; round-over-round diffs must
# come from the full-map FILE Bench always writes. Assert the latest
# full map exists and covers every timed query (registry minus the
# Bench skip set) so a truncated artifact can never be the round's
# only bench record. Non-fatal when no bench ran this round yet —
# fatal when the file exists but is visibly truncated.
# The skip set comes from Bench itself (--list-skip), not a source
# scrape (r13 ADVICE: the regex stopped at the first comment line
# ending in ')' and saw 8 of 34 names, failing the gate spuriously).
java -cp "$CP" graft.Bench --list-skip | sort -u > /tmp/close_bench_skip.txt
python3 - <<'PYEOF'
import json, os, sys
reg = set(open("/tmp/close_registry.txt").read().split())
skip = set(open("/tmp/close_bench_skip.txt").read().split())
timed = reg - skip
path = "BENCH_full_latest.json"
if not os.path.exists(path):
    print(f"note: {path} absent (no bench run in this cwd) — "
          f"expected {len(timed)} timed queries when one runs")
    sys.exit(0)
qs = json.load(open(path)).get("queries", {})
missing = sorted(timed - set(qs))
if len(missing) > max(3, len(timed) // 20):
    print(f"FAIL: {path} covers {len(qs)} queries but the registry "
          f"times {len(timed)}; missing e.g. {missing[:10]}")
    sys.exit(1)
print(f"OK: {path} covers {len(qs)}/{len(timed)} timed queries"
      + (f" (missing: {missing})" if missing else ""))
PYEOF

echo "== round is closeable =="
