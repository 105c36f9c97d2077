#!/bin/bash
# Grep-derived counts for SURVEY.md round sections — never recall these
# from memory (two rounds of count miscounts motivated this script; the
# check_citations.sh discipline applied to arithmetic).
#
# Usage: scripts/derive_counts.sh [CORRECTNESS_rN.json]
# Prints the numbers a round write-up cites. With a CORRECTNESS file it
# also cross-checks declared-key count vs the driver's gate rows.
set -e
cd "$(dirname "$0")/.."

declared=$(grep -rhoE 'Q\("([a-z0-9_]+)"' src/main/scala/graft --include='*.scala' \
  | sort -u | wc -l)
specs=$(grep -rhoE '^\s*test\(' src/test/scala/graft | wc -l)
# suite CLASSES, not files — one file may declare several suites
suites=$(grep -rhoE '^class \w+Spec\b' src/test/scala/graft/*.scala | wc -l)
suite_files=$(ls src/test/scala/graft/*Spec.scala | wc -l)
advice=$(grep -cE '^- \*\*(low|medium|high)\*\*' ADVICE.md 2>/dev/null || echo 0)

echo "distinct declared Q(\"…\") keys in main sources: $declared"
echo "ScalaTest test(...) cases: $specs across $suites suites ($suite_files spec files)"
echo "ADVICE.md findings: $advice"

if [ -n "$1" ] && [ -f "$1" ]; then
  rows=$(python3 -c "import json,sys; d=json.load(open('$1')); print(len(d))")
  green=$(python3 -c "
import json
d = json.load(open('$1'))
print(sum(1 for v in d.values()
          if v.get('rows_match') and v.get('schema_match')
          and v.get('hash_match', True)))")
  echo "$1: $rows gate rows, $green green"
fi
# declared-oracle count derived FRESH from the sources (an old
# /tmp/verify_out dump mis-reported here once — never cite a stale
# artifact for a current count)
oracles=$(grep -rhoE 'Q\("([a-z0-9_]+)"' src/main/scala/graft --include='*.scala' \
  | sort -u | wc -l)
echo "declared query keys (fresh source grep, = oracle_sql.json rows at next dump): $oracles"
