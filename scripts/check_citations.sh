#!/bin/bash
# Review-pass gate: every reference file cited in Scaladoc must exist in
# /root/reference (three rounds of `qdrant_db.py`-style stale-citation
# nits; this makes the fourth impossible to commit quietly).
# Usage: scripts/check_citations.sh   (exits nonzero on a stale citation)
set -u
cd "$(dirname "$0")/.."
fail=0
for f in $(grep -rhoE '[A-Za-z0-9_./]+\.(py|txt|xml|md)\b' src/main/scala \
             --include='*.scala' | sed 's#.*/##' | sort -u); do
  # repo-local names (referenced docs like SURVEY.md) are not reference cites
  case "$f" in
    SURVEY.md|README.md|BASELINE.md|PAPERS.md|SNIPPETS.md|TESTDATA.md)
      # README.md is ambiguous (reference has one too) — accept
      continue;;
    FIXTURES.md|compare_oracle.py)
      # repo-local artifacts (test fixture doc, oracle compare script)
      continue;;
  esac
  if ! find /root/reference -name "$f" -print -quit 2>/dev/null | grep -q .; then
    echo "STALE CITATION: '$f' cited in src/main but not in /root/reference"
    grep -rn "$f" src/main/scala --include='*.scala' | head -3
    fail=1
  fi
done
exit $fail
