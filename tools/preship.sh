#!/usr/bin/env bash
# Pre-snapshot gate: the round-8 verdict proved the enforcement tests fire
# and the round-close process skips them (3 red tests shipped in the final
# two commits). This script IS the round-close step: run it before the
# end-of-round snapshot commit; a non-zero exit means the tree must not
# ship. It runs the full ScalaTest suite (which includes ReadmeSpec's
# registry/BENCH-block truthfulness gates and PlanSpec's plan pins).
set -euo pipefail
cd "$(dirname "$0")/.."
echo "[preship] sbt test (full suite — must be green to ship)"
sbt -batch test
echo "[preship] GREEN — safe to snapshot"
