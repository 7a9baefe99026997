#!/bin/bash
# CI gate: compile, unit/e2e suites, and the scaladoc build (a malformed
# doc comment or a broken [[link]] fails `sbt doc`, so the API docs stay
# publishable). The correctness drive (Verify + DuckDB oracle) is the
# driver's job; run it manually per README when touching query semantics.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile Test/compile
sbt -batch test
sbt -batch doc
echo "CI OK"
