#!/bin/sh
# Pre-commit gate: a commit must never land uncompiled (round 4's
# end-of-round snapshot did, costing the whole round's correctness run).
# Incremental sbt compile is ~2s warm. Install with:
#   ln -sf ../../tools/pre-commit.sh .git/hooks/pre-commit
cd "$(git rev-parse --show-toplevel)" || exit 1
exec sbt -batch compile
