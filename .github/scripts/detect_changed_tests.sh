#!/usr/bin/env bash
# Map changed source files to their test files; fall back to the full
# suite when the mapping is incomplete (parity with the reference's
# .github/scripts/detect_changed_tests.sh behavior, SURVEY.md §4).
set -euo pipefail

BASE="${GITHUB_BASE_REF:-}"
if [ -n "$BASE" ]; then
  RANGE="origin/${BASE}...HEAD"
else
  RANGE="HEAD~1..HEAD"
fi

changed=$(git diff --name-only "$RANGE" 2>/dev/null || true)
if [ -z "$changed" ]; then
  echo "tests/"
  exit 0
fi

declare -A selected
fallback=0
while IFS= read -r f; do
  case "$f" in
    tests/*.py) selected["$f"]=1 ;;
    vllm_omni_draft_tpu/*.py)
      base=$(basename "$f" .py)
      hits=$(ls tests/test_*"${base}"*.py 2>/dev/null || true)
      if [ -n "$hits" ]; then
        for h in $hits; do selected["$h"]=1; done
      else
        fallback=1
      fi
      ;;
    csrc/*|bench.py|__graft_entry__.py) fallback=1 ;;
    *.md|.github/*) ;;  # docs/ci only: no tests needed
    *) fallback=1 ;;
  esac
done <<< "$changed"

if [ "$fallback" = 1 ] || [ "${#selected[@]}" = 0 ]; then
  echo "tests/"
else
  printf '%s\n' "${!selected[@]}"
fi
