#!/usr/bin/env bash
# Local CI replica (parity with the reference's
# /root/reference/src/CI_test/test_with_act.sh: run the CI jobs on a dev
# box without pushing). Mirrors .github/workflows/ci.yml:
#   1. style gate  — ruff critical rules (skipped with a notice if ruff
#                    is not installed; this image has no ruff)
#   2. test select — changed-file -> test-file mapping
#   3. pytest      — CPU 8-device fake mesh, "not slow"
# Usage: scripts/run_ci_local.sh [--full]   (--full runs the whole suite)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== style gate =="
if command -v ruff >/dev/null 2>&1; then
    ruff check --select E9,F63,F7,F82,F401 vllm_omni_draft_tpu tests
else
    echo "ruff not installed — syntax-checking with py_compile instead"
    python - <<'EOF'
import compileall, sys
ok = compileall.compile_dir("vllm_omni_draft_tpu", quiet=2) \
     and compileall.compile_dir("tests", quiet=2)
sys.exit(0 if ok else 1)
EOF
fi

echo "== test selection =="
if [ "${1:-}" = "--full" ]; then
    tests="tests/"
else
    tests=$(bash .github/scripts/detect_changed_tests.sh | tr '\n' ' ')
fi
echo "selected: $tests"

echo "== pytest =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest $tests -q -m "not slow"
