#!/bin/bash
# One-shot TPU revalidation after a tunnel outage (run from repo root):
#   bash tools/tpu_revalidate.sh
# Order matters: probe (A/B relayout flags) -> kernel gates -> headline.
# Each step bounded; outputs under /tmp/reval_*.log. Never run while a
# CPU pytest occupies the core (single-core machine, see CLAUDE.md).
set -u
cd "$(dirname "$0")/.."

# NOTE: '$?' after 'cmd | tee' is tee's status — use PIPESTATUS[0] for the
# actual step result or a timeout/crash reads as success.
echo "== 1/3 relayout-flag probe (A/B, ~10-20 min incl. compiles) =="
timeout 1800 python tools/probe_unaligned_luma.py 2>&1 | tee /tmp/reval_probe.log
echo "probe exit: ${PIPESTATUS[0]}"

echo "== 2/3 per-kernel gates =="
timeout 1200 python bench_kernels.py 2>&1 | tee /tmp/reval_kernels.log
echo "kernels exit: ${PIPESTATUS[0]}"

echo "== 3/3 headline bench =="
timeout 1800 python bench.py 2>&1 | tee /tmp/reval_bench.log
echo "bench exit: ${PIPESTATUS[0]}"

echo "Done. If the probe shows u8opt ok:true on every shape AND a"
echo ">=10% consistent win, flip megakernel._UNALIGNED_LUMA_U8 /"
echo "_U8_OUTPUT_STORE defaults to True, re-run steps 2-3, update"
echo "PERF.md/CLAUDE.md/README numbers, and commit."
