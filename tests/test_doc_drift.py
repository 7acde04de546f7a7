"""User-facing perf claims must track the current bench record (VERDICT
r4 item 8 — round 3's numbers survived in README/DEPLOYMENT a full round
after being superseded; this pins the hygiene).

The canonical record is PERF.md (per-round measured bands) + the driver's
BENCH_r*.json. Docs quote bands, which a test cannot re-measure — so the
check is (a) superseded band strings may not reappear, and (b) every
bench metric surface is mentioned where users read about performance.
When a new round changes the numbers, update README.md/docs/DEPLOYMENT.md
AND extend the superseded list here with the bands being replaced.
"""

from __future__ import annotations

import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: bands that were once correct and are now superseded — must not appear
#: in user-facing docs (PERF.md keeps them as historical record; that is
#: its job, so it is exempt)
SUPERSEDED = (
    "8.4-10.4",   # round-3 traced band (round 4: 9.9-11.3; round 5: 10.4-11.5)
    "~10.4 Gpix",  # round-5 single-run traced claim (fresh band: 10.4-11.5)
    "14.04 Gpix",  # round-3 single-run headline (round 4+: band 13.1-15.6)
    "227 Gpix",    # round-4 sub-RPC-floor measurement artifact (purged)
)

DOCS = ("README.md", os.path.join("docs", "DEPLOYMENT.md"))


def test_no_superseded_bands_in_user_docs():
    for doc in DOCS:
        text = open(os.path.join(ROOT, doc)).read()
        for band in SUPERSEDED:
            assert band not in text, f"{doc} still claims superseded '{band}'"


def test_bench_metric_surfaces_mentioned():
    """Every shape bench.py grades must be discussed in DEPLOYMENT.md so
    users see the current tier for their workload."""
    text = open(os.path.join(ROOT, DOCS[1])).read()
    for surface in ("512x512", "32x32", "traced", "strict"):
        assert surface in text, f"DEPLOYMENT.md lost the {surface} tier"
