#!/usr/bin/env bash
# The whole evidence chain, one command. ~25 min on local[32].
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 1/6 unit + streaming tests (pytest) ==="
python -m pytest tests/ -q

echo "=== 2/6 driver-mirror correctness gate (canonical 50, sf0.01) ==="
python tools/check_oracle.py --canonical /root/testdata/sf0.01

echo "=== 3/6 full registry sweep (canonical + variants, sf0.01) ==="
python tools/check_oracle.py /root/testdata/sf0.01

echo "=== 4/6 headline bench (sf0.1) ==="
python bench.py

echo "=== 5/6 scale probes (scaling + stress + media + shuffle + ingest) ==="
python tools/scaling_probe.py
python tools/stress_probe.py
python tools/media_stress_probe.py
python tools/shuffle_audit.py
python tools/ingest_probe.py

echo "=== 6/6 plan dumps ==="
python tools/dump_plans.py

echo "ALL VERIFICATION STAGES COMPLETE"
