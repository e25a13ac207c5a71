#!/bin/bash
# Run the full on-chip validation ladder after TPU recovery/changes:
# kernel-parity pytest lane -> bench -> profile. One TPU client at a time.
set -x
cd /root/repo
timeout 1800 env BAGS_TPU_TEST_TPU=1 python -m pytest tests/test_tpu.py -m tpu -q 2>&1 | tail -4
timeout 900 python bench.py 2>&1 | tail -2
timeout 900 python profile.py 2>&1 | tail -8
