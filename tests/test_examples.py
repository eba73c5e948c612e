"""CI proof the composed pipeline example runs (round-10 verdict #5).

examples/full_pipeline.py chains the industrial half (config → sim
acquisition → decode → points → compiled InfluxQL downsample; ONE
registered hash-checked query, plans/pipeline.py) with the corpus half
(curation → near-dup → embedding audit). The correctness of each stage
is the oracle gate's job; this test proves the COMPOSITION executes
and every stage yields rows.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join("/root/repo", "examples"))

from conftest import SF_DIR  # noqa: E402


def test_full_pipeline_example_runs_all_stages(spark):
    import full_pipeline

    counts = full_pipeline.run(spark, SF_DIR, show=False)
    assert set(counts) == {name for _, name in full_pipeline.STAGES}
    for name, n in counts.items():
        assert n > 0, f"stage {name} produced no rows"
    # the industrial half's exact shape: 9 decodable active tags
    # (12 config rows - 1 inactive - Counter/Timer null-gate drops)
    # x 4 fifteen-minute buckets in the simulated hour
    assert counts["pipeline_plc_e2e"] == 36
