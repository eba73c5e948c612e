"""Cross-invocation plan stability — the CacheManager-reuse contract.

Calling a registered query builder twice must produce canonically
identical analyzed plans: Spark's CacheManager matches cached
intermediates (LSH signatures, scored tables, …) by canonicalized-plan
equality, so ANY instability silently turns warm re-invocations into
full recomputation.

The known foot-gun this guards against: pyspark higher-order-function
lambdas with a default-argument capture (``lambda s, j=j: …``) are read
as transform's two-parameter (element, index) form — the captured value
silently becomes the fresh-named index Column, embedding a
per-invocation name into the plan (and, when the capture is
interpolated into a literal, corrupting the value itself). See
b19_minhash's `_component` factory for the correct shape.

Only queries whose builders are pure plan constructors (no driver-side
iteration embedding run-specific state such as checkpoint RDDs) are
asserted — iterative builders (CC, k-means, BPE) legitimately differ.
"""

import pytest

from iot_system_plc_data_to_influxdb_spark.plans import registry

SF = "/root/testdata/sf0.001"

STABLE_QUERIES = [
    # cache-carrying pipelines where a plan mismatch means re-deriving
    # the whole signature/scored table per invocation
    "b19_minhash_lsh_neardup",
    "b19_semdedup",
    "b21_lm_bigram_fit",
    # representative pure-DataFrame plans across operator families
    "b4_hash_aggregate",
    "b21_tfidf_top_terms",
    "b12_window_funcs",
    "b3_downsample",
]


def _canonical(df) -> str:
    return (
        df._jdf.queryExecution().analyzed().canonicalized().toString()
    )


@pytest.mark.parametrize("name", STABLE_QUERIES)
def test_plan_stable_across_invocations(spark, name):
    fn = registry.all_queries()[name]
    assert _canonical(fn(spark, SF)) == _canonical(fn(spark, SF))
