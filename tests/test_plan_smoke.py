"""Plan-smoke regression net: every driver query must plan without a
CartesianProduct.

A CartesianProduct (a non-broadcast cross join) is the one physical
operator that is NEVER acceptable at 10^12-file scale — unlike
BroadcastNestedLoopJoin, which several queries use deliberately for
1-row aggregate broadcasts. The sweep builds (does not execute) every
``__spark_entry__.queries()`` plan at sf0.001, so a future query that
accidentally drops a join condition or crosses two big sides fails CI
here instead of hanging a cluster.
"""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_no_cartesian_product_in_any_query_plan(spark):
    offenders = {}
    for name, fn in sorted(entry.queries().items()):
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = plan.count("CartesianProduct")
        if n:
            offenders[name] = n
    assert not offenders, offenders
