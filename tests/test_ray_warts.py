"""Pin the Ray 2.49 empty-block wart (VERDICT r4 #8 / ROADMAP r5 #1).

``drop_empty_blocks`` exists because Ray 2.49's hash-shuffle stages
(groupby().map_groups / aggregate) emit SCHEMA-LESS zero-row blocks
for aggregator partitions that received no groups, and a downstream
``Dataset.join`` feeds every block to pyarrow's acero join, which
rejects the schema-less ones ("No match ... for key field
reference").  This test reproduces the wart minimally so that a Ray
upgrade that fixes it is NOTICED: on a fixed Ray the test fails with
an instruction to prune the drop_empty_blocks call sites.
"""

import pyarrow as pa
import pytest


def test_ray_empty_block_wart(ray_session):
    import ray
    import ray.data as rd

    from dabloomray.pipelines.dedup import drop_empty_blocks

    # 2 groups over a hash shuffle with more aggregator partitions
    # than groups -> some output blocks are empty and SCHEMA-LESS
    ds = rd.from_items([{"k": 1, "v": 10}, {"k": 1, "v": 11},
                        {"k": 2, "v": 5}])

    def gm(g: pa.Table) -> pa.Table:
        return pa.table({"node": g.column("k"), "label": g.column("v")})

    agg = ds.groupby("k").map_groups(gm, batch_format="pyarrow") \
            .materialize()
    blocks = ray.get([r for b in agg.iter_internal_ref_bundles()
                      for r in b.block_refs])
    schemaless_empties = any(
        t.num_rows == 0 and not t.schema.names for t in blocks)

    other = rd.from_items([{"node": 1}])
    wart = False
    try:
        agg.join(other, join_type="inner", num_partitions=2,
                 on=("node",)).count()
    except Exception as ex:
        assert "key field reference" in str(ex)
        wart = True

    if ray.__version__.startswith("2.49"):
        # version-gated: the wart is a known 2.49 behavior.  If this
        # assert ever trips ON 2.49, the repro rotted — re-check it
        # rather than pruning anything.
        assert wart and schemaless_empties, (
            "the empty-block wart did not reproduce on Ray 2.49 — "
            "re-check the repro before touching drop_empty_blocks")
    elif not wart:
        pytest.fail(
            f"Ray {ray.__version__} appears to have FIXED the "
            "empty-block wart (hash aggregates no longer emit "
            "schema-less empties that break joins).  Prune the "
            "drop_empty_blocks call sites in dabloomray/pipelines/ "
            "(VERDICT r4 #8 / ROADMAP r5 #1) and retire this guard.")

    # the sanitizer makes the same join work, with identical rows
    clean = drop_empty_blocks(agg)
    got = clean.join(other, join_type="inner", num_partitions=2,
                     on=("node",))
    assert sorted(r["label"] for r in got.take_all()) == [10, 11]
