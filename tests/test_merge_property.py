"""Property test: any sequence of keyed merges equals the dict model.

Each merge_upsert(source, ["id"]) must behave exactly like
`model.update(source)` — regardless of how rows land in files, how
pruning splits kept/rewritten sets, or how many snapshots pile up."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.merge import merge_upsert

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)

_batch = st.dictionaries(
    keys=st.integers(0, 30),
    values=st.text(alphabet="abcxyz", min_size=1, max_size=4),
    min_size=1,
    max_size=6,
)


@settings(max_examples=5, deadline=None)
@given(batches=st.lists(_batch, min_size=1, max_size=4))
def test_merge_sequence_matches_dict_model(spark, batches):
    wh = tempfile.mkdtemp(prefix="ice_prop_")
    try:
        cat = Catalog(spark, wh)
        cat.create_namespace("p")
        t = cat.create_table("p.t", schema=SCHEMA)
        model: dict[int, str] = {}
        for batch in batches:
            src = spark.createDataFrame(sorted(batch.items()), SCHEMA)
            merge_upsert(t, src, ["id"])
            model.update(batch)
        got = {(r.id, r.v) for r in t.read().collect()}
        assert got == set(model.items())
    finally:
        shutil.rmtree(wh, ignore_errors=True)
