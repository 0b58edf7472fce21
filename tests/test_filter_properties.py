"""Property tests for the membership filters: whatever the operation
sequence, a present key must never read absent (no false negatives —
a false negative means a URL silently never fetched)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spatula_spark.operators.seen import BloomFilter, CuckooFilter


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["add", "del"]),
                  st.integers(min_value=1, max_value=200)),
        min_size=1,
        max_size=60,
    )
)
def test_cuckoo_no_false_negatives(ops):
    cf = CuckooFilter(2048)
    present: set[int] = set()
    for op, k in ops:
        key = np.array([k * 7919], dtype=np.int64)
        if op == "add":
            cf.add(key)
            present.add(k)
        elif k in present:
            cf.delete(key)
            present.discard(k)
    if present:
        keys = np.array(sorted(present), dtype=np.int64) * 7919
        assert cf.contains(keys).all()  # zero false negatives, always


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(1, 10_000), min_size=1, max_size=500))
def test_bloom_no_false_negatives(keys):
    bf = BloomFilter(1000, fpr=1e-3)
    arr = np.unique(np.array(keys, dtype=np.int64) * 7919)
    bf.add(arr)
    assert bf.contains(arr).all()
