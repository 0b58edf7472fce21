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


# --------------------------------------------------------------- codecs
from hypothesis import strategies as _st  # noqa: E402


@settings(max_examples=15, deadline=None)
@given(
    st.integers(1, 10_000),
    st.sampled_from([(8, 8), (16, 8), (17, 13), (32, 24)]),
    st.sampled_from([85, 95, 98]),
)
def test_jpeg_roundtrip_property(seed, wh, quality):
    """Any synthesized image, any (non-multiple-of-8) size: the real
    baseline-JFIF codec must preserve shape/dtype/markers, clear a
    lossy sanity floor, and at the pipeline's own setting (quality=98,
    images.lossy_encode) clear the 40 dB north-rule bar."""
    from spatula_spark.functions.images import psnr, synth_pixels
    from spatula_spark.functions.jpeg import jpeg_decode, jpeg_encode

    w, h = wh
    px = synth_pixels(seed, w, h)
    data = jpeg_encode(px, quality=quality)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = jpeg_decode(data)
    assert out.shape == px.shape and out.dtype == px.dtype
    p = psnr(out, px)
    assert p >= 25.0
    if quality == 98:
        assert p >= 40.0
