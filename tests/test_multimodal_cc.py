"""Multimodal CC dedup: the union closure is strictly richer than the
image modality alone (caption edges bridge members the phash join
cannot see)."""

from collections import Counter

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_union_closure_merges_both_modalities(spark):
    rows = entry.queries()["multimodal_dedup_cc"](spark, SF).collect()
    comp = {r["image_id"]: r["component"] for r in rows}
    sizes = Counter(Counter(comp.values()).values())
    # planted design: per 6-block, members 0-4 fuse (image 0-2 ∪
    # caption 2-4), member 5 isolated -> 5-size components dominate
    assert sizes.get(5, 0) >= 5
    # image-only (media_dedup_cc's planted groups differ) — here check
    # directly: some full block {6b..6b+4} shares one component
    blocks = [b for b in range(3)]
    fused = 0
    for b in blocks:
        labels = {comp[6 * b + i] for i in range(5) if 6 * b + i in comp}
        if len(labels) == 1:
            fused += 1
    assert fused >= 2  # bridging happened (image alone gives {0,1,2})
