"""insert_cuts vs a Python oracle of the reference semantics."""

import numpy as np

from retargetvid_tpu.ops.scenes import insert_cuts


def test_insert_cuts_reference_semantics():
    seg = np.array([[0, 119], [120, 239]])
    seg_sel = np.array([[0, 19], [20, 39]])
    true_inds = np.arange(40) * 6
    extra_at = [5, 25, 33]
    extra_scores = [10.0, 40.0, 20.0]

    # no_extra_cuts=2 drops the 2 strongest (lowest-score) candidates —
    # the reference's quirk: del extra_cuts_at[:no_extra_cuts].
    new_seg, new_sel, kept, kept_scores = insert_cuts(
        seg, seg_sel, true_inds, extra_at, extra_scores, no_extra_cuts=2)
    assert kept == [25]
    assert kept_scores == [40.0]
    assert new_sel.tolist() == [[0, 19], [20, 24], [25, 39]]
    assert new_seg.tolist() == [[0, 119], [120, 149], [150, 239]]

    # Without the limit, all cuts merge and duplicates are deduped.
    new_seg, new_sel, kept, _ = insert_cuts(
        seg, seg_sel, true_inds, [20, 30], [1.0, 2.0], no_extra_cuts=None)
    assert new_sel.tolist() == [[0, 19], [20, 29], [30, 39]]
    assert new_seg[-1].tolist() == [180, 239]
