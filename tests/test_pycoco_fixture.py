"""Pin eval/coco_protocol.py against the pycocotools golden fixture.

The fixture (tests/fixtures/pycoco_golden.json) is produced by
scripts/make_pycoco_fixture.py from a deterministic synthetic corpus.
Two layers of pinning:

1. ALWAYS: our referee's values on the regenerated corpus must match
   the values stored at fixture-generation time bit-for-bit — the
   corpus generator and the referee are both deterministic, so any
   drift is a behavior change in one of them.
2. WHEN the fixture carries real pycocotools stats (generated on a
   machine where pycocotools is installed — it does not ship in this
   container): our AP/AP50/AP75/AR and per-area APs must agree with
   COCOeval's summarize() numbers to 1e-3 (COCOeval prints at 3
   decimals; its stats vector layout: [AP, AP50, AP75, APsmall, APmed,
   APlarge, AR@1, AR@10, AR@100, ARsmall, ARmed, ARlarge]).
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "pycoco_golden.json")


@pytest.fixture(scope="module")
def fixture():
    if not os.path.exists(FIXTURE):
        pytest.skip("pycoco fixture not generated "
                    "(scripts/make_pycoco_fixture.py)")
    with open(FIXTURE) as f:
        return json.load(f)


def test_our_referee_is_stable(fixture):
    from make_pycoco_fixture import make_corpus, run_ours

    corpus = make_corpus(fixture["seed"])
    ours = run_ours(corpus)
    for key in ("ap", "ap50", "ap75", "ar"):
        assert ours[key] == pytest.approx(fixture["ours"][key],
                                          abs=1e-12), key
    for area, val in fixture["ours"]["per_area"].items():
        got = ours["per_area"][area]
        if np.isnan(val):
            assert np.isnan(got), area
        else:
            assert got == pytest.approx(val, abs=1e-12), area


def test_matches_real_pycocotools(fixture):
    stats = fixture.get("pycocotools_stats")
    if stats is None:
        pytest.skip("fixture lacks real pycocotools stats — regenerate "
                    "where pycocotools is installed")
    ours = fixture["ours"]
    assert ours["ap"] == pytest.approx(stats[0], abs=1e-3)
    assert ours["ap50"] == pytest.approx(stats[1], abs=1e-3)
    assert ours["ap75"] == pytest.approx(stats[2], abs=1e-3)
    assert ours["per_area"]["small"] == pytest.approx(stats[3], abs=1e-3)
    assert ours["per_area"]["medium"] == pytest.approx(stats[4], abs=1e-3)
    assert ours["per_area"]["large"] == pytest.approx(stats[5], abs=1e-3)
    # our AR is AR@maxDets(=100): COCOeval stats[8]
    assert ours["ar"] == pytest.approx(stats[8], abs=1e-3)
